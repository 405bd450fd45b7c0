"""Inverted-index build / merge / query (the full-text half the reference
delegated to Elasticsearch, rebuilt from scratch — SURVEY.md §2.B)."""
