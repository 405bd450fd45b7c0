"""Pipelines: the relational/ETL operator layer (SURVEY.md §2.A) and the
declarative config-driven pipeline spec (§2.D1)."""
