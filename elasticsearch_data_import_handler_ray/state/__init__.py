"""Run state: manifest persistence, locking, checkpoint/resume, metrics.

Replaces the reference's Elasticsearch state index (``.kohesive-dih-state*``,
last-run timestamps + run-lock documents — SURVEY.md §2.C) with a local
JSON manifest + lockfile suitable for a shared filesystem / object store.
"""

from .manifest import IndexConfig, Manifest, RunLock
from .watermark import WatermarkState

__all__ = ["IndexConfig", "Manifest", "RunLock", "WatermarkState"]
