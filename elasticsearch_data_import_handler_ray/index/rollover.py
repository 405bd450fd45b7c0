"""Rollover — the ES ILM rollover analogue on top of the alias engine.

ES indexes behind a write alias roll over to a fresh index once the active
one crosses a size threshold; searches go through the alias and see every
generation. Rebuilt here as a directory of generation indexes plus one JSON
state file:

    <root>/alias.json            {"members": [...], "write": "idx-000003", config}
    <root>/idx-000001 ... N      ordinary immutable indexes (full QueryEngine
                                 artifacts — merge/snapshot/fsck work per member)

Why this matters at scale: an ever-growing single index pays an ever-growing
merge and tombstone bill; bounded generations keep per-index segment counts
flat, let old generations be snapshot-frozen or dropped wholesale (retention),
and the alias engine's blended statistics keep scores EXACTLY what one giant
index would produce (index/alias.py's bit-identity contract)."""

from __future__ import annotations

import json
import os

from ..state.manifest import IndexConfig, Manifest
from .alias import MultiIndexEngine
from .build import build_index


def _state_path(root: str) -> str:
    return os.path.join(root, "alias.json")


def _load(root: str) -> dict:
    with open(_state_path(root)) as f:
        return json.load(f)


def _save(root: str, st: dict) -> None:
    tmp = _state_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(st, f, indent=1, sort_keys=True)
    os.replace(tmp, _state_path(root))


def create_rollover_alias(root: str, config: IndexConfig | None = None) -> dict:
    """Initialize a rollover root with its first (empty) write generation."""
    os.makedirs(root, exist_ok=True)
    if os.path.exists(_state_path(root)):
        raise RuntimeError(f"{root} already holds a rollover alias")
    st = {
        "members": [],
        "write": "idx-000001",
        "config": (config or IndexConfig()).to_dict(),
    }
    _save(root, st)
    return st


def rollover_import(root: str, corpus, *, max_docs: int) -> dict:
    """Import ``corpus`` into the current write generation (full for a fresh
    generation, incremental after — file lineage applies WITHIN a
    generation), then roll over to a new write index if the generation now
    holds ≥ ``max_docs`` docs. Returns {written_to, n_docs, rolled_to}."""
    st = _load(root)
    write = st["write"]
    idx_dir = os.path.join(root, write)
    cfg = IndexConfig.from_dict(st["config"])
    if write in st["members"]:
        build_index(corpus, idx_dir, mode="incremental")
    else:
        build_index(corpus, idx_dir, mode="full", config=cfg)
        st["members"].append(write)
    n = Manifest.load(idx_dir).n_docs
    rolled = None
    if n >= max_docs:
        # Next name from a MONOTONIC counter over every name ever seen
        # (members + current write pointer), not len(members)+1: after
        # retention_drop shrinks members, len()+1 would collide with a live
        # generation and the write pointer would land on a full index that
        # then never rolls again.
        seen = [int(m.split("-")[1]) for m in (*st["members"], st["write"])]
        rolled = f"idx-{max(seen) + 1:06d}"
        st["write"] = rolled
    _save(root, st)
    return {"written_to": write, "n_docs": int(n), "rolled_to": rolled}


def open_alias(root: str, **kw) -> MultiIndexEngine:
    """Search engine over EVERY generation (the ES read alias)."""
    st = _load(root)
    if not st["members"]:
        raise RuntimeError(f"rollover alias at {root} holds no data yet")
    return MultiIndexEngine([os.path.join(root, m) for m in st["members"]], **kw)


def retention_drop(root: str, keep_last: int) -> list[str]:
    """Drop the oldest generations, keeping ``keep_last`` (ES ILM delete
    phase). The write generation is never dropped. Returns removed names."""
    import shutil

    st = _load(root)
    drop = st["members"][:-keep_last] if keep_last > 0 else list(st["members"])
    drop = [m for m in drop if m != st["write"]]
    for m in drop:
        shutil.rmtree(os.path.join(root, m))
    st["members"] = [m for m in st["members"] if m not in drop]
    _save(root, st)
    return drop
