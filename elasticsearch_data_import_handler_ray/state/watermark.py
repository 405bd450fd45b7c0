"""Timestamp-watermark incremental state — the reference's literal
``{lastRun}`` mechanism (SURVEY.md §2.C1/C7).

ES-DIH persisted a per-statement "last run" timestamp in an ES state index and
substituted it into the import SQL (``WHERE modified > '{lastRun}'``). The
index build generalizes that to file lineage (state/manifest.py), but for
timestamped sources (the ``events`` table) the timestamp predicate itself is
still the right incremental contract — so here it is, file-backed:

    wm = WatermarkState(path)
    with wm.run("events_import") as w:        # w.last = previous watermark
        ds = source.filter(ts > w.last)       # user applies the predicate
        ... process ds ...
        w.advance(max_ts_seen)                # persisted only on clean exit

Crash before exit → watermark not advanced → next run re-reads the window
(at-least-once, idempotent downstream by id — exactly the reference's model;
late data older than the watermark is caught by the next full reload, as in
the reference)."""

from __future__ import annotations

import json
import os
import uuid
from contextlib import contextmanager
from dataclasses import dataclass


@dataclass
class _Run:
    last: str | None  # ISO timestamp or None on first run
    _new: str | None = None

    def advance(self, ts: str | None) -> None:
        """Record the new watermark (ISO string); None keeps the old one."""
        if ts is not None and (self.last is None or ts > self.last):
            self._new = ts


class WatermarkState:
    def __init__(self, path: str):
        self.path = path
        self._state: dict[str, str] = {}
        if os.path.exists(path):
            with open(path) as f:
                self._state = json.load(f)

    def last(self, name: str) -> str | None:
        return self._state.get(name)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(self._state, f, indent=1, sort_keys=True)
        os.rename(tmp, self.path)

    @contextmanager
    def run(self, name: str):
        r = _Run(last=self._state.get(name))
        yield r
        # only on clean exit: advance + persist (crash → re-run same window)
        if r._new is not None:
            self._state[name] = r._new
            self._save()
