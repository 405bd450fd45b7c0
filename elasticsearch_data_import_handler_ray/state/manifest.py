"""Index manifest + run lock (SURVEY.md §2.C1–C6).

The reference persisted a per-statement "last run" timestamp and a lock
document in an Elasticsearch state index; incremental imports substituted the
timestamp into SQL (``WHERE modified > '{lastRun}'``). Here incremental state
is richer and file-based: the manifest records, per completed run, the exact
input files covered, the segments produced, doc counts, and metrics —
per-partition lineage (BASELINE.json:14). An incremental build plans
``pending = all_input_files − already_covered`` instead of a timestamp
predicate; a resumable re-run is therefore a set difference, and segment
outputs are immutable so retries are safe.

Concurrency: ``RunLock`` is an ``O_EXCL`` lockfile (the reference's lock doc);
manifest saves are write-temp-then-rename (single-writer).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass, field


@dataclass
class IndexConfig:
    analyzer: str = "code"
    num_segments: int = 8
    k1: float = 1.2
    b: float = 0.75
    id_cols: tuple[str, ...] = ("repo", "path", "commit")
    content_col: str = "content"
    # when set, use this existing integer column as the document id instead of
    # hashing id_cols (e.g. the driver `documents` table's doc_id)
    doc_id_col: str | None = None
    # index per-occurrence token positions in a sidecar stream (positions.bin)
    # — enables mode="phrase" queries; postings.bin stays byte-identical
    positions: bool = False
    # extra source columns stored per doc in the docmap (ES stored-fields /
    # doc-values analogue) — the columns facets() can aggregate over
    store_cols: tuple[str, ...] = ()

    def to_dict(self) -> dict:
        d = asdict(self)
        d["id_cols"] = list(self.id_cols)
        d["store_cols"] = list(self.store_cols)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "IndexConfig":
        d = dict(d)
        d["id_cols"] = tuple(d.get("id_cols", ("repo", "path", "commit")))
        d["store_cols"] = tuple(d.get("store_cols", ()))
        return cls(**d)


class Manifest:
    VERSION = 1

    def __init__(self, index_dir: str, config: IndexConfig | None = None):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, "manifest.json")
        self.config = config or IndexConfig()
        self.runs: dict[str, dict] = {}

    # ---------- persistence ----------
    @classmethod
    def load(cls, index_dir: str) -> "Manifest":
        m = cls(index_dir)
        with open(m.path) as f:
            d = json.load(f)
        m.config = IndexConfig.from_dict(d["config"])
        m.runs = d["runs"]
        return m

    @classmethod
    def load_or_create(cls, index_dir: str, config: IndexConfig) -> "Manifest":
        if os.path.exists(os.path.join(index_dir, "manifest.json")):
            m = cls.load(index_dir)
            if m.config.to_dict() != config.to_dict():
                raise ValueError(
                    "index config mismatch with existing manifest "
                    f"({m.config.to_dict()} != {config.to_dict()}); "
                    "use mode='full' to rebuild"
                )
            return m
        os.makedirs(index_dir, exist_ok=True)
        m = cls(index_dir, config)
        m.save()
        return m

    def save(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = self.path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(
                {"version": self.VERSION, "config": self.config.to_dict(), "runs": self.runs},
                f,
                indent=1,
                sort_keys=True,
            )
        os.rename(tmp, self.path)

    # ---------- lineage ----------
    def covered_files(self) -> set[str]:
        out: set[str] = set()
        for r in self.runs.values():
            if r.get("status") == "complete":
                out.update(r["input_files"])
        return out

    def complete_runs(self) -> dict[str, dict]:
        return {k: v for k, v in self.runs.items() if v.get("status") == "complete"}

    def commit_run(
        self,
        run_id: str,
        input_files: list[str],
        segments: list[dict],
        metrics: dict,
        seq: int | None = None,
        drop: list[str] | None = None,
    ) -> None:
        """Atomically record a completed run (checkpoint commit, C4).

        ``seq`` is the commit sequence number that defines upsert precedence
        (a doc_id re-imported in a higher-seq run supersedes earlier versions
        — index/tombstones.py). Defaults to one past the highest existing
        seq; a merged run passes the max seq of the runs it folded."""
        if seq is None:
            seq = 1 + max(
                (int(r.get("seq", -1)) for r in self.runs.values()), default=-1
            )
        for r in drop or []:  # swap-in commit: merge replaces its constituents
            self.runs.pop(r, None)  # in the SAME atomic save
        self.runs[run_id] = {
            "status": "complete",
            "seq": int(seq),
            "input_files": sorted(input_files),
            "segments": sorted(segments, key=lambda s: s["seg_id"]),
            "n_docs": int(sum(s["n_docs"] for s in segments)),
            "sum_dl": int(sum(s["sum_dl"] for s in segments)),
            "metrics": metrics,
        }
        self.save()

    def drop_runs(self, run_ids: list[str]) -> None:
        for r in run_ids:
            self.runs.pop(r, None)
        self.save()

    # ---------- corpus-level stats (query-time N, avgdl) ----------
    @property
    def n_docs(self) -> int:
        return sum(r["n_docs"] for r in self.complete_runs().values())

    @property
    def sum_dl(self) -> int:
        return sum(r["sum_dl"] for r in self.complete_runs().values())

    @property
    def avgdl(self) -> float:
        n = self.n_docs
        return (self.sum_dl / n) if n else 0.0

    def segment_dirs(self, seg_id: int) -> list[str]:
        """All on-disk segment dirs for one doc-shard, across completed runs
        (sorted by run id for a deterministic scan order)."""
        out = []
        for run_id in sorted(self.complete_runs()):
            for s in self.runs[run_id]["segments"]:
                if s["seg_id"] == seg_id and s["n_docs"] > 0:
                    out.append(os.path.join(self.index_dir, s["dir"]))
        return out


class RunLock:
    """O_EXCL lockfile — the reference's run-lock document (§2.C2)."""

    def __init__(self, index_dir: str, owner: str = ""):
        self.path = os.path.join(index_dir, ".lock")
        self.owner = owner or f"pid-{os.getpid()}"
        self._fd: int | None = None

    def __enter__(self) -> "RunLock":
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        try:
            self._fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise RuntimeError(
                f"index at {os.path.dirname(self.path)} is locked by another run "
                f"(remove {self.path} if stale)"
            ) from None
        os.write(self._fd, self.owner.encode())
        return self

    def __exit__(self, *exc) -> None:
        if self._fd is not None:
            os.close(self._fd)
            os.unlink(self.path)
            self._fd = None
