"""Upsert tombstones: id-mapped re-import, latest run wins (SURVEY.md §1.1).

The reference's imports were idempotent by DOCUMENT KEY: `es.mapping.id` made
every re-import an upsert, so importing a changed row replaced the previous
version in the index (`[PK: README.md]` — "id-mapped upserts"). Here segments
are immutable, so the same behavior is expressed Lucene-style:

* Re-importing a doc_id in a LATER run *supersedes* the earlier version.
  Nothing is rewritten at build time — the old postings stay on disk.
* ``find_superseded`` derives the tombstone set from the docmap lineage:
  doc_ids present in more than one complete run lose everywhere except the
  run with the highest commit sequence number.
* The query engine masks tombstoned (run, doc) pairs at score time and
  corrects df / N / avgdl exactly, so results equal an index built from only
  the latest versions (rank- and score-identical — pinned by
  tests/test_upsert.py).
* ``merge_index`` purges tombstoned postings physically and rewrites the
  docmap, after which the index is byte-identical to a full build over the
  latest corpus.

Scale shape: detection is a column-pruned streaming pass over the docmap
(doc_id: 8 B/doc) + a hash groupby; it is skipped entirely for single-run
indexes (the common state — merges purge duplicates). The materialized
result is ONLY the upserted doc set, which between merges is ≪ corpus
(documented partitioning assumption).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray


def in_sorted(values: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Boolean membership of ``values`` in a SORTED uint64 array — one
    searchsorted, no hashing (both sides stay numpy)."""
    if sorted_set is None or len(sorted_set) == 0 or len(values) == 0:
        return np.zeros(len(values), dtype=bool)
    idx = np.searchsorted(sorted_set, values)
    idx_c = np.minimum(idx, len(sorted_set) - 1)
    return sorted_set[idx_c] == values


def run_of_segment_dir(seg_dir: str) -> str:
    """``.../runs/<run_id>/seg_<k>`` → ``<run_id>``."""
    return os.path.basename(os.path.dirname(seg_dir))


def _run_docmap_files(man, run: dict) -> list[str]:
    dirs = []
    if run["metrics"].get("docmap_dir"):
        dirs.append(os.path.join(man.index_dir, run["metrics"]["docmap_dir"]))
    for d in run["metrics"].get("docmap_dirs") or []:
        dirs.append(os.path.join(man.index_dir, d))
    return [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]


def run_seqs(man) -> dict[str, int]:
    """Commit sequence per complete run. New manifests persist ``seq``;
    legacy runs fall back to manifest insertion order (== commit order:
    JSON objects round-trip ordered in Python)."""
    out = {}
    for i, (rid, r) in enumerate(man.complete_runs().items()):
        out[rid] = int(r.get("seq", i))
    return out


def find_superseded(man) -> dict[str, dict]:
    """doc versions superseded by a later run, per run.

    Returns ``{run_id: {"doc_ids": sorted uint64 array, "n_nonempty": int,
    "sum_dl": int}}`` — only runs that LOSE at least one doc appear.
    ``n_nonempty``/``sum_dl`` count only dead versions with ≥1 token (the
    ones that exist in segments and in N / Σdl).

    Runs built with ``write_docmap=False`` contribute nothing (their doc sets
    are unknowable); duplicates involving them still fail at merge time.
    """
    runs = man.complete_runs()
    dels = load_deletions(man.index_dir)  # (doc_ids sorted, at_seq aligned) | None
    if not runs or (len(runs) <= 1 and dels is None):
        return {}
    import ray.data
    from ray.data.aggregate import Count

    from ..functions.partitioning import cluster_cpus

    seqs = run_seqs(man)
    per_run_files = {rid: _run_docmap_files(man, r) for rid, r in runs.items()}
    per_run_files = {rid: f for rid, f in per_run_files.items() if f}
    if not per_run_files or (len(per_run_files) <= 1 and dels is None):
        return {}

    dup_ids = np.empty(0, dtype=np.uint64)
    if len(per_run_files) > 1:
        # pass 1 (streaming, column-pruned): doc_ids present in >1 run.
        # doc_id is uint64; values above 2^63 cannot round-trip the
        # aggregate's block rebuild as Python ints → reinterpret as int64
        # (a bijection) for the groupby and view back after.
        all_files = [f for files in per_run_files.values() for f in files]

        def _sign(t: pa.Table) -> pa.Table:
            a = (
                t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
                .astype(np.uint64).view(np.int64)
            )
            return pa.table({"doc_id": pa.array(a)})

        ds = ray.data.read_parquet(all_files, columns=["doc_id"]).map_batches(
            _sign, batch_format="pyarrow", zero_copy_batch=True
        )
        nparts = max(2, min(cluster_cpus(), len(all_files)))
        dup = (
            ds.groupby("doc_id", num_partitions=nparts)
            .aggregate(Count(alias_name="n"))
            .filter(expr="n > 1")
            .select_columns(["doc_id"])
            .to_pandas()  # ONLY the upserted ids — small between merges
        )
        if len(dup):  # empty to_pandas frames lose their columns
            dup_ids = np.sort(dup["doc_id"].to_numpy().astype(np.int64).view(np.uint64))

    want = dup_ids if dels is None else np.union1d(dup_ids, dels[0])
    if len(want) == 0:
        return {}
    want_ref = ray.put(pa.array(want, type=pa.uint64()))

    # pass 2: fetch (doc_id, doc_len) of the interesting ids per run
    def _flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(pc.cast(t["doc_id"], pa.uint64()), value_set=ray.get(want_ref)))

    rows = []  # (seq, run_id, doc_ids, doc_lens)
    for rid, files in per_run_files.items():
        t = (
            ray.data.read_parquet(files, columns=["doc_id", "doc_len"])
            .map_batches(_flt, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
        )
        if len(t):
            rows.append(
                (
                    seqs[rid],
                    rid,
                    t["doc_id"].to_numpy().astype(np.uint64),
                    t["doc_len"].to_numpy().astype(np.int64),
                )
            )
    if not rows:
        return {}
    if len(dup_ids) and len({seq for seq, *_ in rows}) != len(rows):
        raise ValueError(
            "ambiguous document versions: duplicated doc_ids across runs with "
            "equal commit sequence — merge or rebuild the legacy runs first"
        )
    # upsert winner per doc = the highest seq that contains it
    dup_set = set(dup_ids.tolist())
    win_seq: dict[int, int] = {}
    for seq, _, ids, _ in rows:
        for d in ids.tolist():
            if d in dup_set and win_seq.get(d, -1) < seq:
                win_seq[d] = seq
    out: dict[str, dict] = {}
    for seq, rid, ids, dls in rows:
        lose = np.array(
            [win_seq.get(d, -1) > seq for d in ids.tolist()], dtype=bool
        )
        if dels is not None:
            # a deletion at at_seq kills every version in runs committed at
            # or before it; a later re-import (higher seq) resurrects the id
            pos = np.searchsorted(dels[0], ids)
            pos_c = np.minimum(pos, len(dels[0]) - 1)
            hit = dels[0][pos_c] == ids
            at = np.where(hit, dels[1][pos_c], -1)
            lose |= at >= seq
        if not lose.any():
            continue
        dead_ids = ids[lose]
        dead_dls = dls[lose]
        order = np.argsort(dead_ids)
        out[rid] = {
            "doc_ids": dead_ids[order],
            "n_nonempty": int((dead_dls > 0).sum()),
            "sum_dl": int(dead_dls.sum()),
        }
    return out


def add_deletions(index_dir: str, doc_ids) -> int:
    """ES delete-by-id: record tombstones for ``doc_ids``. The deletion
    carries the CURRENT max run seq — it kills every version committed at or
    before now; a later re-import of the same id resurrects it. Deletions
    are masked at query time immediately and purged physically by
    ``merge_index`` (bounded: the recorded set is deletion-batch-sized, and
    the files are dropped once a merge makes them physical)."""
    import hashlib

    import pyarrow.parquet as pq

    from ..state.manifest import Manifest, RunLock

    man = Manifest.load(index_dir)
    at_seq = max(run_seqs(man).values(), default=0)
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.uint64))
    if len(ids) == 0:
        return 0
    with RunLock(index_dir, owner="delete"):
        d = os.path.join(index_dir, "deletes")
        os.makedirs(d, exist_ok=True)
        name = hashlib.blake2b(
            ids.tobytes() + str(at_seq).encode(), digest_size=8
        ).hexdigest()
        path = os.path.join(d, f"del-{name}.parquet")
        tmp = path + ".tmp"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.uint64()),
                    "at_seq": pa.array(np.full(len(ids), at_seq, dtype=np.int64)),
                }
            ),
            tmp,
        )
        os.rename(tmp, path)
    return int(len(ids))


def load_deletions(index_dir: str) -> tuple[np.ndarray, np.ndarray] | None:
    """→ (sorted doc_ids, per-id MAX at_seq) across all deletion files, or
    None when no deletions are recorded."""
    import pyarrow.parquet as pq

    d = os.path.join(index_dir, "deletes")
    if not os.path.isdir(d):
        return None
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    if not files:
        return None
    ids_parts, seq_parts = [], []
    for f in files:
        t = pq.read_table(f)
        ids_parts.append(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
        seq_parts.append(t["at_seq"].to_numpy(zero_copy_only=False).astype(np.int64))
    ids = np.concatenate(ids_parts)
    at = np.concatenate(seq_parts)
    order = np.lexsort((at, ids))
    ids, at = ids[order], at[order]
    last = np.append(ids[1:] != ids[:-1], True)  # keep max at_seq per id
    return ids[last], at[last]


def clear_deletions(index_dir: str) -> None:
    """Drop deletion files (called after a merge makes them physical)."""
    import shutil

    shutil.rmtree(os.path.join(index_dir, "deletes"), ignore_errors=True)


def dead_for_segment(tomb: dict[str, dict], seg_dir: str, num_segments: int) -> np.ndarray | None:
    """The sorted dead doc_ids that can appear in ``seg_dir`` (its run's
    losers restricted to its doc-shard), or None. ``num_segments <= 0``
    skips the shard restriction (callers that already work per shard)."""
    t = tomb.get(run_of_segment_dir(seg_dir))
    if not t:
        return None
    ids = t["doc_ids"]
    if num_segments > 0:
        seg_id = int(os.path.basename(seg_dir).split("_")[-1])
        ids = ids[ids % np.uint64(num_segments) == seg_id]
    return ids if len(ids) else None


def docmap_dataset(man, tomb: dict[str, dict] | None, columns: list[str] | None = None):
    """Union Dataset over every run's docmap with tombstoned rows excluded —
    the one true view of live document identities (resolve / facets /
    verify_hashes all read through this)."""
    import ray.data

    tomb = tomb or {}
    parts = []
    for rid, r in man.complete_runs().items():
        files = _run_docmap_files(man, r)
        if not files:
            continue
        ds = ray.data.read_parquet(files, columns=columns)
        t = tomb.get(rid)
        if t is not None and len(t["doc_ids"]):
            dead_ref = ray.put(pa.array(t["doc_ids"], type=pa.uint64()))

            def _drop(tbl: pa.Table, _ref=dead_ref) -> pa.Table:
                import pyarrow.compute as pc

                m = pc.is_in(pc.cast(tbl["doc_id"], pa.uint64()), value_set=ray.get(_ref))
                return tbl.filter(pc.invert(m))

            ds = ds.map_batches(_drop, batch_format="pyarrow", zero_copy_batch=True)
        parts.append(ds)
    if not parts:
        raise ValueError("index was built without docmap (write_docmap=False)")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
