"""Segment merge / compaction (SURVEY.md §2.B5).

After K incremental runs, each doc-shard ``seg_id`` has K segment files.
``merge_index`` compacts them: per shard, union the term dictionaries, merge
each term's postings across runs (disjoint doc sets; doc_ids interleave because
they are hashes, so merge decodes, merge-sorts, re-encodes — see
functions/codec.merge_postings), and write ONE segment per shard under a new
deterministic run id. The manifest swap is atomic; old run dirs are removed
only after the commit.

Idempotence (named pytest target, BASELINE.json:6): segment bytes are a pure
function of the surviving postings — encode is deterministic, meta has no
timestamps — so merge(merge(X)) is byte-identical to merge(X), and a full
build equals the merge of any partition of the same corpus into incremental
runs.

Parallelism: one Ray task per shard via ``ray.data.from_items(...).map_batches``
(shards are independent file-level merges; a Dataset gives retries + scheduling
without a hand-rolled task graph).
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..functions.codec import merge_postings
from ..state.manifest import Manifest, RunLock
from .segment import SegmentReader, write_segment


def _merge_one_shard(seg_id: int, seg_dirs: list[str], out_dir: str, rel_out: str) -> dict:
    readers = [SegmentReader(d) for d in seg_dirs]
    term_arrays = [r.terms for r in readers]
    union = np.unique(np.concatenate(term_arrays))
    blobs: list[bytes] = []
    offsets = np.empty(len(union), dtype=np.int64)
    lengths = np.empty(len(union), dtype=np.int64)
    dfs = np.empty(len(union), dtype=np.uint64)
    sum_tfs = np.empty(len(union), dtype=np.uint64)
    # per-reader cursor over its sorted term array (k-way merge by position)
    lookups = [np.searchsorted(r.terms, union) for r in readers]
    off = 0
    n_postings = 0
    for i, t in enumerate(union):
        parts = []
        for r, lk in zip(readers, lookups):
            j = lk[i]
            if j < len(r.terms) and r.terms[j] == t:
                s = int(r.offsets[j])
                parts.append(r._post[s : s + int(r.lengths[j])])
        blob = merge_postings(parts)
        blobs.append(blob)
        offsets[i] = off
        lengths[i] = len(blob)
        off += len(blob)
    # df / sum_tf by summing the per-reader dictionaries (vectorized)
    dfs[:] = 0
    sum_tfs[:] = 0
    for r, lk in zip(readers, lookups):
        j = np.minimum(lk, len(r.terms) - 1)
        hit = (lk < len(r.terms)) & (r.terms[j] == union)
        dfs[hit] += r.dfs[j[hit]].astype(np.uint64)
        st = pq.read_table(os.path.join(r.seg_dir, "terms.parquet"), columns=["sum_tf"])[
            "sum_tf"
        ].to_numpy(zero_copy_only=False)
        sum_tfs[hit] += st[j[hit]].astype(np.uint64)
    n_postings = int(dfs.sum())

    term_table = pa.table(
        {
            "term": pa.array(union, type=pa.large_string()),
            "df": pa.array(dfs, type=pa.uint64()),
            "sum_tf": pa.array(sum_tfs, type=pa.uint64()),
            "offset": pa.array(offsets, type=pa.int64()),
            "length": pa.array(lengths, type=pa.int64()),
        }
    )
    blob = b"".join(blobs)
    meta = {
        "n_terms": int(len(union)),
        "n_docs": int(sum(r.meta["n_docs"] for r in readers)),
        "sum_dl": int(sum(r.meta["sum_dl"] for r in readers)),
        "n_postings": n_postings,
        "postings_bytes": len(blob),
    }
    seg_dir = os.path.join(out_dir, f"seg_{seg_id}")
    meta = write_segment(seg_dir, seg_id, term_table, blob, meta)
    return dict(
        seg_id=seg_id,
        dir=f"{rel_out}/seg_{seg_id}",
        n_terms=meta["n_terms"],
        n_docs=meta["n_docs"],
        sum_dl=meta["sum_dl"],
        n_postings=meta["n_postings"],
        postings_bytes=meta["postings_bytes"],
    )


def merge_index(index_dir: str, *, cleanup: bool = True, concurrency: int | None = None) -> str:
    """Compact all complete runs into one merged run. Returns the new run id.
    No-op (returns existing id) when the index already has a single run."""
    man = Manifest.load(index_dir)
    runs = man.complete_runs()
    if len(runs) <= 1:
        return next(iter(runs), "")
    run_ids = sorted(runs)
    rid = "merged-" + hashlib.blake2b("|".join(run_ids).encode(), digest_size=6).hexdigest()
    rel_out = f"runs/{rid}"
    out_dir = os.path.join(index_dir, rel_out)

    with RunLock(index_dir, owner=f"merge-{rid}"):
        os.makedirs(out_dir, exist_ok=True)
        work = []
        for seg_id in range(man.config.num_segments):
            dirs = man.segment_dirs(seg_id)
            if dirs:
                work.append({"seg_id": seg_id, "dirs": dirs})

        def do(batch: pa.Table) -> pa.Table:
            rows = [
                _merge_one_shard(int(s), list(d), out_dir, rel_out)
                for s, d in zip(batch["seg_id"].to_pylist(), batch["dirs"].to_pylist())
            ]
            return pa.Table.from_pylist(rows)

        summaries = (
            ray.data.from_items(work)
            .map_batches(do, batch_format="pyarrow", batch_size=1)
            .to_pandas()
        )
        segments = summaries.to_dict("records")
        input_files = sorted({f for r in runs.values() for f in r["input_files"]})
        # lineage must survive repeated merges: a run carries its own
        # docmap_dir AND, when it is itself a merge product, the docmap_dirs
        # of the runs it folded in (mirrors verify_hashes/resolve, which read
        # both keys) — otherwise merge→incremental→merge orphans the docmaps
        # of docs indexed before the first merge.
        docmap_dirs = []
        for r in runs.values():
            if r["metrics"].get("docmap_dir"):
                docmap_dirs.append(r["metrics"]["docmap_dir"])
            docmap_dirs.extend(r["metrics"].get("docmap_dirs") or [])
        man.commit_run(
            rid,
            input_files,
            segments,
            {"merged_from": run_ids, "docmap_dir": None, "docmap_dirs": docmap_dirs},
        )
        man.drop_runs(run_ids)
        if cleanup:
            for old in run_ids:
                shutil.rmtree(os.path.join(index_dir, "runs", old), ignore_errors=True)
    return rid
