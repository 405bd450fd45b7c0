"""Segment merge / compaction (SURVEY.md §2.B5).

After K incremental runs, each doc-shard ``seg_id`` has K segment files.
``merge_index`` compacts them: per shard, bulk-decode every run's postings
(one varbyte pass per run — codec.decode_segment), union the term
dictionaries, lexsort all posting rows by (union term rank, doc_id), and
re-encode the whole shard in one pass (codec.encode_segment) under a new
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

import ray.data

from ..functions.codec import decode_positions, decode_segment, encode_positions, encode_segment
from ..state.manifest import Manifest, RunLock
from .segment import SegmentReader, write_segment


def _merge_one_shard(
    seg_id: int,
    seg_dirs: list[str],
    out_dir: str,
    rel_out: str,
    tomb: dict[str, dict] | None = None,
) -> dict:
    """Vectorized shard merge: bulk-decode every run's ENTIRE posting blob in
    one varbyte pass (codec.decode_segment), map each run's terms to their
    union ranks, ONE lexsort over all posting rows, one whole-segment
    re-encode (codec.encode_segment) -- zero per-term Python. (The round-1
    loop called merge_postings once per union term: millions of Python calls
    per shard at scale.) Byte output is unchanged: encode_segment is
    byte-equivalent to per-term encode_posting, so merge idempotence and the
    incremental==full byte-identity tests pin this rewrite."""
    from .tombstones import dead_for_segment, in_sorted

    readers = [SegmentReader(d) for d in seg_dirs]
    positional = readers[0].has_positions
    if any(r.has_positions != positional for r in readers):
        raise ValueError("cannot merge positional with non-positional segments")
    union = np.unique(np.concatenate([r.terms for r in readers]))
    parts_ids, parts_tfs, parts_dls, parts_rank, parts_pos = [], [], [], [], []
    n_docs_dead = 0
    sum_dl_dead = 0
    for r, d in zip(readers, seg_dirs):
        ids_r, tfs_r, dls_r = decode_segment(r._post, r.dfs)
        rank_r = np.searchsorted(union, r.terms)  # r.terms is a sorted subset
        rank_rep = np.repeat(rank_r, r.dfs)
        pos_r = decode_positions(r._positions, tfs_r) if positional else None
        # upsert purge (index/tombstones.py): drop this run's superseded doc
        # versions physically — after the merge the index is byte-identical
        # to a full build over only the latest versions
        dd = dead_for_segment(tomb, d, 0) if tomb else None
        if dd is not None:
            kill = in_sorted(ids_r, dd)
            if kill.any():
                dead_u, dead_first = np.unique(ids_r[kill], return_index=True)
                n_docs_dead += len(dead_u)
                sum_dl_dead += int(dls_r[kill][dead_first].sum())
                keep = ~kill
                if positional:
                    pos_r = pos_r[np.repeat(keep, tfs_r.astype(np.int64))]
                ids_r, tfs_r, dls_r, rank_rep = (
                    ids_r[keep], tfs_r[keep], dls_r[keep], rank_rep[keep]
                )
        parts_ids.append(ids_r)
        parts_tfs.append(tfs_r)
        parts_dls.append(dls_r)
        parts_rank.append(rank_rep)
        if positional:
            parts_pos.append(pos_r)
    all_ids = np.concatenate(parts_ids)
    all_tfs = np.concatenate(parts_tfs)
    all_dls = np.concatenate(parts_dls)
    all_rank = np.concatenate(parts_rank)
    order = np.lexsort((all_ids, all_rank))
    pos_sorted = None
    if positional:
        all_pos = np.concatenate(parts_pos) if parts_pos else np.empty(0, dtype=np.uint64)
        counts = all_tfs.astype(np.int64)
        starts_src = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts_src[1:])
        sel_starts, sel_lens = starts_src[order], counts[order]
        tot = int(sel_lens.sum())
        bs = np.zeros(len(sel_lens), dtype=np.int64)
        np.cumsum(sel_lens[:-1], out=bs[1:])
        pos_sorted = all_pos[np.repeat(sel_starts - bs, sel_lens) + np.arange(tot, dtype=np.int64)]
    all_ids, all_tfs, all_dls, all_rank = (
        all_ids[order], all_tfs[order], all_dls[order], all_rank[order]
    )
    # term bounds from the sorted rank runs. Without tombstones every union
    # rank occurs; the purge can empty a term's postings entirely, so the
    # output dictionary is union[ranks that still occur]. Duplicate doc_ids
    # NOT explained by tombstones still raise inside the encoder's
    # strictly-increasing guard.
    starts = np.flatnonzero(np.diff(all_rank, prepend=-1))
    bounds = np.append(starts, len(all_rank)).astype(np.int64)
    terms_out = (
        union[all_rank[starts]] if len(starts) else union[:0]
    )
    blob, offsets, lengths, sum_tfs = encode_segment(bounds, all_ids, all_tfs, all_dls)
    dfs = (bounds[1:] - bounds[:-1]).astype(np.uint64)

    cols = {
        "term": pa.array(terms_out, type=pa.large_string()),
        "df": pa.array(dfs, type=pa.uint64()),
        "sum_tf": pa.array(sum_tfs.astype(np.uint64), type=pa.uint64()),
        "offset": pa.array(offsets, type=pa.int64()),
        "length": pa.array(lengths, type=pa.int64()),
    }
    meta = {
        "n_terms": int(len(terms_out)),
        "n_docs": int(sum(r.meta["n_docs"] for r in readers)) - n_docs_dead,
        "sum_dl": int(sum(r.meta["sum_dl"] for r in readers)) - sum_dl_dead,
        "n_postings": int(len(all_ids)),
        "postings_bytes": len(blob),
    }
    pos_blob = None
    if positional:
        pos_blob, pos_off, pos_len = encode_positions(bounds, all_tfs, pos_sorted)
        cols["pos_offset"] = pa.array(pos_off, type=pa.int64())
        cols["pos_length"] = pa.array(pos_len, type=pa.int64())
        meta["positions_bytes"] = len(pos_blob)
    term_table = pa.table(cols)
    seg_dir = os.path.join(out_dir, f"seg_{seg_id}")
    meta = write_segment(seg_dir, seg_id, term_table, blob, meta, pos_blob=pos_blob)
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
    from .tombstones import docmap_dataset, find_superseded, load_deletions, run_seqs

    man = Manifest.load(index_dir)
    runs = man.complete_runs()
    # a single-run index still merges when deletions are pending — that
    # merge is what makes them physical
    if len(runs) <= 1 and load_deletions(index_dir) is None:
        return next(iter(runs), "")
    run_ids = sorted(runs)
    rid = "merged-" + hashlib.blake2b("|".join(run_ids).encode(), digest_size=6).hexdigest()
    rel_out = f"runs/{rid}"
    out_dir = os.path.join(index_dir, rel_out)

    with RunLock(index_dir, owner=f"merge-{rid}"):
        # upsert tombstones: doc versions superseded by a later run are
        # PURGED here (index/tombstones.py) — merge is where the logical
        # upsert becomes physical, exactly like a Lucene merge dropping
        # deleted docs
        tomb = find_superseded(man)
        tomb_ref = ray.put(tomb)
        os.makedirs(out_dir, exist_ok=True)
        work = []
        for seg_id in range(man.config.num_segments):
            dirs = man.segment_dirs(seg_id)
            if dirs:
                work.append({"seg_id": seg_id, "dirs": dirs})

        def do(batch: pa.Table) -> pa.Table:
            t = ray.get(tomb_ref)
            rows = [
                _merge_one_shard(int(s), list(d), out_dir, rel_out, tomb=t)
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
        old_docmap_dirs = []
        for r in runs.values():
            if r["metrics"].get("docmap_dir"):
                old_docmap_dirs.append(r["metrics"]["docmap_dir"])
            old_docmap_dirs.extend(r["metrics"].get("docmap_dirs") or [])
        if tomb:
            # rewrite the docmap without the purged versions so identity
            # lookups (resolve / facets / verify_hashes) see only winners
            new_dm_rel = f"docmap/{rid}"
            docmap_dataset(man, tomb).write_parquet(
                os.path.join(index_dir, new_dm_rel)
            )
            dm_metrics = {"docmap_dir": new_dm_rel, "docmap_dirs": []}
        else:
            # lineage must survive repeated merges: a run carries its own
            # docmap_dir AND, when it is itself a merge product, the
            # docmap_dirs of the runs it folded in (mirrors
            # verify_hashes/resolve) — otherwise merge→incremental→merge
            # orphans the docmaps of docs indexed before the first merge.
            dm_metrics = {"docmap_dir": None, "docmap_dirs": old_docmap_dirs}
        man.commit_run(
            rid,
            input_files,
            segments,
            {"merged_from": run_ids, **dm_metrics},
            # the merged run REPRESENTS its constituents: it keeps their max
            # precedence so future incremental upserts still supersede it
            seq=max(run_seqs(man).values()),
            drop=run_ids,  # swap-in commit: one atomic manifest save
        )
        if cleanup:
            for old in run_ids:
                shutil.rmtree(os.path.join(index_dir, "runs", old), ignore_errors=True)
            if tomb:
                for old in old_docmap_dirs:
                    shutil.rmtree(os.path.join(index_dir, old), ignore_errors=True)
            # deletions are physical now (purged above or never present);
            # future re-imports carry a higher seq than any old at_seq
            from .tombstones import clear_deletions

            clear_deletions(index_dir)
    return rid
