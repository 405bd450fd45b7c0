"""Index integrity check (SURVEY.md §2.B10 as an operational surface).

``verify_index`` re-derives every invariant the build guarantees, from the
bytes on disk — the tool an operator runs after a suspect copy/restore:

per segment (parallel, one Ray task per segment):
  * term dictionary strictly sorted, df > 0, blob ranges in-bounds and
    exactly tiling postings.bin
  * full posting decode: doc_ids strictly increasing within each term,
    per-term Σtf == dictionary sum_tf, posting count == meta n_postings
  * doc stats: distinct docs == meta n_docs, Σ doc_len == meta sum_dl,
    every posting of one doc carries the same dl
  * positional segments: sidecar ranges tile positions.bin, per-posting
    position count == tf, positions strictly increasing within a posting

index level:
  * every manifest segment dir exists and its meta seg_id matches
  * doc_id sets are disjoint across runs within one doc-shard (the
    incremental invariant merge relies on)
  * manifest n_docs/sum_dl equal the per-segment sums

Returns a report dict; raises ``IndexCorruption`` listing every finding
when anything fails (an operator wants ALL findings, not the first).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.codec import decode_positions, decode_segment
from ..state.manifest import Manifest
from .segment import SegmentReader


class IndexCorruption(Exception):
    pass


def _check_segment(seg_dir: str) -> dict:
    problems: list[str] = []
    r = SegmentReader(seg_dir)
    terms = r.terms
    if len(terms) != r.meta["n_terms"]:
        problems.append(f"n_terms {len(terms)} != meta {r.meta['n_terms']}")
    if len(terms) > 1 and not (terms[:-1] < terms[1:]).all():
        problems.append("term dictionary not strictly sorted")
    if (r.dfs <= 0).any():
        problems.append("df <= 0 in dictionary")
    # blob ranges must tile postings.bin exactly
    ends = r.offsets + r.lengths
    if len(terms):
        if int(r.offsets[0]) != 0 or (r.offsets[1:] != ends[:-1]).any():
            problems.append("posting blob ranges do not tile postings.bin")
        if int(ends[-1]) != r.meta["postings_bytes"]:
            problems.append("posting blob end != postings_bytes")
    try:
        ids, tfs, dls = decode_segment(r._post, r.dfs)
    except Exception as e:  # df/blob mismatch surfaces here
        problems.append(f"posting decode failed: {e}")
        return {"seg_dir": seg_dir, "problems": problems, "doc_ids": np.empty(0, np.uint64)}
    if len(ids) != r.meta["n_postings"]:
        problems.append(f"decoded postings {len(ids)} != meta {r.meta['n_postings']}")
    bounds = np.zeros(len(r.dfs) + 1, dtype=np.int64)
    np.cumsum(r.dfs, out=bounds[1:])
    within = np.ones(len(ids), dtype=bool)
    within[bounds[:-1]] = False  # first posting of each term exempt
    if within.any() and (ids[within] <= ids[np.flatnonzero(within) - 1]).any():
        problems.append("doc_ids not strictly increasing within a term")
    sum_tf = np.add.reduceat(tfs, bounds[:-1]) if len(ids) else np.empty(0, np.uint64)
    import pyarrow.parquet as pq

    dict_sum_tf = pq.read_table(os.path.join(seg_dir, "terms.parquet"))["sum_tf"].to_numpy(
        zero_copy_only=False
    )
    if len(ids) and not (sum_tf == dict_sum_tf).all():
        problems.append("per-term Σtf != dictionary sum_tf")
    uniq, first_idx = np.unique(ids, return_index=True) if len(ids) else (ids, ids)
    if len(uniq) != r.meta["n_docs"]:
        problems.append(f"distinct docs {len(uniq)} != meta {r.meta['n_docs']}")
    if len(ids):
        if int(dls[first_idx].astype(np.uint64).sum()) != r.meta["sum_dl"]:
            problems.append("Σ doc_len != meta sum_dl")
        # same dl everywhere a doc appears
        order = np.argsort(ids, kind="stable")
        sid, sdl = ids[order], dls[order]
        same_doc = sid[1:] == sid[:-1]
        if (sdl[1:][same_doc] != sdl[:-1][same_doc]).any():
            problems.append("inconsistent dl across a doc's postings")
    if r.has_positions:
        pends = r.pos_offsets + r.pos_lengths
        if len(terms):
            if int(r.pos_offsets[0]) != 0 or (r.pos_offsets[1:] != pends[:-1]).any():
                problems.append("position ranges do not tile positions.bin")
            if int(pends[-1]) != r.meta.get("positions_bytes", -1):
                problems.append("position end != positions_bytes")
        try:
            pos = decode_positions(r._positions, tfs)
            cnt = np.zeros(len(ids), dtype=np.int64)
            np.cumsum(tfs[:-1].astype(np.int64), out=cnt[1:])
            inner = np.ones(len(pos), dtype=bool)
            inner[cnt] = False
            if inner.any() and (pos[inner] <= pos[np.flatnonzero(inner) - 1]).any():
                problems.append("positions not strictly increasing within a posting")
        except Exception as e:
            problems.append(f"position decode failed: {e}")
    return {"seg_dir": seg_dir, "problems": problems, "doc_ids": uniq}


def verify_index(index_dir: str) -> dict:
    """Full integrity check; returns {segments, n_docs, problems: []} or
    raises IndexCorruption listing every finding."""
    from .tombstones import find_superseded

    man = Manifest.load(index_dir)
    problems: list[str] = []
    # upsert tombstones: duplicate doc_ids across runs are LEGITIMATE when a
    # later run supersedes them (pending merge) — only unexplained
    # duplicates are corruption
    tomb = find_superseded(man)
    tomb_ref = ray.put(
        {rid: t["doc_ids"] for rid, t in tomb.items()}
    )
    # one work item per DOC-SHARD: all runs' segments of a shard are checked
    # inside one task (doc sets stay in the driver's tasks, never gathered —
    # the same partitioning assumption merge relies on)
    shards: dict[int, list[str]] = {}
    for run_id, run in man.complete_runs().items():
        for s in run["segments"]:
            d = os.path.join(index_dir, s["dir"])
            if not os.path.isdir(d):
                problems.append(f"missing segment dir {s['dir']}")
            else:
                shards.setdefault(int(s["seg_id"]), []).append(d)
    work = [{"seg_id": sid, "dirs": dirs} for sid, dirs in sorted(shards.items())]

    def do(batch: pa.Table) -> pa.Table:
        import json as _json

        from .tombstones import run_of_segment_dir

        tomb_ids = ray.get(tomb_ref)
        rows = []
        for sid, dirs in zip(batch["seg_id"].to_pylist(), batch["dirs"].to_pylist()):
            shard_problems: list[str] = []
            seen = np.empty(0, dtype=np.uint64)
            n_docs = 0
            n_superseded = 0
            for d in dirs:
                rep = _check_segment(d)
                shard_problems.extend(f"{d}: {p}" for p in rep["problems"])
                with open(os.path.join(d, "meta.json")) as f:
                    meta = _json.load(f)
                if meta.get("seg_id") != sid:
                    shard_problems.append(
                        f"{d}: meta seg_id {meta.get('seg_id')} != manifest {sid}"
                    )
                doc_ids = rep["doc_ids"]
                dead = tomb_ids.get(run_of_segment_dir(d))
                if dead is not None:
                    alive = ~np.isin(doc_ids, dead, assume_unique=True)
                    n_superseded += int((~alive).sum())
                    doc_ids = doc_ids[alive]
                dup = np.intersect1d(seen, doc_ids, assume_unique=True)
                if len(dup):
                    shard_problems.append(
                        f"seg_id {sid}: {len(dup)} duplicate doc_ids across runs "
                        "not explained by upsert tombstones"
                    )
                seen = np.union1d(seen, doc_ids)
                n_docs += len(doc_ids)
            rows.append(
                {
                    "seg_id": sid,
                    "problems": shard_problems,
                    "n_docs": n_docs,
                    "n_superseded": n_superseded,
                }
            )
        return pa.Table.from_pylist(rows)

    n_docs = 0
    n_superseded = 0
    if work:
        seg_reports = (
            ray.data.from_items(work)
            .map_batches(do, batch_format="pyarrow", batch_size=1)
            .to_pandas()
        )
        for _, row in seg_reports.iterrows():
            problems.extend(row["problems"])
            n_docs += int(row["n_docs"])
            n_superseded += int(row["n_superseded"])
    live_expect = man.n_docs - sum(t["n_nonempty"] for t in tomb.values())
    if n_docs != live_expect:
        problems.append(
            f"Σ live segment docs {n_docs} != manifest n_docs minus tombstones {live_expect}"
        )
    report = {
        "segments": len(work),
        "n_docs": n_docs,
        "n_superseded": n_superseded,
        "problems": problems,
    }
    if problems:
        raise IndexCorruption("; ".join(problems))
    return report
