"""Frequency sketches for corpus statistics at 100 TB: Count-Min heavy
hitters (Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications").

Why a sketch when exact term counting exists (index/postings_global.py):
exact global counts cost a corpus-wide shuffle keyed by term; the sketch
needs NO shuffle at all — every batch folds its tokens into a fixed
(depth × width) uint64 grid, grids add elementwise, and the driver merges
B tiny grids (one per block) plus per-batch LOCAL top candidates. Memory is
O(depth·width) regardless of vocabulary, and the classic guarantee holds:
est(t) ≥ true(t), est(t) ≤ true(t) + εN with probability 1-δ for
width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

Candidate tracking: CMS alone cannot ENUMERATE heavy hitters, so each batch
also emits its local top-``track`` terms by batch count; any term with global
frequency ≥ N/track must be a local top-``track`` term in at least one batch
(pigeonhole on batch shares), so the candidate union (≤ B·track strings, not
the vocabulary) covers every true heavy hitter at that threshold. The driver
estimates each candidate from the merged grid and returns the top-k."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_SEEDS = np.uint64(0x9E3779B97F4A7C15)


def _cms_rows(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) bucket indices from one 64-bit hash per token: row i uses
    an independent mix (multiply-shift with odd constants derived from the
    golden ratio — public folklore hashing, pairwise-independent enough for
    the CMS bound in practice)."""
    out = np.empty((depth, len(hashes)), dtype=np.int64)
    h = hashes.astype(np.uint64)
    for i in range(depth):
        mixed = (h * (_SEEDS + np.uint64(2 * i + 1))) >> np.uint64(17)
        out[i] = (mixed % np.uint64(width)).astype(np.int64)
    return out


def cms_heavy_hitters(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    k: int = 20,
    width: int = 2048,
    depth: int = 5,
    track: int = 64,
) -> pa.Table:
    """Top-``k`` most frequent whitespace tokens with Count-Min estimated
    counts: (term, est_count), est ≥ true, est ≤ true + (e/width)·N w.h.p.
    No shuffle — per-batch grids + local candidates reduce on the driver."""

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        arr = flat.to_numpy(zero_copy_only=False)
        grid = np.zeros((depth, width), dtype=np.uint64)
        if len(arr):
            hashes = pd.util.hash_array(arr)
            rows = _cms_rows(hashes, depth, width)
            for i in range(depth):
                np.add.at(grid[i], rows[i], 1)
            vc = pd.Series(arr).value_counts().head(track)
            cand = vc.index.to_numpy(dtype=object)
        else:
            cand = np.array([], dtype=object)
        return pa.table(
            {
                "grid": pa.array([grid.reshape(-1)], type=pa.list_(pa.uint64())),
                "cands": pa.array([list(map(str, cand))], type=pa.list_(pa.string())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    grid = np.zeros(depth * width, dtype=np.uint64)
    cands: set[str] = set()
    # one row per BATCH reaches the driver: depth·width u64 + ≤track strings
    for t in ray.get(parts.to_arrow_refs()):
        for row_grid, row_cands in zip(t["grid"].to_pylist(), t["cands"].to_pylist()):
            grid += np.asarray(row_grid, dtype=np.uint64)
            cands.update(row_cands)
    grid = grid.reshape(depth, width)
    if not cands:
        return pa.table(
            {"term": pa.array([], pa.string()), "est_count": pa.array([], pa.int64())}
        )
    cand_arr = np.array(sorted(cands), dtype=object)
    rows = _cms_rows(pd.util.hash_array(cand_arr), depth, width)
    est = grid[np.arange(depth)[:, None], rows].min(axis=0).astype(np.int64)
    order = np.lexsort((cand_arr, -est))[:k]
    return pa.table(
        {
            "term": pa.array(cand_arr[order].tolist(), type=pa.string()),
            "est_count": pa.array(est[order], type=pa.int64()),
        }
    )
