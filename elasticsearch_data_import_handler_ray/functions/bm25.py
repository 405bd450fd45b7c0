"""Okapi BM25 scoring math (k1=1.2, b=0.75 per BASELINE.json:6).

ONE implementation shared by the exact oracle (index/oracle.py), the
exhaustive shard scorer and the block-max WAND scorer — rank identity
(BASELINE.json:2) requires bit-identical float sequences, so every path calls
these functions with float64 inputs and accumulates per-document contributions
in ascending-term order.

idf uses the Lucene/ES non-negative form: ln(1 + (N - df + 0.5)/(df + 0.5)).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(N: int, df: np.ndarray | int) -> np.ndarray | float:
    df = np.asarray(df, dtype=np.float64)
    out = np.log1p((N - df + 0.5) / (df + 0.5))
    return out if out.ndim else float(out)


def tf_norm(
    tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B
) -> np.ndarray:
    """(tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl)) — vectorized float64.
    ``k1``/``b`` default to the spec constants but honor IndexConfig overrides
    (threaded from the manifest by QueryEngine / the oracle)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def contribution(
    idf_t: float, tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B
) -> np.ndarray:
    return idf_t * tf_norm(tf, dl, avgdl, k1, b)


def block_upper_bound(
    idf_t: float, max_tf: np.ndarray, min_dl: np.ndarray, avgdl: float,
    k1: float = K1, b: float = B,
) -> np.ndarray:
    """Per-block upper bound on any doc's contribution: tf_norm is increasing
    in tf and decreasing in dl, so (max_tf, min_dl) bounds every doc in the
    block for ANY avgdl (robust to avgdl drifting across incremental merges).
    A (1+1e-12) margin guards the theoretical 1-ulp rounding inversion."""
    return idf_t * tf_norm(max_tf, min_dl, avgdl, k1, b) * (1.0 + 1e-12)


def topk_indices(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, doc_id asc) — the tie rule of
    BASELINE.json:2. Deterministic for equal scores.

    Large candidate sets are partition-prefiltered to every row scoring ≥
    the k-th score (an EXACT cut: rows below it can never rank top-k, rows
    tying it all survive to the lexsort) — the full lexsort was the scorer
    profile's hottest line at 600k-doc shards."""
    n = len(scores)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if k < n > 4096:
        thresh = np.partition(scores, n - k)[n - k]
        keep = np.flatnonzero(scores >= thresh)
        order = np.lexsort((doc_ids[keep], -scores[keep]))
        return keep[order[:k]]
    order = np.lexsort((doc_ids, -scores))
    return order[:k]
