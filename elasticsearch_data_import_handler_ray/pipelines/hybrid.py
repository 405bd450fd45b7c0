"""Hybrid lexical + vector search with Reciprocal Rank Fusion — the ES 8
`knn` + `query` combined-search shape.

Two independent retrievers run side by side — BM25 top-n through the shard
actor pool (index/query.py) and exact-cosine top-n over the embedding table
(stages/ann.py: broadcast query matrix, per-batch matmul partials) — and the
driver fuses the two RANKINGS with RRF:

    score(d) = Σ_lists 1 / (k_rrf + rank_list(d))      (k_rrf = 60, the
                                                        standard constant)

RRF is rank-based on purpose: BM25 scores and cosine similarities live on
incomparable scales, and rank fusion needs no per-corpus calibration (the
reason ES made it the default hybrid combiner). Both retrievers are already
scale-shaped (actor-pool scatter; streaming matmul) — the fusion itself
touches only 2·n candidate ids on the driver."""

from __future__ import annotations

import numpy as np


def rrf_fuse(
    rankings: list[list[int]], *, k: int = 10, k_rrf: int = 60
) -> list[tuple[int, float]]:
    """Fuse ranked id lists (best first): top-``k`` by RRF score, ties by
    ascending id. Pure and deterministic — the piece unit tests pin."""
    scores: dict[int, float] = {}
    for ranking in rankings:
        for rank, d in enumerate(ranking, 1):
            scores[d] = scores.get(d, 0.0) + 1.0 / (k_rrf + rank)
    out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(int(d), float(s)) for d, s in out]


def hybrid_search(
    engine,
    emb_ds,
    text: str,
    query_vec: np.ndarray,
    *,
    k: int = 10,
    n_each: int = 50,
    k_rrf: int = 60,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    mode: str = "or",
    query_string: bool = False,
    knn_filters: list[dict] | dict | None = None,
) -> list[tuple[int, float]]:
    """BM25(text) ⊕ cosine(query_vec) under RRF. ``engine`` is a QueryEngine
    whose doc ids share the embedding table's ``id_col`` space. Returns
    (doc_id, rrf_score) — rank fusion, so no BM25/cosine calibration.

    ``query_string=True`` parses ``text`` as the full Lucene mini-language
    for the lexical half (the ES ``query`` clause is arbitrary DSL there
    too — ranges/_exists_ give it a filter context of its own).
    ``knn_filters`` is the vector half's ES ``knn.filter``: the engine-wide
    clause shape masked BEFORE scoring over the embedding table's columns
    (per-retriever filters, exactly the ES combined-search shape)."""
    from ..stages.ann import knn_bruteforce, knn_filtered

    if query_string:
        lex = [d for d, _ in engine.query_string(text, k=n_each)]
    else:
        lex = [d for d, _ in engine.search(text, k=n_each, mode=mode)]
    # Sentinel query_id -1: knn_bruteforce drops rows whose id equals the
    # query id (self-match exclusion for doc-to-doc knn). A hybrid query
    # vector is NOT a corpus row, so no real vec_id may be excluded — -1
    # can never collide with the non-negative vec_id space.
    qids = np.array([-1], dtype=np.int64)
    qm = np.asarray(query_vec, dtype=np.float64).reshape(1, -1)
    if knn_filters is not None:
        knn = knn_filtered(
            emb_ds, qids, qm, filters=knn_filters, id_col=id_col, emb_col=emb_col, k=n_each
        ).to_pandas()
    else:
        knn = knn_bruteforce(
            emb_ds, qids, qm, id_col=id_col, emb_col=emb_col, k=n_each
        ).to_pandas()
    vec = knn.sort_values("rank")["neighbor_id"].astype(int).tolist()
    return rrf_fuse([lex, vec], k=k, k_rrf=k_rrf)
