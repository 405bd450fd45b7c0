"""Percolator — the ES percolate API rebuilt Ray-Data-first.

Percolation inverts search: queries are REGISTERED up front (the small,
stable side); documents stream through, and each emits the ids of the
registered queries it matches (the alerting / routing-at-ingest primitive).

Scale shape: the query set is prepared ONCE on the driver and broadcast via
``ray.put``; docs flow through a stateless task-pool ``map_batches`` (an
actor pool would cap fused upstream stages — the repo-wide lesson). Each
batch tokenizes its documents ONE time with the shared analyzer and probes
every registered query with a single vectorized term join (pandas hash merge
on distinct (doc, term) pairs) + a per-(doc, query) hit count — no
per-(doc, query) Python except the final phrase-adjacency confirm, which
runs only on docs that already contain every phrase term.

Supported query shapes (same contract as QueryEngine): mode "or" (any term),
"and" (all terms), "phrase" (all terms + exact adjacency)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.analysis import get_analyzer


def _prepare(queries: list[dict], analyzer: str):
    """→ (meta per query, (query_idx, term) DataFrame). Queries with no
    analyzable tokens can never match and are dropped (ES behavior)."""
    az = get_analyzer(analyzer)
    meta: list[dict] = []
    qi_terms: list[tuple[int, str]] = []
    for q in queries:
        toks = az.analyze_query(q["text"])
        if not toks:
            continue
        uniq = sorted(set(toks))
        qi = len(meta)
        meta.append(
            {
                "query_id": q["query_id"],
                "mode": q.get("mode", "or"),
                "n_terms": len(uniq),
                "phrase": toks if q.get("mode") == "phrase" else None,
            }
        )
        qi_terms.extend((qi, t) for t in uniq)
    qdf = pd.DataFrame(qi_terms, columns=["qi", "term"])
    return meta, qdf


def _match_phrase_in(toks: list[str], phrase: list[str]) -> bool:
    n = len(phrase)
    return any(toks[i : i + n] == phrase for i in range(len(toks) - n + 1))


def percolate(
    ds,
    queries: list[dict],
    *,
    analyzer: str = "code",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """→ Dataset of (doc_id, query_id) rows: every (document, registered
    query) match. ``queries``: [{"query_id", "text", "mode": or|and|phrase}].
    """
    meta, qdf = _prepare(queries, analyzer)
    if not meta:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "query_id": pa.array([], pa.string())})
        )
    prep_ref = ray.put((meta, qdf, analyzer))

    def probe(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "query_id": pa.array([], pa.string())}
        )
        if len(t) == 0:
            return empty
        meta, qdf, az_name = ray.get(prep_ref)
        az = get_analyzer(az_name)
        tok_list = az.tokens_of(t[text_col].combine_chunks() if isinstance(
            t[text_col], pa.ChunkedArray) else t[text_col])
        import pyarrow.compute as pc

        flat = pc.list_flatten(tok_list)
        parent = pc.list_parent_indices(tok_list).to_numpy(zero_copy_only=False)
        terms = flat.to_numpy(zero_copy_only=False)
        pairs = pd.DataFrame({"doc": parent, "term": terms}).drop_duplicates()
        hits = pairs.merge(qdf, on="term", how="inner")
        if hits.empty:
            return empty
        counts = hits.groupby(["doc", "qi"], sort=False).size().reset_index(name="k")
        need = np.array([m["n_terms"] for m in meta], dtype=np.int64)
        modes = np.array([0 if m["mode"] == "or" else 1 for m in meta])  # phrase counts as 1
        qi = counts["qi"].to_numpy()
        k = counts["k"].to_numpy()
        ok = np.where(modes[qi] == 0, k >= 1, k == need[qi])
        cand = counts[ok]
        doc_ids = t[id_col].to_numpy(zero_copy_only=False)
        qids = np.array([m["query_id"] for m in meta], dtype=object)
        is_phrase = np.array([m["phrase"] is not None for m in meta])
        cqi = cand["qi"].to_numpy()
        cdoc = cand["doc"].to_numpy()
        # non-phrase matches: fully vectorized emit
        plain = ~is_phrase[cqi]
        out_d = [doc_ids[cdoc[plain]].astype(np.int64)]
        out_q = [qids[cqi[plain]]]
        # phrase candidates (already contain every term): adjacency confirm —
        # the only per-row Python, bounded by the OUTPUT size, not the corpus
        toks_py: dict[int, list[str]] = {}
        pd_, pq_ = [], []
        for doc, q_idx in zip(cdoc[~plain].tolist(), cqi[~plain].tolist()):
            if doc not in toks_py:
                toks_py[doc] = [x for x in (tok_list[doc].as_py() or []) if x]
            if _match_phrase_in(toks_py[doc], meta[q_idx]["phrase"]):
                pd_.append(int(doc_ids[doc]))
                pq_.append(meta[q_idx]["query_id"])
        out_d.append(np.array(pd_, dtype=np.int64))
        out_q.append(np.array(pq_, dtype=object))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "query_id": pa.array(np.concatenate(out_q).astype(str) if sum(map(len, out_q)) else [], pa.string()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
