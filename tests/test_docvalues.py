"""ES filter context + aggregations on per-actor doc-values (index/query.py).

A filter restricts the candidate docs without touching scores (ES filter vs
must); stats/histogram aggregate a numeric doc-value over ALL matching docs.
Oracles: the naive BM25 scorer post-filtered for search, and direct pandas
computation over the documents table for the aggregations."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions.analysis import get_analyzer
from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.oracle import BM25Oracle
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()


@pytest.fixture(scope="module")
def dv_engine(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("dv") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=4, doc_id_col="doc_id",
            content_col="text", store_cols=("lang", "n_chars", "source"),
        ),
    )
    eng = QueryEngine(idx)
    yield eng
    eng.close()


@pytest.fixture(scope="module")
def ws_oracle(docs):
    return BM25Oracle(
        get_analyzer("whitespace"),
        docs["doc_id"].to_numpy().astype("uint64"),
        __import__("pyarrow").array(docs["text"], type=__import__("pyarrow").large_string()),
    )


def _matches(docs, text, mode="or"):
    """Row mask of docs matching the whitespace-analyzed query."""
    terms = set(text.lower().split())
    toks = docs["text"].str.lower().str.split()
    if mode == "and":
        return toks.apply(lambda ts: terms <= set(ts))
    return toks.apply(lambda ts: bool(terms & set(ts)))


FILTER_CASES = [
    ("hash join query", {"field": "lang", "eq": "en"}, lambda d: d["lang"] == "en"),
    ("vector scan", {"field": "lang", "in": ["fr", "de"]}, lambda d: d["lang"].isin(["fr", "de"])),
    ("merge sort", {"field": "n_chars", "gte": 200, "lt": 900},
     lambda d: (d["n_chars"] >= 200) & (d["n_chars"] < 900)),
    # r5: keyword-prefix and not-equal clauses in filter context
    ("hash join", {"field": "source", "prefix": "src1"},
     lambda d: d["source"].str.startswith("src1")),
    ("vector scan", {"field": "lang", "neq": "en"},
     lambda d: d["lang"] != "en"),
]


@pytest.mark.parametrize("method", ["exhaustive", "bmw"])
def test_filtered_search_matches_postfiltered_oracle(dv_engine, ws_oracle, docs, method):
    for text, clause, pred in FILTER_CASES:
        got = dv_engine.search_filtered(text, clause, k=10, method=method)
        allowed = set(docs.loc[pred(docs), "doc_id"].astype(np.uint64))
        full = ws_oracle.search(text, k=ws_oracle.N, mode="or")
        want = [(d, s) for d, s in full if d in allowed][:10]
        assert got == want, (method, text, clause)


def test_filter_never_changes_scores(dv_engine, ws_oracle):
    """Scores of surviving docs equal the UNFILTERED scores bit-for-bit (ES
    filter context does not contribute to relevance)."""
    got = dv_engine.search_filtered("hash join query", {"field": "lang", "eq": "zh"}, k=5)
    unfiltered = dict(ws_oracle.search("hash join query", k=ws_oracle.N, mode="or"))
    for d, s in got:
        assert s == unfiltered[d]


def test_combined_filter_clauses(dv_engine, docs, ws_oracle):
    got = dv_engine.search_filtered(
        "hash join", [{"field": "lang", "eq": "en"}, {"field": "n_chars", "gt": 500}], k=10
    )
    pred = (docs["lang"] == "en") & (docs["n_chars"] > 500)
    allowed = set(docs.loc[pred, "doc_id"].astype(np.uint64))
    full = ws_oracle.search("hash join", k=ws_oracle.N, mode="or")
    assert got == [(d, s) for d, s in full if d in allowed][:10]


def test_stats_under_query(dv_engine, docs):
    m = _matches(docs, "hash join query")
    sub = docs.loc[m, "n_chars"]
    got = dv_engine.stats("hash join query", "n_chars")
    assert got["count"] == int(m.sum())
    assert got["sum"] == pytest.approx(float(sub.sum()))
    assert got["min"] == float(sub.min()) and got["max"] == float(sub.max())
    assert got["avg"] == pytest.approx(float(sub.mean()))


def test_stats_and_mode_and_empty(dv_engine, docs):
    m = _matches(docs, "hash join", mode="and")
    got = dv_engine.stats("hash join", "n_chars", mode="and")
    assert got["count"] == int(m.sum())
    assert dv_engine.stats("zzzneverseen", "n_chars") is None


def test_histogram_under_query(dv_engine, docs):
    m = _matches(docs, "hash join query")
    sub = docs.loc[m, "n_chars"].to_numpy()
    want = {}
    for b in np.floor(sub / 250.0) * 250.0:
        want[float(b)] = want.get(float(b), 0) + 1
    got = dict(dv_engine.histogram("hash join query", "n_chars", 250.0))
    assert got == want


def test_cardinality_under_query(dv_engine, docs):
    """ES cardinality agg: exact distinct count of a doc-value over matches."""
    m = _matches(docs, "hash join query")
    want = docs.loc[m, "source"].nunique()
    assert dv_engine.cardinality("hash join query", "source") == want
    m_and = _matches(docs, "hash join", mode="and")
    assert (
        dv_engine.cardinality("hash join", "lang", mode="and")
        == docs.loc[m_and, "lang"].nunique()
    )
    assert dv_engine.cardinality("zzzneverseen", "lang") == 0


@pytest.fixture(scope="module")
def date_engine(sf_dir, tmp_path_factory):
    """documents + a derived ISO day column (deterministic from doc_id),
    stored as doc-values — the date_histogram test surface."""
    import pandas as pd
    import pyarrow as pa

    d = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    d["day"] = (
        pd.Timestamp("2024-01-01") + pd.to_timedelta(d["doc_id"] % 500, unit="D")
    ).dt.strftime("%Y-%m-%d")
    root = tmp_path_factory.mktemp("datedv")
    src = str(root / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(d, preserve_index=False), src)
    idx = str(root / "idx")
    build_index(
        src,
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=4, doc_id_col="doc_id",
            content_col="text", store_cols=("day",),
        ),
    )
    eng = QueryEngine(idx)
    yield eng, d
    eng.close()


@pytest.mark.parametrize("interval,chars", [("year", 4), ("month", 7), ("day", 10)])
def test_date_histogram_under_query(date_engine, interval, chars):
    eng, d = date_engine
    m = _matches(d, "hash join query")
    want = sorted(d.loc[m, "day"].str.slice(0, chars).value_counts().items())
    got = eng.date_histogram("hash join query", "day", interval=interval)
    assert got == [(k, int(n)) for k, n in want]


def test_date_histogram_bad_interval(date_engine):
    with pytest.raises(ValueError):
        date_engine[0].date_histogram("hash", "day", interval="week")


def test_significant_terms_jlh(dv_engine, docs):
    """JLH-scored over-representation of lang values in the match set vs the
    whole corpus — exact pandas oracle, same formula."""
    m = _matches(docs, "hash join query")
    fg = docs.loc[m, "lang"].value_counts()
    bg = docs["lang"].value_counts()
    fgt, bgt = int(fg.sum()), int(bg.sum())
    want = []
    for v, n in fg.items():
        fgp, bgp = n / fgt, bg[v] / bgt
        want.append(
            {"value": v, "fg_count": int(n), "bg_count": int(bg[v]),
             "score": (fgp - bgp) * fgp / bgp}
        )
    want.sort(key=lambda r: (-r["score"], r["value"]))
    got = dv_engine.significant_terms("hash join query", "lang", top=5)
    assert got == want[:5]
    assert dv_engine.significant_terms("zzzneverseen", "lang") == []


def test_top_hits_by_bucket(dv_engine, ws_oracle, docs):
    """Terms agg + top_hits: per-lang match counts and top-2 docs by score ==
    the full oracle ranking restricted per bucket."""
    text = "hash join query"
    full = ws_oracle.search(text, k=ws_oracle.N, mode="or")
    lang_of = dict(zip(docs["doc_id"].astype(np.uint64), docs["lang"]))
    want_counts: dict = {}
    want_hits: dict = {}
    for d, s in full:
        v = lang_of[d]
        want_counts[v] = want_counts.get(v, 0) + 1
        if len(want_hits.setdefault(v, [])) < 2:
            want_hits[v].append((d, s))
    got = dv_engine.top_hits(text, "lang", n_hits=2, top=3)
    want_order = sorted(want_counts, key=lambda v: (-want_counts[v], v))[:3]
    assert [b["value"] for b in got] == want_order
    for b in got:
        assert b["count"] == want_counts[b["value"]]
        assert b["hits"] == want_hits[b["value"]], b["value"]
    assert dv_engine.top_hits("zzzneverseen", "lang") == []


@pytest.mark.parametrize(
    "modifier",
    ["none", "log", "log1p", "log2p", "ln", "ln1p", "ln2p", "square", "sqrt",
     "reciprocal"],
)
def test_function_score_field_value_factor(dv_engine, ws_oracle, docs, modifier):
    """function_score re-rank: BM25 · (weight · modifier(factor · n_chars))
    over ALL matches == driver-side recompute from the full oracle ranking.
    The log family is base-10 exactly as Lucene's FieldValueFactorFunction
    (ES log1p == log10(1+x), NOT numpy log1p)."""
    text = "hash join query"
    weight, factor = 0.5, 2.0
    full = ws_oracle.search(text, k=ws_oracle.N, mode="or")
    nc = dict(zip(docs["doc_id"].astype(np.uint64), docs["n_chars"].astype(float)))
    mod = {
        "none": lambda v: v,
        "log": np.log10,
        "log1p": lambda v: np.log10(v + 1.0),
        "log2p": lambda v: np.log10(v + 2.0),
        "ln": np.log,
        "ln1p": np.log1p,
        "ln2p": lambda v: np.log(v + 2.0),
        "square": lambda v: v * v,
        "sqrt": np.sqrt,
        "reciprocal": lambda v: 1.0 / v,
    }[modifier]
    boosted = [(d, s * (weight * float(mod(factor * nc[d])))) for d, s in full]
    boosted.sort(key=lambda ds: (-ds[1], ds[0]))
    got = dv_engine.search_boosted(
        text, "n_chars", modifier=modifier, weight=weight, factor=factor, k=10
    )
    assert got == boosted[:10], modifier


def test_function_score_bad_modifier(dv_engine):
    with pytest.raises(Exception):
        dv_engine.search_boosted("hash join", "n_chars", modifier="exp", k=5)


@pytest.mark.parametrize("fn", ["gauss", "exp", "linear"])
def test_function_score_decay(dv_engine, ws_oracle, docs, fn):
    """Decay re-rank: BM25 · decay_fn(n_chars) over ALL matches == the
    driver-side recompute (ES semantics: value at distance scale beyond
    offset scores exactly decay)."""
    from elasticsearch_data_import_handler_ray.index.query import decay_apply

    text = "hash join query"
    origin, scale, offset, decay = 400.0, 150.0, 25.0, 0.4
    full = ws_oracle.search(text, k=ws_oracle.N, mode="or")
    nc = dict(zip(docs["doc_id"].astype(np.uint64), docs["n_chars"].astype(float)))

    # recompute through the same kernel (math.exp vs SIMD np.exp differ by
    # 1 ULP); the decay SEMANTICS are pinned independently by
    # test_decay_scores_exact_at_scale.
    def mult(v: float) -> float:
        return float(
            decay_apply(np.array([v]), fn, origin, scale, offset, decay)[0]
        )

    boosted = [(d, s * mult(nc[d])) for d, s in full]
    boosted.sort(key=lambda ds: (-ds[1], ds[0]))
    got = dv_engine.search_decay(
        text, "n_chars", fn=fn, origin=origin, scale=scale, offset=offset,
        decay=decay, k=10,
    )
    assert got == boosted[:10], fn


def test_decay_scores_exact_at_scale():
    """The defining ES property, checked directly on the kernel: multiplier
    is 1 inside offset and exactly `decay` at offset+scale."""
    from elasticsearch_data_import_handler_ray.index.query import decay_apply

    for fn in ("gauss", "exp", "linear"):
        m = decay_apply(
            np.array([100.0, 110.0, 160.0]), fn, origin=100.0, scale=50.0,
            offset=10.0, decay=0.33,
        )
        assert m[0] == pytest.approx(1.0)
        assert m[1] == pytest.approx(1.0)   # inside offset
        assert m[2] == pytest.approx(0.33)  # at offset + scale


def test_decay_param_validation(dv_engine):
    with pytest.raises(ValueError, match="scale"):
        dv_engine.search_decay("hash", "n_chars", scale=0.0)
    with pytest.raises(ValueError, match="decay"):
        dv_engine.search_decay("hash", "n_chars", scale=10.0, decay=1.5)
    with pytest.raises(ValueError, match="fn"):
        dv_engine.search_decay("hash", "n_chars", fn="cosine", scale=10.0)


def test_percentiles_under_query(dv_engine, docs):
    """ES percentiles agg (exact discrete quantiles): value at 1-based rank
    ceil(p/100 · n) over sorted matching doc-values — same definition as
    SQL quantile_disc, recomputed here from a pandas oracle."""
    for text, mode in [("hash join query", "or"), ("hash join", "and")]:
        m = _matches(docs, text, mode=mode)
        sub = np.sort(docs.loc[m, "n_chars"].to_numpy().astype(np.float64))
        n = len(sub)
        got = dv_engine.percentiles(text, "n_chars", ps=[25, 50, 75, 95, 99], mode=mode)
        for p in (25, 50, 75, 95, 99):
            want = float(sub[max(1, int(np.ceil(p / 100.0 * n))) - 1])
            assert got[float(p)] == want, (text, p)
    assert dv_engine.percentiles("zzzneverseen", "n_chars") == {}


def test_search_sorted_by_field(dv_engine, docs):
    """ES sort-by-field: matching docs ordered by doc-value, tie doc_id asc."""
    m = _matches(docs, "hash join query")
    sub = docs.loc[m, ["doc_id", "n_chars"]].copy()
    sub["doc_id"] = sub["doc_id"].astype(np.uint64)
    for descending in (True, False):
        got = dv_engine.search_sorted_by(
            "hash join query", "n_chars", k=15, descending=descending
        )
        want = sub.sort_values(
            ["n_chars", "doc_id"], ascending=[not descending, True], kind="mergesort"
        ).head(15)
        assert got == list(zip(want["doc_id"].tolist(), want["n_chars"].astype(float).tolist())), descending
    assert dv_engine.search_sorted_by("zzzneverseen", "n_chars", k=5) == []


def test_collapse_matches_pandas_oracle(dv_engine, docs, ws_oracle):
    """Field collapsing: top-k with one best hit per doc-value — engine ==
    a pandas recompute over the naive scorer's full match set (scores
    bit-identical; best-per-value = max score, tie lower doc_id)."""
    for text, mode in [("table scan", "or"), ("hash join", "and"), ("query", "or")]:
        got = dv_engine.collapse(text, "source", k=5, mode=mode)
        full = ws_oracle.search(text, k=10**6, mode=mode)
        if not full:
            assert got == []
            continue
        import pandas as pd

        df = pd.DataFrame(full, columns=["doc_id", "score"]).merge(
            docs[["doc_id", "source"]], on="doc_id"
        )
        df = df.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        best = df.groupby("source", sort=False).head(1)
        best = best.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort").head(5)
        want = [
            {"doc_id": int(r.doc_id), "score": float(r.score), "value": r.source}
            for r in best.itertuples()
        ]
        assert got == want, (text, mode)
        # collapsing really deduped: plain top-5 has repeated sources here
        plain = [d for d, _ in dv_engine.search(text, k=5, mode=mode)]
        src = docs.set_index("doc_id").loc[plain, "source"]
        if src.duplicated().any():
            assert len({g["value"] for g in got}) == len(got)


def test_hybrid_rrf_search(dv_engine, docs, ws_oracle, sf_dir):
    """Hybrid BM25⊕cosine under RRF: fusion == a direct recompute from the
    two oracle rankings; pure rrf_fuse unit semantics pinned too."""
    import pyarrow.parquet as pq_

    from elasticsearch_data_import_handler_ray.pipelines.hybrid import (
        hybrid_search,
        rrf_fuse,
    )

    # unit: disjoint lists, overlap boosts, tie → lower id
    assert rrf_fuse([[1, 2], [2, 3]], k=3) == [
        (2, 1 / 62 + 1 / 61), (1, 1 / 61), (3, 1 / 62)
    ]
    assert rrf_fuse([[5], [5]], k=1) == [(5, 2 / 61)]

    import ray.data

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    emb = pq_.read_table(emb_path)
    qvec = np.array(emb["embedding"][7].as_py(), dtype=np.float64)
    got = hybrid_search(
        dv_engine, ray.data.read_parquet(emb_path), "table scan", qvec,
        k=10, n_each=30,
    )
    # oracle: lexical ranking from the naive scorer; vector ranking directly
    lex = [d for d, _ in ws_oracle.search("table scan", k=30)]
    M = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(emb["vec_id"].to_pylist(), dtype=np.int64)
    cos = (M @ qvec) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qvec))
    order = np.lexsort((ids, -cos))[:30]
    vec = ids[order].tolist()
    want = rrf_fuse([lex, vec], k=10)
    assert got == want
    assert got[0][0] == 7  # the query vector's own doc tops the vector list


def test_pipeline_agg_matches_pandas(dv_engine, docs):
    """Pipeline aggs over histogram buckets == direct pandas window ops."""
    rows = dv_engine.pipeline_agg("table scan", "n_chars", 200.0, window=2)
    m = _matches(docs, "table scan")
    h = (
        (docs[m]["n_chars"] // 200 * 200)
        .value_counts()
        .sort_index()
    )
    assert [r["bucket"] for r in rows] == [float(b) for b in h.index]
    assert [r["n"] for r in rows] == h.tolist()
    assert [r["cumulative_sum"] for r in rows] == h.cumsum().tolist()
    assert rows[0]["derivative"] is None
    assert [r["derivative"] for r in rows][1:] == h.diff().dropna().astype(int).tolist()
    want_ma = h.rolling(2, min_periods=1).mean().tolist()
    assert [r["moving_avg"] for r in rows] == want_ma


def test_hybrid_query_string_and_knn_filter(dv_engine, docs, ws_oracle, sf_dir):
    """Per-retriever controls: query_string=True drives the lexical half
    through the Lucene surface; knn_filters masks the vector half BEFORE
    scoring (the ES knn.filter + query combined-search shape)."""
    import pyarrow.parquet as pq_
    import ray.data

    from elasticsearch_data_import_handler_ray.pipelines.hybrid import (
        hybrid_search,
        rrf_fuse,
    )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    emb = pq_.read_table(emb_path)
    qvec = np.array(emb["embedding"][7].as_py(), dtype=np.float64)
    flt = [{"field": "label", "gte": 1}, {"field": "label", "lte": 6}]
    got = hybrid_search(
        dv_engine, ray.data.read_parquet(emb_path), "table AND scan", qvec,
        k=10, n_each=30, query_string=True, knn_filters=flt,
    )
    # oracle: lexical via the engine's own (oracle-pinned) query_string;
    # vector via direct cosine over the label-filtered rows
    lex = [d for d, _ in dv_engine.query_string("table AND scan", k=30)]
    lab = np.array(emb["label"].to_pylist())
    keep = (lab >= 1) & (lab <= 6)
    M = np.array(emb["embedding"].to_pylist(), dtype=np.float64)[keep]
    ids = np.array(emb["vec_id"].to_pylist(), dtype=np.int64)[keep]
    cos = (M @ qvec) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qvec))
    order = np.lexsort((ids, -cos))[:30]
    vec = ids[order].tolist()
    assert got == rrf_fuse([lex, vec], k=10)
    assert got  # non-vacuous
    # the knn filter actually bites: unfiltered vector list differs
    assert vec != ids.tolist()[:30]


def test_sorted_by_search_after_pagination(dv_engine, docs):
    """Field-sorted search_after: walking pages by (value, doc_id) cursor
    reassembles the full field-ordered match list, both directions."""
    text = "hash join query"
    m = docs[_matches(docs, text)]
    for descending in (True, False):
        full = dv_engine.search_sorted_by(text, "n_chars", k=len(m),
                                          descending=descending)
        pages, after = [], None
        while True:
            page = dv_engine.search_sorted_by(
                text, "n_chars", k=7, descending=descending, after=after)
            if not page:
                break
            pages.extend(page)
            after = (page[-1][1], page[-1][0])  # (value, doc_id)
        assert pages == full, descending
