"""Round-5 ES aggregations: multi_terms, weighted_avg, adjacency_matrix,
rare_terms (index/query.py). Oracles are direct pandas/set computation over
the synthetic source table — the engine must agree bucket-for-bucket."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig

_WORDS = ["hash", "join", "query", "vector", "scan", "merge", "sort", "tree", "leaf"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(23)
    n = 600
    rows = {
        "doc_id": np.arange(1, n + 1, dtype=np.int64),
        "text": [
            " ".join(rng.choice(_WORDS, size=rng.integers(3, 9)))
            for _ in range(n)
        ],
        "lang": rng.choice(["py", "go", "rs"], size=n),
        "n_chars": rng.integers(10, 40, size=n),
        "weight": rng.integers(1, 6, size=n),
    }
    df = pd.DataFrame(rows)
    p = tmp_path_factory.mktemp("aggsrc") / "docs.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(p))
    return str(p), df


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory):
    path, _ = corpus
    idx = str(tmp_path_factory.mktemp("aggidx") / "idx")
    build_index(
        path, idx, mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=4, doc_id_col="doc_id",
            content_col="text", store_cols=("lang", "n_chars", "weight", "text"),
        ),
    )
    eng = QueryEngine(idx)
    yield eng
    eng.close()


def _match(df, text, mode="or"):
    terms = set(text.split())
    toks = df["text"].str.split()
    if mode == "and":
        return toks.apply(lambda ts: terms <= set(ts))
    return toks.apply(lambda ts: bool(terms & set(ts)))


def test_multi_terms(engine, corpus):
    _, df = corpus
    got = dict(engine.multi_terms("hash join", ["lang"], mode="and", top=100))
    m = df[_match(df, "hash join", "and")]
    want = m.groupby("lang").size().to_dict()
    assert {k[0]: n for k, n in got.items()} == want

    got2 = engine.multi_terms("vector scan", ["lang", "n_chars"], mode="or", top=5)
    m2 = df[_match(df, "vector scan", "or")]
    w2 = m2.groupby(["lang", "n_chars"]).size()
    pairs = sorted(
        ((l, c), int(n)) for (l, c), n in w2.items()
    )
    pairs.sort(key=lambda kv: (-kv[1], (kv[0][0], kv[0][1])))
    want_top = [((l, c), n) for (l, c), n in pairs[:5]]
    assert [((k[0], k[1]), n) for k, n in got2] == want_top


def test_weighted_avg(engine, corpus):
    _, df = corpus
    m = df[_match(df, "merge sort", "or")]
    want = float((m["n_chars"] * m["weight"]).sum() / m["weight"].sum())
    got = engine.weighted_avg("merge sort", "n_chars", "weight", mode="or")
    assert got == pytest.approx(want, rel=1e-12)


def test_weighted_avg_no_match_is_none(engine):
    assert engine.weighted_avg("zzz_absent_term", "n_chars", "weight") is None


def test_adjacency_matrix(engine, corpus):
    _, df = corpus
    got = engine.adjacency_matrix(
        {"a": ("hash join", "and"), "b": ("vector", "or"), "c": ("merge sort", "and")}
    )
    ma = _match(df, "hash join", "and")
    mb = _match(df, "vector", "or")
    mc = _match(df, "merge sort", "and")
    want = {
        "a": int(ma.sum()), "b": int(mb.sum()), "c": int(mc.sum()),
        "a&b": int((ma & mb).sum()), "a&c": int((ma & mc).sum()),
        "b&c": int((mb & mc).sum()),
    }
    assert got == want


def test_adjacency_matrix_empty_filter_zero_buckets(engine):
    got = engine.adjacency_matrix({"a": ("hash", "or"), "z": ("", "or")})
    assert got["z"] == 0 and got["a&z"] == 0 and got["a"] > 0


def test_rare_terms(engine, corpus):
    _, df = corpus
    for mdc in (1, 3):
        got = engine.rare_terms("hash join query", "n_chars", max_doc_count=mdc)
        m = df[_match(df, "hash join query", "or")]
        counts = m.groupby("n_chars").size()
        want = sorted(
            ((str(k), int(n)) for k, n in counts.items() if n <= mdc),
            key=lambda kv: (kv[1], kv[0]),
        )
        assert got == want


def test_significant_text(engine, corpus):
    """significant_text vs a direct pandas/set recompute: fg = docs in the
    match set containing the term (re-tokenized), bg = df, JLH with doc
    totals, (score desc, term asc)."""
    _, df = corpus
    got = engine.significant_text("hash join", mode="and", top=8, min_doc_count=2)
    m = df[_match(df, "hash join", "and")]
    toks_all = df["text"].str.split().apply(set)
    toks_fg = m["text"].str.split().apply(set)
    fgN, bgN = len(m), len(df)
    fg: dict = {}
    for ts in toks_fg:
        for t in ts:
            fg[t] = fg.get(t, 0) + 1
    want = []
    for t, n in fg.items():
        if n < 2:
            continue
        bg = int(toks_all.apply(lambda ts: t in ts).sum())
        fgp, bgp = n / fgN, bg / bgN
        want.append({"term": t, "fg_count": n, "bg_count": bg,
                     "score": (fgp - bgp) * fgp / bgp})
    want.sort(key=lambda r: (-r["score"], r["term"]))
    want = want[:8]
    assert [(r["term"], r["fg_count"], r["bg_count"]) for r in got] == [
        (r["term"], r["fg_count"], r["bg_count"]) for r in want
    ]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-12)


def test_significant_text_shard_sample_bounds_cost(engine):
    # sampled foreground: counts can only shrink, output stays deterministic
    full = engine.significant_text("hash join", mode="and", min_doc_count=1, top=100)
    samp = engine.significant_text("hash join", mode="and", min_doc_count=1,
                                   top=100, shard_sample=3)
    fg_full = {r["term"]: r["fg_count"] for r in full}
    for r in samp:
        assert r["fg_count"] <= fg_full.get(r["term"], 10**9)
    assert samp == engine.significant_text("hash join", mode="and",
                                           min_doc_count=1, top=100, shard_sample=3)


def test_terms_set_search(engine, corpus):
    """terms_set: matched-term count >= the doc's OWN weight value (1..5 —
    thresholds above the 3 query terms are legitimately unmatchable)."""
    from elasticsearch_data_import_handler_ray.functions import bm25

    _, df = corpus
    got = engine.terms_set_search("hash join query", "weight", k=15)
    terms = ["hash", "join", "query"]
    N = len(df)
    toks = df["text"].str.split()
    avgdl = toks.apply(len).sum() / N
    dfs = {t: int(toks.apply(lambda ts: t in ts).sum()) for t in terms}
    want = []
    for _, row in df.iterrows():
        ts = row["text"].split()
        present = [t for t in terms if t in ts]
        if len(present) < row["weight"]:
            continue
        score = 0.0
        for t in present:
            score += bm25.contribution(
                bm25.idf(N, dfs[t]), np.array([ts.count(t)]),
                np.array([len(ts)]), avgdl, 1.2, 0.75,
            )[0]
        want.append((score, int(row["doc_id"])))
    want.sort(key=lambda sd: (-sd[0], sd[1]))
    want = [(d, s) for s, d in want[:15]]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)
    assert got


def test_composite_agg_pagination(engine, corpus):
    """composite: ascending-key pages walked by cursor reassemble the full
    bucket list; last page returns after_key=None."""
    _, df = corpus
    m = df[_match(df, "hash join", "or")]
    want = (
        m.groupby(["lang", "n_chars"]).size().reset_index(name="doc_count")
        .sort_values(["lang", "n_chars"]).to_dict("records")
    )
    got, after, rounds = [], None, 0
    while True:
        rows, after = engine.composite_agg(
            "hash join", ["lang", "n_chars"], mode="or", size=5, after=after
        )
        got.extend(rows)
        rounds += 1
        if after is None:
            break
        assert len(rows) == 5  # only the final page may be short
    assert rounds >= 3
    assert [(r["lang"], str(r["n_chars"]), r["doc_count"]) for r in got] == [
        (r["lang"], str(r["n_chars"]), r["doc_count"]) for r in want
    ]


def test_composite_agg_after_resumes_mid_stream(engine):
    full, _ = engine.composite_agg("hash join", ["lang"], size=100)
    keys = [(r["lang"],) for r in full]
    mid, after = engine.composite_agg("hash join", ["lang"], size=100,
                                      after=keys[0])
    assert [(r["lang"],) for r in mid] == keys[1:]
    assert after is None


def test_distance_feature(engine, corpus):
    """distance_feature: ADDITIVE boost BM25 + w * pivot/(pivot+|v-origin|)."""
    from elasticsearch_data_import_handler_ray.functions import bm25

    _, df = corpus
    got = engine.search_distance_feature(
        "hash join", "n_chars", origin=20.0, pivot=8.0, weight=2.0, k=10
    )
    terms = ["hash", "join"]
    N = len(df)
    toks = df["text"].str.split()
    avgdl = toks.apply(len).sum() / N
    dfs = {t: int(toks.apply(lambda ts: t in ts).sum()) for t in terms}
    want = []
    for _, row in df.iterrows():
        ts = row["text"].split()
        if not any(t in ts for t in terms):
            continue
        s = 0.0
        for t in terms:
            s += bm25.contribution(
                bm25.idf(N, dfs[t]), np.array([ts.count(t)]),
                np.array([len(ts)]), avgdl, 1.2, 0.75,
            )[0]
        s = s + 2.0 * (8.0 / (8.0 + abs(float(row["n_chars"]) - 20.0)))
        want.append((s, int(row["doc_id"])))
    want.sort(key=lambda sd: (-sd[0], sd[1]))
    want = [(d, s) for s, d in want[:10]]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_distance_feature_pivot_validation(engine):
    with pytest.raises(ValueError, match="pivot"):
        engine.search_distance_feature("hash", "n_chars", pivot=0.0)


def test_terms_stats_subagg(engine, corpus):
    """terms agg + stats sub-agg: per-lang count/sum/min/max/avg of n_chars
    over the match set, buckets (count desc, key asc)."""
    _, df = corpus
    got = engine.terms_stats("hash join", "lang", "n_chars", mode="or", top=100)
    m = df[_match(df, "hash join", "or")]
    g = m.groupby("lang")["n_chars"]
    want = [
        {"key": k, "count": int(s.count()), "sum": float(s.sum()),
         "min": float(s.min()), "max": float(s.max()),
         "avg": float(s.sum()) / int(s.count())}
        for k, s in g
    ]
    want.sort(key=lambda r: (-r["count"], r["key"]))
    assert got == want
    assert got


def test_rank_feature(engine, corpus):
    """rank_feature: all three Lucene FeatureField kernels, additive."""
    from elasticsearch_data_import_handler_ray.functions import bm25

    _, df = corpus
    terms = ["hash", "join"]
    N = len(df)
    toks = df["text"].str.split()
    avgdl = toks.apply(len).sum() / N
    dfs = {t: int(toks.apply(lambda ts: t in ts).sum()) for t in terms}

    def base_scores():
        out = {}
        for _, row in df.iterrows():
            ts = row["text"].split()
            if not any(t in ts for t in terms):
                continue
            s = 0.0
            for t in terms:
                s += bm25.contribution(
                    bm25.idf(N, dfs[t]), np.array([ts.count(t)]),
                    np.array([len(ts)]), avgdl, 1.2, 0.75,
                )[0]
            out[int(row["doc_id"])] = (s, float(row["n_chars"]))
        return out

    base = base_scores()
    kernels = {
        "saturation": lambda v: v / (v + 25.0),
        "log": lambda v: np.log(0.1 * v + 1.0),
        "sigmoid": lambda v: v ** 2.0 / (v ** 2.0 + 25.0 ** 2.0),
    }
    for fn, kf in kernels.items():
        got = engine.search_rank_feature(
            "hash join", "n_chars", fn=fn, pivot=25.0, scaling_factor=0.1,
            exponent=2.0, weight=1.5, k=10,
        )
        want = sorted(
            ((s + 1.5 * kf(v), d) for d, (s, v) in base.items()),
            key=lambda sd: (-sd[0], sd[1]),
        )[:10]
        assert [d for d, _ in got] == [d for _, d in want], fn
        for (_, gs), (ws, _) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12)


def test_rank_feature_validation(engine):
    with pytest.raises(ValueError):
        engine.search_rank_feature("hash", "n_chars", fn="nope")
    with pytest.raises(ValueError):
        engine.search_rank_feature("hash", "n_chars", fn="saturation", pivot=0)


def test_termvectors(engine, corpus):
    """_mtermvectors: term/tf/positions/df re-analyzed from stored source."""
    _, df = corpus
    ids = [1, 5, 9999]  # 9999 absent
    got = engine.termvectors(ids)
    texts = dict(zip(df["doc_id"], df["text"]))
    toks_all = df["text"].str.split()
    for d in (1, 5):
        ts = texts[d].split()
        want = {}
        for pos, t in enumerate(ts):
            e = want.setdefault(t, {"tf": 0, "positions": []})
            e["tf"] += 1
            e["positions"].append(pos)
        rows = got[d]
        assert [r["term"] for r in rows] == sorted(want)
        for r in rows:
            assert r["tf"] == want[r["term"]]["tf"]
            assert r["positions"] == want[r["term"]]["positions"]
            assert r["df"] == int(toks_all.apply(lambda x: r["term"] in x).sum())
    assert got[9999] == []


def test_fuzzy_auto_rule(engine):
    """fuzziness AUTO: <3 chars -> exact only, 3..5 -> 1 edit, >=6 -> 2."""
    # "ha" (2 chars): AUTO = 0 edits = exact term only
    exact = engine.search_fuzzy("ha", k=5, max_edits="AUTO")
    # "ha" is not a corpus token; 0 edits -> no matches
    assert exact == []
    # "hask" (4 chars): AUTO = 1 edit -> matches "hash"
    assert engine.search_fuzzy("hask", k=5, max_edits="AUTO") == \
        engine.search_fuzzy("hask", k=5, max_edits=1)
    # "vectorz" (7 chars): AUTO = 2 edits
    assert engine.search_fuzzy("vectorz", k=5, max_edits="AUTO") == \
        engine.search_fuzzy("vectorz", k=5, max_edits=2)
    with pytest.raises(ValueError, match="AUTO"):
        engine.search_fuzzy("hash", max_edits="auto-ish")


def test_chi_square_heuristic(engine, corpus):
    """chi_square significance (2x2 with background_is_superset made
    disjoint) vs a direct recompute; jlh results unchanged by the refactor."""
    _, df = corpus
    m = df[_match(df, "hash join", "and")]
    fgN, bgN = len(m), len(df)
    fg = m["lang"].value_counts().to_dict()
    bg = df["lang"].value_counts().to_dict()

    got = engine.significant_terms("hash join", "lang", mode="and",
                                   top=10, heuristic="chi_square")
    want = []
    for v, n in fg.items():
        b2, bn2 = bg[v] - n, bgN - fgN
        n11, n01, n10, n00 = float(n), float(b2), float(fgN - n), float(bn2 - b2)
        N = n11 + n01 + n10 + n00
        den = (n11 + n01) * (n11 + n10) * (n01 + n00) * (n10 + n00)
        sc = 0.0 if den == 0 else N * (n11 * n00 - n01 * n10) ** 2 / den
        want.append({"value": v, "fg_count": n, "bg_count": bg[v], "score": sc})
    want.sort(key=lambda r: (-r["score"], r["value"]))
    assert [(r["value"], r["fg_count"]) for r in got] == [
        (r["value"], r["fg_count"]) for r in want
    ]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-12)
    with pytest.raises(ValueError, match="heuristic"):
        engine.significant_terms("hash", "lang", heuristic="gnd")
    # significant_text accepts the same heuristic switch
    assert engine.significant_text("hash join", mode="and", top=3,
                                   heuristic="chi_square")


def test_runtime_field(engine, corpus):
    """ES runtime mapping: a query-time computed doc-value works in every
    surface — stats, filters, sort-by-field, terms_stats."""
    _, df = corpus
    engine.define_runtime_field("cpw", "n_chars::DOUBLE / weight",
                                ["n_chars", "weight"])
    m = df[_match(df, "hash join", "or")]
    want_vals = (m["n_chars"].astype(float) / m["weight"]).to_numpy()
    got = engine.stats("hash join", "cpw")
    assert got["count"] == len(m)
    assert got["sum"] == pytest.approx(float(want_vals.sum()))
    assert got["min"] == pytest.approx(float(want_vals.min()))
    assert got["max"] == pytest.approx(float(want_vals.max()))
    # filter context on the runtime field
    flt = engine.search_filtered("hash join", {"field": "cpw", "gte": 10.0}, k=200)
    allowed = set(
        df.loc[_match(df, "hash join", "or")
               & (df["n_chars"].astype(float) / df["weight"] >= 10.0), "doc_id"]
    )
    assert {d for d, _ in flt} <= allowed
    # sort by the runtime field
    top = engine.search_sorted_by("hash join", "cpw", k=5)
    order = (m.assign(cpw=want_vals).sort_values(["cpw", "doc_id"],
                                                 ascending=[False, True]))
    assert [d for d, _ in top] == order["doc_id"].head(5).tolist()
    with pytest.raises(ValueError, match="source"):
        engine.define_runtime_field("x", "1", [])
