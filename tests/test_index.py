"""End-to-end: build → query, rank-identical vs the exact BM25 oracle
(SURVEY.md §5.2 items 3/5; BASELINE.json:6 "BM25 rank equality")."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions.analysis import CodeAnalyzer
from elasticsearch_data_import_handler_ray.functions.hashing import doc_ids_batch
from elasticsearch_data_import_handler_ray.index.build import build_index, verify_hashes
from elasticsearch_data_import_handler_ray.index.oracle import BM25Oracle
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
from fixtures.gen_corpus import corpus_files
from fixtures.queries import generate_queries


@pytest.fixture(scope="module")
def built(tiny_corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index") / "tiny")
    res = build_index(
        tiny_corpus,
        index_dir,
        mode="full",
        config=IndexConfig(analyzer="code", num_segments=4),
    )
    assert res.n_docs > 0 and res.n_postings > 0
    return index_dir


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    tables = [pq.read_table(f) for f in corpus_files(tiny_corpus)]
    t = pa.concat_tables(tables)
    doc_ids = doc_ids_batch(
        t["repo"].combine_chunks(), t["path"].combine_chunks(), t["commit"].combine_chunks()
    )
    return BM25Oracle(CodeAnalyzer(), doc_ids, t["content"].combine_chunks())


@pytest.fixture(scope="module")
def engine(built):
    eng = QueryEngine(built)
    yield eng
    eng.close()


def test_manifest_stats_match_oracle(built, oracle):
    from elasticsearch_data_import_handler_ray.state.manifest import Manifest

    man = Manifest.load(built)
    assert man.n_docs == oracle.N
    assert man.avgdl == pytest.approx(oracle.avgdl, rel=0, abs=0)


def test_sha256_invariant(built, tiny_corpus):
    n = verify_hashes(built, os.path.join(tiny_corpus, "corpus_sha256.parquet"))
    assert n == 1000


def test_global_df_matches_oracle(engine, oracle):
    terms = ["hot_term_0", "foo", "bar", "nonexistent_term_xyz"]
    dfs = engine.global_dfs(terms)
    for t, df in zip(terms, dfs):
        assert df == oracle.df(t), t


@pytest.mark.parametrize("method", ["exhaustive", "bmw"])
def test_rank_identical_topk(engine, oracle, method):
    queries = generate_queries(seed=42)
    results = engine.search_many(queries, k=10, method=method)
    n_nonempty = 0
    for q, got in zip(queries, results):
        want = oracle.search(q["text"], k=10, mode=q["mode"])
        assert [d for d, _ in got] == [d for d, _ in want], (method, q)
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == ws, (method, q)  # bit-identical scores
        n_nonempty += bool(want)
    assert n_nonempty >= 40  # the query set actually exercises scoring


def test_and_mode_semantics(engine, oracle):
    res = engine.search("hot_term_0 hot_term_1", k=10, mode="and")
    want = oracle.search("hot_term_0 hot_term_1", k=10, mode="and")
    assert [d for d, _ in res] == [d for d, _ in want]
    assert engine.search("hot_term_0 zzzunknownterm", k=5, mode="and") == []


def test_rank_identity_across_parallelism(tiny_corpus, built, oracle, tmp_path_factory):
    """Same corpus, different segment count → identical top-k (BASELINE.json:2:
    results must not depend on partitioning)."""
    index2 = str(tmp_path_factory.mktemp("index") / "tiny2")
    build_index(
        tiny_corpus, index2, mode="full", config=IndexConfig(analyzer="code", num_segments=7)
    )
    eng2 = QueryEngine(index2)
    try:
        queries = generate_queries(seed=42)[:20]
        r2 = eng2.search_many(queries, k=10, method="bmw")
        for q, got in zip(queries, r2):
            want = oracle.search(q["text"], k=10, mode=q["mode"])
            assert [(d, s) for d, s in got] == [(d, s) for d, s in want]
    finally:
        eng2.close()


def test_unicode_analyzer_rank_identity(tmp_path_factory, sf_dir):
    """Build the documents table with the unicode analyzer and verify BM25
    rank identity against the oracle using the same analyzer (keeps CJK
    docs searchable end-to-end)."""
    import os

    from elasticsearch_data_import_handler_ray.functions.analysis import UnicodeAnalyzer

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    index_dir = str(tmp_path_factory.mktemp("uni") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        mode="full",
        config=IndexConfig(analyzer="unicode", num_segments=4, doc_id_col="doc_id", content_col="text"),
    )
    oracle_u = BM25Oracle(
        UnicodeAnalyzer(),
        docs["doc_id"].to_numpy(zero_copy_only=False).astype("uint64"),
        docs["text"].combine_chunks(),
    )
    eng = QueryEngine(index_dir)
    try:
        for text, mode in [("hash join query", "or"), ("the data", "and"), ("vector merge scan sort", "or")]:
            got = eng.search(text, k=10, mode=mode, method="bmw")
            want = oracle_u.search(text, k=10, mode=mode)
            assert got == [(d, s) for d, s in want], (text, mode)
    finally:
        eng.close()


def test_must_not_exclusion(engine, oracle):
    """ES bool must_not: docs containing any excluded term drop from the
    ranking; surviving ranks and scores stay oracle-identical."""
    cases = [
        ("hot_term_0", "hot_term_1", "or"),
        ("foo bar", "parse", "or"),
        ("hot_term_2 merge", "sort", "and"),
        ("foo", "zzzunknownterm", "or"),  # unknown exclusion = no-op
    ]
    for text, excl, mode in cases:
        got = engine.search_many(
            [{"text": text, "mode": mode, "exclude": excl}], k=10
        )[0]
        want = oracle.search(text, k=10, mode=mode, exclude=excl)
        assert got == [(d, s) for d, s in want], (text, excl, mode)
        # exclusion actually removes something vs the plain query (first case)
    plain = engine.search("hot_term_0", k=10)
    excl = engine.search_many(
        [{"text": "hot_term_0", "mode": "or", "exclude": "hot_term_1"}], k=10
    )[0]
    assert plain != excl


def test_wildcard_search_rank_identity(engine, oracle):
    """Wildcard term queries: engine dictionary expansion (range-narrowed
    RE2 scan) == full-vocab regex oracle, ranks and scores identical."""
    for pattern in ["par*", "?arse", "h*t_term_*", "get*r", "*zznomatch"]:
        got = engine.search_wildcard(pattern, k=10)
        want = oracle.search_wildcard(pattern, k=10)
        assert got == [(d, s) for d, s in want], pattern
    got = engine.search_wildcard("h*", k=10, max_expansions=5)
    want = oracle.search_wildcard("h*", k=10, max_expansions=5)
    assert got == [(d, s) for d, s in want]
    assert engine.search_wildcard("par*", k=10)  # non-empty


def test_fuzzy_search_rank_identity(engine, oracle):
    """Fuzzy queries: vectorized Levenshtein expansion == scalar reference
    DP over the full vocabulary, ranks and scores identical."""
    for text, d in [("parze", 1), ("hot_tarm_0", 1), ("mergq", 1), ("pxrze", 2), ("foo parze", 1)]:
        got = engine.search_fuzzy(text, k=10, max_edits=d)
        want = oracle.search_fuzzy(text, k=10, max_edits=d)
        assert got == [(ds, s) for ds, s in want], (text, d)
    assert engine.search_fuzzy("parze", k=10)  # the typo actually matches


def test_regexp_search_rank_identity(engine, oracle):
    """Regexp term queries: anchored dictionary expansion (prefix-narrowed
    RE2 scan) == full-vocab regex oracle, ranks and scores identical."""
    for pattern in ["pars.*", "h[ot]+_term_[0-9]", "(get|set).*", "quer[xy]", "zz.*nomatch"]:
        got = engine.search_regexp(pattern, k=10)
        want = oracle.search_regexp(pattern, k=10)
        assert got == [(d, s) for d, s in want], pattern
    got = engine.search_regexp("p.*", k=10, max_expansions=5)
    want = oracle.search_regexp("p.*", k=10, max_expansions=5)
    assert got == [(d, s) for d, s in want]
    assert engine.search_regexp("pars.*", k=10)  # non-empty
    with pytest.raises(ValueError):
        engine.search_regexp("(unbalanced", k=5)


def test_more_like_this_text_rank_identity(engine, oracle):
    """more_like_this with like=text: tf·idf term selection + msm OR query ==
    the oracle mirror, ranks and scores identical."""
    likes = [
        "parse json buffer stream decode",
        "hot_term_0 merge sort",
        "alloc free memory pool resize grow shrink compact",
    ]
    for like in likes:
        got = engine.more_like_this(like, k=10, max_query_terms=5)
        want = oracle.more_like_this(like, k=10, max_query_terms=5)
        assert got == [(d, s) for d, s in want], like
    assert engine.more_like_this("zzzneverseen", k=10) == []


def test_facets_match_counts(engine, oracle, tiny_corpus):
    """Terms-aggregation facets: per-value counts over ALL matching docs ==
    a pandas count over the oracle's match set joined to the corpus."""
    import pandas as pd

    tables = [pq.read_table(f) for f in corpus_files(tiny_corpus)]
    t = pa.concat_tables(tables)
    ids = doc_ids_batch(
        t["repo"].combine_chunks(), t["path"].combine_chunks(), t["commit"].combine_chunks()
    )
    meta = pd.DataFrame({"doc_id": ids.astype(np.uint64), "repo": t["repo"].to_pandas()})
    for text, mode in [("parse json", "or"), ("parse json", "and"), ("hot_term_0", "or")]:
        match = oracle.match_docs(text, mode=mode)
        sub = meta[meta["doc_id"].isin(match)]
        cnt = sub.groupby("repo").size().reset_index(name="n")
        want = cnt.sort_values(["n", "repo"], ascending=[False, True], kind="mergesort")
        got = engine.facets(text, "repo", mode=mode, top=10)
        assert got == [(r, int(n)) for r, n in zip(want["repo"], want["n"])][:10], (text, mode)
    assert engine.facets("zzzunknown", "repo") == []


def test_prefix_search_rank_identity(engine, oracle):
    """Prefix/autocomplete queries: last token expands via the term
    dictionary; ranks and scores oracle-identical, expansion cap honored."""
    for text in ["pars", "hot_ter", "foo ba", "get", "zzznoprefix"]:
        got = engine.search_prefix(text, k=10)
        want = oracle.search_prefix(text, k=10)
        assert got == [(d, s) for d, s in want], text
    # tight cap still oracle-identical (cap semantics shared)
    got = engine.search_prefix("ge", k=10, max_expansions=5)
    want = oracle.search_prefix("ge", k=10, max_expansions=5)
    assert got == [(d, s) for d, s in want]
    assert engine.search_prefix("pars", k=10)  # actually matches something


def test_filtered_analyzer_rank_identity(tmp_path_factory, sf_dir):
    """Build the documents table with stop+stem token filters and verify BM25
    rank identity vs the naive oracle using the SAME FilteredAnalyzer (the
    filters change tokenization, doc_len and df — both sides must agree)."""
    import os

    from elasticsearch_data_import_handler_ray.functions.analysis import get_analyzer

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    index_dir = str(tmp_path_factory.mktemp("filt") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        mode="full",
        config=IndexConfig(
            analyzer="unicode+stop+stem",
            num_segments=4,
            doc_id_col="doc_id",
            content_col="text",
        ),
    )
    oracle_f = BM25Oracle(
        get_analyzer("unicode+stop+stem"),
        docs["doc_id"].to_numpy(zero_copy_only=False).astype("uint64"),
        docs["text"].combine_chunks(),
    )
    eng = QueryEngine(index_dir)
    try:
        # stopwords never reach the index
        assert list(eng.global_dfs(["the", "and", "with"])) == [0, 0, 0]
        # "tables"/"queries" stem to "table"/"query" on both doc and query side
        for text, mode in [
            ("hash joins queries", "or"),
            ("the data tables", "and"),
            ("vector merges scans sort", "or"),
        ]:
            got = eng.search(text, k=10, mode=mode, method="exhaustive")
            want = oracle_f.search(text, k=10, mode=mode)
            assert got == [(d, s) for d, s in want], (text, mode)
    finally:
        eng.close()


def test_count_matches_oracle(engine, oracle):
    """ES _count API: match counts equal the oracle's full result size."""
    for text, mode in [("hot_term_0 foo", "or"), ("hot_term_0 hot_term_1", "and"),
                       ("zzznope", "or")]:
        want = len(oracle.search(text, k=oracle.N, mode=mode))
        assert engine.count(text, mode=mode) == want, (text, mode)


@pytest.mark.parametrize("method", ["exhaustive", "bmw"])
def test_search_after_pagination(engine, oracle, method):
    """Page N via search_after == slice [Nk,(N+1)k) of the full ranking."""
    text = "hot_term_0 parse json"
    full = oracle.search(text, k=oracle.N, mode="or")
    page1 = engine.search(text, k=10, method=method)
    assert page1 == [(d, s) for d, s in full[:10]]
    got, pages = list(page1), 0
    while True:
        cursor = (got[-1][1], got[-1][0])
        nxt = engine.search_after(text, cursor, k=10, method=method)
        if not nxt:
            break
        got.extend(nxt)
        pages += 1
        if pages > 200:
            raise AssertionError("pagination did not terminate")
    assert got == [(d, s) for d, s in full], method


def test_minimum_should_match(engine, oracle):
    """ES minimum_should_match: docs matching >= m of the OR terms; scores
    stay the sum over MATCHED terms only (oracle-identical)."""
    text = "hot_term_0 hot_term_1 parse json"
    for m in (2, 3, 4):
        got = engine.search_many(
            [{"text": text, "mode": "or", "min_should_match": m}], k=10
        )[0]
        want = oracle.search(text, k=10, mode="or", min_should_match=m)
        assert got == [(d, s) for d, s in want], m
    # msm=1 == plain OR; msm=len(terms) == AND
    got1 = engine.search_many([{"text": text, "mode": "or", "min_should_match": 1}], k=10)[0]
    assert got1 == engine.search(text, k=10, mode="or", method="exhaustive")
    n_terms = len(engine.analyze(text))  # code analyzer splits hot_term_0 → 3
    gotn = engine.search_many(
        [{"text": text, "mode": "or", "min_should_match": n_terms}], k=10
    )[0]
    assert [d for d, _ in gotn] == [d for d, _ in engine.search(text, k=10, mode="and")]


def test_explain_matches_search_score(engine, oracle):
    text = "hot_term_0 parse json"
    top = engine.search(text, k=3)
    for doc_id, score in top:
        ex = engine.explain(text, doc_id)
        assert ex["matched"] and ex["score"] == score
        assert sorted(r["term"] for r in ex["terms"]) == [r["term"] for r in ex["terms"]]
    missing = engine.explain(text, 1234567)  # not a real doc id
    assert not missing["matched"] and missing["score"] == 0.0


def _lev_scalar(a: str, b: str) -> int:
    """Classic scalar Levenshtein DP — the independent reference for suggest."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def test_suggest_matches_naive_oracle(engine, oracle):
    """ES term suggester: engine options == a full-vocabulary scalar-DP
    oracle with identical ranking (distance asc, df desc, term asc) across
    all three suggest_modes."""
    vocab = {t: len(oracle.postings[t][0]) for t in oracle.postings}
    cases = [
        ("parze", "missing", 1), ("parze mergq", "missing", 2),
        ("parse", "always", 1), ("parse", "popular", 1),
        ("parse", "missing", 2), ("zzqqxx", "missing", 2),
    ]
    from elasticsearch_data_import_handler_ray.functions.analysis import CodeAnalyzer

    az = CodeAnalyzer()
    n_opts = 0
    for text, mode, d in cases:
        got = engine.suggest(text, max_edits=d, top=5, suggest_mode=mode, max_expansions=10_000)
        toks = []
        for t in az.analyze_query(text):
            if t not in toks:
                toks.append(t)
        assert [g["token"] for g in got] == toks, (text, mode)
        for g in got:
            tok, tok_df = g["token"], vocab.get(g["token"], 0)
            assert g["freq"] == tok_df
            if mode == "missing" and tok_df > 0:
                assert g["options"] == []
                continue
            cands = sorted(
                (_lev_scalar(t, tok), -f, t)
                for t, f in vocab.items()
                if t != tok
                and _lev_scalar(t, tok) <= d
                and (mode != "popular" or f > tok_df)
            )
            want = [{"text": t, "distance": dd, "freq": -nf} for dd, nf, t in cands[:5]]
            assert g["options"] == want, (text, mode, g["token"])
            n_opts += len(want)
    assert n_opts >= 3  # the typo cases really produce corrections


def test_suggest_rejects_bad_mode(engine):
    with pytest.raises(ValueError, match="suggest_mode"):
        engine.suggest("parse", suggest_mode="bogus")


def test_synonym_search_rank_identity(engine, oracle):
    """Query-time synonyms (Lucene SynonymQuery semantics): engine ==
    naive merged-postings oracle bit-for-bit; no-synonym queries reduce to
    plain search; AND mode and dead-member groups behave."""
    syns = [["parse", "decode"], ["merge", "sort"], ["foo", "zzqqneverseen"]]
    for text, mode in [
        ("parse json buffer", "or"), ("merge hot_term_0", "or"),
        ("parse merge", "and"), ("foo bar", "or"), ("zzqqneverseen", "or"),
    ]:
        got = engine.search_synonyms(text, syns, k=10, mode=mode)
        want = oracle.search_synonyms(text, syns, k=10, mode=mode)
        assert got == [(d, s) for d, s in want], (text, mode)
    # identity when no group touches the query
    plain = engine.search("hot_term_0 query", k=10)
    via = engine.search_synonyms("hot_term_0 query", [["parse", "decode"]], k=10)
    assert via == plain
    # a synonym expansion really changes results vs plain OR of the text
    # (both "merge" and "sort" occur in the corpus, so the group is live)
    assert oracle.df("merge") > 0 and oracle.df("sort") > 0
    assert engine.search_synonyms("merge", syns, k=10) != engine.search("merge", k=10)
    # group with ALL members unseen + AND → no results
    assert engine.search_synonyms(
        "parse zzqqneverseen2", [["zzqqneverseen2", "zzqqneverseen3"]], k=5, mode="and"
    ) == []


def test_bool_search_identity(engine, oracle):
    """Composed bool query (must + should + must_not + msm in one scatter):
    engine == naive per-class-hit oracle bit-for-bit, and composes with the
    must_not exclusion."""
    cases = [
        dict(must="parse", should="json buffer merge", minimum_should_match=1),
        dict(must="parse json", should="", minimum_should_match=0),
        dict(must="", should="parse json merge", minimum_should_match=2),
        dict(must="parse", should="json buffer", must_not="legacy",
             minimum_should_match=0),
        dict(must="parse zzqqneverseen", should="json", minimum_should_match=0),
        dict(must="parse", should="zzqa zzqb", minimum_should_match=1),
    ]
    n_nonempty = 0
    for c in cases:
        got = engine.bool_search(k=10, **c)
        want = oracle.search_bool(k=10, **c)
        assert got == [(d, s) for d, s in want], c
        n_nonempty += bool(got)
    assert n_nonempty >= 3
    # semantics really differ from plain AND: bool(must=parse) admits docs
    # that lack a should term, which AND over all three terms rejects
    got_all = engine.bool_search(must="parse", should="json merge", k=10**6)
    and_all = {d for d, _ in oracle.search("parse json merge", k=10**6, mode="and")}
    assert any(d not in and_all for d, _ in got_all)
    parse_all = {d for d, _ in oracle.search("parse", k=10**6)}
    assert {d for d, _ in got_all} <= parse_all
