"""query_string (Lucene mini-language) parity tests: parser shape/errors +
rank-AND-score identity of QueryEngine.query_string vs the naive oracle
mirror (index/oracle.py query_string_oracle) on the tiny corpus, plus
bit-identity reductions to the plain search paths for flat queries."""

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions import bm25
from elasticsearch_data_import_handler_ray.functions.analysis import CodeAnalyzer
from elasticsearch_data_import_handler_ray.functions.hashing import doc_ids_batch
from elasticsearch_data_import_handler_ray.index import querystring as qs
from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.oracle import (
    PhraseOracle,
    query_string_oracle,
)
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
from fixtures.gen_corpus import corpus_files


# --------------------------------------------------------------------- parser
def _flat(g):
    return [(occ, type(n).__name__, getattr(n, "text", None)) for occ, n in g.clauses]


def test_parse_default_or():
    g = qs.parse("alpha beta")
    assert _flat(g) == [("should", "Leaf", "alpha"), ("should", "Leaf", "beta")]


def test_parse_default_and():
    g = qs.parse("alpha beta", default_operator="and")
    assert _flat(g) == [("must", "Leaf", "alpha"), ("must", "Leaf", "beta")]


def test_parse_and_promotes_both_sides():
    g = qs.parse("alpha AND beta gamma")
    assert _flat(g)[:2] == [("must", "Leaf", "alpha"), ("must", "Leaf", "beta")]
    assert _flat(g)[2] == ("should", "Leaf", "gamma")


def test_parse_no_precedence_flat_lucene():
    # Lucene classic parser: NO precedence, left-to-right occurrence rules
    g = qs.parse("a OR b AND c")
    assert _flat(g) == [
        ("should", "Leaf", "a"), ("must", "Leaf", "b"), ("must", "Leaf", "c"),
    ]
    g = qs.parse("a AND b OR c")  # the ADVICE case: '+a +b c'
    assert _flat(g) == [
        ("must", "Leaf", "a"), ("must", "Leaf", "b"), ("should", "Leaf", "c"),
    ]


def test_parse_and_mode_or_demotes_previous():
    # default AND: 'a OR b' must parse as 'a b' (both optional), not '+a b'
    g = qs.parse("a OR b", default_operator="and")
    assert _flat(g) == [("should", "Leaf", "a"), ("should", "Leaf", "b")]
    # prohibited previous clause is never demoted: '-a OR b' keeps -a
    g = qs.parse("-a OR b c", default_operator="and")
    assert _flat(g) == [
        ("must_not", "Leaf", "a"), ("should", "Leaf", "b"), ("must", "Leaf", "c"),
    ]


def test_parse_or_mode_plus_survives_or():
    # default OR keeps explicit '+' after OR ('+a OR b' → '+a b' in Lucene)
    g = qs.parse("+a OR b")
    assert _flat(g) == [("must", "Leaf", "a"), ("should", "Leaf", "b")]
    # ...but AND mode ignores '+' after OR (Lucene AND-operator quirk)
    g = qs.parse("a OR +b", default_operator="and")
    assert _flat(g) == [("should", "Leaf", "a"), ("should", "Leaf", "b")]


def test_parse_negative_boost_rejected():
    with pytest.raises(ValueError, match="negative boost"):
        qs.parse("term^-2")
    # exponent notation still accepted
    g = qs.parse("term^2e1")
    assert g.clauses[0][1].boost == 20.0


def test_parse_occur_markers():
    g = qs.parse("+a -b !c NOT d e")
    assert [occ for occ, _ in g.clauses] == [
        "must", "must_not", "must_not", "must_not", "should",
    ]


def test_parse_leaf_kinds():
    g = qs.parse('term pre* w*ld fu~1 fz~ "a phrase"~2 esc\\*lit')
    kinds = [(n.kind, n.text) for _, n in g.clauses]
    assert kinds == [
        ("term", "term"), ("prefix", "pre"), ("wildcard", "w*ld"),
        ("fuzzy", "fu"), ("fuzzy", "fz"), ("phrase", "a phrase"),
        ("term", "esc*lit"),
    ]
    assert g.clauses[3][1].edits == 1
    assert g.clauses[4][1].edits == 2
    assert g.clauses[5][1].slop == 2


def test_parse_boost_and_group_boost():
    g = qs.parse("a^2.5 (b OR c)^3")
    assert g.clauses[0][1].boost == 2.5
    assert g.clauses[1][1].boost == 3.0


def test_parse_errors():
    for bad in ['"unterminated', "(a OR b", "a)", "", "a ^x"]:
        with pytest.raises(ValueError):
            qs.parse(bad)


def test_parse_field_split():
    assert qs.split_field("content:foo") == ("content", "foo")
    assert qs.split_field("plain") == (None, "plain")


def test_parse_range_forms():
    g = qs.parse("doc_len:[10 TO 20] n:{1 TO 5} m:[3 TO *} x:>=2 y:<7 z:>1.5")
    leaves = [n for _, n in g.clauses]
    assert [n.kind for n in leaves] == ["range"] * 6
    r0, r1, r2, r3, r4, r5 = leaves
    assert (r0.field_name, r0.lo, r0.hi, r0.lo_incl, r0.hi_incl) == ("doc_len", 10.0, 20.0, True, True)
    assert (r1.lo, r1.hi, r1.lo_incl, r1.hi_incl) == (1.0, 5.0, False, False)
    assert (r2.lo, r2.hi, r2.lo_incl, r2.hi_incl) == (3.0, None, True, False)
    assert (r3.lo, r3.lo_incl, r3.hi) == (2.0, True, None)
    assert (r4.hi, r4.hi_incl, r4.lo) == (7.0, False, None)
    assert (r5.lo, r5.lo_incl) == (1.5, False)
    # string bounds survive as raw strings
    rs = qs.parse("repo:[aaa TO bbb]").clauses[0][1]
    assert (rs.lo, rs.hi) == ("aaa", "bbb")
    with pytest.raises(ValueError):
        qs.parse("f:[1 TO")  # unterminated
    with pytest.raises(ValueError):
        qs.parse("f:[1 2]")  # missing TO
    with pytest.raises(ValueError):
        qs.parse("f:>")  # missing bound


# ----------------------------------------------------------- engine vs oracle
@pytest.fixture(scope="module")
def built_pos(tiny_corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("qs_index") / "tiny_pos")
    res = build_index(
        tiny_corpus, index_dir, mode="full",
        config=IndexConfig(analyzer="code", num_segments=4, positions=True),
    )
    assert res.n_docs > 0
    return index_dir


@pytest.fixture(scope="module")
def engine(built_pos):
    eng = QueryEngine(built_pos)
    yield eng
    eng.close()


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    t = pa.concat_tables([pq.read_table(f) for f in corpus_files(tiny_corpus)])
    ids = doc_ids_batch(
        t["repo"].combine_chunks(), t["path"].combine_chunks(), t["commit"].combine_chunks()
    )
    return PhraseOracle(CodeAnalyzer(), ids, t["content"].combine_chunks())


def _levenshtein(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


def _oracle_compile(oracle, q: str, default_operator: str = "or", cap: int = 10_000):
    """Independent compile against the oracle's postings: full-vocabulary
    expansions (capped identically to the engine), oracle dfs/idfs."""
    tree = qs.parse(q, default_operator)
    leaves = qs.collect_leaves(tree)
    vocab = sorted(oracle.postings.keys())
    exp: dict[tuple[str, str], list[str]] = {}
    dfs: dict[str, int] = {}
    for lf in leaves:
        body = qs.split_field(lf.text)[1]
        key = (lf.kind, lf.text)
        if lf.kind == "prefix":
            toks = oracle.analyzer.analyze_query(body)
            seed, rest = toks[-1], toks[:-1]
            exp[key] = sorted(
                set(rest) | set(sorted(t for t in vocab if t.startswith(seed))[:cap])
            )
        elif lf.kind == "wildcard":
            pat = re.compile(
                "^" + re.escape(body.lower()).replace(r"\*", ".*").replace(r"\?", ".") + "$"
            )
            exp[key] = sorted(t for t in vocab if pat.match(t))[:cap]
        elif lf.kind == "regexp":
            pat = re.compile("^(?:" + lf.text.lower() + ")$")
            exp[key] = sorted(t for t in vocab if pat.match(t))[:cap]
        elif lf.kind == "fuzzy":
            toks = oracle.analyzer.analyze_query(body)
            seed, rest = toks[-1], toks[:-1]
            exp[key] = sorted(
                set(rest) | {t for t in vocab if _levenshtein(t, seed) <= lf.edits}
            )
        elif lf.kind == "phrase":
            for t in oracle.analyzer.analyze_query(lf.text):
                dfs[t] = oracle.df(t)
        if lf.kind in ("term", "prefix", "wildcard", "fuzzy"):
            for t in oracle.analyzer.analyze_query(body):
                dfs[t] = oracle.df(t)
    for terms in exp.values():
        for t in terms:
            dfs[t] = oracle.df(t)
    return qs.compile_tree(
        tree, oracle.analyzer, dfs,
        lambda t: float(bm25.idf(oracle.N, dfs[t])), exp, default_operator,
    )


def _vocab_terms(oracle):
    """A few deterministic real tokens spread across the df spectrum."""
    by_df = sorted(oracle.postings.items(), key=lambda kv: (-len(kv[1][0]), kv[0]))
    hot = by_df[0][0]
    mid = by_df[len(by_df) // 3][0]
    rare = by_df[-2][0]
    other = by_df[len(by_df) // 2][0]
    return hot, mid, rare, other


QS_CASES = [
    "{hot} {mid}",
    "{hot} AND {mid}",
    "{rare} OR ({hot} AND {mid})",
    "+{hot} {mid} -{rare}",
    "({hot} OR {mid}) AND NOT ({rare} OR {other})",
    "{hot}^2 {mid}",
    "(({hot} AND {mid}) OR {rare})^1.5 {other}",
    "{hot} unknownzzz",
    "{hot} AND (unknownzzz OR {mid})",
]


def test_query_string_identity_vs_oracle(engine, oracle):
    hot, mid, rare, other = _vocab_terms(oracle)
    for tmpl in QS_CASES:
        q = tmpl.format(hot=hot, mid=mid, rare=rare, other=other)
        for op in ("or", "and"):
            got = engine.query_string(q, k=15, default_operator=op, max_expansions=10_000)
            want = query_string_oracle(oracle, _oracle_compile(oracle, q, op), k=15)
            assert got == want, f"{q!r} (default_operator={op})"


def test_query_string_expansions_vs_oracle(engine, oracle):
    hot, mid, rare, other = _vocab_terms(oracle)
    for q in [f"{hot[:3]}* {mid}", f"{hot}~1", f"{rare[:2]}?{rare[3:]} {hot}"]:
        got = engine.query_string(q, k=15, max_expansions=10_000)
        want = query_string_oracle(oracle, _oracle_compile(oracle, q), k=15)
        assert got == want, repr(q)


def test_query_string_phrase_vs_oracle(engine, oracle):
    # a real adjacent token pair from some document → non-empty phrase
    doc_toks = next(iter(oracle.doc_tokens.values()))
    ph = f'"{doc_toks[0]} {doc_toks[1]}"'
    hot, mid, _, _ = _vocab_terms(oracle)
    for q in [f"{ph} {hot}", f"{ph}~1 {mid}", f"{hot} AND {ph}^2", f"{ph} OR {mid}"]:
        got = engine.query_string(q, k=15, max_expansions=10_000)
        want = query_string_oracle(oracle, _oracle_compile(oracle, q), k=15)
        assert got == want, repr(q)
    assert engine.query_string(f"{ph} {hot}", k=15)  # non-vacuous


def test_flat_reductions_bit_identical(engine, oracle):
    """A flat OR/AND query_string is bit-identical to the plain search paths
    (same accumulation order end-to-end)."""
    hot, mid, rare, _ = _vocab_terms(oracle)
    q = f"{hot} {mid} {rare}"
    assert engine.query_string(q, k=10) == engine.search(q, k=10, mode="or")
    assert engine.query_string(q, k=10, default_operator="and") == engine.search(
        q, k=10, mode="and"
    )
    assert engine.query_string(q, k=10, default_operator="and") == engine.bool_search(
        must=q, k=10
    )


def test_match_set_mode(engine, oracle):
    """k<=0 returns the FULL match set sorted by doc_id (the count shape)."""
    hot, mid, _, _ = _vocab_terms(oracle)
    q = f"{hot} AND {mid}"
    all_matches = engine.query_string(q, k=0)
    ids = [d for d, _ in all_matches]
    assert ids == sorted(ids)
    # count() takes plain analyzed text, not query-string syntax ("AND" would
    # become a required term there)
    assert len(all_matches) == engine.count(f"{hot} {mid}", mode="and")
    top = engine.query_string(q, k=5)
    best = sorted(all_matches, key=lambda ds: (-ds[1], ds[0]))[:5]
    assert top == best


def test_boost_changes_ranking(engine, oracle):
    hot, mid, _, _ = _vocab_terms(oracle)
    plain = engine.query_string(f"{hot} {mid}", k=10)
    boosted = engine.query_string(f"{hot} {mid}^100", k=10)
    assert plain != boosted  # the boost must actually re-rank / re-score
    # boosting both clauses equally rescales scores but keeps the ranking
    both = engine.query_string(f"({hot} {mid})^2", k=10)
    assert [d for d, _ in both] == [d for d, _ in plain]
    for (d1, s1), (d2, s2) in zip(both, plain):
        assert s1 == pytest.approx(2 * s2, rel=1e-12)


def test_minimum_should_match(engine, oracle):
    """Explicit minimum_should_match: with must present ES defaults msm to 0
    (should is score-only); an explicit value forces >= N should matches."""
    hot, mid, rare, other = _vocab_terms(oracle)
    q = f"+{hot} {mid} {rare} {other}"
    loose = engine.query_string(q, k=0)
    for msm in (1, 2, 3):
        got = engine.query_string(q, k=0, minimum_should_match=msm)
        compiled = _oracle_compile(oracle, q)
        compiled["msm"], compiled["msm_explicit"] = msm, True
        want = query_string_oracle(oracle, compiled, k=0)
        assert got == want, msm
        assert len(got) <= len(loose)
    # tightening msm can only shrink the match set, monotonically
    ns = [len(engine.query_string(q, k=0, minimum_should_match=m)) for m in (1, 2, 3)]
    assert ns == sorted(ns, reverse=True)
    # pure-should query: explicit msm behaves like the no-must branch
    q2 = f"{hot} {mid} {rare}"
    got2 = engine.query_string(q2, k=0, minimum_should_match=2)
    compiled2 = _oracle_compile(oracle, q2)
    compiled2["msm"], compiled2["msm_explicit"] = 2, True
    assert got2 == query_string_oracle(oracle, compiled2, k=0)
    assert 0 < len(got2) < len(engine.query_string(q2, k=0))


def test_range_clauses_vs_oracle(engine, oracle):
    """field:[lo TO hi] filters on doc-values with Lucene constant-score
    semantics (1·boost per matching doc), composable with scoring clauses."""
    hot, mid, _, _ = _vocab_terms(oracle)
    lens = np.sort(oracle.doc_lens)
    lo, hi = int(lens[len(lens) // 4]), int(lens[3 * len(lens) // 4])
    cases = [
        f"doc_len:[{lo} TO {hi}]",                   # pure range
        f"doc_len:[{lo} TO {hi}]^2",                 # boosted constant score
        f"{hot} AND doc_len:[{lo} TO {hi}]",         # filter + scoring must
        f"({hot} OR doc_len:>{hi}) AND {mid}",       # nested one-sided
        f"doc_len:{{{lo} TO {hi}}} {mid}",           # exclusive bounds, should
        f"{hot} -doc_len:<{lo}",                     # negated range
        f"doc_len:[{lo} TO *] AND doc_len:[* TO {hi}]",  # unbounded ends
    ]
    for q in cases:
        got = engine.query_string(q, k=0)
        want = query_string_oracle(oracle, _oracle_compile(oracle, q), k=0)
        assert got == want, repr(q)
        assert got, repr(q)  # every case is non-vacuous at these quartiles
    # pure range: every score is exactly the boost
    pure = engine.query_string(f"doc_len:[{lo} TO {hi}]^2", k=0)
    assert {s for _, s in pure} == {2.0}
    n_in = sum(lo <= v <= hi for v in oracle.doc_lens)
    assert len(pure) == n_in


def test_range_unknown_field_raises(engine):
    with pytest.raises((ValueError, KeyError)):
        engine.query_string("nosuchfield:[1 TO 2]")


def test_parse_regexp_forms():
    g = qs.parse('/ab(c|d)+/ content:/x:y/ plain')
    l0, l1, l2 = (n for _, n in g.clauses)
    assert (l0.kind, l0.text, l0.field_name) == ("regexp", "ab(c|d)+", None)
    assert (l1.kind, l1.text, l1.field_name) == ("regexp", "x:y", "content")
    assert l2.kind == "term"
    with pytest.raises(ValueError):
        qs.parse("/unterminated")


def test_regexp_clause_vs_oracle(engine, oracle):
    """/pattern/ expands against the dictionary (anchored, capped) and scores
    as a per-term-idf OR group — identical to wildcard blending."""
    hot, mid, rare, _ = _vocab_terms(oracle)
    cases = [
        f"/{hot[:3]}.*/ {mid}",
        f"/{rare[:2]}[a-z]+/ AND {hot}",
        f"({mid} OR /{hot}/) -{rare}",
    ]
    for q in cases:
        got = engine.query_string(q, k=15, max_expansions=10_000)
        want = query_string_oracle(oracle, _oracle_compile(oracle, q), k=15)
        assert got == want, repr(q)
    assert engine.query_string(cases[0], k=15)  # non-vacuous
    # a bare regexp reduces to search_regexp bit-identically
    assert engine.query_string(f"/{hot[:3]}.*/", k=10, max_expansions=10_000) == \
        engine.search_regexp(f"{hot[:3]}.*", k=10, max_expansions=10_000)
    # RE2-invalid syntax (lookahead) is a clean driver-side ValueError
    with pytest.raises(ValueError, match="regexp"):
        engine.query_string("/(?=abc)def/")
    with pytest.raises(ValueError, match="not indexed"):
        engine.query_string("nofield:/abc/")


def test_exists_clause(engine, oracle):
    """`_exists_:field` matches every doc with a non-null doc-value."""
    lf = qs.parse("_exists_:doc_len").clauses[0][1]
    assert (lf.kind, lf.field_name, lf.lo, lf.hi) == ("range", "doc_len", None, None)
    got = engine.query_string("_exists_:doc_len", k=0)
    assert len(got) == oracle.N  # corpus has no nulls: every doc matches
    assert {s for _, s in got} == {1.0}
    # null handling: a None-bearing doc-values array drops the null rows
    from elasticsearch_data_import_handler_ray.index.oracle import _qs_oracle_node

    ids = np.array(sorted(oracle.all_docs[:4]), dtype=np.uint64)
    vals = np.array(["a", None, "b", None], dtype=object)
    oracle.qs_doc_values = {"maybe": (ids, vals)}
    try:
        node = {"kind": "range", "field": "maybe", "lo": None, "hi": None,
                "lo_incl": True, "hi_incl": True, "boost": 1.0}
        out_ids, out_sc = _qs_oracle_node(oracle, node)
        assert list(out_ids) == [int(ids[0]), int(ids[2])]
    finally:
        del oracle.qs_doc_values


def test_string_field_range(engine, oracle):
    """Lexicographic ranges over a string doc-value (the `repo` store col is
    not in this index's docmap, so pin via the oracle hook + engine error)."""
    ids = oracle.all_docs[:6].astype(np.uint64)
    vals = np.array(["aa", "ab", "b", "ba", "c", "cz"], dtype=object)
    from elasticsearch_data_import_handler_ray.index.oracle import _qs_oracle_node

    oracle.qs_doc_values = {"name": (ids, vals)}
    try:
        node = {"kind": "range", "field": "name", "lo": "ab", "hi": "c",
                "lo_incl": True, "hi_incl": False, "boost": 1.0}
        out_ids, _ = _qs_oracle_node(oracle, node)
        assert list(out_ids) == [int(i) for i, v in zip(ids, vals) if "ab" <= v < "c"]
    finally:
        del oracle.qs_doc_values


def test_pure_negative_rejected(engine):
    with pytest.raises(ValueError):
        engine.query_string("-foo -bar")


def test_unknown_field_rejected(engine):
    with pytest.raises(ValueError):
        engine.query_string("nosuchfield:foo")


def test_indexed_field_prefix_accepted(engine, oracle):
    hot, mid, _, _ = _vocab_terms(oracle)
    assert engine.query_string(f"content:{hot} {mid}", k=10) == engine.query_string(
        f"{hot} {mid}", k=10
    )


def test_query_string_highlight(engine, oracle):
    """Highlights return the positive terms' token indices for every hit —
    verified against the oracle's own token streams (expansions included)."""
    hot, mid, rare, _ = _vocab_terms(oracle)
    q = f"{hot[:3]}* AND {mid} -{rare}"
    out = engine.query_string_highlight(q, k=5, max_expansions=10_000)
    assert out
    compiled = _oracle_compile(oracle, q)
    from elasticsearch_data_import_handler_ray.index.query import _qs_positive_terms

    pos_terms = _qs_positive_terms(compiled)
    assert mid in pos_terms and rare not in pos_terms
    for doc_id, score, hl in out:
        toks = oracle.doc_tokens[doc_id]
        assert hl, doc_id  # every hit matched at least one positive term
        for t, positions in hl.items():
            assert t in pos_terms
            assert positions == [i for i, tok in enumerate(toks) if tok == t]
    # hits identical to the plain call (highlight adds, never re-ranks)
    plain = engine.query_string(q, k=5, max_expansions=10_000)
    assert [(d, s) for d, s, _ in out] == plain
    # compile cache: second call must not change results
    assert engine.query_string(q, k=5, max_expansions=10_000) == plain
    # range-only query highlights nothing but still returns hits
    lens = np.sort(oracle.doc_lens)
    lo, hi = int(lens[2]), int(lens[-3])
    out2 = engine.query_string_highlight(f"doc_len:[{lo} TO {hi}]", k=3)
    assert out2 and all(h == {} for _, _, h in out2)


def test_query_string_search_after(engine, oracle):
    """Deep pagination: page N via after-cursor equals the [Nk,(N+1)k) slice
    of the full ranking (score desc, doc_id asc) — exact, no re-scoring."""
    hot, mid, _, _ = _vocab_terms(oracle)
    q = f"{hot} {mid}"
    full = sorted(engine.query_string(q, k=0), key=lambda ds: (-ds[1], ds[0]))
    assert len(full) > 12
    k = 5
    pages, cursor = [], None
    for _ in range(len(full) // k + 2):
        page = engine.query_string(q, k=k, after=cursor)
        if not page:
            break
        pages.extend(page)
        cursor = (page[-1][1], page[-1][0])
    assert pages == full


def test_query_string_agg(engine, oracle):
    """Aggs under a query_string match set: count == len(k=0); stats and
    histogram over doc_len recompute exactly from the oracle match set."""
    hot, mid, _, _ = _vocab_terms(oracle)
    q = f"{hot} AND {mid}"
    match = engine.query_string(q, k=0)
    ids = np.array(sorted(d for d, _ in match), dtype=np.uint64)
    assert engine.query_string_agg(q, agg="count") == len(ids) > 0
    dls = oracle.doc_lens[np.searchsorted(oracle.all_docs, ids)].astype(np.float64)
    st = engine.query_string_agg(q, "doc_len", agg="stats")
    assert st["count"] == len(ids)
    assert st["min"] == dls.min() and st["max"] == dls.max()
    assert st["sum"] == pytest.approx(dls.sum(), rel=1e-12)
    hist = engine.query_string_agg(q, "doc_len", agg="histogram", interval=25.0)
    want = {}
    for v in dls:
        k2 = np.floor(v / 25.0) * 25.0
        want[k2] = want.get(k2, 0) + 1
    assert hist == sorted(want.items())
    # no match → empty shapes
    assert engine.query_string_agg("zzneverseen", agg="count") == 0
    assert engine.query_string_agg("zzneverseen", "doc_len", agg="stats") is None


def test_parser_fuzz_never_crashes_uncleanly():
    """Property: parse() on arbitrary input either returns a Group or raises
    ValueError — never any other exception (the CLI surfaces it raw)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = 'abc ()+-!&|^~"*?:[]{}/\\. TO123'

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def run(q):
        try:
            g = qs.parse(q)
        except ValueError:
            return
        assert isinstance(g, qs.Group) and g.clauses

    run()


def test_parser_fuzz_roundtrip_wellformed(engine, oracle):
    """Property: random WELL-FORMED boolean trees over real vocabulary
    evaluate identically on the engine and the naive oracle."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    hot, mid, rare, other = _vocab_terms(oracle)
    terms = st.sampled_from([hot, mid, rare, other, "unknownzzz"])

    def clause(depth):
        if depth <= 0:
            return terms
        sub = clause(depth - 1)
        return st.one_of(
            terms,
            st.tuples(sub, st.sampled_from([" AND ", " OR ", " "]), sub).map(
                lambda t: f"({t[0]}{t[1]}{t[2]})"
            ),
            sub.map(lambda c: f"+{c}"),
            st.tuples(sub, sub).map(lambda t: f"({t[0]} -{t[1]})"),
            sub.map(lambda c: f"{c}^2"),
        )

    @settings(max_examples=60, deadline=None)
    @given(clause(3))
    def run(q):
        try:
            got = engine.query_string(q, k=10)
        except ValueError:
            # purely-negative subqueries are legitimately rejected; the
            # oracle compiler rejects them identically
            with pytest.raises(ValueError):
                _oracle_compile(oracle, q)
            return
        want = query_string_oracle(oracle, _oracle_compile(oracle, q), k=10)
        assert got == want, q

    run()


def test_query_string_agg_percentiles(engine, oracle):
    """Exact discrete quantiles under a query_string match set — recomputed
    from the oracle match set with the same ceil-rank definition."""
    hot, mid, _, _ = _vocab_terms(oracle)
    q = f"{hot} AND {mid}"
    ids = np.array(sorted(d for d, _ in engine.query_string(q, k=0)), dtype=np.uint64)
    dls = np.sort(oracle.doc_lens[np.searchsorted(oracle.all_docs, ids)].astype(float))
    got = engine.query_string_agg(q, "doc_len", agg="percentiles",
                                  interval=[50, 90, 99])
    for p in (50, 90, 99):
        rank = max(1, int(np.ceil(p / 100.0 * len(dls))))
        assert got[float(p)] == dls[rank - 1], p


def test_suggest_phrase_identity_vs_naive(engine, oracle):
    """ES phrase suggester (r5): engine output must equal a brute-force
    recompute — full-vocabulary candidate scan, literal adjacency bigram
    counts, the same stupid-backoff ln arithmetic."""
    import math
    from itertools import product

    docs = oracle.doc_tokens
    vocab = sorted({t for l in docs.values() for t in l})
    df = {v: sum(1 for l in docs.values() if v in l) for v in vocab}
    N = len(docs)

    def naive(text, *, max_edits=2, per_token=5, top=5, backoff=0.4):
        toks = oracle.analyzer.analyze_query(text)
        cands = {}
        for t in set(toks):
            cs = sorted(
                (_levenshtein(c, t), -df[c], c)
                for c in vocab
                if _levenshtein(c, t) <= max_edits
            )
            cands[t] = [c for _, _, c in cs[:per_token]] or [t]

        def bigram(a, b):
            return sum(
                1 for l in docs.values() if any(x == a and y == b for x, y in zip(l, l[1:]))
            )

        out = []
        for combo in product(*(cands[t] for t in toks)):
            if combo == tuple(toks):
                continue
            if any(df.get(w, 0) <= 0 for w in combo):
                continue
            s = math.log(df[combo[0]] / N)
            for a, b in zip(combo, combo[1:]):
                n = bigram(a, b)
                s += math.log(n / df[a]) if n > 0 else math.log(backoff * df[b] / N)
            out.append((s, " ".join(combo)))
        out.sort(key=lambda x: (-x[0], x[1]))
        return [(t, s) for s, t in out[:top]]

    hot, mid, rare, other = _vocab_terms(oracle)
    queries = [
        f"{hot[:-1]}x {mid}",          # typo'd first token
        f"{hot} {rare}z",              # typo'd last token
        f"{hot[:-1]} {mid} {other}x",  # 3-token with two typos
    ]
    any_nonempty = False
    for q in queries:
        got = engine.suggest_phrase(q, max_edits=2, top=5)
        want = naive(q, max_edits=2, top=5)
        assert [(g["text"], g["score"]) for g in got] == want, q
        any_nonempty = any_nonempty or bool(got)
    assert any_nonempty  # non-vacuous across the probe set


def test_suggest_phrase_errors(engine):
    with pytest.raises(ValueError):
        engine.suggest_phrase("single")
