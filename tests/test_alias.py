"""Multi-index (alias) search: an alias over indexes A and B must be rank-
AND score-BIT-IDENTICAL to one index built over A∪B — N, df and Σdl are
integer sums, so every BM25 input is equal (index/alias.py's contract)."""

import numpy as np
import pytest

from elasticsearch_data_import_handler_ray.index.alias import MultiIndexEngine
from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
from fixtures.gen_corpus import corpus_files
from fixtures.queries import generate_queries


@pytest.fixture(scope="module")
def split_and_union(tiny_corpus, tmp_path_factory):
    files = corpus_files(tiny_corpus)
    assert len(files) >= 2
    half = len(files) // 2
    root = tmp_path_factory.mktemp("alias")
    cfg = IndexConfig(
        analyzer="code", num_segments=2, positions=True, store_cols=("repo",)
    )
    a, b, u = str(root / "a"), str(root / "b"), str(root / "union")
    build_index(files[:half], a, mode="full", config=cfg)
    build_index(files[half:], b, mode="full", config=cfg)
    build_index(
        files, u, mode="full",
        config=IndexConfig(
            analyzer="code", num_segments=4, positions=True, store_cols=("repo",)
        ),
    )
    return a, b, u


def test_alias_bit_identical_to_union_index(split_and_union):
    a, b, u = split_and_union
    alias = MultiIndexEngine([a, b])
    union = QueryEngine(u)
    try:
        assert alias.N == union.N
        assert alias.avgdl == union.avgdl  # bit equality, not approx
        texts = [q["text"] for q in generate_queries(seed=5, n=40)]
        for mode in ("or", "and"):
            got = alias.search_many([{"text": t, "mode": mode} for t in texts], k=10)
            want = union.search_many([{"text": t, "mode": mode} for t in texts], k=10)
            assert got == want, mode
        # phrase across the alias (both members positional)
        got = alias.search_many(
            [{"text": "hot term", "mode": "phrase"},
             {"text": "term hot", "mode": "phrase", "slop": 2}], k=10
        )
        want = union.search_many(
            [{"text": "hot term", "mode": "phrase"},
             {"text": "term hot", "mode": "phrase", "slop": 2}], k=10
        )
        assert got == want and any(got)
        # df blending: every query term's global df matches the union index
        terms = sorted({t for q in texts[:10] for t in alias.analyze(q)})
        np.testing.assert_array_equal(
            alias.global_dfs(terms), union.global_dfs(terms)
        )
        # scatter/merge methods work across the alias unchanged
        assert alias.count("hot term") == union.count("hot term")
        assert (
            alias.suggest("parze", max_edits=1)[0]["options"]
            == union.suggest("parze", max_edits=1)[0]["options"]
        )
        # doc-values + docmap paths must span BOTH members (overridden:
        # per-member docmaps into per-member actors)
        assert alias.facets("hot term", "repo") == union.facets("hot term", "repo")
        hits = [d for d, _ in alias.search("parse json", k=20)]
        r = alias.resolve(hits)
        assert sorted(int(x) for x in r["doc_id"]) == sorted(hits)
        assert alias.collapse("parse json", "repo", k=5) == union.collapse(
            "parse json", "repo", k=5
        )
    finally:
        alias.close()
        union.close()


def test_alias_query_string_bit_identical(split_and_union):
    """query_string inherits the alias contract unchanged: blended N/df/avgdl
    + concatenated actor pools make every compiled-tree evaluation input
    equal, so results are bit-identical to the union index."""
    a, b, u = split_and_union
    alias = MultiIndexEngine([a, b])
    union = QueryEngine(u)
    try:
        for q in [
            "hot AND term",
            "(parse OR json) AND hot NOT zzzznope",
            '+hot "hot term"~1^2',
            "par* term",
            "parze~1 hot",
        ]:
            got = alias.query_string(q, k=10, max_expansions=10_000)
            want = union.query_string(q, k=10, max_expansions=10_000)
            assert got == want, repr(q)
        assert alias.query_string("hot AND term", k=10)  # non-vacuous
        # match-set mode spans both members
        assert alias.query_string("hot", k=0) == union.query_string("hot", k=0)
        # highlight positions span both members identically (positions are
        # per-doc, so member/union layout cannot matter)
        got_hl = alias.query_string_highlight("hot AND term", k=5)
        want_hl = union.query_string_highlight("hot AND term", k=5)
        assert got_hl == want_hl and got_hl and all(h for _, _, h in got_hl)
        # aggs under a query_string match set span both members
        assert alias.query_string_agg("hot AND term", agg="count") == \
            union.query_string_agg("hot AND term", agg="count") > 0
        assert alias.query_string_agg("hot AND term", "doc_len", agg="stats") == \
            union.query_string_agg("hot AND term", "doc_len", agg="stats")
    finally:
        alias.close()
        union.close()


def test_alias_rejects_mismatched_members(split_and_union, tiny_corpus, tmp_path_factory):
    a, _, _ = split_and_union
    other = str(tmp_path_factory.mktemp("aliasws") / "ws")
    files = corpus_files(tiny_corpus)
    build_index(
        files[:1], other, mode="full",
        config=IndexConfig(analyzer="whitespace", num_segments=2),
    )
    with pytest.raises(ValueError, match="disagree"):
        MultiIndexEngine([a, other])


def test_alias_needs_members():
    with pytest.raises(ValueError, match="at least one"):
        MultiIndexEngine([])
