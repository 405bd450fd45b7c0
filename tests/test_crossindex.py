"""Cross-index search (index/crossindex.py): dfs_query_then_fetch over two
disjoint indices must be SCORE-IDENTICAL to one index over the union corpus
— the whole point of combining statistics before scoring."""

import pytest

from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.crossindex import MultiIndexEngine
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
from fixtures.gen_corpus import corpus_files, generate_corpus


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("xidx") / "corpus")
    generate_corpus(600, d, seed=11, min_tokens=15, max_tokens=80, n_files=4)
    return d


@pytest.fixture(scope="module")
def indices(corpus, tmp_path_factory):
    files = corpus_files(corpus)
    assert len(files) >= 2
    base = tmp_path_factory.mktemp("xidx_idx")
    cfg = lambda: IndexConfig(analyzer="code", num_segments=4)  # noqa: E731
    a, b, union = str(base / "a"), str(base / "b"), str(base / "union")
    build_index(files[: len(files) // 2], a, mode="full", config=cfg())
    build_index(files[len(files) // 2 :], b, mode="full", config=cfg())
    build_index(files, union, mode="full", config=cfg())
    return a, b, union


def test_score_identical_to_union_index(indices):
    a, b, union = indices
    multi = MultiIndexEngine([a, b])
    single = QueryEngine(union)
    try:
        terms = sorted(single._df_cache, key=lambda t: -single._df_cache[t])
        assert terms, "need a populated vocabulary"
        queries = [
            (terms[0], "or"),
            (f"{terms[0]} {terms[len(terms) // 2]}", "or"),
            (f"{terms[0]} {terms[1]}", "and"),
            (f"{terms[0]} zzzunknown", "and"),  # unknown term -> [] both ways
        ]
        nonempty = 0
        for q, mode in queries:
            got = multi.search(q, k=15, mode=mode)
            want = single.search(q, k=15, mode=mode)
            assert got == want, (q, mode)  # doc ids AND float scores bit-equal
            nonempty += bool(got)
        assert nonempty >= 2
        # combined statistics really are the union's
        assert multi.N == single.N
        assert multi.sum_dl == single.sum_dl
        assert multi.count(terms[0]) == single.count(terms[0])
    finally:
        multi.close()
        single.close()


def test_analyzer_mismatch_rejected(indices, tmp_path_factory, corpus):
    a, _, _ = indices
    files = corpus_files(corpus)
    ws = str(tmp_path_factory.mktemp("xidx_ws") / "ws")
    build_index(files[:1], ws, mode="full",
                config=IndexConfig(analyzer="whitespace", num_segments=2))
    with pytest.raises(ValueError, match="analyzer"):
        MultiIndexEngine([a, ws])
