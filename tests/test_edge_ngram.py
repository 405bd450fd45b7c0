"""ES ``edge_ngram`` token filter — search-as-you-type (functions/analysis.py
``EdgeNgramAnalyzer``).

The ES recipe this mirrors: a field mapped with an edge_ngram index
``analyzer`` and the plain base ``search_analyzer`` — every indexed token is
expanded to its prefixes (min_gram..max_gram), the typed query is NOT
expanded, so ``sear`` term-matches any doc containing a token starting with
"sear". Tests pin (1) the vectorized expansion against a naive per-token
Python oracle, (2) filter-chain composition + name round-trip through
``get_analyzer``, and (3) end-to-end rank identity: an index built with
``whitespace+edge1_12`` serves prefix queries exactly like the BM25 oracle
running the same asymmetric analyzer."""

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions.analysis import (
    EdgeNgramAnalyzer,
    WhitespaceAnalyzer,
    get_analyzer,
    term_frequencies,
)
from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.oracle import BM25Oracle
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig


def _naive_edge(tokens: list[str], lo: int, hi: int) -> list[str]:
    out = []
    for t in tokens:
        for k in range(lo, min(len(t), hi) + 1):
            out.append(t[:k])
    return out


def test_edge_expansion_matches_naive():
    rng = random.Random(7)
    words = ["a", "ab", "zebra", "searchable", "Ünïcode", "你好世界", "x" * 25, "", "q9"]
    rows = [" ".join(rng.choices(words, k=rng.randrange(0, 8))) for _ in range(300)]
    rows += ["", None]
    base = WhitespaceAnalyzer()
    for lo, hi in [(1, 4), (2, 3), (3, 20), (1, 30)]:
        az = EdgeNgramAnalyzer(base, min_gram=lo, max_gram=hi)
        got = az.tokens_of(pa.array(rows, type=pa.large_string())).to_pylist()
        for row, g in zip(rows, got):
            base_toks = [] if row is None else [t for t in row.lower().split() if t]
            assert g == _naive_edge(base_toks, lo, hi), (row, lo, hi)


def test_edge_unicode_slices_codepoints():
    az = EdgeNgramAnalyzer(WhitespaceAnalyzer(), 1, 3)
    got = az.tokens_of(pa.array(["héllo 你好"], type=pa.large_string())).to_pylist()[0]
    assert got == ["h", "hé", "hél", "你", "你好"]


def test_get_analyzer_edge_roundtrip_and_errors():
    az = get_analyzer("whitespace+edge2_10")
    assert isinstance(az, EdgeNgramAnalyzer)
    assert (az.min_gram, az.max_gram) == (2, 10)
    assert get_analyzer(az.name).name == az.name  # manifest round-trip
    # bare +edge = ES-ish default 1..20
    az_d = get_analyzer("code+edge")
    assert (az_d.min_gram, az_d.max_gram) == (1, 20)
    # edge applies LAST in the chain: stopword is removed before expansion
    az_c = get_analyzer("whitespace+stop+edge3_5")
    toks = az_c.tokens_of(pa.array(["the searcher"], type=pa.large_string())).to_pylist()[0]
    assert toks == ["sea", "sear", "searc"]
    with pytest.raises(ValueError):
        EdgeNgramAnalyzer(WhitespaceAnalyzer(), 0, 5)
    with pytest.raises(ValueError):
        EdgeNgramAnalyzer(WhitespaceAnalyzer(), 4, 3)
    with pytest.raises(KeyError):
        get_analyzer("whitespace+edgy")


def test_query_side_is_base_analyzer():
    az = get_analyzer("code+edge1_8")
    # doc side expands; query side must NOT (the ES search_analyzer split)
    assert az.analyze_query("loadConfig") == ["load", "config"]


def test_term_frequencies_over_edge_analyzer():
    az = get_analyzer("whitespace+edge1_4")
    post, dl = term_frequencies(
        az,
        pa.array([1], type=pa.uint64()),
        pa.array(["sea seat"], type=pa.large_string()),
    )
    d = {r["term"]: r["tf"] for r in post.to_pylist()}
    # sea: from both tokens; seat only from the longer one
    assert d == {"s": 2, "se": 2, "sea": 2, "seat": 1}
    assert dl.to_pylist() == [{"doc_id": 1, "doc_len": 7}]


@pytest.fixture(scope="module")
def edge_index(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("edge") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="whitespace+edge1_12", num_segments=4,
            doc_id_col="doc_id", content_col="text",
        ),
    )
    eng = QueryEngine(idx)
    yield eng
    eng.close()


@pytest.fixture(scope="module")
def edge_oracle(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return BM25Oracle(
        get_analyzer("whitespace+edge1_12"),
        t["doc_id"].to_numpy().astype(np.uint64),
        t["text"].combine_chunks(),
    )


@pytest.mark.parametrize("method", ["exhaustive", "bmw"])
def test_search_as_you_type_rank_identity(edge_index, edge_oracle, method):
    queries = [
        {"text": "has joi", "mode": "or"},     # prefixes of hash/join-ish terms
        {"text": "vec", "mode": "or"},
        {"text": "merge so", "mode": "and"},   # whole word + prefix, AND
        {"text": "q", "mode": "or"},           # 1-gram: very high df
    ]
    results = edge_index.search_many(queries, k=10, method=method)
    n_nonempty = 0
    for q, got in zip(queries, results):
        want = edge_oracle.search(q["text"], k=10, mode=q["mode"])
        assert [d for d, _ in got] == [d for d, _ in want], (method, q)
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12)
        n_nonempty += bool(got)
    assert n_nonempty >= 3


def test_prefix_longer_than_max_gram_matches_nothing(edge_index):
    # 13 chars > max_gram=12: never indexed, never matched (ES behavior —
    # no silent truncation of the query token)
    res = edge_index.search("organizations", k=5)
    assert res == []
