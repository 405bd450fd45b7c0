"""ES span queries (span_near / span_first, index/query.py _score_spans):
Lucene single-term-clause span semantics — ordered chain or unordered
smallest-window with (span - n) <= slop; span_first = occurrence ending by
``end``. Oracle: a naive all-selections scorer over the raw corpus (BM25
over unique clause terms, the engine's documented ranking rule)."""

import itertools
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions import bm25
from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig


@pytest.fixture(scope="module")
def span_env(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("span") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"), idx, mode="full",
        config=IndexConfig(analyzer="whitespace", positions=True, num_segments=4,
                           doc_id_col="doc_id", content_col="text"),
    )
    eng = QueryEngine(idx)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    docs = {int(d): s.lower().split() for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    yield eng, docs
    eng.close()


def _score(docs, d, terms):
    N = len(docs)
    avgdl = sum(len(ts) for ts in docs.values()) / N
    ts = docs[d]
    s = 0.0
    for tm in sorted(set(terms)):
        df = sum(1 for x in docs.values() if tm in x)
        tf = ts.count(tm)
        s += bm25.contribution(
            bm25.idf(N, df), np.array([tf]), np.array([len(ts)]), avgdl, 1.2, 0.75
        )[0]
    return s


def _naive_near(docs, clauses, slop, in_order, k=10):
    out = []
    n = len(clauses)
    for d, ts in docs.items():
        pls = [[i for i, x in enumerate(ts) if x == c] for c in clauses]
        if any(not p for p in pls):
            continue
        hit = False
        for sel in itertools.product(*pls):
            if in_order and not all(sel[i] < sel[i + 1] for i in range(n - 1)):
                continue
            if not in_order and len(set(sel)) != n:
                continue
            if (max(sel) - min(sel) + 1) - n <= slop:
                hit = True
                break
        if hit:
            out.append((_score(docs, d, clauses), d))
    out.sort(key=lambda sd: (-sd[0], sd[1]))
    return [(d, s) for s, d in out[:k]]


def _naive_first(docs, term, end, k=10):
    out = []
    for d, ts in docs.items():
        pos = [i for i, x in enumerate(ts) if x == term]
        if pos and min(pos) < end:
            out.append((_score(docs, d, [term]), d))
    out.sort(key=lambda sd: (-sd[0], sd[1]))
    return [(d, s) for s, d in out[:k]]


@pytest.mark.parametrize(
    "text,slop,in_order",
    [
        ("hash join", 0, True),
        ("hash join", 3, True),
        ("join hash", 2, False),
        ("merge sort tree", 6, True),
        ("vector scan filter", 4, False),
        ("hash hash", 2, True),  # repeated clause term, ordered chain
    ],
)
def test_span_near_rank_identity(span_env, text, slop, in_order):
    eng, docs = span_env
    got = eng.span_near_search(text, slop=slop, in_order=in_order, k=10)
    want = _naive_near(docs, text.split(), slop, in_order)
    assert [d for d, _ in got] == [d for d, _ in want], (text, slop, in_order)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_span_near_nonempty_somewhere(span_env):
    eng, _ = span_env
    assert eng.span_near_search("hash join", slop=3, in_order=True, k=10)


@pytest.mark.parametrize("term,end", [("hash", 1), ("hash", 3), ("join", 8)])
def test_span_first_rank_identity(span_env, term, end):
    eng, docs = span_env
    got = eng.span_first_search(term, end, k=10)
    want = _naive_first(docs, term, end)
    assert [d for d, _ in got] == [d for d, _ in want], (term, end)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_span_edge_cases(span_env):
    eng, _ = span_env
    with pytest.raises(ValueError, match="repeated"):
        eng.span_near_search("hash hash", in_order=False)
    with pytest.raises(ValueError, match="one term"):
        eng.span_first_search("hash join", 5)
    assert eng.span_first_search("hash", 0) == []
    assert eng.span_near_search("zz_neverseen hash", slop=5) == []
    assert eng.span_near_search("", slop=5) == []


def test_span_requires_positional_index(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("spannopos") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"), idx, mode="full",
        config=IndexConfig(analyzer="whitespace", num_segments=2,
                           doc_id_col="doc_id", content_col="text"),
    )
    eng = QueryEngine(idx)
    try:
        with pytest.raises(ValueError, match="positional"):
            eng.span_near_search("hash join", slop=1)
    finally:
        eng.close()
