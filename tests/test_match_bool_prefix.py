"""ES match_bool_prefix (index/query.py): whole-term bool clauses + last
token as a prefix clause. Oracle: naive scorer over the raw corpus with the
same capped-expansion contract (global first max_expansions dictionary terms)
— covers both operators, the expansion∩must overlap waiver, and empties."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions import bm25
from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig


@pytest.fixture(scope="module")
def mbp_env(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("mbp") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"), idx, mode="full",
        config=IndexConfig(analyzer="whitespace", num_segments=4,
                           doc_id_col="doc_id", content_col="text"),
    )
    eng = QueryEngine(idx)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    docs = {int(d): s.lower().split() for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    yield eng, docs
    eng.close()


def _naive(docs, text, operator, max_expansions=50, k=10):
    toks = text.lower().split()
    prefix, rest = toks[-1], toks[:-1]
    vocab = sorted({t for ts in docs.values() for t in ts})
    expanded = [t for t in vocab if t.startswith(prefix)][:max_expansions]
    if operator == "and" and not expanded:
        return []
    terms = sorted(set(rest) | set(expanded))
    N = len(docs)
    avgdl = sum(len(ts) for ts in docs.values()) / N
    dfs = {t: sum(1 for ts in docs.values() if t in ts) for t in terms}
    out = []
    overlap = bool(set(expanded) & set(rest))
    for d, ts in docs.items():
        present = [t for t in terms if t in ts]
        if not present:
            continue
        if operator == "and":
            if not set(rest) <= set(ts):
                continue
            if not overlap and not (set(expanded) & set(ts)):
                continue
        score = 0.0
        for t in present:  # terms sorted ascending
            score += bm25.contribution(
                bm25.idf(N, dfs[t]), np.array([ts.count(t)]),
                np.array([len(ts)]), avgdl, 1.2, 0.75,
            )[0]
        out.append((score, d))
    out.sort(key=lambda sd: (-sd[0], sd[1]))
    return [(d, s) for s, d in out[:k]]


@pytest.mark.parametrize(
    "text,operator",
    [
        ("hash join quer", "and"),
        ("hash join quer", "or"),
        ("vector sc", "or"),
        ("merge so", "and"),
        ("ha", "or"),              # single prefix clause
        ("hash ha", "and"),        # expansion overlaps a must term → waiver
    ],
)
def test_match_bool_prefix_rank_identity(mbp_env, text, operator):
    eng, docs = mbp_env
    got = eng.match_bool_prefix(text, k=10, operator=operator)
    want = _naive(docs, text, operator)
    assert [d for d, _ in got] == [d for d, _ in want], (text, operator)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)
    assert got, (text, operator)  # every parametrized case should match


def test_match_bool_prefix_empty_cases(mbp_env):
    eng, _ = mbp_env
    assert eng.match_bool_prefix("", k=5) == []
    # prefix expanding to nothing: AND = prefix clause is a must → empty
    assert eng.match_bool_prefix("hash zzzz_nope", k=5, operator="and") == []
    # OR still matches on the whole-term clause
    assert eng.match_bool_prefix("hash zzzz_nope", k=5, operator="or")
