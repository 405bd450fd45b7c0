"""Percolator (stages/percolate.py): registered queries matched against a
document stream. Oracle: a naive per-doc Python evaluator over the same
analyzer's token streams (or / and / phrase)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from elasticsearch_data_import_handler_ray.functions.analysis import get_analyzer
from elasticsearch_data_import_handler_ray.stages.percolate import percolate


QUERIES = [
    {"query_id": "q_or", "text": "parse json", "mode": "or"},
    {"query_id": "q_and", "text": "parse json", "mode": "and"},
    {"query_id": "q_phrase", "text": "parse json", "mode": "phrase"},
    {"query_id": "q_single", "text": "buffer", "mode": "and"},
    {"query_id": "q_missing", "text": "zzqqneverseen", "mode": "or"},
    {"query_id": "q_empty", "text": "!!!", "mode": "or"},  # analyzes to nothing
]


def _naive(df, queries, analyzer="code"):
    az = get_analyzer(analyzer)
    out = set()
    for _, row in df.iterrows():
        toks = [t for t in az.analyze_query(row["text"])]
        tset = set(toks)
        for q in queries:
            qt = az.analyze_query(q["text"])
            if not qt:
                continue
            uniq = set(qt)
            mode = q.get("mode", "or")
            if mode == "or":
                hit = bool(uniq & tset)
            elif mode == "and":
                hit = uniq <= tset
            else:
                n = len(qt)
                hit = uniq <= tset and any(
                    toks[i : i + n] == qt for i in range(len(toks) - n + 1)
                )
            if hit:
                out.add((int(row["doc_id"]), q["query_id"]))
    return out


def test_percolate_matches_naive_oracle():
    rng = np.random.default_rng(5)
    vocab = ["parse", "json", "buffer", "merge", "sort", "alloc", "free"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(2, 12))))
        for _ in range(400)
    ]
    texts += ["parse json exact here", "json parse reversed", "", "parse"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    got_t = percolate(
        ray.data.from_pandas(df), QUERIES, analyzer="code"
    ).to_pandas()
    got = set(zip(got_t["doc_id"].astype(int), got_t["query_id"]))
    want = _naive(df, QUERIES)
    assert got == want
    # the interesting cases actually occur
    qs = {q for _, q in want}
    assert {"q_or", "q_and", "q_phrase", "q_single"} <= qs
    assert "q_missing" not in qs and "q_empty" not in qs
    # phrase is strictly stricter than and
    n_and = sum(1 for _, q in want if q == "q_and")
    n_ph = sum(1 for _, q in want if q == "q_phrase")
    assert 0 < n_ph < n_and


def test_percolate_no_queries_empty():
    df = pd.DataFrame({"doc_id": [1], "text": ["parse json"]})
    out = percolate(ray.data.from_pandas(df), [{"query_id": "e", "text": "!!!"}])
    assert out.count() == 0
