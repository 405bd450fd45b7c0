"""Multi-field weighted BM25 (index/multifield.py) — the reference mapped SQL
columns to multi-field ES documents; this pins the rebuilt equivalent:
rank AND score identity of Σ_f w_f·BM25_f against a naive per-field oracle,
across or/and modes, including docs present in only one field's index."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions.analysis import CodeAnalyzer
from elasticsearch_data_import_handler_ray.index.multifield import (
    MultiFieldEngine,
    build_multifield_index,
)
from elasticsearch_data_import_handler_ray.index.oracle import BM25Oracle, MultiFieldOracle
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig


@pytest.fixture(scope="module")
def mf_built(sf_dir, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("mf") / "idx")
    res = build_multifield_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        fields={"text": 1.0, "source": 2.0},
        config=IndexConfig(analyzer="code", num_segments=4, doc_id_col="doc_id"),
    )
    assert res["text"].n_docs > 0 and res["source"].n_docs > 0
    return index_dir


@pytest.fixture(scope="module")
def mf_oracle(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
    az = CodeAnalyzer()
    return MultiFieldOracle(
        {
            "text": BM25Oracle(az, ids, t["text"].combine_chunks()),
            "source": BM25Oracle(az, ids, t["source"].combine_chunks()),
        },
        {"text": 1.0, "source": 2.0},
    )


def test_multifield_rank_and_score_identity(mf_built, mf_oracle):
    eng = MultiFieldEngine(mf_built)
    queries = [
        {"text": "hash join query", "mode": "or"},
        {"text": "vector scan filter", "mode": "or"},
        {"text": "src3 src7", "mode": "or"},    # source-only terms
        {"text": "merge sort", "mode": "and"},
        {"text": "the data stream", "mode": "or"},
        {"text": "zzznotaterm", "mode": "or"},
        {"text": "data zzznotaterm", "mode": "and"},
    ]
    try:
        got = eng.search_many(queries, k=10)
    finally:
        eng.close()
    n_nonempty = 0
    for q, g in zip(queries, got):
        want = mf_oracle.search(q["text"], k=10, mode=q["mode"])
        assert g == [(d, s) for d, s in want], q
        n_nonempty += bool(want)
    assert n_nonempty >= 4


def test_multifield_weights_flow_into_scores(mf_built):
    """Sanity: zeroing the source weight must change combined scores for
    docs whose source field matches the query (the boost actually flows).
    `source` is near-categorical, so doc ORDER may persist — scores cannot."""
    import json

    eng = MultiFieldEngine(mf_built)
    try:
        combined = dict(eng.search("hash join src3", k=300, mode="or"))
    finally:
        eng.close()
    with open(os.path.join(mf_built, "multifield.json"), "w") as fh:
        json.dump({"fields": {"text": 1.0, "source": 0.0}}, fh)
    eng2 = MultiFieldEngine(mf_built)
    try:
        text_only = dict(eng2.search("hash join src3", k=300, mode="or"))
    finally:
        eng2.close()
    with open(os.path.join(mf_built, "multifield.json"), "w") as fh:
        json.dump({"fields": {"text": 1.0, "source": 2.0}}, fh)
    overlap = set(combined) & set(text_only)
    assert overlap
    assert any(combined[d] != text_only[d] for d in overlap)
