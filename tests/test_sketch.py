"""Count-Min heavy hitters (stages/sketch.py): the CMS overestimate bound
holds, top-k matches exact counting when capacity is ample, and a planted
Zipf head is recovered exactly."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from elasticsearch_data_import_handler_ray.stages.sketch import cms_heavy_hitters


def _corpus(n_docs=400, seed=2):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(300)])
    probs = (1.0 / np.arange(1, 301)) ** 1.2
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(20, 60)), p=probs))
        for _ in range(n_docs)
    ]
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})


def _exact(df):
    s = pd.Series(" ".join(df["text"]).split()).value_counts()
    return s


def test_cms_topk_matches_exact_when_capacity_ample():
    df = _corpus()
    exact = _exact(df)
    got = cms_heavy_hitters(
        ray.data.from_pandas(df), k=15, width=8192, depth=5, track=128
    ).to_pandas()
    # wide grid → zero collisions in practice: estimates equal exact counts
    want = exact.head(15)
    assert got["term"].tolist() == want.index.tolist()
    assert got["est_count"].tolist() == want.tolist()


def test_cms_overestimate_bound():
    df = _corpus(seed=5)
    exact = _exact(df)
    N = int(exact.sum())
    width, depth = 512, 4  # deliberately tight: collisions occur
    got = cms_heavy_hitters(
        ray.data.from_pandas(df), k=30, width=width, depth=depth, track=128
    ).to_pandas()
    eps = np.e / width
    for term, est in zip(got["term"], got["est_count"]):
        true = int(exact.get(term, 0))
        assert est >= true  # CMS never underestimates
        assert est <= true + eps * N * 3  # bound holds with slack (whp per row)
    # the true top-5 are all present among the returned heavy hitters
    assert set(exact.head(5).index) <= set(got["term"])


def test_cms_empty_input():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["", "   "]})
    got = cms_heavy_hitters(ray.data.from_pandas(df), k=5).to_pandas()
    assert len(got) == 0
