"""Bigram-LM quality scoring (stages/lm.py): oracle = pure-Python string
bigram model with the same add-k smoothing."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_data_import_handler_ray.stages.lm import fit_bigram_lm, lm_score

REF = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
]
DOCS = [
    (0, "the cat sat on the mat"),        # fully in-model
    (1, "the cat flew over the moon"),    # partly OOV bigrams
    (2, "zzz qqq www"),                   # fully OOV
    (3, "single"),                        # no bigram
    (4, ""),                              # empty
]
K = 0.5


def _oracle():
    uni: dict = {}
    bi: dict = {}
    for t in REF:
        toks = t.lower().split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    out = {}
    for d, t in DOCS:
        toks = t.lower().split()
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out[d] = (0, None)
            continue
        nlps = [
            -math.log2((bi.get(p, 0) + K) / (uni.get(p[0], 0) + K * V)) for p in pairs
        ]
        out[d] = (len(pairs), float(np.mean(nlps)))
    return out


def test_lm_score_matches_string_oracle():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
                "text": pa.array([t for _, t in DOCS], type=pa.large_string()),
            }
        )
    )
    lm = fit_bigram_lm(REF, add_k=K)
    got = {r["doc_id"]: r for r in lm_score(ds, lm).take_all()}
    want = _oracle()
    for d, (n, s) in want.items():
        assert got[d]["n_bigrams"] == n, d
        if s is None:
            assert got[d]["avg_neg_logprob"] is None or np.isnan(got[d]["avg_neg_logprob"])
        else:
            assert got[d]["avg_neg_logprob"] == pytest.approx(s, rel=1e-12), d
    # ordering property: the fully in-model doc scores better (lower) than a
    # doc whose first words are in-vocab but whose bigrams are unseen (with
    # add-k and a tiny V, fully-OOV w1 shrinks the denominator, so only the
    # in-vocab-w1 comparison is meaningful)
    ds2 = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([9], type=pa.int64()),
                  "text": pa.array(["the mat on cat the sat"], type=pa.large_string())})
    )
    lm = fit_bigram_lm(REF, add_k=K)
    shuffled = lm_score(ds2, lm).take_all()[0]["avg_neg_logprob"]
    assert got[0]["avg_neg_logprob"] < shuffled


def test_lm_empty_reference():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "text": pa.array(["some text here"], type=pa.large_string())})
    )
    lm = fit_bigram_lm([], add_k=K)
    assert lm.vocab == 0
    rows = lm_score(ds, lm).take_all()
    # V=0 → p = (0+k)/(0+0) = inf → define: guard produces inf scores; just
    # assert it does not crash and counts bigrams
    assert rows[0]["n_bigrams"] == 2
