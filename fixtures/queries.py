"""Deterministic reference query set (FIXTURES.md §1).

50 queries drawn by seeded sampling from the same vocabulary as the corpus:
20 single-term (mid-frequency + planted hot terms), 20 two-to-four-term OR,
10 AND. k=10. Golden results come from the exact BM25 oracle
(elasticsearch_data_import_handler_ray/index/oracle.py), never hand-written.
"""

from __future__ import annotations

import numpy as np

from .gen_corpus import _build_vocab, _zipf_probs, N_HOT


def generate_queries(seed: int = 42, n: int = 50) -> list[dict]:
    rng = np.random.default_rng(seed + 1)
    vocab = _build_vocab(np.random.default_rng(seed))  # same vocab as the corpus
    probs = _zipf_probs()
    hot = [f"hot_term_{j}" for j in range(N_HOT)]

    queries: list[dict] = []
    # 20 single-term: 14 mid-frequency vocab draws + 6 hot terms
    for i in range(14):
        t = vocab[int(rng.choice(len(vocab), p=probs))]
        queries.append({"qid": f"s{i}", "text": str(t), "mode": "or"})
    for i in range(6):
        queries.append({"qid": f"h{i}", "text": hot[int(rng.integers(0, N_HOT))], "mode": "or"})
    # 20 OR queries of 2-4 terms (occasionally a hot term mixed in)
    for i in range(20):
        k = int(rng.integers(2, 5))
        terms = [str(vocab[int(rng.choice(len(vocab), p=probs))]) for _ in range(k)]
        if rng.random() < 0.25:
            terms[0] = hot[int(rng.integers(0, N_HOT))]
        queries.append({"qid": f"o{i}", "text": " ".join(terms), "mode": "or"})
    # 10 AND queries of 2-3 terms (common terms so intersections are non-empty)
    for i in range(10):
        k = int(rng.integers(2, 4))
        terms = [str(vocab[int(rng.choice(2000, p=probs[:2000] / probs[:2000].sum()))]) for _ in range(k)]
        queries.append({"qid": f"a{i}", "text": " ".join(terms), "mode": "and"})
    return queries[:n]
