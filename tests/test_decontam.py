"""Benchmark decontamination (stages/decontam.py): oracle = pure-Python
k-gram string sets. Pins: occurrence counts, the no-short-doc rule, the
filter pass, and hash/string agreement."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_data_import_handler_ray.stages.decontam import (
    benchmark_shingles,
    contamination_flags,
    decontaminate,
)

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "the quick brown fox jumps over the lazy dog today"),          # planted
    (2, "unrelated words entirely different from any benchmark text"),
    (3, "prefix filler the quick brown fox jumps over the lazy dog trailing"),
    (4, "short doc only"),                                             # < k tokens
    (5, "the quick brown fox jumps over the lazy dog today "
        "the quick brown fox jumps over the lazy dog today"),          # 2 occurrences+
]
BENCH = ["the quick brown fox jumps over the lazy dog today benchmark answer"]
K = 8


def _grams(text: str, k: int = K) -> list[str]:
    toks = text.lower().split()
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _oracle():
    bench = set(g for t in BENCH for g in _grams(t))
    out = {}
    for d, t in DOCS:
        gs = _grams(t)
        hits = sum(g in bench for g in gs)
        out[d] = (len(gs), hits)
    return out


@pytest.fixture(scope="module")
def corpus():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
                "text": pa.array([t for _, t in DOCS], type=pa.large_string()),
            }
        )
    )


def test_flags_match_string_oracle(corpus):
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["contaminated"])
        for r in contamination_flags(corpus, BENCH, shingle_k=K).take_all()
    }
    want = _oracle()
    for d, (n_g, n_hit) in want.items():
        assert got[d] == (n_g, n_hit, n_hit > 0), d
    assert got[1][2] and got[3][2] and got[5][2]
    assert not got[0][2] and not got[2][2]
    assert got[4] == (0, 0, False)  # short docs have no k-gram
    assert got[5][1] >= 2  # occurrences, not unique shingles


def test_decontaminate_filters_exactly_the_flagged(corpus):
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, BENCH, shingle_k=K).take_all())
    want = sorted(d for d, (_, h) in _oracle().items() if h == 0)
    assert kept == want


def test_empty_benchmark_keeps_everything(corpus):
    assert decontaminate(corpus, [], shingle_k=K).count() == len(DOCS)
    flags = contamination_flags(corpus, [], shingle_k=K).take_all()
    assert not any(r["contaminated"] for r in flags)


def test_benchmark_shingles_sorted_unique():
    sh = benchmark_shingles(BENCH + BENCH, shingle_k=K)
    assert np.array_equal(sh, np.unique(sh))
    assert len(sh) == len(set(_grams(BENCH[0])))
