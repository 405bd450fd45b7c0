"""ES ``shingle`` token filter (functions/analysis.ShingleAnalyzer): word
n-grams in ES token-stream order (unigram then the shingles starting at that
position), empties dropped before pairing. Pinned against a naive per-doc
Python expansion and the get_analyzer name round-trip; the df semantics over
a real corpus are value-checked by the term_df_shingle FULL-SQL entry."""

import random

import pyarrow as pa
import pytest

from elasticsearch_data_import_handler_ray.functions.analysis import (
    ShingleAnalyzer,
    WhitespaceAnalyzer,
    get_analyzer,
)


def _naive_shingles(tokens, lo, hi, unigrams):
    out = []
    n = len(tokens)
    for p in range(n):
        if unigrams:
            out.append(tokens[p])
        for s in range(lo, hi + 1):
            if p + s <= n:
                out.append(" ".join(tokens[p : p + s]))
    return out


def test_shingle_matches_naive():
    rng = random.Random(5)
    words = ["a", "bb", "ccc", "Ünï", "你好", "z9"]
    rows = [" ".join(rng.choices(words, k=rng.randrange(0, 7))) for _ in range(200)]
    rows += ["", None, "  double  spaces  ", "solo"]
    base = WhitespaceAnalyzer()
    for lo, hi, uni in [(2, 2, True), (2, 2, False), (2, 3, True), (3, 4, False)]:
        az = ShingleAnalyzer(base, min_size=lo, max_size=hi, output_unigrams=uni)
        got = az.tokens_of(pa.array(rows, type=pa.large_string())).to_pylist()
        for row, g in zip(rows, got):
            toks = [] if row is None else [t.lower() for t in row.split() if t]
            assert g == _naive_shingles(toks, lo, hi, uni), (row, lo, hi, uni)


def test_shingle_es_default_golden():
    az = get_analyzer("whitespace+shingle")
    got = az.tokens_of(pa.array(["a b c"], type=pa.large_string())).to_pylist()[0]
    assert got == ["a", "a b", "b", "b c", "c"]  # the ES (2,2,unigrams) default


def test_shingle_after_stop_filter_closes_stream():
    # stopword removal happens BEFORE shingling, so the shingle bridges the
    # gap (documented divergence: no "_" filler tokens)
    az = get_analyzer("whitespace+stop+shingle2_2nouni")
    got = az.tokens_of(pa.array(["json the parser"], type=pa.large_string())).to_pylist()[0]
    assert got == ["json parser"]


def test_shingle_name_roundtrip_and_errors():
    for name in ["whitespace+shingle2_3", "code+shingle2_2nouni", "unicode+stop+shingle"]:
        assert get_analyzer(get_analyzer(name).name).name == get_analyzer(name).name
    with pytest.raises(ValueError):
        ShingleAnalyzer(WhitespaceAnalyzer(), 1, 2)
    with pytest.raises(ValueError):
        ShingleAnalyzer(WhitespaceAnalyzer(), 3, 2)
    with pytest.raises(KeyError):
        get_analyzer("whitespace+shingles")


def test_shingle_query_side_expands_identically():
    # doc and query side share tokens_of: a 3-word query yields its unigrams
    # + bigrams, exactly how ES match-queries a shingled field
    az = get_analyzer("whitespace+shingle")
    assert az.analyze_query("x y z") == ["x", "x y", "y", "y z", "z"]
