"""Positional postings + phrase queries (SURVEY.md §2.B3/B8 positional
variant; VERDICT.md round-1 gap #1).

Pins: (1) the position codec round-trips, including selective gathers;
(2) the positional tokenizer emits the same (doc_id, term, tf) multiset as
the non-positional one, with correct token positions; (3) phrase top-k is
rank- AND score-identical to a naive Python sliding-window oracle; (4) the
positional sidecar survives incremental builds + merge byte-identically;
(5) a non-positional build writes no positions.bin (format unchanged)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_data_import_handler_ray.functions.analysis import (
    CodeAnalyzer,
    get_analyzer,
    term_frequencies,
    term_frequencies_positions,
)
from elasticsearch_data_import_handler_ray.functions.codec import (
    decode_positions,
    encode_positions,
    gather_position_slices,
)
from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.merge import merge_index
from elasticsearch_data_import_handler_ray.index.oracle import PhraseOracle
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
from fixtures.gen_corpus import corpus_files


# --------------------------------------------------------------- codec level
def _random_positions(rng, n_terms=7, max_postings=20, max_tf=9):
    """→ (term_bounds, tfs, pos_flat) with strictly-increasing positions."""
    dfs = rng.integers(1, max_postings, size=n_terms)
    bounds = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(dfs, out=bounds[1:])
    tfs = rng.integers(1, max_tf, size=int(dfs.sum())).astype(np.uint64)
    pos_parts = []
    for c in tfs:
        p = np.sort(rng.choice(10_000, size=int(c), replace=False)).astype(np.uint64)
        pos_parts.append(p)
    return bounds, tfs, np.concatenate(pos_parts)


def test_positions_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        bounds, tfs, pos = _random_positions(rng)
        blob, offs, lens = encode_positions(bounds, tfs, pos)
        got = decode_positions(blob, tfs)
        np.testing.assert_array_equal(got, pos)
        # per-term slices decode independently via (offset, length)
        b = np.frombuffer(blob, dtype=np.uint8)
        for ti in range(len(bounds) - 1):
            s, e = bounds[ti], bounds[ti + 1]
            sl = b[offs[ti] : offs[ti] + lens[ti]]
            np.testing.assert_array_equal(
                decode_positions(sl, tfs[s:e]),
                pos[int(tfs[:s].sum()) : int(tfs[:e].sum())],
            )


def test_gather_position_slices_selective():
    rng = np.random.default_rng(11)
    bounds, tfs, pos = _random_positions(rng, n_terms=1, max_postings=50)
    blob, _, _ = encode_positions(bounds, tfs, pos)
    b = np.frombuffer(blob, dtype=np.uint8)
    cnt_cum = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
    n_post = len(tfs)
    for sel in [np.array([0]), np.array([n_post - 1]), np.arange(0, n_post, 3)]:
        flat, counts = gather_position_slices(b, tfs, sel)
        np.testing.assert_array_equal(counts, tfs[sel].astype(np.int64))
        want = np.concatenate([pos[cnt_cum[j] : cnt_cum[j + 1]] for j in sel])
        np.testing.assert_array_equal(flat, want)


def test_encode_positions_rejects_nonincreasing():
    bounds = np.array([0, 1], dtype=np.int64)
    tfs = np.array([2], dtype=np.uint64)
    with pytest.raises(ValueError):
        encode_positions(bounds, tfs, np.array([5, 5], dtype=np.uint64))


# ------------------------------------------------------------ analysis level
def test_positions_tokenizer_matches_tf_path():
    az = CodeAnalyzer()
    docs = pa.array(
        [
            "fooBar baz foo_bar baz baz",
            "",
            "getUser(getUser) get user",
            "hot_term_0 x hot_term_0",
        ],
        type=pa.large_string(),
    )
    ids = pa.array(np.arange(4, dtype=np.uint64))
    p1, d1 = term_frequencies(az, ids, docs)
    p2, d2 = term_frequencies_positions(az, ids, docs)
    key = lambda t: sorted(
        zip(
            t["doc_id"].to_pylist(), t["term"].to_pylist(), t["tf"].to_pylist()
        )
    )
    assert key(p1) == key(p2)
    assert sorted(zip(d1["doc_id"].to_pylist(), d1["doc_len"].to_pylist())) == sorted(
        zip(d2["doc_id"].to_pylist(), d2["doc_len"].to_pylist())
    )
    # hand-checked positions: doc 0 analyzes to
    #   foo bar baz foo bar baz baz  →  foo@[0,3] bar@[1,4] baz@[2,5,6]
    rows = {
        (int(d), t): ps
        for d, t, ps in zip(
            p2["doc_id"].to_pylist(), p2["term"].to_pylist(), p2["pos"].to_pylist()
        )
    }
    assert rows[(0, "foo")] == [0, 3]
    assert rows[(0, "bar")] == [1, 4]
    assert rows[(0, "baz")] == [2, 5, 6]


# ------------------------------------------------------------------- e2e
@pytest.fixture(scope="module")
def pos_index(tiny_corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("posidx") / "tiny")
    res = build_index(
        tiny_corpus,
        index_dir,
        mode="full",
        config=IndexConfig(analyzer="code", num_segments=4, positions=True),
    )
    assert res.n_docs == 1000
    return index_dir


@pytest.fixture(scope="module")
def phrase_oracle(tiny_corpus):
    import pyarrow.parquet as pq

    from elasticsearch_data_import_handler_ray.functions.hashing import doc_ids_batch

    t = pa.concat_tables([pq.read_table(f) for f in corpus_files(tiny_corpus)])
    doc_ids = doc_ids_batch(
        t["repo"].combine_chunks(), t["path"].combine_chunks(), t["commit"].combine_chunks()
    )
    return PhraseOracle(CodeAnalyzer(), doc_ids, t["content"].combine_chunks())


def _phrases(oracle, rng, n=25):
    """Sample real bigrams/trigrams from doc token streams (guaranteed to
    match ≥1 doc) plus a few non-matching and single-term phrases."""
    out = []
    docs = list(oracle.doc_tokens)
    for _ in range(n):
        d = docs[int(rng.integers(0, len(docs)))]
        toks = oracle.doc_tokens[d]
        if len(toks) < 4:
            continue
        i = int(rng.integers(0, len(toks) - 3))
        out.append(" ".join(toks[i : i + int(rng.integers(2, 4))]))
    out += ["hot term", "foo", "zzz qqq never together", "hot_term_0"]
    return out


def test_phrase_rank_and_score_identity(pos_index, phrase_oracle):
    eng = QueryEngine(pos_index)
    rng = np.random.default_rng(3)
    phrases = _phrases(phrase_oracle, rng)
    try:
        got = eng.search_many([{"text": p, "mode": "phrase"} for p in phrases], k=10)
    finally:
        eng.close()
    n_nonempty = 0
    for p, g in zip(phrases, got):
        want = phrase_oracle.search_phrase(p, k=10)
        assert g == [(d, s) for d, s in want], p
        n_nonempty += bool(want)
    assert n_nonempty >= 20


def test_phrase_requires_positions(tiny_corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("nopos") / "tiny")
    build_index(
        tiny_corpus,
        index_dir,
        mode="full",
        config=IndexConfig(analyzer="code", num_segments=2),
    )
    # format unchanged: no positions sidecar anywhere
    assert glob.glob(os.path.join(index_dir, "runs", "*", "*", "positions.bin")) == []
    eng = QueryEngine(index_dir)
    try:
        with pytest.raises(ValueError, match="positional"):
            eng.search("hot term", mode="phrase")
    finally:
        eng.close()


def _segment_bytes(index_dir):
    out = {}
    for f in sorted(
        glob.glob(os.path.join(index_dir, "runs", "*", "seg_*", "*"))
    ):
        rel = os.path.relpath(f, index_dir).split(os.sep, 2)[-1]  # seg_x/file
        with open(f, "rb") as fh:
            out[rel] = fh.read()
    return out


def test_incremental_merge_equals_full_with_positions(tiny_corpus, tmp_path_factory, pos_index):
    """Two incremental runs + merge == one full build, byte-for-byte,
    positions.bin included (merge carries the sidecar losslessly)."""
    files = corpus_files(tiny_corpus)
    cfg = IndexConfig(analyzer="code", num_segments=4, positions=True)
    inc = str(tmp_path_factory.mktemp("posinc") / "idx")
    build_index(files[:2], inc, mode="full", config=cfg)
    build_index(files, inc, mode="incremental")
    merge_index(inc)
    full_merged = str(tmp_path_factory.mktemp("posfull") / "idx")
    build_index(files, full_merged, mode="full", config=cfg)
    merge_index(full_merged)  # single run → no-op, but normalizes layout

    # keys are seg-relative (seg_x/file); both indexes have one run each
    inc_by_seg = _segment_bytes(inc)
    full_by_seg = _segment_bytes(full_merged)
    assert set(inc_by_seg) == set(full_by_seg)
    assert any(k.endswith("positions.bin") for k in inc_by_seg)
    for k in sorted(inc_by_seg):
        if k.endswith("terms.parquet"):
            import pyarrow.parquet as pq

            ta = pq.read_table(pa.BufferReader(inc_by_seg[k]))
            tb = pq.read_table(pa.BufferReader(full_by_seg[k]))
            assert ta.equals(tb), k
        else:
            assert inc_by_seg[k] == full_by_seg[k], k


def test_phrase_after_incremental_without_merge(tiny_corpus, tmp_path_factory, phrase_oracle):
    """Phrase scoring is exact across multiple runs' segments too."""
    files = corpus_files(tiny_corpus)
    cfg = IndexConfig(analyzer="code", num_segments=3, positions=True)
    idx = str(tmp_path_factory.mktemp("posinc2") / "idx")
    build_index(files[:2], idx, mode="full", config=cfg)
    build_index(files, idx, mode="incremental")
    eng = QueryEngine(idx)
    rng = np.random.default_rng(5)
    phrases = _phrases(phrase_oracle, rng, n=10)
    try:
        got = eng.search_many([{"text": p, "mode": "phrase"} for p in phrases], k=10)
    finally:
        eng.close()
    for p, g in zip(phrases, got):
        assert g == [(d, s) for d, s in phrase_oracle.search_phrase(p, k=10)], p


def test_highlight_positions_match_token_stream(pos_index, phrase_oracle):
    """highlight() returns, per top-k doc, each query term's token indices —
    cross-checked against the analyzer's actual token stream per doc."""
    eng = QueryEngine(pos_index)
    try:
        hits = eng.search("hot term merge", k=5, mode="or")
        assert hits
        docs = [d for d, _ in hits]
        hl = eng.highlight("hot term merge", docs)
    finally:
        eng.close()
    checked = 0
    for d in docs:
        toks = phrase_oracle.doc_tokens[d]
        for t, ps in hl.get(d, {}).items():
            want = [i for i, tok in enumerate(toks) if tok == t]
            assert ps == want, (d, t)
            checked += 1
    assert checked >= 5


def test_highlight_requires_positions(tiny_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("hlnopos") / "i")
    build_index(tiny_corpus, idx, mode="full", config=IndexConfig(num_segments=2))
    eng = QueryEngine(idx)
    try:
        with pytest.raises(ValueError, match="positional"):
            eng.highlight("hot term", [1])
    finally:
        eng.close()


# --------------------------------------------------------------- phrase slop
def test_sloppy_match_semantics():
    """Hand-checked ES slop rules against the engine's greedy window matcher:
    gap-of-one needs slop 1, transposed adjacent terms need slop 2, and a
    repeated phrase term can never be satisfied by one occurrence."""
    from elasticsearch_data_import_handler_ray.index.query import _sloppy_match

    def m(phrase, positions, slop):
        slot_pos = [
            np.array(positions[t], dtype=np.int64) for t in phrase
        ]
        return _sloppy_match(phrase, slot_pos, slop)

    # doc tokens: a x b  →  "a b" has a gap of 1
    pos = {"a": [0], "b": [2]}
    assert not m(["a", "b"], pos, 0)
    assert m(["a", "b"], pos, 1)
    # doc tokens: b a  →  "a b" transposed: slop 2, not 1 (documented ES rule)
    pos = {"a": [1], "b": [0]}
    assert not m(["a", "b"], pos, 1)
    assert m(["a", "b"], pos, 2)
    # repeated term: doc has ONE "a" — "a a" must never match (injectivity)
    pos = {"a": [3]}
    assert not m(["a", "a"], pos, 0)
    assert not m(["a", "a"], pos, 10)
    # repeated term with two occurrences: doc tokens a x a
    pos = {"a": [0, 2]}
    assert not m(["a", "a"], pos, 0)
    assert m(["a", "a"], pos, 1)
    # exact adjacency still span 0
    pos = {"a": [5], "b": [6], "c": [7]}
    assert m(["a", "b", "c"], pos, 0)


def test_phrase_slop_identity(pos_index, phrase_oracle):
    """Engine sloppy phrase == brute-force injective-assignment oracle
    (rank AND score) for real sampled phrases plus their transpositions,
    across slop 0..3. slop=0 must also equal the exact-adjacency path."""
    eng = QueryEngine(pos_index)
    rng = np.random.default_rng(11)
    phrases = [p for p in _phrases(phrase_oracle, rng, n=12) if p]
    swapped = []
    for p in phrases:
        toks = p.split()
        if len(toks) >= 2:
            toks[0], toks[1] = toks[1], toks[0]
            swapped.append(" ".join(toks))
    all_p = phrases + swapped
    n_slop_only = 0
    try:
        for slop in (0, 1, 2, 3):
            got = eng.search_many(
                [{"text": p, "mode": "phrase", "slop": slop} for p in all_p], k=10
            )
            for p, g in zip(all_p, got):
                want = phrase_oracle.search_phrase(p, k=10, slop=slop)
                assert g == [(d, s) for d, s in want], (p, slop)
                if slop == 2 and want and not phrase_oracle.search_phrase(p, k=10):
                    n_slop_only += 1
    finally:
        eng.close()
    # the transposed phrases guarantee matches that exact adjacency misses
    assert n_slop_only >= 1


# --------------------------------------------------------------- rescore API
def test_rescore_phrase_window_identity(pos_index, phrase_oracle):
    """ES rescore: engine == a naive combine of the BM25 oracle's primary
    top-window with the phrase oracle's scores, for every score_mode —
    bit-identical floats (same kernels, same combine arithmetic)."""
    eng = QueryEngine(pos_index)
    cases = [
        ("hot term merge", "hot term", "total", 0),
        ("hot term merge", "term hot", "total", 2),
        ("parse json buffer", "parse json", "multiply", 0),
        ("parse json buffer", "parse json", "max", 0),
        ("parse json buffer", "parse json", "avg", 0),
        ("parse json buffer", "parse json", "min", 0),
    ]
    n_reordered = 0
    try:
        for text, rtext, sm, slop in cases:
            got = eng.rescore(
                text, rtext, k=10, window=30, query_weight=0.7,
                rescore_weight=1.3, score_mode=sm, slop=slop,
            )
            primary = phrase_oracle.search(text, k=30)
            rmap = dict(
                (d, s) for d, s in phrase_oracle.search_phrase(rtext, k=10**6, slop=slop)
            )
            want = []
            for d, s in primary:
                qs = 0.7 * s
                if d in rmap:
                    rs = 1.3 * rmap[d]
                    c = {"total": qs + rs, "multiply": qs * rs,
                         "avg": (qs + rs) / 2.0, "max": max(qs, rs),
                         "min": min(qs, rs)}[sm]
                else:
                    c = qs
                want.append((d, c))
            want.sort(key=lambda x: (-x[1], x[0]))
            assert got == want[:10], (text, rtext, sm)
            if [d for d, _ in got] != [d for d, _ in phrase_oracle.search(text, k=10)]:
                n_reordered += 1
    finally:
        eng.close()
    assert n_reordered >= 1  # the rescore really changes an ordering


def test_rescore_bad_score_mode(pos_index):
    eng = QueryEngine(pos_index)
    try:
        with pytest.raises(ValueError, match="score_mode"):
            eng.rescore("hot term", "hot term", score_mode="bogus")
    finally:
        eng.close()


def test_phrase_prefix_identity(pos_index, phrase_oracle):
    """match_phrase_prefix: engine == full-vocab-expansion oracle (best
    completing expansion's phrase score), at slop 0 and 1; capped expansion
    behaves; prefix-only (single-token) works."""
    eng = QueryEngine(pos_index)
    cases = [("hot ter", 0), ("parse js", 0), ("hot ter", 1), ("par", 0),
             ("merge so", 0), ("zzz qqq", 0)]
    n_nonempty = 0
    try:
        for text, slop in cases:
            got = eng.search_phrase_prefix(text, k=10, slop=slop)
            want = phrase_oracle.search_phrase_prefix(text, k=10, slop=slop)
            assert got == [(d, s) for d, s in want], (text, slop)
            n_nonempty += bool(got)
        # tight expansion cap still matches the identically-capped oracle
        got = eng.search_phrase_prefix("hot t", k=10, max_expansions=3)
        want = phrase_oracle.search_phrase_prefix("hot t", k=10, max_expansions=3)
        assert got == [(d, s) for d, s in want]
    finally:
        eng.close()
    assert n_nonempty >= 4
