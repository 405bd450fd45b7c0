"""Property-based + unit tests for the varbyte/delta posting codec
(SURVEY.md §5.2 item 1, posting-list correctness per BASELINE.json:6)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_data_import_handler_ray.functions import codec


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert (codec.varbyte_decode(codec.varbyte_encode(arr), count=len(arr)) == arr).all()


@given(
    st.lists(st.integers(min_value=0, max_value=2**63), min_size=1, max_size=400, unique=True),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_posting_roundtrip(ids, data):
    ids = np.sort(np.array(ids, dtype=np.uint64))
    n = len(ids)
    tfs = np.array(data.draw(st.lists(st.integers(1, 10_000), min_size=n, max_size=n)), dtype=np.uint64)
    dls = np.array(data.draw(st.lists(st.integers(1, 100_000), min_size=n, max_size=n)), dtype=np.uint64)
    blob = codec.encode_posting(ids, tfs, dls)
    a, b, c = codec.decode_posting(blob)
    assert (a == ids).all() and (b == tfs).all() and (c == dls).all()
    pb = codec.PostingBlocks(blob)
    assert pb.df == n
    # block invariants: true bounds, block-aligned firsts
    off = 0
    for i in range(pb.n):
        bi, bt, bd = pb.decode_block(i)
        assert (bt <= pb.max_tfs[i]).all()
        assert (bd >= pb.min_dls[i]).all()
        assert bi[0] == pb.first_docs[i]
        assert (np.diff(bi.astype(np.uint64)) > 0).all() if len(bi) > 1 else True
        off += len(bi)
    assert off == n


def test_delta_roundtrip():
    ids = np.array([5, 6, 100, 2**40, 2**63], dtype=np.uint64)
    assert (codec.delta_decode(codec.delta_encode(ids)) == ids).all()


def test_merge_postings_disjoint():
    a = codec.encode_posting(
        np.array([1, 5, 9], np.uint64), np.array([1, 2, 3], np.uint64), np.array([7, 8, 9], np.uint64)
    )
    b = codec.encode_posting(
        np.array([2, 6], np.uint64), np.array([4, 5], np.uint64), np.array([1, 2], np.uint64)
    )
    ids, tfs, dls = codec.decode_posting(codec.merge_postings([a, b]))
    assert ids.tolist() == [1, 2, 5, 6, 9]
    assert tfs.tolist() == [1, 4, 2, 5, 3]
    assert dls.tolist() == [7, 1, 8, 2, 9]
    # merge of a single blob is byte-identical (idempotence building block)
    assert codec.merge_postings([a]) == a


def test_merge_postings_duplicate_doc_raises():
    a = codec.encode_posting(np.array([1], np.uint64), np.array([1], np.uint64), np.array([1], np.uint64))
    with pytest.raises(ValueError):
        codec.merge_postings([a, a])


def test_encode_empty():
    assert codec.varbyte_encode(np.empty(0, dtype=np.uint64)) == b""
    assert len(codec.varbyte_decode(b"")) == 0


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_encode_segment_equals_per_term_encoding(data):
    """Whole-segment vectorized encoder produces byte-identical output to
    per-term encode_posting concatenation (same on-disk format)."""
    rng_terms = data.draw(st.integers(1, 12))
    parts, bounds = [], [0]
    for _ in range(rng_terms):
        ids = np.array(
            sorted(
                data.draw(
                    st.sets(st.integers(0, 2**62), min_size=1, max_size=200)
                )
            ),
            dtype=np.uint64,
        )
        n = len(ids)
        tfs = np.array(data.draw(st.lists(st.integers(1, 1000), min_size=n, max_size=n)), dtype=np.uint64)
        dls = np.array(data.draw(st.lists(st.integers(1, 10**6), min_size=n, max_size=n)), dtype=np.uint64)
        parts.append((ids, tfs, dls))
        bounds.append(bounds[-1] + n)
    ids = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    dls = np.concatenate([p[2] for p in parts])
    blob, offs, lens, stf = codec.encode_segment(np.array(bounds, dtype=np.int64), ids, tfs, dls)
    ref_parts = [codec.encode_posting(*p) for p in parts]
    assert blob == b"".join(ref_parts)
    off = 0
    for i, rp in enumerate(ref_parts):
        assert offs[i] == off and lens[i] == len(rp)
        off += len(rp)
        assert stf[i] == parts[i][1].sum()


def test_decode_segment_roundtrip_random():
    """Whole-segment decode is the exact inverse of the whole-segment encode
    (the merge path depends on this)."""
    from elasticsearch_data_import_handler_ray.functions.codec import (
        decode_segment,
        encode_segment,
    )

    rng = np.random.default_rng(9)
    n_terms = 50
    dfs = rng.integers(1, 400, size=n_terms)
    bounds = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(dfs, out=bounds[1:])
    n = int(bounds[-1])
    ids = np.empty(n, dtype=np.uint64)
    for t in range(n_terms):
        s, e = bounds[t], bounds[t + 1]
        ids[s:e] = np.sort(
            rng.choice(np.arange(1, 10_000_000, dtype=np.uint64), size=e - s, replace=False)
        )
    tfs = rng.integers(1, 1000, size=n).astype(np.uint64)
    dls = rng.integers(1, 5000, size=n).astype(np.uint64)
    blob, offsets, lengths, _ = encode_segment(bounds, ids, tfs, dls)
    got_ids, got_tfs, got_dls = decode_segment(blob, dfs)
    np.testing.assert_array_equal(got_ids, ids)
    np.testing.assert_array_equal(got_tfs, tfs)
    np.testing.assert_array_equal(got_dls, dls)
