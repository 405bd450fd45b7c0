"""Varbyte + delta posting-list codec (SURVEY.md §2.B3).

The reference delegated posting-list storage to Elasticsearch/Lucene; this is a
from-scratch equivalent sized for the north rule (BASELINE.json:6): docID delta
encoding + varbyte (LEB128, LSB-first) compression, blocked with per-block
metadata (first_doc, max_tf, min_dl, payload length) so a scorer can do
block-max WAND skipping without decoding payloads.

All encode/decode paths are vectorized numpy — no per-value Python loops. The
only Python-level loops are over 7-bit byte positions (≤10 iterations for
uint64) and over blocks (length/128).

Blob layout per term (all integers varbyte unless noted)::

    df                      total number of docs for this term in the blob
    repeated blocks:
        n                   docs in this block (<= BLOCK_SIZE)
        first_doc           absolute doc_id of the first doc in the block
        max_tf              max term frequency within the block
        min_dl              min doc length within the block
        payload_len         byte length of the payload that follows
        payload:
            gaps            n-1 values: doc_id deltas (strictly positive)
            tfs             n values
            dls             n values  (doc lengths inlined: scoring needs no
                            side lookup — scales to corpora where a global
                            doc_id->len map cannot be broadcast)

Invariants (tested in tests/test_codec.py, property-based):
  * decode(encode(x)) == x for any sorted strictly-increasing uint64 doc_ids
  * doc_ids strictly increasing within a blob; df == total docs
  * block metadata are true bounds (max_tf >= every tf, min_dl <= every dl)
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_U64_7 = np.uint64(7)
_U64_0x7F = np.uint64(0x7F)
# LEB128 size thresholds: value v needs 1 + #thresholds <= v bytes
_SIZE_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def varbyte_encode(values: np.ndarray, sizes: np.ndarray | None = None) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    # bytes needed per value: number of 7-bit groups (>=1)
    nb = sizes if sizes is not None else _varbyte_sizes(v)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    np.cumsum(nb[:-1], out=starts[1:])
    out = np.zeros(int(starts[-1] + nb[-1]), dtype=np.uint8)
    maxnb = int(nb.max())
    for j in range(maxnb):
        sel = nb > j
        b = ((v[sel] >> np.uint64(7 * j)) & _U64_0x7F).astype(np.uint8)
        cont = (nb[sel] - 1 > j).astype(np.uint8) << 7
        out[starts[sel] + j] = b | cont
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode → uint64 array. ``count`` is a sanity check."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    term = (b & 0x80) == 0  # terminal byte of each value
    nvals = int(term.sum())
    if count is not None and nvals != count:
        raise ValueError(f"varbyte_decode: expected {count} values, found {nvals}")
    # value index per byte
    vid = np.zeros(len(b), dtype=np.int64)
    np.cumsum(term[:-1], out=vid[1:])
    # byte position within its value
    starts = np.flatnonzero(np.concatenate(([True], term[:-1])))
    pos = np.arange(len(b), dtype=np.int64) - starts[vid]
    vals = np.zeros(nvals, dtype=np.uint64)
    contrib = (b & 0x7F).astype(np.uint64) << (pos.astype(np.uint64) * _U64_7)
    np.add.at(vals, vid, contrib)  # disjoint bit ranges per value → add == or
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing uint64 ids → first value + positive gaps."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    out = np.empty_like(ids)
    if len(ids):
        out[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(deltas, dtype=np.uint64), dtype=np.uint64)


def encode_posting(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """Encode one term's posting list (sorted, strictly-increasing doc_ids)."""
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    parts = [varbyte_encode(np.array([n], dtype=np.uint64))]
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        ids = doc_ids[s:e]
        gaps = ids[1:] - ids[:-1]
        payload = (
            varbyte_encode(gaps) + varbyte_encode(tfs[s:e]) + varbyte_encode(dls[s:e])
        )
        header = varbyte_encode(
            np.array(
                [e - s, ids[0], tfs[s:e].max(), dls[s:e].min(), len(payload)],
                dtype=np.uint64,
            )
        )
        parts.append(header)
        parts.append(payload)
    return b"".join(parts)


def _varbyte_sizes(v: np.ndarray) -> np.ndarray:
    """Bytes each value occupies under LEB128 — one binary-search pass."""
    v = np.ascontiguousarray(v, dtype=np.uint64)
    return np.searchsorted(_SIZE_THRESHOLDS, v, side="right").astype(np.int64) + 1


class _SegmentLayout:
    """Value-index layout of a segment's varbyte value stream — a pure
    function of the per-term dfs (block sizes are deterministic: BLOCK_SIZE
    chunks with a short tail). Shared by the whole-segment encoder AND the
    whole-segment decoder, so both walk the identical structure.

    Value sequence per term: [df]; per block: [n, first, max_tf, min_dl,
    payload_len, gaps(n-1), tfs(n), dls(n)].
    """

    __slots__ = (
        "n", "n_terms", "dfs", "term_starts", "term_of", "idx_in_term",
        "block_start_mask", "block_starts", "block_of", "blk_n", "blk_term",
        "gap_mask", "term_val_start", "blk_off", "gpos", "tpos", "dpos",
        "total_vals",
    )

    def __init__(self, dfs: np.ndarray):
        dfs = np.ascontiguousarray(dfs, dtype=np.int64)
        n = int(dfs.sum())
        n_terms = len(dfs)
        self.n, self.n_terms, self.dfs = n, n_terms, dfs
        term_starts = np.zeros(n_terms, dtype=np.int64)
        np.cumsum(dfs[:-1], out=term_starts[1:])
        self.term_starts = term_starts
        self.term_of = np.repeat(np.arange(n_terms, dtype=np.int64), dfs)
        self.idx_in_term = np.arange(n, dtype=np.int64) - np.repeat(term_starts, dfs)

        block_start_mask = (self.idx_in_term % BLOCK_SIZE) == 0
        block_starts = np.flatnonzero(block_start_mask)
        n_blocks = len(block_starts)
        self.block_start_mask = block_start_mask
        self.block_starts = block_starts
        self.block_of = np.cumsum(block_start_mask) - 1
        block_bounds = np.append(block_starts, n)
        blk_n = (block_bounds[1:] - block_bounds[:-1]).astype(np.int64)
        self.blk_n = blk_n
        self.blk_term = self.term_of[block_starts] if n else np.zeros(0, dtype=np.int64)
        self.gap_mask = ~block_start_mask

        blk_nvals = 5 + 3 * blk_n - 1
        term_nvals = np.ones(n_terms, dtype=np.int64)  # df
        np.add.at(term_nvals, self.blk_term, blk_nvals)
        term_val_start = np.zeros(n_terms + 1, dtype=np.int64)
        np.cumsum(term_nvals, out=term_val_start[1:])
        self.term_val_start = term_val_start
        blk_cum = np.zeros(n_blocks, dtype=np.int64)
        if n_blocks > 1:
            c = np.cumsum(blk_nvals)[:-1]
            blk_cum[1:] = c
            first_blk_of_term = np.searchsorted(self.blk_term, np.arange(n_terms))
            blk_cum -= np.repeat(
                blk_cum[first_blk_of_term], np.bincount(self.blk_term, minlength=n_terms)
            )
        self.blk_off = term_val_start[self.blk_term] + 1 + blk_cum
        self.total_vals = int(term_val_start[-1])

        pos_in_block = self.idx_in_term - np.repeat(self.idx_in_term[block_starts], blk_n)
        base = self.blk_off[self.block_of] + 5
        nb_rep = np.repeat(blk_n, blk_n)
        self.gpos = base + pos_in_block - 1                      # gaps: 0..n-2
        self.tpos = base + (nb_rep - 1) + pos_in_block           # tfs
        self.dpos = base + (nb_rep - 1) + nb_rep + pos_in_block  # dls


def encode_segment(
    term_bounds: np.ndarray, doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    """Whole-segment single-pass encoder.

    Input: posting rows sorted by (term, doc_id); ``term_bounds`` are the
    term slice boundaries (len = n_terms + 1). Produces bytes IDENTICAL to
    concatenating ``encode_posting`` per term (same value sequence, one
    ``varbyte_encode`` call), but with O(1) numpy passes instead of one call
    per term — the per-term overhead dominated segment builds.

    Returns (blob, offsets, lengths, sum_tfs) per term.
    """
    n = len(doc_ids)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return b"", z, z.copy(), np.zeros(0, dtype=np.uint64)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    dfs = (term_bounds[1:] - term_bounds[:-1]).astype(np.int64)
    L = _SegmentLayout(dfs)

    # strictly-increasing doc ids within each term (duplicate-id guard)
    within = L.idx_in_term > 0
    if within.any() and (doc_ids[within] <= doc_ids[np.flatnonzero(within) - 1]).any():
        bad = np.flatnonzero(within)[doc_ids[within] <= doc_ids[np.flatnonzero(within) - 1]][0]
        raise ValueError(
            f"duplicate/unsorted doc_id in postings of term #{L.term_of[bad]}: "
            "dedup by id (SURVEY.md §2.A14) before indexing"
        )

    blk_first = doc_ids[L.block_starts]
    blk_maxtf = np.maximum.reduceat(tfs, L.block_starts)
    blk_mindl = np.minimum.reduceat(dls, L.block_starts)

    # gaps (payload doc deltas): every posting that is NOT a block start
    gaps = np.zeros(n, dtype=np.uint64)
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]  # valid only where gap_mask

    # payload byte length per block = Σ sizes(gaps) + Σ sizes(tfs) + Σ sizes(dls)
    sz_tf = _varbyte_sizes(tfs)
    sz_dl = _varbyte_sizes(dls)
    sz_gap = np.zeros(n, dtype=np.int64)
    if L.gap_mask.any():
        sz_gap[L.gap_mask] = _varbyte_sizes(gaps[L.gap_mask])
    per_posting = sz_tf + sz_dl + sz_gap
    blk_payload_len = np.add.reduceat(per_posting, L.block_starts).astype(np.uint64)

    vals = np.empty(L.total_vals, dtype=np.uint64)
    vals[L.term_val_start[:-1]] = dfs.astype(np.uint64)
    vals[L.blk_off + 0] = L.blk_n.astype(np.uint64)
    vals[L.blk_off + 1] = blk_first
    vals[L.blk_off + 2] = blk_maxtf
    vals[L.blk_off + 3] = blk_mindl
    vals[L.blk_off + 4] = blk_payload_len
    vals[L.gpos[L.gap_mask]] = gaps[L.gap_mask]
    vals[L.tpos] = tfs
    vals[L.dpos] = dls

    sizes = _varbyte_sizes(vals)
    blob = varbyte_encode(vals, sizes=sizes)
    # per-term byte offsets/lengths from per-value sizes
    csum = np.zeros(L.total_vals + 1, dtype=np.int64)
    np.cumsum(sizes, out=csum[1:])
    offsets = csum[L.term_val_start[:-1]]
    lengths = csum[L.term_val_start[1:]] - offsets
    sum_tfs = np.add.reduceat(tfs, L.term_starts) if n else np.zeros(0, dtype=np.uint64)
    return blob, offsets, lengths, sum_tfs


def decode_segment(
    blob: bytes | np.ndarray, dfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-segment single-pass decoder — the exact inverse of
    ``encode_segment``: ONE varbyte pass over the entire blob, then pure
    index gathers driven by the dfs-derived layout. → (doc_ids, tfs, dls)
    in (term, doc_id) order, term boundaries = cumsum(dfs).

    This is what makes segment MERGE vectorized: no per-term decode calls
    (the round-1 merge looped ``merge_postings`` once per union term)."""
    L = _SegmentLayout(np.asarray(dfs, dtype=np.int64))
    if L.n == 0:
        z = np.empty(0, dtype=np.uint64)
        return z, z.copy(), z.copy()
    vals = varbyte_decode(blob, count=L.total_vals)
    if not (vals[L.term_val_start[:-1]] == L.dfs.astype(np.uint64)).all():
        raise ValueError("decode_segment: df mismatch between dictionary and blob")
    tfs = vals[L.tpos]
    dls = vals[L.dpos]
    g = np.zeros(L.n, dtype=np.uint64)
    g[L.gap_mask] = vals[L.gpos[L.gap_mask]]
    first = vals[L.blk_off + 1]  # per-block first_doc
    cs = np.cumsum(g)
    doc_ids = np.repeat(first, L.blk_n) + (cs - np.repeat(cs[L.block_starts], L.blk_n))
    return doc_ids.astype(np.uint64), tfs, dls


def _read_varbytes(
    b: np.ndarray, off: int, k: int, term_pos: np.ndarray | None = None
) -> tuple[np.ndarray, int]:
    """Read exactly k varbyte values starting at byte offset off.

    ``term_pos`` — the terminal-byte positions of the WHOLE buffer (one
    flatnonzero pass, computed once by the caller) — makes each call
    O(log n + k) instead of re-scanning every remaining byte (the header walk
    was O(n_blocks × blob_bytes) without it)."""
    if k == 0:
        return np.empty(0, dtype=np.uint64), off
    if term_pos is None:
        term_pos = off + np.flatnonzero((b[off:] & 0x80) == 0)[:k]
        i0 = 0
    else:
        i0 = int(np.searchsorted(term_pos, off))
    end = int(term_pos[i0 + k - 1]) + 1
    return varbyte_decode(b[off:end], count=k), end


class PostingBlocks:
    """Lazily-decodable view over one term's posting blob (for WAND skipping).

    ``first_docs`` / ``max_tfs`` / ``min_dls`` / block offsets are decoded
    eagerly (block headers only); payloads decode on demand per block.
    """

    __slots__ = ("df", "n", "first_docs", "max_tfs", "min_dls", "counts", "_buf", "_pay_off", "_pay_len")

    def __init__(self, blob: bytes | np.ndarray):
        b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
        self._buf = b
        # ONE terminal-byte scan for the whole blob; term_pos[v] is the last
        # byte of value v, so the blob is addressable by VALUE INDEX
        term_pos = np.flatnonzero((b & 0x80) == 0)
        (df,), _ = _read_varbytes(b, 0, 1, term_pos)
        self.df = int(df)
        # The encoder emits FULL blocks (BLOCK_SIZE docs) except the last, so
        # every block carries exactly 5 header + (3·BLOCK_SIZE − 1) payload
        # values and the header VALUE indices are closed-form — the whole
        # header table decodes in a few vectorized passes instead of the old
        # per-block Python walk (measured 1.3 s for an 18.5k-block list; the
        # walk was the block-max scorer's cold-start tax).
        nb = max(1, -(-self.df // BLOCK_SIZE))
        vpb = 5 + 3 * BLOCK_SIZE - 1  # values per full block
        hdr0 = 1 + vpb * np.arange(nb, dtype=np.int64)  # first header value idx
        hdr_idx = (hdr0[:, None] + np.arange(5)).ravel()  # all header value idx
        if nb > 1 and hdr_idx[-1] >= len(term_pos):
            # not the fixed-block layout this closed form assumes — fall back
            self._init_sequential(b, term_pos)
            return
        # gather ONLY the header values' bytes and decode them in one pass
        starts = np.where(hdr_idx > 0, term_pos[hdr_idx - 1] + 1, 0)
        ends = term_pos[hdr_idx] + 1
        widths = ends - starts
        sel = np.repeat(starts, widths) + (
            np.arange(int(widths.sum())) - np.repeat(np.cumsum(widths) - widths, widths)
        )
        hdr_vals = varbyte_decode(b[sel], count=5 * nb).reshape(nb, 5)
        counts = hdr_vals[:, 0].astype(np.int64)
        expect = np.full(nb, BLOCK_SIZE, dtype=np.int64)
        expect[-1] = self.df - BLOCK_SIZE * (nb - 1)
        if not np.array_equal(counts, expect):
            self._init_sequential(b, term_pos)  # layout drifted — be safe
            return
        self.n = nb
        self.counts = counts
        self.first_docs = hdr_vals[:, 1].copy()
        self.max_tfs = hdr_vals[:, 2].copy()
        self.min_dls = hdr_vals[:, 3].copy()
        self._pay_len = hdr_vals[:, 4].astype(np.int64)
        self._pay_off = term_pos[hdr_idx.reshape(nb, 5)[:, 4]] + 1

    def _init_sequential(self, b: np.ndarray, term_pos: np.ndarray) -> None:
        """Reference header walk (also the fallback for any non-fixed-block
        layout): one _read_varbytes per block header."""
        off = int(term_pos[0]) + 1
        counts, firsts, maxtfs, mindls, poffs, plens = [], [], [], [], [], []
        remaining = self.df
        while remaining > 0:
            hdr, off = _read_varbytes(b, off, 5, term_pos)
            n_blk = int(hdr[0])
            counts.append(n_blk)
            firsts.append(hdr[1])
            maxtfs.append(hdr[2])
            mindls.append(hdr[3])
            plens.append(int(hdr[4]))
            poffs.append(off)
            off += int(hdr[4])
            remaining -= n_blk
        self.n = len(counts)
        self.counts = np.array(counts, dtype=np.int64)
        self.first_docs = np.array(firsts, dtype=np.uint64)
        self.max_tfs = np.array(maxtfs, dtype=np.uint64)
        self.min_dls = np.array(mindls, dtype=np.uint64)
        self._pay_off = np.array(poffs, dtype=np.int64)
        self._pay_len = np.array(plens, dtype=np.int64)

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Bulk-decode every block in ONE varbyte pass (queries over large
        postings were dominated by per-block decode call overhead)."""
        return self.decode_many(np.arange(self.n, dtype=np.int64))

    def decode_many(
        self, blocks: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode an ascending SUBSET of blocks in one varbyte pass —
        (doc_ids, tfs, dls) concatenated in block order. The block-max
        scorer's per-round workhorse: a round touching 50 blocks costs one
        vectorized decode, not 50 python calls."""
        blocks = np.asarray(blocks, dtype=np.int64)
        if len(blocks) == 0 or self.n == 0:
            z = np.empty(0, dtype=np.uint64)
            return z, z.copy(), z.copy()
        n_b = self.counts[blocks]
        payload = np.concatenate(
            [
                self._buf[self._pay_off[i] : self._pay_off[i] + self._pay_len[i]]
                for i in blocks
            ]
        )
        v_b = 3 * n_b - 1  # values per block: gaps(n-1) + tfs(n) + dls(n)
        vals = varbyte_decode(payload, count=int(v_b.sum()))
        k = len(blocks)
        vs = np.zeros(k, dtype=np.int64)
        if k > 1:
            np.cumsum(v_b[:-1], out=vs[1:])
        total = int(n_b.sum())
        starts = np.zeros(k, dtype=np.int64)
        if k > 1:
            np.cumsum(n_b[:-1], out=starts[1:])
        j = np.arange(total, dtype=np.int64) - np.repeat(starts, n_b)  # pos in block
        base = np.repeat(vs, n_b)
        nb_rep = np.repeat(n_b, n_b)
        tfs = vals[base + (nb_rep - 1) + j]
        dls = vals[base + (nb_rep - 1) + nb_rep + j]
        g = np.zeros(total, dtype=np.uint64)
        nz = j > 0
        g[nz] = vals[(base + j - 1)[nz]]
        cs = np.cumsum(g)
        ids = np.repeat(self.first_docs[blocks], n_b) + (cs - np.repeat(cs[starts], n_b))
        return ids.astype(np.uint64), tfs, dls

    def decode_block(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """→ (doc_ids, tfs, dls) of block i."""
        n = int(self.counts[i])
        s = int(self._pay_off[i])
        payload = self._buf[s : s + int(self._pay_len[i])]
        vals = varbyte_decode(payload, count=3 * n - 1)
        gaps, tfs, dls = vals[: n - 1], vals[n - 1 : 2 * n - 1], vals[2 * n - 1 :]
        ids = np.empty(n, dtype=np.uint64)
        ids[0] = self.first_docs[i]
        if n > 1:
            np.cumsum(gaps, out=ids[1:])
            ids[1:] += self.first_docs[i]
        return ids, tfs, dls


def decode_posting(blob: bytes | np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode → (doc_ids, tfs, dls)."""
    return PostingBlocks(blob).decode_all()


# --------------------------------------------------------------- positions
# Positional postings live in a SIDECAR stream (positions.bin), Lucene-style:
# the main postings.bin stays byte-identical whether or not positions are
# indexed, and BM25 queries never touch position bytes. Stream layout: terms
# in dictionary order; per term, its postings in doc_id order; per posting,
# tf values — the first position absolute, the rest strictly-positive gaps —
# all varbyte. Per-term byte ranges are recorded in terms.parquet
# (pos_offset/pos_length), value counts are recoverable from the main blob's
# tfs, so the stream needs no headers of its own.


def encode_positions(
    term_bounds: np.ndarray, tfs: np.ndarray, pos_flat: np.ndarray
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Whole-segment single-pass positions encoder.

    ``term_bounds``: posting-row boundaries per term (len n_terms+1, same as
    encode_segment). ``tfs[j]`` = occurrence count of posting j; ``pos_flat``
    = concatenated strictly-increasing positions per posting, posting order.
    → (blob, per-term byte offsets, per-term byte lengths)."""
    counts = np.ascontiguousarray(tfs, dtype=np.int64)
    pos = np.ascontiguousarray(pos_flat, dtype=np.uint64)
    n_post = len(counts)
    total = int(counts.sum())
    if total != len(pos):
        raise ValueError(f"encode_positions: Σtf={total} != len(pos_flat)={len(pos)}")
    if total == 0:
        z = np.zeros(len(term_bounds) - 1, dtype=np.int64)
        return b"", z, z.copy()
    post_starts = np.zeros(n_post, dtype=np.int64)
    np.cumsum(counts[:-1], out=post_starts[1:])
    d = np.empty(total, dtype=np.uint64)
    d[0] = pos[0]
    np.subtract(pos[1:], pos[:-1], out=d[1:])
    d[post_starts] = pos[post_starts]  # absolute first position per posting
    inner = np.ones(total, dtype=bool)
    inner[post_starts] = False
    if inner.any() and (d[inner] == 0).any():
        raise ValueError("encode_positions: positions must strictly increase within a posting")
    sizes = _varbyte_sizes(d)
    blob = varbyte_encode(d, sizes=sizes)
    csum = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(sizes, out=csum[1:])
    # posting-value boundary per term boundary
    cnt_cum = np.zeros(n_post + 1, dtype=np.int64)
    np.cumsum(counts, out=cnt_cum[1:])
    tv = cnt_cum[np.asarray(term_bounds, dtype=np.int64)]
    offsets = csum[tv[:-1]]
    lengths = csum[tv[1:]] - offsets
    return blob, offsets, lengths


def decode_positions(blob: bytes | np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Inverse of ``encode_positions`` over any contiguous slice of the
    stream: ``tfs`` are the per-posting counts covered by ``blob`` (in order).
    → flat absolute positions, one segmented cumsum."""
    counts = np.ascontiguousarray(tfs, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64)
    vals = varbyte_decode(blob, count=total)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    nz = counts > 0
    cs = np.cumsum(vals)
    base = np.repeat(cs[starts[nz]] - vals[starts[nz]], counts[nz])
    return (cs - base).astype(np.uint64)


def gather_position_slices(
    blob: np.ndarray, tfs: np.ndarray, sel: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode ONLY the selected postings' positions from one term's stream.

    ``blob``: the term's positions byte slice; ``tfs``: per-posting counts for
    ALL of the term's postings (doc order); ``sel``: sorted posting indices to
    decode. One terminal-byte scan finds value boundaries; selected byte
    ranges are gathered and decoded in one varbyte pass (phrase queries touch
    candidate docs only, not a hot term's full position stream).
    → (flat positions, counts per selected posting)."""
    counts = np.ascontiguousarray(tfs, dtype=np.int64)
    sel = np.ascontiguousarray(sel, dtype=np.int64)
    sel_counts = counts[sel]
    total_sel = int(sel_counts.sum())
    if total_sel == 0:
        return np.empty(0, dtype=np.uint64), sel_counts
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    term_pos = np.flatnonzero((b & 0x80) == 0)  # last byte of each value
    cnt_cum = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=cnt_cum[1:])
    v_start, v_end = cnt_cum[sel], cnt_cum[sel + 1]
    byte_start = np.where(v_start > 0, term_pos[np.maximum(v_start, 1) - 1] + 1, 0)
    byte_end = term_pos[v_end - 1] + 1
    blen = byte_end - byte_start
    tot = int(blen.sum())
    bs = np.zeros(len(blen), dtype=np.int64)
    np.cumsum(blen[:-1], out=bs[1:])
    idx = np.repeat(byte_start - bs, blen) + np.arange(tot, dtype=np.int64)
    return decode_positions(b[idx], sel_counts), sel_counts


def merge_postings(blobs: list[bytes | np.ndarray]) -> bytes:
    """k-way merge of posting blobs for the SAME term over DISJOINT doc sets
    (segment merge, SURVEY.md §2.B5). Doc ids from different runs interleave
    (they are hashes), so merge decodes, merge-sorts and re-encodes.
    Deterministic: output depends only on the union of postings."""
    ids, tfs, dls = zip(*(decode_posting(b) for b in blobs))
    all_ids = np.concatenate(ids)
    order = np.argsort(all_ids, kind="stable")
    all_ids = all_ids[order]
    if len(all_ids) > 1 and (all_ids[1:] == all_ids[:-1]).any():
        raise ValueError("merge_postings: duplicate doc_id across segments")
    return encode_posting(all_ids, np.concatenate(tfs)[order], np.concatenate(dls)[order])
