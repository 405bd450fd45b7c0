"""Immutable index segment files (SURVEY.md §2.B4).

A segment holds ALL terms for a disjoint subset of documents
(document-partitioned, like the reference's Elasticsearch/Lucene shards — this
is what makes top-k query fan-out/merge exact and cheap, and it makes segment
building embarrassingly parallel with NO term-keyed global shuffle; the
term-partitioned ``groupby(term)`` posting path also exists, see
postings_global.py, with salting for hot terms).

On-disk layout (``seg_<id>/``)::

    terms.parquet    term:large_string (sorted), df:uint64, sum_tf:uint64,
                     offset:int64, length:int64   — the term dictionary
    postings.bin     concatenated posting blobs (functions/codec.py format)
    meta.json        {"seg_id", "n_terms", "n_docs", "sum_dl", "n_postings",
                      "postings_bytes"}  — NO timestamps: segment bytes are a
                     pure function of their postings (merge idempotence,
                     BASELINE.json:6)

Writes are atomic: build into ``<dir>.tmp-<nonce>`` then ``os.rename``.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.codec import encode_positions, encode_segment, gather_position_slices


def _term_ranks(term_col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, pa.Array]:
    """→ (sorted-order rank per row, unique terms in sorted order).

    Dictionary-encode in Arrow C++ and rank the dictionary — avoids
    ``np.lexsort`` over a Python-object string array (per-element Python
    comparisons; the dominant cost of segment building at scale)."""
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    d = term_col.dictionary_encode()
    dict_vals = d.dictionary
    sort_idx = pc.array_sort_indices(dict_vals).to_numpy(zero_copy_only=False)
    rank_of = np.empty(len(dict_vals), dtype=np.int64)
    rank_of[sort_idx] = np.arange(len(dict_vals))
    codes = d.indices.to_numpy(zero_copy_only=False)
    return rank_of[codes], dict_vals.take(pa.array(sort_idx))


def build_segment_arrays_table(group: pa.Table) -> tuple[pa.Table, bytes, dict, bytes | None]:
    """Encode one segment from an unsorted posting-row table.

    When the table has no ``dl`` column, doc lengths are re-derived here:
    segments are DOC-partitioned, so every row of a doc is present and
    dl = Σ tf over the doc's rows (saves shipping dl through the shuffle).

    A ``pos:large_list<uint32>`` column (positional build, §2.B3) is gathered
    into the sorted posting order with one index gather and encoded into the
    positions sidecar — the main blob bytes are unchanged either way."""
    ranks, uniq = _term_ranks(group["term"])
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    tfs = group["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)
    if "dl" in group.column_names:
        dls = group["dl"].to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        _, inv = np.unique(doc_ids, return_inverse=True)
        per_doc = np.bincount(inv, weights=tfs.astype(np.float64))
        dls = per_doc[inv].astype(np.uint64)  # exact: Σtf « 2^53
    order = np.lexsort((doc_ids, ranks))  # pure-int lexsort

    pos_sorted = None
    if "pos" in group.column_names:
        arr = group["pos"].combine_chunks()
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False).astype(np.uint64)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        sel_starts, sel_lens = starts[order], lens[order]
        tot = int(sel_lens.sum())
        bs = np.zeros(len(sel_lens), dtype=np.int64)
        np.cumsum(sel_lens[:-1], out=bs[1:])
        gather = np.repeat(sel_starts - bs, sel_lens) + np.arange(tot, dtype=np.int64)
        pos_sorted = flat[gather]

    return _encode_sorted(
        np.asarray(uniq, dtype=object), ranks[order], doc_ids[order], tfs[order], dls[order],
        pos_sorted=pos_sorted,
    )


def build_segment_arrays(
    terms: np.ndarray, doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> tuple[pa.Table, bytes, dict]:
    """Encode one segment from unsorted posting rows (numpy-array entry point;
    prefer build_segment_arrays_table for the Arrow fast path)."""
    ranks, uniq = _term_ranks(pa.array(terms, type=pa.large_string()))
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    order = np.lexsort((doc_ids, ranks))
    return _encode_sorted(
        np.asarray(uniq, dtype=object),
        ranks[order],
        doc_ids[order],
        np.ascontiguousarray(tfs, dtype=np.uint64)[order],
        np.ascontiguousarray(dls, dtype=np.uint64)[order],
    )


def _encode_sorted(
    uniq_terms: np.ndarray,
    ranks_sorted: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    pos_sorted: np.ndarray | None = None,
) -> tuple[pa.Table, bytes, dict, bytes | None]:
    starts = np.flatnonzero(np.diff(ranks_sorted, prepend=-1))
    bounds = np.append(starts, len(ranks_sorted)).astype(np.int64)
    dfs = (bounds[1:] - bounds[:-1]).astype(np.uint64)
    blob, offsets, lengths, sum_tfs = encode_segment(bounds, doc_ids, tfs, dls)

    # doc stats over DISTINCT docs of this segment
    _, first_idx = np.unique(doc_ids, return_index=True)
    n_docs = len(first_idx)
    sum_dl = int(dls[first_idx].sum())

    cols = {
        "term": pa.array(uniq_terms, type=pa.large_string()),
        "df": pa.array(dfs, type=pa.uint64()),
        "sum_tf": pa.array(sum_tfs.astype(np.uint64), type=pa.uint64()),
        "offset": pa.array(offsets, type=pa.int64()),
        "length": pa.array(lengths, type=pa.int64()),
    }
    meta = {
        "n_terms": int(len(uniq_terms)),
        "n_docs": int(n_docs),
        "sum_dl": sum_dl,
        "n_postings": int(len(ranks_sorted)),
        "postings_bytes": len(blob),
    }
    pos_blob = None
    if pos_sorted is not None:
        pos_blob, pos_off, pos_len = encode_positions(bounds, tfs, pos_sorted)
        cols["pos_offset"] = pa.array(pos_off, type=pa.int64())
        cols["pos_length"] = pa.array(pos_len, type=pa.int64())
        meta["positions_bytes"] = len(pos_blob)
    return pa.table(cols), blob, meta, pos_blob


def write_segment(
    seg_dir: str,
    seg_id: int,
    term_table: pa.Table,
    blob: bytes,
    meta: dict,
    pos_blob: bytes | None = None,
) -> dict:
    """Atomic write: tmp dir + rename. Re-running with identical inputs yields
    byte-identical files (deterministic parquet, no timestamps)."""
    meta = dict(meta, seg_id=int(seg_id))
    tmp = f"{seg_dir}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(term_table, os.path.join(tmp, "terms.parquet"))
    with open(os.path.join(tmp, "postings.bin"), "wb") as f:
        f.write(blob)
    if pos_blob is not None:
        with open(os.path.join(tmp, "positions.bin"), "wb") as f:
            f.write(pos_blob)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f, sort_keys=True)
    if os.path.exists(seg_dir):
        shutil.rmtree(tmp)
    else:
        os.rename(tmp, seg_dir)
    return meta


class SegmentReader:
    """Query-side view of one segment: term dictionary in memory (numpy sorted
    array → binary search), postings.bin memory-mapped (blobs slice lazily)."""

    def __init__(self, seg_dir: str):
        self.seg_dir = seg_dir
        t = pq.read_table(os.path.join(seg_dir, "terms.parquet"))
        self.terms = t["term"].to_numpy(zero_copy_only=False)
        self.dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.offsets = t["offset"].to_numpy(zero_copy_only=False)
        self.lengths = t["length"].to_numpy(zero_copy_only=False)
        with open(os.path.join(seg_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self._post = np.memmap(os.path.join(seg_dir, "postings.bin"), dtype=np.uint8, mode="r") \
            if self.meta["postings_bytes"] else np.empty(0, dtype=np.uint8)
        self.has_positions = "pos_offset" in t.column_names
        if self.has_positions:
            self.pos_offsets = t["pos_offset"].to_numpy(zero_copy_only=False)
            self.pos_lengths = t["pos_length"].to_numpy(zero_copy_only=False)
            self._positions = (
                np.memmap(os.path.join(seg_dir, "positions.bin"), dtype=np.uint8, mode="r")
                if self.meta.get("positions_bytes")
                else np.empty(0, dtype=np.uint8)
            )

    def lookup(self, term: str) -> int:
        """Index of term in dictionary or -1."""
        i = int(np.searchsorted(self.terms, term))
        if i < len(self.terms) and self.terms[i] == term:
            return i
        return -1

    def df(self, term: str) -> int:
        i = self.lookup(term)
        return 0 if i < 0 else int(self.dfs[i])

    def posting_blob(self, term: str) -> np.ndarray | None:
        i = self.lookup(term)
        if i < 0:
            return None
        s = int(self.offsets[i])
        return self._post[s : s + int(self.lengths[i])]

    def positions_blob(self, term: str) -> np.ndarray | None:
        """The term's slice of the positions sidecar (raw varbyte stream)."""
        if not self.has_positions:
            raise ValueError(
                f"segment {self.seg_dir} was built without positions "
                "(IndexConfig(positions=True) required for phrase queries)"
            )
        i = self.lookup(term)
        if i < 0:
            return None
        s = int(self.pos_offsets[i])
        return self._positions[s : s + int(self.pos_lengths[i])]

    def term_positions(
        self, term: str, tfs: np.ndarray, sel: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Positions of SELECTED postings only (phrase candidates): ``tfs`` is
        the term's full decoded tf array (doc order), ``sel`` the sorted
        posting indices wanted. → (flat positions, counts per selection)."""
        blob = self.positions_blob(term)
        if blob is None:
            return np.empty(0, dtype=np.uint64), np.zeros(len(sel), dtype=np.int64)
        return gather_position_slices(blob, tfs, sel)
