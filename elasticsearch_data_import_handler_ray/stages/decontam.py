"""Benchmark decontamination for training corpora: flag / drop documents
whose k-token shingles overlap an evaluation-set shingle inventory (the
standard n-gram decontamination used before LLM training runs).

Ray-Data shape: the benchmark side is *small relative to the corpus* (eval
suites are thousands of documents, the corpus is the 100 TB side), so its
shingle-hash set is computed once on the driver, broadcast with ``ray.put``,
and every corpus batch probes it with one vectorized ``np.isin`` — a
broadcast semi-join, no shuffle at all. The corpus streams through a single
``map_batches`` task pool. For benchmark inventories too large for one
broadcast (≳10⁸ shingles), partition BOTH sides by shingle-hash prefix and
run this stage once per partition — the corpus pass stays a streamed filter.

Tokens are whitespace-split lowercased words hashed with
``pandas.util.hash_array``; a shingle hash is the rolling polynomial combine
shared with stages/dedup.py, so equal hashes == equal k-token sequences
(64-bit; collision probability is negligible at benchmark scale). Docs
shorter than ``k`` tokens have no shingle and can never be contaminated —
unlike dedup's MinHash, there is NO whole-doc fallback here (matching the
definition used by decontamination tooling: only full k-gram overlaps
count)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import _shingle_hashes, _token_hashes


def _strict_shingles(text: pa.ChunkedArray | pa.Array, k: int):
    """(shingle hashes, doc index per shingle, tokens per doc) with NO
    whole-doc fallback for short docs."""
    tok_h, offsets = _token_hashes(text)
    n_docs = len(offsets) - 1
    doc_tokens = np.diff(offsets)
    if len(tok_h) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64), doc_tokens
    sh, sh_doc = _shingle_hashes(tok_h, offsets, k)
    # drop the whole-doc fallback shingles _shingle_hashes adds for docs
    # shorter than k (they are not k-grams)
    keep = doc_tokens[sh_doc] >= k
    return sh[keep], sh_doc[keep], doc_tokens


def benchmark_shingles(benchmark_texts: list[str], *, shingle_k: int = 8) -> np.ndarray:
    """Sorted unique shingle-hash inventory of the benchmark texts
    (driver-side: the benchmark is the small side by contract)."""
    if not benchmark_texts:
        return np.empty(0, dtype=np.uint64)
    sh, _, _ = _strict_shingles(
        pa.array(benchmark_texts, type=pa.large_string()), shingle_k
    )
    return np.unique(sh)


def contamination_flags(
    ds: ray.data.Dataset,
    benchmark_texts: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
) -> ray.data.Dataset:
    """Per-doc contamination report: (doc_id, n_shingles, n_contaminated,
    contaminated). ``n_contaminated`` counts the doc's shingle OCCURRENCES
    that appear in the benchmark inventory; ``contaminated`` = any hit."""
    bench_ref = ray.put(benchmark_shingles(benchmark_texts, shingle_k=shingle_k))

    def stage(t: pa.Table) -> pa.Table:
        n = len(t)
        empty_ids = pc.cast(t[id_col], pa.int64())
        if n == 0:
            return pa.table(
                {
                    "doc_id": empty_ids,
                    "n_shingles": pa.array([], type=pa.int64()),
                    "n_contaminated": pa.array([], type=pa.int64()),
                    "contaminated": pa.array([], type=pa.bool_()),
                }
            )
        bench = ray.get(bench_ref)
        sh, sh_doc, _ = _strict_shingles(t[text_col], shingle_k)
        n_sh = np.bincount(sh_doc, minlength=n) if len(sh) else np.zeros(n, dtype=np.int64)
        if len(sh) and len(bench):
            hit = np.zeros(len(sh), dtype=bool)
            pos = np.searchsorted(bench, sh)
            inb = pos < len(bench)
            hit[inb] = bench[pos[inb]] == sh[inb]
            n_hit = np.bincount(sh_doc[hit], minlength=n)
        else:
            n_hit = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "doc_id": empty_ids,
                "n_shingles": pa.array(n_sh.astype(np.int64)),
                "n_contaminated": pa.array(n_hit.astype(np.int64)),
                "contaminated": pa.array(n_hit > 0),
            }
        )

    return ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate(
    ds: ray.data.Dataset,
    benchmark_texts: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
) -> ray.data.Dataset:
    """The corpus with contaminated docs REMOVED — one streamed pass, no
    shuffle: each batch probes the broadcast inventory and filters itself."""
    bench_ref = ray.put(benchmark_shingles(benchmark_texts, shingle_k=shingle_k))

    def flt(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        bench = ray.get(bench_ref)
        if len(bench) == 0:
            return t
        sh, sh_doc, _ = _strict_shingles(t[text_col], shingle_k)
        bad = np.zeros(len(t), dtype=bool)
        if len(sh):
            pos = np.searchsorted(bench, sh)
            inb = pos < len(bench)
            hit = np.zeros(len(sh), dtype=bool)
            hit[inb] = bench[pos[inb]] == sh[inb]
            bad[np.unique(sh_doc[hit])] = True
        return t.filter(pa.array(~bad))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
