"""N-gram language-model quality scoring (the CCNet/KenLM-style perplexity
filter used to quality-rank web corpora before LLM training, rebuilt as a
bigram model with add-k smoothing — public algorithm, no external LM).

Shape: the model is FIT on a reference slice (driver-side — reference corpora
are the small side by contract, e.g. curated wiki text), broadcast once with
``ray.put`` as three sorted numpy arrays, and every corpus batch scores its
docs fully vectorized (token hashing → adjacent-pair combine → two
searchsorted probes → one reduceat mean). No shuffle; the corpus streams.

Model: p(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V) with V = reference
unigram vocabulary size. Doc score = mean over the doc's bigram occurrences
of -log2 p — lower is more reference-like. Docs with < 2 tokens have no
bigram and score NULL (emitted with n_bigrams = 0).

Token identity is hash-based (pandas.util.hash_array, same as
stages/dedup.py): equal 64-bit hashes == equal tokens at negligible collision
odds, which keeps the probe arrays 8 bytes/entry instead of strings."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import _FNV, _token_hashes


def _bigrams(tok_h: np.ndarray, offsets: np.ndarray):
    """Adjacent within-doc token pairs → (w1 hash, combined bigram hash,
    doc index per bigram). Strict: docs with <2 tokens contribute nothing."""
    n = len(tok_h)
    if n == 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e, np.empty(0, dtype=np.int64)
    doc_of = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
    idx = np.arange(n)
    valid = (idx + 2) <= offsets[doc_of + 1]  # i and i+1 in the same doc
    w1 = tok_h[valid]
    w2 = tok_h[np.flatnonzero(valid) + 1]
    comb = w1 * _FNV + w2  # uint64 wraparound, same combine as shingles
    return w1, comb, doc_of[valid]


@dataclass
class BigramLM:
    uni_keys: np.ndarray  # sorted uint64 token hashes
    uni_counts: np.ndarray  # float64
    bi_keys: np.ndarray  # sorted uint64 combined bigram hashes
    bi_counts: np.ndarray  # float64
    vocab: int
    add_k: float


def fit_bigram_lm(ref_texts: list[str], *, add_k: float = 0.5) -> BigramLM:
    """Fit on the reference texts (driver-side; the reference is the small
    side by contract)."""
    arr = pa.array(list(ref_texts), type=pa.large_string())
    tok_h, offsets = _token_hashes(arr)
    uni_keys, uni_counts = (
        np.unique(tok_h, return_counts=True)
        if len(tok_h)
        else (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    )
    _, comb, _ = _bigrams(tok_h, offsets)
    bi_keys, bi_counts = (
        np.unique(comb, return_counts=True)
        if len(comb)
        else (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    )
    return BigramLM(
        uni_keys,
        uni_counts.astype(np.float64),
        bi_keys,
        bi_counts.astype(np.float64),
        int(len(uni_keys)),
        float(add_k),
    )


def _lookup(keys: np.ndarray, counts: np.ndarray, probe: np.ndarray) -> np.ndarray:
    out = np.zeros(len(probe), dtype=np.float64)
    if len(keys) and len(probe):
        pos = np.searchsorted(keys, probe)
        inb = pos < len(keys)
        hit = np.zeros(len(probe), dtype=bool)
        hit[inb] = keys[pos[inb]] == probe[inb]
        out[hit] = counts[pos[hit]]
    return out


def lm_score(
    ds: ray.data.Dataset,
    lm: BigramLM,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-doc LM quality: (doc_id, n_bigrams, avg_neg_logprob). One streamed
    map_batches pass probing the broadcast model — no shuffle."""
    lm_ref = ray.put(lm)

    def stage(t: pa.Table) -> pa.Table:
        m: BigramLM = ray.get(lm_ref)
        n = len(t)
        ids = pc.cast(t[id_col], pa.int64())
        if n == 0:
            return pa.table(
                {
                    "doc_id": ids,
                    "n_bigrams": pa.array([], type=pa.int64()),
                    "avg_neg_logprob": pa.array([], type=pa.float64()),
                }
            )
        tok_h, offsets = _token_hashes(t[text_col])
        w1, comb, doc_of = _bigrams(tok_h, offsets)
        n_bi = (
            np.bincount(doc_of, minlength=n)
            if len(doc_of)
            else np.zeros(n, dtype=np.int64)
        )
        score = np.full(n, np.nan)
        if len(comb):
            cb = _lookup(m.bi_keys, m.bi_counts, comb)
            cu = _lookup(m.uni_keys, m.uni_counts, w1)
            p = (cb + m.add_k) / (cu + m.add_k * m.vocab)
            nlp = -np.log2(p)
            # per-doc mean in document order (doc_of is ascending)
            starts = np.searchsorted(doc_of, np.arange(n))
            has = n_bi > 0
            sums = np.add.reduceat(nlp, starts[has])
            score[has] = sums / n_bi[has]
        return pa.table(
            {
                "doc_id": ids,
                "n_bigrams": pa.array(n_bi.astype(np.int64)),
                "avg_neg_logprob": pa.array(score, type=pa.float64()),
            }
        )

    return ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
