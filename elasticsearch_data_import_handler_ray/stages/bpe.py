"""BPE tokenizer training + application — the tokenizer-fit stage of an LLM
data pipeline, Ray-Data-first.

Sennrich, Haddow & Birch ("Neural Machine Translation of Rare Words with
Subword Units") train BPE on a WORD-FREQUENCY dictionary, not the corpus:
the only corpus-sized pass is counting distinct words. So the shape here is

  1. ``word_frequencies`` — one distributed pass: per-batch value_counts
     partials → groupby(word).sum (bounded groups: one row per distinct word
     per batch rides the shuffle, not one per token), capped to the most
     frequent ``max_words`` (the cap bounds driver memory at any corpus
     size; rare-word tails don't affect learned merges materially).
  2. ``train_bpe`` — the classic merge loop on the driver over the
     vocabulary-sized dict: repeatedly merge the most frequent adjacent
     symbol pair (ties break lexicographically for determinism).
  3. ``apply_bpe`` — distributed encode: merges broadcast once via ray.put;
     each batch encodes its DISTINCT words only (per-process LRU) and maps
     tokens back — the standard greedy merge-by-learned-priority.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

END = "</w>"


def word_frequencies(
    ds: ray.data.Dataset, *, text_col: str = "text", max_words: int = 1_000_000
) -> pa.Table:
    """(word, freq) of the ``max_words`` most frequent whitespace words,
    lowercased — the ONLY corpus-sized pass of BPE training."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pd.Series(flat.to_numpy(zero_copy_only=False)).value_counts()
        return pa.table(
            {"word": pa.array(vc.index.astype(str)), "freq": pa.array(vc.to_numpy(), type=pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
    )
    top = counts.sort(["freq", "word"], descending=[True, False]).limit(max_words)
    t = pa.concat_tables([b for b in ray.get(top.to_arrow_refs())])
    return t.select(["word", "freq"])


def train_bpe(
    word_freqs, vocab_size: int = 500, *, min_pair_freq: int = 2
) -> list[tuple[str, str]]:
    """Learn merges from a (word, freq) table/dict until the symbol
    vocabulary reaches ``vocab_size`` or no pair occurs ≥ ``min_pair_freq``.
    Deterministic: ties on pair frequency break by lexicographic pair."""
    if isinstance(word_freqs, pa.Table):
        items = list(zip(word_freqs["word"].to_pylist(), word_freqs["freq"].to_pylist()))
    else:
        items = list(word_freqs.items())
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [END], int(f)) for w, f in items if w
    ]
    vocab = {s for seq, _ in seqs for s in seq}
    merges: list[tuple[str, str]] = []
    while len(vocab) < vocab_size:
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, f in seqs:
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b), _n = best
        merged = a + b
        merges.append((a, b))
        vocab.add(merged)
        for seq, _f in seqs:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly apply the lowest-rank
    (earliest-learned) merge present — the standard inference rule."""
    seq = list(word) + [END]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def apply_bpe(
    ds: ray.data.Dataset,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """→ (doc_id, n_words, n_bpe_tokens, bpe_tokens list<string>): encode
    every doc with the learned merges. The merge table is broadcast ONCE;
    each batch encodes only its distinct words (process-local LRU), then the
    per-word token counts scatter back to docs vectorized."""
    merges_ref = ray.put(list(merges))

    def encode_batch(t: pa.Table) -> pa.Table:
        ranks = {tuple(p): i for i, p in enumerate(ray.get(merges_ref))}

        @lru_cache(maxsize=200_000)
        def enc(w: str) -> tuple[str, ...]:
            return tuple(encode_word(w, ranks))

        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        words = flat.to_numpy(zero_copy_only=False)
        keep = words != ""
        words, parent = words[keep], parent[keep]
        uniq, inv = np.unique(words, return_inverse=True)
        encoded = [enc(str(w)) for w in uniq]
        lens = np.array([len(e) for e in encoded], dtype=np.int64)
        n_docs = len(t)
        n_words = np.bincount(parent, minlength=n_docs)
        n_bpe = np.bincount(parent, weights=lens[inv].astype(np.float64), minlength=n_docs).astype(np.int64)
        doc_tokens: list[list[str]] = [[] for _ in range(n_docs)]
        for p, wi in zip(parent.tolist(), inv.tolist()):
            doc_tokens[p].extend(encoded[wi])
        return pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "n_words": pa.array(n_words, type=pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, type=pa.int64()),
                "bpe_tokens": pa.array(doc_tokens, type=pa.list_(pa.string())),
            }
        )

    return ds.map_batches(encode_batch, batch_format="pyarrow", zero_copy_batch=True)
