"""Deterministic synthetic source-code corpus generator (FIXTURES.md §1).

Exact ``input_hint`` schema (BASELINE.json:15)::

    repo:string, path:string, commit:string, lang:string, content:string

Fully deterministic from (n_docs, seed): numpy rng + row index; no wall-clock,
no external data. Content tokens are drawn from a Zipfian (s≈1.1) vocabulary
of 50k code-like identifiers (plain / camelCase / snake_case / punctuation
compounds) so the code-aware analyzer's identifier splitting is exercised;
``hot_term_0..9`` are planted in ~30% of docs each to create the term-frequency
skew the north rule requires handling (BASELINE.json:6).

A sidecar ``corpus_sha256.parquet`` (doc_id, sha256) plays the role of the
"reference corpus" hashes the build must match per-row (BASELINE.json:15).

Generation is vectorized: token sampling in numpy, document assembly with
``pyarrow.compute.binary_join`` (C++), sha256 in one Python pass (required by
the invariant anyway).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

VOCAB_SIZE = 50_000
ZIPF_S = 1.1
N_HOT = 10
HOT_PROB = 0.30
LANGS = ["py", "java", "kt", "go", "js", "rs", "c"]
LANG_W = np.array([0.30, 0.15, 0.10, 0.12, 0.18, 0.08, 0.07])

_SYLL = (
    "foo bar baz qux get set load parse tok idx val node http json file read "
    "write buf str num map list hash sort merge scan calc init proc exec req "
    "resp auth user conf log net sock thread pool task queue"
).split()


def _build_vocab(rng: np.random.Generator) -> np.ndarray:
    syl = np.array(_SYLL)
    a = syl[rng.integers(0, len(syl), VOCAB_SIZE)]
    b = syl[rng.integers(0, len(syl), VOCAB_SIZE)]
    c = syl[rng.integers(0, len(syl), VOCAB_SIZE)]
    out = np.empty(VOCAB_SIZE, dtype=object)
    for i in range(VOCAB_SIZE):
        style = i % 5
        x, y, z = a[i], b[i], c[i]
        if style == 0:
            out[i] = f"{x}{y}{i % 1000}"
        elif style == 1:  # camelCase
            out[i] = f"{x}{y.capitalize()}{z.capitalize()}"
        elif style == 2:  # snake_case
            out[i] = f"{x}_{y}_{z}"
        elif style == 3:  # punctuation compound
            out[i] = f"{x}.{y}({z})"
        else:  # PascalCase with digits
            out[i] = f"{x.capitalize()}{y.capitalize()}{i % 100}"
    return out


def _zipf_probs() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_S
    return p / p.sum()


def generate_corpus(
    n_docs: int,
    out_dir: str,
    *,
    seed: int = 42,
    min_tokens: int = 50,
    max_tokens: int = 2000,
    n_files: int = 4,
) -> str:
    """Write ``corpus-{i}.parquet`` shards + ``corpus_sha256.parquet`` sidecar.

    Returns out_dir. Same (n_docs, seed, sizes, n_files) → byte-identical files.
    """
    from elasticsearch_data_import_handler_ray.functions.hashing import doc_ids_batch

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = pa.array(_build_vocab(rng), type=pa.large_string())
    probs = _zipf_probs()

    lens = rng.integers(min_tokens, max_tokens + 1, size=n_docs)
    total = int(lens.sum())
    tok_idx = rng.choice(VOCAB_SIZE, size=total, p=probs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = vocab.take(pa.array(tok_idx))
    tok_lists = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), flat)
    content = pc.binary_join(tok_lists, pa.scalar(" ", type=pa.large_string()))

    # plant hot terms: each hot_term_j appears in HOT_PROB of docs
    hot_mask = rng.random((n_docs, N_HOT)) < HOT_PROB
    suffixes = np.empty(n_docs, dtype=object)
    for d in range(n_docs):
        js = np.flatnonzero(hot_mask[d])
        suffixes[d] = (" " + " ".join(f"hot_term_{j}" for j in js)) if len(js) else ""
    content = pc.binary_join_element_wise(
        content,
        pa.array(suffixes, type=pa.large_string()),
        pa.scalar("", type=pa.large_string()),
    )

    # identity columns; every 50th row re-issues the previous path at rev 1
    idx = np.arange(n_docs)
    base = np.where((idx % 50 == 0) & (idx > 0), idx - 1, idx)
    repo = pa.array([f"org{i % 97}/proj{i % 389}" for i in base], type=pa.string())
    lang_idx = rng.choice(len(LANGS), size=n_docs, p=LANG_W / LANG_W.sum())
    lang = pa.array([LANGS[i] for i in lang_idx], type=pa.string())
    dirs = np.array(_SYLL)[base % len(_SYLL)]
    path = pa.array(
        [f"src/{d}/{_SYLL[i % len(_SYLL)]}_{i}.{LANGS[li]}" for d, i, li in zip(dirs, base, lang_idx)],
        type=pa.string(),
    )
    rev = ((idx % 50 == 0) & (idx > 0)).astype(int)
    commit = pa.array(
        [
            hashlib.sha1(f"{r}:{p}:{v}".encode()).hexdigest()
            for r, p, v in zip(repo.to_pylist(), path.to_pylist(), rev)
        ],
        type=pa.string(),
    )

    table = pa.table(
        {
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": lang,
            "content": pc.cast(content, pa.large_string()),
        }
    )

    doc_ids = doc_ids_batch(table["repo"].combine_chunks(), table["path"].combine_chunks(), table["commit"].combine_chunks())
    shas = [hashlib.sha256(v.encode()).hexdigest() for v in content.to_pylist()]
    sidecar = pa.table(
        {"doc_id": pa.array(doc_ids, type=pa.uint64()), "sha256": pa.array(shas, type=pa.string())}
    )

    per = (n_docs + n_files - 1) // n_files
    for f in range(n_files):
        shard = table.slice(f * per, per)
        if shard.num_rows:
            pq.write_table(shard, os.path.join(out_dir, f"corpus-{f:04d}.parquet"))
    pq.write_table(sidecar, os.path.join(out_dir, "corpus_sha256.parquet"))
    return out_dir


def corpus_files(out_dir: str) -> list[str]:
    return sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.startswith("corpus-") and f.endswith(".parquet")
    )
