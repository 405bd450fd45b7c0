"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Ray-Data shapes (ray_guide.md "Aggregation at scale"):
  exact     content-hash in map_batches → groupby(hash) → first-per-group
  minhash   shingle→minhash per batch (vectorized) → explode (band, band_hash,
            doc_id, signature) → groupby(band, band_hash) → in-group pairs →
            distinct pairs (the signatures ride along, so verification needs no
            second join)
  simhash   64-bit signature per doc → 4×16-bit block LSH → in-group pairs with
            Hamming ≤ d
  embedding all-pairs cosine against a broadcast matrix (test scale) / banded
            by LSH bucket at scale

Token/shingle hashing uses ``pandas.util.hash_array`` (stable, vectorized,
process-independent 64-bit) — NOT Python's salted ``hash``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_MERSENNE = np.uint64((1 << 61) - 1)


def _token_hashes(text: pa.ChunkedArray | pa.Array, lower: bool = True):
    """→ (flat token hashes uint64, doc offsets int64). Vectorized."""
    s = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    if lower:
        s = pc.utf8_lower(s)
    toks = pc.split_pattern_regex(s, pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(flat.to_numpy(zero_copy_only=False))[keep]
    parent = parent[keep]
    n_docs = len(s)
    counts = np.bincount(parent, minlength=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return h.astype(np.uint64), offsets


def _shingle_hashes(tok_h: np.ndarray, offsets: np.ndarray, k: int):
    """k-token shingle hashes via a rolling polynomial combine — vectorized,
    no string joins. Docs shorter than k get a single whole-doc shingle."""
    P = np.uint64(1099511628211)
    n = len(tok_h)
    comb = tok_h.copy()
    for j in range(1, k):
        shifted = np.roll(tok_h, -j)
        comb = comb * P + shifted  # uint64 wraparound is the hash
    # valid shingle start positions: within-doc, start+k <= doc end
    doc_of = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
    valid = np.zeros(n, dtype=bool)
    if n:
        end_of_doc = offsets[doc_of + 1]
        valid = (np.arange(n) + k) <= end_of_doc
    sh = comb[valid]
    sh_doc = doc_of[valid]
    # docs with no shingle (len < k): fall back to a whole-doc hash
    have = np.zeros(len(offsets) - 1, dtype=bool)
    have[sh_doc] = True
    missing = np.flatnonzero(~have & (np.diff(offsets) > 0))
    if len(missing):
        extra = np.array(
            [tok_h[offsets[d] : offsets[d + 1]].sum() for d in missing], dtype=np.uint64
        )
        sh = np.concatenate([sh, extra])
        sh_doc = np.concatenate([sh_doc, missing])
        order = np.argsort(sh_doc, kind="stable")
        sh, sh_doc = sh[order], sh_doc[order]
    return sh, sh_doc


def _minhash_params(num_hashes: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, int(_MERSENNE), size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(
    text: pa.ChunkedArray | pa.Array, *, shingle_k: int = 5, num_hashes: int = 64, seed: int = 7
) -> np.ndarray:
    """(n_docs × num_hashes) uint64 signature matrix; docs with no tokens get
    all-max signatures (never near anything)."""
    tok_h, offsets = _token_hashes(text)
    sh, sh_doc = _shingle_hashes(tok_h, offsets, shingle_k)
    n_docs = len(offsets) - 1
    a, b = _minhash_params(num_hashes, seed)
    sig = np.full((n_docs, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    bounds = np.searchsorted(sh_doc, np.arange(n_docs))
    docs_with = np.unique(sh_doc)
    for i in range(num_hashes):
        hv = (a[i] * sh + b[i]) % _MERSENNE
        mins = np.minimum.reduceat(hv, bounds[docs_with])
        sig[docs_with, i] = mins
    return sig


class MinHashStage:
    """map_batches stage: text → (doc_id, band, band_hash, signature) rows,
    one per LSH band. Stateful (hash params) → callable class / actor pool."""

    def __init__(self, text_col="text", id_col="doc_id", shingle_k=5, num_hashes=64, bands=16, seed=7):
        assert num_hashes % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.shingle_k, self.num_hashes, self.bands, self.seed = shingle_k, num_hashes, bands, seed
        self.rows_per_band = num_hashes // bands

    def __call__(self, t: pa.Table) -> pa.Table:
        sig = minhash_signatures(
            t[self.text_col], shingle_k=self.shingle_k, num_hashes=self.num_hashes, seed=self.seed
        )
        n = len(sig)
        r = self.rows_per_band
        doc_ids = t[self.id_col].to_numpy(zero_copy_only=False)
        out_doc, out_band, out_bh, out_sig = [], [], [], []
        for bidx in range(self.bands):
            block = sig[:, bidx * r : (bidx + 1) * r]
            bh = block[:, 0].copy()
            for j in range(1, r):
                bh = bh * np.uint64(1099511628211) + block[:, j]
            out_doc.append(doc_ids)
            out_band.append(np.full(n, bidx, dtype=np.int32))
            out_bh.append(bh)
            out_sig.append(sig)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc)),
                "band": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(np.concatenate(out_bh), type=pa.uint64()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(out_sig).reshape(-1), type=pa.uint64()), self.num_hashes
                ),
            }
        )


def minhash_dedup_pairs(
    ds: ray.data.Dataset,
    *,
    text_col="text",
    id_col="doc_id",
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard >= threshold.
    Output: (doc_a, doc_b, est_jaccard) with doc_a < doc_b, distinct."""
    exploded = ds.map_batches(
        MinHashStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, shingle_k=shingle_k, num_hashes=num_hashes, bands=bands
        ),
    )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One call per BAND (not per bucket): vectorized duplicate-bucket
        detection, pairwise signature compare only inside colliding buckets."""
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"), "est_jaccard": pd.Series(dtype="float64")})
        g = g.drop_duplicates(["band_hash", "doc_id"])
        dup = g[g.duplicated("band_hash", keep=False)]
        if dup.empty:
            return empty
        out_a, out_b, out_j = [], [], []
        for _, sub in dup.groupby("band_hash", sort=False):
            sub = sub.sort_values("doc_id", kind="mergesort")
            ids = sub["doc_id"].to_numpy()
            sigs = np.stack(sub["sig"].to_numpy())
            for i in range(len(ids)):
                eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
                hit = np.flatnonzero(eq >= threshold)
                for h in hit:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[i + 1 + h]))
                    out_j.append(round(float(eq[h]), 4))
        if not out_a:
            return empty
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "est_jaccard": out_j})

    cand = exploded.groupby("band").map_groups(band_pairs, batch_format="pandas")
    # a pair can surface from several bands → keep one row per pair
    # (vectorized distinct: Max over identical est_jaccard values)
    from ray.data.aggregate import Max

    return cand.groupby(["doc_a", "doc_b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


# ---------------------------------------------------------------- SimHash
def simhash_signatures(text, *, tf_weighted: bool = True) -> np.ndarray:
    """64-bit SimHash per doc from token hashes (vectorized bit-vote)."""
    tok_h, offsets = _token_hashes(text)
    n_docs = len(offsets) - 1
    if len(tok_h) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    bits = np.unpackbits(tok_h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = bits.astype(np.int32) * 2 - 1  # (n_tokens, 64) in {-1, +1}
    doc_sum = np.add.reduceat(votes, offsets[:-1].clip(max=max(len(tok_h) - 1, 0)), axis=0)
    empty = np.diff(offsets) == 0
    packed = np.packbits((doc_sum > 0).astype(np.uint8), axis=1, bitorder="little")
    out = packed.view(np.uint64).ravel()
    out[empty] = 0
    return out


def simhash_pairs(
    ds: ray.data.Dataset, *, text_col="text", id_col="doc_id", max_hamming: int = 3
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: LSH on 4×16-bit blocks (any pair within
    Hamming<=3 of 64 bits must agree exactly on >=1 block), verified by
    popcount(xor). Output (doc_a, doc_b, hamming)."""

    def stage(t: pa.Table) -> pa.Table:
        sig = simhash_signatures(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        parts = []
        for blk in range(4):
            key = (sig >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids),
                        "block": pa.array(np.full(len(ids), blk, dtype=np.int32)),
                        "key": pa.array(key, type=pa.uint64()),
                        "sig": pa.array(sig, type=pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    exploded = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

    def _popcount(x: np.ndarray) -> np.ndarray:
        if hasattr(np, "bitwise_count"):
            return np.bitwise_count(x)
        return np.array([bin(int(v)).count("1") for v in x])

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One call per 16-bit BLOCK: only colliding keys are compared."""
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")})
        g = g.drop_duplicates(["key", "doc_id"])
        dup = g[g.duplicated("key", keep=False)]
        if dup.empty:
            return empty
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        for _, sub in dup.groupby("key", sort=False):
            sub = sub.sort_values("doc_id", kind="mergesort")
            ids = sub["doc_id"].to_numpy()
            sigs = sub["sig"].to_numpy().astype(np.uint64)
            for i in range(len(ids)):
                ham = _popcount(sigs[i + 1 :] ^ sigs[i])
                hit = np.flatnonzero(ham <= max_hamming)
                for h in hit:
                    out["doc_a"].append(int(ids[i]))
                    out["doc_b"].append(int(ids[i + 1 + h]))
                    out["hamming"].append(int(ham[h]))
        if not out["doc_a"]:
            return empty
        return pd.DataFrame(out)

    cand = exploded.groupby("block").map_groups(block_pairs, batch_format="pandas")
    from ray.data.aggregate import Min

    return cand.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------- exact n-gram Jaccard
def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    text_col="text",
    id_col="doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """EXACT shingle-set Jaccard over all pairs — the verification oracle for
    the sketch-based dedups. All-pairs: test-scale only (the scale path is
    minhash candidates → this as the verify stage)."""
    rows = ds.select_columns([id_col, text_col]).to_pandas()
    text = pa.array(rows[text_col], type=pa.large_string())
    tok_h, offsets = _token_hashes(text)
    sh, sh_doc = _shingle_hashes(tok_h, offsets, shingle_k)
    sets = [
        np.unique(sh[sh_doc == d]) for d in range(len(offsets) - 1)
    ]
    ids = rows[id_col].to_numpy()
    out = {"doc_a": [], "doc_b": [], "jaccard": []}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[i], sets[j]
            if len(a) == 0 and len(b) == 0:
                continue
            inter = len(np.intersect1d(a, b, assume_unique=True))
            jac = inter / (len(a) + len(b) - inter)
            if jac >= threshold:
                out["doc_a"].append(int(min(ids[i], ids[j])))
                out["doc_b"].append(int(max(ids[i], ids[j])))
                out["jaccard"].append(round(float(jac), 4))
    return pa.table(
        {
            "doc_a": pa.array(out["doc_a"], type=pa.int64()),
            "doc_b": pa.array(out["doc_b"], type=pa.int64()),
            "jaccard": pa.array(out["jaccard"], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------- exact dedup
def exact_dedup(ds: ray.data.Dataset, *, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    """Exact dedup: md5(text) in map_batches → groupby(hash) → keep min id.
    Output (doc_id, n_dups) — shuffle key is the content hash (A14)."""
    import hashlib

    def h(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(v.encode()).hexdigest() for v in t[text_col].to_pylist()]
        bucket = (pd.util.hash_array(np.array(hs, dtype=object)) % 32).astype(np.int32)
        return pa.table(
            {"h": pa.array(hs, type=pa.string()), id_col: t[id_col], "_bucket": pa.array(bucket)}
        )

    hashed = ds.map_batches(h, batch_format="pyarrow", zero_copy_batch=True)

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        # one call per BUCKET; the per-hash min/count is one vectorized groupby
        agg = g.groupby("h", sort=False)[id_col].agg(["min", "size"]).reset_index(drop=True)
        return pd.DataFrame({"doc_id": agg["min"].astype("int64"), "n_dups": agg["size"].astype("int64")})

    return hashed.groupby("_bucket").map_groups(keep, batch_format="pandas")
