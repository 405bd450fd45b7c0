"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup (see stages/ann.py).

Ray-Data shapes (ray_guide.md "Aggregation at scale"), all keyed to stay
bounded at 100 TB:

  exact     content-hash in map_batches → bucketed groupby(hash) → min-id
  minhash   text → signature per doc (vectorized) → band rows
            (bucket, band, band_hash, doc_id) where
            bucket = hash(band, band_hash) % B and B is data-proportional —
            a group is ONE collision bucket's worth of 20-byte rows, never a
            constant fraction of the corpus, and signatures do NOT ride the
            shuffle → colliding buckets emit candidate id pairs → signatures
            are recomputed for ONLY the candidate docs (a streamed filter
            pass over the corpus) → estimated-Jaccard verification
  simhash   64-bit signature per doc → 4×16-bit block LSH keyed by
            (block, key) hash-bucket (same bounded-group property; the 8-byte
            signature rides along) → Hamming verification in-bucket
  ngram     EXACT shingle-set Jaccard: MinHash-LSH candidates (aggressive
            banding for recall) → exact verification over ONLY candidate
            docs' shingle sets. ``ngram_jaccard_pairs_allpairs`` keeps the
            quadratic all-pairs oracle for tests.

Partitioning assumption (documented per SURVEY.md §2 "custom operators"):
the CANDIDATE PAIR set — near-duplicate collisions, i.e. the operator's
output — fits in driver memory / an object-store broadcast. The corpus-sized
inputs (texts, signatures, shingle sets) are never materialized; the corpus
is streamed twice (banding pass + candidate-fetch pass), which trades a
second read for not holding per-doc sketches in memory.

Token/shingle hashing uses ``pandas.util.hash_array`` (stable, vectorized,
process-independent 64-bit) — NOT Python's salted ``hash``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.partitioning import shuffle_fanout

_MERSENNE = np.uint64((1 << 61) - 1)
_FNV = np.uint64(1099511628211)


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
    P = _FNV
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
    """map_batches stage: text → ONE row per doc (doc_id, sig). The "state"
    (hash params) is derived from the seed in microseconds, so the pipelines
    run this as a TASK-pool function (``_minhash_stage_fn``) — an actor pool
    here pays cold-start/scale-up lag for nothing (measured at sf0.1:
    3.2 s actor pool vs 0.6 s tasks for the same stage). Band explosion
    happens in a separate cheap stage so the 512-byte signature never
    multiplies through the LSH shuffle."""

    def __init__(self, text_col="text", id_col="doc_id", shingle_k=5, num_hashes=64, seed=7):
        self.text_col, self.id_col = text_col, id_col
        self.shingle_k, self.num_hashes, self.seed = shingle_k, num_hashes, seed

    _SCHEMA_NOTE = "output: doc_id int64, sig fixed_size_list<uint64>[num_hashes]"

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "sig": pa.array([], type=pa.list_(pa.uint64(), self.num_hashes)),
                }
            )
        sig = minhash_signatures(
            t[self.text_col], shingle_k=self.shingle_k, num_hashes=self.num_hashes, seed=self.seed
        )
        return pa.table(
            {
                "doc_id": pc.cast(t[self.id_col], pa.int64()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.reshape(-1), type=pa.uint64()), self.num_hashes
                ),
            }
        )


def _minhash_stage_fn(
    t: pa.Table, *, text_col="text", id_col="doc_id", shingle_k=5, num_hashes=64, seed=7
) -> pa.Table:
    """Task-pool form of MinHashStage (see its docstring for why tasks)."""
    return MinHashStage(
        text_col=text_col, id_col=id_col, shingle_k=shingle_k,
        num_hashes=num_hashes, seed=seed,
    )(t)


def _sig_matrix(t: pa.Table, num_hashes: int) -> np.ndarray:
    col = t["sig"].combine_chunks() if isinstance(t["sig"], pa.ChunkedArray) else t["sig"]
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    return flat.reshape(-1, num_hashes)


def _band_explode(t: pa.Table, *, bands: int, num_hashes: int, num_buckets: int) -> pa.Table:
    """(doc_id, sig) → one 20-byte row per (doc, band):
    (bucket, band, band_hash, doc_id). bucket = hash(band, band_hash) % B —
    the shuffle key whose group count grows with the data, NOT a fixed
    per-band partition (the round-1 16-corpus-wide-groups defect)."""
    if len(t) == 0:
        return pa.table(
            {
                "bucket": pa.array([], type=pa.int32()),
                "band": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.uint64()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
    sig = _sig_matrix(t, num_hashes)
    r = num_hashes // bands
    n = len(sig)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
    out_doc, out_band, out_bh = [], [], []
    for bidx in range(bands):
        block = sig[:, bidx * r : (bidx + 1) * r]
        bh = block[:, 0].copy()
        for j in range(1, r):
            bh = bh * _FNV + block[:, j]
        out_doc.append(doc_ids)
        out_band.append(np.full(n, bidx, dtype=np.int32))
        out_bh.append(bh)
    band_arr = np.concatenate(out_band)
    bh_arr = np.concatenate(out_bh)
    bucket = ((bh_arr * _FNV + band_arr.astype(np.uint64)) % np.uint64(num_buckets)).astype(
        np.int32
    )
    return pa.table(
        {
            "bucket": pa.array(bucket),
            "band": pa.array(band_arr),
            "band_hash": pa.array(bh_arr, type=pa.uint64()),
            "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
        }
    )


# All-pairs inside one collision group is quadratic; a pathological corpus
# (one giant band_hash group — e.g. millions of empty-ish docs sharing a
# degenerate signature) would stall a single task for hours.  Groups beyond
# this size emit STAR pairs (min-id representative × rest) instead: linear
# volume, and connectivity within the group is preserved THROUGH the
# representative, so cluster-style dedup (connected components / keep-first)
# sees the same clusters whenever the group really is one near-dup family.
# Per-pair verification may miss a would-have-passed pair between two
# non-representative members — the standard LSH defensive trade, and it is
# logged loudly so a real corpus hitting it is visible.
_LSH_MAX_ALLPAIRS_GROUP = 2048


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """One call per hash BUCKET: emit candidate id pairs for every exact
    (band, band_hash) collision inside the bucket. Id pairs only — no
    signatures in flight."""
    empty = pd.DataFrame(
        {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
    )
    g = g.drop_duplicates(["band", "band_hash", "doc_id"])
    dup = g[g.duplicated(["band", "band_hash"], keep=False)]
    if dup.empty:
        return empty
    out_a, out_b = [], []
    for _, sub in dup.groupby(["band", "band_hash"], sort=False):
        ids = np.sort(sub["doc_id"].to_numpy())
        m = len(ids)
        if m > _LSH_MAX_ALLPAIRS_GROUP:
            import logging

            logging.getLogger(__name__).warning(
                "LSH collision group of %d docs exceeds all-pairs cap %d; "
                "emitting %d star pairs via representative doc %d instead "
                "of %d all-pairs",
                m, _LSH_MAX_ALLPAIRS_GROUP, m - 1, ids[0], m * (m - 1) // 2,
            )
            out_a.append(np.full(m - 1, ids[0], dtype=ids.dtype))
            out_b.append(ids[1:])
            continue
        # all i<j pairs of this collision group, vectorized
        ii, jj = np.triu_indices(m, k=1)
        out_a.append(ids[ii])
        out_b.append(ids[jj])
    if not out_a:
        return empty
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    ).drop_duplicates()


def _collect_blocks(ds: ray.data.Dataset, schema: pa.Schema) -> pa.Table:
    """Materialize a SMALL dataset as one typed Arrow table (empty-safe)."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.schema.names]
    if not tables:
        return schema.empty_table()
    return pa.concat_tables([t.select(schema.names).cast(schema) for t in tables])


_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def lsh_candidate_pairs(
    ds: ray.data.Dataset | None = None,
    *,
    text_col="text",
    id_col="doc_id",
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    num_buckets: int | None = None,
    seed: int = 7,
    sig_ds: ray.data.Dataset | None = None,
) -> pa.Table:
    """MinHash-LSH candidate pair generation (the scale-safe half of every
    sketch dedup): returns the DISTINCT (doc_a < doc_b) id pairs that collide
    in ≥1 band. Output is candidate-sized (see module docstring).
    ``sig_ds`` (doc_id, sig rows) skips the signature pass — the caller
    computed it once and reuses it (minhash_dedup_pairs)."""
    if num_buckets is None:
        num_buckets = shuffle_fanout(ds if ds is not None else sig_ds)
    if sig_ds is None:
        sig_ds = ds.map_batches(
            _minhash_stage_fn,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs=dict(
                text_col=text_col, id_col=id_col, shingle_k=shingle_k,
                num_hashes=num_hashes, seed=seed,
            ),
        )
    band_rows = sig_ds.map_batches(
        _band_explode,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(bands=bands, num_hashes=num_hashes, num_buckets=num_buckets),
    )
    cand = band_rows.groupby("bucket").map_groups(_bucket_pairs, batch_format="pandas")
    # a pair can collide in several bands/buckets → distinct. In-bucket rows
    # are already deduped; the cross-bucket distinct runs on the collected
    # candidate set (driver-sized by assumption) — np.unique beats a Ray
    # multi-key groupby by orders of magnitude at this cardinality.
    raw = _collect_blocks(cand, _PAIR_SCHEMA)
    if len(raw) == 0:
        return raw
    arr = np.stack(
        [raw["doc_a"].to_numpy(zero_copy_only=False), raw["doc_b"].to_numpy(zero_copy_only=False)],
        axis=1,
    )
    uniq = np.unique(arr, axis=0)
    return pa.table(
        {"doc_a": pa.array(uniq[:, 0], type=pa.int64()),
         "doc_b": pa.array(uniq[:, 1], type=pa.int64())}
    )


def _sigs_for_ids(
    sig_ds: ray.data.Dataset, pair_ids: np.ndarray, *, num_hashes: int
) -> tuple[np.ndarray, np.ndarray]:
    """→ (sorted candidate doc_ids, their signature matrix), filtered out of
    the MATERIALIZED signature dataset (broadcast id set, vectorized is_in
    per block — no corpus re-read, no re-tokenize)."""
    ids_ref = ray.put(pa.array(np.sort(pair_ids).astype(np.int64)))

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=ray.get(ids_ref)))

    small = sig_ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
    tbl = _collect_blocks(
        small,
        pa.schema([("doc_id", pa.int64()), ("sig", pa.list_(pa.uint64(), num_hashes))]),
    )
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    sig = _sig_matrix(tbl, num_hashes)
    order = np.argsort(ids)
    return ids[order], sig[order]


def minhash_dedup_pairs(
    ds: ray.data.Dataset,
    *,
    text_col="text",
    id_col="doc_id",
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    num_buckets: int | None = None,
) -> pa.Table:
    """Near-duplicate pairs with estimated Jaccard >= threshold.
    Output: (doc_a, doc_b, est_jaccard) with doc_a < doc_b, distinct.

    Two-phase shape (module docstring): bounded-group LSH candidates, then
    signature verification over only the candidate docs. The signature pass
    runs ONCE and is materialized (doc_id + 8·num_hashes bytes per doc in
    the spill-backed object store) — measured at sf0.1 this halves wall time
    vs re-reading + re-tokenizing the corpus for the verification pass, and
    at 100 TB it trades a full second corpus scan for a ~0.5% -sized
    intermediate."""
    if num_buckets is None:
        num_buckets = shuffle_fanout(ds)
    sig_ds = ds.map_batches(
        _minhash_stage_fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            text_col=text_col, id_col=id_col, shingle_k=shingle_k,
            num_hashes=num_hashes,
        ),
    ).materialize()
    pairs = lsh_candidate_pairs(
        sig_ds=sig_ds, bands=bands, num_hashes=num_hashes, num_buckets=num_buckets,
    )
    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("est_jaccard", pa.float64())]
    )
    if len(pairs) == 0:
        return out_schema.empty_table()
    a = pairs["doc_a"].to_numpy(zero_copy_only=False)
    b = pairs["doc_b"].to_numpy(zero_copy_only=False)
    cand_ids, cand_sig = _sigs_for_ids(
        sig_ds, np.unique(np.concatenate([a, b])), num_hashes=num_hashes
    )
    ai = np.searchsorted(cand_ids, a)
    bi = np.searchsorted(cand_ids, b)
    est = (cand_sig[ai] == cand_sig[bi]).mean(axis=1)
    keep = est >= threshold
    return pa.table(
        {
            "doc_a": pa.array(a[keep], type=pa.int64()),
            "doc_b": pa.array(b[keep], type=pa.int64()),
            "est_jaccard": pa.array(np.round(est[keep], 4), type=pa.float64()),
        }
    )


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
    ds: ray.data.Dataset,
    *,
    text_col="text",
    id_col="doc_id",
    max_hamming: int = 3,
    num_buckets: int | None = None,
) -> pa.Table:
    """Near-dup pairs by SimHash: LSH on 4×16-bit blocks (any pair within
    Hamming<=3 of 64 bits must agree exactly on >=1 block), verified by
    popcount(xor). Shuffle key = hash(block, key) % B with data-proportional
    B — bounded groups, unlike the round-1 4-corpus-wide-groups shape. The
    8-byte signature rides the shuffle (verification is in-bucket).
    Output (doc_a, doc_b, hamming)."""
    if num_buckets is None:
        num_buckets = shuffle_fanout(ds)

    def stage(t: pa.Table) -> pa.Table:
        sig = simhash_signatures(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        parts = []
        for blk in range(4):
            key = (sig >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
            bucket = ((key * _FNV + np.uint64(blk)) % np.uint64(num_buckets)).astype(np.int32)
            parts.append(
                pa.table(
                    {
                        "bucket": pa.array(bucket),
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

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One call per hash BUCKET: only exact (block, key) collisions are
        compared."""
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")})
        g = g.drop_duplicates(["block", "key", "doc_id"])
        dup = g[g.duplicated(["block", "key"], keep=False)]
        if dup.empty:
            return empty
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        for _, sub in dup.groupby(["block", "key"], sort=False):
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

    cand = exploded.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    # distinct (min hamming per pair) over the collected candidate set —
    # candidate-sized, and far faster than a Ray multi-key groupby here
    raw = _collect_blocks(
        cand,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]),
    ).to_pandas()
    agg = (
        raw.groupby(["doc_a", "doc_b"], sort=True)["hamming"].min().reset_index()
        if len(raw)
        else raw
    )
    return pa.Table.from_pandas(agg, preserve_index=False).cast(
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())])
    )


# ---------------------------------------------------------------- exact n-gram Jaccard
def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    text_col="text",
    id_col="doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    num_buckets: int | None = None,
) -> pa.Table:
    """EXACT shingle-set Jaccard >= threshold, distributed: MinHash-LSH
    candidate pairs with AGGRESSIVE banding (2 rows/band × 32 bands — for
    est. Jaccard j the miss probability is (1-j²)³², <2e-4 at j=0.5 and
    ~1e-9 at j=0.7), then exact verification over ONLY the candidate docs'
    shingle sets (second streamed pass; nothing corpus-sized leaves the
    cluster). The all-pairs oracle lives in ngram_jaccard_pairs_allpairs."""
    pairs = lsh_candidate_pairs(
        ds, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
        num_hashes=64, bands=32, num_buckets=num_buckets, seed=7,
    )
    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
    )
    if len(pairs) == 0:
        return out_schema.empty_table()
    a = pairs["doc_a"].to_numpy(zero_copy_only=False)
    b = pairs["doc_b"].to_numpy(zero_copy_only=False)
    cand = np.unique(np.concatenate([a, b]))
    ids_ref = ray.put(pa.array(cand.astype(np.int64)))

    def shingle_stage(t: pa.Table) -> pa.Table:
        """Candidate-doc shingle sets: (doc_id, sorted unique shingle list).
        Task pool — the only state is the broadcast id set (plasma read)."""
        ids = ray.get(ids_ref)
        t = t.filter(pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=ids))
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "shingles": pa.array([], type=pa.large_list(pa.uint64())),
                }
            )
        tok_h, offsets = _token_hashes(t[text_col])
        sh, sh_doc = _shingle_hashes(tok_h, offsets, shingle_k)
        doc_ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        lists = []
        bounds = np.searchsorted(sh_doc, np.arange(len(doc_ids) + 1))
        for d in range(len(doc_ids)):
            lists.append(np.unique(sh[bounds[d] : bounds[d + 1]]))
        offs = np.zeros(len(lists) + 1, dtype=np.int64)
        np.cumsum([len(x) for x in lists], out=offs[1:])
        flat = np.concatenate(lists) if lists else np.empty(0, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "shingles": pa.LargeListArray.from_arrays(
                    pa.array(offs), pa.array(flat, type=pa.uint64())
                ),
            }
        )

    small = ds.map_batches(shingle_stage, batch_format="pyarrow", zero_copy_batch=True)
    tbl = _collect_blocks(
        small, pa.schema([("doc_id", pa.int64()), ("shingles", pa.large_list(pa.uint64()))])
    )
    sets = {
        int(i): np.asarray(s, dtype=np.uint64)
        for i, s in zip(tbl["doc_id"].to_pylist(), tbl["shingles"].to_pylist())
    }
    out = {"doc_a": [], "doc_b": [], "jaccard": []}
    for x, y in zip(a, b):
        sa, sb = sets.get(int(x)), sets.get(int(y))
        if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= threshold:
            out["doc_a"].append(int(x))
            out["doc_b"].append(int(y))
            out["jaccard"].append(round(float(jac), 4))
    return pa.table(
        {
            "doc_a": pa.array(out["doc_a"], type=pa.int64()),
            "doc_b": pa.array(out["doc_b"], type=pa.int64()),
            "jaccard": pa.array(out["jaccard"], type=pa.float64()),
        }
    )


def ngram_jaccard_pairs_allpairs(
    ds: ray.data.Dataset,
    *,
    text_col="text",
    id_col="doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> pa.Table:
    """Quadratic all-pairs exact Jaccard — the TEST ORACLE for the
    distributed path above (and for the sketch dedups). Materializes the
    input: test scale only, by design."""
    rows = ds.select_columns([id_col, text_col]).to_pandas()
    text = pa.array(rows[text_col], type=pa.large_string())
    tok_h, offsets = _token_hashes(text)
    sh, sh_doc = _shingle_hashes(tok_h, offsets, shingle_k)
    sets = [np.unique(sh[sh_doc == d]) for d in range(len(offsets) - 1)]
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
def exact_dedup(
    ds: ray.data.Dataset, *, text_col="text", id_col="doc_id", num_buckets: int | None = None
) -> ray.data.Dataset:
    """Exact dedup: md5(text) in map_batches → groupby(hash) → keep min id.
    Output (doc_id, n_dups) — shuffle key is the content hash (A14).

    The md5 is computed per BATCH by DuckDB's vectorized md5 kernel over the
    zero-copy Arrow batch (no per-row Python loop in this hot path); the
    bucket key is DuckDB's 64-bit hash of the digest, so the groupby fan-out
    stays data-proportional."""
    if num_buckets is None:
        num_buckets = shuffle_fanout(ds)

    def h(t: pa.Table) -> pa.Table:
        import duckdb

        # DuckDB maps NULL text to md5=NULL, which would silently merge every
        # null-text row into ONE "duplicate" cluster; the contract (like the
        # pre-vectorization Python path) is to fail loudly instead (ADVICE r4)
        n_null = t[text_col].null_count
        if n_null:
            raise ValueError(
                f"exact_dedup: {n_null} null value(s) in {text_col!r} — nulls "
                "cannot be content-hashed; filter or fill them upstream"
            )
        con = getattr(h, "_con", None)
        if con is None:
            con = h._con = duckdb.connect()
        con.register("_ded_t", t)
        try:
            out = con.execute(
                f'SELECT md5("{text_col}") AS h, "{id_col}", '
                f'(hash(md5("{text_col}")) % {int(num_buckets)})::INTEGER AS _bucket '
                "FROM _ded_t"
            ).arrow()
        finally:
            con.unregister("_ded_t")
        return out.combine_chunks()

    hashed = ds.map_batches(h, batch_format="pyarrow", zero_copy_batch=True)

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        # one call per BUCKET; the per-hash min/count is one vectorized groupby
        agg = g.groupby("h", sort=False)[id_col].agg(["min", "size"]).reset_index(drop=True)
        return pd.DataFrame({"doc_id": agg["min"].astype("int64"), "n_dups": agg["size"].astype("int64")})

    return hashed.groupby("_bucket").map_groups(keep, batch_format="pandas")


# ---------------------------------------------------------------- clusters + apply
def neardup_clusters(pairs: pa.Table) -> pa.Table:
    """Near-duplicate PAIRS → connected components: (doc_id, cluster_id,
    keep) where cluster_id = the component's minimum doc id and keep marks
    the one canonical doc per cluster. Union-find with path halving on the
    driver — the pair set is candidate-sized by the module contract (the
    corpus never appears here). Deterministic: output depends only on the
    pair set."""
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("cluster_id", pa.int64()), ("keep", pa.bool_())]
    )
    if len(pairs) == 0:
        return out_schema.empty_table()
    a = pairs.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.unique(np.concatenate([a, b]))
    idx = {int(v): i for i, v in enumerate(ids)}
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for ai, bi in zip(a, b):
        ra, rb = find(idx[int(ai)]), find(idx[int(bi)])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-root union → min-id canon
    roots = np.array([find(i) for i in range(len(ids))], dtype=np.int64)
    # cluster id = min doc id in component = ids[root] (roots are min index,
    # and ids is sorted so min index == min id)
    cluster = ids[roots]
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "cluster_id": pa.array(cluster, type=pa.int64()),
            "keep": pa.array(ids == cluster),
        }
    )


def apply_dedup(
    ds: ray.data.Dataset, clusters: pa.Table, *, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Drop every non-canonical near-duplicate from the corpus: the drop set
    (cluster members with keep=False — duplicate-sized, not corpus-sized) is
    broadcast once via ray.put and filtered vectorized per batch. Docs in no
    cluster pass through untouched — the corpus streams, nothing
    materializes."""
    drop = clusters.filter(pc.equal(clusters["keep"], False))["doc_id"]
    drop_ref = ray.put(drop.combine_chunks() if isinstance(drop, pa.ChunkedArray) else drop)

    def drop_filter(t: pa.Table) -> pa.Table:
        m = pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=ray.get(drop_ref))
        return t.filter(pc.invert(m))

    return ds.map_batches(drop_filter, batch_format="pyarrow", zero_copy_batch=True)


def dedup_corpus(
    ds_factory,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    **minhash_kwargs,
) -> ray.data.Dataset:
    """End-to-end near-dedup: MinHash pairs → clusters → filtered corpus.
    ``ds_factory`` is a zero-arg callable returning a fresh Dataset over the
    corpus (it is read twice: the sketch passes and the final filter pass).
    Returns the deduplicated Dataset (streaming)."""
    pairs = minhash_dedup_pairs(
        ds_factory(), text_col=text_col, id_col=id_col, threshold=threshold, **minhash_kwargs
    )
    clusters = neardup_clusters(pairs.select(["doc_a", "doc_b"]))
    return apply_dedup(ds_factory(), clusters, id_col=id_col)


# ------------------------------------------------- repeated-passage detection
def repeated_ngram_spans(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
    min_docs: int = 2,
    num_buckets: int | None = None,
) -> pa.Table:
    """Exact repeated passages across documents: hash every ``window``-token
    span (sampled every ``stride`` tokens) and report spans whose hash occurs
    in ≥ ``min_docs`` DISTINCT docs — the strided-fingerprint approximation
    of suffix-array substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better": exact-substring matches ≥ a length
    threshold; the stride trades boundary precision for one vectorized pass,
    a documented public-knowledge substitute — no suffix array in-core).

    Scale shape: spans hash per batch with the rolling-polynomial kernel
    (one pass, no string joins); only (bucket, span_hash, doc_id, pos) 28-B
    rows ride ONE bounded-group shuffle keyed by hash(span_hash) % B with
    data-proportional B; a group is one collision bucket, never a corpus
    fraction. Output: (span_hash, doc_id, pos, n_docs) for every repeated
    span occurrence — join back to docs for excision/reporting.

    Partitioning assumption (module docstring contract): the REPEATED-span
    occurrence set is output-sized and collected; the corpus never is."""
    if num_buckets is None:
        num_buckets = shuffle_fanout(ds)

    def spans(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"bucket": pa.array([], pa.int32()), "span_hash": pa.array([], pa.uint64()),
             "doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
        )
        if len(t) == 0:
            return empty
        tok_h, offsets = _token_hashes(t[text_col])
        sh, sh_doc = _shingle_hashes(tok_h, offsets, window)
        if len(sh) == 0:
            return empty
        # _shingle_hashes emits a whole-doc fallback hash for docs shorter
        # than ``window`` (a MinHash convenience); those are not
        # window-token spans, so duplicate SHORT docs must not surface as
        # repeated spans here. Same strictness as decontam._strict_shingles.
        doc_tokens = np.diff(offsets)
        strict = doc_tokens[sh_doc] >= window
        sh, sh_doc = sh[strict], sh_doc[strict]
        if len(sh) == 0:
            return empty
        # start-token position of each shingle within its doc (shingles are
        # emitted for consecutive valid starts, so rank-in-run == position),
        # then strided sampling
        pos = np.arange(len(sh)) - np.searchsorted(sh_doc, sh_doc)
        keep = (pos % stride) == 0
        sh, sh_doc, pos = sh[keep], sh_doc[keep], pos[keep]
        ids = t[id_col].to_numpy(zero_copy_only=False)[sh_doc]
        bucket = ((sh * _FNV) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {"bucket": pa.array(bucket), "span_hash": pa.array(sh, type=pa.uint64()),
             "doc_id": pa.array(ids.astype(np.int64)), "pos": pa.array(pos.astype(np.int64))}
        )

    def bucket_repeats(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("span_hash")["doc_id"].nunique()
        hot = nd[nd >= min_docs]
        if hot.empty:
            return pd.DataFrame(
                {"span_hash": pd.Series(dtype="uint64"), "doc_id": pd.Series(dtype="int64"),
                 "pos": pd.Series(dtype="int64"), "n_docs": pd.Series(dtype="int64")}
            )
        out = g[g["span_hash"].isin(hot.index)].copy()
        out["n_docs"] = out["span_hash"].map(hot).astype("int64")
        return out[["span_hash", "doc_id", "pos", "n_docs"]].drop_duplicates()

    rows = ds.map_batches(spans, batch_format="pyarrow", zero_copy_batch=True)
    rep = rows.groupby("bucket").map_groups(bucket_repeats, batch_format="pandas")
    out = _collect_blocks(
        rep,
        pa.schema([("span_hash", pa.uint64()), ("doc_id", pa.int64()),
                   ("pos", pa.int64()), ("n_docs", pa.int64())]),
    )
    if len(out) == 0:
        return out
    idx = np.lexsort((out["pos"].to_numpy(zero_copy_only=False),
                      out["doc_id"].to_numpy(zero_copy_only=False),
                      out["span_hash"].to_numpy(zero_copy_only=False)))
    return out.take(idx)


def semdedup(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    train_sample: int = 2000,
    seed: int = 13,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means clustering the embeddings and keeping ONE representative per
    cosine epsilon-ball WITHIN each cluster.

    Output: (id_col, kept BOOL, rep_id) — ``rep_id`` is the kept member that
    suppressed the row (itself when kept). Deterministic: members are
    visited ascending-id; a member is kept iff no already-kept member of its
    cluster has cosine >= threshold (each step is one matmul against the
    kept set — the only per-row Python is this greedy loop, bounded by
    cluster size).

    Scale shape (the paper's own design): centroids train on a bounded
    driver-side sample and broadcast once; assignment is one matmul per
    streamed batch; ONE groupby(cluster) shuffle whose groups are
    data-proportional via ``n_clusters`` — pick n_clusters so a cluster's
    O(|c|·d) members fit one group task, exactly the candidate-set contract
    at the top of this module."""
    from .ann import _kmeans, _normalize

    sample = ds.limit(train_sample).to_pandas()
    sm = _normalize(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    centroids = _normalize(_kmeans(sm, n_clusters, seed=seed))
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             emb_col: t[emb_col],
                             "_cluster": pa.array([], pa.int32())})
        m = _normalize(np.stack(t[emb_col].to_numpy(zero_copy_only=False)).astype(np.float64))
        cl = (m @ ray.get(cref).T).argmax(axis=1).astype(np.int32)
        return pa.table({id_col: t[id_col], emb_col: t[emb_col],
                         "_cluster": pa.array(cl)})

    def pergroup(g: "pd.DataFrame") -> "pd.DataFrame":
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = _normalize(np.stack(g[emb_col].to_numpy()[order]).astype(np.float64))
        kept_rows: list[int] = []
        keep = np.zeros(len(ids), dtype=bool)
        rep = np.empty(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            if kept_rows:
                sims = M[kept_rows] @ M[i]
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    rep[i] = ids[kept_rows[j]]
                    continue
            keep[i] = True
            kept_rows.append(i)
            rep[i] = ids[i]
        return pd.DataFrame({id_col: ids, "kept": keep, "rep_id": rep})

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return assigned.groupby("_cluster").map_groups(pergroup, batch_format="pandas")
