"""Similarity search over an embedding column (list<float>).

* ``knn_bruteforce``: exact cosine top-k — the broadcast query matrix is
  ``ray.put`` ONCE and read in every task (never re-shipped per batch); each
  batch does one numpy matmul and keeps only its local top-k per query, then a
  tiny ``groupby(query_id)`` finishes the global top-k. Shuffle volume is
  O(n_queries × k × n_blocks), not O(n_rows).
* ``knn_lsh``: the scale path — random-hyperplane LSH buckets both sides;
  only matching buckets are scanned (approximate; recall grows with
  ``n_planes`` ↓ or multi-probe). Same output schema.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

def _embedding_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(t)
    return flat.reshape(len(t), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BruteScore:
    """Batch scorer: normalizes the broadcast query matrix (a zero-copy
    plasma read + a tiny normalize — cheap enough to run per task), one
    matmul per batch (__call__). The pipelines run these scorers as TASK
    pools: an actor pool here pays cold-start/scale-up lag to cache
    microseconds of setup (measured 3-5× slower end-to-end at sf0.1)."""

    def __init__(self, queries_ref, id_col: str, emb_col: str, k: int):
        q = ray.get(queries_ref)
        self.qids = q["qids"]
        self.qm = _normalize(q["matrix"])
        self.id_col, self.emb_col, self.k = id_col, emb_col, k

    _EMPTY = pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "cos_sim": pa.array([], type=pa.float64()),
        }
    )

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return self._EMPTY
        m = _normalize(_embedding_matrix(t, self.emb_col))
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        cos = m @ self.qm.T  # (batch, n_queries)
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            col = cos[:, qi]
            mask = ids != qid  # exclude self-match
            cand_ids, cand_cos = ids[mask], col[mask]
            if len(cand_ids) > self.k:
                part = np.argpartition(-cand_cos, self.k)[: self.k]
                cand_ids, cand_cos = cand_ids[part], cand_cos[part]
            out_q.append(np.full(len(cand_ids), qid, dtype=np.int64))
            out_n.append(cand_ids)
            out_c.append(cand_cos)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
                "cos_sim": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )


def knn_bruteforce(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
) -> ray.data.Dataset:
    """Exact cosine top-k. Output (query_id, neighbor_id, cos_sim, rank),
    rank 1-based by (cos desc, neighbor_id asc), cos rounded to 4 decimals."""
    ref = ray.put({"qids": np.asarray(query_ids, dtype=np.int64), "matrix": np.asarray(query_matrix, dtype=np.float64)})
    partial = ds.map_batches(
        lambda t: _BruteScore(ref, id_col, emb_col, k)(t),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(
            int(k)
        )
        g = g.assign(rank=np.arange(1, len(g) + 1), cos_sim=g["cos_sim"].round(4))
        return g

    return partial.groupby("query_id").map_groups(final, batch_format="pandas")


def knn_lsh(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 11,
) -> ray.data.Dataset:
    """Approximate top-k: scan only rows whose random-hyperplane bucket matches
    some query's bucket. Same schema as knn_bruteforce (results approximate)."""
    qm = np.asarray(query_matrix, dtype=np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((qm.shape[1], n_planes))
    qbuckets = set((np.asarray(qm) @ planes > 0).dot(1 << np.arange(n_planes)).astype(int))
    ref = ray.put({"qids": np.asarray(query_ids, dtype=np.int64), "matrix": qm})
    planes_ref = ray.put(planes)
    qb_ref = ray.put(qbuckets)

    def stage(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _BruteScore._EMPTY
        planes_ = ray.get(planes_ref)
        qbucket_arr = np.fromiter(ray.get(qb_ref), dtype=np.int64)
        m = _embedding_matrix(t, emb_col)
        b = (m @ planes_ > 0).dot(1 << np.arange(planes_.shape[1])).astype(int)
        keep = np.isin(b, qbucket_arr)
        return _BruteScore(ref, id_col, emb_col, k)(t.filter(pa.array(keep)))

    partial = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(
            int(k)
        )
        return g.assign(rank=np.arange(1, len(g) + 1), cos_sim=g["cos_sim"].round(4))

    return partial.groupby("query_id").map_groups(final, batch_format="pandas")


def _kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 13) -> np.ndarray:
    """Tiny deterministic k-means (numpy) for IVF coarse quantization."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            m = assign == c
            if m.any():
                centroids[c] = sample[m].mean(axis=0)
    return centroids


def knn_ivf(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    train_sample: int = 2000,
    seed: int = 13,
) -> ray.data.Dataset:
    """IVF (inverted-file) ANN — the scale path: k-means centroids trained on
    a driver-side sample, broadcast once; each batch assigns its rows to their
    nearest list and scores ONLY rows whose list is among each query's
    ``nprobe`` closest lists. Approximate (recall grows with nprobe); output
    schema matches knn_bruteforce. At cluster scale the assignment runs once
    at ingest and lists become the partitioning key."""
    qm = np.asarray(query_matrix, dtype=np.float64)
    sample = ds.limit(train_sample).to_pandas()
    sm = _normalize(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    centroids = _normalize(_kmeans(sm, n_lists, seed=seed))
    qn = _normalize(qm)
    q_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]  # per query
    ref = ray.put(
        {
            "qids": np.asarray(query_ids, dtype=np.int64),
            "matrix": qm,
            "centroids": centroids,
            "q_lists": q_lists,
        }
    )

    def stage(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _BruteScore._EMPTY
        d = ray.get(ref)
        qids, qm_n = d["qids"], _normalize(d["matrix"])
        return _ivf_probe_score(t, id_col, emb_col, k, qids, qm_n, d["centroids"], d["q_lists"])

    partial = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(
            int(k)
        )
        return g.assign(rank=np.arange(1, len(g) + 1), cos_sim=g["cos_sim"].round(4))

    return partial.groupby("query_id").map_groups(final, batch_format="pandas")


def _ivf_probe_score(
    t: pa.Table,
    id_col: str,
    emb_col: str,
    k: int,
    qids: np.ndarray,
    qm_n: np.ndarray,
    centroids: np.ndarray,
    q_lists: np.ndarray,
) -> pa.Table:
    """Shared IVF batch kernel: assign rows to lists, score each query only
    against rows in its probed lists, keep per-batch top-k."""
    m = _normalize(_embedding_matrix(t, emb_col))
    ids = t[id_col].to_numpy(zero_copy_only=False)
    lists = (m @ centroids.T).argmax(axis=1)
    out_q, out_n, out_c = [], [], []
    for qi, qid in enumerate(qids):
        probe = np.isin(lists, q_lists[qi])
        probe &= ids != qid
        if not probe.any():
            continue
        cos = m[probe] @ qm_n[qi]
        cand_ids = ids[probe]
        if len(cand_ids) > k:
            part = np.argpartition(-cos, k)[:k]
            cand_ids, cos = cand_ids[part], cos[part]
        out_q.append(np.full(len(cand_ids), qid, dtype=np.int64))
        out_n.append(cand_ids.astype(np.int64))
        out_c.append(cos)
    if not out_q:
        return _BruteScore._EMPTY
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
            "cos_sim": pa.array(np.concatenate(out_c), type=pa.float64()),
        }
    )


def ivf_build(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_lists: int = 16,
    train_sample: int = 2000,
    seed: int = 13,
) -> str:
    """The IVF scale path's INGEST half: assign every vector to its nearest
    k-means list ONCE and write list-partitioned parquet
    (``out_dir/list_id=<v>/``). Centroids train on a bounded driver-side
    sample and broadcast once; assignment is one matmul per batch. A search
    then reads ONLY its probed partitions (prune-at-the-read) — the knn_ivf
    docstring's "at cluster scale the assignment runs once at ingest" made
    real. Returns out_dir; centroids + metadata persist alongside the data."""
    import json
    import os

    sample = ds.limit(train_sample).to_pandas()
    sm = _normalize(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    centroids = _normalize(_kmeans(sm, n_lists, seed=seed))
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("list_id", pa.array([], type=pa.int32()))
        m = _normalize(_embedding_matrix(t, emb_col))
        lists = (m @ ray.get(cref).T).argmax(axis=1).astype(np.int32)
        return t.append_column("list_id", pa.array(lists))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["list_id"]
    )
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    with open(os.path.join(out_dir, "ivf_meta.json"), "w") as f:
        json.dump({"id_col": id_col, "emb_col": emb_col, "n_lists": int(n_lists)}, f)
    return out_dir


def ivf_search(
    index_dir: str,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 5,
    nprobe: int = 4,
) -> ray.data.Dataset:
    """The IVF scale path's QUERY half: pick each query's ``nprobe`` nearest
    lists, read ONLY those hive partitions (pyarrow partition pruning skips
    every other list's files at the storage layer), score per batch with each
    query restricted to its own probe set. Output schema == knn_bruteforce;
    results identical to ``knn_ivf`` with the same seed/sample (pinned in
    tests)."""
    import json
    import os

    with open(os.path.join(index_dir, "ivf_meta.json")) as f:
        meta = json.load(f)
    id_col, emb_col = meta["id_col"], meta["emb_col"]
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    qm = np.asarray(query_matrix, dtype=np.float64)
    qn = _normalize(qm)
    q_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    probed = sorted(int(v) for v in np.unique(q_lists))
    # prune at the read: only the probed lists' partition files are opened
    paths = [
        os.path.join(index_dir, d, f)
        for v in probed
        for d in [f"list_id={v}"]
        if os.path.isdir(os.path.join(index_dir, d))
        for f in sorted(os.listdir(os.path.join(index_dir, d)))
        if f.endswith(".parquet")
    ]
    ref = ray.put({"qids": np.asarray(query_ids, dtype=np.int64), "matrix": qm, "q_lists": q_lists})

    ds = ray.data.read_parquet(paths, columns=[id_col, emb_col])
    # partition value is encoded in the path; re-derive per file via block
    # metadata is unnecessary — each query re-checks membership by centroid
    # assignment, which is cheaper than threading the partition value through
    cref = ray.put(centroids)

    def stage(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _BruteScore._EMPTY
        d = ray.get(ref)
        return _ivf_probe_score(
            t, id_col, emb_col, k, d["qids"], _normalize(d["matrix"]), ray.get(cref), d["q_lists"]
        )

    partial = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(
            int(k)
        )
        return g.assign(rank=np.arange(1, len(g) + 1), cos_sim=g["cos_sim"].round(4))

    return partial.groupby("query_id").map_groups(final, batch_format="pandas")


_NEARDUP_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("cos_sim", pa.float64())]
)


def _collect_blocks(ds: ray.data.Dataset, schema: pa.Schema) -> pa.Table:
    """Materialize a SMALL dataset as one typed Arrow table (empty-safe)."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.schema.names]
    if not tables:
        return schema.empty_table()
    return pa.concat_tables([t.select(schema.names).cast(schema) for t in tables])


class _HyperplaneLSHStage:
    """Per batch: L random-hyperplane bucket keys per vector → one 16-byte row
    per (vector, table): (bucket, table, key, vec_id). Planes are derived from
    (seed, dim) inside the stage, so every actor draws the identical planes
    without a broadcast."""

    def __init__(self, id_col: str, emb_col: str, n_planes: int, n_tables: int, seed: int, num_buckets: int):
        self.id_col, self.emb_col = id_col, emb_col
        self.n_planes, self.n_tables, self.seed = n_planes, n_tables, seed
        self.num_buckets = num_buckets
        self.planes: np.ndarray | None = None

    def _get_planes(self, dim: int) -> np.ndarray:
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal((dim, self.n_tables * self.n_planes))
        return self.planes

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int32()),
                    "table_id": pa.array([], type=pa.int32()),
                    "key": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                }
            )
        m = _embedding_matrix(t, self.emb_col)
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        signs = (m @ self._get_planes(m.shape[1]) > 0).reshape(
            len(m), self.n_tables, self.n_planes
        )
        keys = signs.dot(1 << np.arange(self.n_planes)).astype(np.int64)  # (n, L)
        tables = np.broadcast_to(
            np.arange(self.n_tables, dtype=np.int32), keys.shape
        ).ravel()
        keys_f = keys.ravel()
        bucket = (
            (keys_f.astype(np.uint64) * np.uint64(1099511628211) + tables.astype(np.uint64))
            % np.uint64(self.num_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "table_id": pa.array(tables),
                "key": pa.array(keys_f, type=pa.int64()),
                "vec_id": pa.array(np.repeat(ids, self.n_tables), type=pa.int64()),
            }
        )


def cosine_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    id_col="vec_id",
    emb_col="embedding",
    threshold: float = 0.8,
    n_planes: int = 12,
    n_tables: int = 24,
    seed: int = 17,
    num_buckets: int | None = None,
) -> pa.Table:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos >= threshold),
    distributed: random-hyperplane LSH over L tables generates candidate
    pairs — shuffle key = hash(table, key) % B with data-proportional B, so
    no group exceeds one collision bucket — then EXACT cosine verification
    fetches embeddings for only the candidate vectors (streamed filter pass).

    Recall/volume knob: a pair at angle θ collides in one table w.p.
    p = (1-θ/π)^n_planes; miss prob across tables = (1-p)^n_tables, while the
    RANDOM-pair candidate rate is ≈ 0.5^n_planes per table. The defaults suit
    genuine near-dup thresholds (≥0.9: miss <1e-2, random rate 2e-4); for a
    loose threshold (~0.5) pass fewer planes + more tables (e.g. 6/48) and
    accept the larger candidate set. Output (id_a, id_b, cos_sim)
    exact-scored. Partitioning assumption: the candidate set fits a
    broadcast; the embedding table itself is never materialized."""
    if num_buckets is None:
        from ..functions.partitioning import shuffle_fanout

        num_buckets = shuffle_fanout(ds)
    rows = ds.map_batches(
        lambda t: _HyperplaneLSHStage(id_col, emb_col, n_planes, n_tables, seed, num_buckets)(t),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
        )
        g = g.drop_duplicates(["table_id", "key", "vec_id"])
        dup = g[g.duplicated(["table_id", "key"], keep=False)]
        if dup.empty:
            return empty
        out_a, out_b = [], []
        for _, sub in dup.groupby(["table_id", "key"], sort=False):
            ids = np.sort(sub["vec_id"].to_numpy())
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        ).drop_duplicates()

    cand = rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    # cross-bucket distinct over the collected candidate set (driver-sized by
    # assumption; np.unique beats a Ray multi-key groupby at this cardinality)
    raw = _collect_blocks(cand, pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]))
    if len(raw) == 0:
        return _NEARDUP_SCHEMA.empty_table()
    arr = np.stack(
        [raw["id_a"].to_numpy(zero_copy_only=False), raw["id_b"].to_numpy(zero_copy_only=False)],
        axis=1,
    )
    uniq = np.unique(arr, axis=0)
    a, b = uniq[:, 0], uniq[:, 1]
    cand_ids = np.unique(np.concatenate([a, b]))
    ids_ref = ray.put(pa.array(cand_ids.astype(np.int64)))

    def fetch_stage(t: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=ray.get(ids_ref))
        t = t.filter(keep)
        if len(t) == 0:
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()),
                 "emb": pa.array([], type=pa.large_list(pa.float64()))}
            )
        m = _embedding_matrix(t, emb_col)
        offs = np.arange(len(t) + 1, dtype=np.int64) * m.shape[1]
        return pa.table(
            {
                "vec_id": pc.cast(t[id_col], pa.int64()),
                "emb": pa.LargeListArray.from_arrays(
                    pa.array(offs), pa.array(m.reshape(-1), type=pa.float64())
                ),
            }
        )

    small = _collect_blocks(
        ds.map_batches(fetch_stage, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("vec_id", pa.int64()), ("emb", pa.large_list(pa.float64()))]),
    )
    got_ids = small["vec_id"].to_numpy(zero_copy_only=False)
    dim = len(small["emb"][0]) if len(small) else 1
    m = _normalize(
        small["emb"].combine_chunks().flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)
    )
    order = np.argsort(got_ids)
    got_ids, m = got_ids[order], m[order]
    ai = np.searchsorted(got_ids, a)
    bi = np.searchsorted(got_ids, b)
    cos = np.einsum("ij,ij->i", m[ai], m[bi])
    keep = cos >= threshold
    return pa.table(
        {
            "id_a": pa.array(a[keep], type=pa.int64()),
            "id_b": pa.array(b[keep], type=pa.int64()),
            "cos_sim": pa.array(np.round(cos[keep], 4), type=pa.float64()),
        }
    )


# -------------------------------------------------- product quantization (PQ)
def pq_train(
    ds: ray.data.Dataset,
    *,
    emb_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    train_sample: int = 2000,
    seed: int = 13,
) -> np.ndarray:
    """PQ codebooks (Jégou, Douze & Schmid, "Product Quantization for Nearest
    Neighbor Search"): split each L2-normalized vector into ``m`` subvectors
    and k-means each subspace on a bounded driver-side sample →
    (m, k, dim/m) float64. Unit-normalizing first makes squared-L2 a
    monotone transform of cosine (‖a−b‖² = 2−2·cosθ), so PQ ranking targets
    the same similarity the exact scorers use."""
    sample = ds.limit(train_sample).to_pandas()
    M = _normalize(np.array(sample[emb_col].to_list(), dtype=np.float64))
    dim = M.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        books[j] = _kmeans(M[:, j * dsub : (j + 1) * dsub], k, seed=seed + j)
    return books


def pq_encode(
    ds: ray.data.Dataset,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """→ (vec_id, codes uint8[m]): each vector compressed to m bytes —
    the memory story that makes billion-vector search feasible (64-dim
    float64 512 B → 8 B at m=8). Codebooks broadcast once via ray.put;
    per-batch assignment is one (n × k × dsub) vectorized argmin per
    subspace."""
    ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def enc(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "codes": pa.array([], pa.list_(pa.uint8(), len(codebooks)))}
            )
        books = ray.get(ref)
        m, k, dsub = books.shape
        M = _normalize(_embedding_matrix(t, emb_col))
        codes = np.empty((len(t), m), dtype=np.uint8)
        for j in range(m):
            sub = M[:, j * dsub : (j + 1) * dsub]
            d = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        return pa.table(
            {
                "vec_id": pc.cast(t[id_col], pa.int64()),
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), type=pa.uint8()), m
                ),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def pq_search(
    codes_ds: ray.data.Dataset,
    codebooks: np.ndarray,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 5,
) -> ray.data.Dataset:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, an (m × k)
    lookup table of subspace distances to the raw query; a batch's distance
    matrix is then ONE fancy-indexed gather + sum over codes (no float
    vectors in memory at all). Output (query_id, neighbor_id, adc_dist,
    rank) — approximate; recall pinned vs brute force in tests."""
    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, dsub = books.shape
    luts = np.empty((len(q), m, kk), dtype=np.float64)
    for j in range(m):
        qs = q[:, j * dsub : (j + 1) * dsub]
        luts[:, j, :] = ((qs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), luts))

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
             "adc_dist": pa.array([], pa.float64()), "rank": pa.array([], pa.int64())}
        )
        if len(t) == 0:
            return empty
        qids, luts = ray.get(ref)
        codes = (
            t["codes"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .reshape(len(t), -1)
        )
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        cols = np.arange(codes.shape[1])
        for qi, qid in enumerate(qids.tolist()):
            d = luts[qi][cols[None, :], codes].sum(axis=1)
            top = np.lexsort((ids, d))[: int(k)]
            parts.append(
                pd.DataFrame({"query_id": qid, "neighbor_id": ids[top], "adc_dist": d[top]})
            )
        out = pd.concat(parts, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = codes_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc_dist", "neighbor_id"], kind="mergesort").head(int(k))
        return g.assign(rank=np.arange(1, len(g) + 1), adc_dist=g["adc_dist"].round(6))

    return partial.groupby("query_id").map_groups(final, batch_format="pandas")


def pq_search_refined(
    codes_ds: ray.data.Dataset,
    emb_ds: ray.data.Dataset,
    codebooks: np.ndarray,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """The production PQ recipe (FAISS-style refine): ADC over the 8-byte
    codes produces a per-query ``shortlist``, then ONLY those vectors'
    full embeddings are fetched (broadcast id set, streamed filter — the
    candidate-fetch shape the dedup pipelines use) and re-ranked with exact
    cosine. With an ample shortlist the output equals brute force exactly
    (test-pinned) while the full-precision scan touched shortlist·|queries|
    vectors instead of the corpus."""
    import pyarrow.compute as _pc

    short = pq_search(
        codes_ds, codebooks, query_ids, query_matrix, k=shortlist
    ).to_pandas()
    cand_ids = np.unique(short["neighbor_id"].to_numpy(dtype=np.int64))
    ids_ref = ray.put(pa.array(cand_ids))

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(
            _pc.is_in(_pc.cast(t[id_col], pa.int64()), value_set=ray.get(ids_ref))
        )

    cand = emb_ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
    return knn_bruteforce(
        cand, query_ids, query_matrix, id_col=id_col, emb_col=emb_col, k=k
    )


def knn_filtered(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    filters: list[dict] | dict,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
) -> ray.data.Dataset:
    """ES kNN-with-filter: exact cosine top-k over ONLY the rows passing
    every filter clause (ES filter context — pure yes/no, applied BEFORE
    vector scoring, so the result equals brute force over the filtered
    subset, never a post-filtered full top-k that can return < k rows).

    Clauses use the engine-wide shape ({"field": f, "eq"/"in"/"gte"/"gt"/
    "lte"/"lt": v}, combinable). Scale shape: the predicate is a vectorized
    per-batch mask in the SAME streamed pass as the matmul — no extra read,
    no shuffle, no match-set materialization (unlike a broadcast id-set
    prefilter, this works at any selectivity)."""
    flts = [filters] if isinstance(filters, dict) else list(filters)

    def fil(t: pa.Table) -> pa.Table:
        keep = np.ones(len(t), dtype=bool)
        for fl in flts:
            vals = t[fl["field"]].to_numpy(zero_copy_only=False)
            if "eq" in fl:
                keep &= vals == fl["eq"]
            if "in" in fl:
                keep &= np.isin(vals, np.asarray(fl["in"]))
            if "gte" in fl:
                keep &= vals >= fl["gte"]
            if "gt" in fl:
                keep &= vals > fl["gt"]
            if "lte" in fl:
                keep &= vals <= fl["lte"]
            if "lt" in fl:
                keep &= vals < fl["lt"]
        return t.filter(pa.array(keep))

    filtered = ds.map_batches(fil, batch_format="pyarrow", zero_copy_batch=True)
    return knn_bruteforce(
        filtered, query_ids, query_matrix, id_col=id_col, emb_col=emb_col, k=k
    )
