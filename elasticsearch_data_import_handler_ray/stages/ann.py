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
    """Stateful batch scorer: normalizes the broadcast query matrix once per
    actor (__init__), one matmul per batch (__call__)."""

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
        _BruteScore,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
        fn_constructor_args=(ref, id_col, emb_col, k),
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

    class Stage(_BruteScore):
        def __init__(self):
            super().__init__(ref, id_col, emb_col, k)
            self.planes = ray.get(planes_ref)
            self.qbucket_arr = np.fromiter(ray.get(qb_ref), dtype=np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return self._EMPTY
            m = _embedding_matrix(t, self.emb_col)
            b = (m @ self.planes > 0).dot(1 << np.arange(self.planes.shape[1])).astype(int)
            keep = np.isin(b, self.qbucket_arr)
            return super().__call__(t.filter(pa.array(keep)))

    partial = ds.map_batches(Stage, batch_format="pyarrow", zero_copy_batch=True, concurrency=2)

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

    class Stage:
        def __init__(self):
            d = ray.get(ref)
            self.qids, self.qm = d["qids"], _normalize(d["matrix"])
            self.centroids, self.q_lists = d["centroids"], d["q_lists"]

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return _BruteScore._EMPTY
            m = _normalize(_embedding_matrix(t, emb_col))
            ids = t[id_col].to_numpy(zero_copy_only=False)
            lists = (m @ self.centroids.T).argmax(axis=1)
            out_q, out_n, out_c = [], [], []
            for qi, qid in enumerate(self.qids):
                probe = np.isin(lists, self.q_lists[qi])
                probe &= ids != qid
                if not probe.any():
                    continue
                cos = m[probe] @ self.qm[qi]
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

    partial = ds.map_batches(Stage, batch_format="pyarrow", zero_copy_batch=True, concurrency=2)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(
            int(k)
        )
        return g.assign(rank=np.arange(1, len(g) + 1), cos_sim=g["cos_sim"].round(4))

    return partial.groupby("query_id").map_groups(final, batch_format="pandas")


def cosine_neardup_pairs(
    ds: ray.data.Dataset, *, id_col="vec_id", emb_col="embedding", threshold: float = 0.8
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs (i<j, cos>=threshold): each batch scans
    against the broadcast full matrix (test scale; the scale path buckets by
    LSH first). Output (id_a, id_b, cos_sim)."""
    all_rows = ds.select_columns([id_col, emb_col]).to_pandas()
    ids_all = all_rows[id_col].to_numpy().astype(np.int64)
    m_all = _normalize(np.stack(all_rows[emb_col].to_numpy()).astype(np.float64))
    ref = ray.put({"ids": ids_all, "m": m_all})

    class Stage:
        def __init__(self):
            d = ray.get(ref)
            self.ids_all, self.m_all = d["ids"], d["m"]

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(t, emb_col))
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cos = m @ self.m_all.T
            out_a, out_b, out_c = [], [], []
            for i in range(len(ids)):
                mask = (cos[i] >= threshold) & (self.ids_all > ids[i])
                hit = np.flatnonzero(mask)
                out_a.extend([ids[i]] * len(hit))
                out_b.extend(self.ids_all[hit].tolist())
                out_c.extend(np.round(cos[i][hit], 4).tolist())
            return pa.table(
                {
                    "id_a": pa.array(out_a, type=pa.int64()),
                    "id_b": pa.array(out_b, type=pa.int64()),
                    "cos_sim": pa.array(out_c, type=pa.float64()),
                }
            )

    return ds.map_batches(Stage, batch_format="pyarrow", zero_copy_batch=True, concurrency=2)
