"""Term-partitioned posting construction — the north star's literal
``groupby(term).aggregate`` shape with salted shuffles + hot-term splitting
(BASELINE.json:6; SURVEY.md §2.B3/§2.B9).

The flagship serving index is document-partitioned (index/build.py — see its
docstring for why). This module is the complementary TERM-partitioned path,
used for global posting export and global term statistics, and it is where
Zipfian skew actually bites: a bare ``groupby("term")`` ships a hot term's
entire posting list (30% of the corpus for the planted ``hot_term_*``) to one
reducer.

Skew handling:
  1. a cheap sampled pre-pass estimates df per term (``ds.limit`` over the
     exploded postings — deterministic);
  2. terms whose estimated df exceeds ``hot_threshold`` are SALTED:
     shuffle key becomes (term, doc_id % num_salts) so the hot term's postings
     are built by ``num_salts`` parallel reducers;
  3. a second, tiny ``groupby(term)`` merges the salted sub-postings
     (functions/codec.merge_postings re-sorts by doc_id — sub-posting doc sets
     are disjoint residue classes, so the merge is safe and deterministic).

Cold terms take the 1-group fast path, so the extra round only touches the
few hot terms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.codec import encode_segment, merge_postings


def explode_postings(
    ds: ray.data.Dataset, *, analyzer: str = "code", doc_id_col: str = "doc_id", content_col: str = "text"
) -> ray.data.Dataset:
    """corpus → (doc_id, term, tf, dl) rows (the tokenize stage, reused)."""
    from .build import _tokenize_batch

    out = ds.map_batches(
        _tokenize_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(
            analyzer_name=analyzer,
            num_segments=1,
            id_cols=("repo", "path", "commit"),
            doc_id_col=doc_id_col,
            content_col=content_col,
            docmap_dir=None,
            compute_sha=False,
            emit_dl=True,  # term-partitioned rows scatter a doc across groups
        ),
    )
    return out.drop_columns(["seg"])


def estimate_hot_terms(
    postings: ray.data.Dataset,
    *,
    sample_rate: float = 0.02,
    hot_threshold: int = 5_000,
    seed: int = 23,
) -> set[str]:
    """Deterministic UNIFORM sampled df estimate in one streamed pass.

    Every posting row is kept with probability ``sample_rate`` by a seeded
    hash of (term, doc_id) — unlike the round-1 ``limit()`` pre-pass, the
    sample is uniform over the whole input, so hot terms concentrated in
    late files are still seen. Sampled rows are partially counted per batch
    (Arrow group_by) and summed in a small distributed groupby; only the
    terms whose extrapolated df exceeds the threshold — a handful — reach
    the driver. Nothing corpus-sized is collected and the upstream pipeline
    executes exactly once for the estimate."""
    from ray.data.aggregate import Sum

    denom = np.uint64(1 << 20)
    cut = np.uint64(int(sample_rate * float(denom)))
    mix = np.uint64(0x9E3779B97F4A7C15) * np.uint64(seed | 1)

    def samp(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"term": pa.array([], type=pa.large_string()),
                             "n": pa.array([], type=pa.int64())})
        th = pd.util.hash_array(t["term"].to_numpy(zero_copy_only=False))
        docs = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (th + docs) * mix
        keep = (h % denom) < cut
        sel = t.filter(pa.array(keep)).select(["term"])
        if len(sel) == 0:
            return pa.table({"term": pa.array([], type=pa.large_string()),
                             "n": pa.array([], type=pa.int64())})
        agg = sel.group_by("term").aggregate([("term", "count")])
        return pa.table(
            {"term": agg["term"].cast(pa.large_string()),
             "n": agg["term_count"].cast(pa.int64())}
        )

    counts = postings.map_batches(samp, batch_format="pyarrow", zero_copy_batch=True)
    agg = counts.groupby("term").aggregate(Sum("n", alias_name="n_sampled"))
    cutoff = hot_threshold * (float(cut) / float(denom))
    hot = agg.filter(expr=f"n_sampled > {cutoff}")
    return set(t for t in hot.select_columns(["term"]).to_pandas()["term"])


def build_term_postings(
    postings: ray.data.Dataset,
    *,
    hot_terms: set[str] | None = None,
    hot_threshold: int = 5_000,
    num_salts: int = 8,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, term, tf, dl) rows → one row per term:
    (term, df, sum_tf, posting blob).

    Stage 1 shuffles by ``bucket = hash(term ‖ salt) % num_partitions`` —
    O(num_partitions) group tasks, each encoding ALL its terms in one
    vectorized pass (codec.encode_segment), never one Python call per term.
    Hot terms get doc-residue salts so their postings build on ``num_salts``
    reducers in parallel; only those few terms take the second, tiny
    ``groupby(term)`` merge round. Cold terms are complete after stage 1."""
    if num_partitions is None:
        # tokenize explodes ~1 doc row into ~100 posting rows, but the bytes
        # grow far less (short term strings vs content) — factor 2 of the
        # source file bytes is the measured envelope
        from ..functions.partitioning import shuffle_fanout

        num_partitions = shuffle_fanout(postings, explode_factor=2.0)
    if hot_terms is None:
        hot_terms = estimate_hot_terms(postings, hot_threshold=hot_threshold)
    hot_ref = ray.put(hot_terms)

    class Salt:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            terms = t["term"].to_numpy(zero_copy_only=False)
            docs = t["doc_id"].to_numpy(zero_copy_only=False)
            salt = np.zeros(len(t), dtype=np.int64)
            is_hot = np.zeros(len(t), dtype=bool)
            if self.hot:
                is_hot = np.isin(terms, list(self.hot))
                salt[is_hot] = (docs[is_hot] % np.uint64(num_salts)).astype(np.int64)
            th = pd.util.hash_array(terms)
            bucket = ((th + np.uint64(0x9E3779B97F4A7C15) * salt.astype(np.uint64)) % np.uint64(num_partitions)).astype(np.int32)
            return pa.table(
                {
                    "bucket": pa.array(bucket),
                    "term": t["term"],
                    "doc_id": t["doc_id"],
                    "tf": t["tf"],
                    "dl": t["dl"],
                    "is_hot": pa.array(is_hot),
                }
            )

    salted = postings.map_batches(Salt, batch_format="pyarrow", zero_copy_batch=True, concurrency=2)

    def encode_bucket(g: pa.Table) -> pa.Table:
        from .segment import _term_ranks

        ranks, uniq = _term_ranks(g["term"])
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        tfs = g["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dls = g["dl"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hot = g["is_hot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ranks))
        ranks_s = ranks[order]
        starts = np.flatnonzero(np.diff(ranks_s, prepend=-1))
        bounds = np.append(starts, len(ranks_s)).astype(np.int64)
        blob, offsets, lengths, sum_tfs = encode_segment(bounds, ids[order], tfs[order], dls[order])
        buf = np.frombuffer(blob, dtype=np.uint8)
        blobs = [buf[o : o + l].tobytes() for o, l in zip(offsets, lengths)]
        term_hot = hot[order][starts]
        return pa.table(
            {
                "term": pa.array(uniq, type=pa.large_string()),
                "df": pa.array((bounds[1:] - bounds[:-1]), type=pa.int64()),
                "sum_tf": pa.array(sum_tfs.astype(np.int64), type=pa.int64()),
                "blob": pa.array(blobs, type=pa.large_binary()),
                "is_hot": pa.array(term_hot),
            }
        )

    parts = salted.groupby("bucket", num_partitions=num_partitions).map_groups(
        encode_bucket, batch_format="pyarrow"
    )
    cold = parts.filter(expr="is_hot == False").drop_columns(["is_hot"])
    hot_parts = parts.filter(expr="is_hot == True")

    def merge_group(g: pa.Table) -> pa.Table:
        blobs = [b.as_py() for b in g["blob"]]
        merged = merge_postings(blobs) if len(blobs) > 1 else blobs[0]
        return pa.table(
            {
                "term": pa.array([g["term"][0].as_py()], type=pa.large_string()),
                "df": pa.array([int(sum(g["df"].to_pylist()))], type=pa.int64()),
                "sum_tf": pa.array([int(sum(g["sum_tf"].to_pylist()))], type=pa.int64()),
                "blob": pa.array([merged], type=pa.large_binary()),
            }
        )

    merged_hot = hot_parts.groupby("term").map_groups(merge_group, batch_format="pyarrow")
    return cold.union(merged_hot)


def term_df_salted(
    ds: ray.data.Dataset, *, analyzer: str = "whitespace", content_col: str = "text", top_n: int = 100
) -> ray.data.Dataset:
    """Global (term, df) via the salted two-stage shuffle, top-N by
    (df desc, term asc) — the DuckDB-oracle-checked entry for this path."""
    postings = explode_postings(ds, analyzer=analyzer, content_col=content_col)
    full = build_term_postings(postings, hot_threshold=200)
    out = full.select_columns(["term", "df"])
    return out.sort(["df", "term"], descending=[True, False]).limit(top_n)
