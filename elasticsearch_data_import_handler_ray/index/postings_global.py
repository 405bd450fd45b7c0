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
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.codec import encode_segment, merge_postings

# worker-local memo for broadcast hot-term arrays (keyed by ObjectRef hex)
_hot_cache: dict = {}


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


#: a term is "hot" when its posting list alone would fill more than this
#: fraction of one shuffle bucket's row budget — hotness is CAPACITY-relative,
#: never an absolute df. (An absolute threshold calibrated on a 60k corpus
#: marked ~10⁴ common-vocab terms hot at 2.4M docs: every batch then probed a
#: huge membership set and the per-hot-term merge round exploded.)
_HOT_CAPACITY_FRACTION = 0.125
#: sampled-count floor below which a term can never reach the driver in the
#: capacity mode — bounds the candidate collect to the sampled head
_HOT_CANDIDATE_FLOOR = 8


def estimate_hot_terms(
    postings: ray.data.Dataset,
    *,
    sample_rate: float = 0.02,
    hot_threshold: int | None = None,
    seed: int = 23,
    num_partitions: int | None = None,
    capacity_fraction: float = _HOT_CAPACITY_FRACTION,
) -> set[str]:
    """Deterministic UNIFORM sampled df estimate in one streamed pass.

    Every posting row is kept with probability ``sample_rate`` by a seeded
    hash of (term, doc_id) — unlike the round-1 ``limit()`` pre-pass, the
    sample is uniform over the whole input, so hot terms concentrated in
    late files are still seen. Sampled rows are partially counted per batch
    (Arrow group_by) and summed in a small distributed groupby.

    Two thresholding modes:
      * ``hot_threshold`` given — absolute: hot iff extrapolated df exceeds
        it (legacy semantics, used by tests that plant known-df terms);
      * ``hot_threshold=None`` (the scale default) — capacity-relative:
        hot iff the term's sampled share exceeds ``capacity_fraction`` of
        one bucket's sampled row budget (total/num_partitions). Total
        sampled rows ride the same exchange as a sentinel ``""`` row, so
        the pipeline still executes exactly once and only the sampled head
        (counts > floor) ever reaches the driver. Sampling cancels out of
        the share ratio, so doc- or row-sampled inputs both work unscaled.
    """
    from ray.data.aggregate import Sum

    denom = np.uint64(1 << 20)
    cut = np.uint64(int(sample_rate * float(denom)))
    mix = np.uint64(0x9E3779B97F4A7C15) * np.uint64(seed | 1)

    def samp(t: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], type=pa.large_string()),
                          "n": pa.array([], type=pa.int64())})
        if len(t) == 0:
            return empty
        th = pd.util.hash_array(t["term"].to_numpy(zero_copy_only=False))
        docs = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (th + docs) * mix
        keep = (h % denom) < cut
        sel = t.filter(pa.array(keep)).select(["term"])
        if len(sel) == 0:
            return empty
        agg = sel.group_by("term").aggregate([("term", "count")])
        # sentinel "" row carries the batch's total sampled rows (real terms
        # are never empty — the tokenizer drops them)
        return pa.table(
            {"term": pa.concat_arrays(
                [agg["term"].cast(pa.large_string()).combine_chunks(),
                 pa.array([""], type=pa.large_string())]),
             "n": pa.concat_arrays(
                [agg["term_count"].cast(pa.int64()).combine_chunks(),
                 pa.array([len(sel)], type=pa.int64())])}
        )

    counts = postings.map_batches(samp, batch_format="pyarrow", zero_copy_batch=True)
    # per-batch partial counts make this exchange tiny — don't let the hash
    # strategy default to 200 aggregator actors for it
    from ..functions.partitioning import cluster_cpus

    agg = counts.groupby("term", num_partitions=max(2, cluster_cpus() // 4)).aggregate(
        Sum("n", alias_name="n_sampled")
    )
    if hot_threshold is not None:
        cutoff = hot_threshold * (float(cut) / float(denom))

        def above(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater(t["n_sampled"], cutoff), pc.not_equal(t["term"], ""))
            return t.filter(m)

        hot = agg.map_batches(above, batch_format="pyarrow")
        return set(hot.select_columns(["term"]).to_pandas()["term"])

    floor = _HOT_CANDIDATE_FLOOR

    def head_only(t: pa.Table) -> pa.Table:
        m = pc.or_(pc.greater(t["n_sampled"], floor), pc.equal(t["term"], ""))
        return t.filter(m)

    cand = agg.map_batches(head_only, batch_format="pyarrow").to_pandas()
    sent = cand["term"] == ""
    total = int(cand.loc[sent, "n_sampled"].sum())
    if total == 0:
        return set()
    parts = num_partitions or max(2, cluster_cpus())
    budget = capacity_fraction * (total / parts)
    sel = cand[(~sent) & (cand["n_sampled"] > max(floor, budget))]
    return set(sel["term"])


def build_term_postings(
    postings: ray.data.Dataset,
    *,
    hot_terms: set[str] | None = None,
    hot_threshold: int | None = None,
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
        hot_terms = estimate_hot_terms(
            postings, hot_threshold=hot_threshold, num_partitions=num_partitions
        )
    # broadcast as an Arrow array: pc.is_in probes it with a C++ hash table
    # (np.isin on object strings is sort-based — ~minutes/batch at 10⁴ hot)
    hot_pa = pa.array(sorted(hot_terms), type=pa.large_string())
    hot_ref = ray.put(hot_pa)

    def salt_batch(t: pa.Table) -> pa.Table:
        # Plain TASK function, not an actor pool: Ray fuses the upstream
        # tokenize map_batches into this operator, so an actor pool here caps
        # the whole pre-shuffle pipeline at its size (a fixed concurrency=2
        # once bottlenecked a 2.4M-doc run to 2 tokenizing actors for an
        # hour; even an autoscaling pool starved behind the pre-allocated
        # hash-shuffle aggregator actors). Tasks scale freely. The broadcast
        # hot set is fetched from the LOCAL object store and memoized per
        # worker process.
        hot = _hot_cache.get(hot_ref.hex())
        if hot is None:
            hot = ray.get(hot_ref)
            _hot_cache[hot_ref.hex()] = hot
        terms = t["term"].to_numpy(zero_copy_only=False)
        docs = t["doc_id"].to_numpy(zero_copy_only=False)
        salt = np.zeros(len(t), dtype=np.int64)
        is_hot = np.zeros(len(t), dtype=bool)
        if len(hot):
            is_hot = pc.is_in(t["term"], value_set=hot).to_numpy(zero_copy_only=False)
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

    salted = postings.map_batches(salt_batch, batch_format="pyarrow", zero_copy_batch=True)

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
    # Branching a Dataset into cold/hot and re-uniting them would re-execute
    # the ENTIRE upstream pipeline once per branch (Ray Data unions do not
    # share common subplans — observed as two full read→tokenize→shuffle
    # chains in the plan, doubling the work and fragmenting the executor's
    # per-op resource budgets). Materialize the stage-1 encoded table once:
    # it is term→blob rows (far smaller than the posting exchange), spillable,
    # and the natural per-partition checkpoint for resumability.
    parts = parts.materialize()
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

    # hot terms are a handful by construction — keep this merge exchange small
    from ..functions.partitioning import cluster_cpus

    merged_hot = hot_parts.groupby(
        "term", num_partitions=max(2, cluster_cpus() // 4)
    ).map_groups(merge_group, batch_format="pyarrow")
    return cold.union(merged_hot)


def _doc_sample(ds: ray.data.Dataset, q: float, *, doc_id_col: str = "doc_id", seed: int = 29):
    """Keep each DOC w.p. ``q`` by a seeded hash of its id — runs BEFORE
    tokenize, so the df pre-pass tokenizes only the sample (df_sample is
    Binomial(df, q), the same distribution a post-tokenize row sample gives,
    at 1/q-th of the tokenize cost)."""
    denom = np.uint64(1 << 20)
    cut = np.uint64(int(q * float(denom)))
    mix = np.uint64(0x9E3779B97F4A7C15) | np.uint64(seed)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[doc_id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ids * mix
        return t.filter(pa.array((h % denom) < cut))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def term_df_salted(
    ds: ray.data.Dataset, *, analyzer: str = "whitespace", content_col: str = "text", top_n: int = 100
) -> ray.data.Dataset:
    """Global (term, df) via the salted two-stage shuffle, top-N by
    (df desc, term asc) — the DuckDB-oracle-checked entry for this path."""
    from ..functions.partitioning import shuffle_fanout

    postings = explode_postings(ds, analyzer=analyzer, content_col=content_col)
    num_partitions = shuffle_fanout(postings, explode_factor=2.0)
    # Hot-term estimate (capacity-relative — see estimate_hot_terms) from a
    # DOC-sampled pipeline: tokenizing the whole corpus twice (estimate +
    # main) was the dominant cost at 2.4M docs. Sampling cancels out of the
    # capacity ratio, so no threshold rescaling is needed. Small inputs skip
    # doc-sampling (the estimate pass is already cheap there). The hot set
    # only affects the salting plan, never the result.
    in_bytes = 0
    try:
        for f in ds.input_files():
            import os as _os

            in_bytes += _os.path.getsize(f)
    except Exception:
        pass
    if in_bytes > (256 << 20):
        est = explode_postings(_doc_sample(ds, 0.02), analyzer=analyzer, content_col=content_col)
        hot = estimate_hot_terms(est, sample_rate=1.0, num_partitions=num_partitions)
    else:
        hot = estimate_hot_terms(postings, sample_rate=1.0, num_partitions=num_partitions)
    full = build_term_postings(postings, hot_terms=hot, num_partitions=num_partitions)
    out = full.select_columns(["term", "df"])
    return out.sort(["df", "term"], descending=[True, False]).limit(top_n)
