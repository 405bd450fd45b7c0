"""Training-data curation recipe (the composed pipeline a 100 TB run uses).

One streaming pass per stage, composed lazily — quality gate → language
gate → near-dedup → per-language stats — with the only materialized object
being the candidate-pair/cluster set (duplicate-sized, by the dedup module
contract). Each stage is one of the repo's tested operators; this module is
the glue that turns them into the end-to-end corpus curation a training
pipeline runs before tokenization.

Order rationale (cost-based): the cheap vectorized quality/langid gates run
FIRST so the two sketch passes of near-dedup only stream the surviving
subset — at web scale the quality gate typically drops 30–60% of bytes
before the expensive stage touches them.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.partitioning import pool_concurrency


def curate(
    ds_factory,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.30,
    keep_langs: tuple[str, ...] | None = None,
    dedup_threshold: float = 0.8,
) -> ray.data.Dataset:
    """→ the curated corpus (doc rows that survive every gate), streaming.

    ``ds_factory``: zero-arg callable returning a fresh Dataset over the
    corpus (the dedup stage reads the filtered corpus twice — sketch pass +
    final filter — so the pipeline needs re-executable lineage, not a
    consumed iterator).
    """
    from ..stages.dedup import minhash_dedup_pairs, neardup_clusters, apply_dedup
    from ..stages.text import LangId, quality_batch

    def quality_gate(t: pa.Table) -> pa.Table:
        # stateless → task pool (an actor pool here would chain with the
        # dedup stages' actor pools and reserve every CPU on small clusters)
        q = quality_batch(t.select([id_col, text_col]))
        keep = pc.and_(
            pc.greater_equal(q["n_tokens"], pa.scalar(min_tokens)),
            pc.less_equal(q["punct_ratio"], pa.scalar(max_punct_ratio)),
        )
        return t.filter(keep)

    def lang_gate(ds: ray.data.Dataset) -> ray.data.Dataset:
        if keep_langs is None:
            return ds

        class Gate(LangId):
            def __call__(self, t: pa.Table) -> pa.Table:
                out = super().__call__(t)
                keep = pc.is_in(
                    out["predicted_lang"], value_set=pa.array(list(keep_langs))
                )
                return t.filter(keep)

        return ds.map_batches(
            Gate, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=pool_concurrency(), num_cpus=0.5,
        )

    def filtered() -> ray.data.Dataset:
        ds = ds_factory().map_batches(
            quality_gate, batch_format="pyarrow", zero_copy_batch=True
        )
        return lang_gate(ds)

    pairs = minhash_dedup_pairs(
        filtered(), text_col=text_col, id_col=id_col, threshold=dedup_threshold
    )
    clusters = neardup_clusters(pairs.select(["doc_a", "doc_b"]))
    return apply_dedup(filtered(), clusters, id_col=id_col)


def curation_report(curated: ray.data.Dataset, *, lang_col: str = "lang") -> pa.Table:
    """Per-language doc/token counts of the curated corpus — the summary a
    curation run logs. One aggregate pass (tiny result)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.text import token_count_batch

    counted = curated.map_batches(
        token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    out = counted.groupby(lang_col).aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="total_tokens")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
