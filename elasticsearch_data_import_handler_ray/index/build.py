"""Flagship pipeline: corpus parquet → inverted-index segments (SURVEY.md §3.2).

Ray-Data-first shape::

    read_parquet(pending files, pruned columns)
      → map_batches(tokenize+id+sha, batch_format="pyarrow", zero_copy)   # stateless tasks
      → groupby("seg")                                                    # ONE shuffle, key = doc-shard
      → map_groups(SegmentBuilder, concurrency=...)                       # stateful actor pool writes segments
      → tiny summary dataset → manifest commit (atomic)

Design notes (scale rationale, SURVEY.md §4.3):

* Segments are DOCUMENT-partitioned (``seg = doc_id % num_segments``): the one
  all-to-all shuffle is keyed by a uniform hash of doc_id, so the Zipfian term
  skew of source code never skews the shuffle — hot terms land inside every
  segment and are encoded by vectorized numpy, not shipped to one reducer. The
  term-partitioned ``groupby(term)`` path with salted hot-term splitting (the
  north star's literal shape) exists in postings_global.py for global posting
  export / term stats; queries are served from doc-partitioned segments (like
  the reference's Elasticsearch shards) because top-k fan-out/merge over
  disjoint doc sets is exact and needs no cross-shard score exchange.
* Incremental runs (§2.C): pending = input files − manifest-covered files;
  each run commits atomically; resume after a crash re-plans the same set
  difference. Segment files are immutable and content-deterministic.
* The per-row sha256 invariant (BASELINE.json:15) is computed in the same
  tokenize pass (the hash forces a per-row pass anyway) and lands in the
  docmap; ``verify_hashes`` joins docmap vs a reference sidecar WITHOUT
  re-reading corpus content.
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..functions.analysis import get_analyzer, term_frequencies, term_frequencies_positions
from ..functions.hashing import doc_ids_batch, sha256_batch
from ..state.manifest import IndexConfig, Manifest, RunLock
from .segment import build_segment_arrays_table, write_segment

POSTING_SCHEMA = pa.schema(
    [
        ("seg", pa.uint32()),
        ("doc_id", pa.uint64()),
        ("term", pa.large_string()),
        ("tf", pa.uint32()),
        ("dl", pa.uint32()),
    ]
)


def _resolve_files(corpus: str | list[str]) -> list[str]:
    if isinstance(corpus, str):
        if os.path.isdir(corpus):
            return sorted(
                os.path.join(corpus, f)
                for f in os.listdir(corpus)
                if f.endswith(".parquet") and not f.startswith("corpus_sha256")
            )
        return [corpus]
    return sorted(corpus)


def _tokenize_batch(
    batch: pa.Table,
    *,
    analyzer_name: str,
    num_segments: int,
    id_cols: tuple[str, ...],
    doc_id_col: str | None,
    content_col: str,
    docmap_dir: str | None,
    compute_sha: bool,
    emit_dl: bool = False,
    emit_positions: bool = False,
    store_cols: tuple[str, ...] = (),
) -> pa.Table:
    """One corpus batch → exploded posting rows (seg, doc_id, term, tf[, dl]).

    ``dl`` is only emitted when ``emit_dl`` (the term-partitioned path needs it
    shipped per row); the doc-partitioned segment build re-derives doc lengths
    inside the builder — every row of a doc lands in the same segment, so
    dl = Σ tf over the doc's rows there — saving 4 bytes/row of shuffle.

    Side effect: writes this batch's docmap shard (doc_id, identity cols,
    sha256, doc_len) under ``docmap_dir`` with a content-derived filename —
    Ray task retries reprocess the same blocks and overwrite the same file,
    so retries are idempotent.
    """
    analyzer = get_analyzer(analyzer_name)
    content = batch[content_col].combine_chunks()
    if doc_id_col is not None:
        doc_ids = pc.cast(batch[doc_id_col], pa.uint64()).combine_chunks().to_numpy(zero_copy_only=False)
    else:
        doc_ids = doc_ids_batch(
            batch[id_cols[0]].combine_chunks(),
            batch[id_cols[1]].combine_chunks(),
            batch[id_cols[2]].combine_chunks(),
        )
    tf_fn = term_frequencies_positions if emit_positions else term_frequencies
    postings, doclens = tf_fn(analyzer, pa.array(doc_ids, type=pa.uint64()), content)

    dl_ids = doclens["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    dl_val = doclens["doc_len"].to_numpy(zero_copy_only=False).astype(np.uint32)
    o = np.argsort(dl_ids)
    dl_ids, dl_val = dl_ids[o], dl_val[o]
    p_doc = postings["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    seg = (p_doc % np.uint64(num_segments)).astype(np.uint32)

    if docmap_dir is not None:
        row_dl = np.zeros(len(doc_ids), dtype=np.uint32)
        rpos = np.searchsorted(dl_ids, doc_ids)
        found = (rpos < len(dl_ids)) & (dl_ids[np.minimum(rpos, len(dl_ids) - 1)] == doc_ids)
        row_dl[found] = dl_val[np.minimum(rpos, len(dl_ids) - 1)][found]
        cols: dict = {"doc_id": pa.array(doc_ids, type=pa.uint64())}
        if doc_id_col is None:
            for c in id_cols:
                cols[c] = batch[c]
        for c in store_cols:  # ES stored-fields analogue (facet doc values)
            if c not in cols:
                cols[c] = batch[c]
        if compute_sha:
            cols["sha256"] = pa.array(sha256_batch(content), type=pa.string())
        cols["doc_len"] = pa.array(row_dl, type=pa.uint32())
        name = hashlib.blake2b(doc_ids.tobytes(), digest_size=8).hexdigest()
        pq.write_table(pa.table(cols), os.path.join(docmap_dir, f"docmap-{name}.parquet"))

    cols_out = {
        "seg": pa.array(seg),
        "doc_id": postings["doc_id"],
        "term": postings["term"],
        "tf": postings["tf"],
    }
    fields = [POSTING_SCHEMA.field(i) for i in range(4)]
    if emit_dl:
        pos = np.searchsorted(dl_ids, p_doc)
        cols_out["dl"] = pa.array(dl_val[pos])
        fields.append(POSTING_SCHEMA.field(4))
    if emit_positions:
        cols_out["pos"] = postings["pos"]
        fields.append(pa.field("pos", pa.large_list(pa.uint32())))
    return pa.table(cols_out, schema=pa.schema(fields))


class SegmentBuilder:
    """Actor-pool group fn: one doc-shard's postings → one immutable segment.

    Stateful stage (BASELINE.json:15): instantiated once per actor; per group
    it sorts (term, doc_id) vectorized, varbyte-encodes every posting list, and
    atomically writes ``seg_<id>/`` under the run directory.
    """

    def __init__(self, run_dir: str, rel_run_dir: str):
        self.run_dir = run_dir
        self.rel = rel_run_dir

    def __call__(self, group: pa.Table) -> pa.Table:
        seg_id = int(group["seg"][0].as_py())
        term_table, blob, meta, pos_blob = build_segment_arrays_table(group)
        seg_dir = os.path.join(self.run_dir, f"seg_{seg_id}")
        meta = write_segment(seg_dir, seg_id, term_table, blob, meta, pos_blob=pos_blob)
        return pa.table(
            {
                "seg_id": pa.array([seg_id], type=pa.int64()),
                "dir": pa.array([f"{self.rel}/seg_{seg_id}"], type=pa.string()),
                "n_terms": pa.array([meta["n_terms"]], type=pa.int64()),
                "n_docs": pa.array([meta["n_docs"]], type=pa.int64()),
                "sum_dl": pa.array([meta["sum_dl"]], type=pa.int64()),
                "n_postings": pa.array([meta["n_postings"]], type=pa.int64()),
                "postings_bytes": pa.array([meta["postings_bytes"]], type=pa.int64()),
            }
        )


@dataclass
class BuildResult:
    run_id: str
    n_docs: int
    n_postings: int
    n_input_files: int
    duration_s: float
    skipped: bool = False


def build_index(
    corpus: str | list[str],
    index_dir: str,
    *,
    mode: str = "full",
    config: IndexConfig | None = None,
    run_id: str | None = None,
    segment_concurrency: int | tuple[int, int] | None = None,
    tokenize_batch_size: int | None = None,  # whole blocks: fewer Arrow
    # group-by calls and one docmap file per block instead of per 512 rows
    write_docmap: bool = True,
    compute_sha: bool = True,
    auto_merge_runs: int | None = None,
) -> BuildResult:
    """Build (mode="full") or extend (mode="incremental") the index.

    full: forgets prior runs (fresh manifest) and indexes every corpus file.
    incremental: indexes only files not covered by a completed run — the
    reference's `{lastRun}` timestamp predicate generalized to file lineage.
    """
    assert mode in ("full", "incremental")
    if config is None:
        # incremental on an existing index inherits its stored config
        manifest_path = os.path.join(index_dir, "manifest.json")
        if mode == "incremental" and os.path.exists(manifest_path):
            config = Manifest.load(index_dir).config
        else:
            config = IndexConfig()
    t0 = time.monotonic()
    files = _resolve_files(corpus)

    os.makedirs(index_dir, exist_ok=True)
    with RunLock(index_dir):
        if mode == "full":
            man = Manifest(index_dir, config)
            man.save()
            pending = files
        else:
            man = Manifest.load_or_create(index_dir, config)
            pending = [f for f in files if f not in man.covered_files()]
        if not pending:
            return BuildResult("", 0, 0, 0, time.monotonic() - t0, skipped=True)

        rid = run_id or "run-" + hashlib.blake2b(
            "|".join(pending).encode(), digest_size=6
        ).hexdigest()
        rel_run = f"runs/{rid}"
        run_dir = os.path.join(index_dir, rel_run)
        os.makedirs(run_dir, exist_ok=True)
        docmap_dir = None
        if write_docmap:
            docmap_dir = os.path.join(index_dir, "docmap", rid)
            os.makedirs(docmap_dir, exist_ok=True)

        cols = list(config.id_cols) + [config.content_col] if config.doc_id_col is None else [
            config.doc_id_col,
            config.content_col,
        ]
        cols += [c for c in config.store_cols if c not in cols]
        # The shuffle strategy must be set BEFORE the dataset is created: Ray
        # Data snapshots the DataContext into the plan at creation time, so
        # setting it just around the groupby silently leaves the default in
        # place (observed: "AllToAllOperator[Sort]" in the plan).
        # Measured (32 CPUs, quiet host): sort is ~13% faster on plain tf
        # rows BELOW its spill cliff (600k docs: 59.5 s vs 68.5 s hash;
        # 2.4M: 278 s sort OK) but the sort barrier materializes the whole
        # posting exchange and DIES at scale (9.6M docs / 821M postings:
        # OutOfDiskError from spill, while hash streamed it in 939 s at
        # 10.2k docs/s — faster per doc than 2.4M). Positional list rows
        # spill even earlier (600k: 203 s sort vs 105 s hash). Default:
        # HASH for positional or large inputs (> _SORT_INPUT_BYTES_MAX of
        # source bytes), SORT for small plain builds;
        # EDIH_SHUFFLE_STRATEGY=sort|hash overrides.
        from ray.data.context import ShuffleStrategy

        _SORT_INPUT_BYTES_MAX = 4 << 30
        ctx = ray.data.DataContext.get_current()
        prev_strategy = ctx.shuffle_strategy
        total_cpus = int(ray.cluster_resources().get("CPU", 4))
        override = os.environ.get("EDIH_SHUFFLE_STRATEGY")
        if override is None:
            in_bytes = 0
            for f in pending:
                try:
                    in_bytes += os.path.getsize(f)
                except OSError:
                    pass
            use_hash = config.positions or in_bytes > _SORT_INPUT_BYTES_MAX
            # Hash shuffle holds PERSISTENT aggregator actors for the whole
            # exchange; below ~8 CPUs those + the segment-builder actor pool
            # reserve every core and the upstream read/tokenize tasks starve
            # — observed as a full livelock at num_cpus=4 (0 tasks anywhere,
            # shuffle "backpressured:tasks" forever). Sort shuffle is plain
            # tasks and interleaves, so small hosts take it even for
            # positional builds (their corpora are small-scale by
            # construction; the spill cliff that motivates hash needs data
            # volumes a 4-CPU host never sees).
            if total_cpus < 8:
                use_hash = False
        else:
            use_hash = override == "hash"
        ctx.shuffle_strategy = (
            ShuffleStrategy.HASH_SHUFFLE if use_hash else ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
        )
        ds = ray.data.read_parquet(pending, columns=cols)
        postings = ds.map_batches(
            _tokenize_batch,
            batch_format="pyarrow",
            batch_size=tokenize_batch_size,
            zero_copy_batch=True,
            fn_kwargs=dict(
                analyzer_name=config.analyzer,
                num_segments=config.num_segments,
                id_cols=config.id_cols,
                doc_id_col=config.doc_id_col,
                content_col=config.content_col,
                docmap_dir=docmap_dir,
                compute_sha=compute_sha,
                emit_positions=config.positions,
                store_cols=config.store_cols,
            ),
        )
        if segment_concurrency is None:
            # measured sweet spot (240k-doc corpus, this host): ~CPUs/4
            # concurrent segment encoders. The encoder is memory-bandwidth
            # bound; beyond that the workers thrash shared bandwidth
            # (32 CPUs: 8 actors → 17 s, 16 actors → 56 s) and a larger pool
            # also starves the upstream read/tokenize stages
            # (ray_guide.md "Stateful stages = actor pools").
            # ≤1 encoder actor per 4 CPUs (memory-bandwidth sweet spot), and
            # never more than half the host: at 4 CPUs a floor of 2 actors
            # plus shuffle work left nothing for the read stage
            segment_concurrency = max(
                1, min(config.num_segments, total_cpus // 4, total_cpus // 2)
            )

        # Strategy chosen above (before dataset creation). num_partitions is
        # honored by the hash path (one whole-segment task per partition);
        # the sort path shuffles by range of the key. Both give full
        # segment-build parallelism here; the positional/plain split is a
        # spill-behavior choice, see the measured defaults above. Restored
        # after execution.
        try:
            summaries = postings.groupby(
                "seg", num_partitions=config.num_segments
            ).map_groups(
                SegmentBuilder,
                batch_format="pyarrow",
                concurrency=segment_concurrency,
                fn_constructor_args=(run_dir, rel_run),
            )
            seg_rows = summaries.to_pandas()  # tiny: one row per segment
        finally:
            ctx.shuffle_strategy = prev_strategy

        segments = seg_rows.to_dict("records")
        metrics = {
            "duration_s": round(time.monotonic() - t0, 3),
            "n_postings": int(seg_rows["n_postings"].sum()),
            "n_input_files": len(pending),
            "docmap_dir": f"docmap/{rid}" if write_docmap else None,
        }
        man.commit_run(rid, pending, segments, metrics)

    result = BuildResult(
        run_id=rid,
        n_docs=int(seg_rows["n_docs"].sum()),
        n_postings=int(seg_rows["n_postings"].sum()),
        n_input_files=len(pending),
        duration_s=time.monotonic() - t0,
    )
    # compaction policy (C3/B5): keep read amplification bounded — after
    # enough incremental runs, fold them into one segment set per shard
    if auto_merge_runs:
        man = Manifest.load(index_dir)
        if len(man.complete_runs()) >= auto_merge_runs:
            from .merge import merge_index

            merge_index(index_dir)
    return result


def verify_hashes(index_dir: str, sidecar_path: str) -> int:
    """Assert the per-row sha256 invariant (BASELINE.json:15) by joining the
    build's docmap (doc_id, sha256) against the reference sidecar — no corpus
    re-read. Superseded versions (upsert tombstones) are excluded: an
    upserted doc verifies against its LATEST content hash. Returns the number
    of verified rows; raises on any mismatch."""
    man = Manifest.load(index_dir)
    from ..functions.partitioning import join_fanout
    from .tombstones import docmap_dataset, find_superseded

    ours = docmap_dataset(man, find_superseded(man), columns=["doc_id", "sha256"])
    ref = ray.data.read_parquet(sidecar_path).rename_columns({"sha256": "ref_sha256"})
    joined = ours.join(ref, join_type="inner", num_partitions=join_fanout(ours, ref), on=("doc_id",))
    bad = joined.filter(expr="sha256 != ref_sha256").count()
    n = joined.count()
    n_ours = ours.count()
    if bad:
        raise AssertionError(f"sha256 invariant violated for {bad} rows")
    if n != n_ours:
        raise AssertionError(f"{n_ours - n} indexed docs missing from reference sidecar")
    return n
