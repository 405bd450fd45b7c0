"""Declarative, config-driven pipeline spec (SURVEY.md §2.D1).

The reference was driven by a HOCON config: ``sources`` (JDBC/file → temp
views), ``prepStatements`` (SQL producing more views), ``importStatements``
(SQL whose result rows become id-mapped ES documents). This module mirrors
that shape Ray-Data-first, without a SQL parser:

* sources       → named Datasets in a Catalog (sources/catalog.py)
* prep steps    → named transform chains producing new catalog entries
* import steps  → a transform chain + a sink: ``parquet`` (id-mapped rows,
                  the A3 equivalent) or ``index`` (the full-text sink the
                  reference delegated to Elasticsearch, §2.B)

Transforms are (name, fn) pairs where fn: Dataset → Dataset — the idiomatic
Ray Data user hook (map_batches etc.), i.e. the D2 "UDF surface". A spec is
plain data (dataclasses), so it can be loaded from JSON/YAML-ish dicts via
``PipelineSpec.from_dict`` with a registry of named transforms.

Incremental semantics (§2.C): an ``index`` sink stages the transformed rows
as parquet under ``<target>/imports/<name>/`` with ONE deterministically-named
file per source input file (``part-<hash(src)>.parquet``), so build_index's
file-lineage manifest sees a stable set: a re-run stages only missing parts
and indexes only uncovered ones — the reference's ``{lastRun}`` predicate
generalized to file lineage. This requires the import's source to be a plain
file-backed SourceSpec and its steps to be per-row (map-only) transforms;
cross-file aggregations make incremental import semantically undefined (the
reference had the same constraint: its incremental SQL was a timestamp
filter, not a re-aggregation). Id-upsert dedup applies within the staged
batch; duplicate doc_ids across runs are rejected at merge (§2.B5).
"""

from __future__ import annotations

import hashlib
import os
import uuid
from dataclasses import dataclass, field
from typing import Callable

import ray.data

from ..sources.catalog import Catalog


def _dedup_first_by_id(ds: ray.data.Dataset, id_col: str, num_buckets: int | None = None):
    """Id-mapped upsert semantics (es.mapping.id): one row per id.
    Bucketed shuffle — O(num_buckets) Python group calls with a vectorized
    drop_duplicates inside, never one call per distinct id."""
    import pandas as pd

    from ..functions.partitioning import shuffle_fanout
    from .relational import _add_bucket

    if num_buckets is None:
        num_buckets = shuffle_fanout(ds)
    bucketed = ds.map_batches(
        _add_bucket, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs=dict(key_cols=[id_col], num_buckets=num_buckets)
    )

    def first(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.drop_duplicates(id_col, keep="first").drop(columns="_bucket")

    return bucketed.groupby("_bucket").map_groups(first, batch_format="pandas")


@dataclass
class SourceSpec:
    name: str
    path: str  # file path; for format="sql", the sqlite database file
    format: str = "parquet"  # parquet | csv | json | text | sql
    columns: list[str] | None = None
    # format="sql" only: the SELECT shipped to the database (the reference's
    # sources.jdbc query) and optional hash-shard keys for parallel reads
    sql: str | None = None
    shard_keys: list[str] | None = None


def _builtin_step(name: str, params: dict) -> Callable:
    """Named stage library for config-file pipelines (no Python required):
    the text-curation stages from stages/text.py plus percolation, each as a
    Dataset→Dataset function. ``{"builtin": "<name>", "params": {...}}`` or
    the shorthand string ``"builtin:<name>"``."""
    from ..stages import text as T

    per_batch = {
        "token_count": T.token_count_batch,
        "bpe_token_count": T.bpe_token_count_batch,
        "quality": T.quality_batch,
        "fingerprint": T.fingerprint_batch,
        "redact": T.redact_batch,
        "repetition": T.repetition_batch,
        "sha256": T.sha256_batch_table,
    }
    if name in per_batch:
        fn = per_batch[name]
        return lambda ds: ds.map_batches(
            lambda t: fn(t, **params), batch_format="pyarrow", zero_copy_batch=True
        )
    if name == "chunk":
        return lambda ds: ds.map_batches(
            lambda t: T.chunk_batch(t, **params),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    if name == "pack_sequences":
        return lambda ds: T.pack_sequences(ds, **params)
    if name == "percolate":
        from ..stages.percolate import percolate

        return lambda ds: percolate(ds, **params)
    if name == "percolate_query_string":
        from ..stages.percolate import percolate_query_string

        return lambda ds: percolate_query_string(ds, **params)
    if name == "langid":
        from ..functions.partitioning import pool_concurrency
        from ..stages.text import LangId

        return lambda ds: ds.map_batches(
            LangId,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=pool_concurrency(),
            fn_constructor_kwargs=params,
        )
    raise KeyError(
        f"unknown builtin step: {name!r} (have "
        f"{sorted(per_batch) + ['chunk', 'pack_sequences', 'percolate', 'percolate_query_string', 'langid']})"
    )


@dataclass
class TransformStep:
    """A named Dataset→Dataset function (the user-extension surface, D2)."""

    name: str
    fn: Callable[[ray.data.Dataset], ray.data.Dataset]


@dataclass
class PrepSpec:
    """Like a prepStatement: derive a new named dataset from an existing one
    (``source`` + row-local ``steps``), or — the reference's full
    prepStatement surface — from a cross-view SQL statement (``sql`` set,
    ``source`` empty): joins/GROUP BY/windows over any registered names, run
    driver-side by sqlexpr.sql_query under its bounded-view contract."""

    name: str
    source: str
    steps: list[TransformStep] = field(default_factory=list)
    sql: str | None = None
    max_rows_per_view: int = 2_000_000


@dataclass
class ImportSpec:
    """Like an importStatement: transform chain + id column + sink.

    ``id_column`` is optional for the parquet sink (ES auto-ids documents
    when es.mapping.id is absent — rows pass through un-deduped, e.g. a
    percolation's (doc_id, query_id) match stream); the index sink always
    requires it (doc identity is the upsert key)."""

    name: str
    source: str
    id_column: str | None
    sink: str  # "parquet" | "index"
    target: str  # output dir (parquet) or index dir (index)
    steps: list[TransformStep] = field(default_factory=list)
    mode: str = "full"  # full | incremental (index sink)
    index_content_col: str = "text"
    index_analyzer: str = "code"
    index_num_segments: int = 8
    index_positions: bool = False
    index_store_cols: tuple = ()
    # parquet sink only: hive-partition the output by these columns — one
    # directory per key, so a re-run can skip finished partitions and a
    # downstream read prunes by partition (the resumable-output layout)
    partition_cols: tuple = ()


@dataclass
class PipelineSpec:
    sources: list[SourceSpec]
    preps: list[PrepSpec] = field(default_factory=list)
    imports: list[ImportSpec] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict, registry: dict[str, Callable] | None = None) -> "PipelineSpec":
        """Build from plain data. A step is either a registry name (a named
        Dataset→Dataset function, the D2 surface) or ``{"sql": "SELECT ..."}``
        — a row-local SQL expression evaluated per batch (pipelines/sqlexpr.py),
        mirroring the reference's SQL-string config statements."""
        registry = registry or {}

        def steps(lst):
            out = []
            for s in lst or []:
                if isinstance(s, dict) and "sql" in s:
                    from .sqlexpr import sql_transform

                    out.append(
                        TransformStep(
                            f"sql:{s['sql'][:40]}",
                            sql_transform(s["sql"], view=s.get("view", "t")),
                        )
                    )
                elif isinstance(s, dict) and "builtin" in s:
                    out.append(
                        TransformStep(
                            f"builtin:{s['builtin']}",
                            _builtin_step(s["builtin"], s.get("params") or {}),
                        )
                    )
                elif isinstance(s, str) and s.startswith("builtin:"):
                    out.append(TransformStep(s, _builtin_step(s[8:], {})))
                else:
                    out.append(TransformStep(s, registry[s]))
            return out

        return cls(
            sources=[SourceSpec(**s) for s in d.get("sources", [])],
            preps=[
                PrepSpec(
                    p["name"],
                    p.get("source", ""),
                    steps(p.get("steps")),
                    sql=p.get("sql_multi"),
                    max_rows_per_view=p.get("max_rows_per_view", 2_000_000),
                )
                for p in d.get("preps", [])
            ],
            imports=[
                ImportSpec(
                    name=i["name"],
                    source=i["source"],
                    id_column=i.get("id_column"),
                    sink=i["sink"],
                    target=i["target"],
                    steps=steps(i.get("steps")),
                    mode=i.get("mode", "full"),
                    index_content_col=i.get("index_content_col", "text"),
                    index_analyzer=i.get("index_analyzer", "code"),
                    index_num_segments=i.get("index_num_segments", 8),
                    index_positions=i.get("index_positions", False),
                    index_store_cols=tuple(i.get("index_store_cols", ())),
                    partition_cols=tuple(i.get("partition_cols", ())),
                )
                for i in d.get("imports", [])
            ],
        )


def _read_source(s: SourceSpec, paths: str | list[str] | None = None) -> ray.data.Dataset:
    p = paths if paths is not None else s.path
    if s.format == "parquet":
        return ray.data.read_parquet(p, columns=s.columns)
    if s.format == "csv":
        return ray.data.read_csv(p)
    if s.format == "json":
        return ray.data.read_json(p)
    if s.format == "text":
        # one doc per line with a content-hash doc_id (sources/catalog.py)
        from ..sources.catalog import Catalog

        c = Catalog()
        c.register_text("_t", p)
        return c["_t"]
    if s.format == "sql":
        # JSON-spec SQL source: path = a sqlite file (the only DB in this
        # sandbox; stdlib). Programmatic pipelines with a real DB register
        # via Catalog.register_sql with their own connection factory.
        if not s.sql:
            raise ValueError("sql source needs a 'sql' SELECT statement")
        from functools import partial

        from ..sources.catalog import Catalog

        c = Catalog()
        c.register_sql(
            "_s", s.sql, partial(_sqlite_connect, p), shard_keys=s.shard_keys
        )
        return c["_s"]
    raise ValueError(f"unknown source format {s.format}")


def _sqlite_connect(path: str):
    """Module-level (picklable) sqlite connection factory for read tasks."""
    import sqlite3

    return sqlite3.connect(path)


def run_pipeline(spec: PipelineSpec) -> dict[str, dict]:
    """Execute a spec: register sources, run preps, run imports (the
    reference's App.kt run loop, §3.1 — errors abort the failing import but
    later imports still run, matching its continue-on-error semantics)."""
    cat = Catalog()
    source_specs = {s.name: s for s in spec.sources}
    for s in spec.sources:
        cat.register(s.name, _read_source(s))

    for p in spec.preps:
        if p.sql:
            # cross-view prepStatement: compiled onto distributed Dataset
            # operators when the statement is in sqlplan's subset; otherwise
            # every referenced name becomes a bounded DuckDB view
            # (sqlexpr.sql_query fallback — the reference's single-engine
            # shape, driver-side by contract).
            from .sqlplan import distributed_sql_query

            import re as _re

            toks = set(_re.findall(r"[A-Za-z_][A-Za-z0-9_]*", p.sql))
            views = {n: cat[n] for n in cat.names() if n in toks}
            if not views:
                raise ValueError(
                    f"prep {p.name!r}: sql_multi references no registered source"
                )
            cat.register(
                p.name,
                distributed_sql_query(
                    p.sql, views, max_rows_per_view=p.max_rows_per_view
                ),
            )
            continue
        ds = cat[p.source]
        for step in p.steps:
            ds = step.fn(ds)
        cat.register(p.name, ds)

    results: dict[str, dict] = {}
    for imp in spec.imports:
        try:
            ds = cat[imp.source]
            for step in imp.steps:
                ds = step.fn(ds)
            if imp.sink == "parquet":
                if imp.id_column:
                    ds = _dedup_first_by_id(ds, imp.id_column)
                os.makedirs(imp.target, exist_ok=True)
                if imp.partition_cols:
                    ds.write_parquet(imp.target, partition_cols=list(imp.partition_cols))
                else:
                    ds.write_parquet(imp.target)
                results[imp.name] = {"status": "complete", "sink": "parquet"}
            elif imp.sink == "index":
                from ..index.build import build_index
                from ..state.manifest import IndexConfig

                if not imp.id_column:
                    raise ValueError(
                        f"import {imp.name!r}: the index sink requires id_column "
                        f"(doc identity is the upsert key)"
                    )

                config = IndexConfig(
                    analyzer=imp.index_analyzer,
                    num_segments=imp.index_num_segments,
                    doc_id_col=imp.id_column,
                    content_col=imp.index_content_col,
                    positions=imp.index_positions,
                    store_cols=tuple(imp.index_store_cols),
                )
                stage_dir = os.path.join(imp.target, "imports", imp.name)
                if imp.mode == "full":
                    # full reload: restage everything under one fresh part
                    import shutil

                    shutil.rmtree(stage_dir, ignore_errors=True)
                    part = os.path.join(stage_dir, "part-full")
                    tmp = f"{part}.tmp-{uuid.uuid4().hex[:8]}"
                    _dedup_first_by_id(ds, imp.id_column).write_parquet(tmp)
                    os.rename(tmp, part)
                else:
                    # incremental: stage ONE deterministic part dir per source
                    # input file so build_index's file lineage sees a stable,
                    # append-only set (see module docstring for the contract)
                    src = source_specs.get(imp.source)
                    if src is None or src.format == "sql":
                        raise ValueError(
                            f"incremental index sink '{imp.name}' requires a "
                            "file-backed source (not a prep or sql source): "
                            "staging is keyed by source input file for lineage "
                            "— incremental DB imports use a {lastRun} watermark "
                            "in the SQL instead (state/watermark.py)"
                        )
                    for f in sorted(cat[imp.source].input_files()):
                        h = hashlib.blake2b(f.encode(), digest_size=8).hexdigest()
                        part = os.path.join(stage_dir, f"part-{h}")
                        if os.path.isdir(part):
                            continue
                        sub = _read_source(src, [f])
                        for step in imp.steps:
                            sub = step.fn(sub)
                        sub = _dedup_first_by_id(sub, imp.id_column)
                        tmp = f"{part}.tmp-{uuid.uuid4().hex[:8]}"
                        sub.write_parquet(tmp)
                        os.rename(tmp, part)
                staged = sorted(
                    os.path.join(stage_dir, d, f)
                    for d in os.listdir(stage_dir)
                    if os.path.isdir(os.path.join(stage_dir, d)) and ".tmp-" not in d
                    for f in os.listdir(os.path.join(stage_dir, d))
                    if f.endswith(".parquet")
                )
                res = build_index(staged, imp.target, mode=imp.mode, config=config)
                results[imp.name] = {
                    "status": "complete",
                    "sink": "index",
                    "n_docs": res.n_docs,
                    "run_id": res.run_id,
                }
            else:
                raise ValueError(f"unknown sink {imp.sink}")
        except Exception as e:  # continue with next import (reference §2.C6)
            results[imp.name] = {"status": "error", "error": f"{type(e).__name__}: {e}"}
    return results
