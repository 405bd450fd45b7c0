"""SQL scalar-expression transforms (SURVEY.md §2.D2 fidelity layer).

The reference's entire user surface was SQL strings in its config
(``[PK: prepStatements / importStatements]`` — Spark SQL producing rows).
This repo's native extension surface is Dataset→Dataset functions; this
module adds a thin SQL layer on top so a config file can still say
``SELECT lower(name) AS k, price * (1-discount) AS v FROM t WHERE qty > 5``:
each Arrow batch is registered as a DuckDB view (zero-copy) and the SELECT
runs per batch, returning Arrow — a vectorized C++ scalar engine inside
``map_batches``, no Python per row.

Soundness constraint: per-batch evaluation distributes over row-local
(map-only) SQL ONLY — projections, filters, scalar functions, CASE.
Aggregates, joins, windows, ORDER BY/LIMIT/DISTINCT see one batch, not the
dataset, so ``sql_transform`` REJECTS them up front (the reference ran such
statements on a single engine; here the equivalents are the repo's native
groupby/join/window pipelines, pipelines/relational.py).

Stateful stage: the DuckDB connection is created once per actor in
``__init__`` (ray_guide.md "Stateful stages are actor pools").
"""

from __future__ import annotations

import re
from typing import Callable

import pyarrow as pa

import ray.data

# map-only guard: constructs whose per-batch result differs from the
# whole-dataset result
_NON_MAP = re.compile(
    r"\b(group\s+by|join|over|order\s+by|limit|distinct|union|intersect|except"
    r"|sum\s*\(|count\s*\(|avg\s*\(|min\s*\(|max\s*\(|first\s*\(|last\s*\()",
    re.IGNORECASE,
)


def validate_map_only(query: str) -> None:
    m = _NON_MAP.search(query)
    if m:
        raise ValueError(
            f"sql_transform is per-batch (map-only); {m.group(0)!r} needs the "
            "whole dataset — use the native groupby/join/window pipelines "
            "instead (pipelines/relational.py)"
        )


class SQLBatch:
    """map_batches callable: evaluate one SELECT against each Arrow batch."""

    def __init__(self, query: str, view: str = "t"):
        import duckdb

        self.con = duckdb.connect()
        self.query = query
        self.view = view

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.con.register(self.view, batch)
        try:
            out = self.con.execute(self.query).arrow()
        finally:
            self.con.unregister(self.view)
        # duckdb emits string/list as non-large types; normalize nothing —
        # downstream Ray Data unifies schemas per block
        return out


def sql_query(
    query: str,
    views: dict[str, "ray.data.Dataset"],
    *,
    max_rows_per_view: int = 2_000_000,
) -> ray.data.Dataset:
    """Cross-source SQL — the reference's prepStatement surface (arbitrary
    Spark SQL over several registered temp views: joins, GROUP BY, windows).

    Runs DRIVER-SIDE: every referenced view is materialized into one DuckDB
    connection and the full statement executes there. That is sound only for
    BOUNDED inputs, so each view is capped at ``max_rows_per_view`` rows and
    the call fails fast past the cap — the guard that keeps this a
    config-parity layer for dimension-table work, not a second (non-scaling)
    execution engine. Corpus-sized SQL belongs to the native distributed
    pipelines (pipelines/relational.py); note the reference itself ran ALL
    its SQL on one embedded local-mode engine, so parity for the statements
    it could actually execute is exactly this shape.

    Incremental-lineage constraint (same reason the spec layer rejects sql
    sources in incremental index sinks): a cross-view result has no per-file
    lineage, so imports built from it must run mode="full" or carry their
    own {lastRun} watermark upstream.

    Returns the result as a Dataset (distributed again from here on)."""
    import duckdb

    con = duckdb.connect()
    for name, ds in views.items():
        # bounded materialization: cap + 1 detects overflow without counting
        rows = ds.limit(max_rows_per_view + 1).to_pandas()
        if len(rows) > max_rows_per_view:
            raise ValueError(
                f"sql_query view {name!r} exceeds max_rows_per_view="
                f"{max_rows_per_view}: cross-source SQL is driver-side and "
                "bounded by contract — use the native relational pipelines "
                "for corpus-sized inputs"
            )
        con.register(name, rows)
    out = con.execute(query).arrow()
    return ray.data.from_arrow(out)


def sql_transform(
    query: str, *, view: str = "t", concurrency: int | tuple[int, int] | None = None
) -> Callable[[ray.data.Dataset], ray.data.Dataset]:
    """→ Dataset→Dataset transform running ``query`` per Arrow batch.

    ``view`` is the table name the query must reference (default ``t``).
    Raises ValueError for SQL whose per-batch evaluation would be unsound.
    """
    validate_map_only(query)
    if concurrency is None:
        from ..functions.partitioning import pool_concurrency

        concurrency = pool_concurrency()
    return lambda ds: ds.map_batches(
        SQLBatch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_args=(query, view),
    )
