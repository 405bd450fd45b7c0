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

Incremental semantics (§2.C): an ``index`` sink passes mode=full/incremental
through to build_index (file-lineage manifest); a ``parquet`` sink writes to a
per-run subdirectory and is idempotent per (input files, spec).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable

import ray.data

from ..sources.catalog import Catalog


@dataclass
class SourceSpec:
    name: str
    path: str
    format: str = "parquet"  # parquet | csv | json
    columns: list[str] | None = None


@dataclass
class TransformStep:
    """A named Dataset→Dataset function (the user-extension surface, D2)."""

    name: str
    fn: Callable[[ray.data.Dataset], ray.data.Dataset]


@dataclass
class PrepSpec:
    """Like a prepStatement: derive a new named dataset from an existing one."""

    name: str
    source: str
    steps: list[TransformStep] = field(default_factory=list)


@dataclass
class ImportSpec:
    """Like an importStatement: transform chain + id column + sink."""

    name: str
    source: str
    id_column: str
    sink: str  # "parquet" | "index"
    target: str  # output dir (parquet) or index dir (index)
    steps: list[TransformStep] = field(default_factory=list)
    mode: str = "full"  # full | incremental (index sink)
    index_content_col: str = "text"
    index_analyzer: str = "code"
    index_num_segments: int = 8


@dataclass
class PipelineSpec:
    sources: list[SourceSpec]
    preps: list[PrepSpec] = field(default_factory=list)
    imports: list[ImportSpec] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict, registry: dict[str, Callable]) -> "PipelineSpec":
        """Build from plain data; transform names resolve via ``registry``."""

        def steps(lst):
            return [TransformStep(s, registry[s]) for s in lst or []]

        return cls(
            sources=[SourceSpec(**s) for s in d.get("sources", [])],
            preps=[
                PrepSpec(p["name"], p["source"], steps(p.get("steps")))
                for p in d.get("preps", [])
            ],
            imports=[
                ImportSpec(
                    name=i["name"],
                    source=i["source"],
                    id_column=i["id_column"],
                    sink=i["sink"],
                    target=i["target"],
                    steps=steps(i.get("steps")),
                    mode=i.get("mode", "full"),
                    index_content_col=i.get("index_content_col", "text"),
                    index_analyzer=i.get("index_analyzer", "code"),
                    index_num_segments=i.get("index_num_segments", 8),
                )
                for i in d.get("imports", [])
            ],
        )


def run_pipeline(spec: PipelineSpec) -> dict[str, dict]:
    """Execute a spec: register sources, run preps, run imports (the
    reference's App.kt run loop, §3.1 — errors abort the failing import but
    later imports still run, matching its continue-on-error semantics)."""
    cat = Catalog()
    for s in spec.sources:
        if s.format == "parquet":
            cat.register(s.name, ray.data.read_parquet(s.path, columns=s.columns))
        elif s.format == "csv":
            cat.register(s.name, ray.data.read_csv(s.path))
        elif s.format == "json":
            cat.register(s.name, ray.data.read_json(s.path))
        else:
            raise ValueError(f"unknown source format {s.format}")

    for p in spec.preps:
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
                # id-mapped upsert semantics: dedup by id (last write wins is
                # undefined in a batch; keep first deterministically)
                import pandas as pd

                def first(g: pd.DataFrame) -> pd.DataFrame:
                    return g.head(1)

                ds = ds.groupby(imp.id_column).map_groups(first, batch_format="pandas")
                os.makedirs(imp.target, exist_ok=True)
                ds.write_parquet(imp.target)
                results[imp.name] = {"status": "complete", "sink": "parquet"}
            elif imp.sink == "index":
                import tempfile

                import pandas as pd

                from ..index.build import build_index
                from ..state.manifest import IndexConfig

                # id-mapped upsert semantics (es.mapping.id): dedup by id
                # before indexing — the segment builder rejects duplicates
                def first_idx(g: "pd.DataFrame") -> "pd.DataFrame":
                    return g.head(1)

                ds = ds.groupby(imp.id_column).map_groups(first_idx, batch_format="pandas")
                tmp = tempfile.mkdtemp(prefix=f"edih_imp_{imp.name}_")
                ds.write_parquet(tmp)
                res = build_index(
                    tmp,
                    imp.target,
                    mode=imp.mode,
                    config=IndexConfig(
                        analyzer=imp.index_analyzer,
                        num_segments=imp.index_num_segments,
                        doc_id_col=imp.id_column,
                        content_col=imp.index_content_col,
                    ),
                )
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
