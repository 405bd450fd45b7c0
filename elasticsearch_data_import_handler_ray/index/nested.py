"""Nested-field indexing + nested-match queries — the ES ``nested`` mapping
semantics over an A19 ``list<struct>`` column (SURVEY.md §2.A19 query side;
the reference's README flagship example imported nested docs).

ES indexes every element of a nested array as a HIDDEN CHILD DOCUMENT: a
``nested`` query matches a parent iff some SINGLE child satisfies the whole
inner query (``items.sku:X AND items.qty:2`` must hold on the same item —
the cross-object leak a flattened ``object`` mapping allows is exactly what
``nested`` exists to prevent). Rebuilt here Ray-Data-first:

* ``explode_nested`` — one vectorized ``map_batches`` flattening the
  ``list<struct>`` column to one row per child: struct fields become plain
  string columns named ``<nested_col>.<field>``, and the child doc id packs
  the parent id into its LOW bits (``child = ordinal << 40 | parent``).
  With a power-of-two ``num_segments`` this keeps ``child % D ==
  parent % D`` — every child of a parent lands in the SAME doc-shard, so
  per-parent score aggregation (ES ``score_mode``) is shard-local and the
  driver merge stays a plain disjoint top-k. No extra shuffle vs a flat
  build.
* ``build_nested_index`` — stages the exploded child table and reuses the
  multifield builder: one ordinary immutable sub-index per struct field
  (same analyzer/num_segments across fields, docmap once).
* ``NestedEngine.nested_search(clauses, mode, score_mode)`` — inner query =
  per-field match clauses; a child matches a clause if ANY of the clause's
  analyzed terms hits in that field (ES ``match``), and the inner bool is
  AND/OR across clauses on the SAME child. Child score = sum of matched
  contributions (Lucene bool sum); parent score = max / sum / avg over its
  matching children (``score_mode``). Scoring runs in the shard actors with
  the same union-searchsorted ascending-(field,term) accumulation as every
  other scorer in this repo — tests pin rank+score identity vs a
  from-scratch pandas oracle.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions import bm25
from ..state.manifest import IndexConfig
from .multifield import MultiFieldEngine, MultiFieldShard, build_multifield_index
from .query import _heap_push

_ORD_SHIFT = 40
_PARENT_MASK = np.uint64((1 << _ORD_SHIFT) - 1)


def explode_nested(
    ds: ray.data.Dataset,
    *,
    parent_id_col: str,
    nested_col: str,
    sub_fields: list[str],
) -> ray.data.Dataset:
    """list<struct> → one row per child: (doc_id, parent_id, <nested>.<f>…).

    Child ids pack the parent into the low 40 bits (parents must fit; the
    per-parent child ordinal gets the high bits, capped at 2^24 children).
    Struct fields are cast to strings — they become the per-field CONTENT
    the analyzers tokenize, exactly like ES coercing values into the mapped
    text field."""
    import pyarrow.compute as pc

    def flatten(t: pa.Table) -> pa.Table:
        lst = t[nested_col].combine_chunks()
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        parents = pc.cast(t[parent_id_col], pa.uint64()).to_numpy(zero_copy_only=False)
        if len(parents) and int(parents.max()) >= (1 << _ORD_SHIFT):
            raise ValueError(f"parent ids must fit in {_ORD_SHIFT} bits")
        counts = np.asarray(pc.list_value_length(lst).fill_null(0))
        if len(counts) and int(counts.max()) >= (1 << (64 - _ORD_SHIFT)):
            raise ValueError("too many children per parent")
        par_rep = np.repeat(parents, counts)
        ordinal = np.arange(len(par_rep), dtype=np.uint64) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.uint64), counts
        )
        child = (ordinal << np.uint64(_ORD_SHIFT)) | par_rep
        flat = pc.list_flatten(lst)  # struct array, parent order preserved
        cols = {
            "doc_id": pa.array(child, type=pa.uint64()),
            "parent_id": pa.array(par_rep.astype(np.int64)),
        }
        for f in sub_fields:
            cols[f"{nested_col}.{f}"] = pc.cast(
                pc.struct_field(flat, f), pa.large_string()
            )
        return pa.table(cols)

    return ds.map_batches(flatten, batch_format="pyarrow", zero_copy_batch=True)


def build_nested_index(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    parent_id_col: str,
    nested_col: str,
    sub_fields: list[str],
    config: IndexConfig | None = None,
) -> dict:
    """Explode + one sub-index per struct field (multifield builder)."""
    base = config or IndexConfig(analyzer="whitespace", num_segments=4)
    if base.num_segments & (base.num_segments - 1):
        raise ValueError(
            "nested indexes need a power-of-two num_segments so children "
            "co-locate with their parent's shard (child%D == parent%D)"
        )
    staged = tempfile.mkdtemp(prefix="edih_nested_src_")
    explode_nested(
        ds, parent_id_col=parent_id_col, nested_col=nested_col, sub_fields=sub_fields
    ).write_parquet(staged)
    files = [
        os.path.join(staged, f) for f in sorted(os.listdir(staged)) if f.endswith(".parquet")
    ]
    cfg = IndexConfig.from_dict({**base.to_dict(), "doc_id_col": "doc_id"})
    fields = {f"{nested_col}.{f}": 1.0 for f in sub_fields}
    res = build_multifield_index(files, index_dir, fields=fields, config=cfg)
    with open(os.path.join(index_dir, "nested.json"), "w") as fh:
        json.dump(
            {"nested_col": nested_col, "parent_id_col": parent_id_col,
             "sub_fields": sub_fields, "ord_shift": _ORD_SHIFT},
            fh, sort_keys=True,
        )
    import shutil

    shutil.rmtree(staged, ignore_errors=True)
    return res


class NestedShard(MultiFieldShard):
    """MultiFieldShard + per-clause child matching and shard-local parent
    aggregation (sound: children co-locate with their parent's shard)."""

    def nested_batch(self, queries: list[dict]) -> list[list[tuple[float, int]]]:
        """queries: [{clauses: [(field, [terms])], idfs: {field: {term: idf}},
        avgdl: {field}, mode, score_mode, k, k1, b}] → per query, local top-k
        as (parent_score, parent_id)."""
        out = []
        for q in queries:
            clauses, k = q["clauses"], q["k"]
            if k <= 0 or not clauses:
                out.append([])
                continue
            parts = []  # (ci, field, term, ids, tfs, dls) — field/term asc per gather
            for ci, (f, terms) in enumerate(clauses):
                for t in terms:
                    for ri in range(len(self.readers.get(f, []))):
                        arrs = self._decoded(f, ri, t)
                        if arrs is not None:
                            parts.append((ci, f, t, *arrs))
            if not parts:
                out.append([])
                continue
            union = np.unique(np.concatenate([p[3] for p in parts]))
            scores = np.zeros(len(union), dtype=np.float64)
            clause_hit = np.zeros((len(clauses), len(union)), dtype=bool)
            for ci, f, t, ids, tfs, dls in parts:
                pos = np.searchsorted(union, ids)
                scores[pos] += bm25.contribution(
                    q["idfs"][f][t], tfs, dls, q["avgdl"][f], q["k1"], q["b"]
                )
                clause_hit[ci, pos] = True
            m = clause_hit.all(axis=0) if q["mode"] == "and" else clause_hit.any(axis=0)
            union, scores = union[m], scores[m]
            if not len(union):
                out.append([])
                continue
            # ES scores only the MATCHED clauses' contributions; with "or"
            # an unmatched clause contributed nothing by construction, with
            # "and" every clause matched — either way `scores` is right.
            parents = union & _PARENT_MASK
            order = np.argsort(parents, kind="stable")
            parents, scores = parents[order], scores[order]
            uniq, starts = np.unique(parents, return_index=True)
            sm = q.get("score_mode", "max")
            if sm == "sum":
                agg = np.add.reduceat(scores, starts)
            elif sm == "avg":
                counts = np.diff(np.append(starts, len(scores)))
                agg = np.add.reduceat(scores, starts) / counts
            else:  # max (and ES "none" ≈ max of 1-child contribution)
                agg = np.maximum.reduceat(scores, starts)
            heap: list = []
            for i in bm25.topk_indices(agg, uniq, k):
                _heap_push(heap, k, float(agg[i]), int(uniq[i]))
            out.append([(s, -negd) for s, negd in sorted(heap, reverse=True)])
        return out


class NestedEngine(MultiFieldEngine):
    """Driver facade: MultiFieldEngine plumbing (per-field manifests, df
    scatter, actor layout) + the nested-match query."""

    SHARD_CLS = NestedShard

    def __init__(self, index_dir: str, **kw):
        super().__init__(index_dir, **kw)
        with open(os.path.join(index_dir, "nested.json")) as fh:
            self.nested_meta = json.load(fh)

    def nested_search(
        self,
        clauses: dict[str, str] | list[tuple[str, str]],
        *,
        k: int = 10,
        mode: str = "and",
        score_mode: str = "max",
    ) -> list[tuple[int, float]]:
        """ES nested query: ``clauses`` maps field → match text (a list of
        (field, text) pairs allows repeated fields). A parent matches iff
        one child satisfies the AND/OR of the clauses; returns
        (parent_id, score) ranked by (score desc, parent asc)."""
        pairs = list(clauses.items()) if isinstance(clauses, dict) else list(clauses)
        nc = self.nested_meta["nested_col"]
        pairs = [
            (f if f.startswith(f"{nc}.") else f"{nc}.{f}", text) for f, text in pairs
        ]
        for f, _ in pairs:
            if f not in self.fields:
                raise KeyError(f"unknown nested field {f!r} (have {self.fields})")
        prepared_clauses = [(f, self.analyze(text)) for f, text in pairs]
        all_terms = sorted({t for _, ts in prepared_clauses for t in ts})
        df = self._global_dfs(all_terms)
        # a clause with NO indexed term can never match: AND short-circuits
        live_clauses = []
        for f, ts in prepared_clauses:
            ts_live = [t for t in ts if df[f][t] > 0]
            if not ts_live and mode == "and":
                return []
            if ts_live:
                live_clauses.append((f, ts_live))
        if not live_clauses:
            return []
        idfs = {
            f: {t: float(bm25.idf(self.N[f], df[f][t])) for t in all_terms}
            for f in self.fields
        }
        q = {
            "clauses": live_clauses, "idfs": idfs, "avgdl": self.avgdl,
            "mode": mode, "score_mode": score_mode, "k": k,
            "k1": self.k1, "b": self.b,
        }
        shard_results = ray.get([a.nested_batch.remote([q]) for a in self._actors])
        cand = [c for sr in shard_results for c in sr[0]]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        parents = np.array([c[1] for c in cand], dtype=np.uint64)
        top = bm25.topk_indices(scores, parents, k)
        return [(int(parents[i]), float(scores[i])) for i in top]
