"""Multi-field indexing + weighted cross-field BM25 (ES `fields` fidelity).

The reference mapped each SQL result column to a FIELD of the Elasticsearch
document (`[PK: importStatements → es.mapping]`), and ES searches score
multiple fields with per-field boosts (`title^2 body`). This module closes
that gap on the doc-partitioned engine:

* ``build_multifield_index`` builds ONE sub-index per field (same
  ``num_segments``, same doc identity — ``seg = doc_id % D`` is therefore
  IDENTICAL across fields), under ``<index_dir>/field_<name>/``. The docmap
  is written once (first field); weights persist in ``multifield.json``.
* ``MultiFieldEngine`` serves `score(doc) = Σ_f w_f · BM25_f(doc)` — each
  field scored with its OWN df/N/avgdl (per-field length norms, the
  ES/BM25F-style shape) — EXACTLY, not by merging per-field top-k lists
  (which is not exact: a doc ranked k+1 in every field can win the combined
  ranking). Exactness comes from doc-alignment: one actor holds ALL fields'
  readers for its doc-shards, scores the union of matching docs with
  field-major, ascending-term accumulation (the repo-wide bit-identity
  rule), and per-shard top-k merges are exact because doc sets stay
  disjoint across shards in every field.

Scale shape: identical to the single-field engine — the multi-field part
adds zero extra shuffles (fields build independently; query fan-out is the
same 2-round scatter/gather).
"""

from __future__ import annotations

import json
import os

import numpy as np

import ray

from ..functions import bm25
from ..functions.analysis import get_analyzer
from ..state.manifest import IndexConfig, Manifest
from .build import BuildResult, build_index
from .query import _heap_push
from .segment import SegmentReader


def build_multifield_index(
    corpus: str | list[str],
    index_dir: str,
    *,
    fields: dict[str, float],
    config: IndexConfig | None = None,
    mode: str = "full",
    **build_kwargs,
) -> dict[str, BuildResult]:
    """Build one sub-index per field. ``fields`` maps content column → boost
    weight. ``config.content_col`` is ignored (set per field); everything
    else (analyzer, num_segments, id columns) is shared so doc identity and
    sharding align across fields."""
    base = config or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    results: dict[str, BuildResult] = {}
    for i, (f, _w) in enumerate(sorted(fields.items())):
        cfg = IndexConfig.from_dict({**base.to_dict(), "content_col": f})
        results[f] = build_index(
            corpus,
            os.path.join(index_dir, f"field_{f}"),
            mode=mode,
            config=cfg,
            # every field keeps its docmap: identity is field-independent
            # (field 0 is authoritative) but combined_fields (BM25F) needs
            # PER-FIELD doc lengths for every candidate doc — the per-field
            # docmap's doc_len column is that store
            write_docmap=True,
            compute_sha=build_kwargs.pop("compute_sha", i == 0),
            **build_kwargs,
        )
    with open(os.path.join(index_dir, "multifield.json"), "w") as fh:
        json.dump({"fields": {k: float(v) for k, v in fields.items()}}, fh, sort_keys=True)
    return results


class MultiFieldShard:
    """One actor per doc-shard group, holding EVERY field's readers for its
    shards. Scoring is exhaustive + vectorized (union searchsorted adds);
    decoded postings are LRU-cached per (field, reader, term) — the same
    Zipf-repeat tail-latency lever as the single-field QueryShard."""

    _DECODED_BUDGET = 4_000_000  # postings (~96 MB across the 3 arrays)

    def __init__(self, field_dirs: dict[str, list[str]]):
        from collections import OrderedDict

        self.fields = sorted(field_dirs)
        self.readers = {f: [SegmentReader(d) for d in field_dirs[f]] for f in self.fields}
        self._dec: "OrderedDict[tuple[str, int, str], tuple]" = OrderedDict()
        self._dec_size = 0

    def _decoded(self, f: str, ri: int, term: str):
        from ..functions.codec import decode_posting

        key = (f, ri, term)
        hit = self._dec.get(key)
        if hit is not None:
            self._dec.move_to_end(key)
            return hit if hit[0] is not None else None
        blob = self.readers[f][ri].posting_blob(term)
        if blob is None:
            self._dec[key] = (None,)
            return None
        arrs = decode_posting(blob)
        n = len(arrs[0])
        if n <= self._DECODED_BUDGET:
            while self._dec_size + n > self._DECODED_BUDGET and self._dec:
                _, old = self._dec.popitem(last=False)
                if old[0] is not None:
                    self._dec_size -= len(old[0])
            self._dec[key] = arrs
            self._dec_size += n
        return arrs

    def dfs(self, terms: list[str]) -> dict[str, list[int]]:
        return {
            f: [int(sum(r.df(t) for r in self.readers[f])) for t in terms]
            for f in self.fields
        }

    # ------------------------------------------ combined_fields (BM25F)
    def load_combined_dls(
        self, docmap_files: dict[str, list[str]], num_segments: int
    ) -> int:
        """Per-field doc lengths for THIS actor's doc shards, from each
        field sub-index's docmap (doc_id, doc_len). A doc absent from a
        field's docmap (zero tokens in that field) reads as length 0."""
        import pyarrow.parquet as pq

        my_segs = np.array(
            sorted({
                int(r.meta["seg_id"]) for rs in self.readers.values() for r in rs
            }),
            dtype=np.uint64,
        )
        self._dls: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        total = 0
        for f, files in docmap_files.items():
            ids_parts, dl_parts = [], []
            for p in files:
                t = pq.read_table(p, columns=["doc_id", "doc_len"])
                ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
                keep = np.isin(ids % np.uint64(num_segments), my_segs)
                if keep.any():
                    ids_parts.append(ids[keep])
                    dl_parts.append(
                        t["doc_len"].to_numpy(zero_copy_only=False)[keep]
                        .astype(np.float64)
                    )
            if ids_parts:
                ids = np.concatenate(ids_parts)
                dls = np.concatenate(dl_parts)
                o = np.argsort(ids)
                self._dls[f] = (ids[o], dls[o])
            else:
                self._dls[f] = (np.empty(0, np.uint64), np.empty(0))
            total += len(self._dls[f][0])
        return total

    def has_combined_dls(self) -> bool:
        return hasattr(self, "_dls")

    def combined_dfs(self, terms: list[str]) -> list[int]:
        """Per-term COMBINED df partial: docs (of this actor) containing the
        term in ANY field — the union across aligned per-field readers."""
        out = []
        r0 = self.fields[0]
        for t in terms:
            n = 0
            for ri in range(len(self.readers[r0])):
                ids = None
                for f in self.fields:
                    arrs = self._decoded(f, ri, t)
                    if arrs is None:
                        continue
                    ids = arrs[0] if ids is None else np.union1d(ids, arrs[0])
                if ids is not None:
                    n += len(ids)
            out.append(int(n))
        return out

    def combined_topk(
        self, terms: list[str], idfs: dict, avgdl: float,
        weights: dict[str, float], k: int, mode: str, k1: float, b: float,
    ) -> list[tuple]:
        """Lucene CombinedFieldQuery / BM25F partial: per term,
        tf = Σ_f w_f·tf_f and the norm uses the COMBINED doc length
        dl = Σ_f w_f·len_f (per-field lengths from load_combined_dls);
        idf comes from the combined df. Field/term accumulation order is
        sorted-fields, ascending-terms — the repo bit-exactness rule."""
        cand_docs: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        r0 = self.fields[0]
        for ri in range(len(self.readers[r0])):
            data = {}
            union_parts = []
            for f in self.fields:
                for t in terms:
                    arrs = self._decoded(f, ri, t)
                    if arrs is not None:
                        data[(f, t)] = arrs
                        union_parts.append(arrs[0])
            if not union_parts:
                continue
            union = np.unique(np.concatenate(union_parts))
            dlc = np.zeros(len(union), dtype=np.float64)
            for f in self.fields:  # sorted-field accumulation order
                ids_f, dls_f = self._dls[f]
                pos = np.minimum(np.searchsorted(ids_f, union), max(len(ids_f) - 1, 0))
                if len(ids_f):
                    ok = ids_f[pos] == union
                    dlc += weights[f] * np.where(ok, dls_f[pos], 0.0)
            scores = np.zeros(len(union), dtype=np.float64)
            hits = np.zeros(len(union), dtype=np.int64)
            for t in terms:  # ascending-term accumulation order
                tfc = np.zeros(len(union), dtype=np.float64)
                present = False
                for f in self.fields:
                    arrs = data.get((f, t))
                    if arrs is None:
                        continue
                    present = True
                    pos = np.searchsorted(union, arrs[0])
                    tfc[pos] += weights[f] * arrs[1]
                if not present:
                    continue
                scores += bm25.contribution(idfs[t], tfc, dlc, avgdl, k1, b)
                hits += tfc > 0
            keep = hits == len(terms) if mode == "and" else hits > 0
            cand_docs.append(union[keep])
            cand_scores.append(scores[keep])
        if not cand_docs:
            return []
        docs = np.concatenate(cand_docs)
        scores = np.concatenate(cand_scores)
        top = bm25.topk_indices(scores, docs, k)
        return [(float(scores[i]), int(docs[i])) for i in top]

    def search_batch(self, queries: list[dict]) -> list[list[tuple[float, int]]]:
        """queries: [{terms (sorted), idfs: {field: {term: idf}},
        avgdl: {field}, weights: {field}, k, mode, k1, b}] → local top-k."""
        out = []
        for q in queries:
            terms, k, mode = q["terms"], q["k"], q["mode"]
            if k <= 0 or not terms:
                out.append([])
                continue
            # gather (field, term, reader) postings; field-major/term order
            parts = []  # (field, term, ids, tfs, dls)
            for f in self.fields:
                for t in terms:
                    for ri in range(len(self.readers[f])):
                        arrs = self._decoded(f, ri, t)
                        if arrs is not None:
                            parts.append((f, t, *arrs))
            if not parts:
                out.append([])
                continue
            union = np.unique(np.concatenate([p[2] for p in parts]))
            scores = np.zeros(len(union), dtype=np.float64)
            term_hit = {t: np.zeros(len(union), dtype=bool) for t in terms}
            for f, t, ids, tfs, dls in parts:  # field-major, term asc (gather order)
                pos = np.searchsorted(union, ids)
                scores[pos] += q["weights"][f] * bm25.contribution(
                    q["idfs"][f][t], tfs, dls, q["avgdl"][f], q["k1"], q["b"]
                )
                term_hit[t][pos] = True
            if mode == "and":
                m = np.logical_and.reduce([term_hit[t] for t in terms])
                union, scores = union[m], scores[m]
            heap: list = []
            for i in bm25.topk_indices(scores, union, k):
                _heap_push(heap, k, float(scores[i]), int(union[i]))
            out.append([(s, -negd) for s, negd in sorted(heap, reverse=True)])
        return out

    # ---------------------------------------------- query_string (multifield)
    def _qs_eval(
        self, node: dict, weights: dict[str, float], avgdl: dict[str, float],
        k1: float, b: float,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Compiled query_string node → (doc_ids sorted asc, scores) for this
        actor. Leaf score(doc) = Σ_f w_f·BM25_f accumulated field-major,
        ascending-term — the same order as search_batch and the
        MultiFieldOracle, so scores stay bit-identical. Bool algebra mirrors
        QueryShard._qs_eval (index/query.py)."""
        from .tombstones import in_sorted

        empty = (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64))
        kind = node["kind"]
        if kind == "none":
            return empty
        boost = node.get("boost", 1.0)
        if kind in ("term", "group"):
            terms = [node["term"]] if kind == "term" else node["terms"]
            idf_of = (
                (lambda f, t: node["idfs"].get(f))
                if kind == "term"
                else (lambda f, t: node["idfs"][f].get(t))
            )
            parts = []  # (f, t, ids, tfs, dls) in field-major, term-asc order
            for f in node["fields"]:
                for t in terms:
                    if idf_of(f, t) is None:
                        continue
                    for ri in range(len(self.readers[f])):
                        arrs = self._decoded(f, ri, t)
                        if arrs is not None:
                            parts.append((f, t, *arrs))
            if not parts:
                return empty
            union = np.unique(np.concatenate([p[2] for p in parts]))
            scores = np.zeros(len(union), dtype=np.float64)
            term_hit = {t: np.zeros(len(union), dtype=bool) for t in terms}
            for f, t, ids, tfs, dls in parts:
                pos = np.searchsorted(union, ids)
                scores[pos] += weights[f] * bm25.contribution(
                    idf_of(f, t), tfs, dls, avgdl[f], k1, b
                )
                term_hit[t][pos] = True
            msm = max(1, int(node.get("msm", 1)))
            if msm > 1:
                hits = np.sum([term_hit[t] for t in terms], axis=0)
                m = hits >= msm
                union, scores = union[m], scores[m]
            return union, (scores * boost if boost != 1.0 else scores)
        # bool
        must = [self._qs_eval(c, weights, avgdl, k1, b) for c in node["must"]]
        should = [self._qs_eval(c, weights, avgdl, k1, b) for c in node["should"]]
        if node["must"]:
            base = must[0][0]
            for ids, _ in must[1:]:
                base = np.intersect1d(base, ids, assume_unique=True)
        else:
            msm = max(1, int(node.get("msm", 1)))
            if not should:
                return empty
            union = np.unique(np.concatenate([ids for ids, _ in should]))
            hits = np.zeros(len(union), dtype=np.int32)
            for ids, _ in should:
                hits[np.searchsorted(union, ids)] += 1
            base = union[hits >= msm]
        if len(base) == 0:
            return empty
        if node["must"] and should and node.get("msm_explicit"):
            msm = max(1, int(node.get("msm", 1)))
            sh_hits = np.zeros(len(base), dtype=np.int32)
            for ids, _ in should:
                if len(ids):
                    sh_hits += in_sorted(base, ids)
            base = base[sh_hits >= msm]
            if len(base) == 0:
                return empty
        for c in node["must_not"]:
            ids_mn, _ = self._qs_eval(c, weights, avgdl, k1, b)
            if len(ids_mn):
                base = base[~in_sorted(base, ids_mn)]
                if len(base) == 0:
                    return empty
        scores = np.zeros(len(base), dtype=np.float64)
        for ids, sc in must + should:
            if len(ids) == 0:
                continue
            m = in_sorted(ids, base)
            if m.any():
                scores[np.searchsorted(base, ids[m])] += sc[m]
        return base, (scores * boost if boost != 1.0 else scores)

    def qs_eval_batch(
        self, trees: list[dict], k: int, weights: dict[str, float],
        avgdl: dict[str, float], k1: float, b: float,
    ) -> list[list[tuple[float, int]]]:
        out = []
        for tree in trees:
            ids, sc = self._qs_eval(tree, weights, avgdl, k1, b)
            if len(ids) == 0:
                out.append([])
            elif k > 0:
                top = bm25.topk_indices(sc, ids, k)
                out.append([(float(sc[i]), int(ids[i])) for i in top])
            else:
                out.append([(float(s), int(d)) for s, d in zip(sc, ids)])
        return out


class MultiFieldEngine:
    """Driver facade over per-field sub-indexes (mirrors QueryEngine's
    2-round scatter/gather; never calls ray.init)."""

    SHARD_CLS = MultiFieldShard  # subclasses (index/nested.py) swap the actor

    def __init__(self, index_dir: str, *, actor_num_cpus: float | None = None):
        with open(os.path.join(index_dir, "multifield.json")) as fh:
            self.weights: dict[str, float] = json.load(fh)["fields"]
        self.fields = sorted(self.weights)
        self.mans = {
            f: Manifest.load(os.path.join(index_dir, f"field_{f}")) for f in self.fields
        }
        cfg0 = self.mans[self.fields[0]].config
        for f in self.fields[1:]:
            c = self.mans[f].config
            if (c.analyzer, c.num_segments) != (cfg0.analyzer, cfg0.num_segments):
                raise ValueError("field sub-indexes must share analyzer and num_segments")
        self.analyzer = get_analyzer(cfg0.analyzer)
        self.k1, self.b = float(cfg0.k1), float(cfg0.b)
        self.N = {f: self.mans[f].n_docs for f in self.fields}
        self.avgdl = {f: self.mans[f].avgdl for f in self.fields}
        total = float(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4.0
        if actor_num_cpus is None:
            actor_num_cpus = max(0.01, min(0.25, (total * 0.5) / max(cfg0.num_segments, 1)))
        remote = ray.remote(num_cpus=actor_num_cpus)(type(self).SHARD_CLS)
        # group seg ids onto ≤ CPU actors; the SAME seg grouping for every
        # field keeps doc shards aligned within one actor
        seg_dirs = {
            f: [self.mans[f].segment_dirs(s) for s in range(cfg0.num_segments)]
            for f in self.fields
        }
        live = [s for s in range(cfg0.num_segments) if any(seg_dirs[f][s] for f in self.fields)]
        n_actors = max(1, min(len(live), int(total)))
        groups: list[dict[str, list[str]]] = [
            {f: [] for f in self.fields} for _ in range(n_actors)
        ]
        for i, s in enumerate(live):
            for f in self.fields:
                groups[i % n_actors][f].extend(seg_dirs[f][s])
        self._actors = [remote.remote(g) for g in groups]
        self._df_cache: dict[tuple[str, str], int] = {}

    def analyze(self, text: str) -> list[str]:
        return sorted(set(self.analyzer.analyze_query(text)))

    def _global_dfs(self, terms: list[str]) -> dict[str, dict[str, int]]:
        missing = [t for t in terms if (self.fields[0], t) not in self._df_cache]
        if missing:
            per = ray.get([a.dfs.remote(missing) for a in self._actors])
            for f in self.fields:
                sums = np.sum(np.array([p[f] for p in per], dtype=np.int64), axis=0)
                for t, v in zip(missing, sums):
                    self._df_cache[(f, t)] = int(v)
        return {f: {t: self._df_cache[(f, t)] for t in terms} for f in self.fields}

    def search(self, text: str, k: int = 10, mode: str = "or") -> list[tuple[int, float]]:
        return self.search_many([{"text": text, "mode": mode}], k=k)[0]

    def _ensure_combined_dls(self) -> None:
        if getattr(self, "_dls_loaded", False):
            return
        from .tombstones import _run_docmap_files

        files: dict[str, list[str]] = {}
        for f in self.fields:
            man = self.mans[f]
            lst: list[str] = []
            for _rid, r in man.complete_runs().items():
                lst.extend(_run_docmap_files(man, r))
            if not lst:
                raise ValueError(
                    "combined_fields needs per-field docmaps — rebuild the "
                    "multifield index (builds from this version write them)"
                )
            files[f] = lst
        nseg = self.mans[self.fields[0]].config.num_segments
        ray.get([a.load_combined_dls.remote(files, nseg) for a in self._actors])
        self._dls_loaded = True

    def combined_fields_search(
        self, text: str, k: int = 10, mode: str = "or"
    ) -> list[tuple[int, float]]:
        """ES combined_fields query (Lucene CombinedFieldQuery / Robertson's
        simple BM25F): score as if all fields were ONE field — per term,
        tf = Σ_f boost_f·tf_f, the norm uses dl = Σ_f boost_f·len_f, idf
        comes from the COMBINED df (docs with the term in ANY field), and
        avgdl = Σ_f boost_f·sum_dl_f / N. This is term-centric (unlike the
        field-centric weighted-sum search_many / dis_max best_fields): a
        term's occurrences pool across fields BEFORE saturation, so
        cross-field redundancy saturates like within-field redundancy.
        Two scatters: combined df partials, then local top-k."""
        terms = self.analyze(text)
        if not terms:
            return []
        self._ensure_combined_dls()
        per = ray.get([a.combined_dfs.remote(terms) for a in self._actors])
        dfc = np.sum(np.array(per, dtype=np.int64), axis=0)
        live = [t for t, d in zip(terms, dfc.tolist()) if d > 0]
        if (mode == "and" and len(live) < len(terms)) or not live:
            return []
        N = self.N[self.fields[0]]
        idfs = {t: float(bm25.idf(N, d)) for t, d in zip(terms, dfc.tolist()) if d > 0}
        sum_dl_c = 0.0
        for f in self.fields:  # sorted-field accumulation order
            sum_dl_c += self.weights[f] * self.mans[f].sum_dl
        avgdl = sum_dl_c / N
        per = ray.get(
            [
                a.combined_topk.remote(
                    live, idfs, avgdl, self.weights, k, mode, self.k1, self.b
                )
                for a in self._actors
            ]
        )
        cand = [c for p in per for c in p]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        top = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in top]

    def search_many(self, queries: list[dict], k: int = 10) -> list[list[tuple[int, float]]]:
        all_terms = sorted({t for q in queries for t in self.analyze(q["text"])})
        df = self._global_dfs(all_terms)
        prepared = []
        for q in queries:
            terms_all = self.analyze(q["text"])
            # a term participates if ANY field has it; "and" = every term in
            # at least one field (ES cross_fields-style semantics)
            terms = [t for t in terms_all if any(df[f][t] > 0 for f in self.fields)]
            mode = q.get("mode", "or")
            if mode == "and" and len(terms) < len(terms_all):
                terms = []
            idfs = {
                f: {t: float(bm25.idf(self.N[f], df[f][t])) for t in terms}
                for f in self.fields
            }
            prepared.append(
                {"terms": terms, "idfs": idfs, "avgdl": self.avgdl, "k": k,
                 "mode": mode, "weights": self.weights, "k1": self.k1, "b": self.b}
            )
        shard_results = ray.get([a.search_batch.remote(prepared) for a in self._actors])
        out = []
        for qi in range(len(queries)):
            cand = [c for sr in shard_results for c in sr[qi]]
            if not cand:
                out.append([])
                continue
            scores = np.array([c[0] for c in cand], dtype=np.float64)
            docs = np.array([c[1] for c in cand], dtype=np.uint64)
            top = bm25.topk_indices(scores, docs, k)
            out.append([(int(docs[i]), float(scores[i])) for i in top])
        return out

    def _compile_qs(self, node, df: dict[str, dict[str, int]], default_operator: str):
        """Syntax tree → multifield evaluation tree: every term leaf carries
        per-field idfs (only fields where df>0); a `field:term` prefix
        restricts the leaf to that one field (the ES query_string `fields`
        override). Drop/none rules mirror querystring.compile_tree."""
        from . import querystring as qs

        if isinstance(node, qs.Leaf):
            f, body = qs.split_field(node.text)
            fields = [f] if f is not None else self.fields
            toks = list(dict.fromkeys(self.analyzer.analyze_query(body)))
            if not toks:
                return {"kind": "none"}
            live = [t for t in toks if any(df[g][t] > 0 for g in fields)]
            if not live or (default_operator == "and" and len(live) < len(toks)):
                return {"kind": "none"}
            def idfs_for(t):
                return {
                    g: float(bm25.idf(self.N[g], df[g][t]))
                    for g in fields if df[g][t] > 0
                }
            if len(live) == 1:
                return {"kind": "term", "term": live[0], "fields": fields,
                        "idfs": idfs_for(live[0]), "boost": node.boost}
            terms = sorted(live)
            return {
                "kind": "group", "terms": terms, "fields": fields,
                "idfs": {g: {t: float(bm25.idf(self.N[g], df[g][t]))
                             for t in terms if df[g][t] > 0}
                         for g in fields},
                "msm": len(terms) if default_operator == "and" else 1,
                "boost": node.boost,
            }
        out = {"kind": "bool", "must": [], "should": [], "must_not": [],
               "msm": 1, "boost": node.boost}
        had_positive = False
        for occur, child in node.clauses:
            c = self._compile_qs(child, df, default_operator)
            if occur != "must_not":
                had_positive = True
            if c["kind"] == "none":
                if occur == "must":
                    return {"kind": "none"}
                continue
            out[occur].append(c)
        if not had_positive:
            raise ValueError("purely negative query (only must_not clauses) is not supported")
        if not out["must"] and not out["should"]:
            return {"kind": "none"}
        return out

    def query_string(
        self,
        q: str,
        *,
        k: int = 10,
        default_operator: str = "or",
        minimum_should_match: int | None = None,
    ) -> list[tuple[int, float]]:
        """Lucene query_string over ALL fields at once (term/boolean subset):
        an unprefixed term scores Σ_f w_f·BM25_f across every field;
        ``field:term`` restricts a leaf to one field. AND/OR/NOT, +/-,
        parens, ^boosts and minimum_should_match work exactly as on
        QueryEngine.query_string; phrases / wildcards / fuzzy / ranges need
        per-field positional or doc-value machinery this engine does not
        hold — use the single-field QueryEngine for those."""
        from . import querystring as qs

        tree = qs.parse(q, default_operator)
        leaves = qs.collect_leaves(tree)
        for lf in leaves:
            if lf.kind != "term":
                raise ValueError(
                    f"multifield query_string supports term/boolean clauses only "
                    f"(got {lf.kind}: {lf.text!r}); use the single-field "
                    f"QueryEngine for phrases/wildcards/fuzzy/ranges"
                )
            f, _ = qs.split_field(lf.text)
            if f is not None and f not in self.weights:
                raise ValueError(f"unknown field {f!r}; fields: {self.fields}")
        all_terms = sorted({
            t for lf in leaves
            for t in self.analyzer.analyze_query(qs.split_field(lf.text)[1])
        })
        df = self._global_dfs(all_terms)
        compiled = self._compile_qs(tree, df, default_operator)
        if compiled["kind"] == "none":
            return []
        if minimum_should_match is not None:
            if compiled["kind"] != "bool":
                compiled = {"kind": "bool", "must": [], "should": [compiled],
                            "must_not": [], "msm": 1, "boost": 1.0}
            compiled["msm"] = int(minimum_should_match)
            compiled["msm_explicit"] = True
        shard_results = ray.get([
            a.qs_eval_batch.remote(
                [compiled], k, self.weights, self.avgdl, self.k1, self.b
            )
            for a in self._actors
        ])
        cand = [c for sr in shard_results for c in sr[0]]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        if k <= 0:
            order = np.argsort(docs)
            return [(int(docs[i]), float(scores[i])) for i in order]
        top = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in top]

    def close(self) -> None:
        for a in self._actors:
            ray.kill(a)
        self._actors = []
