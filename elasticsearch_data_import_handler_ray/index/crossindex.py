"""Cross-index search (the ES multi-index target: ``GET /idx1,idx2/_search``).

ES's default ``query_then_fetch`` scores each shard with ITS index's local
statistics, so the same query scores a doc differently depending on which
index holds it; the fix ES offers is ``dfs_query_then_fetch`` — collect the
GLOBAL term/document statistics across every target index first, then score
every shard with the combined numbers. This module implements that
semantics exactly: because BM25 depends only on (N, df, avgdl) globally and
dl per doc (index-local either way), a cross-index search here is
score-identical to a SINGLE index built over the union corpus — which is
what the ``multi_index_search`` registry entry's DuckDB oracle checks.

Execution shape: ONE df round across every target's shard actors (each
engine's cached global_dfs), combine on the driver, embed combined idfs +
avgdl in the prepared query dicts (shards score purely from the dict — the
same contract search_many uses), ONE scatter over the UNION of all targets'
actors, heap-merge. Cost is identical to searching each index once; no
index is rebuilt, nothing is copied.

Duplicate docs: like ES, a doc present in several target indices is
returned once per index that holds it (hits are per-index).
"""

from __future__ import annotations

import numpy as np

from ..functions import bm25
from .query import QueryEngine

__all__ = ["MultiIndexEngine"]


class MultiIndexEngine:
    """dfs_query_then_fetch over several indices built with the SAME
    analyzer and BM25 parameters (validated — ES would silently blend
    incompatible analyzers; we refuse)."""

    def __init__(self, index_dirs: list[str], **engine_kwargs):
        if not index_dirs:
            raise ValueError("MultiIndexEngine needs at least one index")
        self.engines = [QueryEngine(d, **engine_kwargs) for d in index_dirs]
        head = self.engines[0]
        for e in self.engines[1:]:
            if e.man.config.analyzer != head.man.config.analyzer:
                raise ValueError(
                    "cross-index search needs one analyzer everywhere: "
                    f"{e.man.config.analyzer!r} != {head.man.config.analyzer!r}"
                )
            if (e.k1, e.b) != (head.k1, head.b):
                raise ValueError("cross-index search needs identical k1/b")
        self.analyzer = head.analyzer
        self.k1, self.b = head.k1, head.b
        # combined statistics — exact integer sums, so avgdl equals the
        # union-corpus division bit-for-bit
        self.N = sum(e.N for e in self.engines)
        self.sum_dl = sum(e.sum_dl for e in self.engines)
        self.avgdl = (self.sum_dl / self.N) if self.N else 0.0

    def analyze(self, text: str) -> list[str]:
        return sorted(set(self.analyzer.analyze_query(text)))

    def global_dfs(self, terms: list[str]) -> np.ndarray:
        """Combined df per term: the dfs_query_then_fetch statistics round
        (each engine answers from its driver df cache — shards disjoint
        within an engine, indices disjoint from each other's actors)."""
        out = np.zeros(len(terms), dtype=np.int64)
        for e in self.engines:
            out += e.global_dfs(terms)
        return out

    def search(
        self, text: str, k: int = 10, mode: str = "or", method: str = "auto"
    ) -> list[tuple[int, float]]:
        """BM25 top-k across every target index with COMBINED statistics —
        score-identical to a single index over the union corpus. Modes
        or/and (phrase additionally needs every target positional)."""
        terms_all = self.analyze(text)
        dfs = self.global_dfs(terms_all)
        df_map = dict(zip(terms_all, dfs.tolist()))
        terms = [t for t in terms_all if df_map[t] > 0]
        if mode == "and" and len(terms) < len(terms_all):
            terms = []  # a required unknown term matches nothing anywhere
        phrase: list[str] = []
        if mode == "phrase":
            if not all(e.man.config.positions for e in self.engines):
                raise ValueError("cross-index phrase needs every target positional")
            phrase = self.analyzer.analyze_query(text)
            if any(df_map.get(t, 0) == 0 for t in phrase):
                terms = []
        if not terms:
            return []
        idfs = {t: float(bm25.idf(self.N, df_map[t])) for t in terms}
        n_actors = sum(len(e._actors) for e in self.engines)
        q_method = method
        if method == "auto":
            per_shard = sum(df_map[t] for t in terms) / max(n_actors, 1)
            max_density = max((df_map[t] / max(self.N, 1) for t in terms), default=0.0)
            q_method = (
                "bmw"
                if per_shard >= QueryEngine.AUTO_EXHAUSTIVE_PER_SHARD
                and max_density < 0.10
                else "exhaustive"
            )
        prepared = [{
            "terms": terms, "idfs": idfs, "avgdl": self.avgdl, "k": k,
            "mode": mode, "method": q_method, "k1": self.k1, "b": self.b,
            "phrase": phrase, "exclude_terms": [], "slop": 0,
            "filters": None, "after": None, "allowed_ids": None,
            "must_terms": None, "min_should_match": None,
        }]
        import ray

        shard_results = ray.get(
            [a.search_batch.remote(prepared) for e in self.engines for a in e._actors]
        )
        cand = [c for sr in shard_results for c in sr[0]]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        top = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in top]

    def count(self, text: str, *, mode: str = "or") -> int:
        """Total matching docs across every target index."""
        terms_all = self.analyze(text)
        dfs = self.global_dfs(terms_all)
        live = [t for t, d in zip(terms_all, dfs.tolist()) if d > 0]
        if mode == "and" and len(live) < len(terms_all):
            return 0
        if not live:
            return 0
        return sum(e.count(text, mode=mode) for e in self.engines)

    def close(self) -> None:
        for e in self.engines:
            e.close()
