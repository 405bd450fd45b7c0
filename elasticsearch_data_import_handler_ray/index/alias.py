"""Multi-index search — the ES index-alias analogue (one query surface over
several immutable indexes).

ES lets an alias span indices; a search over the alias scores documents with
CLUSTER-GLOBAL statistics. This repo's QueryEngine already computes idf and
avgdl on the DRIVER and ships them inside each prepared query, so an alias
engine only has to blend the driver-side statistics and scatter to the UNION
of the member indexes' shard actors — the per-actor scoring code is untouched
and every QueryEngine method that follows the scatter/merge pattern (search,
count, suggest, facets, stats, highlight, …) works across the alias as-is.

Exactness contract (pinned in tests/test_alias.py): searching an alias over
indexes A and B is rank- AND score-BIT-IDENTICAL to searching one index built
over A∪B's corpus, because N = N_A + N_B, df(t) = df_A(t) + df_B(t) and
avgdl = (Σdl_A + Σdl_B) / N are integer sums before a single float divide.

Member indexes must agree on analyzer and BM25 parameters (enforced); doc ids
must be disjoint (the content-hash id scheme gives this for disjoint corpora,
and the same invariant already governs segment merging)."""

from __future__ import annotations

from dataclasses import replace

from .query import QueryEngine
from .tombstones import find_superseded  # noqa: F401  (re-export convenience)


class MultiIndexEngine(QueryEngine):
    """QueryEngine facade over several index directories (an ES alias).

    Reuses every driver-side method of QueryEngine; only the constructor
    differs (blend statistics, concatenate the members' actor pools).
    """

    def __init__(
        self,
        index_dirs: list[str],
        *,
        actor_num_cpus: float | None = None,
        df_preload: str = "auto",
    ):
        if not index_dirs:
            raise ValueError("MultiIndexEngine needs at least one index dir")
        self.engines = [
            QueryEngine(d, actor_num_cpus=actor_num_cpus, df_preload=df_preload)
            for d in index_dirs
        ]
        heads = {
            (e.man.config.analyzer, float(e.k1), float(e.b)) for e in self.engines
        }
        if len(heads) > 1:
            for e in self.engines:
                e.close()
            raise ValueError(
                f"alias members disagree on analyzer/k1/b: {sorted(heads)}"
            )
        first = self.engines[0]
        self.analyzer = first.analyzer
        # manifest shim: config surface only (phrase mode checks .positions —
        # an alias is positional iff EVERY member is)
        self.man = type(first.man).__new__(type(first.man))
        self.man.__dict__.update(first.man.__dict__)
        self.man.config = replace(
            first.man.config,
            positions=all(e.man.config.positions for e in self.engines),
        )
        self.N = sum(e.N for e in self.engines)
        # exact integer sums (QueryEngine.sum_dl is tombstone-corrected), so
        # the blended avgdl equals the union-corpus division bit-for-bit
        self.sum_dl = sum(e.sum_dl for e in self.engines)
        self.avgdl = (self.sum_dl / self.N) if self.N else 0.0
        self.k1, self.b = first.k1, first.b
        self._tomb = {}
        self._actors = [a for e in self.engines for a in e._actors]
        self._df_cache: dict[str, int] = {}
        self._df_complete = all(e._df_complete for e in self.engines)
        if self._df_complete:
            for e in self.engines:
                for t, d in e._df_cache.items():
                    self._df_cache[t] = self._df_cache.get(t, 0) + d

    def _ensure_doc_values(self, fields: list[str]) -> None:
        # each member loads ITS OWN docmaps into ITS OWN actors (the base
        # implementation would ship the first member's docmap everywhere)
        for e in self.engines:
            e._ensure_doc_values(fields)

    def resolve(self, doc_ids: list[int]):
        import pandas as pd

        return pd.concat(
            [e.resolve(doc_ids) for e in self.engines], ignore_index=True
        )

    def close(self) -> None:
        for e in self.engines:
            e.close()
        self._actors = []
