"""Naive exact BM25 oracle (SURVEY.md §5.2 item 3).

Scores EVERY matching document with no index, no pruning, no Ray — the
correctness target for the distributed engine. Rank identity (BASELINE.json:2)
demands bit-identical float sequences, so the oracle shares the analyzer
(functions/analysis.py) and the scoring kernels (functions/bm25.py) with the
engine, and accumulates per-document contributions in the same
ascending-unique-term order the engine uses.

Definitions shared with the engine:
  * N = number of documents with >= 1 token
  * avgdl = sum(doc_len) / N  (float64)
  * duplicate query terms are collapsed (unique, sorted)
  * ties in top-k broken by ascending doc_id
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import bm25
from ..functions.analysis import Analyzer, term_frequencies


class BM25Oracle:
    def __init__(
        self,
        analyzer: Analyzer,
        doc_ids: np.ndarray,
        content: pa.Array,
        k1: float = bm25.K1,
        b: float = bm25.B,
    ):
        """doc_ids: uint64 per row; content: Arrow string array (same length).
        ``k1``/``b`` mirror IndexConfig so custom-parameter indexes verify too."""
        self.k1, self.b = float(k1), float(b)
        postings, doclens = term_frequencies(
            analyzer, pa.array(doc_ids, type=pa.uint64()), content
        )
        self.analyzer = analyzer
        # per-term postings dict: term -> (doc_ids sorted, tfs)
        terms = postings["term"].to_numpy(zero_copy_only=False)
        p_doc = postings["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p_tf = postings["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((p_doc, terms))
        terms, p_doc, p_tf = terms[order], p_doc[order], p_tf[order]
        uniq, starts = np.unique(terms, return_index=True)
        bounds = np.append(starts, len(terms))
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {
            t: (p_doc[s:e], p_tf[s:e]) for t, s, e in zip(uniq, bounds[:-1], bounds[1:])
        }
        d_ids = doclens["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d_len = doclens["doc_len"].to_numpy(zero_copy_only=False).astype(np.uint64)
        o = np.argsort(d_ids)
        self.all_docs = d_ids[o]  # sorted; docs with >=1 token
        self.doc_lens = d_len[o]
        self.N = len(self.all_docs)
        self.avgdl = float(self.doc_lens.sum()) / self.N if self.N else 0.0

    def df(self, term: str) -> int:
        p = self.postings.get(term)
        return 0 if p is None else len(p[0])

    def search(
        self,
        text: str,
        k: int = 10,
        mode: str = "or",
        exclude: str | None = None,
        min_should_match: int | None = None,
    ) -> list[tuple[int, float]]:
        terms_all = sorted(set(self.analyzer.analyze_query(text)))
        terms = [t for t in terms_all if t in self.postings]
        if mode == "and" and len(terms) < len(terms_all):
            return []  # AND with an unknown term matches nothing
        if not terms:
            return []
        scores = np.zeros(self.N, dtype=np.float64)
        hits = np.zeros(self.N, dtype=np.int32)
        for t in terms:  # ascending-term accumulation order (shared w/ engine)
            ids, tfs = self.postings[t]
            pos = np.searchsorted(self.all_docs, ids)
            dls = self.doc_lens[pos]
            scores[pos] += bm25.contribution(
                bm25.idf(self.N, len(ids)), tfs, dls, self.avgdl, self.k1, self.b
            )
            hits[pos] += 1
        if mode == "and":
            mask = hits == len(terms)
        elif min_should_match and min_should_match > 1:
            mask = hits >= min_should_match
        else:
            mask = hits > 0
        if exclude:
            for t in sorted(set(self.analyzer.analyze_query(exclude))):
                p = self.postings.get(t)
                if p is not None:
                    mask &= ~np.isin(self.all_docs, p[0], assume_unique=True)
        cand_scores = scores[mask]
        cand_docs = self.all_docs[mask]
        top = bm25.topk_indices(cand_scores, cand_docs, k)
        return [(int(cand_docs[i]), float(cand_scores[i])) for i in top]

    def search_bool(
        self,
        *,
        must: str = "",
        should: str = "",
        must_not: str = "",
        minimum_should_match: int = 0,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """Naive mirror of QueryEngine.bool_search: all must terms + ≥ msm
        should terms + no must_not terms; score = BM25 sum of matching
        must+should clauses in ascending-term order (bit-identical)."""
        must_terms = sorted(set(self.analyzer.analyze_query(must))) if must else []
        should_terms = [
            t
            for t in (sorted(set(self.analyzer.analyze_query(should))) if should else [])
            if t not in set(must_terms)
        ]
        if any(t not in self.postings for t in must_terms):
            return []
        live_should = [t for t in should_terms if t in self.postings]
        if minimum_should_match > len(live_should):
            return []
        terms = sorted(set(must_terms) | set(live_should))
        if not terms:
            return []
        must_set = set(must_terms)
        scores = np.zeros(self.N, dtype=np.float64)
        hits_m = np.zeros(self.N, dtype=np.int32)
        hits_s = np.zeros(self.N, dtype=np.int32)
        for t in terms:
            ids, tfs = self.postings[t]
            pos = np.searchsorted(self.all_docs, ids)
            scores[pos] += bm25.contribution(
                bm25.idf(self.N, len(ids)), tfs, self.doc_lens[pos],
                self.avgdl, self.k1, self.b,
            )
            (hits_m if t in must_set else hits_s)[pos] += 1
        mask = hits_m == len(must_set)
        if minimum_should_match:
            mask &= hits_s >= minimum_should_match
        elif not must_set:
            mask &= hits_s > 0
        if must_not:
            for t in sorted(set(self.analyzer.analyze_query(must_not))):
                p = self.postings.get(t)
                if p is not None:
                    mask &= ~np.isin(self.all_docs, p[0], assume_unique=True)
        cand_scores, cand_docs = scores[mask], self.all_docs[mask]
        top = bm25.topk_indices(cand_scores, cand_docs, k)
        return [(int(cand_docs[i]), float(cand_scores[i])) for i in top]

    def search_synonyms(
        self, text: str, synonyms: list[list[str]], k: int = 10, mode: str = "or"
    ) -> list[tuple[int, float]]:
        """Naive mirror of QueryEngine.search_synonyms (Lucene SynonymQuery):
        per group, member postings merge (tf summed before tf-norm), idf =
        idf(N, max member df); ascending-group accumulation order matches the
        engine so scores are bit-identical."""
        gmap: dict[str, tuple[str, ...]] = {}
        for grp in synonyms:
            members = sorted(
                {m for tok in grp for m in self.analyzer.analyze_query(tok)}
            )
            if members:
                g = tuple(members)
                for m in members:
                    gmap[m] = g
        toks = sorted(set(self.analyzer.analyze_query(text)))
        if not toks:
            return []
        groups = sorted({gmap.get(t, (t,)) for t in toks})
        live = [(g, max(self.df(m) for m in g)) for g in groups]
        live = [(g, d) for g, d in live if d > 0]
        if not live or (mode == "and" and len(live) < len(groups)):
            return []
        merged = []
        for g, df_b in live:
            parts = [self.postings[m] for m in g if m in self.postings]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            order = np.argsort(ids, kind="stable")
            ids, tfs = ids[order], tfs[order]
            uniq, start = np.unique(ids, return_index=True)
            merged.append((uniq, np.add.reduceat(tfs, start), df_b))
        union = np.unique(np.concatenate([m[0] for m in merged]))
        scores = np.zeros(len(union), dtype=np.float64)
        hits = np.zeros(len(union), dtype=np.int32)
        for ids, tfs, df_b in merged:
            dls = self.doc_lens[np.searchsorted(self.all_docs, ids)]
            pos = np.searchsorted(union, ids)
            scores[pos] += bm25.contribution(
                bm25.idf(self.N, df_b), tfs, dls, self.avgdl, self.k1, self.b
            )
            hits[pos] += 1
        if mode == "and":
            m = hits == len(live)
            union, scores = union[m], scores[m]
        top = bm25.topk_indices(scores, union, k)
        return [(int(union[i]), float(scores[i])) for i in top]

    def search_prefix(
        self, text: str, k: int = 10, max_expansions: int = 50
    ) -> list[tuple[int, float]]:
        """Mirror of QueryEngine.search_prefix: last analyzed token expands
        to the first max_expansions dictionary terms (lexicographic)."""
        toks = self.analyzer.analyze_query(text)
        if not toks:
            return []
        prefix, rest = toks[-1], toks[:-1]
        expanded = sorted(t for t in self.postings if t.startswith(prefix))[:max_expansions]
        return self._score_or(sorted(set(rest) | set(expanded)), k)

    def _score_or(
        self, terms: list[str], k: int, min_should_match: int | None = None
    ) -> list[tuple[int, float]]:
        """OR-score an explicit term list (ascending-term accumulation order,
        shared with the engine's terms_override path)."""
        terms = [t for t in terms if t in self.postings]
        if not terms:
            return []
        scores = np.zeros(self.N, dtype=np.float64)
        hits = np.zeros(self.N, dtype=np.int32)
        for t in terms:
            ids, tfs = self.postings[t]
            pos = np.searchsorted(self.all_docs, ids)
            scores[pos] += bm25.contribution(
                bm25.idf(self.N, len(ids)), tfs, self.doc_lens[pos], self.avgdl, self.k1, self.b
            )
            hits[pos] += 1
        mask = hits >= (min_should_match if min_should_match else 1)
        top = bm25.topk_indices(scores[mask], self.all_docs[mask], k)
        return [(int(self.all_docs[mask][i]), float(scores[mask][i])) for i in top]

    def search_wildcard(
        self, pattern: str, k: int = 10, max_expansions: int = 50
    ) -> list[tuple[int, float]]:
        """Mirror of QueryEngine.search_wildcard: regex-translate the
        pattern, expand over the full vocabulary, OR-score the capped union."""
        import re

        pattern = pattern.lower()
        rx = re.compile(
            "".join(".*" if c == "*" else "." if c == "?" else re.escape(c) for c in pattern)
        )
        expanded = sorted(t for t in self.postings if rx.fullmatch(t))[:max_expansions]
        return self._score_or(expanded, k)

    def search_regexp(
        self, pattern: str, k: int = 10, max_expansions: int = 50
    ) -> list[tuple[int, float]]:
        """Mirror of QueryEngine.search_regexp: anchored full-match over the
        full vocabulary, OR-score the capped union."""
        import re

        rx = re.compile("(?:" + pattern.lower() + ")")
        expanded = sorted(t for t in self.postings if rx.fullmatch(t))[:max_expansions]
        return self._score_or(expanded, k)

    def more_like_this(
        self,
        text: str,
        k: int = 10,
        *,
        max_query_terms: int = 25,
        min_term_freq: int = 1,
        min_doc_freq: int = 1,
        msm_pct: float = 0.3,
    ) -> list[tuple[int, float]]:
        """Mirror of QueryEngine.more_like_this (like = text): tf·idf term
        selection then an OR query with minimum_should_match."""
        from collections import Counter

        tf = Counter(self.analyzer.analyze_query(text))
        cand = [
            (t, n * float(bm25.idf(self.N, self.df(t))))
            for t, n in sorted(tf.items())
            if n >= min_term_freq and self.df(t) >= max(min_doc_freq, 1)
        ]
        cand.sort(key=lambda ts: (-ts[1], ts[0]))
        selected = sorted(t for t, _ in cand[:max_query_terms])
        if not selected:
            return []
        msm = max(1, int(len(selected) * msm_pct))
        return self._score_or(selected, k, min_should_match=msm)

    def search_fuzzy(
        self, text: str, k: int = 10, max_edits: int = 1, max_expansions: int = 50
    ) -> list[tuple[int, float]]:
        """Mirror of QueryEngine.search_fuzzy: reference (scalar-Python)
        Levenshtein over the full vocabulary for the last token."""

        def lev(a: str, b: str) -> int:
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
                    prev, dp[j] = dp[j], cur
            return dp[-1]

        toks = self.analyzer.analyze_query(text)
        if not toks:
            return []
        fuzz, rest = toks[-1], toks[:-1]
        expanded = sorted(
            t for t in self.postings
            if abs(len(t) - len(fuzz)) <= max_edits and lev(t, fuzz) <= max_edits
        )[:max_expansions]
        return self._score_or(sorted(set(rest) | set(expanded)), k)

    def match_docs(self, text: str, mode: str = "or") -> np.ndarray:
        """ALL doc ids matching the analyzed query (facet oracle)."""
        terms_all = sorted(set(self.analyzer.analyze_query(text)))
        terms = [t for t in terms_all if t in self.postings]
        if not terms or (mode == "and" and len(terms) < len(terms_all)):
            return np.empty(0, dtype=np.uint64)
        hits = np.zeros(self.N, dtype=np.int32)
        for t in terms:
            ids, _ = self.postings[t]
            hits[np.searchsorted(self.all_docs, ids)] += 1
        mask = hits == len(terms) if mode == "and" else hits > 0
        return self.all_docs[mask]


class MultiFieldOracle:
    """Naive exact cross-field scorer: score(doc) = Σ_f w_f · BM25_f(doc),
    each field with its own df/N/avgdl. Accumulates field-major (sorted field
    names), ascending terms — the exact order MultiFieldShard uses, so scores
    are bit-identical."""

    def __init__(self, field_oracles: dict[str, BM25Oracle], weights: dict[str, float]):
        self.fields = sorted(field_oracles)
        self.oracles = field_oracles
        self.weights = {f: float(weights[f]) for f in self.fields}
        self.analyzer = field_oracles[self.fields[0]].analyzer

    def search(self, text: str, k: int = 10, mode: str = "or") -> list[tuple[int, float]]:
        terms_all = sorted(set(self.analyzer.analyze_query(text)))
        terms = [
            t for t in terms_all if any(t in self.oracles[f].postings for f in self.fields)
        ]
        if mode == "and" and len(terms) < len(terms_all):
            return []
        if not terms:
            return []
        id_arrays = [
            self.oracles[f].postings[t][0]
            for f in self.fields
            for t in terms
            if t in self.oracles[f].postings
        ]
        union = np.unique(np.concatenate(id_arrays))
        scores = np.zeros(len(union), dtype=np.float64)
        term_hit = {t: np.zeros(len(union), dtype=bool) for t in terms}
        for f in self.fields:
            o = self.oracles[f]
            for t in terms:
                p = o.postings.get(t)
                if p is None:
                    continue
                ids, tfs = p
                pos = np.searchsorted(union, ids)
                dls = o.doc_lens[np.searchsorted(o.all_docs, ids)]
                scores[pos] += self.weights[f] * bm25.contribution(
                    bm25.idf(o.N, len(ids)), tfs, dls, o.avgdl, o.k1, o.b
                )
                term_hit[t][pos] = True
        if mode == "and":
            m = np.logical_and.reduce([term_hit[t] for t in terms])
            union, scores = union[m], scores[m]
        top = bm25.topk_indices(scores, union, k)
        return [(int(union[i]), float(scores[i])) for i in top]


class PhraseOracle(BM25Oracle):
    """Naive phrase-search oracle: keeps every doc's analyzed token list and
    matches phrases by a literal Python sliding-window scan — the slow,
    obviously-correct target for the positional index's phrase mode.
    Scoring mirrors the engine exactly: BM25 over the phrase's unique terms in
    ascending order (same float64 kernel calls → bit-identical scores)."""

    def __init__(self, analyzer, doc_ids, content, k1: float = bm25.K1, b: float = bm25.B):
        super().__init__(analyzer, doc_ids, content, k1=k1, b=b)
        tok_list = analyzer.tokens_of(content)
        self.doc_tokens: dict[int, list[str]] = {}
        ids = np.asarray(doc_ids, dtype=np.uint64)
        for d, toks in zip(ids, tok_list.to_pylist()):
            self.doc_tokens[int(d)] = [t for t in (toks or []) if t]

    @staticmethod
    def _sloppy_doc_match(toks: list[str], phrase: list[str], slop: int) -> bool:
        """Brute-force ES slop semantics (the independent formulation the
        engine's greedy window matcher is pinned against): enumerate EVERY
        injective assignment of token occurrences to phrase slots and accept
        if any has adjusted-position span (max(p_i - i) - min(p_i - i)) ≤ slop.
        Exponential on purpose — obviously correct, test-scale only."""
        import itertools

        pos_lists = [
            [p for p, tok in enumerate(toks) if tok == phrase[i]]
            for i in range(len(phrase))
        ]
        if any(not pl for pl in pos_lists):
            return False
        for combo in itertools.product(*pos_lists):
            if len(set(combo)) < len(combo):
                continue  # one occurrence cannot fill two slots
            adj = [p - i for i, p in enumerate(combo)]
            if max(adj) - min(adj) <= slop:
                return True
        return False

    def search_phrase(
        self, text: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        return self.search_phrase_tokens(self.analyzer.analyze_query(text), k=k, slop=slop)

    def search_phrase_prefix(
        self, text: str, k: int = 10, *, max_expansions: int = 50, slop: int = 0
    ) -> list[tuple[int, float]]:
        """Naive mirror of QueryEngine.search_phrase_prefix: full-vocabulary
        prefix expansion (lexicographic, capped identically), best completing
        expansion's phrase score per doc."""
        toks = self.analyzer.analyze_query(text)
        if not toks:
            return []
        prefix, base = toks[-1], toks[:-1]
        expansions = sorted(t for t in self.postings if t.startswith(prefix))[
            :max_expansions
        ]
        best: dict[int, float] = {}
        for e in expansions:
            for d, s in self.search_phrase_tokens(base + [e], k=10**9, slop=slop):
                if s > best.get(d, float("-inf")):
                    best[d] = s
        top = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(int(d), float(s)) for d, s in top]

    def search_phrase_tokens(
        self, phrase: list[str], k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        if not phrase:
            return []
        uniq = sorted(set(phrase))
        if any(t not in self.postings for t in uniq):
            return []
        n = len(phrase)
        if slop > 0:
            match = lambda toks: self._sloppy_doc_match(toks, phrase, slop)
        else:
            match = lambda toks: any(
                toks[i : i + n] == phrase for i in range(len(toks) - n + 1)
            )
        matched = np.array(
            sorted(d for d, toks in self.doc_tokens.items() if match(toks)),
            dtype=np.uint64,
        )
        if len(matched) == 0:
            return []
        scores = np.zeros(len(matched), dtype=np.float64)
        dl_pos = np.searchsorted(self.all_docs, matched)
        dls = self.doc_lens[dl_pos]
        for t in uniq:
            ids, tfs = self.postings[t]
            sel = np.searchsorted(ids, matched)
            scores += bm25.contribution(
                bm25.idf(self.N, len(ids)), tfs[sel], dls, self.avgdl, self.k1, self.b
            )
        top = bm25.topk_indices(scores, matched, k)
        return [(int(matched[i]), float(scores[i])) for i in top]


def _qs_oracle_node(oracle, node: dict) -> tuple[np.ndarray, np.ndarray]:
    """Naive mirror of QueryShard._qs_eval over the WHOLE corpus (no shards,
    no index): evaluate one compiled query_string node (index/querystring.py)
    → (doc_ids sorted asc, scores). Shares the compiled tree's embedded idfs
    and the engine's accumulation order (must then should in written order,
    leaf groups ascending-term) so scores are bit-identical."""
    empty = (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64))
    kind = node["kind"]
    boost = node.get("boost", 1.0)
    if kind == "none":
        return empty
    if kind == "range":
        # constant-score filter leaf; values come from ``oracle.qs_doc_values``
        # (tests attach {field: (sorted ids, aligned vals)}) with doc_len
        # falling back to the oracle's own lengths
        dv = getattr(oracle, "qs_doc_values", {}).get(node["field"])
        if dv is None and node["field"] == "doc_len":
            dv = (oracle.all_docs, oracle.doc_lens)
        if dv is None:
            raise KeyError(f"oracle has no doc-values for {node['field']!r}")
        ids, vals = dv
        keep = np.ones(len(ids), dtype=bool)
        if node["lo"] is None and node["hi"] is None:
            import pandas as pd

            keep &= np.asarray(pd.notna(vals))
        if node["lo"] is not None:
            keep &= (vals >= node["lo"]) if node["lo_incl"] else (vals > node["lo"])
        if node["hi"] is not None:
            keep &= (vals <= node["hi"]) if node["hi_incl"] else (vals < node["hi"])
        out = np.asarray(ids)[keep]
        return out, np.full(len(out), float(boost), dtype=np.float64)
    if kind == "term":
        p = oracle.postings.get(node["term"])
        if p is None:
            return empty
        ids, tfs = p
        dls = oracle.doc_lens[np.searchsorted(oracle.all_docs, ids)]
        sc = bm25.contribution(node["idf"], tfs, dls, oracle.avgdl, oracle.k1, oracle.b)
        return ids, (sc * boost if boost != 1.0 else sc)
    if kind == "group":
        per = [(t, *oracle.postings[t]) for t in node["terms"] if t in oracle.postings]
        msm = max(1, int(node.get("msm", 1)))
        if len(per) < msm:
            return empty
        union = np.unique(np.concatenate([ids for _, ids, _ in per]))
        scores = np.zeros(len(union), dtype=np.float64)
        hits = np.zeros(len(union), dtype=np.int32)
        dls_u = oracle.doc_lens[np.searchsorted(oracle.all_docs, union)]
        for t, ids, tfs in per:
            pos = np.searchsorted(union, ids)
            scores[pos] += bm25.contribution(
                node["idfs"][t], tfs, dls_u[pos], oracle.avgdl, oracle.k1, oracle.b
            )
            hits[pos] += 1
        if msm > 1:
            m = hits >= msm
            union, scores = union[m], scores[m]
        return union, (scores * boost if boost != 1.0 else scores)
    if kind == "phrase":
        phrase, slop = node["phrase"], int(node.get("slop", 0))
        doc_tokens = getattr(oracle, "doc_tokens", None)
        if doc_tokens is None:
            raise ValueError("phrase clauses need a PhraseOracle")
        n = len(phrase)
        if slop > 0:
            match = lambda toks: PhraseOracle._sloppy_doc_match(toks, phrase, slop)  # noqa: E731
        else:
            match = lambda toks: any(  # noqa: E731
                toks[i : i + n] == phrase for i in range(len(toks) - n + 1)
            )
        matched = np.array(
            sorted(d for d, toks in doc_tokens.items() if match(toks)), dtype=np.uint64
        )
        if len(matched) == 0:
            return empty
        scores = np.zeros(len(matched), dtype=np.float64)
        dls = oracle.doc_lens[np.searchsorted(oracle.all_docs, matched)]
        for t in sorted(set(phrase)):
            ids, tfs = oracle.postings[t]
            sel = np.searchsorted(ids, matched)
            scores += bm25.contribution(
                node["idfs"][t], tfs[sel], dls, oracle.avgdl, oracle.k1, oracle.b
            )
        return matched, (scores * boost if boost != 1.0 else scores)
    # bool
    must = [_qs_oracle_node(oracle, c) for c in node["must"]]
    should = [_qs_oracle_node(oracle, c) for c in node["should"]]
    if node["must"]:
        base = must[0][0]
        for ids, _ in must[1:]:
            base = np.intersect1d(base, ids, assume_unique=True)
    else:
        if not should:
            return empty
        msm = max(1, int(node.get("msm", 1)))
        union = np.unique(np.concatenate([ids for ids, _ in should])) if should else np.empty(0, np.uint64)
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
                sh_hits += np.isin(base, ids, assume_unique=True)
        base = base[sh_hits >= msm]
        if len(base) == 0:
            return empty
    for c in node["must_not"]:
        ids_mn, _ = _qs_oracle_node(oracle, c)
        if len(ids_mn):
            base = base[~np.isin(base, ids_mn, assume_unique=True)]
            if len(base) == 0:
                return empty
    scores = np.zeros(len(base), dtype=np.float64)
    for ids, sc in must + should:
        if len(ids) == 0:
            continue
        m = np.isin(ids, base, assume_unique=True)
        if m.any():
            scores[np.searchsorted(base, ids[m])] += sc[m]
    return base, (scores * boost if boost != 1.0 else scores)


def _qs_mf_node(mf, node: dict) -> tuple[np.ndarray, np.ndarray]:
    """Naive mirror of MultiFieldShard._qs_eval over whole per-field corpora:
    leaf score = Σ_f w_f·BM25_f accumulated field-major ascending-term, the
    shard's exact order, so scores are bit-identical."""
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
        parts = []
        for f in node["fields"]:
            o = mf.oracles[f]
            for t in terms:
                if idf_of(f, t) is None or t not in o.postings:
                    continue
                parts.append((f, t, *o.postings[t]))
        if not parts:
            return empty
        union = np.unique(np.concatenate([p[2] for p in parts]))
        scores = np.zeros(len(union), dtype=np.float64)
        term_hit = {t: np.zeros(len(union), dtype=bool) for t in terms}
        for f, t, ids, tfs in parts:
            o = mf.oracles[f]
            pos = np.searchsorted(union, ids)
            dls = o.doc_lens[np.searchsorted(o.all_docs, ids)]
            scores[pos] += mf.weights[f] * bm25.contribution(
                idf_of(f, t), tfs, dls, o.avgdl, o.k1, o.b
            )
            term_hit[t][pos] = True
        msm = max(1, int(node.get("msm", 1)))
        if msm > 1:
            hits = np.sum([term_hit[t] for t in terms], axis=0)
            m = hits >= msm
            union, scores = union[m], scores[m]
        return union, (scores * boost if boost != 1.0 else scores)
    must = [_qs_mf_node(mf, c) for c in node["must"]]
    should = [_qs_mf_node(mf, c) for c in node["should"]]
    if node["must"]:
        base = must[0][0]
        for ids, _ in must[1:]:
            base = np.intersect1d(base, ids, assume_unique=True)
    else:
        if not should:
            return empty
        msm = max(1, int(node.get("msm", 1)))
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
                sh_hits += np.isin(base, ids, assume_unique=True)
        base = base[sh_hits >= msm]
        if len(base) == 0:
            return empty
    for c in node["must_not"]:
        ids_mn, _ = _qs_mf_node(mf, c)
        if len(ids_mn):
            base = base[~np.isin(base, ids_mn, assume_unique=True)]
            if len(base) == 0:
                return empty
    scores = np.zeros(len(base), dtype=np.float64)
    for ids, sc in must + should:
        if len(ids) == 0:
            continue
        m = np.isin(ids, base, assume_unique=True)
        if m.any():
            scores[np.searchsorted(base, ids[m])] += sc[m]
    return base, (scores * boost if boost != 1.0 else scores)


def multifield_query_string_oracle(mf, compiled: dict, k: int = 10) -> list[tuple[int, float]]:
    """Top-k of a compiled multifield query_string tree vs MultiFieldOracle."""
    ids, scores = _qs_mf_node(mf, compiled)
    if len(ids) == 0:
        return []
    if k <= 0:
        return [(int(d), float(s)) for d, s in zip(ids, scores)]
    top = bm25.topk_indices(scores, ids, k)
    return [(int(ids[i]), float(scores[i])) for i in top]


def query_string_oracle(oracle, compiled: dict, k: int = 10) -> list[tuple[int, float]]:
    """Top-k of a compiled query_string tree against the naive oracle (the
    engine-identity target for tests/test_querystring.py)."""
    ids, scores = _qs_oracle_node(oracle, compiled)
    if len(ids) == 0:
        return []
    if k <= 0:
        return [(int(d), float(s)) for d, s in zip(ids, scores)]
    top = bm25.topk_indices(scores, ids, k)
    return [(int(ids[i]), float(scores[i])) for i in top]
