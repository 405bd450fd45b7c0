"""Percolator (stages/percolate.py): registered queries matched against a
document stream. Oracle: a naive per-doc Python evaluator over the same
analyzer's token streams (or / and / phrase)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from elasticsearch_data_import_handler_ray.functions.analysis import get_analyzer
from elasticsearch_data_import_handler_ray.stages.percolate import percolate


QUERIES = [
    {"query_id": "q_or", "text": "parse json", "mode": "or"},
    {"query_id": "q_and", "text": "parse json", "mode": "and"},
    {"query_id": "q_phrase", "text": "parse json", "mode": "phrase"},
    {"query_id": "q_single", "text": "buffer", "mode": "and"},
    {"query_id": "q_missing", "text": "zzqqneverseen", "mode": "or"},
    {"query_id": "q_empty", "text": "!!!", "mode": "or"},  # analyzes to nothing
]


def _naive(df, queries, analyzer="code"):
    az = get_analyzer(analyzer)
    out = set()
    for _, row in df.iterrows():
        toks = [t for t in az.analyze_query(row["text"])]
        tset = set(toks)
        for q in queries:
            qt = az.analyze_query(q["text"])
            if not qt:
                continue
            uniq = set(qt)
            mode = q.get("mode", "or")
            if mode == "or":
                hit = bool(uniq & tset)
            elif mode == "and":
                hit = uniq <= tset
            else:
                n = len(qt)
                hit = uniq <= tset and any(
                    toks[i : i + n] == qt for i in range(len(toks) - n + 1)
                )
            if hit:
                out.add((int(row["doc_id"]), q["query_id"]))
    return out


def test_percolate_matches_naive_oracle():
    rng = np.random.default_rng(5)
    vocab = ["parse", "json", "buffer", "merge", "sort", "alloc", "free"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(2, 12))))
        for _ in range(400)
    ]
    texts += ["parse json exact here", "json parse reversed", "", "parse"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    got_t = percolate(
        ray.data.from_pandas(df), QUERIES, analyzer="code"
    ).to_pandas()
    got = set(zip(got_t["doc_id"].astype(int), got_t["query_id"]))
    want = _naive(df, QUERIES)
    assert got == want
    # the interesting cases actually occur
    qs = {q for _, q in want}
    assert {"q_or", "q_and", "q_phrase", "q_single"} <= qs
    assert "q_missing" not in qs and "q_empty" not in qs
    # phrase is strictly stricter than and
    n_and = sum(1 for _, q in want if q == "q_and")
    n_ph = sum(1 for _, q in want if q == "q_phrase")
    assert 0 < n_ph < n_and


def test_percolate_no_queries_empty():
    df = pd.DataFrame({"doc_id": [1], "text": ["parse json"]})
    out = percolate(ray.data.from_pandas(df), [{"query_id": "e", "text": "!!!"}])
    assert out.count() == 0


def _lev(a: str, b: str) -> int:
    """Plain-Python Levenshtein for the naive oracle."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ------------------------------------------------- query_string percolation
def _naive_qs(df, q: str, analyzer="code", default_operator="or"):
    """Per-doc Python evaluation of a query_string tree (matching only)."""
    from elasticsearch_data_import_handler_ray.index import querystring as qs
    from elasticsearch_data_import_handler_ray.index.oracle import PhraseOracle

    az = get_analyzer(analyzer)
    tree = qs.parse(q, default_operator)
    occur_default = "must" if default_operator == "and" else "should"

    def ev(node, row, toks, tset) -> bool:
        if isinstance(node, qs.Leaf):
            if node.kind == "range":
                v = row.get(node.field_name)
                if node.lo is None and node.hi is None:
                    return v is not None and not (isinstance(v, float) and np.isnan(v))
                if node.lo is not None and not (v >= node.lo if node.lo_incl else v > node.lo):
                    return False
                if node.hi is not None and not (v <= node.hi if node.hi_incl else v < node.hi):
                    return False
                return True
            if node.kind == "phrase":
                ph = az.analyze_query(node.text)
                if not set(ph) <= tset:
                    return False
                if node.slop > 0:
                    return PhraseOracle._sloppy_doc_match(toks, ph, node.slop)
                n = len(ph)
                return any(toks[i:i + n] == ph for i in range(len(toks) - n + 1))
            if node.kind in ("wildcard", "prefix", "fuzzy", "regexp"):
                import fnmatch
                import re

                body = (node.text if node.kind == "regexp"
                        else qs.split_field(node.text)[1]).lower()
                if node.kind == "prefix":
                    return any(t.startswith(body) for t in tset)
                if node.kind == "wildcard":
                    return any(fnmatch.fnmatchcase(t, body) for t in tset)
                if node.kind == "regexp":
                    rx = re.compile("^(?:%s)$" % body)
                    return any(rx.match(t) for t in tset)
                return any(_lev(t, body) <= node.edits for t in tset)
            body = qs.split_field(node.text)[1]
            qt = set(az.analyze_query(body))
            if not qt:
                return None  # vacuous clause
            hits = len(qt & tset)
            return hits >= (len(qt) if default_operator == "and" else 1)
        musts, shoulds, nots = [], [], []
        for occur, child in node.clauses:
            r = ev(child, row, toks, tset)
            if r is None:
                continue
            (musts if occur == "must" else nots if occur == "must_not" else shoulds).append(r)
        if any(n for n in nots):
            return False
        if musts:
            return all(musts)
        return any(shoulds) if shoulds else None

    out = set()
    for _, row in df.iterrows():
        toks = az.analyze_query(row["text"])
        r = ev(tree, row, toks, set(toks))
        if r:
            out.add(int(row["doc_id"]))
    return out


def test_percolate_query_string_vs_naive():
    from elasticsearch_data_import_handler_ray.stages.percolate import (
        percolate_query_string,
    )

    rng = np.random.default_rng(7)
    vocab = ["crash", "panic", "parse", "json", "buffer", "ok", "slow", "fast"]
    rows = []
    for i in range(400):
        toks = rng.choice(vocab, size=rng.integers(3, 12)).tolist()
        rows.append({"doc_id": i, "text": " ".join(toks),
                     "severity": int(rng.integers(0, 6))})
    df = pd.DataFrame(rows)
    queries = [
        {"query_id": "a", "q": "(crash OR panic) AND severity:[3 TO *]"},
        {"query_id": "b", "q": '"parse json" -slow'},
        {"query_id": "c", "q": "+buffer ok fast"},
        {"query_id": "d", "q": '"json parse"~2 AND severity:<2'},
        {"query_id": "e", "q": "_exists_:severity AND crash"},
        {"query_id": "f", "q": "zzneverseen"},
        # dictionary-dependent leaves (r5): matched per batch against the
        # batch's own token vocabulary
        {"query_id": "g", "q": "pa* AND -slow"},
        {"query_id": "h", "q": "b?ffer AND fast"},
        {"query_id": "i", "q": "parze~1"},
        {"query_id": "j", "q": "/cra.h|sl.w/ AND severity:[2 TO *]"},
        {"query_id": "k", "q": "pan*c OR ju?k"},
    ]
    out = percolate_query_string(ray.data.from_pandas(df), queries)
    got = {(int(r["doc_id"]), r["query_id"]) for r in out.take_all()}
    want = set()
    for q in queries:
        for d in _naive_qs(df, q["q"]):
            want.add((d, q["query_id"]))
    assert got == want
    hit_qids = {qid for _, qid in got}
    # all interesting cases fire, incl. the four dictionary-leaf kinds
    assert {"a", "b", "c", "d", "e", "g", "h", "i", "j", "k"} <= hit_qids
    assert "f" not in hit_qids


def test_percolate_query_string_rejects_field_prefixed_expansions():
    from elasticsearch_data_import_handler_ray.stages.percolate import (
        percolate_query_string,
    )

    df = pd.DataFrame({"doc_id": [1], "text": ["parse json"], "severity": [1]})
    for bad in ["severity:pa*", "severity:fuzz~1", "severity:/pa.*/"]:
        with pytest.raises(ValueError, match="field-prefixed"):
            percolate_query_string(ray.data.from_pandas(df),
                                   [{"query_id": "x", "q": bad}])
