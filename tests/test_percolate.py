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


def test_percolate_span_queries(sf_dir):
    """r5: span queries register in the percolator — the same ordered-chain /
    smallest-range kernels the query engine uses, over each probe doc's own
    token stream. Naive recompute oracle."""
    import itertools
    import os

    import pyarrow.parquet as pq
    import ray.data

    from elasticsearch_data_import_handler_ray.stages.percolate import percolate

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    ds = ray.data.from_arrow(docs)
    queries = [
        {"query_id": "near0", "text": "hash join", "mode": "span", "slop": 0},
        {"query_id": "near3", "text": "hash join", "mode": "span", "slop": 3},
        {"query_id": "unord", "text": "join hash", "mode": "span", "slop": 2,
         "in_order": False},
        {"query_id": "or_pl", "text": "merge sort", "mode": "or"},
    ]
    got = percolate(ds, queries, analyzer="whitespace").to_pandas()
    got_pairs = set(zip(got["doc_id"], got["query_id"]))

    def span_match(ts, clauses, slop, in_order):
        pls = [[i for i, x in enumerate(ts) if x == c] for c in clauses]
        if any(not p for p in pls):
            return False
        n = len(clauses)
        for sel in itertools.product(*pls):
            if in_order and not all(sel[i] < sel[i + 1] for i in range(n - 1)):
                continue
            if not in_order and len(set(sel)) != n:
                continue
            if (max(sel) - min(sel) + 1) - n <= slop:
                return True
        return False

    want = set()
    for d, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        ts = txt.lower().split()
        if span_match(ts, ["hash", "join"], 0, True):
            want.add((d, "near0"))
        if span_match(ts, ["hash", "join"], 3, True):
            want.add((d, "near3"))
        if span_match(ts, ["join", "hash"], 2, False):
            want.add((d, "unord"))
        if "merge" in ts or "sort" in ts:
            want.add((d, "or_pl"))
    assert got_pairs == want
    assert any(q == "near3" for _, q in got_pairs)


def test_percolate_span_unordered_dup_rejected(sf_dir):
    import pytest as _pytest
    import ray.data

    from elasticsearch_data_import_handler_ray.stages.percolate import percolate

    ds = ray.data.from_items([{"doc_id": 1, "text": "a b"}])
    with _pytest.raises(ValueError, match="repeated"):
        percolate(ds, [{"query_id": "x", "text": "a a", "mode": "span",
                        "in_order": False}], analyzer="whitespace")
