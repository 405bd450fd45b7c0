"""Multi-field weighted BM25 (index/multifield.py) — the reference mapped SQL
columns to multi-field ES documents; this pins the rebuilt equivalent:
rank AND score identity of Σ_f w_f·BM25_f against a naive per-field oracle,
across or/and modes, including docs present in only one field's index."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions.analysis import CodeAnalyzer
from elasticsearch_data_import_handler_ray.index.multifield import (
    MultiFieldEngine,
    build_multifield_index,
)
from elasticsearch_data_import_handler_ray.index.oracle import BM25Oracle, MultiFieldOracle
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig


@pytest.fixture(scope="module")
def mf_built(sf_dir, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("mf") / "idx")
    res = build_multifield_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        fields={"text": 1.0, "source": 2.0},
        config=IndexConfig(analyzer="code", num_segments=4, doc_id_col="doc_id"),
    )
    assert res["text"].n_docs > 0 and res["source"].n_docs > 0
    return index_dir


@pytest.fixture(scope="module")
def mf_oracle(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
    az = CodeAnalyzer()
    return MultiFieldOracle(
        {
            "text": BM25Oracle(az, ids, t["text"].combine_chunks()),
            "source": BM25Oracle(az, ids, t["source"].combine_chunks()),
        },
        {"text": 1.0, "source": 2.0},
    )


def test_multifield_rank_and_score_identity(mf_built, mf_oracle):
    eng = MultiFieldEngine(mf_built)
    queries = [
        {"text": "hash join query", "mode": "or"},
        {"text": "vector scan filter", "mode": "or"},
        {"text": "src3 src7", "mode": "or"},    # source-only terms
        {"text": "merge sort", "mode": "and"},
        {"text": "the data stream", "mode": "or"},
        {"text": "zzznotaterm", "mode": "or"},
        {"text": "data zzznotaterm", "mode": "and"},
    ]
    try:
        got = eng.search_many(queries, k=10)
    finally:
        eng.close()
    n_nonempty = 0
    for q, g in zip(queries, got):
        want = mf_oracle.search(q["text"], k=10, mode=q["mode"])
        assert g == [(d, s) for d, s in want], q
        n_nonempty += bool(want)
    assert n_nonempty >= 4


def test_multifield_weights_flow_into_scores(mf_built):
    """Sanity: zeroing the source weight must change combined scores for
    docs whose source field matches the query (the boost actually flows).
    `source` is near-categorical, so doc ORDER may persist — scores cannot."""
    import json

    eng = MultiFieldEngine(mf_built)
    try:
        combined = dict(eng.search("hash join src3", k=300, mode="or"))
    finally:
        eng.close()
    with open(os.path.join(mf_built, "multifield.json"), "w") as fh:
        json.dump({"fields": {"text": 1.0, "source": 0.0}}, fh)
    eng2 = MultiFieldEngine(mf_built)
    try:
        text_only = dict(eng2.search("hash join src3", k=300, mode="or"))
    finally:
        eng2.close()
    with open(os.path.join(mf_built, "multifield.json"), "w") as fh:
        json.dump({"fields": {"text": 1.0, "source": 2.0}}, fh)
    overlap = set(combined) & set(text_only)
    assert overlap
    assert any(combined[d] != text_only[d] for d in overlap)


# ------------------------------------------------- query_string (multifield)
def _mf_compile(mf, q: str, default_operator: str = "or"):
    """Independent compile against the oracle's postings (engine parity check
    for MultiFieldEngine.query_string): idfs from oracle dfs, same drop/none
    rules as the engine compiler."""
    from elasticsearch_data_import_handler_ray.functions import bm25
    from elasticsearch_data_import_handler_ray.index import querystring as qs

    def comp(node):
        if isinstance(node, qs.Leaf):
            f, body = qs.split_field(node.text)
            fields = [f] if f is not None else mf.fields
            toks = list(dict.fromkeys(mf.analyzer.analyze_query(body)))
            if not toks:
                return {"kind": "none"}
            live = [t for t in toks if any(t in mf.oracles[g].postings for g in fields)]
            if not live or (default_operator == "and" and len(live) < len(toks)):
                return {"kind": "none"}

            def idfs_for(t):
                return {
                    g: float(bm25.idf(mf.oracles[g].N, len(mf.oracles[g].postings[t][0])))
                    for g in fields if t in mf.oracles[g].postings
                }

            if len(live) == 1:
                return {"kind": "term", "term": live[0], "fields": fields,
                        "idfs": idfs_for(live[0]), "boost": node.boost}
            terms = sorted(live)
            return {"kind": "group", "terms": terms, "fields": fields,
                    "idfs": {g: {t: idfs_for(t)[g] for t in terms if g in idfs_for(t)}
                             for g in fields},
                    "msm": len(terms) if default_operator == "and" else 1,
                    "boost": node.boost}
        out = {"kind": "bool", "must": [], "should": [], "must_not": [],
               "msm": 1, "boost": node.boost}
        for occur, child in node.clauses:
            c = comp(child)
            if c["kind"] == "none":
                if occur == "must":
                    return {"kind": "none"}
                continue
            out[occur].append(c)
        if not out["must"] and not out["should"]:
            return {"kind": "none"}
        return out

    return comp(qs.parse(q, default_operator))


def test_multifield_query_string_vs_oracle(mf_built, mf_oracle):
    from elasticsearch_data_import_handler_ray.index.oracle import (
        multifield_query_string_oracle,
    )

    eng = MultiFieldEngine(mf_built)
    try:
        cases = [
            ("hash AND join", "or"),
            ("(hash OR scan) AND query NOT src3", "or"),
            ("+data stream^2", "or"),
            ("hash join query", "and"),
            ("source:src3 AND hash", "or"),      # field-restricted leaf
            ("text:hash -source:src3", "or"),
            ("data unknownzzz", "or"),
        ]
        n_nonempty = 0
        for q, op in cases:
            got = eng.query_string(q, k=10, default_operator=op)
            want = multifield_query_string_oracle(mf_oracle, _mf_compile(mf_oracle, q, op), k=10)
            assert got == want, (q, op)
            n_nonempty += bool(got)
        assert n_nonempty >= 5
        # explicit minimum_should_match
        q = "+hash join scan data"
        loose = eng.query_string(q, k=0)
        tight = eng.query_string(q, k=0, minimum_should_match=2)
        compiled = _mf_compile(mf_oracle, q)
        compiled["msm"], compiled["msm_explicit"] = 2, True
        assert tight == multifield_query_string_oracle(mf_oracle, compiled, k=0)
        assert len(tight) <= len(loose)
        # field restriction restricts: a source-only term scored via text: is gone
        assert eng.query_string("text:src3", k=10) == []
        assert eng.query_string("source:src3", k=10)
    finally:
        eng.close()


def test_multifield_query_string_errors(mf_built):
    eng = MultiFieldEngine(mf_built)
    try:
        with pytest.raises(ValueError, match="term/boolean"):
            eng.query_string('"a phrase"')
        with pytest.raises(ValueError, match="term/boolean"):
            eng.query_string("pre* data")
        with pytest.raises(ValueError, match="unknown field"):
            eng.query_string("nofield:foo")
        with pytest.raises(ValueError, match="negative"):
            eng.query_string("-hash")
    finally:
        eng.close()


# ------------------------------------------------- r5: combined_fields (BM25F)
@pytest.fixture(scope="module")
def cf_env(sf_dir, tmp_path_factory):
    """Whitespace multifield index (text^1, source^2) + the raw frame — the
    combined_fields surface (whitespace keeps the naive oracle trivial)."""
    index_dir = str(tmp_path_factory.mktemp("cf") / "idx")
    build_multifield_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        fields={"text": 1.0, "source": 2.0},
        config=IndexConfig(analyzer="whitespace", num_segments=4, doc_id_col="doc_id"),
    )
    eng = MultiFieldEngine(index_dir)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text", "source"])
    tok = {
        int(d): {"text": str(x).lower().split(), "source": str(s_).lower().split()}
        for d, x, s_ in zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
                            t["source"].to_pylist())
    }
    yield eng, tok
    eng.close()


def test_combined_fields_bm25f_identity(cf_env):
    """ES combined_fields (Lucene CombinedFieldQuery): term-centric BM25F —
    tf pools across fields BEFORE saturation, the norm uses the weighted
    combined length, idf uses the combined (any-field) df. Naive
    full-recompute identity, both operators + a source-only query."""
    import numpy as np

    from elasticsearch_data_import_handler_ray.functions import bm25

    eng, tok = cf_env
    W = dict(eng.weights)
    fields = sorted(W)
    N = len(tok)
    sdl = 0.0
    for f in fields:
        sdl += W[f] * sum(len(v[f]) for v in tok.values())
    avgdl = sdl / N

    def naive(text, mode="or", k=10):
        terms = sorted(set(text.lower().split()))
        dfc = {t: sum(1 for v in tok.values() if any(t in v[f] for f in fields))
               for t in terms}
        live = [t for t in terms if dfc[t] > 0]
        if (mode == "and" and len(live) < len(terms)) or not live:
            return []
        out = []
        for d, v in tok.items():
            dlc = 0.0
            for f in fields:
                dlc += W[f] * len(v[f])
            score, hits = 0.0, 0
            for t in live:
                tfc = 0.0
                for f in fields:
                    tfc += W[f] * v[f].count(t)
                score += bm25.contribution(
                    bm25.idf(N, dfc[t]), np.array([tfc]), np.array([dlc]),
                    avgdl, 1.2, 0.75,
                )[0]
                hits += tfc > 0
            if mode == "and" and hits < len(live):
                continue
            if hits == 0:
                continue
            out.append((score, d))
        out.sort(key=lambda sd: (-sd[0], sd[1]))
        return [(d, s) for s, d in out[:k]]

    n_nonempty = 0
    for text, mode in [("hash join", "or"), ("src3 vector", "or"),
                       ("merge sort", "and"), ("src5", "or"),
                       ("zz_nothing", "or")]:
        got = eng.combined_fields_search(text, k=10, mode=mode)
        want = naive(text, mode)
        assert [d for d, _ in got] == [d for d, _ in want], (text, mode)
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12)
        n_nonempty += bool(got)
    assert n_nonempty == 4
