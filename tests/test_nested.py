"""Nested-field indexing (index/nested.py): ES `nested` semantics over the
A19 orders/lineitem list<struct> build — explode identity, same-child AND
(no cross-object leak), and rank+score identity vs a from-scratch pandas
BM25 oracle over the exploded child table."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_data_import_handler_ray.functions import bm25
from elasticsearch_data_import_handler_ray.index.nested import (
    NestedEngine,
    build_nested_index,
    explode_nested,
)
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig

SF = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def nested_ds():
    from elasticsearch_data_import_handler_ray.pipelines.relational import q_nested_build

    return q_nested_build(SF).materialize()


@pytest.fixture(scope="module")
def child_df(nested_ds):
    return explode_nested(
        nested_ds,
        parent_id_col="o_orderkey",
        nested_col="items",
        sub_fields=["l_linenumber", "l_quantity", "l_extendedprice"],
    ).to_pandas()


@pytest.fixture(scope="module")
def nested_idx(nested_ds, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("nested") / "idx")
    build_nested_index(
        nested_ds,
        idx,
        parent_id_col="o_orderkey",
        nested_col="items",
        sub_fields=["l_linenumber", "l_quantity", "l_extendedprice"],
        config=IndexConfig(analyzer="whitespace", num_segments=4),
    )
    return idx


def test_explode_matches_duckdb_unnest(nested_ds, child_df):
    """Explode identity: child rows == the parent table's own list contents,
    ordinals dense per parent, parent recoverable from the packed id."""
    parents = nested_ds.to_pandas()
    assert len(child_df) == int(parents["n_items"].sum())
    got_parent = (child_df["doc_id"].astype(np.uint64) & np.uint64((1 << 40) - 1)).astype(
        np.int64
    )
    assert (got_parent == child_df["parent_id"]).all()
    per = child_df.groupby("parent_id").size()
    want = parents.set_index("o_orderkey")["n_items"]
    pd.testing.assert_series_equal(
        per.sort_index(), want.sort_index(), check_names=False, check_dtype=False
    )
    # spot-check content: first parent's children in list order
    p0 = parents.iloc[0]
    kids = child_df[child_df["parent_id"] == p0["o_orderkey"]].sort_values("doc_id")
    assert kids["items.l_linenumber"].tolist() == [
        str(it["l_linenumber"]) for it in p0["items"]
    ]


def _oracle(child_df, clauses, mode, score_mode, k=10):
    """From-scratch nested BM25: per-field df/avgdl over CHILD docs, clause
    hits on the same child, parent agg — no engine code involved."""
    n = len(child_df)
    fields = sorted({f for f, _ in clauses})
    stats = {}
    for f in set(f for f, _ in clauses):
        toks = child_df[f].str.lower().str.split()
        dl = toks.str.len().astype(float)
        stats[f] = (toks, dl, float(dl.mean()))
    scores = np.zeros(n)
    hits = []
    for f, text in clauses:
        toks, dl, avgdl = stats[f]
        clause_hit = np.zeros(n, dtype=bool)
        for term in sorted(set(text.lower().split())):
            tf = toks.apply(lambda l: l.count(term)).to_numpy(dtype=float)
            df_t = int((tf > 0).sum())
            if df_t == 0:
                continue
            # the repo-wide bit-identity rule: every oracle shares the ONE
            # float kernel (functions/bm25.py) — an inlined 2.2 instead of
            # (k1+1) is a 1-ULP difference that flips tie-breaks
            contrib = bm25.contribution(
                float(bm25.idf(n, df_t)), tf, dl.to_numpy(), avgdl
            )
            m = tf > 0
            scores[m] += contrib[m]
            clause_hit |= m
        hits.append(clause_hit)
    m = np.logical_and.reduce(hits) if mode == "and" else np.logical_or.reduce(hits)
    kids = child_df[m].assign(score=scores[m])
    if kids.empty:
        return []
    # aggregate in the engine's child order ((parent, child doc_id) asc,
    # sequential reduceat) so sum/avg are bit-exact, not just close
    kids = kids.sort_values(["parent_id", "doc_id"], kind="mergesort")
    par = kids["parent_id"].to_numpy()
    sc = kids["score"].to_numpy()
    uniq, starts = np.unique(par, return_index=True)
    if score_mode == "sum":
        agg = np.add.reduceat(sc, starts)
    elif score_mode == "avg":
        agg = np.add.reduceat(sc, starts) / np.diff(np.append(starts, len(sc)))
    else:
        agg = np.maximum.reduceat(sc, starts)
    order = np.lexsort((uniq, -agg))[:k]
    return [(int(uniq[i]), float(agg[i])) for i in order]


def test_nested_rank_identity_vs_oracle(nested_idx, child_df):
    eng = NestedEngine(nested_idx)
    try:
        # pick values that exist: a quantity and a linenumber from the data
        qty = child_df["items.l_quantity"].mode()[0]
        ln = child_df["items.l_linenumber"].mode()[0]
        price = child_df["items.l_extendedprice"].iloc[7]
        cases = [
            ([("l_quantity", qty)], "and", "max"),
            ([("l_quantity", qty), ("l_linenumber", ln)], "and", "max"),
            ([("l_quantity", qty), ("l_linenumber", ln)], "or", "sum"),
            ([("l_extendedprice", price)], "and", "avg"),
            ([("l_quantity", f"{qty} 99999998"), ("l_linenumber", ln)], "and", "max"),
        ]
        for clauses, mode, score_mode in cases:
            got = eng.nested_search(
                [(f, text) for f, text in clauses], k=10, mode=mode, score_mode=score_mode
            )
            want = _oracle(
                child_df, [(f"items.{f}", t) for f, t in clauses], mode, score_mode
            )
            assert len(got) == len(want), (clauses, got, want)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert gd == wd and abs(gs - ws) < 1e-9, (clauses, got, want)
    finally:
        eng.close()


def test_nested_no_cross_object_leak(tmp_path):
    """THE nested-semantics case: parent A has (sku=x, qty=1) and (sku=y,
    qty=2) children — a flattened mapping would match {sku:x, qty:2}; the
    nested index must NOT (no single child satisfies both), while parent B
    with (sku=x, qty=2) on one child must."""
    rows = [
        {"pid": 1, "items": [{"sku": "x", "qty": "1"}, {"sku": "y", "qty": "2"}]},
        {"pid": 2, "items": [{"sku": "x", "qty": "2"}, {"sku": "z", "qty": "9"}]},
        {"pid": 3, "items": [{"sku": "y", "qty": "2"}]},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    idx = str(tmp_path / "idx")
    build_nested_index(
        ds, idx, parent_id_col="pid", nested_col="items", sub_fields=["sku", "qty"],
        config=IndexConfig(analyzer="whitespace", num_segments=2),
    )
    eng = NestedEngine(idx)
    try:
        got = [p for p, _ in eng.nested_search({"sku": "x", "qty": "2"}, mode="and")]
        assert got == [2], got  # parent 1 would leak under a flat mapping
        got_or = {p for p, _ in eng.nested_search({"sku": "x", "qty": "2"}, mode="or")}
        assert got_or == {1, 2, 3}
        with pytest.raises(KeyError):
            eng.nested_search({"nope": "x"})
        assert eng.nested_search({"sku": "zzz_absent"}, mode="and") == []
    finally:
        eng.close()


def test_nested_requires_pow2_segments(tmp_path):
    ds = ray.data.from_arrow(
        pa.Table.from_pylist([{"pid": 1, "items": [{"a": "b"}]}])
    )
    with pytest.raises(ValueError, match="power-of-two"):
        build_nested_index(
            ds, str(tmp_path / "x"), parent_id_col="pid", nested_col="items",
            sub_fields=["a"], config=IndexConfig(analyzer="whitespace", num_segments=3),
        )
