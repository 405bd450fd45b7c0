"""Property fuzz for the distributed SQL planner: every statement the
planner ACCEPTS must be value-exact against DuckDB running the identical
SQL on one engine — across randomly composed projections, filters, joins,
group-bys, having, order and limit. Small in-memory tables keep each
example sub-second; determinism comes from integer-only aggregates."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_data_import_handler_ray.pipelines.sqlplan import PlanError, parse, plan_sql

_N1, _N2 = 120, 40


def _tables():
    rng = np.random.default_rng(11)
    t1 = pa.table(
        {
            "k": pa.array(rng.integers(0, 20, _N1), type=pa.int64()),
            "v": pa.array(rng.integers(-50, 50, _N1), type=pa.int64()),
            "s": pa.array(
                [f"{'abcde'[i % 5]}word{i % 7}" for i in range(_N1)],
                type=pa.string(),
            ),
        }
    )
    t2 = pa.table(
        {
            "k2": pa.array(rng.integers(0, 20, _N2), type=pa.int64()),
            "w": pa.array(rng.integers(0, 100, _N2), type=pa.int64()),
        }
    )
    return t1, t2


@pytest.fixture(scope="module")
def fuzz_env():
    t1, t2 = _tables()
    views = {"t1": ray.data.from_arrow(t1), "t2": ray.data.from_arrow(t2)}
    con = duckdb.connect()
    con.register("t1", t1)
    con.register("t2", t2)
    return views, con


_SCALARS = ["v", "v + 1", "v * 2", "abs(v - 3)", "length(s)",
            "CASE WHEN v > 5 THEN 1 ELSE 0 END", "k % 4"]
_PREDS = ["v > 0", "v % 2 = 0", "s LIKE 'a%'", "k < 15", "abs(v) > 10",
          "v BETWEEN -20 AND 30", "k IN (1, 2, 3, 7)",
          "k IN (SELECT k2 FROM t2 WHERE w > 40)",
          "k IN (SELECT DISTINCT k2 FROM t2)",
          # r5 planner growth: anti-/decorrelated semi-joins + scalar splice
          "k NOT IN (SELECT k2 FROM t2 WHERE w > 40)",
          "EXISTS (SELECT 1 FROM t2 WHERE t2.k2 = t1.k AND t2.w > 30)",
          "NOT EXISTS (SELECT 1 FROM t2 WHERE t2.k2 = t1.k)",
          "v > (SELECT avg(w) FROM t2) - 50"]
_AGGS = ["sum(v)", "count(*)", "min(v)", "max(v)", "avg(v)",
         "sum(abs(v))", "count(s)",
         "count(DISTINCT s)", "count(DISTINCT v % 3)", "max(DISTINCT v)"]


_WINDOWS = [
    "row_number() OVER (PARTITION BY k ORDER BY v, s)",
    "rank() OVER (PARTITION BY k ORDER BY v DESC)",
    "sum(v) OVER (PARTITION BY k)",
    "lag(v) OVER (PARTITION BY k ORDER BY v, s)",
    "count(*) OVER (PARTITION BY k)",
    # frame clauses + running windows (whole partitions per bucket, so the
    # original frame SQL evaluates exactly)
    "sum(v) OVER (PARTITION BY k ORDER BY v, s ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)",
    "count(*) OVER (PARTITION BY k ORDER BY v, s)",
    "lead(v, 2, -999) OVER (PARTITION BY k ORDER BY v, s)",
]


@st.composite
def statements(draw):
    if draw(st.booleans()) and draw(st.booleans()):
        # window shape: shared PARTITION BY k, deterministic in-partition
        # order keys (v, s unique enough per k at this size)
        wins = draw(st.lists(st.sampled_from(_WINDOWS), min_size=1,
                             max_size=2, unique=True))
        items = ["k AS k", "v AS v", "s AS s"] + [
            f"{w} AS w{i}" for i, w in enumerate(wins)
        ]
        where = draw(st.sampled_from(["", " WHERE v > 0", " WHERE k < 12"]))
        return f"SELECT {', '.join(items)} FROM t1{where}"
    joined = draw(st.booleans())
    grouped = draw(st.booleans())
    q = lambda e: e  # t1 columns stay unqualified (single-owner resolution)
    if joined:
        # r5: all four distributable join types; DuckDB runs the identical
        # statement, so null padding/order stays a pure equivalence check
        jt = draw(st.sampled_from(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]))
        frm = f"FROM t1 {jt} t2 ON t1.k = t2.k2"
    else:
        frm = "FROM t1"
    where = ""
    preds = draw(st.lists(st.sampled_from(_PREDS), max_size=2, unique=True))
    if joined and draw(st.booleans()):
        preds = preds + ["w > 25"]
    if preds:
        where = " WHERE " + " AND ".join(preds)
    if grouped:
        key = draw(st.sampled_from(["s", "k % 3"]))
        aggs = draw(
            st.lists(st.sampled_from(_AGGS), min_size=1, max_size=3, unique=True)
        )
        items = [f"{key} AS g"] + [
            f"{a} AS a{i}" for i, a in enumerate(aggs)
        ]
        sql = f"SELECT {', '.join(items)} {frm}{where} GROUP BY {key}"
        if draw(st.booleans()):
            sql += " HAVING count(*) > 1"
        if draw(st.booleans()):
            # r5: re-read the aggregate through a DERIVED TABLE (recursive
            # plan) with an outer filter over its output columns
            cols = ["g"] + [f"a{i}" for i in range(len(aggs))]
            proj = ", ".join(f"dt.{c} AS {c}" for c in cols)
            sql = f"SELECT {proj} FROM ({sql}) dt WHERE dt.g IS NOT NULL"
        elif draw(st.booleans()):
            # expression order items resolve over the OUTPUT columns; the
            # trailing full column list keeps ties deterministic
            sql += draw(st.sampled_from([" ORDER BY g", " ORDER BY g || 'x'"]))
    elif not joined and draw(st.booleans()) and draw(st.booleans()) and draw(st.booleans()):
        # r5: SELECT * (single-view expansion) with a predicate pool draw
        preds_ = draw(st.lists(st.sampled_from(_PREDS), max_size=2, unique=True))
        w_ = (" WHERE " + " AND ".join(preds_)) if preds_ else ""
        return f"SELECT * FROM t1{w_}"
    else:
        exprs = draw(
            st.lists(st.sampled_from(_SCALARS), min_size=1, max_size=3, unique=True)
        )
        items = ["k AS k"] + [f"{q(e)} AS c{i}" for i, e in enumerate(exprs)]
        sql = f"SELECT {', '.join(items)} {frm}{where}"
        if draw(st.booleans()):
            # order by EVERY output column: rows tied at the LIMIT cut are
            # then byte-identical, so either engine's (valid) choice of ties
            # compares equal — ORDER BY k alone is legitimately
            # nondeterministic under LIMIT when k repeats.
            names = ["k"] + [f"c{i}" for i in range(len(exprs))]
            if draw(st.booleans()):
                # leading expression item (computed over output cols); the
                # full column list after it keeps ties deterministic
                names = ["k % 5 DESC"] + names
            sql += f" ORDER BY {', '.join(names)} LIMIT 17"
    return sql


@settings(max_examples=40, deadline=None)
@given(statements())
def test_planner_matches_duckdb(fuzz_env, sql):
    views, con = fuzz_env
    got = plan_sql(sql, views).to_pandas()
    want = con.execute(sql).df()
    if len(want) == 0:
        # values agree; Ray Data's to_pandas drops column names on an
        # all-empty Dataset (even from_arrow(empty_table)), so the column
        # comparison is meaningless for a legitimately-empty result
        assert len(got) == 0, sql
        return
    assert sorted(got.columns) == sorted(want.columns), sql
    got = got[want.columns.tolist()]
    cols = want.columns.tolist()
    g = got.sort_values(cols).reset_index(drop=True)
    w = want.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_parser_never_crashes_uncleanly(text):
    """Garbage in → PlanError out (never an unhandled exception type)."""
    try:
        parse(text, {"t1", "t2"})
    except PlanError:
        pass
