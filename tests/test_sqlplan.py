"""Distributed SQL planner (pipelines/sqlplan.py) vs DuckDB on one engine.

Every accepted statement must be value-exact against DuckDB running the
IDENTICAL SQL over the whole tables — that is the planner's contract (the
per-batch stages are DuckDB itself; the tests prove the distributed split
— pushdown, join, partial/combine/finalize — changes nothing).
"""

import glob
import os

import duckdb
import pandas as pd
import pytest
import ray.data

from elasticsearch_data_import_handler_ray.pipelines.sqlplan import (
    PlanError,
    distributed_sql_query,
    parse,
    plan_sql,
)


@pytest.fixture(scope="module")
def views(sf_dir):
    names = [os.path.basename(p)[:-8] for p in glob.glob(sf_dir + "/*.parquet")]
    return {
        n: ray.data.read_parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names
    }


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for p in glob.glob(sf_dir + "/*.parquet"):
        n = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def check(sql, views, oracle):
    got = plan_sql(sql, views).to_pandas()
    want = oracle.execute(sql).df()
    if len(want) == 0:
        # Ray Data's to_pandas drops column names on an all-empty Dataset;
        # row-count agreement is the whole check for an empty result
        assert len(got) == 0
        return got
    assert list(got.columns) == list(want.columns) or set(got.columns) == set(
        want.columns
    )
    got = got[want.columns.tolist()]
    cols = want.columns.tolist()
    g = got.sort_values(cols).reset_index(drop=True)
    w = want.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    return g


def test_projection_where_order(views, oracle):
    check(
        "SELECT upper(n_name) AS name, n_nationkey + 100 AS k "
        "FROM nation WHERE n_regionkey > 1 ORDER BY k",
        views,
        oracle,
    )


def test_join_groupby_having(views, oracle):
    g = check(
        """SELECT c.c_mktsegment AS seg, count(*)::BIGINT AS n_orders,
                  sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS cents,
                  max(o.o_orderkey)::BIGINT AS last_key
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE o.o_orderstatus <> 'F' AND c.c_acctbal > 0
           GROUP BY c.c_mktsegment
           HAVING count(*) > 5
           ORDER BY seg""",
        views,
        oracle,
    )
    assert len(g) > 0


def test_left_join_global_agg(views, oracle):
    g = check(
        """SELECT count(*)::BIGINT AS n, count(o.o_orderkey)::BIGINT AS n_with,
                  min(c.c_custkey)::BIGINT AS lo, max(c.c_custkey)::BIGINT AS hi
           FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey""",
        views,
        oracle,
    )
    assert len(g) == 1


def test_right_join_global_agg(views, oracle):
    # RIGHT JOIN (r5): orders is the probe side, customers without orders
    # survive null-padded — count(col) must skip the padding, count(*) not
    g = check(
        """SELECT count(*)::BIGINT AS n, count(o.o_orderkey)::BIGINT AS n_with,
                  min(c.c_custkey)::BIGINT AS lo, max(c.c_custkey)::BIGINT AS hi
           FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey""",
        views,
        oracle,
    )
    assert len(g) == 1


def test_right_join_where_on_left_not_pushed(views, oracle):
    # WHERE on the null-padded (earlier/left) side of a RIGHT join must run
    # post-join; pushing it below would re-introduce null-extended rows
    check(
        """SELECT c.c_mktsegment AS seg, count(o.o_orderkey)::BIGINT AS n
           FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE o.o_totalprice > 50000
           GROUP BY c.c_mktsegment""",
        views,
        oracle,
    )


def test_full_outer_join(views, oracle):
    # FULL OUTER (r5): both sides null-padded; WHERE on either side must
    # stay post-join
    check(
        """SELECT count(*)::BIGINT AS n,
                  count(o.o_orderkey)::BIGINT AS n_o,
                  count(c.c_custkey)::BIGINT AS n_c
           FROM orders o FULL OUTER JOIN customer c ON o.o_custkey = c.c_custkey""",
        views,
        oracle,
    )
    check(
        """SELECT c.c_mktsegment AS seg, count(*)::BIGINT AS n
           FROM customer c FULL JOIN orders o ON c.c_custkey = o.o_custkey
           WHERE c.c_nationkey < 10
           GROUP BY c.c_mktsegment""",
        views,
        oracle,
    )


def test_right_key_column_referenced_post_join(views, oracle):
    # Ray's hash join drops the right key column; the planner must shadow
    # it pre-join so SELECT/GROUP BY can reference it (latent pre-r5 gap)
    check(
        """SELECT o.o_custkey AS k, count(*)::BIGINT AS n
           FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
           GROUP BY o.o_custkey""",
        views,
        oracle,
    )


def test_left_join_right_key_null_semantics(views, oracle):
    # count(right key) after a LEFT join must skip the null padding — the
    # shadow column rides as payload, so padding follows SQL exactly
    check(
        """SELECT count(o.o_custkey)::BIGINT AS matched, count(*)::BIGINT AS n
           FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey""",
        views,
        oracle,
    )


def test_three_way_mixed_outer_chain(views, oracle):
    # RIGHT join mid-chain: every earlier alias (customer AND nation) is
    # null-padded, so their WHERE conjuncts must stay post-join; the nation
    # join key n_nationkey is also referenced in the later ON clause
    check(
        """SELECT o.o_orderstatus AS st, count(*)::BIGINT AS n,
                  count(c.c_custkey)::BIGINT AS n_c,
                  count(n.n_nationkey)::BIGINT AS n_n
           FROM customer c
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
           WHERE n.n_regionkey < 4 OR n.n_regionkey IS NULL
           GROUP BY o.o_orderstatus""",
        views,
        oracle,
    )


def test_cross_join_with_on_rejected(views):
    # r5: CROSS JOIN distributes (broadcast nested-loop) but takes no ON
    with pytest.raises(PlanError, match="no ON"):
        parse("SELECT * FROM orders CROSS JOIN customer ON true",
              {"orders", "customer"})


def test_cross_join_broadcast(views, oracle):
    check(
        "SELECT n.n_name AS nn, r.r_name AS rn "
        "FROM nation n CROSS JOIN region r",
        views,
        oracle,
    )
    # cross + residual WHERE relating both sides (the comma-join pattern)
    check(
        "SELECT n.n_name AS nn, r.r_name AS rn "
        "FROM nation n CROSS JOIN region r WHERE n.n_regionkey = r.r_regionkey",
        views,
        oracle,
    )


def test_cross_join_then_equi_join_and_agg(views, oracle):
    check(
        "SELECT c.c_mktsegment AS seg, r.r_name AS rname, count(*)::BIGINT AS n "
        "FROM customer c CROSS JOIN region r "
        "GROUP BY c.c_mktsegment, r.r_name",
        views,
        oracle,
    )


def test_cross_join_cap(views, monkeypatch):
    # the right side must be dimension-sized (cap-guarded contract)
    import elasticsearch_data_import_handler_ray.pipelines.sqlplan as sp

    monkeypatch.setattr(sp, "_CROSS_MAX_ROWS", 10)
    with pytest.raises(PlanError, match="dimension-sized"):
        plan_sql(
            "SELECT c.c_custkey AS a, o.o_orderkey AS b "
            "FROM customer c CROSS JOIN orders o",
            {"customer": views["customer"], "orders": views["orders"]},
        )


def test_join_key_width_mismatch_widens(views, oracle):
    # int32 nation key vs int64 custkey: SQL widens implicitly; the planner
    # must too (pa.Table.join would otherwise crash on the type mismatch)
    check(
        "SELECT n.n_name AS nn, c.c_custkey AS ck "
        "FROM nation n JOIN customer c ON n.n_nationkey = c.c_custkey",
        views,
        oracle,
    )


def test_three_way_join_unqualified(views, oracle):
    check(
        """SELECT r_name AS region, count(*)::BIGINT AS n
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           GROUP BY r_name ORDER BY region""",
        views,
        oracle,
    )


def test_distinct(views, oracle):
    check(
        "SELECT DISTINCT o_orderstatus AS st, o_orderpriority AS pr FROM orders",
        views,
        oracle,
    )


def test_avg_and_expression_group_key(views, oracle):
    check(
        """SELECT c_nationkey % 3 AS b, avg(c_nationkey) AS a,
                  sum(CAST(c_custkey AS BIGINT))::BIGINT AS s
           FROM customer GROUP BY c_nationkey % 3""",
        views,
        oracle,
    )


def test_left_join_where_on_right_not_pushed(views, oracle):
    # WHERE on the null-padded side of a LEFT join must run post-join:
    # pushing it below the join would re-introduce null-extended rows.
    check(
        """SELECT c.c_custkey AS k, count(o.o_orderkey)::BIGINT AS n
           FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
           WHERE o.o_totalprice > 50000
           GROUP BY c.c_custkey""",
        views,
        oracle,
    )


def test_limit(views):
    got = plan_sql(
        "SELECT o_orderkey AS k FROM orders ORDER BY k LIMIT 7", views
    ).to_pandas()
    assert list(got["k"]) == sorted(got["k"]) and len(got) == 7


@pytest.mark.parametrize(
    "sql,msg",
    [
        ("SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS r FROM orders", "OVER"),
        ("SELECT (SELECT max(n_nationkey) FROM nation) AS m FROM region", "subquer"),
        ("SELECT sum(DISTINCT o_custkey) AS n FROM orders", "DISTINCT"),
        ("SELECT count(DISTINCT *) AS n FROM orders", "DISTINCT aggregate"),
        ("SELECT a.n_name AS x FROM nation a, region b", "cross"),
        ("SELECT a.n_name AS x FROM nation a CROSS JOIN region b ON a.n_regionkey = b.r_regionkey", "CROSS"),
        ("SELECT n.n_name AS x FROM nation n JOIN region r ON n.n_regionkey < r.r_regionkey", "equality"),
        ("SELECT n_name AS x FROM nowhere", "unknown view"),
        ("SELECT n_name AS x FROM nation UNION SELECT r_name FROM region", "UNION"),
        ("SELECT n_nationkey + 1 FROM nation", "AS alias"),
        ("SELECT sum(n_nationkey) AS s FROM nation ORDER BY sum(n_nationkey) + 1", "aggregate"),
        # expression (not a plain column) on the IN probe side stays rejected
        ("SELECT n_name AS x FROM nation WHERE n_regionkey + 1 IN (SELECT r_regionkey FROM region)", "subquer"),
        # disjunctive subquery predicates stay rejected (residual holds SELECT)
        ("SELECT n_name AS x FROM nation WHERE n_regionkey IN (SELECT r_regionkey FROM region) OR n_nationkey = 1", "subquer"),
    ],
)
def test_plan_errors(views, sql, msg):
    with pytest.raises(PlanError, match=msg):
        plan_sql(sql, views)


def test_ambiguous_unqualified_column(views):
    # n_nationkey exists in both sides after self-join aliasing
    with pytest.raises(PlanError, match="ambiguous"):
        plan_sql(
            "SELECT n_nationkey AS k FROM nation a "
            "JOIN nation b ON a.n_nationkey = b.n_nationkey",
            views,
        )


def test_fallback_runs_unsupported_sql(views, oracle):
    sql = (
        "SELECT o_orderstatus AS st, sum(DISTINCT o_custkey)::BIGINT AS n "
        "FROM orders GROUP BY o_orderstatus"
    )
    got = distributed_sql_query(sql, views).to_pandas()
    want = oracle.execute(sql).df()
    g = got.sort_values("st").reset_index(drop=True)
    w = want.sort_values("st").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_parse_rejects_non_select():
    with pytest.raises(PlanError):
        parse("DELETE FROM nation", {"nation"})


def test_union_all(views, oracle):
    check(
        """SELECT n_name AS name, n_nationkey AS k FROM nation WHERE n_regionkey = 0
           UNION ALL
           SELECT n_name AS name, n_nationkey AS k FROM nation WHERE n_regionkey > 2
           UNION ALL
           SELECT r_name AS name, r_regionkey AS k FROM region""",
        views,
        oracle,
    )


def test_union_all_mismatched_columns(views):
    with pytest.raises(PlanError, match="different columns"):
        plan_sql(
            "SELECT n_name AS a FROM nation UNION ALL SELECT r_name AS b FROM region",
            views,
        )


def test_union_distinct_distributes(views, oracle):
    """r5: plain UNION = concat + one global dedup groupby."""
    sql = ("SELECT n_regionkey AS k FROM nation UNION "
           "SELECT r_regionkey AS k FROM region")
    check(sql, views, oracle)
    sql3 = ("SELECT n_regionkey AS k FROM nation UNION "
            "SELECT r_regionkey AS k FROM region UNION "
            "SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 7")
    check(sql3, views, oracle)


def test_union_two_column_distinct(views, oracle):
    check(
        "SELECT n_regionkey AS a, n_name AS b FROM nation UNION "
        "SELECT r_regionkey AS a, r_name AS b FROM region",
        views,
        oracle,
    )


def test_union_mixed_all_falls_back(views, oracle):
    sql = ("SELECT n_regionkey AS k FROM nation UNION "
           "SELECT r_regionkey AS k FROM region UNION ALL "
           "SELECT n_nationkey AS k FROM nation")
    with pytest.raises(PlanError, match="mixed UNION"):
        plan_sql(sql, views)
    got = distributed_sql_query(sql, views).to_pandas()
    want = oracle.execute(sql).df()
    assert sorted(got["k"]) == sorted(want["k"])


def test_count_distinct_grouped(views, oracle):
    check(
        "SELECT o_orderstatus AS st, count(DISTINCT o_custkey) AS n, "
        "count(*) AS c FROM orders GROUP BY o_orderstatus",
        views,
        oracle,
    )


def test_count_distinct_global_mixed(views, oracle):
    check(
        "SELECT count(DISTINCT o_custkey) AS n, count(DISTINCT o_orderstatus) "
        "AS s, sum(o_totalprice) AS tot FROM orders",
        views,
        oracle,
    )


def test_count_distinct_only_and_having(views, oracle):
    check(
        "SELECT o_orderstatus AS st, count(DISTINCT o_orderpriority) AS n "
        "FROM orders GROUP BY o_orderstatus "
        "HAVING count(DISTINCT o_orderpriority) > 1",
        views,
        oracle,
    )


def test_min_max_distinct_strips(views, oracle):
    check(
        "SELECT min(DISTINCT o_totalprice) AS lo, max(DISTINCT o_totalprice) "
        "AS hi FROM orders",
        views,
        oracle,
    )


def test_in_subquery_semijoin(views, oracle):
    check(
        "SELECT n_name AS name, n_nationkey AS k FROM nation "
        "WHERE n_regionkey IN (SELECT r_regionkey FROM region "
        "WHERE r_name LIKE 'A%')",
        views,
        oracle,
    )


def test_in_subquery_with_agg_outer(views, oracle):
    check(
        "SELECT o_orderstatus AS st, count(*) AS c FROM orders "
        "WHERE o_custkey IN (SELECT c_custkey FROM customer "
        "WHERE c_acctbal > 0) GROUP BY o_orderstatus",
        views,
        oracle,
    )


def test_order_by_expression(views, oracle):
    got = plan_sql(
        "SELECT n_name AS name, n_nationkey AS k FROM nation "
        "ORDER BY k % 7 DESC, name LIMIT 10",
        views,
    ).to_pandas()
    want = oracle.execute(
        "SELECT n_name AS name, n_nationkey AS k FROM nation "
        "ORDER BY k % 7 DESC, name LIMIT 10"
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    assert list(got.columns) == ["name", "k"]  # temp sort column dropped


def test_window_functions_bucketed(views, oracle):
    """OVER (PARTITION BY ...) distributes via one bucketed shuffle; the
    money sum is integer cents so row-order differences cannot flip it."""
    check(
        "SELECT o_custkey AS cust, o_orderkey AS okey, "
        "row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn, "
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
        "OVER (PARTITION BY o_custkey) AS cents "
        "FROM orders",
        views,
        oracle,
    )


def test_window_with_where_and_order(views, oracle):
    got = check(
        "SELECT o_custkey AS cust, o_orderkey AS okey, "
        "lag(o_orderkey) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS prev_key "
        "FROM orders WHERE o_totalprice > 50000 "
        "ORDER BY cust, okey",
        views,
        oracle,
    )
    assert len(got) > 0


def test_window_mixed_partitions_falls_back(views, oracle):
    sql = (
        "SELECT o_orderkey AS k, "
        "rank() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS a, "
        "rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS b "
        "FROM orders"
    )
    with pytest.raises(PlanError, match="same columns"):
        plan_sql(sql, views)
    got = distributed_sql_query(sql, views).to_pandas()
    want = oracle.execute(sql).df()
    assert len(got) == len(want)


# ------------------------------------------------------------------ r5 growth
# NOT IN / [NOT] EXISTS → broadcast (anti-)semi-joins, scalar subqueries


def test_not_in_subquery_antijoin(views, oracle):
    got = check(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
        "WHERE o_totalprice > 400000)",
        views,
        oracle,
    )
    assert len(got) > 0


def test_exists_decorrelates_to_semijoin(views, oracle):
    got = check(
        "SELECT c.c_custkey FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)",
        views,
        oracle,
    )
    assert len(got) > 0


def test_not_exists_keeps_unmatched(views, oracle):
    got = check(
        "SELECT c.c_custkey FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE c.c_custkey = o.o_custkey AND o.o_totalprice > 400000)",
        views,
        oracle,
    )
    assert len(got) > 0


def test_exists_correlation_side_order_flipped(views, oracle):
    """outer.col on the LEFT of the correlation equality also decorrelates."""
    check(
        "SELECT c.c_custkey FROM customer c "
        "WHERE EXISTS (SELECT o_orderkey FROM orders o "
        "WHERE c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F')",
        views,
        oracle,
    )


def _null_views():
    import pyarrow as pa

    nt = pa.table({"k": [1, 2, 3, None], "v": [10, 20, None, 40]})
    con = duckdb.connect()
    con.register("nt", nt)
    return {"nt": ray.data.from_arrow(nt)}, con


def test_not_in_null_poison():
    """Any NULL in the subquery's value set makes NOT IN never-true (SQL)."""
    views, con = _null_views()
    sql = "SELECT k FROM nt WHERE k NOT IN (SELECT v FROM nt)"
    got = plan_sql(sql, views).to_pandas()
    want = con.execute(sql).df()
    assert len(got) == len(want) == 0


def test_not_in_drops_null_probe():
    views, con = _null_views()
    sql = "SELECT k FROM nt WHERE k NOT IN (SELECT v FROM nt WHERE v > 15)"
    got = plan_sql(sql, views).to_pandas()
    want = con.execute(sql).df()
    assert sorted(got["k"]) == sorted(want["k"]) == [1, 2, 3]


def test_not_exists_keeps_null_probe():
    views, con = _null_views()
    sql = "SELECT a.k FROM nt a WHERE NOT EXISTS (SELECT 1 FROM nt b WHERE b.v = a.k)"
    got = plan_sql(sql, views).to_pandas()
    want = con.execute(sql).df()
    assert len(got) == len(want) == 4  # NULL probe is kept by NOT EXISTS


def test_scalar_subquery_in_where(views, oracle):
    got = check(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8",
        views,
        oracle,
    )
    assert len(got) > 0


def test_scalar_subquery_zero_rows_is_null(views, oracle):
    """A zero-row scalar subquery is NULL; `x > NULL` keeps nothing. (Count
    compare: Ray's to_pandas drops column names on an all-empty Dataset.)"""
    sql = (
        "SELECT o_orderkey FROM orders "
        "WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders "
        "WHERE o_totalprice > 99999999)"
    )
    got = plan_sql(sql, views).to_pandas()
    want = oracle.execute(sql).df()
    assert len(got) == len(want) == 0


def test_scalar_plus_exists_combined(views, oracle):
    got = check(
        "SELECT c.c_custkey FROM customer c "
        "WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer) "
        "AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
        views,
        oracle,
    )
    assert len(got) > 0


def test_scalar_subquery_pushdown_still_prunes(views):
    """The spliced literal must reach the pushed-down per-scan filter — the
    plan stays a single map-only scan (no residual crash on the placeholder)."""
    ds = plan_sql(
        "SELECT o_orderkey FROM orders "
        "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)",
        views,
    )
    assert ds.count() > 0


def test_exists_multi_correlation_falls_back(views, oracle):
    sql = (
        "SELECT c.c_custkey FROM customer c WHERE EXISTS ("
        "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderkey = c.c_nationkey)"
    )
    with pytest.raises(PlanError, match="correlation"):
        plan_sql(sql, views)
    got = distributed_sql_query(sql, views).to_pandas()
    want = oracle.execute(sql).df()
    assert len(got) == len(want)


def test_exists_non_equi_correlation_falls_back(views, oracle):
    sql = (
        "SELECT c.c_custkey FROM customer c WHERE EXISTS ("
        "SELECT 1 FROM orders o WHERE o.o_custkey > c.c_custkey)"
    )
    with pytest.raises(PlanError, match="equi"):
        plan_sql(sql, views)
    got = distributed_sql_query(sql, views).to_pandas()
    want = oracle.execute(sql).df()
    assert len(got) == len(want)


def test_scalar_subquery_multirow_raises(views):
    with pytest.raises(PlanError, match="more than one row"):
        plan_sql(
            "SELECT c_custkey FROM customer "
            "WHERE c_acctbal > (SELECT o_totalprice FROM orders)",
            views,
        )


def test_window_frames_and_cumulative(views, oracle):
    """Frame clauses and running windows work through the bucketed path —
    each bucket evaluates the ORIGINAL window SQL over whole partitions."""
    check(
        "SELECT o_custkey AS c, o_orderkey AS k, "
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
        "OVER (PARTITION BY o_custkey ORDER BY o_orderkey "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s "
        "FROM orders",
        views,
        oracle,
    )
    check(
        "SELECT o_custkey AS c, o_orderkey AS k, "
        "count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rc, "
        "lead(o_orderkey, 2, -1) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderkey) AS nxt "
        "FROM orders",
        views,
        oracle,
    )


def test_union_trailing_order_limit(views, oracle):
    """Trailing ORDER BY/LIMIT binds to the WHOLE union (applied post-dedup
    for plain UNION); unique keys keep the LIMIT cut deterministic."""
    check(
        "SELECT n_name AS k FROM nation UNION ALL "
        "SELECT r_name AS k FROM region ORDER BY k LIMIT 12",
        views,
        oracle,
    )
    check(
        "SELECT n_regionkey AS k FROM nation UNION "
        "SELECT r_regionkey AS k FROM region ORDER BY k DESC",
        views,
        oracle,
    )


def test_union_trailing_order_unknown_column(views):
    with pytest.raises(PlanError, match="unknown columns"):
        plan_sql(
            "SELECT n_name AS k FROM nation UNION ALL "
            "SELECT r_name AS k FROM region ORDER BY zzz",
            views,
        )


def test_group_by_alias_and_ordinal(views, oracle):
    """GROUP BY an output alias or a 1-based ordinal (DuckDB conveniences)."""
    check(
        "SELECT c.c_mktsegment AS seg, count(*)::BIGINT AS n "
        "FROM customer c GROUP BY seg",
        views,
        oracle,
    )
    check(
        "SELECT year(o_orderdate)::BIGINT AS y, month(o_orderdate)::BIGINT AS m, "
        "count(*)::BIGINT AS n FROM orders GROUP BY 1, 2",
        views,
        oracle,
    )
    # alias shadowing nothing + expression key mixed with ordinal
    check(
        "SELECT n_regionkey % 2 AS par, upper(n_name) AS nm, count(*)::BIGINT AS n "
        "FROM nation GROUP BY par, 2",
        views,
        oracle,
    )


def test_group_by_ordinal_out_of_range(views):
    with pytest.raises(PlanError, match="out of range"):
        plan_sql("SELECT n_name AS x, count(*) AS n FROM nation GROUP BY 9",
                 views)


def test_order_by_ordinal(views, oracle):
    check(
        "SELECT c_mktsegment AS seg, count(*)::BIGINT AS n "
        "FROM customer GROUP BY seg ORDER BY 2 DESC, 1",
        views,
        oracle,
    )
    with pytest.raises(PlanError, match="out of range"):
        plan_sql("SELECT n_name AS x FROM nation ORDER BY 3", views)


def test_derived_table_root(views, oracle):
    check(
        "SELECT t.seg AS seg, t.n AS n FROM "
        "(SELECT c_mktsegment AS seg, count(*)::BIGINT AS n "
        " FROM customer GROUP BY c_mktsegment) t "
        "WHERE t.n > 20",
        views,
        oracle,
    )


def test_derived_table_join_side(views, oracle):
    g = check(
        "SELECT c.c_mktsegment AS seg, s.total AS total "
        "FROM customer c JOIN "
        "(SELECT o_custkey AS k, "
        " sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS total "
        " FROM orders GROUP BY o_custkey) s "
        "ON c.c_custkey = s.k WHERE s.total > 50000000",
        views,
        oracle,
    )
    assert len(g) > 0


def test_derived_table_nested(views, oracle):
    check(
        "SELECT u.m AS m FROM "
        "(SELECT max(x.n) AS m FROM "
        " (SELECT n_regionkey AS r, count(*)::BIGINT AS n "
        "  FROM nation GROUP BY n_regionkey) x) u",
        views,
        oracle,
    )


def test_derived_table_then_aggregate_outer(views, oracle):
    check(
        "SELECT t.seg AS seg, sum(t.total)::BIGINT AS grand "
        "FROM (SELECT c.c_mktsegment AS seg, "
        "      CAST(round(o.o_totalprice * 100) AS BIGINT) AS total "
        "      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) t "
        "GROUP BY t.seg ORDER BY seg",
        views,
        oracle,
    )


def test_select_star_single_view(views, oracle):
    check("SELECT * FROM region WHERE r_regionkey < 4", views, oracle)
    check("SELECT DISTINCT * FROM nation WHERE n_regionkey = 1", views, oracle)
    # star over a derived table (single synthetic view)
    check(
        "SELECT * FROM (SELECT n_regionkey AS r, count(*)::BIGINT AS n "
        "FROM nation GROUP BY n_regionkey) t WHERE t.n > 3",
        views,
        oracle,
    )


def test_select_star_across_join_falls_back(views, oracle):
    sql = "SELECT * FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey"
    with pytest.raises(PlanError, match="across joins"):
        plan_sql(sql, views)
    got = distributed_sql_query(sql, views).to_pandas()
    want = oracle.execute(sql).df()
    assert len(got) == len(want)
