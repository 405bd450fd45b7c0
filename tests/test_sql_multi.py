"""Cross-source SQL prepStatements (pipelines/sqlexpr.sql_query + spec
"sql_multi" preps) — the reference's multi-view Spark-SQL surface, rebuilt as
bounded driver-side DuckDB over registered catalog views."""

import os

import duckdb
import pandas as pd
import pytest
import ray.data

SF = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _sorted(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_sql_query_join_groupby_matches_duckdb():
    from elasticsearch_data_import_handler_ray.pipelines.sqlexpr import sql_query

    views = {
        "customer": ray.data.read_parquet(os.path.join(SF, "customer.parquet")),
        "nation": ray.data.read_parquet(os.path.join(SF, "nation.parquet")),
        "region": ray.data.read_parquet(os.path.join(SF, "region.parquet")),
    }
    q = """
        SELECT r.r_name, count(*)::BIGINT AS n,
               SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT))::BIGINT AS bal_cents
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """
    got = sql_query(q, views).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    want = con.execute(q).df()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_sql_query_view_cap_enforced():
    from elasticsearch_data_import_handler_ray.pipelines.sqlexpr import sql_query

    views = {"orders": ray.data.read_parquet(os.path.join(SF, "orders.parquet"))}
    with pytest.raises(ValueError, match="max_rows_per_view"):
        sql_query("SELECT count(*) FROM orders", views, max_rows_per_view=10)


def test_spec_sql_multi_prep_to_parquet(tmp_path):
    """Config-file shape: two parquet sources joined in one prepStatement,
    imported to a parquet sink — checked against the same SQL in DuckDB."""
    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        PipelineSpec,
        run_pipeline,
    )

    out = str(tmp_path / "out")
    d = {
        "sources": [
            {"name": "orders", "path": os.path.join(SF, "orders.parquet"),
             "columns": ["o_orderkey", "o_custkey", "o_totalprice"]},
            {"name": "customer", "path": os.path.join(SF, "customer.parquet"),
             "columns": ["c_custkey", "c_mktsegment"]},
        ],
        "preps": [
            {
                "name": "seg_orders",
                "sql_multi": """
                    SELECT c.c_mktsegment,
                           count(*)::BIGINT AS n_orders,
                           SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))::BIGINT AS cents
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    GROUP BY c.c_mktsegment
                """,
            }
        ],
        "imports": [
            {"name": "seg_out", "source": "seg_orders", "id_column": "c_mktsegment",
             "sink": "parquet", "target": out}
        ],
    }
    results = run_pipeline(PipelineSpec.from_dict(d))
    assert results["seg_out"]["status"] == "complete", results
    got = ray.data.read_parquet(out).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    want = con.execute(
        """SELECT c.c_mktsegment, count(*)::BIGINT AS n_orders,
                  SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))::BIGINT AS cents
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY c.c_mktsegment"""
    ).df()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_spec_sql_multi_unknown_view_rejected():
    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        PipelineSpec,
        run_pipeline,
    )

    d = {
        "sources": [],
        "preps": [{"name": "bad", "sql_multi": "SELECT * FROM nowhere"}],
    }
    with pytest.raises(ValueError, match="references no registered source"):
        run_pipeline(PipelineSpec.from_dict(d))
