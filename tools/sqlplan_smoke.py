"""Distributed-SQL scale smoke: the sql_dist_join_agg plan shape at ~100×
the gate's data volume, value-verified against DuckDB on the SAME inputs.

Builds a big orders table by replicating sf0.1's orders K times with
shifted order keys (customer side unchanged → join density constant), runs
the planner's join+GROUP BY/HAVING statement through plan_sql, and compares
the result to DuckDB running the identical SQL over the identical parquet.
Prints ONE JSON line; numbers land in BASELINE.md's scale-smoke ladder.

  python tools/sqlplan_smoke.py [K]        # default 100 (~15M orders rows)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = f"/tmp/edih_sqlplan_smoke_{K}"

SQL = """
    SELECT c.c_mktsegment AS seg,
           count(*)::BIGINT AS n_orders,
           sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS cents,
           max(o.o_orderkey)::BIGINT AS last_key,
           count(DISTINCT o.o_orderpriority)::BIGINT AS prios
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus <> 'F' AND c.c_acctbal > 0
    GROUP BY c.c_mktsegment
    HAVING count(*) > 5
    ORDER BY seg
"""


def main() -> dict:
    import duckdb

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from elasticsearch_data_import_handler_ray.pipelines.sqlplan import plan_sql

    out: dict = {"metric": "sqlplan_smoke", "replication": K}

    orders_big = os.path.join(OUT, "orders")
    cust = os.path.join(SF, "customer.parquet")
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(OUT, ".complete")):
        os.makedirs(orders_big, exist_ok=True)
        con = duckdb.connect()
        con.execute(f"""
            COPY (
                SELECT o_orderkey + g.i * 10000000 AS o_orderkey,
                       o_custkey, o_orderstatus, o_totalprice, o_orderpriority
                FROM read_parquet('{SF}/orders.parquet'),
                     (SELECT unnest(generate_series(0, {K - 1})) AS i) g
            ) TO '{orders_big}' (FORMAT parquet, PER_THREAD_OUTPUT true)
        """)
        con.close()
        open(os.path.join(OUT, ".complete"), "w").write("ok")
    out["gen_s"] = round(time.monotonic() - t0, 1)

    views = {
        "orders": ray.data.read_parquet(orders_big),
        "customer": ray.data.read_parquet(cust),
    }
    n_rows = views["orders"].count()
    out["orders_rows"] = int(n_rows)

    t0 = time.monotonic()
    got = plan_sql(SQL, views).to_pandas()
    out["plan_wall_s"] = round(time.monotonic() - t0, 2)
    out["rows_per_s"] = round(n_rows / (time.monotonic() - t0))

    t0 = time.monotonic()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{orders_big}/*.parquet')")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{cust}')")
    want = con.execute(SQL).df()
    con.close()
    out["duckdb_wall_s"] = round(time.monotonic() - t0, 2)

    got = got[want.columns.tolist()].sort_values("seg").reset_index(drop=True)
    want = want.sort_values("seg").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    out["verified"] = True
    out["groups"] = int(len(got))

    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
