"""Deep fuzz for the distributed SQL planner — the suite's statement
strategy at 300+ examples (the in-suite run stays at 40 for wall-time).

Every accepted statement must be value-exact vs DuckDB running the identical
SQL. Round-5 session 2: this harness caught the schema-less empty-derived-
view crash the 40-example suite missed.

Usage: python tools/fuzz_deep.py [max_examples]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import ray
import ray.data
from hypothesis import given, settings

import tests.test_sqlplan_fuzz as T
from elasticsearch_data_import_handler_ray.pipelines.sqlplan import plan_sql


def main() -> None:
    n_examples = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    t1, t2 = T._tables()
    views = {"t1": ray.data.from_arrow(t1), "t2": ray.data.from_arrow(t2)}
    con = duckdb.connect()
    con.register("t1", t1)
    con.register("t2", t2)
    n = [0]

    @settings(max_examples=n_examples, deadline=None)
    @given(T.statements())
    def deep(sql: str) -> None:
        got = plan_sql(sql, views).to_pandas()
        want = con.execute(sql).df()
        n[0] += 1
        if len(want) == 0:
            assert len(got) == 0, sql
            return
        assert sorted(got.columns) == sorted(want.columns), sql
        got = got[want.columns.tolist()]
        cols = want.columns.tolist()
        g = got.sort_values(cols).reset_index(drop=True)
        w = want.sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)

    deep()
    print(f"DEEP FUZZ OK: {n[0]} examples value-exact")
    ray.shutdown()


if __name__ == "__main__":
    main()
