"""Local stand-in for the driver's correctness gate: run every queries() entry
at a given sf dir, run the paired oracle_sql() through DuckDB on the same
parquet tables, and compare row count + schema (sorted column names) +
order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype).startswith(("uint", "int")):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"ok(rows-only) {name}: {len(got)} rows, cols={list(got.columns)}")
            n_pass += 1
            continue
        try:
            want = canon(con.execute(sqls[name]).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        eq = True
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if str(got[c].dtype).startswith("float"):
                ok = np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True)
            else:
                ok = (pd.Series(a) == pd.Series(b)).all() or (
                    pd.Series(a).isna() == pd.Series(b).isna()
                ).all() and (pd.Series(a).dropna() == pd.Series(b).dropna()).all()
            if not ok:
                bad = np.flatnonzero(a != b)[:3] if a.dtype == b.dtype else [0]
                print(f"FAIL {name}: column {c} differs at rows {bad}: {a[bad]} vs {b[bad]}")
                eq = False
                break
        if eq:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
