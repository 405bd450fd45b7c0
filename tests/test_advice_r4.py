"""Regression tests for round-4 ADVICE findings: Lucene left-to-right
query_string occurrence semantics (no AND/OR precedence), negative-boost
rejection, HOCON braced root + substitutions (covered in test_hocon.py),
temperature-sample uint64 arithmetic at large doc ids, and exact_dedup
failing loudly on NULL text."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_data_import_handler_ray.index import querystring as qs
from elasticsearch_data_import_handler_ray.stages.dedup import exact_dedup


def test_mixed_and_or_is_lucene_flat_not_precedence():
    """'a AND b OR c' must be '+a +b c': a doc containing only c does NOT
    match (the old parser's (a AND b) OR c would have matched it)."""
    g = qs.parse("a AND b OR c")
    occurs = [(occ, n.text) for occ, n in g.clauses]
    assert occurs == [("must", "a"), ("must", "b"), ("should", "c")]


def test_temperature_sample_hash_matches_duckdb_at_large_ids():
    """ADVICE r4: ids ≳ 3.47e9 overflowed the old int64 (id+1)*m product.
    The uint64 mod-before-multiply form must agree with DuckDB bit-exactly
    across the whole id range."""
    ids = np.array(
        [0, 1, 44_000, 3_470_000_000, 2**33, 2**40 + 17, 2**52 - 1],
        dtype=np.uint64,
    )
    p = np.uint64(2147483647)
    ours = ((ids + np.uint64(1)) % p) * np.uint64(2654435761) % p
    theirs = duckdb.sql(
        "SELECT ((CAST(i AS UBIGINT) + 1) % 2147483647) * 2654435761 "
        "% 2147483647 AS h FROM (SELECT unnest(?::UBIGINT[]) AS i)",
        params=[[int(x) for x in ids]],
    ).fetchnumpy()["h"]
    assert (ours == theirs.astype(np.uint64)).all()
    # and small ids still spread (the 48271-regression the docstring pins)
    small = ((np.arange(100, dtype=np.uint64) + np.uint64(1)) % p) * np.uint64(
        2654435761
    ) % p
    assert small.min() < 2**20 or small.max() > 2**30  # mixed, not clustered


def test_exact_dedup_null_text_raises():
    t = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "text": pa.array(["same", None, None], pa.string())}
    )
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="null value"):
        exact_dedup(ds, num_buckets=2).take_all()


def test_exact_dedup_still_groups_non_null():
    t = pa.table(
        {"doc_id": pa.array([5, 3, 9], pa.int64()),
         "text": pa.array(["dup", "dup", "solo"], pa.string())}
    )
    out = pd.DataFrame(exact_dedup(ray.data.from_arrow(t), num_buckets=2).take_all())
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.to_dict("records") == [
        {"doc_id": 3, "n_dups": 2},
        {"doc_id": 9, "n_dups": 1},
    ]


def test_lsh_oversize_group_star_pairs():
    """VERDICT r3 wrong#3: a giant collision group must not go quadratic —
    beyond the cap, star pairs keep volume linear while preserving
    connectivity through the representative."""
    import numpy as np
    import pandas as pd

    from elasticsearch_data_import_handler_ray.stages import dedup

    m = dedup._LSH_MAX_ALLPAIRS_GROUP + 5
    g = pd.DataFrame(
        {
            "band": np.zeros(m, dtype=np.int64),
            "band_hash": np.zeros(m, dtype=np.uint64),
            "doc_id": np.arange(m, dtype=np.int64),
        }
    )
    out = dedup._bucket_pairs(g)
    assert len(out) == m - 1                      # linear, not m*(m-1)/2
    assert (out["doc_a"] == 0).all()              # one representative
    assert set(out["doc_b"]) == set(range(1, m))  # everyone connected

    # below the cap: unchanged all-pairs behavior
    small = g.head(5)
    out_small = dedup._bucket_pairs(small)
    assert len(out_small) == 10
