"""SQL scalar-expression layer (pipelines/sqlexpr.py, SURVEY.md §2.D2).

Pins: per-batch DuckDB evaluation equals the same SQL over the whole table
(map-only soundness); unsound SQL is rejected; a spec built from a plain
dict with SQL steps runs end-to-end to a parquet sink."""

import os

import duckdb
import pandas as pd
import pytest

from elasticsearch_data_import_handler_ray.pipelines.sqlexpr import (
    sql_transform,
    validate_map_only,
)


SF = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_sql_transform_matches_full_table():
    from elasticsearch_data_import_handler_ray.sources.catalog import table

    q = """
        SELECT l_orderkey,
               CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS revenue_cents,
               CASE WHEN l_quantity > 25 THEN 'high' ELSE 'low' END AS qty_class
        FROM {src} WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """
    ds = table(SF, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_quantity", "l_shipdate"])
    got = sql_transform(q.format(src="t"))(ds).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    want = con.execute(q.format(src="lineitem")).df()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT sum(x) FROM t",
        "SELECT a FROM t GROUP BY a",
        "SELECT * FROM t ORDER BY a LIMIT 5",
        "SELECT DISTINCT a FROM t",
        "SELECT a, row_number() OVER () FROM t",
        "SELECT * FROM t JOIN u USING (a)",
    ],
)
def test_non_map_sql_rejected(bad):
    with pytest.raises(ValueError, match="map-only"):
        validate_map_only(bad)


def test_spec_from_dict_with_sql_steps(tmp_path):
    """End-to-end: a plain-dict spec (the reference's config-file shape) whose
    steps are SQL strings, run to a parquet sink and checked against DuckDB."""
    from elasticsearch_data_import_handler_ray.pipelines.spec import PipelineSpec, run_pipeline

    out_dir = str(tmp_path / "out")
    d = {
        "sources": [
            {
                "name": "events",
                "path": os.path.join(SF, "events.parquet"),
                "columns": ["event_id", "event_type", "value", "ts"],
            }
        ],
        "preps": [
            {
                "name": "clicks",
                "source": "events",
                "steps": [{"sql": "SELECT * FROM t WHERE event_type = 'click'"}],
            }
        ],
        "imports": [
            {
                "name": "click_values",
                "source": "clicks",
                "id_column": "event_id",
                "sink": "parquet",
                "target": out_dir,
                "steps": [
                    {
                        "sql": "SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS value_cents, year(ts) AS y FROM t"
                    }
                ],
            }
        ],
    }
    spec = PipelineSpec.from_dict(d)
    results = run_pipeline(spec)
    assert results["click_values"]["status"] == "complete", results
    import ray.data

    got = ray.data.read_parquet(out_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    want = con.execute(
        "SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS value_cents, year(ts) AS y "
        "FROM events WHERE event_type = 'click'"
    ).df()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_sql_step_rejects_aggregate_in_spec():
    from elasticsearch_data_import_handler_ray.pipelines.spec import PipelineSpec

    d = {
        "sources": [{"name": "e", "path": os.path.join(SF, "events.parquet")}],
        "preps": [
            {"name": "bad", "source": "e", "steps": [{"sql": "SELECT count(*) FROM t"}]}
        ],
    }
    with pytest.raises(ValueError, match="map-only"):
        PipelineSpec.from_dict(d)


def test_builtin_steps_in_spec(tmp_path):
    """Config-file pipelines can reference the curation stage library without
    Python: builtin token_count + quality + a SQL gate, end-to-end to
    parquet, verified against direct stage application."""
    import ray.data

    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        PipelineSpec,
        run_pipeline,
    )
    from elasticsearch_data_import_handler_ray.stages.text import (
        quality_batch,
        token_count_batch,
    )

    out_dir = str(tmp_path / "curated")
    d = {
        "sources": [
            {"name": "docs", "path": os.path.join(SF, "documents.parquet"),
             "columns": ["doc_id", "text"]}
        ],
        "preps": [
            {"name": "scored", "source": "docs",
             "steps": ["builtin:token_count", {"builtin": "quality"}]}
        ],
        "imports": [
            {"name": "curated", "source": "scored", "id_column": "doc_id",
             "sink": "parquet", "target": out_dir,
             "steps": [{"sql": "SELECT doc_id, n_tokens FROM t WHERE punct_ratio <= 0.5"}]}
        ],
    }
    run_pipeline(PipelineSpec.from_dict(d))
    got = ray.data.read_parquet(out_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    src = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    want = (
        src.map_batches(token_count_batch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    want = want[want.punct_ratio <= 0.5][["doc_id", "n_tokens"]].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_builtin_step_unknown_name():
    from elasticsearch_data_import_handler_ray.pipelines.spec import PipelineSpec

    d = {
        "sources": [{"name": "e", "path": os.path.join(SF, "events.parquet")}],
        "preps": [{"name": "bad", "source": "e", "steps": ["builtin:nope"]}],
    }
    with pytest.raises(KeyError, match="nope"):
        PipelineSpec.from_dict(d)


def test_text_source_end_to_end(tmp_path):
    """One-doc-per-line text source (plain + gzip): content-hash ids are
    stable across re-reads, text survives, and the format works as a spec
    source feeding a builtin curation step."""
    import gzip

    import ray.data

    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        PipelineSpec,
        run_pipeline,
    )
    from elasticsearch_data_import_handler_ray.sources.catalog import Catalog

    lines = [f"document number {i} with some words" for i in range(100)]
    plain = tmp_path / "corpus.txt"
    plain.write_text("\n".join(lines) + "\n")
    gz = tmp_path / "corpus2.txt.gz"
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(lines[:10]) + "\n")

    c = Catalog()
    c.register_text("docs", str(plain))
    got = c["docs"].to_pandas().sort_values("text").reset_index(drop=True)
    assert got["text"].tolist() == sorted(lines)
    assert got["doc_id"].nunique() == 100  # distinct lines → distinct ids
    # stability across a second read
    c2 = Catalog()
    c2.register_text("docs", str(plain))
    got2 = c2["docs"].to_pandas().sort_values("text").reset_index(drop=True)
    assert got["doc_id"].tolist() == got2["doc_id"].tolist()
    # gzip transparency
    c.register_text("gzdocs", str(gz))
    assert c["gzdocs"].count() == 10
    # as a spec source through a builtin step to parquet
    out_dir = str(tmp_path / "out")
    run_pipeline(PipelineSpec.from_dict({
        "sources": [{"name": "raw", "path": str(plain), "format": "text"}],
        "imports": [{"name": "tok", "source": "raw", "id_column": "doc_id",
                     "sink": "parquet", "target": out_dir,
                     "steps": ["builtin:token_count"]}],
    }))
    res = ray.data.read_parquet(out_dir).to_pandas()
    assert len(res) == 100 and (res["n_tokens"] == 6).all()


def test_partitioned_parquet_sink(tmp_path):
    """partition_cols on the parquet sink: hive layout (one dir per key),
    partition-pruned reads see only their key's rows, full read == unsorted
    full table."""
    import ray.data

    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        PipelineSpec,
        run_pipeline,
    )

    out_dir = str(tmp_path / "bylang")
    run_pipeline(PipelineSpec.from_dict({
        "sources": [{"name": "docs", "path": os.path.join(SF, "documents.parquet"),
                     "columns": ["doc_id", "lang", "n_chars"]}],
        "imports": [{"name": "p", "source": "docs", "id_column": "doc_id",
                     "sink": "parquet", "target": out_dir,
                     "partition_cols": ["lang"]}],
    }))
    dirs = sorted(d for d in os.listdir(out_dir) if d.startswith("lang="))
    assert len(dirs) >= 2
    src = pd.read_parquet(os.path.join(SF, "documents.parquet"), columns=["doc_id", "lang", "n_chars"])
    full = ray.data.read_parquet(out_dir).to_pandas()
    assert sorted(full["doc_id"]) == sorted(src["doc_id"])
    # pruned read: one partition holds exactly its language's docs
    one = dirs[0].split("=", 1)[1]
    sub = ray.data.read_parquet(os.path.join(out_dir, dirs[0])).to_pandas()
    assert len(sub) == (src["lang"] == one).sum()


def test_builtin_percolate_query_string_in_spec(tmp_path):
    """A config-only alerting pipeline: stream documents through registered
    Lucene query_string trees and sink the (doc_id, query_id) matches."""
    import ray.data

    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        PipelineSpec,
        run_pipeline,
    )
    from elasticsearch_data_import_handler_ray.stages.percolate import (
        percolate_query_string,
    )

    out_dir = str(tmp_path / "alerts")
    queries = [
        {"query_id": "pair", "q": "hash AND join"},
        {"query_id": "big", "q": "vector AND n_chars:[300 TO *]"},
    ]
    d = {
        "sources": [
            {"name": "docs", "path": os.path.join(SF, "documents.parquet"),
             "columns": ["doc_id", "text", "n_chars"]}
        ],
        "imports": [
            # no id_column: percolation matches are (doc_id, query_id) PAIRS,
            # the ES auto-id case — rows must pass through un-deduped
            {"name": "alerts", "source": "docs",
             "sink": "parquet", "target": out_dir,
             "steps": [{"builtin": "percolate_query_string",
                        "params": {"queries": queries, "analyzer": "whitespace"}}]}
        ],
    }
    run_pipeline(PipelineSpec.from_dict(d))
    got = (ray.data.read_parquet(out_dir).to_pandas()
           .sort_values(["query_id", "doc_id"]).reset_index(drop=True))
    src = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text", "n_chars"]
    )
    want = (percolate_query_string(src, queries, analyzer="whitespace").to_pandas()
            .sort_values(["query_id", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "query_id"]], want[["doc_id", "query_id"]], check_dtype=False
    )
    assert len(got) > 0 and set(got.query_id) == {"pair", "big"}
