"""Round-5 FULL-SQL upgrades for the last rows-only window entry: the
query_string_search / fuzzy_wildcard_search registry entries must be
value-identical to their DuckDB oracles (the driver's compare protocol:
row count + sorted-column schema + order-insensitive values)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("uint", "int")):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(entrymod, name: str, sf_dir: str):
    import glob

    got = entrymod.queries()[name](sf_dir).to_pandas()
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        v = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(entrymod.oracle_sql()[name]).df()
    con.close()
    assert len(got) == len(want), name
    assert sorted(got.columns) == sorted(want.columns), name
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    assert len(got) > 0, f"{name}: vacuous"


def test_query_string_search_full_sql(entrymod, sf_dir):
    _compare(entrymod, "query_string_search", sf_dir)


def test_fuzzy_wildcard_full_sql(entrymod, sf_dir):
    _compare(entrymod, "fuzzy_wildcard_search", sf_dir)


@pytest.mark.parametrize("name", [
    "dis_max_search", "boosting_search", "suggest_phrase", "suggest_complete",
    "extended_stats_search", "range_agg_search", "filters_agg_search",
    "train_split", "shuffle_order",
    # session 2
    "search_as_you_type", "term_df_shingle", "span_search",
    "match_bool_prefix_search", "multi_terms_search",
    "adjacency_matrix_search", "rare_terms_search",
    "significant_text_search", "terms_set_search", "composite_agg_search",
    "distance_feature_search", "rank_feature_search", "terms_stats_search",
    "termvectors", "combined_fields_search", "sql_dist_exists",
    "sql_dist_derived", "runtime_field_search", "percolate_spans",
])
def test_round5_entries_vs_oracle(entrymod, sf_dir, name):
    # the round-5 additions, pinned in-suite with the driver's compare
    # protocol (the full gate also covers them at sf0.01)
    _compare(entrymod, name, sf_dir)


def test_code_analyzer_is_whitespace_on_corpus(sf_dir):
    # the bm25_topk_code FULL-SQL oracle rests on this: the code analyzer
    # degenerates to whitespace on the plain-lowercase-word corpus, so the
    # whitespace token algebra is exact for the code-analyzer index too
    import pyarrow.parquet as pq

    from elasticsearch_data_import_handler_ray.functions.analysis import (
        CodeAnalyzer,
        WhitespaceAnalyzer,
    )

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    ca, wa = CodeAnalyzer(), WhitespaceAnalyzer()
    for v in t["text"].to_pylist():
        assert ca.analyze_query(v) == wa.analyze_query(v)


def test_query_string_code_nonvacuous(entrymod, sf_dir):
    # the rows-only code-analyzer twin keeps the non-SQL leaf surface alive
    t = entrymod.queries()["query_string_code"](sf_dir).to_pandas()
    assert len(t) > 0
    assert set(t.columns) == {"query_idx", "rank", "doc_id", "score"}
