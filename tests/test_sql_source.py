"""SQL-database source (sources/catalog.py register_sql + spec format="sql")
— the reference's headline sources.jdbc block, sqlite-backed here (the only
DB in the sandbox; the connection-factory surface is DB-agnostic)."""

import os
import sqlite3

import pytest

from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.sources.catalog import Catalog

DOCS = [
    (0, "parse json buffer stream", "en"),
    (1, "hash join query planner", "en"),
    (2, "merge sort run generator", "de"),
    (3, "vector scan filter kernel", "en"),
    (4, "alloc free pool arena", "fr"),
    (5, "hash join probe build side", "en"),
]


def _make_db(path: str) -> None:
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT, lang TEXT)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", DOCS)
    con.commit()
    con.close()


def _connect_factory(path):
    from functools import partial

    return partial(sqlite3.connect, path)


def test_register_sql_reads_table(tmp_path):
    db = str(tmp_path / "src.sqlite3")
    _make_db(db)
    cat = Catalog()
    cat.register_sql("docs", "SELECT doc_id, text, lang FROM docs", _connect_factory(db))
    got = cat["docs"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 6
    assert list(got.columns) == ["doc_id", "text", "lang"]
    assert got["text"][1] == "hash join query planner"
    # the SELECT is pushed to the database: a WHERE prunes at the source
    cat.register_sql(
        "en_docs", "SELECT doc_id, text FROM docs WHERE lang = 'en'", _connect_factory(db)
    )
    assert cat["en_docs"].count() == 4


def test_sql_source_to_index_spec(tmp_path):
    """Config-file shape: sqlite → SQL-step transform → index sink → green
    BM25 query (the reference's end-to-end DB-import pipeline)."""
    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        PipelineSpec,
        run_pipeline,
    )

    db = str(tmp_path / "src.sqlite3")
    _make_db(db)
    idx = str(tmp_path / "idx")
    d = {
        "sources": [
            {
                "name": "docs",
                "path": db,
                "format": "sql",
                "sql": "SELECT doc_id, text FROM docs WHERE doc_id < 5",
            }
        ],
        "imports": [
            {
                "name": "docs_index",
                "source": "docs",
                "id_column": "doc_id",
                "sink": "index",
                "target": idx,
                "index_content_col": "text",
                "index_analyzer": "whitespace",
                "index_num_segments": 2,
            }
        ],
    }
    results = run_pipeline(PipelineSpec.from_dict(d))
    assert results["docs_index"]["status"] == "complete", results
    assert results["docs_index"]["n_docs"] == 5  # doc 5 excluded by the SQL
    eng = QueryEngine(idx)
    try:
        hits = eng.search("hash join", k=5, mode="and")
        assert [d for d, _ in hits] == [1]  # doc 5 matches too but was pruned
        assert eng.search("planner", k=5)
    finally:
        eng.close()


def test_sql_source_incremental_mode_rejected(tmp_path):
    """Incremental index staging is file-lineage-keyed; DB sources must use
    the {lastRun} watermark instead — the spec layer says so explicitly."""
    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        PipelineSpec,
        run_pipeline,
    )

    db = str(tmp_path / "src.sqlite3")
    _make_db(db)
    d = {
        "sources": [
            {"name": "docs", "path": db, "format": "sql",
             "sql": "SELECT doc_id, text FROM docs"}
        ],
        "imports": [
            {"name": "i", "source": "docs", "id_column": "doc_id",
             "sink": "index", "target": str(tmp_path / "idx2"), "mode": "incremental"}
        ],
    }
    results = run_pipeline(PipelineSpec.from_dict(d))
    assert results["i"]["status"] == "error"
    assert "lastRun" in results["i"]["error"]


def test_sql_source_lastrun_watermark(tmp_path):
    """The reference's incremental contract for DB sources: substitute the
    persisted watermark into the SQL (WHERE modified > '{lastRun}')."""
    from elasticsearch_data_import_handler_ray.state.watermark import WatermarkState

    db = str(tmp_path / "src.sqlite3")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT, modified TEXT)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?)",
        [(i, f"doc number {i}", f"2024-01-0{i+1}T00:00:00") for i in range(5)],
    )
    con.commit()
    con.close()

    wm = WatermarkState(str(tmp_path / "wm.json"))
    sql = "SELECT doc_id, text, modified FROM docs WHERE modified > '{lastRun}'"
    cat = Catalog()
    with wm.run("docs_import") as w:
        cat.register_sql(
            "d1", sql.format(lastRun=w.last or "1970-01-01T00:00:00"), _connect_factory(db)
        )
        rows = cat["d1"].to_pandas()
        assert len(rows) == 5  # first run: everything
        w.advance(rows["modified"].max())
    assert wm.last("docs_import") == "2024-01-05T00:00:00"
    # second run: only rows newer than the watermark (none yet)
    with wm.run("docs_import") as w:
        cat.register_sql(
            "d2", sql.format(lastRun=w.last), _connect_factory(db)
        )
        assert cat["d2"].count() == 0
    # new row lands → third run picks up exactly it
    con = sqlite3.connect(db)
    con.execute("INSERT INTO docs VALUES (9, 'fresh doc', '2024-02-01T00:00:00')")
    con.commit()
    con.close()
    with wm.run("docs_import") as w:
        cat.register_sql("d3", sql.format(lastRun=w.last), _connect_factory(db))
        rows = cat["d3"].to_pandas()
        assert rows["doc_id"].tolist() == [9]
        w.advance(rows["modified"].max())
    assert wm.last("docs_import") == "2024-02-01T00:00:00"
