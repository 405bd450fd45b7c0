"""update_by_query (index/update.py): ES _update_by_query semantics — the
query_string match set is rewritten via the caller's batch transform and
UPSERTED (incremental build supersedes old versions; df/N corrected)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.index.update import update_by_query
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig


@pytest.fixture()
def docs_index(sf_dir, tmp_path):
    index_dir = str(tmp_path / "ubq_idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        config=IndexConfig(
            analyzer="whitespace", num_segments=4,
            doc_id_col="doc_id", content_col="text", store_cols=("text", "lang"),
        ),
    )
    return index_dir


def _make_tag_transform():
    # defined as a closure so cloudpickle ships it by VALUE — a module-level
    # function in tests/ would be pickled by reference and fail to import on
    # Ray workers (tests are not on the worker sys.path)
    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        tagged = _pc.binary_join_element_wise(t["text"], "ubqtagged", " ")
        return t.set_column(t.column_names.index("text"), "text", tagged)

    return tag


def test_update_by_query_upserts_matches(docs_index):
    eng = QueryEngine(docs_index)
    before = eng.query_string("hash AND join", k=0)
    n_before = eng.count("hash")
    assert before
    eng.close()

    res = update_by_query(docs_index, "hash AND join", _make_tag_transform())
    assert res["matched"] == len(before) and res["updated"] == len(before)

    eng = QueryEngine(docs_index)
    try:
        # the tag is searchable on exactly the matched docs
        tagged = eng.query_string("ubqtagged", k=0)
        assert sorted(d for d, _ in tagged) == sorted(d for d, _ in before)
        # updated docs still match their original terms (content preserved)
        after = eng.query_string("hash AND join", k=0)
        assert sorted(d for d, _ in after) == sorted(d for d, _ in before)
        # no doc duplication: global df of a term present everywhere unchanged
        assert eng.count("hash") == n_before
        # stored fields survive: resolve returns one row per updated doc
        r = eng.resolve([d for d, _ in tagged][:5])
        assert len(r["doc_id"]) == min(5, len(tagged))
    finally:
        eng.close()


def test_update_by_query_no_match_noop(docs_index):
    res = update_by_query(docs_index, "zzneverseenterm", _make_tag_transform())
    assert res == {"matched": 0, "updated": 0}


def test_update_by_query_rejects_identity_change(docs_index):
    def bad(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        ids = _pc.add(t["doc_id"], 1)
        return t.set_column(t.column_names.index("doc_id"), "doc_id", ids)

    with pytest.raises(Exception, match="identity"):
        update_by_query(docs_index, "hash", bad)


def test_update_by_query_requires_stored_source(sf_dir, tmp_path):
    index_dir = str(tmp_path / "nosrc")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        config=IndexConfig(analyzer="whitespace", num_segments=2,
                           doc_id_col="doc_id", content_col="text"),
    )
    with pytest.raises(ValueError, match="_source"):
        update_by_query(index_dir, "hash", _make_tag_transform())
