"""more_like_this by doc_id (ES MLT over _source): the index stores the
content column as doc-values, the engine reconstructs the like-text from the
docmap, and the source doc is excluded from results."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions.analysis import get_analyzer
from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.oracle import BM25Oracle
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig


@pytest.fixture(scope="module")
def mlt_setup(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("mlt") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=4, doc_id_col="doc_id",
            content_col="text", store_cols=("text",),
        ),
    )
    eng = QueryEngine(idx)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    oracle = BM25Oracle(
        get_analyzer("whitespace"),
        docs["doc_id"].to_numpy().astype("uint64"),
        pa.array(docs["text"], type=pa.large_string()),
    )
    yield eng, docs, oracle
    eng.close()


def test_mlt_by_doc_id_excludes_source(mlt_setup):
    eng, docs, oracle = mlt_setup
    for doc_id in docs["doc_id"].iloc[[0, 7, 42]]:
        text = docs.loc[docs["doc_id"] == doc_id, "text"].iloc[0]
        got = eng.more_like_this(int(doc_id), k=10, max_query_terms=10)
        want = [
            (d, s)
            for d, s in oracle.more_like_this(text, k=11, max_query_terms=10)
            if d != int(doc_id)
        ][:10]
        assert got == want, doc_id
        assert all(d != int(doc_id) for d, _ in got)


def test_mlt_unknown_doc_id(mlt_setup):
    eng, docs, _ = mlt_setup
    assert eng.more_like_this(10**15 + 7, k=5) == []


def test_mlt_by_doc_id_needs_stored_source(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("mltns") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=2, doc_id_col="doc_id",
            content_col="text",
        ),
    )
    eng = QueryEngine(idx)
    try:
        with pytest.raises(ValueError, match="store_cols"):
            eng.more_like_this(int(0), k=5)
    finally:
        eng.close()


def test_mlt_unlike_strikes_terms(mlt_setup):
    """ES MLT `unlike`: the negative example's terms never enter the query —
    equal to running MLT on the like-text with those terms removed."""
    eng, docs, oracle = mlt_setup
    like = str(docs["text"].iloc[0])
    unlike = "hash join query scan"
    got = eng.more_like_this(like, k=10, unlike=unlike, max_query_terms=10)
    struck = set(unlike.split())
    pruned = " ".join(t for t in like.lower().split() if t not in struck)
    want = eng.more_like_this(pruned, k=10, max_query_terms=10)
    assert got == want
    # and differs from the un-struck query when a struck term was selected
    base = eng.more_like_this(like, k=10, max_query_terms=10)
    if any(t in struck for t in like.lower().split()):
        assert got != base or pruned == like.lower()
