"""Reindex (rebuild from stored _source with a new config) and match-set
export (the ES scroll analogue): oracle = a fresh direct build over the same
corpus / the whitespace match predicate in pandas."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.index.reindex import reindex
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig, Manifest

QUERIES = ["hash join query", "vector scan filter", "merge sort"]


@pytest.fixture(scope="module")
def src_index(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("reidx") / "src")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="code", num_segments=4, doc_id_col="doc_id",
            content_col="text", store_cols=("text", "lang"),
        ),
    )
    return idx


def test_reindex_new_analyzer_matches_direct_build(sf_dir, src_index, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("reidx") / "dst")
    res = reindex(src_index, dst, analyzer="whitespace", num_segments=2)
    assert res.n_docs == Manifest.load(src_index).n_docs

    direct = str(tmp_path_factory.mktemp("reidx") / "direct")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        direct,
        mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=2, doc_id_col="doc_id",
            content_col="text", store_cols=("text", "lang"),
        ),
    )
    a, b = QueryEngine(dst), QueryEngine(direct)
    try:
        assert a.N == b.N and a.avgdl == b.avgdl
        for q in QUERIES:
            assert a.search(q, k=10) == b.search(q, k=10), q
    finally:
        a.close()
        b.close()


def test_reindex_respects_deletions(src_index, tmp_path_factory):
    from elasticsearch_data_import_handler_ray.index.tombstones import add_deletions

    add_deletions(src_index, list(range(10)))
    dst = str(tmp_path_factory.mktemp("reidx") / "dst_del")
    reindex(src_index, dst, analyzer="whitespace")
    eng = QueryEngine(dst)
    try:
        src_n = QueryEngine(src_index)
        try:
            assert eng.N == src_n.N  # live view matches the tombstoned source
        finally:
            src_n.close()
        assert len(eng.resolve(list(range(10)))) == 0  # deleted docs absent
    finally:
        eng.close()


def test_reindex_needs_stored_source(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("reidx") / "nosrc")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="code", num_segments=2, doc_id_col="doc_id", content_col="text",
        ),
    )
    with pytest.raises(ValueError, match="store_cols"):
        reindex(idx, str(tmp_path_factory.mktemp("reidx") / "x"))


def _ws_matches(docs, text, mode="or"):
    terms = set(text.lower().split())
    toks = docs["text"].str.lower().str.split()
    if mode == "and":
        return toks.apply(lambda ts: terms <= set(ts))
    return toks.apply(lambda ts: bool(terms & set(ts)))


def test_export_matches(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("exp") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=4, doc_id_col="doc_id",
            content_col="text", store_cols=("lang",),
        ),
    )
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    eng = QueryEngine(idx)
    try:
        out = str(tmp_path_factory.mktemp("exp") / "out")
        res = eng.export_matches("hash join query", out, fields=("lang",))
        m = _ws_matches(docs, "hash join query")
        want = docs.loc[m, ["doc_id", "lang"]].sort_values("doc_id")
        assert res["n_rows"] == int(m.sum())
        got = (
            pq.read_table(res["files"]).to_pandas().sort_values("doc_id")
        )
        assert got["doc_id"].astype("int64").tolist() == want["doc_id"].tolist()
        assert got["lang"].tolist() == want["lang"].tolist()

        # with_scores: every exported score equals the search score
        res2 = eng.export_matches("hash join query", out + "2", with_scores=True)
        got2 = pq.read_table(res2["files"]).to_pandas()
        top = dict(eng.search("hash join query", k=10))
        s_of = dict(zip(got2["doc_id"].astype(np.uint64), got2["score"]))
        for d, s in top.items():
            assert s_of[d] == s

        assert eng.export_matches("zzzneverseen", out + "3")["n_rows"] == 0
    finally:
        eng.close()
