"""Delete-by-id tombstones (index/tombstones.add_deletions): masked at query
time immediately, purged physically at merge, resurrected by a later
re-import — the retention-workflow shape a 100 TB corpus needs."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions.analysis import get_analyzer
from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.fsck import verify_index
from elasticsearch_data_import_handler_ray.index.merge import merge_index
from elasticsearch_data_import_handler_ray.index.oracle import BM25Oracle
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.index.tombstones import add_deletions
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig, Manifest


@pytest.fixture()
def built(sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=4, doc_id_col="doc_id", content_col="text"
        ),
    )
    return idx


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(os.path.join(sf_dir, "documents.parquet"))


def _oracle_without(docs, dead: set):
    keep = [i for i, d in enumerate(docs["doc_id"].to_pylist()) if d not in dead]
    sub = docs.take(keep)
    return BM25Oracle(
        get_analyzer("whitespace"),
        sub["doc_id"].to_numpy(zero_copy_only=False).astype("uint64"),
        sub["text"].combine_chunks(),
    )


def test_delete_masks_and_merge_purges(built, docs, tmp_path):
    all_ids = docs["doc_id"].to_pylist()
    dead = set(all_ids[::7])  # delete every 7th doc
    assert add_deletions(built, dead) == len(dead)
    want = _oracle_without(docs, dead)

    eng = QueryEngine(built)
    try:
        assert eng.N == want.N
        assert eng.avgdl == pytest.approx(want.avgdl, rel=0, abs=0)
        for text, mode in [("hash join query", "or"), ("vector scan", "or"), ("the data", "and")]:
            got = eng.search(text, k=10, mode=mode, method="exhaustive")
            assert got == [(d, s) for d, s in want.search(text, k=10, mode=mode)], (text, mode)
        # deleted docs gone from match sets / counts
        assert eng.count("hash join query") == len(
            want.search("hash join query", k=want.N, mode="or")
        )
    finally:
        eng.close()

    # merge purges physically; byte-identical to a full build without them
    merge_index(built)
    assert not os.path.isdir(os.path.join(built, "deletes"))
    rep = verify_index(built)
    assert rep["n_superseded"] == 0 and rep["n_docs"] == want.N

    keep = [i for i, d in enumerate(docs["doc_id"].to_pylist()) if d not in dead]
    latest = str(tmp_path / "latest.parquet")
    pq.write_table(docs.take(keep), latest)
    full_idx = str(tmp_path / "full")
    build_index(
        latest, full_idx, mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=4, doc_id_col="doc_id", content_col="text"
        ),
    )
    man_m, man_f = Manifest.load(built), Manifest.load(full_idx)
    assert man_m.n_docs == man_f.n_docs and man_m.sum_dl == man_f.sum_dl
    for s in range(4):
        dm, df_ = man_m.segment_dirs(s), man_f.segment_dirs(s)
        with open(os.path.join(dm[0], "postings.bin"), "rb") as a, open(
            os.path.join(df_[0], "postings.bin"), "rb"
        ) as b:
            assert a.read() == b.read(), f"seg {s}"


def test_reimport_after_delete_resurrects(built, docs, tmp_path):
    victim = int(docs["doc_id"][3].as_py())
    add_deletions(built, [victim])
    eng = QueryEngine(built)
    try:
        assert eng.N == len(docs) - 1
    finally:
        eng.close()
    # re-import the doc (same id, same content) in a new incremental run —
    # its seq is higher than the deletion's at_seq, so it resurrects
    upd = str(tmp_path / "reimport.parquet")
    pq.write_table(docs.slice(3, 1), upd)
    build_index([upd], built, mode="incremental")
    eng = QueryEngine(built)
    try:
        assert eng.N == len(docs)  # resurrected
        assert eng.explain("the", victim)["matched"]  # participates again
    finally:
        eng.close()


def test_delete_unknown_ids_noop(built, docs):
    add_deletions(built, [999999999, 888888888])
    eng = QueryEngine(built)
    try:
        assert eng.N == len(docs)
    finally:
        eng.close()
    merge_index(built)  # clears the inert deletion files
    assert not os.path.isdir(os.path.join(built, "deletes"))
