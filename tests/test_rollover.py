"""Rollover / ILM (index/rollover.py): generations roll at the doc
threshold, the read alias sees all generations with scores bit-identical to
one index over everything, incremental lineage holds within a generation,
and retention drops only old generations."""

import os

import pytest

from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.index.rollover import (
    create_rollover_alias,
    open_alias,
    retention_drop,
    rollover_import,
)
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
from fixtures.gen_corpus import corpus_files


def test_rollover_lifecycle(tiny_corpus, tmp_path_factory):
    files = corpus_files(tiny_corpus)  # 4 files x 250 docs
    assert len(files) == 4
    root = str(tmp_path_factory.mktemp("roll") / "alias")
    cfg = IndexConfig(analyzer="code", num_segments=2)
    create_rollover_alias(root, cfg)
    with pytest.raises(RuntimeError, match="already holds"):
        create_rollover_alias(root, cfg)
    with pytest.raises(RuntimeError, match="no data"):
        open_alias(root)

    # 500-doc threshold: files land pairwise into generations
    r1 = rollover_import(root, files[:1], max_docs=500)
    assert r1 == {"written_to": "idx-000001", "n_docs": 250, "rolled_to": None}
    r2 = rollover_import(root, files[:2], max_docs=500)  # incremental: only file 2 new
    assert r2["written_to"] == "idx-000001" and r2["n_docs"] == 500
    assert r2["rolled_to"] == "idx-000002"
    r3 = rollover_import(root, files[2:3], max_docs=500)
    assert r3["written_to"] == "idx-000002" and r3["n_docs"] == 250
    r4 = rollover_import(root, files[3:], max_docs=500)
    assert r4["written_to"] == "idx-000002" and r4["rolled_to"] == "idx-000003"

    # alias over the generations == one index over all files, bit-identical
    union_dir = str(tmp_path_factory.mktemp("roll_u") / "u")
    build_index(files, union_dir, mode="full",
                config=IndexConfig(analyzer="code", num_segments=4))
    alias = open_alias(root)
    union = QueryEngine(union_dir)
    try:
        assert alias.N == union.N == 1000
        assert alias.avgdl == union.avgdl
        for text in ["parse json buffer", "hot_term_0 merge", "alloc free pool"]:
            assert alias.search(text, k=10) == union.search(text, k=10), text
    finally:
        alias.close()
        union.close()

    # retention: dropping to the last 1 closed generation removes idx-000001
    dropped = retention_drop(root, keep_last=1)
    assert dropped == ["idx-000001"]
    assert not os.path.exists(os.path.join(root, "idx-000001"))
    alias2 = open_alias(root)
    try:
        assert alias2.N == 500  # only generation 2 holds docs
        assert alias2.search("parse", k=3)
    finally:
        alias2.close()
