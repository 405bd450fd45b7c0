"""Regression tests for round-3 ADVICE findings: hybrid_search self-match
sentinel, rollover generation-name monotonicity after retention, repeated-
span fallback-shingle strictness, reindex staging cleanup, and regexp
validation with the executing engine (RE2)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.index.rollover import (
    create_rollover_alias,
    retention_drop,
    rollover_import,
)
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
from fixtures.gen_corpus import corpus_files


def test_hybrid_vec0_not_excluded(tmp_path):
    """ADVICE r3 #1: hybrid_search must not exclude vec_id 0 from the vector
    ranking (the old dummy query_id 0 collided with a real vec_id). Query
    with vec 0's own embedding: vec 0 must LEAD the fused ranking."""
    from elasticsearch_data_import_handler_ray.pipelines.hybrid import hybrid_search

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((40, 8))
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(40, dtype=np.int64)),
            "content": pa.array(
                ["alpha beta" if i % 2 else "gamma delta" for i in range(40)]
            ),
        }
    )
    src = tmp_path / "docs.parquet"
    import pyarrow.parquet as pq

    pq.write_table(docs, str(src))
    idx = str(tmp_path / "idx")
    build_index(
        [str(src)],
        idx,
        mode="full",
        config=IndexConfig(analyzer="whitespace", num_segments=1, doc_id_col="doc_id"),
    )
    emb_ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(40, dtype=np.int64)),
                "embedding": pa.array(list(emb), type=pa.list_(pa.float64())),
            }
        )
    )
    eng = QueryEngine(idx)
    try:
        got = hybrid_search(eng, emb_ds, "alpha", emb[0], k=5, n_each=10)
    finally:
        eng.close()
    # vec 0 is the exact query vector → cosine rank 1 → must appear fused
    assert any(d == 0 for d, _ in got), got
    # and specifically: RRF gives it at least the 1/(60+1) vector term
    top_vec_score = dict(got).get(0, 0.0)
    assert top_vec_score >= 1.0 / 61 - 1e-12


def test_rollover_name_monotonic_after_retention(tiny_corpus, tmp_path_factory):
    """ADVICE r3 #2: after retention_drop shrinks members, the next roll must
    NOT reuse a live generation's name (old code: idx-{len(members)+1})."""
    files = corpus_files(tiny_corpus)
    root = str(tmp_path_factory.mktemp("roll_mono") / "alias")
    create_rollover_alias(root, IndexConfig(analyzer="code", num_segments=2))
    rollover_import(root, files[:1], max_docs=200)  # fills + rolls gen 1
    rollover_import(root, files[1:2], max_docs=200)  # fills + rolls gen 2
    dropped = retention_drop(root, keep_last=1)
    assert dropped == ["idx-000001"]
    r = rollover_import(root, files[2:3], max_docs=200)
    # write pointer was idx-000003; next roll must mint idx-000004, never
    # collide with the live idx-000002
    assert r["written_to"] == "idx-000003"
    assert r["rolled_to"] == "idx-000004"
    assert os.path.isdir(os.path.join(root, "idx-000002"))


def test_repeated_spans_ignore_short_doc_fallback():
    """ADVICE r3 #3: duplicate docs SHORTER than the window must not be
    reported as repeated window-token spans (whole-doc fallback shingles)."""
    from elasticsearch_data_import_handler_ray.stages.dedup import (
        repeated_ngram_spans,
    )

    short = "tiny dup doc"  # 3 tokens << window
    long_rep = " ".join(f"tok{i}" for i in range(30))
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array([short, short, long_rep, long_rep]),
        }
    )
    out = repeated_ngram_spans(
        ray.data.from_arrow(t), window=20, stride=5, min_docs=2, num_buckets=4
    )
    got_docs = set(out["doc_id"].to_pylist())
    assert got_docs == {3, 4}, out.to_pydict()


def test_reindex_stages_outside_index_dir(tiny_corpus, tmp_path_factory):
    """ADVICE r3 #4: reindex must not leave a _reindex_src corpus copy inside
    the destination index directory (snapshots would carry it forever)."""
    from elasticsearch_data_import_handler_ray.index.reindex import reindex

    files = corpus_files(tiny_corpus)[:1]
    src = str(tmp_path_factory.mktemp("reidx") / "src")
    build_index(
        files,
        src,
        mode="full",
        config=IndexConfig(analyzer="code", num_segments=2, store_cols=("content",)),
    )
    dst = str(tmp_path_factory.mktemp("reidx") / "dst")
    reindex(src, dst, num_segments=1)
    assert not os.path.exists(os.path.join(dst, "_reindex_src"))
    # and the rebuilt index answers queries
    eng = QueryEngine(dst)
    try:
        assert eng.N == 250
        assert eng.search("parse", k=3)
    finally:
        eng.close()


def test_regexp_validation_matches_executor(tiny_corpus, tmp_path_factory):
    """ADVICE r3 #5: patterns Python `re` accepts but RE2 rejects
    (lookarounds) must raise a clean ValueError on the driver, not an opaque
    RayTaskError from inside shard actors."""
    files = corpus_files(tiny_corpus)[:1]
    idx = str(tmp_path_factory.mktemp("rex") / "idx")
    build_index(files, idx, mode="full", config=IndexConfig(analyzer="code", num_segments=2))
    eng = QueryEngine(idx)
    try:
        with pytest.raises(ValueError):
            eng.search_regexp(r"pa(?=rse)")  # lookahead: valid re, invalid RE2
        # sane patterns still work end-to-end
        hits = eng.search_regexp(r"pars.*", k=5)
        assert hits
    finally:
        eng.close()
