"""Watermark incremental state, doc resolution, IVF ANN."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_data_import_handler_ray.state.watermark import WatermarkState


def test_watermark_lifecycle(tmp_path):
    p = str(tmp_path / "wm.json")
    wm = WatermarkState(p)
    assert wm.last("ev") is None
    with wm.run("ev") as w:
        assert w.last is None
        w.advance("2024-01-01T00:00:00")
    assert wm.last("ev") == "2024-01-01T00:00:00"
    # reload from disk
    wm2 = WatermarkState(p)
    assert wm2.last("ev") == "2024-01-01T00:00:00"
    # never goes backwards
    with wm2.run("ev") as w:
        w.advance("2023-06-01T00:00:00")
    assert wm2.last("ev") == "2024-01-01T00:00:00"
    # crash (exception) → not advanced
    with pytest.raises(RuntimeError):
        with wm2.run("ev") as w:
            w.advance("2025-01-01T00:00:00")
            raise RuntimeError("boom")
    assert WatermarkState(p).last("ev") == "2024-01-01T00:00:00"


def test_watermark_incremental_window(tmp_path, sf_dir):
    """The reference's {lastRun} predicate over the events table: run twice,
    second run sees only rows newer than the first run's max ts."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    cut = pa.scalar(pd.Timestamp("2024-01-15"))
    old = ev.filter(pc.less_equal(ev["ts"], cut))
    wm = WatermarkState(str(tmp_path / "wm.json"))
    with wm.run("events") as w:
        assert w.last is None  # first run: full window
        w.advance(str(pa.compute.max(old["ts"]).as_py()))
    with wm.run("events") as w:
        newer = ev.filter(pc.greater(ev["ts"], pa.scalar(pd.Timestamp(w.last))))
        assert newer.num_rows == ev.num_rows - old.num_rows
        assert all(t > pd.Timestamp(w.last) for t in newer["ts"].to_pylist()[:50])


def test_query_engine_resolve(tiny_corpus, tmp_path_factory):
    from elasticsearch_data_import_handler_ray.index.build import build_index
    from elasticsearch_data_import_handler_ray.index.query import QueryEngine
    from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig

    d = str(tmp_path_factory.mktemp("resolve") / "idx")
    build_index(tiny_corpus, d, mode="full", config=IndexConfig(num_segments=4))
    eng = QueryEngine(d)
    try:
        hits = eng.search("hot_term_0", k=5)
        ids = [h[0] for h in hits]
        rows = eng.resolve(ids)
        assert set(rows["doc_id"].astype("uint64")) == set(np.array(ids, dtype=np.uint64))
        assert {"repo", "path", "commit", "sha256", "doc_len"} <= set(rows.columns)
        assert (rows["doc_len"] > 0).all()
    finally:
        eng.close()


def test_knn_ivf_recall_vs_bruteforce():
    from elasticsearch_data_import_handler_ray.stages.ann import knn_bruteforce, knn_ivf

    rng = np.random.default_rng(9)
    # clustered data so IVF lists are meaningful
    centers = rng.standard_normal((8, 16)) * 3
    m = np.concatenate([c + rng.standard_normal((40, 16)) * 0.3 for c in centers])
    ids = np.arange(len(m))
    t = pa.table(
        {"vec_id": pa.array(ids, type=pa.int64()),
         "embedding": pa.array([list(map(float, r)) for r in m], type=pa.list_(pa.float32()))}
    )
    ds = ray.data.from_arrow(t)
    brute = knn_bruteforce(ds, ids[:5], m[:5], k=5).to_pandas()
    ivf = knn_ivf(ds, ids[:5], m[:5], k=5, n_lists=8, nprobe=3).to_pandas()
    recall = 0.0
    for qid in range(5):
        b = set(brute[brute.query_id == qid].neighbor_id)
        v = set(ivf[ivf.query_id == qid].neighbor_id)
        recall += len(b & v) / len(b)
    assert recall / 5 >= 0.8  # nprobe=3/8 on well-separated clusters


def test_auto_merge_compaction(tiny_corpus, tmp_path_factory):
    from elasticsearch_data_import_handler_ray.index.build import build_index
    from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig, Manifest
    from fixtures.gen_corpus import corpus_files

    files = corpus_files(tiny_corpus)
    d = str(tmp_path_factory.mktemp("amerge") / "idx")
    cfg = IndexConfig(num_segments=4)
    build_index(files[:1], d, mode="full", config=cfg)
    build_index(files[:2], d, mode="incremental", auto_merge_runs=3)
    assert len(Manifest.load(d).complete_runs()) == 2  # below threshold
    build_index(files[:3], d, mode="incremental", auto_merge_runs=3)
    man = Manifest.load(d)
    assert len(man.complete_runs()) == 1  # compacted
    assert next(iter(man.complete_runs())).startswith("merged-")


def test_multimodal_resize_and_frames():
    import pyarrow as pa
    import ray.data

    from elasticsearch_data_import_handler_ray.stages.multimodal import (
        FrameSampleStage,
        MediaResizeStage,
        synthesize_media_dataset,
    )

    docs = pa.table(
        {"doc_id": pa.array(list(range(6)), type=pa.int64()),
         "text": pa.array(["abcdefgh"] * 6, type=pa.large_string())}
    )
    media = synthesize_media_dataset(docs, "doc_id", "text")
    ds = ray.data.from_arrow(media)
    resized = ds.map_batches(
        MediaResizeStage, batch_format="pyarrow", batch_size=2, concurrency=1,
        fn_constructor_kwargs=dict(width=64, height=48),
    ).to_pandas()
    assert (resized.width == 64).all() and (resized.height == 48).all()
    frames = ds.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=2, concurrency=1,
        fn_constructor_kwargs=dict(n_frames=4),
    ).to_pandas()
    # kinds cycle image/audio/video -> 2 videos of 6 rows, 4 frames each
    assert len(frames) == 8
    assert set(frames.frame_idx) == {0, 1, 2, 3}


def test_resolve_and_verify_after_merge(tiny_corpus, tmp_path_factory):
    """docmap_dirs survive compaction: sha verification and doc resolution
    still work on a merged index (the merged run carries docmap_dirs)."""
    import os

    from elasticsearch_data_import_handler_ray.index.build import build_index, verify_hashes
    from elasticsearch_data_import_handler_ray.index.merge import merge_index
    from elasticsearch_data_import_handler_ray.index.query import QueryEngine
    from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
    from fixtures.gen_corpus import corpus_files

    files = corpus_files(tiny_corpus)
    d = str(tmp_path_factory.mktemp("rvm") / "idx")
    build_index(files[:2], d, mode="full", config=IndexConfig(num_segments=4))
    build_index(files, d, mode="incremental")
    merge_index(d)
    n = verify_hashes(d, os.path.join(tiny_corpus, "corpus_sha256.parquet"))
    assert n == 1000
    eng = QueryEngine(d)
    try:
        hits = eng.search("hot_term_1", k=3)
        rows = eng.resolve([h[0] for h in hits])
        assert len(rows) == len(hits)
    finally:
        eng.close()
