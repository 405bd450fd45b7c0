"""Dedup / ANN / text / multimodal stage tests with planted ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_data_import_handler_ray.stages.ann import cosine_neardup_pairs, knn_bruteforce
from elasticsearch_data_import_handler_ray.stages.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from elasticsearch_data_import_handler_ray.stages.multimodal import (
    DeterministicFakeDecoder,
    MediaFeatureStage,
    synthesize_media_dataset,
)
from elasticsearch_data_import_handler_ray.stages.text import LangId


def _docs_with_dups():
    base = (
        "the quick brown fox jumps over the lazy dog while reading json files "
        "and parsing tokens from the network buffer stream with care"
    )
    near = base.replace("lazy dog", "sleepy dog")  # near-duplicate
    other = (
        "completely different content about database indexes btree pages "
        "write ahead logs checkpoints and vacuum processes running nightly"
    )
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},  # exact dup of 1
        {"doc_id": 3, "text": near},  # near dup of 1
        {"doc_id": 4, "text": other},
        {"doc_id": 5, "text": "tiny"},
    ]
    return pa.Table.from_pylist(rows)


def test_exact_dedup_planted():
    ds = ray.data.from_arrow(_docs_with_dups())
    out = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 4  # 5 docs, one exact dup collapsed
    row = out[out.doc_id == 1].iloc[0]
    assert row["n_dups"] == 2


def test_minhash_finds_exact_and_near_dups():
    ds = ray.data.from_arrow(_docs_with_dups())
    pairs = minhash_dedup_pairs(ds, threshold=0.5).to_pandas()
    found = {(a, b) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (1, 2) in found  # exact dup: jaccard 1.0
    assert (1, 3) in found or (2, 3) in found  # near dup
    assert not any({4, 5} & {a, b} for a, b in found)


def test_minhash_estimates_jaccard_of_identical_docs():
    sig = minhash_signatures(
        pa.array(["a b c d e f g h i j k l", "a b c d e f g h i j k l"], type=pa.large_string())
    )
    assert (sig[0] == sig[1]).all()


def test_simhash_identical_and_different():
    sigs = simhash_signatures(
        pa.array(
            ["a b c d e f g h", "a b c d e f g h", "x y z q w e r t"], type=pa.large_string()
        )
    )
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]
    ds = ray.data.from_arrow(_docs_with_dups())
    pairs = simhash_pairs(ds, max_hamming=3).to_pandas()
    found = {(a, b) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (1, 2) in found


def test_ngram_jaccard_exact_values():
    t = pa.table(
        {"doc_id": pa.array([1, 2], type=pa.int64()),
         "text": pa.array(["a b c d e", "a b c d e"], type=pa.large_string())}
    )
    out = ngram_jaccard_pairs(ray.data.from_arrow(t), threshold=0.5)
    df = out.to_pandas()
    assert len(df) == 1 and df.jaccard.iloc[0] == 1.0


def test_knn_bruteforce_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((50, 8))
    ids = np.arange(50)
    t = pa.table(
        {"vec_id": pa.array(ids, type=pa.int64()),
         "embedding": pa.array([list(map(float, r)) for r in m], type=pa.list_(pa.float32()))}
    )
    ds = ray.data.from_arrow(t)
    got = knn_bruteforce(ds, ids[:3], m[:3], k=5).to_pandas()
    # numpy oracle (float32 roundtrip like the stored column)
    m32 = m.astype(np.float32).astype(np.float64)
    mn = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    for qi in range(3):
        cos = mn @ mn[qi]
        cos[qi] = -np.inf
        order = np.lexsort((ids, -cos))[:5]
        sub = got[got.query_id == qi].sort_values("rank")
        assert sub.neighbor_id.tolist() == ids[order].tolist()


def test_cosine_neardup_finds_duplicated_vector():
    rng = np.random.default_rng(5)
    m = rng.standard_normal((20, 8))
    m[7] = m[3]  # planted duplicate embedding
    t = pa.table(
        {"vec_id": pa.array(np.arange(20), type=pa.int64()),
         "embedding": pa.array([list(map(float, r)) for r in m], type=pa.list_(pa.float32()))}
    )
    out = cosine_neardup_pairs(ray.data.from_arrow(t), threshold=0.999).to_pandas()
    assert {(a, b) for a, b in zip(out.id_a, out.id_b)} == {(3, 7)}


def test_langid_english():
    t = pa.table(
        {"doc_id": pa.array([1, 2], type=pa.int64()),
         "text": pa.array(
             ["the cat and the dog went to the park in the morning",
              "zzz qqq www"], type=pa.large_string())}
    )
    out = LangId()(t)
    assert out["predicted_lang"].to_pylist() == ["en", "unknown"]


def test_multimodal_real_decode_pipeline():
    """Synthesized media is REAL (PPM/WAV/frame-container) and the feature
    stage really decodes it: image features match a direct numpy decode,
    audio features match computed RMS/duration; unsupported mimes still
    refuse loudly."""
    import numpy as np

    from elasticsearch_data_import_handler_ray.stages.multimodal import (
        Decoder,
        decode_ppm,
        decode_wav,
    )

    docs = pa.table(
        {"doc_id": pa.array([0, 1, 2], type=pa.int64()),  # image, audio, video
         "text": pa.array(["a", "b", "c"], type=pa.large_string())}
    )
    media = synthesize_media_dataset(docs, "doc_id", "text")
    ds = ray.data.from_arrow(media)
    out = ds.map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=2, concurrency=1,
        fn_constructor_kwargs=dict(decoder=Decoder()),
    ).to_pandas().sort_values("media_id")
    payloads = {int(m.as_py()): p.as_py() for m, p in zip(media["media_id"], media["payload"])}
    assert out.n_bytes.tolist() == [len(payloads[0]), len(payloads[1]), len(payloads[2])]
    # image row: features == channel means/std of the actual pixels
    img = decode_ppm(payloads[0])
    feat_img = out[out.media_id == 0].feature.iloc[0]
    want = img.reshape(-1, 3).mean(axis=0) / 255.0
    assert np.allclose(feat_img[:3], want, atol=1e-6)
    # audio row: duration == 0.25 s, rms matches direct computation
    samples, rate = decode_wav(payloads[1])
    x = samples.astype(np.float64) / 32768.0
    feat_au = out[out.media_id == 1].feature.iloc[0]
    assert np.isclose(feat_au[3], len(x) / rate, atol=1e-6)
    assert np.isclose(feat_au[0], np.sqrt(np.mean(x**2)), atol=1e-6)
    with pytest.raises(NotImplementedError):
        Decoder().decode(b"x", "image/png")


def test_multimodal_codec_roundtrips():
    import numpy as np

    from elasticsearch_data_import_handler_ray.stages.multimodal import (
        decode_frame_container,
        decode_ppm,
        decode_wav,
        encode_frame_container,
        encode_ppm,
        encode_wav,
        resize_nearest,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)
    # nearest-neighbor: 2x upscale duplicates pixels exactly
    up = resize_nearest(img, 34, 26)
    np.testing.assert_array_equal(up[::2, ::2], img)
    s = (rng.standard_normal(1000) * 10000).astype(np.int16)
    got, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(got, s)
    frames = [b"one", b"four", b""]
    assert decode_frame_container(encode_frame_container(frames)) == frames


def test_pipeline_spec_end_to_end(tmp_path):
    """Config-driven pipeline (D1): source → prep → two imports (parquet sink
    with id-dedup upsert semantics + index sink), continue-on-error."""
    import pyarrow.parquet as pq

    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        ImportSpec,
        PipelineSpec,
        PrepSpec,
        SourceSpec,
        TransformStep,
        run_pipeline,
    )

    src = tmp_path / "src.parquet"
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([1, 1, 2, 3], type=pa.int64()),
             "text": pa.array(["dup one", "dup one", "two tokens here", "three little words"], type=pa.large_string()),
             "n": pa.array([1, 1, 2, 3], type=pa.int64())}
        ),
        src,
    )

    def add_double(ds):
        return ds.map_batches(
            lambda t: t.append_column("n2", pa.compute.multiply(t["n"], 2)),
            batch_format="pyarrow",
        )

    spec = PipelineSpec(
        sources=[SourceSpec(name="docs", path=str(src))],
        preps=[PrepSpec(name="docs2", source="docs", steps=[TransformStep("add_double", add_double)])],
        imports=[
            ImportSpec(name="to_parquet", source="docs2", id_column="doc_id",
                       sink="parquet", target=str(tmp_path / "out")),
            ImportSpec(name="to_index", source="docs", id_column="doc_id", sink="index",
                       target=str(tmp_path / "idx"), index_content_col="text",
                       index_num_segments=2),
            ImportSpec(name="boom", source="missing_source", id_column="x", sink="parquet",
                       target=str(tmp_path / "boom")),
        ],
    )
    res = run_pipeline(spec)
    assert res["to_parquet"]["status"] == "complete"
    assert res["to_index"]["status"] == "complete" and res["to_index"]["n_docs"] == 3
    assert res["boom"]["status"] == "error"  # continue-on-error (§2.C6)
    out = pq.read_table(str(tmp_path / "out")).to_pandas()
    assert sorted(out.doc_id.tolist()) == [1, 2, 3]  # id-upsert dedup
    assert (out.n2 == out.n * 2).all()


def test_pipeline_spec_csv_json(tmp_path):
    """A2: CSV and JSON file sources through the catalog + spec runner."""
    import json as jsonlib

    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        ImportSpec,
        PipelineSpec,
        SourceSpec,
        run_pipeline,
    )

    csv_p = tmp_path / "rows.csv"
    csv_p.write_text("doc_id,text\n1,hello world\n2,json and csv sources\n")
    json_p = tmp_path / "rows.json"
    with open(json_p, "w") as f:
        for r in [{"doc_id": 10, "text": "first json row"}, {"doc_id": 11, "text": "second"}]:
            f.write(jsonlib.dumps(r) + "\n")

    spec = PipelineSpec(
        sources=[
            SourceSpec(name="c", path=str(csv_p), format="csv"),
            SourceSpec(name="j", path=str(json_p), format="json"),
        ],
        imports=[
            ImportSpec(name="c_out", source="c", id_column="doc_id", sink="parquet",
                       target=str(tmp_path / "c_out")),
            ImportSpec(name="j_out", source="j", id_column="doc_id", sink="parquet",
                       target=str(tmp_path / "j_out")),
        ],
    )
    res = run_pipeline(spec)
    assert res["c_out"]["status"] == "complete"
    assert res["j_out"]["status"] == "complete"
    import pyarrow.parquet as pq

    c = pq.read_table(str(tmp_path / "c_out")).to_pandas()
    j = pq.read_table(str(tmp_path / "j_out")).to_pandas()
    assert sorted(c.doc_id.tolist()) == [1, 2]
    assert sorted(j.doc_id.tolist()) == [10, 11]


def test_pipeline_spec_from_dict(tmp_path):
    """D1/D2: plain-data config + named-transform registry (the config-driven
    surface mirroring the reference's HOCON files)."""
    import pyarrow.parquet as pq

    from elasticsearch_data_import_handler_ray.pipelines.spec import PipelineSpec, run_pipeline

    src = tmp_path / "s.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "n": pa.array([5, 6], type=pa.int64())}), src
    )

    def double_n(ds):
        return ds.map_batches(
            lambda t: t.append_column("n2", pa.compute.multiply(t["n"], 2)),
            batch_format="pyarrow",
        )

    cfg = {
        "sources": [{"name": "s", "path": str(src)}],
        "preps": [{"name": "s2", "source": "s", "steps": ["double_n"]}],
        "imports": [
            {"name": "out", "source": "s2", "id_column": "doc_id",
             "sink": "parquet", "target": str(tmp_path / "out")}
        ],
    }
    spec = PipelineSpec.from_dict(cfg, registry={"double_n": double_n})
    res = run_pipeline(spec)
    assert res["out"]["status"] == "complete"
    out = pq.read_table(str(tmp_path / "out")).to_pandas()
    assert sorted(out.n2.tolist()) == [10, 12]


def test_driver_contract_consistency():
    """Every oracle_sql key must have a queries() impl; entry callables are
    callable; no oracle without an implementation (contract drift guard)."""
    import __ray_entry__ as entry

    qs = entry.queries()
    sqls = entry.oracle_sql()
    missing = set(sqls) - set(qs)
    assert not missing, f"oracle_sql without queries(): {missing}"
    assert len(qs) >= 40
    for name, fn in qs.items():
        assert callable(fn), name


def test_ngram_jaccard_distributed_matches_allpairs_oracle():
    """The LSH-candidate + exact-verify path must produce the same rows as
    the quadratic all-pairs oracle on planted dups."""
    from elasticsearch_data_import_handler_ray.stages.dedup import (
        ngram_jaccard_pairs_allpairs,
    )

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for d in range(40):
        toks = [vocab[i] for i in rng.integers(0, 200, size=30)]
        rows.append({"doc_id": d, "text": " ".join(toks)})
    # planted near-dups: copy with small edits
    for src, dst in [(0, 40), (1, 41), (2, 42)]:
        toks = rows[src]["text"].split()
        toks[5] = "edited"
        rows.append({"doc_id": dst, "text": " ".join(toks)})
    t = pa.Table.from_pylist(rows)
    ds = ray.data.from_arrow(t)
    got = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    want = ngram_jaccard_pairs_allpairs(ray.data.from_arrow(t), threshold=0.5).to_pandas(
    ).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(want) >= 3  # the planted pairs are actually found


def test_cosine_neardup_distributed_no_false_positives_and_exact_scores():
    """LSH candidates + exact verify: every emitted pair really has
    cos >= threshold (exact), and high-cos planted pairs are found."""
    rng = np.random.default_rng(5)
    m = rng.standard_normal((60, 8))
    m[7] = m[3]                      # exact duplicate
    m[20] = m[10] + 0.05 * rng.standard_normal(8)  # near duplicate
    t = pa.table(
        {"vec_id": pa.array(np.arange(60), type=pa.int64()),
         "embedding": pa.array([list(map(float, r)) for r in m], type=pa.list_(pa.float32()))}
    )
    out = cosine_neardup_pairs(ray.data.from_arrow(t), threshold=0.98).to_pandas()
    found = {(a, b) for a, b in zip(out.id_a, out.id_b)}
    assert (3, 7) in found and (10, 20) in found
    # exact verification: recompute cosine for every emitted pair
    m32 = m.astype(np.float32).astype(np.float64)
    mn = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    for _, r in out.iterrows():
        assert round(float(mn[int(r.id_a)] @ mn[int(r.id_b)]), 4) == r.cos_sim
        assert r.cos_sim >= 0.98


def test_ivf_build_search_matches_inline(tmp_path, sf_dir):
    """ivf_build (list-partitioned parquet, assignment at ingest) +
    ivf_search (reads only probed partitions) returns the SAME rows as the
    inline knn_ivf with identical seed/sample — the scale path changes the
    storage layout, not the answer."""
    import os

    import numpy as np
    import pandas as pd

    from __ray_entry__ import _queries_embeddings
    from elasticsearch_data_import_handler_ray.sources.catalog import table
    from elasticsearch_data_import_handler_ray.stages.ann import ivf_build, ivf_search, knn_ivf

    qids, qm = _queries_embeddings(sf_dir)
    ds = table(sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    ivf_build(ds, idx, n_lists=16, seed=13)
    # hive layout exists and the search prunes: fewer dirs read than exist
    parts = [d for d in os.listdir(idx) if d.startswith("list_id=")]
    assert len(parts) > 4
    got = ivf_search(idx, qids, qm, k=5, nprobe=4).to_pandas()
    want = knn_ivf(ds, qids, qm, k=5, n_lists=16, nprobe=4, seed=13).to_pandas()
    key = ["query_id", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["query_id", "neighbor_id", "rank", "cos_sim"]],
        want[["query_id", "neighbor_id", "rank", "cos_sim"]],
        check_dtype=False,
    )


def test_neardup_clusters_union_find():
    """Clusters == connected components of the pair graph (BFS reference),
    canonical member = min id, exactly one keep per cluster."""
    import numpy as np
    import pyarrow as pa

    from elasticsearch_data_import_handler_ray.stages.dedup import neardup_clusters

    pairs = pa.table(
        {
            "doc_a": pa.array([1, 2, 5, 10, 30], type=pa.int64()),
            "doc_b": pa.array([2, 3, 6, 11, 1], type=pa.int64()),
        }
    )
    got = neardup_clusters(pairs)
    # BFS reference
    adj = {}
    for x, y in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    want = {}
    seen = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            comp.append(v)
            stack.extend(adj[v] - seen)
        for v in comp:
            want[v] = min(comp)
    rows = {int(d): int(c) for d, c in zip(got["doc_id"].to_pylist(), got["cluster_id"].to_pylist())}
    assert rows == want
    keeps = [int(d) for d, k in zip(got["doc_id"].to_pylist(), got["keep"].to_pylist()) if k]
    assert sorted(keeps) == sorted(set(want.values()))


def test_dedup_corpus_end_to_end(sf_dir):
    """Planted near-dups at threshold 0.5 → dedup_corpus drops exactly the
    non-canonical members of each pair-graph component and nothing else."""
    from elasticsearch_data_import_handler_ray.sources.catalog import table
    from elasticsearch_data_import_handler_ray.stages.dedup import (
        dedup_corpus,
        minhash_dedup_pairs,
        neardup_clusters,
    )

    factory = lambda: table(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_dedup_pairs(factory(), threshold=0.5)
    clusters = neardup_clusters(pairs.select(["doc_a", "doc_b"]))
    out = dedup_corpus(factory, threshold=0.5)
    kept = sorted(out.to_pandas()["doc_id"])
    all_ids = sorted(factory().to_pandas()["doc_id"])
    dropped = {
        int(d)
        for d, k in zip(clusters["doc_id"].to_pylist(), clusters["keep"].to_pylist())
        if not k
    }
    assert len(pairs) > 0 and dropped  # the testdata actually plants dups
    assert sorted(set(all_ids) - dropped) == kept


def test_curation_pipeline_end_to_end(sf_dir):
    """curate() == apply each gate independently: quality floor, language
    whitelist, near-dedup drop — verified by recomputing the expected id set
    with the individual tested operators."""
    import pyarrow.compute as pc

    from elasticsearch_data_import_handler_ray.pipelines.curation import (
        curate,
        curation_report,
    )
    from elasticsearch_data_import_handler_ray.sources.catalog import table
    from elasticsearch_data_import_handler_ray.stages.dedup import (
        minhash_dedup_pairs,
        neardup_clusters,
    )
    from elasticsearch_data_import_handler_ray.stages.text import LangId, quality_batch

    factory = lambda: table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = curate(factory, min_tokens=5, max_punct_ratio=0.3, dedup_threshold=0.5)
    got = sorted(out.to_pandas()["doc_id"])

    # expected: same gates applied via the individual operators
    full = factory().to_pandas()
    q = quality_batch(
        __import__("pyarrow").Table.from_pandas(full[["doc_id", "text"]], preserve_index=False)
    ).to_pandas()
    ok_quality = set(q[(q.n_tokens >= 5) & (q.punct_ratio <= 0.3)]["doc_id"])
    surv = full[full.doc_id.isin(ok_quality)]
    import ray.data

    pairs = minhash_dedup_pairs(
        ray.data.from_pandas(surv[["doc_id", "text"]]), threshold=0.5
    )
    clusters = neardup_clusters(pairs.select(["doc_a", "doc_b"]))
    drop = {
        int(d)
        for d, k in zip(clusters["doc_id"].to_pylist(), clusters["keep"].to_pylist())
        if not k
    }
    want = sorted(set(surv.doc_id) - drop)
    assert got == want
    assert 0 < len(got) < len(full)

    rep = curation_report(curate(factory, dedup_threshold=0.5)).to_pandas()
    assert rep["n_docs"].sum() == len(got)
    assert (rep["total_tokens"] > 0).all()


def test_curation_lang_gate(sf_dir):
    """keep_langs engages the LangId gate: result == quality gate ∘ langid
    filter ∘ dedup recomputed with the individual operators."""
    import pyarrow as pa

    from elasticsearch_data_import_handler_ray.pipelines.curation import curate
    from elasticsearch_data_import_handler_ray.sources.catalog import table
    from elasticsearch_data_import_handler_ray.stages.text import LangId, quality_batch

    factory = lambda: table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    got = sorted(
        curate(factory, min_tokens=5, max_punct_ratio=0.3,
               keep_langs=("en",), dedup_threshold=0.5).to_pandas()["doc_id"]
    )
    full = factory().to_pandas()
    t = pa.Table.from_pandas(full[["doc_id", "text"]], preserve_index=False)
    q = quality_batch(t).to_pandas()
    ok_q = set(q[(q.n_tokens >= 5) & (q.punct_ratio <= 0.3)]["doc_id"])
    pred = LangId()(t).to_pandas()
    ok_l = set(pred[pred.predicted_lang == "en"]["doc_id"])
    surv = sorted(ok_q & ok_l)
    assert set(got) <= set(surv)          # dedup only removes further
    assert len(got) > 0
    # every gate-surviving doc that is not a dropped near-dup is present
    import ray.data

    from elasticsearch_data_import_handler_ray.stages.dedup import (
        minhash_dedup_pairs,
        neardup_clusters,
    )

    sdf = full[full.doc_id.isin(surv)]
    pairs = minhash_dedup_pairs(ray.data.from_pandas(sdf[["doc_id", "text"]]), threshold=0.5)
    clusters = neardup_clusters(pairs.select(["doc_a", "doc_b"]))
    drop = {int(d) for d, k in zip(clusters["doc_id"].to_pylist(), clusters["keep"].to_pylist()) if not k}
    assert got == sorted(set(surv) - drop)


# --------------------------------------------------------- sequence packing
def test_pack_sequences_invariants_and_oracle():
    """pack_sequences: every doc exactly once; per-sequence token totals ≤
    budget unless the sequence is one overlong doc; within a bucket the
    assignment equals a naive next-fit oracle; deterministic across runs."""
    import ray.data

    from elasticsearch_data_import_handler_ray.stages.text import pack_sequences

    rng = np.random.default_rng(3)
    n = 500
    texts = [" ".join(["tok"] * int(rng.integers(1, 200))) for _ in range(n)]
    texts[17] = " ".join(["tok"] * 900)  # overlong: must get its own sequence
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    budget, buckets = 256, 7
    out = (
        pack_sequences(
            ray.data.from_pandas(df), budget=budget, num_buckets=buckets
        )
        .to_pandas()
        .sort_values(["seq_id", "pos"])
        .reset_index(drop=True)
    )
    # every doc exactly once, token counts correct
    assert sorted(out["doc_id"]) == list(range(n))
    want_tokens = df["text"].str.count(r"\S+").astype("int64")
    got_tokens = out.set_index("doc_id")["n_tokens"].sort_index()
    assert list(got_tokens) == list(want_tokens)
    # budget invariant
    per_seq = out.groupby("seq_id").agg(total=("n_tokens", "sum"), ndocs=("doc_id", "count"))
    over = per_seq[per_seq.total > budget]
    assert (over.ndocs == 1).all()  # only single overlong docs may exceed
    assert (out[out.doc_id == 17].groupby("seq_id").size() == 1).all()
    # positions are 0..k-1 within each sequence
    assert (out.groupby("seq_id")["pos"].apply(lambda p: list(p) == list(range(len(p))))).all()
    # naive next-fit oracle per bucket
    for b in range(buckets):
        sub = df[df.doc_id % buckets == b].sort_values("doc_id")
        toks = sub["text"].str.count(r"\S+").tolist()
        seq, fill, want = 0, 0, []
        for t_n in toks:
            if fill > 0 and fill + t_n > budget:
                seq, fill = seq + 1, 0
            want.append(f"{b}-{seq}")
            fill += t_n
        got = out.set_index("doc_id").loc[sub["doc_id"], "seq_id"].tolist()
        assert got == want, b
    # determinism
    out2 = (
        pack_sequences(ray.data.from_pandas(df), budget=budget, num_buckets=buckets)
        .to_pandas()
        .sort_values(["seq_id", "pos"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


# ------------------------------------------------ repeated-passage detection
def test_repeated_ngram_spans_planted():
    """Plant one 25-token passage into 3 docs (different positions) and a
    second into 2 docs: every reported (doc, pos, n_docs) occurrence matches
    a naive all-docs window count; unique text reports nothing."""
    import ray.data

    from elasticsearch_data_import_handler_ray.stages.dedup import (
        repeated_ngram_spans,
    )

    rng = np.random.default_rng(8)
    vocab = [f"w{i}" for i in range(500)]
    docs = [
        list(rng.choice(vocab, size=int(rng.integers(40, 80)))) for _ in range(50)
    ]
    passage = [f"p{i}" for i in range(25)]
    other = [f"q{i}" for i in range(22)]
    for d, at in [(3, 0), (7, 10), (20, 5)]:
        docs[d][at : at + 25] = passage
    for d, at in [(11, 4), (31, 0)]:
        docs[d][at : at + 22] = other
    df = pd.DataFrame(
        {"doc_id": np.arange(50, dtype=np.int64), "text": [" ".join(d) for d in docs]}
    )
    W = 20
    out = repeated_ngram_spans(
        ray.data.from_pandas(df), window=W, stride=1, min_docs=2, num_buckets=8
    ).to_pandas()
    # naive: every W-token window tuple → set of (doc, pos)
    occ: dict[tuple, list] = {}
    for did, toks in enumerate(docs):
        toks = [t.lower() for t in toks]
        for p in range(len(toks) - W + 1):
            occ.setdefault(tuple(toks[p : p + W]), []).append((did, p))
    want = set()
    for gram, places in occ.items():
        nd = len({d for d, _ in places})
        if nd >= 2:
            for d, p in places:
                want.add((d, p, nd))
    got = set(zip(out["doc_id"].astype(int), out["pos"].astype(int), out["n_docs"].astype(int)))
    assert got == want
    assert len(want) > 10  # both planted passages produce multiple windows
    # each repeated gram groups under ONE hash with a consistent doc count
    per_hash = out.groupby("span_hash")["doc_id"].nunique()
    assert (per_hash >= 2).all()
    # stride sampling: only stride-aligned positions survive
    out2 = repeated_ngram_spans(
        ray.data.from_pandas(df), window=W, stride=5, min_docs=2, num_buckets=8
    ).to_pandas()
    assert set(out2["pos"].astype(int) % 5) <= {0}
    assert set(zip(out2["doc_id"].astype(int), out2["pos"].astype(int))) <= {
        (d, p) for d, p, _ in want
    }


def test_keyword_extract_matches_pandas():
    """tf·idf keywords == a direct pandas recompute (top-3, ties term asc)."""
    import ray.data

    from elasticsearch_data_import_handler_ray.stages.text import keyword_extract

    rng = np.random.default_rng(6)
    vocab = [f"k{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(5, 30)))) for _ in range(200)]
    texts += ["", "unique_token_xyz common common"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    got = (
        keyword_extract(ray.data.from_pandas(df), top_n=3)
        .to_pandas()
        .sort_values(["doc_id", "score", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    rows = []
    for did, text in zip(df["doc_id"], df["text"]):
        for w in text.lower().split():
            rows.append((did, w))
    toks = pd.DataFrame(rows, columns=["doc_id", "term"])
    tf = toks.groupby(["doc_id", "term"]).size().rename("tf").reset_index()
    dfreq = toks.drop_duplicates().groupby("term").size().rename("df").reset_index()
    N = float(toks["doc_id"].nunique())
    j = tf.merge(dfreq, on="term")
    j["score"] = j["tf"].to_numpy(dtype=np.int64) * np.log(N / j["df"].to_numpy(dtype=np.float64))
    j = j.sort_values(["doc_id", "score", "term"], ascending=[True, False, True], kind="mergesort")
    want = j.groupby("doc_id", sort=False).head(3)[["doc_id", "term", "score"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # planted doc: "common" (tf=2, df=1) outranks "unique_token_xyz" (tf=1, df=1)
    last = got[got.doc_id == len(texts) - 1]
    assert last["term"].tolist()[:2] == ["common", "unique_token_xyz"]


# ---------------------------------------------------- product quantization
def test_pq_roundtrip_and_recall():
    """PQ: codes are m bytes per vector; ADC ranking recalls most of the
    exact-cosine top-k on clustered data; encode == a direct numpy recompute;
    the query's OWN vector is always its nearest PQ neighbor."""
    from elasticsearch_data_import_handler_ray.stages.ann import (
        knn_bruteforce,
        pq_encode,
        pq_search,
        pq_train,
    )

    rng = np.random.default_rng(4)
    # clustered vectors (PQ shines on structure, matching real embeddings)
    centers = rng.standard_normal((10, 32)) * 3
    M = np.vstack([c + rng.standard_normal((40, 32)) * 0.3 for c in centers])
    ids = np.arange(len(M))
    t = pa.table(
        {"vec_id": pa.array(ids, type=pa.int64()),
         "embedding": pa.array([list(map(float, r)) for r in M], type=pa.list_(pa.float64()))}
    )
    ds = ray.data.from_arrow(t)
    books = pq_train(ds, m=8, k=16, train_sample=400)
    assert books.shape == (8, 16, 4)
    codes = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    assert len(codes) == len(M)
    assert all(len(c) == 8 for c in codes["codes"])  # 8 bytes per vector
    # encode identity vs direct recompute
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    want0 = [
        int(((Mn[0, j * 4 : (j + 1) * 4] - books[j]) ** 2).sum(axis=1).argmin())
        for j in range(8)
    ]
    assert list(codes.iloc[0]["codes"]) == want0
    # PQ's honest contract: coarse ranking is right (every ADC top-10
    # neighbor comes from the query's true cluster; the query's own vector
    # is rank 1), while INTRA-cluster order is quantization noise — the
    # production recipe re-ranks the ADC shortlist exactly (FAISS refine)
    q_ids, q_m = ids[:5], M[:5]
    exact = knn_bruteforce(ds, q_ids, q_m, k=10).to_pandas()
    approx = pq_search(pq_encode(ds, books), books, q_ids, q_m, k=10).to_pandas()
    recalls = []
    for qid in q_ids:
        a_sub = approx[approx.query_id == qid].sort_values("rank")
        assert a_sub.iloc[0]["neighbor_id"] == qid  # self-match at rank 1
        assert (a_sub["neighbor_id"] // 40 == qid // 40).all()  # right cluster
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        recalls.append(len(e & set(a_sub["neighbor_id"])) / 10)
    assert np.mean(recalls) >= 0.25, recalls  # coarse floor; refine re-ranks


def test_pq_refined_equals_bruteforce():
    """PQ shortlist + exact re-rank == brute force when the shortlist covers
    the true neighborhood (the FAISS refine contract, pinned exactly)."""
    from elasticsearch_data_import_handler_ray.stages.ann import (
        knn_bruteforce,
        pq_encode,
        pq_search_refined,
        pq_train,
    )

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 32)) * 3
    M = np.vstack([c + rng.standard_normal((30, 32)) * 0.3 for c in centers])
    ids = np.arange(len(M))
    t = pa.table(
        {"vec_id": pa.array(ids, type=pa.int64()),
         "embedding": pa.array([list(map(float, r)) for r in M], type=pa.list_(pa.float64()))}
    )
    ds = ray.data.from_arrow(t)
    books = pq_train(ds, m=8, k=16, train_sample=300)
    codes = pq_encode(ds, books)
    q_ids, q_m = ids[:4], M[:4]
    got = (
        pq_search_refined(codes, ds, books, q_ids, q_m, k=5, shortlist=30)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        knn_bruteforce(ds, q_ids, q_m, k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_knn_filtered_matches_filtered_bruteforce(sf_dir):
    """ES kNN-with-filter: equals brute force over the pre-filtered subset
    (filter applied BEFORE scoring), and survivor sets honor the clauses."""
    import os

    import pyarrow.parquet as pq

    from elasticsearch_data_import_handler_ray.sources.catalog import table
    from elasticsearch_data_import_handler_ray.stages.ann import (
        knn_bruteforce,
        knn_filtered,
    )

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    mask = t["vec_id"].to_numpy(zero_copy_only=False) < 3
    qt = t.filter(pa.array(mask))
    qids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qm = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    flt = [{"field": "label", "gte": 2}, {"field": "label", "lte": 6}]

    got = (knn_filtered(table(sf_dir, "embeddings"), qids, qm, k=4, filters=flt)
           .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
    # oracle: brute force over a pre-filtered Dataset
    lab = t["label"].to_numpy(zero_copy_only=False)
    pre = t.filter(pa.array((lab >= 2) & (lab <= 6)))
    import ray.data as rd

    want = (knn_bruteforce(rd.from_arrow(pre), qids, qm, k=4)
            .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every neighbor honors the filter
    lab_of = dict(zip(t["vec_id"].to_pylist(), t["label"].to_pylist()))
    assert all(2 <= lab_of[n] <= 6 for n in got["neighbor_id"])
    assert len(got) > 0


def test_semdedup_plants_and_oracle():
    """SemDeDup: planted epsilon-balls collapse to one representative each;
    the single-cluster case equals a naive global greedy oracle exactly."""
    import ray.data as rd

    from elasticsearch_data_import_handler_ray.stages.dedup import semdedup

    rng = np.random.default_rng(5)
    base = rng.normal(size=(20, 32))
    rows = []
    vid = 0
    for b in base:
        n_copies = int(rng.integers(1, 4))  # 1-3 members per ball
        for _ in range(n_copies):
            v = b + rng.normal(scale=1e-3, size=32)  # cos ~ 1.0 within ball
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            vid += 1
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (semdedup(ds, n_clusters=1, threshold=0.99, train_sample=100)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert len(out) == vid
    # naive single-cluster greedy oracle
    M = np.stack([np.array(r["embedding"]) for r in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    keep, kept_idx, rep = np.zeros(vid, bool), [], np.empty(vid, np.int64)
    for i in range(vid):
        if kept_idx:
            sims = M[kept_idx] @ M[i]
            j = int(np.argmax(sims))
            if sims[j] >= 0.99:
                rep[i] = kept_idx[j]
                continue
        keep[i] = True
        kept_idx.append(i)
        rep[i] = i
    assert out["kept"].to_numpy().tolist() == keep.tolist()
    assert out["rep_id"].to_numpy().tolist() == rep.tolist()
    # exactly one representative survives per planted ball
    assert int(out["kept"].sum()) == 20
    # multi-cluster run never drops MORE than single-cluster (pairs can only
    # be separated by clustering, never invented) and keeps every ball
    out2 = (semdedup(ds, n_clusters=4, threshold=0.99, train_sample=100)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert int(out2["kept"].sum()) >= 20
    assert set(out2[out2.kept].rep_id) == set(out2[out2.kept].vec_id)
