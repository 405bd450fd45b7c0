"""Merge idempotence + incremental/full equivalence + resume
(SURVEY.md §5.2 items 2/6; BASELINE.json:6 "segment merge idempotence")."""

import hashlib
import os
import shutil

import pytest

from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.merge import merge_index
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig, Manifest, RunLock
from fixtures.gen_corpus import corpus_files
from fixtures.queries import generate_queries


def _segment_digest(index_dir: str) -> dict[str, str]:
    """seg_id → sha256 over (terms.parquet bytes, postings.bin bytes)."""
    man = Manifest.load(index_dir)
    out = {}
    for seg_id in range(man.config.num_segments):
        dirs = man.segment_dirs(seg_id)
        h = hashlib.sha256()
        for d in dirs:
            for fname in ("terms.parquet", "postings.bin"):
                with open(os.path.join(d, fname), "rb") as f:
                    h.update(f.read())
        out[str(seg_id)] = h.hexdigest()
    return out


CFG = IndexConfig(analyzer="code", num_segments=4)


def test_incremental_equals_full_and_merge_idempotent(tiny_corpus, tmp_path_factory):
    files = corpus_files(tiny_corpus)
    assert len(files) == 4
    base = tmp_path_factory.mktemp("merge")

    # full build in one shot
    full_dir = str(base / "full")
    build_index(files, full_dir, mode="full", config=CFG)

    # incremental build in two halves, then merged
    inc_dir = str(base / "inc")
    r1 = build_index(files[:2], inc_dir, mode="full", config=CFG)
    r2 = build_index(files, inc_dir, mode="incremental", config=CFG)
    assert r2.n_input_files == 2  # only the uncovered files were indexed
    man = Manifest.load(inc_dir)
    assert len(man.complete_runs()) == 2
    merge_index(inc_dir)
    man = Manifest.load(inc_dir)
    assert len(man.complete_runs()) == 1

    # merged incremental == full, byte-identical per shard
    assert _segment_digest(inc_dir) == _segment_digest(full_dir)

    # re-merge is a no-op and stays byte-identical (idempotence)
    before = _segment_digest(inc_dir)
    merge_index(inc_dir)
    assert _segment_digest(inc_dir) == before

    # doc stats preserved exactly through merge
    man_full = Manifest.load(full_dir)
    assert man.n_docs == man_full.n_docs
    assert man.avgdl == man_full.avgdl


def test_queries_identical_after_merge(tiny_corpus, tmp_path_factory):
    files = corpus_files(tiny_corpus)
    base = tmp_path_factory.mktemp("qmerge")
    inc_dir = str(base / "inc")
    build_index(files[:3], inc_dir, mode="full", config=CFG)
    build_index(files, inc_dir, mode="incremental", config=CFG)

    eng = QueryEngine(inc_dir)
    qs = generate_queries(seed=42)[:15]
    before = eng.search_many(qs, k=10, method="bmw")
    eng.close()

    merge_index(inc_dir)
    eng = QueryEngine(inc_dir)
    after = eng.search_many(qs, k=10, method="bmw")
    eng.close()
    assert before == after


def test_resume_after_partial_failure(tiny_corpus, tmp_path_factory):
    """Simulate a crash mid-build: first run covers half the corpus, the
    'crashed' second run left no manifest entry. Resuming with
    mode=incremental indexes exactly the uncovered files and converges to the
    same index as an uninterrupted build (C4)."""
    files = corpus_files(tiny_corpus)
    base = tmp_path_factory.mktemp("resume")
    crash_dir = str(base / "crash")
    build_index(files[:2], crash_dir, mode="full", config=CFG)
    # fake crash debris: an orphan run dir with partial segments, no manifest entry
    orphan = os.path.join(crash_dir, "runs", "run-deadbeef")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "seg_0.partial"), "w") as f:
        f.write("garbage")

    res = build_index(files, crash_dir, mode="incremental", config=CFG)
    assert res.n_input_files == 2
    merge_index(crash_dir)

    full_dir = str(base / "full")
    build_index(files, full_dir, mode="full", config=CFG)
    assert _segment_digest(crash_dir) == _segment_digest(full_dir)


def test_lock_excludes_concurrent_runs(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lock"))
    with RunLock(d):
        with pytest.raises(RuntimeError, match="locked"):
            with RunLock(d):
                pass
    # released → reusable
    with RunLock(d):
        pass


def test_incremental_noop_when_covered(tiny_corpus, tmp_path_factory):
    files = corpus_files(tiny_corpus)
    d = str(tmp_path_factory.mktemp("noop") / "idx")
    build_index(files, d, mode="full", config=CFG)
    res = build_index(files, d, mode="incremental", config=CFG)
    assert res.skipped


def test_fsck_clean_and_corrupted(tiny_corpus, tmp_path_factory):
    """verify_index passes a healthy incremental+positional index and
    reports byte corruption, sidecar truncation, and manifest drift."""
    import json
    import os

    import pytest

    from elasticsearch_data_import_handler_ray.index.build import build_index
    from elasticsearch_data_import_handler_ray.index.fsck import IndexCorruption, verify_index
    from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
    from fixtures.gen_corpus import corpus_files

    files = corpus_files(tiny_corpus)
    idx = str(tmp_path_factory.mktemp("fsck") / "i")
    build_index(files[:2], idx, mode="full",
                config=IndexConfig(num_segments=3, positions=True))
    build_index(files, idx, mode="incremental")
    rep = verify_index(idx)
    assert rep["segments"] == 3 and rep["n_docs"] == 1000 and rep["problems"] == []

    # corrupt one byte mid-postings → decode invariants break
    import glob

    post = sorted(glob.glob(os.path.join(idx, "runs", "*", "seg_*", "postings.bin")))[0]
    data = bytearray(open(post, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(post, "wb").write(bytes(data))
    with pytest.raises(IndexCorruption):
        verify_index(idx)
    data[len(data) // 2] ^= 0xFF  # restore
    open(post, "wb").write(bytes(data))
    verify_index(idx)

    # truncate a positions sidecar
    posf = sorted(glob.glob(os.path.join(idx, "runs", "*", "seg_*", "positions.bin")))[0]
    orig = open(posf, "rb").read()
    open(posf, "wb").write(orig[:-3])
    with pytest.raises(IndexCorruption, match="position"):
        verify_index(idx)
    open(posf, "wb").write(orig)

    # manifest drift: claim one more doc than the segments hold
    man_path = os.path.join(idx, "manifest.json")
    man = json.load(open(man_path))
    rid = next(iter(man["runs"]))
    man["runs"][rid]["n_docs"] += 1
    json.dump(man, open(man_path, "w"))
    with pytest.raises(IndexCorruption, match="manifest n_docs"):
        verify_index(idx)
