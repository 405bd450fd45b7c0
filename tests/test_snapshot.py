"""Snapshot/restore (ES snapshot-repository analogue, index/snapshot.py):
content-addressed blobs dedup across snapshots (incremental), restore is
sha-verified + fsck'd, corruption cannot restore silently, delete GCs only
unreferenced blobs, and a restored index answers queries identically."""

import glob
import json
import os

import pytest

from elasticsearch_data_import_handler_ray.index.build import build_index
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.index.snapshot import (
    delete_snapshot,
    list_snapshots,
    restore_index,
    snapshot_index,
)
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig, RunLock
from fixtures.gen_corpus import corpus_files


@pytest.fixture(scope="module")
def snap_env(tiny_corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("snap")
    idx = str(root / "idx")
    files = corpus_files(tiny_corpus)
    build_index(
        files[:2], idx, mode="full", config=IndexConfig(analyzer="code", num_segments=2)
    )
    repo = str(root / "repo")
    return idx, repo, files, str(root)


def test_snapshot_restore_roundtrip(snap_env):
    idx, repo, files, root = snap_env
    res = snapshot_index(idx, repo, "one")
    assert res["files"] == res["copied_blobs"] > 0
    eng = QueryEngine(idx)
    try:
        want = eng.search_many([{"text": "parse json buffer", "mode": "or"}], k=10)
    finally:
        eng.close()
    tgt = os.path.join(root, "restored")
    out = restore_index(repo, "one", tgt)
    assert out["files"] == res["files"] and not out["fsck"]["problems"]
    eng2 = QueryEngine(tgt)
    try:
        got = eng2.search_many([{"text": "parse json buffer", "mode": "or"}], k=10)
    finally:
        eng2.close()
    assert got == want and got[0]


def test_incremental_snapshot_dedups_blobs(snap_env):
    idx, repo, files, root = snap_env
    build_index(files, idx, mode="incremental")  # adds a second run
    res2 = snapshot_index(idx, repo, "two")
    # the first run's segment files are content-identical → not re-copied
    assert res2["copied_blobs"] < res2["files"]
    assert {s["name"] for s in list_snapshots(repo)} >= {"one", "two"}
    # restoring the SECOND snapshot yields the two-run index
    tgt = os.path.join(root, "restored2")
    out = restore_index(repo, "two", tgt)
    assert not out["fsck"]["problems"]
    from elasticsearch_data_import_handler_ray.state.manifest import Manifest

    assert Manifest.load(tgt).n_docs == Manifest.load(idx).n_docs


def test_corrupt_blob_refuses_restore(snap_env, tmp_path):
    idx, repo, files, root = snap_env
    snap = json.load(open(os.path.join(repo, "snap-one.json")))
    sha = next(
        e["sha256"] for rel, e in snap["files"].items() if rel.endswith("postings.bin")
    )
    blob = os.path.join(repo, "blobs", sha[:2], sha)
    original = open(blob, "rb").read()
    corrupt = bytearray(original)
    corrupt[len(corrupt) // 2] ^= 0xFF
    open(blob, "wb").write(bytes(corrupt))
    try:
        with pytest.raises(RuntimeError, match="corrupt"):
            restore_index(repo, "one", str(tmp_path / "bad"))
    finally:
        open(blob, "wb").write(original)  # undo for later tests


def test_delete_gcs_only_unreferenced(snap_env):
    idx, repo, files, root = snap_env
    n_before = sum(len(fs) for _, _, fs in os.walk(os.path.join(repo, "blobs")))
    out = delete_snapshot(repo, "one")
    # "two" still references every shared blob; only "one"-unique ones go
    assert 0 <= out["blobs_gced"] < n_before
    assert {s["name"] for s in list_snapshots(repo)} == {"two"}
    # restore of the surviving snapshot still verifies end-to-end
    tgt = os.path.join(root, "restored3")
    assert not restore_index(repo, "two", tgt)["fsck"]["problems"]
    with pytest.raises(FileNotFoundError):
        delete_snapshot(repo, "one")


def test_snapshot_respects_runlock_and_name_collision(snap_env):
    idx, repo, *_ = snap_env
    with RunLock(idx, owner="other-run"):
        with pytest.raises(RuntimeError, match="locked"):
            snapshot_index(idx, repo, "blocked")
    with pytest.raises(RuntimeError, match="already exists"):
        snapshot_index(idx, repo, "two")


def test_failed_restore_is_retryable(snap_env, tmp_path):
    """A restore that dies on a corrupt blob must not leave manifest.json
    behind — the retry (after repair) into the SAME directory succeeds."""
    idx, repo, files, root = snap_env
    snap = json.load(open(os.path.join(repo, "snap-two.json")))
    sha = next(
        e["sha256"] for rel, e in snap["files"].items() if rel.endswith("postings.bin")
    )
    blob = os.path.join(repo, "blobs", sha[:2], sha)
    original = open(blob, "rb").read()
    corrupt = bytearray(original)
    corrupt[0] ^= 0xFF
    tgt = str(tmp_path / "retry")
    open(blob, "wb").write(bytes(corrupt))
    try:
        with pytest.raises(RuntimeError, match="corrupt"):
            restore_index(repo, "two", tgt)
    finally:
        open(blob, "wb").write(original)
    assert not os.path.exists(os.path.join(tgt, "manifest.json"))
    out = restore_index(repo, "two", tgt)  # same dir, after repair
    assert not out["fsck"]["problems"]
