"""Snapshot / restore — the ES snapshot-repository analogue (§2.C lifecycle).

ES snapshots are CONTENT-ADDRESSED at the segment-file level: a repository
stores each blob once under its hash, and every snapshot is just a manifest
mapping paths → blobs, so a second snapshot of a mostly-unchanged index copies
only the new segments (incremental for free). This module rebuilds that shape:

    <repo>/blobs/<sha256[:2]>/<sha256>     deduplicated file contents
    <repo>/snap-<name>.json                {relpath: {sha256, bytes}} + stats

Hashing + copying fan out as Ray TASKS over file chunks (an index at 100 TB
is thousands of segment files; one driver-side loop would serialize the I/O —
each task streams its files in 1 MiB chunks, never holding a file in memory).

Safety: snapshot takes the index RunLock (a build cannot mutate runs/ mid-
copy; readers are unaffected — segments are immutable once committed).
Restore verifies EVERY blob's sha256 while writing and re-checks index
invariants via fsck afterwards, so a bit-rotted repository cannot restore
silently."""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import ray

from ..state.manifest import Manifest, RunLock


def _iter_index_files(index_dir: str) -> list[str]:
    """Relpaths of every file a snapshot must carry (lock files excluded)."""
    out = []
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            if f == ".lock":
                continue
            out.append(os.path.relpath(os.path.join(root, f), index_dir))
    return sorted(out)


def _sha_stream(path: str, out_f=None) -> tuple[str, int]:
    h = hashlib.sha256()
    n = 0
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
            n += len(chunk)
            if out_f is not None:
                out_f.write(chunk)
    return h.hexdigest(), n


@ray.remote
def _snapshot_chunk(index_dir: str, repo_dir: str, rels: list[str]) -> dict:
    """Hash each file; copy it into the blob store unless already present
    (the content-addressed dedup that makes snapshots incremental)."""
    entries: dict[str, dict] = {}
    copied = 0
    for rel in rels:
        src = os.path.join(index_dir, rel)
        sha, nbytes = _sha_stream(src)
        blob = os.path.join(repo_dir, "blobs", sha[:2], sha)
        if not os.path.exists(blob):
            os.makedirs(os.path.dirname(blob), exist_ok=True)
            tmp = blob + f".tmp-{os.getpid()}"
            shutil.copyfile(src, tmp)
            os.replace(tmp, blob)  # atomic: concurrent writers converge
            copied += 1
        entries[rel] = {"sha256": sha, "bytes": nbytes}
    return {"entries": entries, "copied": copied}


@ray.remote
def _restore_chunk(repo_dir: str, target_dir: str, items: list[tuple[str, str, int]]) -> int:
    """Copy blobs back to their relpaths, verifying sha256 in-stream."""
    for rel, sha, nbytes in items:
        blob = os.path.join(repo_dir, "blobs", sha[:2], sha)
        dst = os.path.join(target_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "wb") as out:
            got, n = _sha_stream(blob, out)
        if got != sha or n != nbytes:
            raise RuntimeError(
                f"snapshot blob corrupt for {rel}: sha {got[:12]}≠{sha[:12]} "
                f"or size {n}≠{nbytes}"
            )
    return len(items)


def _chunks(seq, n_chunks: int):
    n_chunks = max(1, min(n_chunks, len(seq)))
    size = -(-len(seq) // n_chunks)
    return [seq[i : i + size] for i in range(0, len(seq), size)]


def _task_fanout() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


def snapshot_index(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot ``index_dir`` into repository ``repo_dir`` under ``name``.
    Returns {name, files, bytes, copied_blobs, n_docs} — ``copied_blobs`` <
    ``files`` means the repository already held the rest (incremental)."""
    snap_path = os.path.join(repo_dir, f"snap-{name}.json")
    if os.path.exists(snap_path):
        raise RuntimeError(f"snapshot {name!r} already exists in {repo_dir}")
    man = Manifest.load(index_dir)  # validates the index before copying
    os.makedirs(repo_dir, exist_ok=True)
    with RunLock(index_dir, owner=f"snapshot-{name}"):
        rels = _iter_index_files(index_dir)
        parts = ray.get(
            [
                _snapshot_chunk.remote(index_dir, repo_dir, c)
                for c in _chunks(rels, _task_fanout())
            ]
        )
    files: dict[str, dict] = {}
    copied = 0
    for p in parts:
        files.update(p["entries"])
        copied += p["copied"]
    doc = {
        "name": name,
        "created": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_docs": man.n_docs,
        "files": files,
    }
    tmp = snap_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    os.replace(tmp, snap_path)
    return {
        "name": name,
        "files": len(files),
        "bytes": sum(e["bytes"] for e in files.values()),
        "copied_blobs": copied,
        "n_docs": man.n_docs,
    }


def list_snapshots(repo_dir: str) -> list[dict]:
    out = []
    for f in sorted(os.listdir(repo_dir)) if os.path.isdir(repo_dir) else []:
        if f.startswith("snap-") and f.endswith(".json"):
            with open(os.path.join(repo_dir, f)) as fh:
                d = json.load(fh)
            out.append(
                {"name": d["name"], "created": d.get("created"),
                 "n_docs": d.get("n_docs"), "files": len(d.get("files", {}))}
            )
    return out


def restore_index(
    repo_dir: str, name: str, target_dir: str, *, fsck: bool = True
) -> dict:
    """Materialize snapshot ``name`` at ``target_dir`` (must not already hold
    an index). Every blob is sha-verified while writing; with ``fsck`` the
    restored index's own invariants are re-checked too."""
    snap_path = os.path.join(repo_dir, f"snap-{name}.json")
    if not os.path.exists(snap_path):
        raise FileNotFoundError(f"no snapshot {name!r} in {repo_dir}")
    if os.path.exists(os.path.join(target_dir, "manifest.json")):
        raise RuntimeError(f"{target_dir} already holds an index")
    with open(snap_path) as f:
        doc = json.load(f)
    items = [(rel, e["sha256"], e["bytes"]) for rel, e in sorted(doc["files"].items())]
    # manifest.json goes LAST, alone, after every data chunk verified: a
    # failed/interrupted restore then leaves no manifest behind, so the
    # "already holds an index" guard cannot block the retry
    last = [it for it in items if it[0] == "manifest.json"]
    items = [it for it in items if it[0] != "manifest.json"]
    os.makedirs(target_dir, exist_ok=True)
    n = sum(
        ray.get(
            [
                _restore_chunk.remote(repo_dir, target_dir, c)
                for c in _chunks(items, _task_fanout())
            ]
        )
    )
    if last:
        n += ray.get(_restore_chunk.remote(repo_dir, target_dir, last))
    out = {"name": name, "files": n, "n_docs": doc.get("n_docs")}
    if fsck:
        from .fsck import verify_index

        out["fsck"] = verify_index(target_dir)
    return out


def delete_snapshot(repo_dir: str, name: str) -> dict:
    """Drop a snapshot and garbage-collect blobs no remaining snapshot
    references (the ES delete-snapshot semantics)."""
    snap_path = os.path.join(repo_dir, f"snap-{name}.json")
    if not os.path.exists(snap_path):
        raise FileNotFoundError(f"no snapshot {name!r} in {repo_dir}")
    os.unlink(snap_path)
    live: set[str] = set()
    for s in list_snapshots(repo_dir):
        with open(os.path.join(repo_dir, f"snap-{s['name']}.json")) as f:
            live.update(e["sha256"] for e in json.load(f)["files"].values())
    removed = 0
    blobs_root = os.path.join(repo_dir, "blobs")
    if os.path.isdir(blobs_root):
        for sub in os.listdir(blobs_root):
            d = os.path.join(blobs_root, sub)
            for b in os.listdir(d):
                if b not in live:
                    os.unlink(os.path.join(d, b))
                    removed += 1
            if not os.listdir(d):
                os.rmdir(d)
    return {"deleted": name, "blobs_gced": removed}
