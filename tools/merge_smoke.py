"""Merge/compaction scale smoke (VERDICT r3 #9 / r4 next-steps #4).

Builds the 160x corpus (default 9.6M docs) as TWO runs — full over 60% of
the corpus files, incremental over the rest — then times ``merge_index``
over the resulting multi-run index and asserts post-merge fsck green.
Peak RSS is sampled across ALL local python/ray processes (driver +
workers) at 0.5 s, per phase. Prints ONE JSON line; numbers land in
BASELINE.md's scale-smoke ladder.

  python tools/merge_smoke.py [n_docs]        # default 9_600_000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 9_600_000
CORPUS = f"/tmp/edih_smoke_corpus_{N_DOCS}"
INDEX = f"/tmp/edih_smoke_idx_{N_DOCS}"


class RssSampler:
    """Peak summed RSS of every local python/ray process, sampled at 0.5 s.
    An approximation (includes this driver and any unrelated python), but
    the smoke runs on an otherwise idle host and the bias is stated."""

    def __init__(self):
        self.peak = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        import psutil

        while not self._stop.is_set():
            total = 0
            for p in psutil.process_iter(attrs=["name", "memory_info"]):
                try:
                    nm = p.info["name"] or ""
                    if "python" in nm or "ray" in nm:
                        total += p.info["memory_info"].rss
                except Exception:
                    pass
            self.peak = max(self.peak, total)
            time.sleep(0.5)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)


def main() -> dict:
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from elasticsearch_data_import_handler_ray.index.build import build_index
    from elasticsearch_data_import_handler_ray.index.fsck import verify_index
    from elasticsearch_data_import_handler_ray.index.merge import merge_index
    from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig, Manifest
    from fixtures.gen_corpus import corpus_files, generate_corpus

    out: dict = {"metric": "merge_smoke", "n_docs": N_DOCS}

    t0 = time.monotonic()
    marker = os.path.join(CORPUS, ".complete")
    if not os.path.exists(marker):
        generate_corpus(N_DOCS, CORPUS, seed=42, min_tokens=30, max_tokens=300,
                        n_files=512)
        open(marker, "w").write("ok")
    out["gen_s"] = round(time.monotonic() - t0, 1)

    files = corpus_files(CORPUS)
    cut = int(0.6 * len(files))
    shutil.rmtree(INDEX, ignore_errors=True)

    with RssSampler() as rs:
        t0 = time.monotonic()
        build_index(files[:cut], INDEX, mode="full",
                    config=IndexConfig(analyzer="code", num_segments=64),
                    compute_sha=False)
        out["build_full_s"] = round(time.monotonic() - t0, 1)
        out["build_peak_rss_gb"] = round(rs.peak / 1e9, 2)

    with RssSampler() as rs:
        t0 = time.monotonic()
        res2 = build_index(files, INDEX, mode="incremental", compute_sha=False)
        out["build_incr_s"] = round(time.monotonic() - t0, 1)
        out["incr_peak_rss_gb"] = round(rs.peak / 1e9, 2)

    man = Manifest.load(INDEX)
    out["runs_before_merge"] = len(man.complete_runs())
    out["n_postings"] = int(
        sum(s["n_postings"] for r in man.complete_runs().values()
            for s in r["segments"])
    )

    with RssSampler() as rs:
        t0 = time.monotonic()
        rid = merge_index(INDEX)
        out["merge_s"] = round(time.monotonic() - t0, 1)
        out["merge_peak_rss_gb"] = round(rs.peak / 1e9, 2)
    out["merged_run"] = rid
    out["runs_after_merge"] = len(Manifest.load(INDEX).complete_runs())

    t0 = time.monotonic()
    fsck = verify_index(INDEX)  # raises IndexCorruption on any finding
    out["fsck_s"] = round(time.monotonic() - t0, 1)
    out["fsck_ok"] = not fsck.get("problems")
    out["fsck_docs"] = int(fsck.get("n_docs", 0))

    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
