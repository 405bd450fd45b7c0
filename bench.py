"""Benchmark harness (BASELINE.md protocol).

Plain run: executes the headline pipeline — full inverted-index build over the
deterministic synthetic code corpus (FIXTURES.md §1, bench scale) + BM25
top-10 latency over the reference query set — plus a set of relational/dedup
pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1), then prints
ONE JSON line::

    {"metric": "index_build_s", "value": <headline seconds>, "unit": "sec",
     "queries": {...per-pipeline seconds...}, "sf": ..., "num_cpus": N,
     "docs_per_s": ..., "query_p50_ms": ..., "query_p95_ms": ...}

``--scaling``: runs the SAME job in two fresh subprocesses at
``num_cpus=8`` and ``num_cpus=32`` (the sandbox substitute for N vs 4N nodes,
BASELINE.json:14) and prints throughputs + scaling efficiency.

This script OWNS its Ray session (ray.init/shutdown) — library code never does.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "60000"))
CORPUS_DIR = f"/tmp/edih_bench_corpus_{BENCH_DOCS}"
INDEX_DIR = f"/tmp/edih_bench_index_{BENCH_DOCS}_{NUM_CPUS}"


def ensure_corpus() -> str:
    marker = os.path.join(CORPUS_DIR, ".complete")
    if not os.path.exists(marker):
        from fixtures.gen_corpus import generate_corpus

        generate_corpus(
            BENCH_DOCS, CORPUS_DIR, seed=42, min_tokens=30, max_tokens=300, n_files=32
        )
        with open(marker, "w") as f:
            f.write("ok")
    return CORPUS_DIR



def _index_bytes(index_dir: str) -> int:
    """Total encoded posting bytes from the manifest (compression metric)."""
    from elasticsearch_data_import_handler_ray.state.manifest import Manifest

    man = Manifest.load(index_dir)
    return sum(
        s["postings_bytes"] for r in man.complete_runs().values() for s in r["segments"]
    )


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import shutil

    from elasticsearch_data_import_handler_ray.index.build import build_index
    from elasticsearch_data_import_handler_ray.index.query import QueryEngine
    from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
    from fixtures.queries import generate_queries

    corpus = ensure_corpus()
    # warm the page cache so we measure compute+shuffle, not first disk read
    for f in os.listdir(corpus):
        with open(os.path.join(corpus, f), "rb") as fh:
            fh.read()

    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    t0 = time.monotonic()
    res = build_index(
        corpus,
        INDEX_DIR,
        mode="full",
        config=IndexConfig(analyzer="code", num_segments=32),
        compute_sha=True,
    )
    build_s = time.monotonic() - t0

    # query latency: per-query round trips (p50/p95), BMW
    eng = QueryEngine(INDEX_DIR)
    qs = generate_queries(seed=42)
    eng.search_many(qs[:5], k=10, method="auto")  # warm actors / page cache

    def _lat(method):
        lat = []
        for q in qs:
            t0 = time.monotonic()
            eng.search_many([q], k=10, method=method)
            lat.append((time.monotonic() - t0) * 1000)
        lat.sort()
        return statistics.median(lat), lat[int(0.95 * len(lat)) - 1]

    p50, p95 = _lat("auto")           # headline: auto picks the faster scorer
    bmw_p50, bmw_p95 = _lat("bmw")    # explicit BMW numbers for transparency
    t0 = time.monotonic()
    eng.search_many(qs, k=10, method="exhaustive")
    exhaustive_batch_s = time.monotonic() - t0
    eng.close()

    # positional build + phrase latency (positions sidecar, mode="phrase")
    pos_dir = INDEX_DIR + "_pos"
    shutil.rmtree(pos_dir, ignore_errors=True)
    t0 = time.monotonic()
    build_index(
        corpus,
        pos_dir,
        mode="full",
        config=IndexConfig(analyzer="code", num_segments=32, positions=True),
        compute_sha=False,
    )
    pos_build_s = time.monotonic() - t0
    engp = QueryEngine(pos_dir)
    phrases = [
        {"text": "hot term", "mode": "phrase"},
        {"text": "parse json", "mode": "phrase"},
        {"text": "read write buf", "mode": "phrase"},
        {"text": "hash sort merge", "mode": "phrase"},
        {"text": "init proc exec req", "mode": "phrase"},
    ] * 6
    engp.search_many(phrases[:2], k=10)
    ph_lat = []
    for q in phrases:
        t0 = time.monotonic()
        engp.search_many([q], k=10)
        ph_lat.append((time.monotonic() - t0) * 1000)
    ph_lat.sort()
    phrase_p50 = statistics.median(ph_lat)
    phrase_p95 = ph_lat[int(0.95 * len(ph_lat)) - 1]
    # round-2 query surfaces on the same positional index: sloppy phrase
    # (transposed bigrams, slop 2), rescore (top-50 window), suggester
    slop_lat, resc_lat, sug_lat = [], [], []
    for _ in range(10):
        t0 = time.monotonic()
        engp.search_many(
            [{"text": "term hot", "mode": "phrase", "slop": 2},
             {"text": "json parse", "mode": "phrase", "slop": 2}], k=10)
        slop_lat.append((time.monotonic() - t0) * 500)  # per query
        t0 = time.monotonic()
        engp.rescore("parse json buf", "parse json", window=50, k=10)
        resc_lat.append((time.monotonic() - t0) * 1000)
        t0 = time.monotonic()
        engp.suggest("parze mergq", max_edits=2)
        sug_lat.append((time.monotonic() - t0) * 1000)
    # round-3: Lucene query_string (nested bool + phrase + prefix expansion)
    qs_queries = [
        '(hot OR term) AND parse NOT zzznope',
        'pars* AND "hot term"~1^2',
        '+read write buf -proc',
    ]
    engp.query_string(qs_queries[0], k=10)  # warm
    qstr_lat = []
    for _ in range(10):
        for q in qs_queries:
            t0 = time.monotonic()
            engp.query_string(q, k=10)
            qstr_lat.append((time.monotonic() - t0) * 1000)
    engp.close()

    # relational / data-pipeline stage timings over SF_DIR
    import __ray_entry__ as entrymod

    q_times: dict[str, float] = {}
    picks = [
        "groupby_agg",
        "join_hash",
        "join_broadcast",
        "window_tumbling",
        "dedup_first",
        "sort_topk",
        "term_df_whitespace",
        "dedup_minhash",
        "ann_bruteforce",
        "token_count",
        "sql_dist_join_agg",
        "geo_knn_search",
        # round-5 additions: the outer-join planner path and the two-pass
        # distributed global-rank pattern
        "sql_dist_outer_join",
        "shuffle_order",
        # round-5 session 2: the edge-gram index (build + prefix queries)
        # and the span scorer over the positional index
        "search_as_you_type",
        "span_search",
    ]
    # cold AND warm per pipeline (VERDICT r4 wrong #4): the first call pays
    # per-worker import cost (duckdb etc.) that cold-only numbers twice
    # misread as operator regressions (join_broadcast r2, dedup_first r4);
    # "queries" stays the cold number for cross-round comparability,
    # "queries_warm" is the second, settled call.
    q_warm: dict[str, float] = {}
    allq = entrymod.queries()
    for name in picks:
        for target in (q_times, q_warm):
            t0 = time.monotonic()
            out = allq[name](SF_DIR)
            if hasattr(out, "materialize"):
                out.materialize()
            target[name] = round(time.monotonic() - t0, 3)

    result = {
        "metric": "index_build_s",
        "value": round(build_s, 3),
        "unit": "sec",
        "queries": q_times,
        "queries_warm": q_warm,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": res.n_docs,
        "n_postings": res.n_postings,
        "docs_per_s": round(res.n_docs / build_s, 1),
        "postings_bytes": _index_bytes(INDEX_DIR),
        "bytes_per_posting": round(_index_bytes(INDEX_DIR) / max(res.n_postings, 1), 2),
        "query_p50_ms": round(p50, 2),
        "query_p95_ms": round(p95, 2),
        "bmw_p50_ms": round(bmw_p50, 2),
        "bmw_p95_ms": round(bmw_p95, 2),
        "exhaustive_batch_s": round(exhaustive_batch_s, 3),
        "pos_build_s": round(pos_build_s, 3),
        "phrase_p50_ms": round(phrase_p50, 2),
        "slop_p50_ms": round(statistics.median(slop_lat), 2),
        "rescore_p50_ms": round(statistics.median(resc_lat), 2),
        "suggest_p50_ms": round(statistics.median(sug_lat), 2),
        "query_string_p50_ms": round(statistics.median(qstr_lat), 2),
        "phrase_p95_ms": round(phrase_p95, 2),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh processes, num_cpus=8 then 32 (BASELINE.md protocol).

    Uses a larger corpus than the plain bench (default 240k docs,
    $GRAFT_SCALING_DOCS) so per-CPU work dominates the fixed session/stage
    overheads — at 60k docs the 32-CPU build finishes in ~9 s of which most
    is startup, which understates scaling."""

    scaling_docs = os.environ.get("GRAFT_SCALING_DOCS", "240000")
    lo_n, hi_n = (
        int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
    )

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_ONLY_BUILD="1",
            GRAFT_BENCH_DOCS=scaling_docs,
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(lo_n), run(hi_n)
    r_lo, r_hi = lo["docs_per_s"], hi["docs_per_s"]
    eff = (r_hi / r_lo) / (hi_n / lo_n)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo_n,
        "cpus_hi": hi_n,
        f"docs_per_s_{lo_n}": r_lo,
        f"docs_per_s_{hi_n}": r_hi,
        f"build_s_{lo_n}": lo["value"],
        f"build_s_{hi_n}": hi["value"],
        f"query_p50_ms_{lo_n}": lo["query_p50_ms"],
        f"query_p50_ms_{hi_n}": hi["query_p50_ms"],
        f"query_p95_ms_{lo_n}": lo["query_p95_ms"],
        f"query_p95_ms_{hi_n}": hi["query_p95_ms"],
        "n_docs": hi["n_docs"],
    }


def run_build_only() -> dict:
    """Subprocess mode for --scaling: headline build + query latency only."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import shutil

    from elasticsearch_data_import_handler_ray.index.build import build_index
    from elasticsearch_data_import_handler_ray.index.query import QueryEngine
    from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
    from fixtures.queries import generate_queries

    corpus = ensure_corpus()
    for f in os.listdir(corpus):
        with open(os.path.join(corpus, f), "rb") as fh:
            fh.read()
    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    # GRAFT_SCALING_POSITIONS=1 runs the protocol on the positional build
    # (heavier shuffle payload — the r3 check that the ≥0.8 bar is not a
    # plain-postings artifact)
    positions = os.environ.get("GRAFT_SCALING_POSITIONS", "") == "1"
    t0 = time.monotonic()
    res = build_index(
        corpus,
        INDEX_DIR,
        mode="full",
        config=IndexConfig(analyzer="code", num_segments=32, positions=positions),
        compute_sha=True,
    )
    build_s = time.monotonic() - t0
    eng = QueryEngine(INDEX_DIR)
    qs = generate_queries(seed=42)
    eng.search_many(qs[:5], k=10, method="auto")
    lat = []
    for q in qs:
        t0 = time.monotonic()
        eng.search_many([q], k=10, method="auto")
        lat.append((time.monotonic() - t0) * 1000)
    eng.close()
    out = {
        "metric": "index_build_s",
        "value": round(build_s, 3),
        "unit": "sec",
        "queries": {},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": res.n_docs,
        "docs_per_s": round(res.n_docs / build_s, 1),
        "query_p50_ms": round(statistics.median(lat), 2),
        "query_p95_ms": round(sorted(lat)[int(0.95 * len(lat)) - 1], 2),
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif os.environ.get("GRAFT_BENCH_ONLY_BUILD"):
        print(json.dumps(run_build_only()))
    else:
        print(json.dumps(run_bench()))
