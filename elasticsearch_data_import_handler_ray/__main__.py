"""CLI entry points (SURVEY.md §2.E) — `ray job submit`-able.

    python -m elasticsearch_data_import_handler_ray build <corpus> <index_dir>
        [--mode full|incremental] [--analyzer code|whitespace|unicode]
        [--num-segments N] [--doc-id-col COL] [--content-col COL]
        [--verify-sidecar PATH] [--positions]
    python -m elasticsearch_data_import_handler_ray query <index_dir> <text>...
        [-k 10] [--mode or|and|phrase] [--method auto|bmw|exhaustive]
        [--fuzzy N] [--wildcard] [--facet FIELD]
    python -m elasticsearch_data_import_handler_ray merge <index_dir>
    python -m elasticsearch_data_import_handler_ray fsck <index_dir>

These own their Ray session (guarded init) — library code never does.
The reference's equivalent was `java -jar kohesive-dih.jar <config.conf>`;
config-driven runs go through pipelines/spec.py instead.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="elasticsearch_data_import_handler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("corpus")
    b.add_argument("index_dir")
    b.add_argument("--mode", default="full", choices=["full", "incremental"])
    b.add_argument("--analyzer", default="code")
    b.add_argument("--num-segments", type=int, default=16)
    b.add_argument("--doc-id-col", default=None)
    b.add_argument("--content-col", default="content")
    b.add_argument("--verify-sidecar", default=None)
    b.add_argument("--positions", action="store_true",
                   help="index token positions (enables --mode phrase queries)")
    b.add_argument("--store", action="append", default=[], metavar="FIELD",
                   help="store a source column in the docmap (facet doc values); repeatable")

    q = sub.add_parser("query")
    q.add_argument("index_dir")
    q.add_argument("text", nargs="+")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode", default="or", choices=["or", "and", "phrase"])
    q.add_argument("--method", default="auto", choices=["auto", "bmw", "exhaustive"])
    q.add_argument("--fuzzy", type=int, default=0, metavar="N",
                   help="fuzzy-expand the last token within N edits")
    q.add_argument("--wildcard", action="store_true",
                   help="treat each text as a */? wildcard term pattern")
    q.add_argument("--facet", default=None, metavar="FIELD",
                   help="print per-FIELD doc counts over ALL matches instead of top-k")

    m = sub.add_parser("merge")
    m.add_argument("index_dir")

    fs = sub.add_parser("fsck", help="verify every on-disk index invariant")
    fs.add_argument("index_dir")

    pl = sub.add_parser("pipeline", help="run a JSON pipeline spec (the reference's config file)")
    pl.add_argument("spec_json")
    pl.add_argument(
        "--registry",
        default=None,
        help="module:attr of a dict mapping step names to Dataset->Dataset fns",
    )

    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    try:
        if args.cmd == "build":
            from .index.build import build_index, verify_hashes
            from .state.manifest import IndexConfig

            cfg = None
            if args.mode == "full":
                cfg = IndexConfig(
                    analyzer=args.analyzer,
                    num_segments=args.num_segments,
                    doc_id_col=args.doc_id_col,
                    content_col=args.content_col,
                    positions=args.positions,
                    store_cols=tuple(args.store),
                )
            res = build_index(args.corpus, args.index_dir, mode=args.mode, config=cfg)
            out = {
                "run_id": res.run_id,
                "n_docs": res.n_docs,
                "n_postings": res.n_postings,
                "duration_s": round(res.duration_s, 3),
                "skipped": res.skipped,
            }
            if args.verify_sidecar:
                out["verified_rows"] = verify_hashes(args.index_dir, args.verify_sidecar)
            print(json.dumps(out))
        elif args.cmd == "query":
            from .index.query import QueryEngine

            eng = QueryEngine(args.index_dir)
            try:
                if args.facet:
                    for t in args.text:
                        fac = eng.facets(t, args.facet, mode=args.mode)
                        print(json.dumps({"query": t, "facets": [{"value": v, "n": n} for v, n in fac]}))
                    results = []
                elif args.wildcard:
                    results = [eng.search_wildcard(t, k=args.k) for t in args.text]
                elif args.fuzzy:
                    results = [eng.search_fuzzy(t, k=args.k, max_edits=args.fuzzy) for t in args.text]
                else:
                    results = eng.search_many(
                        [{"text": t, "mode": args.mode} for t in args.text],
                        k=args.k,
                        method=args.method,
                    )
            finally:
                eng.close()
            for t, res in zip(args.text, results):
                print(json.dumps({"query": t, "hits": [{"doc_id": d, "score": s} for d, s in res]}))
        elif args.cmd == "merge":
            from .index.merge import merge_index

            print(json.dumps({"merged_run": merge_index(args.index_dir)}))
        elif args.cmd == "fsck":
            from .index.fsck import verify_index

            print(json.dumps(verify_index(args.index_dir)))
        elif args.cmd == "pipeline":
            import importlib

            from .pipelines.spec import PipelineSpec, run_pipeline

            registry = {}
            if args.registry:
                mod, attr = args.registry.split(":")
                registry = getattr(importlib.import_module(mod), attr)
            with open(args.spec_json) as f:
                spec = PipelineSpec.from_dict(json.load(f), registry)
            print(json.dumps(run_pipeline(spec)))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
