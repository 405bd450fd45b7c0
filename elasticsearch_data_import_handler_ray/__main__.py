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
    q.add_argument("--slop", type=int, default=0, metavar="N",
                   help="match_phrase proximity (with --mode phrase): allowed positional span")
    q.add_argument("--fuzzy", type=int, default=0, metavar="N",
                   help="fuzzy-expand the last token within N edits")
    q.add_argument("--must", default="", metavar="TEXT",
                   help="composed bool query: required clause (text becomes should)")
    q.add_argument("--must-not", default="", metavar="TEXT", dest="must_not",
                   help="composed bool query: exclusion clause")
    q.add_argument("--msm", type=int, default=0,
                   help="minimum_should_match for the composed bool query")
    q.add_argument("--collapse", metavar="FIELD",
                   help="ES field collapsing: one best hit per distinct value of a stored field")
    q.add_argument("--synonyms", metavar="GROUPS",
                   help='query-time synonym groups, e.g. "fast,quick;merge,sort" '
                        "(Lucene SynonymQuery blending)")
    q.add_argument("--rescore", metavar="TEXT",
                   help="ES rescore: re-rank the top window by this (phrase) query; "
                        "window/weights fixed at 50/1.0/1.0, slop via --slop")
    q.add_argument("--suggest", nargs="?", const="missing",
                   choices=["missing", "popular", "always"], metavar="MODE",
                   help="ES term suggester (did-you-mean) instead of search; "
                        "edit budget = --fuzzy N (default 2)")
    q.add_argument("--complete", action="store_true",
                   help="ES completion suggester: treat each text as a prefix, "
                        "return dictionary completions ranked by df weight")
    q.add_argument("--suggest-phrase", action="store_true",
                   help="ES phrase suggester: whole-phrase did-you-mean ranked "
                        "by a bigram stupid-backoff model over the positional "
                        "index; edit budget = --fuzzy N (default 1)")
    q.add_argument("--wildcard", action="store_true",
                   help="treat each text as a */? wildcard term pattern")
    q.add_argument("--facet", default=None, metavar="FIELD",
                   help="print per-FIELD doc counts over ALL matches instead of top-k")
    q.add_argument("--count", action="store_true",
                   help="print only the match count (ES _count)")
    q.add_argument("--span-near", default=None, type=int, metavar="SLOP",
                   help="ES span_near: the analyzed tokens as single-term "
                        "spans within (span - n) <= SLOP; --unordered for "
                        "any arrangement (needs a positional index)")
    q.add_argument("--unordered", action="store_true",
                   help="with --span-near: drop the in-order requirement")
    q.add_argument("--span-first", default=None, type=int, metavar="END",
                   help="ES span_first: the (single) term must occur with "
                        "its span ending by END")
    q.add_argument("--match-bool-prefix", action="store_true",
                   dest="match_bool_prefix",
                   help="ES match_bool_prefix: whole-term bool clauses + the "
                        "last token as a prefix clause (--mode = operator)")
    q.add_argument("--multi-terms", default=None, metavar="F1,F2[,...]",
                   help="ES multi_terms agg: doc counts per composite key of "
                        "2+ doc-value fields over all matches")
    q.add_argument("--rare-terms", default=None, metavar="FIELD[:MAX]",
                   help="ES rare_terms agg (exact): FIELD buckets with <= MAX "
                        "matching docs (default 1), rarest first")
    q.add_argument("--weighted-avg", default=None, metavar="VALUE:WEIGHT",
                   help="ES weighted_avg agg over all matches")
    q.add_argument("--terms-set", default=None, metavar="MSM_FIELD",
                   help="ES terms_set query: matched-term count >= the doc's "
                        "own value of MSM_FIELD")
    q.add_argument("--distance-feature", default=None,
                   metavar="FIELD:ORIGIN:PIVOT[:WEIGHT]",
                   help="ES distance_feature: additive boost "
                        "weight*pivot/(pivot+|v-origin|)")
    q.add_argument("--significant-text", action="store_true",
                   dest="significant_text",
                   help="ES significant_text: over-represented terms of the "
                        "match set's re-analyzed stored text (JLH)")
    q.add_argument("--terms-stats", default=None, metavar="GROUP:VALUE",
                   help="ES terms agg + stats sub-agg: per-GROUP bucket "
                        "count/sum/min/max/avg of VALUE over all matches")
    q.add_argument("--composite", default=None, metavar="F1,F2[:SIZE]",
                   help="ES composite agg: ascending-key buckets walked with "
                        "the after cursor to exhaustion")
    q.add_argument("--sorted-by", default=None, metavar="FIELD[:asc]",
                   help="sort matches by a numeric doc-value instead of "
                        "_score (desc unless ':asc'); --after VALUE,DOC_ID "
                        "pages through the field sort")
    q.add_argument("--filter", action="append", default=[], metavar="FIELD OP VALUE",
                   nargs=3, help="doc-values filter clause, e.g. --filter lang eq en "
                   "or --filter n_chars gte 200 (ops: eq gte gt lte lt); repeatable")
    q.add_argument("--after", default=None, metavar="SCORE,DOC_ID",
                   help="search_after cursor from the previous page's last hit")
    q.add_argument("--regexp", action="store_true",
                   help="treat the query as an anchored regexp over dictionary terms")
    q.add_argument("--query-string", action="store_true", dest="query_string",
                   help='parse TEXT as the Lucene query_string mini-language '
                        '(AND/OR/NOT, +/-, parens, "phrase"~slop, wild*ards, '
                        "fuzzy~N, ^boost; -k 0 prints the full match set)")
    q.add_argument("--mlt", action="store_true",
                   help="more_like_this: the query is a like-text (or a doc_id if integer)")
    q.add_argument("--cardinality", default=None, metavar="FIELD",
                   help="distinct count of FIELD over all matching docs")
    q.add_argument("--date-histogram", default=None, metavar="FIELD:INTERVAL",
                   help="calendar buckets (year|month|day) of an ISO date doc-value")
    q.add_argument("--significant", default=None, metavar="FIELD[:HEURISTIC]",
                   help="significant_terms of FIELD under the query "
                        "(heuristic: jlh default, or chi_square)")
    q.add_argument("--top-hits", default=None, metavar="FIELD:N",
                   help="per-FIELD-value match counts with top-N hits each")
    q.add_argument("--boost", default=None, metavar="FIELD:MODIFIER:WEIGHT",
                   help="function_score field_value_factor re-ranking "
                        "(modifiers: none log log1p log2p ln ln1p ln2p "
                        "square sqrt reciprocal — log family base-10 as ES)")
    q.add_argument("--decay", default=None,
                   metavar="FIELD:FN:ORIGIN:SCALE[:OFFSET[:DECAY]]",
                   help="function_score decay re-ranking (fn: gauss exp "
                        "linear; value at SCALE from ORIGIN scores DECAY, "
                        "default 0.5)")
    q.add_argument("--export", default=None, metavar="DIR",
                   help="write ALL matching docs as partitioned parquet to DIR")
    q.add_argument("--highlight", nargs="?", const=100, type=int, default=None,
                   metavar="FRAGMENT_SIZE",
                   help="print ES-style <em>-tagged text fragments per hit "
                        "(plain highlighter over stored _source; needs "
                        "store_cols at build time; default 100 chars)")
    q.add_argument("--stats", default=None, metavar="FIELD",
                   help="print stats aggregation of FIELD over ALL matches")
    q.add_argument("--percentiles", default=None, metavar="FIELD",
                   help="print exact p25/50/75/95/99 of FIELD over ALL matches")
    q.add_argument("--histogram", default=None, metavar="FIELD:INTERVAL",
                   help="print histogram of FIELD with INTERVAL-wide buckets over ALL matches")

    m = sub.add_parser("merge")
    m.add_argument("index_dir")

    dl = sub.add_parser("delete", help="delete docs by id or by query (tombstoned now, purged at merge)")
    dl.add_argument("index_dir")
    dl.add_argument("--ids", default=None, help="comma-separated doc_ids")
    dl.add_argument("--query", default=None, help="delete every doc matching this query")
    dl.add_argument("--mode", default="or", choices=["or", "and"])
    dl.add_argument("--query-string", action="store_true", dest="query_string",
                   help="parse --query as the Lucene query_string mini-language "
                        "(boolean trees, ranges, _exists_ — the full surface)")

    fs = sub.add_parser("fsck", help="verify every on-disk index invariant")
    fs.add_argument("index_dir")

    st = sub.add_parser("stats", help="ES _cat/indices: manifest + per-run summary of an index")
    st.add_argument("index_dir")

    an = sub.add_parser("analyze", help="ES _analyze: print the token stream for a text")
    an.add_argument("text", nargs="+")
    an.add_argument("--analyzer", default="code",
                    help='analyzer name, e.g. code, whitespace, unicode, "code+stop+stem"')
    an.add_argument("--index", default=None,
                    help="use this index's configured analyzer instead")

    sn = sub.add_parser("snapshot", help="snapshot an index into a content-addressed repository")
    sn.add_argument("index_dir")
    sn.add_argument("repo_dir")
    sn.add_argument("name")

    rs = sub.add_parser("restore", help="restore a snapshot (sha-verified + fsck'd)")
    rs.add_argument("repo_dir")
    rs.add_argument("name")
    rs.add_argument("target_dir")

    sl = sub.add_parser("snapshots", help="list / delete snapshots in a repository")
    sl.add_argument("repo_dir")
    sl.add_argument("--delete", metavar="NAME", help="drop a snapshot and GC unreferenced blobs")

    ri = sub.add_parser("reindex", help="rebuild from stored _source with a new config")
    ri.add_argument("src_index_dir")
    ri.add_argument("dst_index_dir")
    ri.add_argument("--analyzer", default=None)
    ri.add_argument("--num-segments", type=int, default=None)
    ri.add_argument("--positions", action="store_true")

    pl = sub.add_parser(
        "pipeline", help="run a pipeline spec — JSON, or HOCON for .conf files"
    )
    pl.add_argument("spec_json")
    pl.add_argument(
        "--registry",
        default=None,
        help="module:attr of a dict mapping step names to Dataset->Dataset fns",
    )

    nb = sub.add_parser("nested-build", help="index a list<struct> column with ES nested semantics")
    nb.add_argument("corpus", help="parquet file/dir holding the parent table")
    nb.add_argument("index_dir")
    nb.add_argument("--parent-id-col", required=True)
    nb.add_argument("--nested-col", required=True)
    nb.add_argument("--sub-fields", required=True, help="comma-separated struct field names")
    nb.add_argument("--analyzer", default="whitespace")
    nb.add_argument("--num-segments", type=int, default=4)

    mq = sub.add_parser("mf-query",
                        help="search a multi-field index (build_multifield_index dir)")
    mq.add_argument("index_dir")
    mq.add_argument("text", nargs="+")
    mq.add_argument("--mode", default="or", choices=["or", "and"])
    mq.add_argument("-k", type=int, default=10)
    mq.add_argument("--query-string", action="store_true", dest="query_string",
                    help="parse TEXT as the cross-field Lucene mini-language "
                         "(field: restrictions supported)")
    mq.add_argument("--combined-fields", action="store_true",
                    dest="combined_fields",
                    help="term-centric BM25F (ES combined_fields) instead of "
                         "the field-centric weighted sum")

    nq = sub.add_parser("nested-query", help="nested match: field=text clauses on the SAME child")
    nq.add_argument("index_dir")
    nq.add_argument("clauses", nargs="+", help="field=text pairs (repeat fields allowed)")
    nq.add_argument("--mode", default="and", choices=["and", "or"])
    nq.add_argument("--score-mode", default="max", choices=["max", "sum", "avg"])
    nq.add_argument("-k", type=int, default=10)

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

            def parse_filters(raw):
                out = []
                for field, op, val in raw:
                    if op not in ("eq", "neq", "gte", "gt", "lte", "lt", "in",
                                  "prefix"):
                        raise SystemExit(f"unknown filter op {op}")
                    try:
                        nonnum = ("eq", "neq", "in", "prefix")
                        v = float(val) if op not in nonnum else val
                        if op not in nonnum and v == int(v):
                            v = int(v)
                    except ValueError:
                        v = val
                    out.append({"field": field, op: v.split(",") if op == "in" else v})
                return out

            if "," in args.index_dir:
                # ES alias: comma-separated index dirs searched as one
                from .index.alias import MultiIndexEngine

                eng = MultiIndexEngine(args.index_dir.split(","))
            else:
                eng = QueryEngine(args.index_dir)
            try:
                if args.count:
                    for t in args.text:
                        n = (eng.query_string_agg(t, agg="count") if args.query_string
                             else eng.count(t, mode=args.mode))
                        print(json.dumps({"query": t, "count": n}))
                    results = []
                elif args.stats:
                    for t in args.text:
                        st = (eng.query_string_agg(t, args.stats, agg="stats")
                              if args.query_string
                              else eng.stats(t, args.stats, mode=args.mode))
                        print(json.dumps({"query": t, "stats": st}))
                    results = []
                elif args.percentiles:
                    for t in args.text:
                        pct = eng.percentiles(t, args.percentiles, mode=args.mode)
                        print(json.dumps({"query": t, "percentiles": pct}))
                    results = []
                elif args.histogram:
                    field, interval = args.histogram.rsplit(":", 1)
                    for t in args.text:
                        buckets = (eng.query_string_agg(t, field, agg="histogram",
                                                        interval=float(interval))
                                   if args.query_string
                                   else eng.histogram(t, field, float(interval), mode=args.mode))
                        print(json.dumps({"query": t, "buckets": [{"key": b, "n": n} for b, n in buckets]}))
                    results = []
                elif args.filter:
                    flts = parse_filters(args.filter)
                    results = [
                        eng.search_filtered(t, flts, k=args.k, mode=args.mode, method=args.method)
                        for t in args.text
                    ]
                elif args.sorted_by:
                    fld, _, direction = args.sorted_by.partition(":")
                    desc = direction.lower() != "asc"
                    cursor = None
                    if args.after:
                        v, d = args.after.split(",")
                        cursor = (float(v), int(d))
                    results = [
                        eng.search_sorted_by(t, fld, k=args.k, mode=args.mode,
                                             descending=desc, after=cursor)
                        for t in args.text
                    ]
                elif args.after:
                    s, d = args.after.split(",")
                    results = [
                        eng.search_after(t, (float(s), int(d)), k=args.k,
                                         mode=args.mode, method=args.method)
                        for t in args.text
                    ]
                elif args.facet:
                    for t in args.text:
                        fac = (eng.query_string_agg(t, args.facet, agg="facets")
                               if args.query_string
                               else eng.facets(t, args.facet, mode=args.mode))
                        print(json.dumps({"query": t, "facets": [{"value": v, "n": n} for v, n in fac]}))
                    results = []
                elif args.cardinality:
                    for t in args.text:
                        print(json.dumps({"query": t, "field": args.cardinality,
                                          "cardinality": eng.cardinality(t, args.cardinality, mode=args.mode)}))
                    results = []
                elif args.date_histogram:
                    field, interval = args.date_histogram.rsplit(":", 1)
                    for t in args.text:
                        buckets = eng.date_histogram(t, field, interval=interval, mode=args.mode)
                        print(json.dumps({"query": t, "buckets": [{"key": b, "n": n} for b, n in buckets]}))
                    results = []
                elif args.span_near is not None:
                    results = [
                        eng.span_near_search(t, slop=args.span_near,
                                             in_order=not args.unordered, k=args.k)
                        for t in args.text
                    ]
                elif args.span_first is not None:
                    results = [
                        eng.span_first_search(t, args.span_first, k=args.k)
                        for t in args.text
                    ]
                elif args.match_bool_prefix:
                    results = [
                        eng.match_bool_prefix(t, k=args.k, operator=args.mode)
                        for t in args.text
                    ]
                elif args.multi_terms:
                    fields = [f for f in args.multi_terms.split(",") if f]
                    for t in args.text:
                        buckets = eng.multi_terms(t, fields, mode=args.mode, top=args.k)
                        print(json.dumps({"query": t, "buckets": [
                            {"key": list(kv), "n": n} for kv, n in buckets]}))
                    results = []
                elif args.rare_terms:
                    field, _, mx = args.rare_terms.partition(":")
                    for t in args.text:
                        buckets = eng.rare_terms(t, field, max_doc_count=int(mx or 1),
                                                 mode=args.mode)
                        print(json.dumps({"query": t, "buckets": [
                            {"value": v, "n": n} for v, n in buckets]}))
                    results = []
                elif args.weighted_avg:
                    vf, _, wf = args.weighted_avg.partition(":")
                    for t in args.text:
                        print(json.dumps({"query": t, "weighted_avg":
                                          eng.weighted_avg(t, vf, wf, mode=args.mode)}))
                    results = []
                elif args.terms_set:
                    results = [
                        eng.terms_set_search(t, args.terms_set, k=args.k)
                        for t in args.text
                    ]
                elif args.distance_feature:
                    parts_ = args.distance_feature.split(":")
                    fld, org, piv = parts_[0], float(parts_[1]), float(parts_[2])
                    wt = float(parts_[3]) if len(parts_) > 3 else 1.0
                    results = [
                        eng.search_distance_feature(
                            t, fld, origin=org, pivot=piv, weight=wt, k=args.k)
                        for t in args.text
                    ]
                elif args.significant_text:
                    for t in args.text:
                        print(json.dumps({"query": t, "significant":
                                          eng.significant_text(t, mode=args.mode,
                                                               top=args.k)}))
                    results = []
                elif args.terms_stats:
                    gf, _, vf = args.terms_stats.partition(":")
                    for t in args.text:
                        print(json.dumps({"query": t, "buckets":
                                          eng.terms_stats(t, gf, vf,
                                                          mode=args.mode, top=args.k)}))
                    results = []
                elif args.composite:
                    spec, _, sz = args.composite.partition(":")
                    fields = [f for f in spec.split(",") if f]
                    for t in args.text:
                        after, rows = None, []
                        while True:
                            batch, after = eng.composite_agg(
                                t, fields, mode=args.mode,
                                size=int(sz or 10), after=after)
                            rows.extend(batch)
                            if after is None:
                                break
                        print(json.dumps({"query": t, "buckets": rows}))
                    results = []
                elif args.significant:
                    for t in args.text:
                        sfield, _, sheur = args.significant.partition(":")
                        print(json.dumps({"query": t, "significant": eng.significant_terms(t, sfield, mode=args.mode, heuristic=sheur or "jlh")}))
                    results = []
                elif args.top_hits:
                    field, n = args.top_hits.rsplit(":", 1)
                    for t in args.text:
                        buckets = eng.top_hits(t, field, mode=args.mode, n_hits=int(n))
                        print(json.dumps({"query": t, "buckets": [
                            {"value": b["value"], "n": b["count"],
                             "hits": [{"doc_id": d, "score": s} for d, s in b["hits"]]}
                            for b in buckets]}))
                    results = []
                elif args.boost:
                    field, modifier, weight = args.boost.split(":")
                    results = [
                        eng.search_boosted(t, field, modifier=modifier,
                                           weight=float(weight), k=args.k, mode=args.mode)
                        for t in args.text
                    ]
                elif args.decay:
                    parts = args.decay.split(":")
                    if len(parts) < 4:
                        raise SystemExit(
                            "--decay needs FIELD:FN:ORIGIN:SCALE[:OFFSET[:DECAY]]"
                        )
                    field, fn, origin, scale = parts[:4]
                    offset = float(parts[4]) if len(parts) > 4 else 0.0
                    dc = float(parts[5]) if len(parts) > 5 else 0.5
                    results = [
                        eng.search_decay(t, field, fn=fn, origin=float(origin),
                                         scale=float(scale), offset=offset,
                                         decay=dc, k=args.k, mode=args.mode)
                        for t in args.text
                    ]
                elif args.export:
                    for t in args.text:
                        res = eng.export_matches(t, args.export, mode=args.mode)
                        print(json.dumps({"query": t, "exported_rows": res["n_rows"],
                                          "files": len(res["files"])}))
                    results = []
                elif args.regexp:
                    results = [eng.search_regexp(t, k=args.k) for t in args.text]
                elif args.query_string:
                    cur = None
                    if args.after:
                        _s, _d = args.after.split(",")
                        cur = (float(_s), int(_d))
                    results = [
                        eng.query_string(t, k=args.k, after=cur,
                                         minimum_should_match=args.msm or None)
                        for t in args.text
                    ]
                elif args.mlt:
                    results = [
                        eng.more_like_this(int(t) if t.isdigit() else t, k=args.k)
                        for t in args.text
                    ]
                elif args.must or args.must_not or args.msm:
                    results = [
                        eng.bool_search(
                            must=args.must, should=t, must_not=args.must_not,
                            minimum_should_match=args.msm, k=args.k,
                        )
                        for t in args.text
                    ]
                elif args.collapse:
                    for t in args.text:
                        hits = eng.collapse(t, args.collapse, k=args.k, mode=args.mode)
                        print(json.dumps({"query": t, "collapsed": hits}))
                    results = []
                elif args.synonyms:
                    groups = [g.split(",") for g in args.synonyms.split(";") if g]
                    results = [
                        eng.search_synonyms(t, groups, k=args.k, mode=args.mode)
                        for t in args.text
                    ]
                elif args.rescore:
                    results = [
                        eng.rescore(t, args.rescore, k=args.k, slop=args.slop)
                        for t in args.text
                    ]
                elif args.suggest:
                    for t in args.text:
                        sug = eng.suggest(
                            t, max_edits=args.fuzzy or 2, suggest_mode=args.suggest
                        )
                        print(json.dumps({"query": t, "suggest": sug}))
                    results = []
                elif args.complete:
                    for t in args.text:
                        sug = eng.suggest_complete(t, top=args.k)
                        print(json.dumps({"prefix": t, "complete": sug}))
                    results = []
                elif args.suggest_phrase:
                    for t in args.text:
                        sug = eng.suggest_phrase(t, max_edits=args.fuzzy or 1)
                        print(json.dumps({"query": t, "suggest_phrase": sug}))
                    results = []
                elif args.wildcard:
                    results = [eng.search_wildcard(t, k=args.k) for t in args.text]
                elif args.fuzzy:
                    results = [eng.search_fuzzy(t, k=args.k, max_edits=args.fuzzy) for t in args.text]
                else:
                    results = eng.search_many(
                        [{"text": t, "mode": args.mode, "slop": args.slop} for t in args.text],
                        k=args.k,
                        method=args.method,
                    )
                hls = None
                if args.highlight is not None and results:
                    if args.query_string:
                        hls = [
                            {
                                d: fs
                                for d, _, fs in eng.query_string_highlight_fragments(
                                    t, k=args.k, fragment_size=args.highlight
                                )
                            }
                            for t in args.text
                        ]
                    else:
                        hls = [
                            eng.highlight_fragments(
                                t, [d for d, _ in res], fragment_size=args.highlight
                            )
                            for t, res in zip(args.text, results)
                        ]
            finally:
                eng.close()
            for i, (t, res) in enumerate(zip(args.text, results)):
                hits = []
                for d, s in res:
                    h = {"doc_id": d, "score": s}
                    if hls is not None:
                        h["highlight"] = hls[i].get(d, [])
                    hits.append(h)
                print(json.dumps({"query": t, "hits": hits}))
        elif args.cmd == "delete":
            from .index.tombstones import add_deletions

            if bool(args.ids) == bool(args.query):
                raise SystemExit("delete needs exactly one of --ids / --query")
            if args.ids:
                ids = [int(x) for x in args.ids.split(",")]
            else:
                from .index.query import QueryEngine

                eng = QueryEngine(args.index_dir)
                try:
                    if args.query_string:
                        # full Lucene surface → match set via k=0
                        ids = [int(d) for d, _ in eng.query_string(args.query, k=0)]
                    else:
                        terms = eng.analyze(args.query)
                        import ray as _ray

                        per = _ray.get(
                            [a.match_doc_ids.remote(terms, args.mode) for a in eng._actors]
                        )
                        ids = [int(d) for p in per for d in p]
                finally:
                    eng.close()
            print(json.dumps({"deleted": add_deletions(args.index_dir, ids)}))
        elif args.cmd == "merge":
            from .index.merge import merge_index

            print(json.dumps({"merged_run": merge_index(args.index_dir)}))
        elif args.cmd == "fsck":
            from .index.fsck import verify_index

            print(json.dumps(verify_index(args.index_dir)))
        elif args.cmd == "stats":
            from .state.manifest import Manifest

            man = Manifest.load(args.index_dir)
            runs = man.complete_runs()
            print(json.dumps({
                "n_docs": man.n_docs,
                "sum_dl": man.sum_dl,
                "avgdl": round(man.avgdl, 4),
                "config": man.config.to_dict(),
                "runs": [
                    {"run_id": rid, "n_docs": r.get("n_docs"),
                     "n_postings": sum(s.get("n_postings", 0) for s in r["segments"]),
                     "segments": len(r["segments"]),
                     "files": len(r.get("files", []))}
                    for rid, r in runs.items()
                ],
            }))
        elif args.cmd == "analyze":
            from .functions.analysis import get_analyzer

            name = args.analyzer
            if args.index:
                from .state.manifest import Manifest

                name = Manifest.load(args.index).config.analyzer
            az = get_analyzer(name)
            for t in args.text:
                print(json.dumps({"text": t, "analyzer": name,
                                  "tokens": az.analyze_query(t)}))
        elif args.cmd == "snapshot":
            from .index.snapshot import snapshot_index

            print(json.dumps(snapshot_index(args.index_dir, args.repo_dir, args.name)))
        elif args.cmd == "restore":
            from .index.snapshot import restore_index

            print(json.dumps(restore_index(args.repo_dir, args.name, args.target_dir)))
        elif args.cmd == "snapshots":
            from .index.snapshot import delete_snapshot, list_snapshots

            if args.delete:
                print(json.dumps(delete_snapshot(args.repo_dir, args.delete)))
            else:
                print(json.dumps(list_snapshots(args.repo_dir)))
        elif args.cmd == "reindex":
            from .index.reindex import reindex

            overrides = {}
            if args.analyzer:
                overrides["analyzer"] = args.analyzer
            if args.num_segments:
                overrides["num_segments"] = args.num_segments
            if args.positions:
                overrides["positions"] = True
            res = reindex(args.src_index_dir, args.dst_index_dir, **overrides)
            print(json.dumps({"run_id": res.run_id, "n_docs": res.n_docs,
                              "n_postings": res.n_postings,
                              "duration_s": round(res.duration_s, 3)}))
        elif args.cmd == "pipeline":
            import importlib

            from .pipelines.spec import PipelineSpec, run_pipeline

            registry = {}
            if args.registry:
                mod, attr = args.registry.split(":")
                registry = getattr(importlib.import_module(mod), attr)
            if args.spec_json.endswith((".conf", ".hocon")):
                from .pipelines.hocon import load_config_file

                spec = PipelineSpec.from_dict(load_config_file(args.spec_json), registry)
            else:
                with open(args.spec_json) as f:
                    spec = PipelineSpec.from_dict(json.load(f), registry)
            print(json.dumps(run_pipeline(spec)))
        elif args.cmd == "nested-build":
            import ray.data as rd

            from .index.nested import build_nested_index
            from .state.manifest import IndexConfig

            res = build_nested_index(
                rd.read_parquet(args.corpus),
                args.index_dir,
                parent_id_col=args.parent_id_col,
                nested_col=args.nested_col,
                sub_fields=args.sub_fields.split(","),
                config=IndexConfig(analyzer=args.analyzer, num_segments=args.num_segments),
            )
            print(json.dumps({f: {"n_docs": r.n_docs, "n_postings": r.n_postings}
                              for f, r in res.items()}))
        elif args.cmd == "mf-query":
            from .index.multifield import MultiFieldEngine

            eng = MultiFieldEngine(args.index_dir)
            try:
                for t in args.text:
                    if args.query_string:
                        hits = eng.query_string(t, k=args.k)
                    elif args.combined_fields:
                        hits = eng.combined_fields_search(t, k=args.k, mode=args.mode)
                    else:
                        hits = eng.search(t, k=args.k, mode=args.mode)
                    print(json.dumps({
                        "query": t,
                        "hits": [{"doc_id": d, "score": s} for d, s in hits],
                    }))
            finally:
                eng.close()
        elif args.cmd == "nested-query":
            from .index.nested import NestedEngine

            pairs = []
            for c in args.clauses:
                if "=" not in c:
                    raise SystemExit(f"clause must be field=text, got {c!r}")
                f, text = c.split("=", 1)
                pairs.append((f, text))
            eng = NestedEngine(args.index_dir)
            try:
                hits = eng.nested_search(
                    pairs, k=args.k, mode=args.mode, score_mode=args.score_mode
                )
            finally:
                eng.close()
            print(json.dumps([{"parent_id": p, "score": round(s, 6)} for p, s in hits]))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
