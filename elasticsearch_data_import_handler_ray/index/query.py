"""BM25 top-k query engine (SURVEY.md §2.B7/B8/§3.3).

NOT a Dataset pipeline: a pool of ``QueryShard`` actors, one per doc-shard
(= per ``seg_id``), each holding its segments' term dictionaries in memory and
postings memory-mapped — the "stateful stages are actor pools" requirement
(BASELINE.json:15). A query runs in two scatter/gather rounds:

  1. scatter the analyzed terms → each shard returns local df per term;
     the driver sums to GLOBAL df and computes idf with global N/avgdl
     (so scores are identical regardless of sharding / parallelism level);
  2. scatter (terms, idfs, k, mode) → each shard returns its local top-k
     (score, doc_id); the driver merges by (score desc, doc_id asc).

Two scorers, both rank-identical to the oracle (tests assert equality):

* ``exhaustive``: decode full postings, vectorized numpy accumulation, term
  contributions added in ascending-term order (bit-exact with the oracle).
* ``bmw``: document-at-a-time block-max WAND (Broder et al. 2003; Ding & Suel
  SIGIR'11): term-level upper bounds pick the pivot, block-level
  (max_tf, min_dl) bounds skip blocks, full evaluation only when a doc could
  beat the running threshold θ. Candidate evaluation also accumulates in
  ascending-term order, so surviving scores are bit-identical to exhaustive.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions import bm25
from ..functions.analysis import get_analyzer
from ..functions.codec import PostingBlocks, decode_posting
from ..state.manifest import Manifest

# ---------------------------------------------------------------------------
# ES function_score kernels (shared by shard scoring and driver-side tests)
# ---------------------------------------------------------------------------

FVF_MODIFIERS = (
    "none", "log", "log1p", "log2p", "ln", "ln1p", "ln2p",
    "square", "sqrt", "reciprocal",
)

DECAY_FNS = ("gauss", "exp", "linear")


def fvf_apply(vals: np.ndarray, modifier: str, factor: float = 1.0) -> np.ndarray:
    """ES field_value_factor: ``modifier(factor · doc_value)``.

    The log-family is base-10 exactly as Lucene's FieldValueFactorFunction
    (``log1p`` is log10(1+x), NOT numpy's natural log1p; the natural logs
    are the ``ln*`` modifiers)."""
    v = np.asarray(vals, dtype=np.float64) * factor
    with np.errstate(divide="ignore", invalid="ignore"):
        if modifier == "none":
            return v
        if modifier == "log":
            return np.log10(v)
        if modifier == "log1p":
            return np.log10(v + 1.0)
        if modifier == "log2p":
            return np.log10(v + 2.0)
        if modifier == "ln":
            return np.log(v)
        if modifier == "ln1p":
            return np.log1p(v)
        if modifier == "ln2p":
            return np.log(v + 2.0)
        if modifier == "square":
            return v * v
        if modifier == "sqrt":
            return np.sqrt(v)
        if modifier == "reciprocal":
            return 1.0 / v
    raise ValueError(f"modifier must be one of {FVF_MODIFIERS}")


def decay_apply(
    vals: np.ndarray, fn: str, origin: float, scale: float,
    offset: float = 0.0, decay: float = 0.5,
) -> np.ndarray:
    """ES decay functions (Lucene semantics): distance = max(0,
    |value − origin| − offset); a value at distance ``scale`` scores exactly
    ``decay``; inside ``offset`` of the origin the multiplier is 1."""
    import math

    if scale <= 0:
        raise ValueError("decay scale must be > 0")
    if not (0.0 < decay < 1.0):
        raise ValueError("decay must be in (0, 1)")
    if fn not in DECAY_FNS:
        raise ValueError(f"decay fn must be one of {DECAY_FNS}")
    d = np.maximum(
        np.abs(np.asarray(vals, dtype=np.float64) - float(origin)) - float(offset),
        0.0,
    )
    if fn == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        return np.exp(-(d * d) / (2.0 * sigma2))
    if fn == "exp":
        return np.exp(math.log(decay) / scale * d)
    # linear
    s = scale / (1.0 - decay)
    return np.maximum((s - d) / s, 0.0)
from .segment import SegmentReader

def distance_feature_apply(vals: np.ndarray, origin: float, pivot: float) -> np.ndarray:
    """ES distance_feature kernel: ``pivot / (pivot + |value − origin|)`` —
    1.0 at the origin, exactly 0.5 at distance ``pivot``, decaying toward 0.
    (The geo variant uses haversine distance; the numeric/date shape here.)"""
    if pivot <= 0:
        raise ValueError("distance_feature pivot must be > 0")
    d = np.abs(np.asarray(vals, dtype=np.float64) - float(origin))
    return pivot / (pivot + d)


def significance_score(
    fg: int, fg_total: int, bg: int, bg_total: int, heuristic: str = "jlh"
) -> float:
    """Shared significance heuristics (significant_terms / significant_text).

    * ``jlh`` (ES default): (fg% − bg%) · fg%/bg%.
    * ``chi_square``: the standard 2×2 chi-square with ES's
      background_is_superset handling — the background counts are made
      DISJOINT from the foreground first (bg −= fg, bgN −= fgN), then
      score = N·(N11·N00 − N01·N10)² / ((N11+N01)(N11+N10)(N01+N00)(N10+N00))
      over N11=fg, N01=bg', N10=fgN−fg, N00=bgN'−bg'.
    """
    if heuristic == "jlh":
        fgp = fg / fg_total
        bgp = bg / bg_total
        return float((fgp - bgp) * fgp / bgp)
    if heuristic == "chi_square":
        b2 = bg - fg  # background_is_superset: make the sets disjoint
        bn2 = bg_total - fg_total
        n11, n01 = float(fg), float(b2)
        n10, n00 = float(fg_total - fg), float(bn2 - b2)
        n = n11 + n01 + n10 + n00
        denom = (n11 + n01) * (n11 + n10) * (n01 + n00) * (n10 + n00)
        if denom == 0.0:
            return 0.0
        return float(n * (n11 * n00 - n01 * n10) ** 2 / denom)
    raise ValueError(f"heuristic must be 'jlh' or 'chi_square', got {heuristic!r}")


RANK_FEATURE_FNS = ("saturation", "log", "sigmoid")


def rank_feature_apply(
    vals: np.ndarray, fn: str, *, pivot: float = 1.0,
    scaling_factor: float = 1.0, exponent: float = 1.0,
) -> np.ndarray:
    """ES rank_feature kernels over a non-negative feature doc-value:
    saturation v/(v+pivot), log ln(scaling_factor·v + 1), sigmoid
    v^exp/(v^exp + pivot^exp) — Lucene's FeatureField functions."""
    v = np.asarray(vals, dtype=np.float64)
    if fn == "saturation":
        if pivot <= 0:
            raise ValueError("saturation pivot must be > 0")
        return v / (v + pivot)
    if fn == "log":
        return np.log(scaling_factor * v + 1.0)
    if fn == "sigmoid":
        if pivot <= 0 or exponent <= 0:
            raise ValueError("sigmoid pivot and exponent must be > 0")
        ve = np.power(v, exponent)
        return ve / (ve + pivot ** exponent)
    raise ValueError(f"rank_feature fn must be one of {RANK_FEATURE_FNS}")


def _heap_push(heap: list, k: int, score: float, doc_id: int) -> None:
    """Min-heap of (score, -doc_id): worst = lowest score, then largest doc_id.
    DAAT visits ascending doc_id, so equal-score later docs are correctly
    rejected by the strict > comparison."""
    item = (score, -doc_id)
    if len(heap) < k:
        heapq.heappush(heap, item)
    elif item > heap[0]:
        heapq.heapreplace(heap, item)


def _theta(heap: list, k: int) -> float:
    return heap[0][0] if len(heap) == k else -1.0


def _score_exhaustive(
    readers: list[SegmentReader],
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    mode: str,
    heap: list,
    get_blocks=None,
    k1: float = bm25.K1,
    b: float = bm25.B,
    get_decoded=None,
    reader_offset: int = 0,
    exclude_terms: list[str] | None = None,
    get_dead=None,
    allowed: np.ndarray | None = None,
    after: tuple[float, int] | None = None,
    min_should_match: int | None = None,
    must_terms: list[str] | None = None,
) -> None:
    """Vectorized full scoring of one shard (docs disjoint across readers):
    bulk posting decode, per-reader vectorized top-k (only k candidates reach
    the Python heap). ``get_decoded`` (the actor's LRU of decoded postings)
    makes repeated hot terms skip the varbyte decode entirely.
    ``exclude_terms`` = ES bool must_not: matching docs are dropped before
    the heap (exclusion routes through this scorer; skipping can't prune
    against a NOT set). ``must_terms`` (mode "bool") splits ``terms`` into
    required and optional clauses: a doc needs EVERY must term and ≥
    ``min_should_match`` of the others, scoring the sum of its matching
    clauses (the composed ES bool query)."""
    for ri, rd in enumerate(readers, reader_offset):
        per_term = []
        for t in terms:  # terms pre-sorted ascending
            if get_decoded is not None:
                arrs = get_decoded(ri, t)
                if arrs is not None:
                    per_term.append((t, *arrs))
            elif get_blocks is not None:
                pb = get_blocks(ri, t)
                if pb is not None:
                    per_term.append((t, *pb.decode_all()))
            else:
                blob = rd.posting_blob(t)
                if blob is not None:
                    per_term.append((t, *decode_posting(blob)))
        if not per_term:
            continue
        union = np.unique(np.concatenate([ids for _, ids, _, _ in per_term]))
        scores = np.zeros(len(union), dtype=np.float64)
        hits = np.zeros(len(union), dtype=np.int32)
        must_set = set(must_terms) if must_terms is not None else None
        hits_must = np.zeros(len(union), dtype=np.int32) if must_set else None
        for t, ids, tfs, dls in per_term:  # ascending-term accumulation order
            pos = np.searchsorted(union, ids)
            scores[pos] += bm25.contribution(idfs[t], tfs, dls, avgdl, k1, b)
            if must_set is not None and t in must_set:
                hits_must[pos] += 1
            else:
                hits[pos] += 1
        dd = get_dead(ri) if get_dead is not None else None
        if dd is not None:
            from .tombstones import in_sorted

            alive = ~in_sorted(union, dd)  # superseded doc versions (upsert)
            union, scores, hits = union[alive], scores[alive], hits[alive]
            if hits_must is not None:
                hits_must = hits_must[alive]
        if allowed is not None:
            from .tombstones import in_sorted

            # ES filter context: yes/no restriction, scores untouched
            keep = in_sorted(union, allowed)
            union, scores, hits = union[keep], scores[keep], hits[keep]
            if hits_must is not None:
                hits_must = hits_must[keep]
        if after is not None:
            # search_after cursor: strictly after (score desc, doc_id asc)
            cs, cd = after
            keep = (scores < cs) | ((scores == cs) & (union > np.uint64(cd)))
            union, scores, hits = union[keep], scores[keep], hits[keep]
            if hits_must is not None:
                hits_must = hits_must[keep]
        if hits_must is not None:
            # composed bool: every must clause + >= msm should clauses
            m = hits_must == len(must_set)
            if min_should_match:
                m &= hits >= min_should_match
            union, scores = union[m], scores[m]
        elif mode == "and":
            m = hits == len(terms)
            union, scores = union[m], scores[m]
        elif min_should_match and min_should_match > 1:
            # ES minimum_should_match: keep docs matching >= m should terms
            m = hits >= min_should_match
            union, scores = union[m], scores[m]
        if exclude_terms:
            # ES bool must_not: drop docs containing ANY excluded term —
            # membership masks only, excluded postings never score
            drop = np.zeros(len(union), dtype=bool)
            for t in exclude_terms:
                if get_decoded is not None:
                    arrs = get_decoded(ri, t)
                elif get_blocks is not None:
                    pb = get_blocks(ri, t)
                    arrs = pb.decode_all() if pb is not None else None
                else:
                    blob = rd.posting_blob(t)
                    arrs = decode_posting(blob) if blob is not None else None
                if arrs is None:
                    continue
                drop |= np.isin(union, arrs[0], assume_unique=True)
            union, scores = union[~drop], scores[~drop]
        for i in bm25.topk_indices(scores, union, k):
            _heap_push(heap, k, float(scores[i]), int(union[i]))


def _score_synonyms(
    readers: list[SegmentReader],
    groups: list[list[str]],
    group_idfs: list[float],
    avgdl: float,
    k: int,
    mode: str,
    heap: list,
    get_blocks=None,
    k1: float = bm25.K1,
    b: float = bm25.B,
    get_decoded=None,
    reader_offset: int = 0,
    get_dead=None,
    allowed: np.ndarray | None = None,
    after: tuple[float, int] | None = None,
) -> None:
    """Lucene SynonymQuery scoring: each synonym GROUP behaves as one pseudo-
    term — member posting lists merge (doc union, tf SUMMED before the
    nonlinear tf-norm) and score once with the group's blended idf (driver
    passes idf(N, max member df), the Lucene df blend). Accumulation is in
    ascending group order (groups arrive pre-sorted) so scores are
    reproducible bit-for-bit; a single-member group is numerically identical
    to plain term scoring."""

    def fetch(ri, rd, t):
        if get_decoded is not None:
            return get_decoded(ri, t)
        if get_blocks is not None:
            pb = get_blocks(ri, t)
            return pb.decode_all() if pb is not None else None
        blob = rd.posting_blob(t)
        return decode_posting(blob) if blob is not None else None

    for ri, rd in enumerate(readers, reader_offset):
        per_group = []
        for gi, g in enumerate(groups):
            parts = [a for a in (fetch(ri, rd, t) for t in g) if a is not None]
            if not parts:
                continue
            if len(parts) == 1:
                ids, tfs, dls = parts[0]
            else:
                ids = np.concatenate([p[0] for p in parts])
                tfs = np.concatenate([p[1] for p in parts])
                dls = np.concatenate([p[2] for p in parts])
                order = np.argsort(ids, kind="stable")
                ids, tfs, dls = ids[order], tfs[order], dls[order]
                uniq, start = np.unique(ids, return_index=True)
                tfs = np.add.reduceat(tfs, start)
                ids, dls = uniq, dls[start]
            per_group.append((gi, ids, tfs, dls))
        if not per_group:
            continue
        union = np.unique(np.concatenate([ids for _, ids, _, _ in per_group]))
        scores = np.zeros(len(union), dtype=np.float64)
        hits = np.zeros(len(union), dtype=np.int32)
        for gi, ids, tfs, dls in per_group:
            pos = np.searchsorted(union, ids)
            scores[pos] += bm25.contribution(group_idfs[gi], tfs, dls, avgdl, k1, b)
            hits[pos] += 1
        dd = get_dead(ri) if get_dead is not None else None
        if dd is not None:
            from .tombstones import in_sorted

            alive = ~in_sorted(union, dd)
            union, scores, hits = union[alive], scores[alive], hits[alive]
        if allowed is not None:
            from .tombstones import in_sorted

            keep = in_sorted(union, allowed)
            union, scores, hits = union[keep], scores[keep], hits[keep]
        if after is not None:
            cs, cd = after
            keep = (scores < cs) | ((scores == cs) & (union > np.uint64(cd)))
            union, scores, hits = union[keep], scores[keep], hits[keep]
        if mode == "and":
            m = hits == len(groups)
            union, scores = union[m], scores[m]
        for i in bm25.topk_indices(scores, union, k):
            _heap_push(heap, k, float(scores[i]), int(union[i]))


def _sloppy_match(phrase: list[str], slot_pos: list[np.ndarray], slop: int) -> bool:
    """ES match_phrase slop semantics: the doc matches iff there is an
    INJECTIVE assignment of token occurrences to phrase slots whose adjusted
    positions (p_i - i) span at most ``slop`` (exact adjacency = span 0;
    transposed adjacent terms = span 2, matching the documented ES rule).

    Enumerate candidate window starts (every adjusted value is a possible
    minimum); per window, greedy earliest-deadline assignment per term —
    optimal here because slots of one term have nested, ordered intervals
    [w+i, w+slop+i]. Runs per CANDIDATE doc only (already AND-intersected),
    so the Python loop is over a handful of positions, not the corpus."""
    adj = [sp - i for i, sp in enumerate(slot_pos)]
    starts = np.unique(np.concatenate(adj))
    term_slots: dict[str, list[int]] = {}
    for i, t in enumerate(phrase):
        term_slots.setdefault(t, []).append(i)
    for w in starts.tolist():
        hi = w + slop
        ok = True
        for slots in term_slots.values():
            avail = slot_pos[slots[0]]  # same occurrence list for every slot of t
            j = 0
            for i in slots:  # increasing i → ordered intervals → greedy optimal
                j = max(j, int(np.searchsorted(avail, w + i)))
                if j >= len(avail) or avail[j] > hi + i:
                    ok = False
                    break
                j += 1
            if not ok:
                break
        if ok:
            return True
    return False


def _sloppy_candidates_vectorized(
    phrase: list[str],
    posmap: dict[str, tuple[np.ndarray, np.ndarray]],
    n_cand: int,
    slop: int,
) -> np.ndarray:
    """Candidate indices with a window [w, w+slop] in adjusted-position space
    covering every phrase slot — vectorized across ALL candidates at once via
    (candidate_rank << 32 | adjusted_pos) composite keys, no per-candidate
    Python (the slop analogue of the exact path's adjacency trick).

    Completeness: a satisfying assignment's minimum adjusted value is one of
    the slots' values, so testing every slot value as the window start covers
    every match. For all-distinct phrase tokens this is EXACT; with repeated
    tokens it ignores occurrence injectivity and the caller must confirm
    survivors with _sloppy_match (a necessary-condition prefilter).

    Adjusted positions are shifted by +len(phrase) so they stay positive;
    positions are < 2^32 - len(phrase) - slop by the uint32 codec, so a
    window's composite bound never crosses into the next candidate's range."""
    n = len(phrase)
    keys: list[np.ndarray] = []
    for i, t in enumerate(phrase):
        flat, offs = posmap[t]
        counts = np.diff(offs)
        ci = np.repeat(np.arange(n_cand, dtype=np.uint64), counts)
        q = (flat - i + n).astype(np.uint64)
        keys.append(np.sort((ci << np.uint64(32)) | q))
    anchors = np.unique(np.concatenate(keys))
    match = np.ones(len(anchors), dtype=bool)
    hi = anchors + np.uint64(slop)
    for ki in keys:
        if len(ki) == 0:
            return np.empty(0, dtype=np.int64)
        lo = np.searchsorted(ki, anchors)
        ok = lo < len(ki)
        match &= ok & (ki[np.minimum(lo, len(ki) - 1)] <= hi)
    return np.unique((anchors[match] >> np.uint64(32)).astype(np.int64))


def _score_phrase(
    readers: list[SegmentReader],
    phrase: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    heap: list,
    get_blocks=None,
    k1: float = bm25.K1,
    b: float = bm25.B,
    get_decoded=None,
    reader_offset: int = 0,
    get_dead=None,
    allowed: np.ndarray | None = None,
    after: tuple[float, int] | None = None,
    slop: int = 0,
) -> None:
    """Exact phrase top-k (§2.B8 positional variant): AND-intersect the
    phrase terms' doc lists, decode positions for CANDIDATE docs only (the
    sidecar's selective gather), verify adjacency (token i of the phrase at
    position p+i), score survivors with BM25 over the phrase's unique terms in
    ascending-term order (the repo-wide bit-exactness rule).

    ``slop > 0`` switches the adjacency verify to ES match_phrase proximity
    (see _sloppy_match); candidate discovery, position gather and scoring are
    unchanged, and the slop=0 path is byte-identical to before."""
    uniq = sorted(set(phrase))
    for ri, rd in enumerate(readers, reader_offset):
        data = {}
        for t in uniq:
            if get_decoded is not None:
                arrs = get_decoded(ri, t)
            elif get_blocks is not None:
                pb = get_blocks(ri, t)
                arrs = pb.decode_all() if pb is not None else None
            else:
                blob = rd.posting_blob(t)
                arrs = decode_posting(blob) if blob is not None else None
            if arrs is None:
                data = None
                break
            data[t] = arrs
        if data is None:
            continue
        cand = data[uniq[0]][0]
        for t in uniq[1:]:
            cand = np.intersect1d(cand, data[t][0], assume_unique=True)
            if cand.size == 0:
                break
        dd = get_dead(ri) if get_dead is not None else None
        if dd is not None and cand.size:
            from .tombstones import in_sorted

            cand = cand[~in_sorted(cand, dd)]  # superseded versions (upsert)
        if allowed is not None and cand.size:
            from .tombstones import in_sorted

            cand = cand[in_sorted(cand, allowed)]  # ES filter context
        if cand.size == 0:
            continue
        # composite keys (candidate_rank << 32 | position) make adjacency a
        # SINGLE sorted-membership pass over all candidates per phrase token —
        # no per-candidate Python loop (positions < 2^32 by the uint32 codec)
        keymap: dict[str, np.ndarray] = {}
        posmap: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        scores = np.zeros(len(cand), dtype=np.float64)
        for t in uniq:
            ids, tfs, dls = data[t]
            sel = np.searchsorted(ids, cand)
            flat, counts = rd.term_positions(t, tfs, sel)
            if slop > 0:
                offs = np.concatenate(([0], np.cumsum(counts)))
                posmap[t] = (flat.astype(np.int64), offs)
            else:
                ci = np.repeat(np.arange(len(cand), dtype=np.uint64), counts)
                keymap[t] = (ci << np.uint64(32)) | flat.astype(np.uint64)
            scores += bm25.contribution(idfs[t], tfs[sel], dls[sel], avgdl, k1, b)
        if slop > 0:
            vec = _sloppy_candidates_vectorized(phrase, posmap, len(cand), slop)
            if len(set(phrase)) == len(phrase):
                survivor_idx = vec  # distinct tokens: the window check IS exact
            else:
                # repeated phrase terms: the vectorized pass is a necessary-
                # condition prefilter; confirm injectivity per survivor only
                survivors = []
                for ci in vec.tolist():
                    slot_pos = []
                    for i, t in enumerate(phrase):
                        flat, offs = posmap[t]
                        slot_pos.append(flat[offs[ci] : offs[ci + 1]])
                    if _sloppy_match(phrase, slot_pos, slop):
                        survivors.append(ci)
                survivor_idx = np.array(survivors, dtype=np.int64)
        else:
            ok = keymap[phrase[0]]
            for off in range(1, len(phrase)):
                if ok.size == 0:
                    break
                tgt = keymap[phrase[off]]  # sorted: ci asc, positions asc within
                shifted = ok + np.uint64(off)
                j = np.searchsorted(tgt, shifted)
                j_c = np.minimum(j, max(len(tgt) - 1, 0))
                ok = ok[(tgt[j_c] == shifted)] if len(tgt) else ok[:0]
            survivor_idx = (
                np.unique(ok >> np.uint64(32)).astype(np.int64) if ok.size else np.empty(0, np.int64)
            )
        for ci in survivor_idx:
            s, d = float(scores[ci]), int(cand[ci])
            if after is not None and (s, -d) >= (after[0], -int(after[1])):
                continue  # search_after cursor
            _heap_push(heap, k, s, d)


def _span_ordered_ok(pos_lists: list[np.ndarray], slop: int) -> bool:
    """Lucene NearSpansOrdered over single-term spans: does a strictly
    increasing chain p_0 < p_1 < … < p_{n-1} (one position per clause)
    exist with window width (p_last - p_0 + 1) - n <= slop? Greedy chain:
    for each start the earliest completion minimizes the width, and once a
    chain cannot complete no later start can either (lists are sorted)."""
    n = len(pos_lists)
    first = pos_lists[0]
    for p0 in first.tolist():
        prev = int(p0)
        ok = True
        for i in range(1, n):
            li = pos_lists[i]
            j = int(np.searchsorted(li, prev + 1))
            if j == len(li):
                ok = False
                break
            prev = int(li[j])
        if not ok:
            return False  # exhausted a later list: larger starts fail too
        if (prev - int(p0) + 1) - n <= slop:
            return True
    return False


def _span_unordered_ok(pos_lists: list[np.ndarray], slop: int) -> bool:
    """Lucene NearSpansUnordered over single-term spans with DISTINCT clause
    terms: the classic smallest-range-over-k-sorted-lists sweep — advance
    the minimum pointer until the window (max - min + 1) - n fits in slop
    or some list runs dry."""
    import heapq

    n = len(pos_lists)
    iters = [0] * n
    heap = [(int(pl[0]), i) for i, pl in enumerate(pos_lists)]
    heapq.heapify(heap)
    cur_max = max(v for v, _ in heap)
    while True:
        mn, i = heap[0]
        if (cur_max - mn + 1) - n <= slop:
            return True
        iters[i] += 1
        if iters[i] == len(pos_lists[i]):
            return False
        v = int(pos_lists[i][iters[i]])
        heapq.heapreplace(heap, (v, i))
        if v > cur_max:
            cur_max = v


def _score_spans(
    readers: list[SegmentReader],
    span: dict,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    heap: list,
    k1: float = bm25.K1,
    b: float = bm25.B,
    get_decoded=None,
    reader_offset: int = 0,
    get_dead=None,
    allowed: np.ndarray | None = None,
    after: tuple[float, int] | None = None,
) -> None:
    """ES span queries over the positional index (span_first / span_near).

    ``span``: {"kind": "first"|"near", "clauses": [term, ...],
    "end": int (first), "slop": int, "in_order": bool (near)}.
    Matching follows Lucene's span semantics for single-term clause spans
    (see _span_ordered_ok / _span_unordered_ok; span_first: the term's span
    must END by ``end``, i.e. 0-based position < end). Scoring — documented
    simplification vs Lucene's sloppyFreq — is plain BM25 over the unique
    clause terms in ascending-term order, the repo-wide rule, which keeps
    ranks oracle-checkable bit-for-bit (the naive oracle and the FULL SQL
    entry replay the same definition)."""
    clauses: list[str] = span["clauses"]
    uniq = sorted(set(clauses))
    kind = span["kind"]
    for ri, rd in enumerate(readers, reader_offset):
        data = {}
        for t in uniq:
            arrs = get_decoded(ri, t) if get_decoded is not None else None
            if arrs is None:
                blob = rd.posting_blob(t)
                arrs = decode_posting(blob) if blob is not None else None
            if arrs is None:
                data = None
                break
            data[t] = arrs
        if data is None:
            continue
        cand = data[uniq[0]][0]
        for t in uniq[1:]:
            cand = np.intersect1d(cand, data[t][0], assume_unique=True)
            if cand.size == 0:
                break
        dd = get_dead(ri) if get_dead is not None else None
        if dd is not None and cand.size:
            from .tombstones import in_sorted

            cand = cand[~in_sorted(cand, dd)]
        if allowed is not None and cand.size:
            from .tombstones import in_sorted

            cand = cand[in_sorted(cand, allowed)]
        if cand.size == 0:
            continue
        posmap: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        scores = np.zeros(len(cand), dtype=np.float64)
        for t in uniq:
            ids, tfs, dls = data[t]
            sel = np.searchsorted(ids, cand)
            flat, counts = rd.term_positions(t, tfs, sel)
            offs = np.concatenate(([0], np.cumsum(counts)))
            posmap[t] = (flat.astype(np.int64), offs)
            scores += bm25.contribution(idfs[t], tfs[sel], dls[sel], avgdl, k1, b)
        if kind == "first":
            t = clauses[0]
            flat, offs = posmap[t]
            end = int(span["end"])
            # any occurrence with 0-based position < end (span end <= end)
            hit = np.flatnonzero(flat < end)
            survivor_idx = np.unique(np.searchsorted(offs, hit, side="right") - 1)
        else:
            slop = int(span["slop"])
            in_order = bool(span["in_order"])
            survivors = []
            for ci in range(len(cand)):
                pls = []
                for t in clauses:
                    flat, offs = posmap[t]
                    pls.append(flat[offs[ci] : offs[ci + 1]])
                ok = (
                    _span_ordered_ok(pls, slop)
                    if in_order
                    else _span_unordered_ok(pls, slop)
                )
                if ok:
                    survivors.append(ci)
            survivor_idx = np.array(survivors, dtype=np.int64)
        for ci in survivor_idx:
            s, d = float(scores[ci]), int(cand[ci])
            if after is not None and (s, -d) >= (after[0], -int(after[1])):
                continue
            _heap_push(heap, k, s, d)


def _score_bmw(
    readers: list[SegmentReader],
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    heap: list,
    get_blocks=None,
    k1: float = bm25.K1,
    b: float = bm25.B,
    reader_offset: int = 0,
    get_dead=None,
    allowed: np.ndarray | None = None,
    after: tuple[float, int] | None = None,
    get_decoded=None,
    heap_lock=None,
) -> None:
    """Vectorized block-max pruning over each segment, θ shared across
    segments via `heap` (and across THREADS via ``heap_lock`` — BMW's
    pruning lives on a global θ, so the per-reader thread pool writes one
    shared heap under a lock instead of the per-thread heaps the other
    scorers use; a stale-low θ only weakens pruning, never correctness, but
    reads still take the lock so a mid-sift heap root can't leak a
    transiently-high θ).

    Doc-id space is partitioned into INTERVALS at the union of every query
    term's posting-block boundaries, so inside one interval each term is
    covered by exactly one block and the interval's score upper bound is the
    sum of those blocks' precomputed maxima (bm25.block_upper_bound).
    Intervals are visited in DESCENDING-UB order: the best candidates are
    scored first, θ rises immediately, and the loop stops at the first
    interval whose UB ≤ θ (the order is sorted, so everything after it is
    prunable too). Each surviving interval is scored exactly like
    _score_exhaustive — candidate union, ascending-term vectorized
    accumulation — so scores are bit-identical to the exhaustive scorer and
    the exact oracle; only whole blocks that can contain a top-k doc are
    ever varbyte-decoded.

    Exactness of the ≤-skip under out-of-order visiting: block_upper_bound
    carries a (1+1e-12) margin, so any achievable doc score is STRICTLY
    below its interval UB — an interval with UB ≤ θ cannot even tie the
    current k-th doc, regardless of doc-id tie-breaks. This replaces round
    2's doc-at-a-time Python WAND loop (measured 6.6× slower than the
    vectorized exhaustive scorer at sf0.1 and degenerate at high df/N)."""
    for ri, rd in enumerate(readers, reader_offset):
        dd = get_dead(ri) if get_dead is not None else None
        pbs: list[tuple[str, PostingBlocks, np.ndarray]] = []
        for t in terms:  # terms pre-sorted ascending — accumulation order
            if get_blocks is not None:
                pb = get_blocks(ri, t)
            else:
                blob = rd.posting_blob(t)
                pb = PostingBlocks(blob) if blob is not None else None
            if pb is not None and pb.n > 0:
                ubb = bm25.block_upper_bound(
                    idfs[t], pb.max_tfs, pb.min_dls, avgdl, k1, b
                )
                pbs.append((t, pb, ubb))
        if not pbs:
            continue
        bounds = np.unique(np.concatenate([pb.first_docs for _, pb, _ in pbs]))
        n_int = len(bounds)
        # per term: covering block index per interval (-1 = before 1st block;
        # past the last block the last block's UB is used — looser, sound)
        covers: list[np.ndarray] = []
        ub = np.zeros(n_int, dtype=np.float64)
        for _, pb, ubb in pbs:
            c = np.searchsorted(pb.first_docs, bounds, side="right") - 1
            covers.append(c)
            np.add(ub, np.where(c >= 0, ubb[np.clip(c, 0, pb.n - 1)], 0.0), out=ub)
        order = np.argsort(-ub, kind="stable")
        rem = order[ub[order] > 0.0]  # zero-UB intervals hold no docs at all
        decoded: dict[tuple[int, int], tuple] = {}
        full_dec: dict[int, tuple] = {}  # term idx → whole-list decode
        umax = np.uint64(0xFFFFFFFFFFFFFFFF)
        batch_n = 4  # grows ×4 per round: per-round Python cost amortizes
        while len(rem):
            if heap_lock is not None:
                with heap_lock:
                    theta = _theta(heap, k)
            else:
                theta = _theta(heap, k)
            if theta >= 0.0:
                # rem is UB-descending: one binary search finds the prune cut
                cut = int(np.searchsorted(-ub[rem], -theta, side="left"))
                rem = rem[:cut]
                if not len(rem):
                    break
            batch, rem = rem[:batch_n], rem[batch_n:]
            batch_n = min(batch_n * 4, 4096)
            # flat sorted [lo0,hi0,lo1,hi1,...] — membership = odd searchsorted
            lows = bounds[batch]
            highs = np.where(
                batch + 1 < n_int, bounds[np.minimum(batch + 1, n_int - 1)], umax
            ).astype(np.uint64)
            s = np.argsort(lows)
            flat = np.empty(2 * len(batch), dtype=np.uint64)
            flat[0::2], flat[1::2] = lows[s], highs[s]
            per_term = []
            for t_idx, (t, pb, _) in enumerate(pbs):
                full = full_dec.get(t_idx)
                if full is None:
                    cvs = covers[t_idx][batch]
                    blks = np.unique(cvs[cvs >= 0])
                    if not len(blks):
                        continue
                    if len(blks) > max(4, pb.n // 4):
                        # a big slice of this term's list is live this round:
                        # one bulk decode (shared with the exhaustive scorer's
                        # LRU when available) beats per-block varbyte calls
                        full = get_decoded(ri, t) if get_decoded is not None else None
                        if full is None:
                            full = pb.decode_all()
                        full_dec[t_idx] = full
                if full is not None:
                    ids, tfs_a, dls_a = full
                else:
                    missing = np.array(
                        [c for c in blks.tolist() if (t_idx, c) not in decoded],
                        dtype=np.int64,
                    )
                    if len(missing):
                        # one vectorized pass for every block this round needs
                        m_ids, m_tfs, m_dls = pb.decode_many(missing)
                        bounds_m = np.concatenate(
                            [[0], np.cumsum(pb.counts[missing])]
                        )
                        for bi, c in enumerate(missing.tolist()):
                            s, e = bounds_m[bi], bounds_m[bi + 1]
                            decoded[(t_idx, c)] = (m_ids[s:e], m_tfs[s:e], m_dls[s:e])
                    parts = [decoded[(t_idx, c)] for c in blks.tolist()]
                    ids = np.concatenate([p[0] for p in parts])
                    tfs_a = np.concatenate([p[1] for p in parts])
                    dls_a = np.concatenate([p[2] for p in parts])
                # gather rows inside the batch's intervals by RANGE — two
                # searchsorteds of the (sorted, disjoint) interval bounds
                # into ids, O(batch·log n + selected); a parity mask over
                # the whole list re-scanned big lists every round
                lo_i = np.searchsorted(ids, flat[0::2], side="left")
                hi_i = np.searchsorted(ids, flat[1::2], side="left")
                lens = hi_i - lo_i
                total = int(lens.sum())
                if total:
                    sel_idx = np.repeat(lo_i, lens) + (
                        np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
                    )
                    per_term.append((t, ids[sel_idx], tfs_a[sel_idx], dls_a[sel_idx]))
            if not per_term:
                continue
            union = np.unique(np.concatenate([x[1] for x in per_term]))
            scores = np.zeros(len(union), dtype=np.float64)
            for t, ids, tfs, dls in per_term:  # ascending-term accumulation
                pos = np.searchsorted(union, ids)
                scores[pos] += bm25.contribution(idfs[t], tfs, dls, avgdl, k1, b)
            if dd is not None:
                from .tombstones import in_sorted

                alive = ~in_sorted(union, dd)  # superseded versions (upsert)
                union, scores = union[alive], scores[alive]
            if allowed is not None:
                from .tombstones import in_sorted

                keep = in_sorted(union, allowed)  # ES filter context
                union, scores = union[keep], scores[keep]
            if after is not None:
                cs, cd = after  # search_after cursor: strictly after only
                keep = (scores < cs) | ((scores == cs) & (union > np.uint64(cd)))
                union, scores = union[keep], scores[keep]
            top = bm25.topk_indices(scores, union, k)
            if heap_lock is not None:
                with heap_lock:
                    for i in top:
                        _heap_push(heap, k, float(scores[i]), int(union[i]))
            else:
                for i in top:
                    _heap_push(heap, k, float(scores[i]), int(union[i]))


def _levenshtein_distances(cands: np.ndarray, q: str) -> np.ndarray:
    """Edit distance of every candidate to ``q`` — one DP over the whole
    candidate array at once (rows = candidates). O(|q| × width) vectorized
    steps, no per-candidate Python."""
    width = cands.dtype.itemsize // 4  # fixed-width unicode: 4 bytes/codepoint
    M = cands.view(np.uint32).reshape(len(cands), width)
    L = np.char.str_len(cands)
    qcp = np.frombuffer(np.array(q, dtype=f"U{max(len(q), 1)}").tobytes(), dtype=np.uint32)[
        : len(q)
    ]
    n = len(cands)
    prev = np.broadcast_to(np.arange(width + 1, dtype=np.int32), (n, width + 1)).copy()
    for i, qc in enumerate(qcp, start=1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (M != qc)
        for j in range(1, width + 1):
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], sub[:, j - 1], out=cur[:, j])
        prev = cur
    return prev[np.arange(n), L]


def _levenshtein_filter(cands: np.ndarray, q: str, max_edits: int) -> np.ndarray:
    """Candidates within edit distance ``max_edits`` of ``q``."""
    if len(cands) == 0:
        return cands
    return cands[_levenshtein_distances(cands, q) <= max_edits]


class QueryShard:
    """One actor per doc-shard: loads every run's segment for its seg_id.

    Actor-resident caches (tail-latency levers, §3.3):
      * PostingBlocks per (reader, term) — repeated terms skip header parsing;
      * an LRU of FULLY-DECODED postings (ids, tfs, dls) bounded by posting
        count — hot query terms (Zipfian skew guarantees repeats) skip the
        varbyte decode entirely on every query after the first.
    When one actor serves several segments (more shards than CPUs, or
    unmerged incremental runs), readers are scored in a small thread pool —
    the decode/score kernels are numpy (GIL released on the large ops) and
    per-reader heaps merge losslessly (docs are disjoint across segments)."""

    _CACHE_MAX = 8192
    # default LRU budget in decoded postings: 3 arrays × 8 B ≈ 24 B/posting
    # → ~96 MB; the engine passes a capacity-aware budget (its actor's share
    # of the index) so a Zipfian query working set fits instead of thrashing
    _DECODED_BUDGET = 4_000_000

    def __init__(
        self,
        seg_dirs: list[str],
        decoded_budget: int | None = None,
        dead: list[np.ndarray | None] | None = None,
    ):
        import threading
        from collections import OrderedDict

        if decoded_budget:
            self._DECODED_BUDGET = int(decoded_budget)
        self.readers = [SegmentReader(d) for d in seg_dirs]
        # upsert tombstones (index/tombstones.py): per reader, the SORTED
        # doc_ids whose version in that reader's run is superseded by a later
        # run. Scoring masks them; df is corrected exactly below.
        self.dead: list[np.ndarray | None] = [None] * len(self.readers)
        self._df_corr: dict[int, np.ndarray] = {}
        if dead is not None:
            from ..functions.codec import decode_segment
            from .tombstones import in_sorted

            for ri, dd in enumerate(dead):
                if dd is None or len(dd) == 0:
                    continue
                dd = np.asarray(dd, dtype=np.uint64)
                r = self.readers[ri]
                # exact per-term df correction: one bulk decode of the
                # segment, membership mask, segment-sum by dictionary bounds
                # (the same vectorized shape as merge) — only paid by
                # readers that actually hold superseded versions, and only
                # until the next merge purges them physically
                ids_r, _, _ = decode_segment(r._post, r.dfs)
                mask = in_sorted(ids_r, dd)
                if not mask.any():
                    continue
                self.dead[ri] = dd
                bounds = np.zeros(len(r.dfs) + 1, dtype=np.int64)
                np.cumsum(r.dfs, out=bounds[1:])
                self._df_corr[ri] = np.add.reduceat(mask.astype(np.int64), bounds[:-1])
        self._pb_cache: dict[tuple[int, str], PostingBlocks | None] = {}
        self._dec_cache: "OrderedDict[tuple[int, str], tuple]" = OrderedDict()
        self._dec_size = 0
        self._dec_hits = 0
        self._dec_misses = 0
        self._lock = threading.Lock()
        self._pool = None
        if len(self.readers) > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=min(len(self.readers), 8))

    def _blocks(self, ri: int, term: str) -> PostingBlocks | None:
        key = (ri, term)
        with self._lock:
            hit = self._pb_cache.get(key, False)
        if hit is not False:
            return hit
        blob = self.readers[ri].posting_blob(term)
        pb = PostingBlocks(blob) if blob is not None else None
        with self._lock:
            if len(self._pb_cache) >= self._CACHE_MAX:
                self._pb_cache.clear()
            self._pb_cache[key] = pb
        return pb

    def _decoded(self, ri: int, term: str):
        """(doc_ids, tfs, dls) of one term in one reader, LRU-cached."""
        key = (ri, term)
        with self._lock:
            hit = self._dec_cache.get(key)
            if hit is not None:
                self._dec_hits += 1
                self._dec_cache.move_to_end(key)
                return hit if hit[0] is not None else None
            self._dec_misses += 1
        pb = self._blocks(ri, term)
        if pb is None:
            # negative entries are free (no arrays) and frequent for sharded
            # vocabularies — cache them as (None,)
            with self._lock:
                self._dec_cache[key] = (None,)
            return None
        arrs = pb.decode_all()
        n = len(arrs[0])
        if n <= self._DECODED_BUDGET:
            with self._lock:
                while self._dec_size + n > self._DECODED_BUDGET and self._dec_cache:
                    _, old = self._dec_cache.popitem(last=False)
                    if old[0] is not None:
                        self._dec_size -= len(old[0])
                if key not in self._dec_cache:
                    self._dec_cache[key] = arrs
                    self._dec_size += n
        return arrs

    def cache_stats(self) -> dict:
        """Decoded-LRU diagnostics (ops tool): size/budget/hits/misses."""
        with self._lock:
            return {
                "entries": len(self._dec_cache),
                "postings": self._dec_size,
                "budget": self._DECODED_BUDGET,
                "hits": self._dec_hits,
                "misses": self._dec_misses,
            }

    def warm_hot_terms(self, max_postings: int | None = None, per_reader: int = 256) -> int:
        """Pre-decode the highest-df terms into the LRU (tail-latency lever:
        the cold p95 is dominated by the FIRST decode of the corpus's hottest
        terms — exactly the terms Zipfian query traffic hits first). Called
        fire-and-forget at engine init; the actor model serializes it before
        the first search. Returns postings warmed."""
        budget = self._DECODED_BUDGET // 2 if max_postings is None else min(
            max_postings, self._DECODED_BUDGET // 2
        )
        cands: list[tuple[int, int, str]] = []
        for ri, r in enumerate(self.readers):
            if len(r.dfs):
                top = np.argsort(r.dfs)[::-1][:per_reader]
                for i in top:
                    cands.append((int(r.dfs[i]), ri, str(r.terms[i])))
        cands.sort(reverse=True)
        used = 0
        for df, ri, t in cands:
            if used + df > budget:
                break
            if self._decoded(ri, t) is not None:
                used += df
        return used

    def matched_positions(self, terms: list[str], doc_ids: list[int]) -> list[tuple]:
        """(doc_id, term, positions) for every (requested doc × term) hit in
        this shard — the highlight primitive (ES-style): token indices come
        straight from the positional sidecar, decoded ONLY for the requested
        docs. Requires a positional index."""
        from .tombstones import in_sorted

        want_all = np.array(sorted(doc_ids), dtype=np.uint64)
        out = []
        for ri, rd in enumerate(self.readers):
            dd = self.dead[ri]
            # a doc being highlighted may have a superseded version in an
            # older run's reader — its stale positions must not answer
            want = want_all[~in_sorted(want_all, dd)] if dd is not None else want_all
            if len(want) == 0:
                continue
            for t in sorted(set(terms)):
                arrs = self._decoded(ri, t)
                if arrs is None:
                    continue
                ids, tfs, _ = arrs
                sel = np.searchsorted(ids, want)
                sel_c = np.minimum(sel, max(len(ids) - 1, 0))
                hit = len(ids) > 0 and (ids[sel_c] == want)
                hit_idx = sel_c[hit] if len(ids) else np.empty(0, dtype=np.int64)
                if len(hit_idx) == 0:
                    continue
                flat, counts = rd.term_positions(t, tfs, hit_idx)
                po = np.zeros(len(counts) + 1, dtype=np.int64)
                np.cumsum(counts, out=po[1:])
                for j, d in enumerate(want[hit]):
                    out.append((int(d), t, flat[po[j] : po[j + 1]].astype(np.int64).tolist()))
        return out

    def expand_prefix(self, prefix: str, cap: int) -> list[str]:
        """First ``cap`` dictionary terms (lexicographic) starting with
        ``prefix`` across this actor's readers — binary search over the
        sorted term dictionaries, no scan."""
        hi_key = prefix + "\U0010ffff"
        found: set[str] = set()
        for r in self.readers:
            lo = int(np.searchsorted(r.terms, prefix))
            hi = int(np.searchsorted(r.terms, hi_key))
            found.update(str(t) for t in r.terms[lo : min(hi, lo + cap)])
        return sorted(found)[:cap]

    def expand_wildcard(self, pattern: str, cap: int) -> list[str]:
        """Dictionary terms matching a ``*``/``?`` wildcard pattern. The
        literal prefix before the first wildcard narrows the scan to a
        binary-searched dictionary range (the ES "avoid leading wildcards"
        cost model); matching within the range is one vectorized RE2 pass.
        Returns the first ``cap`` matches lexicographically per shard (same
        capped-union contract as expand_prefix)."""
        import re as _re

        prefix = _re.split(r"[*?]", pattern, 1)[0]
        rx = "^" + "".join(
            ".*" if c == "*" else "." if c == "?" else _re.escape(c) for c in pattern
        ) + "$"
        found: set[str] = set()
        for r in self.readers:
            if prefix:
                lo = int(np.searchsorted(r.terms, prefix))
                hi = int(np.searchsorted(r.terms, prefix + "\U0010ffff"))
            else:
                lo, hi = 0, len(r.terms)
            cand = r.terms[lo:hi]
            if len(cand) == 0:
                continue
            m = pc.match_substring_regex(
                pa.array(cand, type=pa.string()), pattern=rx
            ).to_numpy(zero_copy_only=False)
            hits = cand[m]
            found.update(str(t) for t in hits[:cap])
        return sorted(found)[:cap]

    def expand_regexp(self, pattern: str, cap: int) -> list[str]:
        """Dictionary terms fully matching a regular expression (the ES
        regexp query). The literal prefix of the pattern (chars before the
        first regex metacharacter) narrows the scan to a binary-searched
        dictionary range — an anchored ``^pattern$`` RE2 pass does the rest,
        vectorized over the candidate range. Same capped-union contract as
        expand_prefix/expand_wildcard."""
        prefix = ""
        for c in pattern:
            if c in r".^$*+?{}[]\|()":
                break
            prefix += c
        rx = "^(?:" + pattern + ")$"
        # Validate with the SAME engine that executes (Arrow RE2), not
        # Python re: syntax the two disagree on (lookarounds, backrefs) would
        # pass an re.compile() check and then blow up inside shard actors as
        # an opaque RayTaskError. A one-element probe surfaces it here.
        try:
            pc.match_substring_regex(pa.array([""], type=pa.string()), pattern=rx)
        except pa.lib.ArrowInvalid as e:
            raise ValueError(f"invalid regexp pattern {pattern!r}: {e}") from None
        found: set[str] = set()
        for r in self.readers:
            if prefix:
                lo = int(np.searchsorted(r.terms, prefix))
                hi = int(np.searchsorted(r.terms, prefix + "\U0010ffff"))
            else:
                lo, hi = 0, len(r.terms)
            cand = r.terms[lo:hi]
            if len(cand) == 0:
                continue
            m = pc.match_substring_regex(
                pa.array(cand, type=pa.string()), pattern=rx
            ).to_numpy(zero_copy_only=False)
            hits = cand[m]
            found.update(str(t) for t in hits[:cap])
        return sorted(found)[:cap]

    def expand_fuzzy(self, term: str, max_edits: int, cap: int) -> list[str]:
        """Dictionary terms within Levenshtein distance ``max_edits`` of
        ``term`` (the ES fuzzy-query expansion). Candidates are length-
        filtered (|len-len(q)| ≤ d is a Levenshtein lower bound), then the
        edit distance runs as a BATCH dynamic program over the whole
        candidate array — numpy rows are candidates, the loops are only over
        the query length × max candidate width (~200 vectorized ops)."""
        found: set[str] = set()
        for r in self.readers:
            u = r.terms.astype("U")  # fixed-width unicode view of the dict
            lens = np.char.str_len(u)
            m = np.abs(lens - len(term)) <= max_edits
            cand = u[m]
            if len(cand) == 0:
                continue
            hits = _levenshtein_filter(cand, term, max_edits)
            found.update(str(t) for t in hits)
        return sorted(found)[:cap]

    def match_doc_ids(self, terms: list[str], mode: str) -> np.ndarray:
        """ALL doc ids matching the query (OR: any term; AND: every term) —
        the aggregation/facet match set, not a top-k. Uses the decoded-
        postings LRU; per-reader set algebra is numpy (docs are disjoint
        across readers so results concatenate)."""
        from .tombstones import in_sorted

        out: list[np.ndarray] = []
        for ri in range(len(self.readers)):
            per_term = [self._decoded(ri, t) for t in terms]
            arrs = [p[0] for p in per_term if p is not None]
            got: np.ndarray | None = None
            if mode == "and":
                if len(arrs) < len(terms):
                    continue
                cur = arrs[0]
                for a in arrs[1:]:
                    cur = np.intersect1d(cur, a, assume_unique=True)
                    if len(cur) == 0:
                        break
                if len(cur):
                    got = cur
            elif arrs:
                got = np.unique(np.concatenate(arrs))
            if got is not None:
                dd = self.dead[ri]
                if dd is not None:
                    got = got[~in_sorted(got, dd)]  # superseded versions
                if len(got):
                    out.append(got)
        if not out:
            return np.empty(0, dtype=np.uint64)
        return np.unique(np.concatenate(out))

    # ---------------- doc-values (ES doc_values / fielddata analogue) ------
    # per-actor columnar (doc_id → field value) for the LIVE docs this actor
    # serves — loaded once per field from the docmap, then filters and
    # aggregations under a query are local actor work: no per-query docmap
    # streaming and no driver-side id broadcasts. Cluster path note: each
    # actor reads the full docmap column and keeps its own docs (read
    # amplification = n_actors on one host; a multi-node deployment would
    # seg-partition the docmap at build time to make this a local read).

    def load_doc_values(
        self,
        field: str,
        run_files: list[tuple[list[str], np.ndarray | None]],
        num_segments: int,
    ) -> int:
        """Load one field's doc-values for this actor's segments.
        ``run_files``: per run, (docmap parquet files, dead doc_ids|None).
        Returns the number of docs loaded."""
        import pyarrow.parquet as pq

        from .tombstones import in_sorted

        if not hasattr(self, "_doc_values"):
            self._doc_values: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        my_segs = np.array(
            sorted({int(r.meta["seg_id"]) for r in self.readers}), dtype=np.uint64
        )
        ids_parts, val_parts = [], []
        for files, dd in run_files:
            for f in files:
                t = pq.read_table(f, columns=["doc_id", field])
                ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
                keep = np.isin(ids % np.uint64(num_segments), my_segs)
                if dd is not None and len(dd):
                    keep &= ~in_sorted(ids, np.asarray(dd, dtype=np.uint64))
                if keep.any():
                    ids_parts.append(ids[keep])
                    val_parts.append(
                        t[field].to_numpy(zero_copy_only=False)[keep]
                    )
        if not ids_parts:
            self._doc_values[field] = (np.empty(0, dtype=np.uint64), np.empty(0))
            return 0
        ids = np.concatenate(ids_parts)
        vals = np.concatenate(val_parts)
        order = np.argsort(ids)
        self._doc_values[field] = (ids[order], vals[order])
        return int(len(ids))

    def has_doc_values(self, field: str) -> bool:
        return hasattr(self, "_doc_values") and field in self._doc_values

    def derive_doc_value(self, name: str, expr_sql: str, sources: list[str]) -> int:
        """ES runtime field: a NEW doc-value computed from existing ones by
        one DuckDB expression per shard (the repo's evaluate-with-DuckDB
        rule — no scalar re-implementation). Source fields share the docmap,
        so their id arrays are identical; the derived column aligns by
        construction and every filter/agg/sort surface works on it."""
        import duckdb

        ids0, _ = self._doc_values[sources[0]]
        cols: dict = {}
        for f in sources:
            ids_f, vals_f = self._doc_values[f]
            if len(ids_f) != len(ids0) or not np.array_equal(ids_f, ids0):
                raise ValueError("runtime-field sources must share the docmap")
            cols[f] = pa.array(vals_f)
        t = pa.table(cols) if cols else pa.table({"__one": pa.array([])})
        con = duckdb.connect()
        try:
            con.register("t", t)
            out = con.execute(f"SELECT ({expr_sql}) AS v FROM t").arrow()
        finally:
            con.close()
        vals = out["v"].to_numpy(zero_copy_only=False)
        self._doc_values[name] = (ids0, vals)
        return int(len(ids0))

    def _values_of(self, field: str, ids: np.ndarray) -> np.ndarray:
        """Field values aligned with ``ids``. Every id passed is a live doc
        of this actor (callers pass match results, and the docmap covers
        every indexed doc), so the lookup is a plain sorted gather."""
        dv_ids, dv_vals = self._doc_values[field]
        pos = np.searchsorted(dv_ids, ids)
        if len(dv_ids) == 0 or not (dv_ids[np.minimum(pos, len(dv_ids) - 1)] == ids).all():
            raise KeyError(f"doc-values for '{field}' missing some matched docs")
        return dv_vals[pos]

    def _allowed_ids(self, filters: list[dict]) -> np.ndarray:
        """Sorted doc_ids of this actor passing ALL filter clauses (ES filter
        context: pure yes/no, never affects scoring)."""
        first = filters[0]["field"]
        dv_ids, _ = self._doc_values[first]
        keep = np.ones(len(dv_ids), dtype=bool)
        for fl in filters:
            _, vals = self._doc_values[fl["field"]]
            if "eq" in fl:
                keep &= vals == fl["eq"]
            if "neq" in fl:
                keep &= vals != fl["neq"]
            if "in" in fl:
                keep &= np.isin(vals, np.asarray(fl["in"]))
            if "prefix" in fl:
                # ES prefix query in filter context, on a KEYWORD doc-value
                keep &= np.char.startswith(vals.astype(str), str(fl["prefix"]))
            if "gte" in fl:
                keep &= vals >= fl["gte"]
            if "gt" in fl:
                keep &= vals > fl["gt"]
            if "lte" in fl:
                keep &= vals <= fl["lte"]
            if "lt" in fl:
                keep &= vals < fl["lt"]
            if "geo_distance" in fl:
                # ES bool.filter.geo_distance: fl["field"] is the latitude
                # doc-value, the clause names the longitude field + origin +
                # radius; vectorized haversine over this actor's doc-values.
                from ..stages.geoip import haversine_m

                g = fl["geo_distance"]
                _, lons = self._doc_values[g["lon_field"]]
                olat, olon = g["origin"]
                d = haversine_m(
                    vals.astype(np.float64), lons.astype(np.float64),
                    float(olat), float(olon),
                )
                keep &= d <= float(g["radius_m"])
        return dv_ids[keep]

    def agg_under_query(
        self,
        terms: list[str],
        mode: str,
        field: str,
        histogram_interval: float | None = None,
        value_counts: bool = False,
    ):
        """Aggregations over ALL matching docs (ES aggs under a query),
        computed locally from this actor's doc-values: stats partials
        (count, sum, min, max), histogram bucket counts keyed by
        ``floor(v / interval) * interval``, or terms-facet value counts."""
        ids = self.match_doc_ids(terms, mode)
        if len(ids) == 0:
            return None
        return self._agg_partial(self._values_of(field, ids), histogram_interval, value_counts)

    def multi_terms_under_query(self, terms: list[str], mode: str, fields: list[str]):
        """ES multi_terms aggregation partial: per-(field tuple) doc counts
        over this shard's matching docs — one vectorized Arrow group_by, only
        (tuple, count) partials leave the shard."""
        ids = self.match_doc_ids(terms, mode)
        if len(ids) == 0:
            return None
        t = pa.table({f: pa.array(self._values_of(f, ids)) for f in fields})
        g = t.group_by(list(fields)).aggregate([([], "count_all")])
        return g.to_pylist()  # [{f0:…, f1:…, "count_all": n}]

    def terms_stats_under_query(
        self, terms: list[str], mode: str, group_field: str, value_field: str
    ):
        """ES terms aggregation with a stats SUB-aggregation, shard partial:
        one Arrow group_by over the matched doc-values → per-bucket
        (count, sum, min, max). Only bucket-sized partials leave the shard."""
        ids = self.match_doc_ids(terms, mode)
        if len(ids) == 0:
            return None
        t = pa.table({
            "g": pa.array(self._values_of(group_field, ids)),
            "v": pa.array(self._values_of(value_field, ids)),
        })
        agg = t.group_by(["g"]).aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")]
        )
        return agg.to_pylist()

    def weighted_avg_under_query(
        self, terms: list[str], mode: str, value_field: str, weight_field: str
    ):
        """ES weighted_avg partial: (Σ value·weight, Σ weight) over this
        shard's matching docs."""
        ids = self.match_doc_ids(terms, mode)
        if len(ids) == 0:
            return None
        v = self._values_of(value_field, ids).astype(np.float64)
        w = self._values_of(weight_field, ids).astype(np.float64)
        return (float((v * w).sum()), float(w.sum()))

    def terms_set_topk(
        self,
        terms: list[str],
        idfs: dict[str, float],
        avgdl: float,
        msm_field: str,
        k: int,
        k1: float,
        b: float,
    ):
        """ES terms_set partial: docs whose matched-term count ≥ their OWN
        value of ``msm_field`` (the minimum_should_match_field), scored by
        the standard ascending-term BM25 sum over the matched terms. Local
        top-k only rides to the driver."""
        from .tombstones import in_sorted

        cand_docs: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        for ri in range(len(self.readers)):
            per = [(t, self._decoded(ri, t)) for t in terms]
            per = [(t, a) for t, a in per if a is not None]
            if not per:
                continue
            union = np.unique(np.concatenate([a[0] for _, a in per]))
            scores = np.zeros(len(union), dtype=np.float64)
            hits = np.zeros(len(union), dtype=np.int64)
            for t, (ids, tfs, dls) in per:  # ascending-term accumulation
                pos = np.searchsorted(union, ids)
                scores[pos] += bm25.contribution(idfs[t], tfs, dls, avgdl, k1, b)
                hits[pos] += 1
            dd = self.dead[ri]
            if dd is not None:
                alive = ~in_sorted(union, dd)
                union, scores, hits = union[alive], scores[alive], hits[alive]
            if len(union) == 0:
                continue
            msm = self._values_of(msm_field, union).astype(np.int64)
            m = hits >= msm
            cand_docs.append(union[m])
            cand_scores.append(scores[m])
        if not cand_docs:
            return []
        docs = np.concatenate(cand_docs)
        scores = np.concatenate(cand_scores)
        top = bm25.topk_indices(scores, docs, k)
        return [(float(scores[i]), int(docs[i])) for i in top]

    def sig_text_counts(
        self,
        terms: list[str],
        mode: str,
        field: str,
        analyzer_name: str,
        shard_sample: int | None,
    ):
        """ES significant_text partial: re-analyze the STORED text of this
        shard's matching docs (lowest doc_ids first when sampled — a
        deterministic stand-in for ES's sampler) and count, per term, the
        number of foreground docs containing it. Returns
        (n_docs_counted, {term: doc_count}) — partial sizes are bounded by
        the foreground's distinct-term set."""
        ids = np.sort(self.match_doc_ids(terms, mode))
        if shard_sample is not None:
            ids = ids[: int(shard_sample)]
        if len(ids) == 0:
            return None
        from ..functions.analysis import get_analyzer

        az = get_analyzer(analyzer_name)
        vals = self._values_of(field, ids)
        toks = az.tokens_of(pa.array([str(v) for v in vals], type=pa.large_string()))
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.fill_null(pc.not_equal(flat, ""), False)
        pairs = pa.table({"d": parent.filter(keep), "t": flat.filter(keep)})
        uniq = pairs.group_by(["d", "t"]).aggregate([])
        counts = uniq.group_by(["t"]).aggregate([([], "count_all")])
        return (
            int(len(ids)),
            {r["t"]: int(r["count_all"]) for r in counts.to_pylist()},
        )

    def adjacency_counts(self, named: dict[str, tuple[list[str], str]]):
        """ES adjacency_matrix partial: named match sets evaluated locally,
        then every single and pairwise-intersection count — docs are
        disjoint across shards, so the counts sum exactly at the driver and
        no match-id array ever leaves the shard."""
        ids = {n: self.match_doc_ids(t, m) for n, (t, m) in named.items()}
        out: dict[str, int] = {}
        names = sorted(named)
        for i, a in enumerate(names):
            out[a] = int(len(ids[a]))
            for b in names[i + 1 :]:
                out[f"{a}&{b}"] = int(
                    len(np.intersect1d(ids[a], ids[b], assume_unique=True))
                )
        return out

    def _agg_partial(self, vals, histogram_interval=None, value_counts=False):
        """Shard-local agg partial over a matched doc-value array — shared by
        the terms/mode path (agg_under_query) and the query_string path
        (qs_agg), so every agg surface combines identically."""
        if value_counts == "numeric":
            # percentile partial: per-value counts with NUMERIC keys (exact
            # for fields whose distinct-value set is bounded — same contract
            # as facets; continuous fields belong in histogram/sketches)
            uniq, counts = np.unique(vals.astype(np.float64), return_counts=True)
            return (uniq.tolist(), counts.tolist())
        if value_counts:
            uniq, counts = np.unique(vals, return_counts=True)
            return ([str(v) for v in uniq], counts.tolist())
        if histogram_interval is not None:
            b = np.floor(vals / histogram_interval) * histogram_interval
            uniq, counts = np.unique(b, return_counts=True)
            return (uniq.tolist(), counts.tolist())
        return (
            int(len(vals)),
            float(vals.sum()),
            float(vals.min()),
            float(vals.max()),
        )

    def qs_agg(
        self,
        tree: dict,
        avgdl: float,
        k1: float,
        b: float,
        field: str | None,
        histogram_interval: float | None = None,
        value_counts: bool = False,
    ):
        """Aggregations over ALL docs matching a compiled query_string tree,
        computed locally from this actor's doc-values (match sets never leave
        the shard). ``field=None`` → bare match count (ES _count)."""
        ids, _ = self._qs_eval(tree, avgdl, k1, b)
        if len(ids) == 0:
            return None
        if field is None:
            return int(len(ids))
        return self._agg_partial(self._values_of(field, ids), histogram_interval, value_counts)

    def _score_all_matches(
        self, terms: list[str], mode: str, idfs: dict, avgdl: float,
        k1: float, b: float,
    ) -> tuple[np.ndarray, np.ndarray]:
        """BM25 scores of ALL matching docs in this shard (no top-k cut) —
        the primitive under bucketed top_hits and function_score, where every
        match's score is needed before the per-bucket / re-ranked cut.
        Same accumulation order and tombstone handling as _score_exhaustive,
        so scores are bit-identical to search results."""
        from .tombstones import in_sorted

        out_ids: list[np.ndarray] = []
        out_scores: list[np.ndarray] = []
        for ri in range(len(self.readers)):
            per_term = []
            for t in terms:  # terms pre-sorted ascending
                arrs = self._decoded(ri, t)
                if arrs is not None:
                    per_term.append((t, *arrs))
            if not per_term or (mode == "and" and len(per_term) < len(terms)):
                continue
            union = np.unique(np.concatenate([ids for _, ids, _, _ in per_term]))
            scores = np.zeros(len(union), dtype=np.float64)
            hits = np.zeros(len(union), dtype=np.int32)
            for t, ids, tfs, dls in per_term:
                pos = np.searchsorted(union, ids)
                scores[pos] += bm25.contribution(idfs[t], tfs, dls, avgdl, k1, b)
                hits[pos] += 1
            dd = self.dead[ri]
            if dd is not None:
                alive = ~in_sorted(union, dd)
                union, scores, hits = union[alive], scores[alive], hits[alive]
            if mode == "and":
                m = hits == len(terms)
                union, scores = union[m], scores[m]
            if len(union):
                out_ids.append(union)
                out_scores.append(scores)
        if not out_ids:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        return np.concatenate(out_ids), np.concatenate(out_scores)

    def top_hits_by_value(
        self, terms: list[str], mode: str, field: str, n: int,
        idfs: dict, avgdl: float, k1: float, b: float,
    ):
        """ES terms-agg + top_hits partial: per doc-value of ``field``, this
        shard's match count and its local top-``n`` matching docs by score.
        Only (value, count) + n rows per value leave the actor."""
        ids, scores = self._score_all_matches(terms, mode, idfs, avgdl, k1, b)
        if len(ids) == 0:
            return None
        vals = self._values_of(field, ids)
        df = pd.DataFrame(
            {"v": vals, "doc": ids.astype(np.uint64), "s": scores}
        ).sort_values(["v", "s", "doc"], ascending=[True, False, True], kind="mergesort")
        counts = df.groupby("v", sort=False).size()
        top = df.groupby("v", sort=False).head(n)
        return (
            counts.index.tolist(),
            counts.to_numpy().tolist(),
            top["v"].tolist(),
            top["doc"].tolist(),
            top["s"].tolist(),
        )

    def boosted_topk(
        self, terms: list[str], mode: str, k: int, field: str, modifier: str,
        weight: float, idfs: dict, avgdl: float, k1: float, b: float,
        factor: float = 1.0,
    ) -> list[tuple]:
        """ES function_score field_value_factor partial: local top-k by
        BM25 · (weight · modifier(factor · doc_value)) — re-ranking needs
        every match's boosted score, so the cut happens after the multiply."""
        if modifier not in FVF_MODIFIERS:
            raise ValueError(f"modifier must be one of {FVF_MODIFIERS}")
        ids, scores = self._score_all_matches(terms, mode, idfs, avgdl, k1, b)
        if len(ids) == 0:
            return []
        vals = self._values_of(field, ids).astype(np.float64)
        final = scores * (weight * fvf_apply(vals, modifier, factor))
        top = bm25.topk_indices(final, ids, k)
        return [(float(final[i]), int(ids[i])) for i in top]

    def decay_topk(
        self, terms: list[str], mode: str, k: int, field: str, fn: str,
        origin: float, scale: float, offset: float, decay: float,
        weight: float, idfs: dict, avgdl: float, k1: float, b: float,
    ) -> list[tuple]:
        """ES function_score decay partial (gauss/exp/linear on a numeric
        doc-value): local top-k by BM25 · (weight · decay(doc_value)) —
        same every-match re-rank shape as boosted_topk."""
        ids, scores = self._score_all_matches(terms, mode, idfs, avgdl, k1, b)
        if len(ids) == 0:
            return []
        vals = self._values_of(field, ids).astype(np.float64)
        final = scores * (weight * decay_apply(vals, fn, origin, scale, offset, decay))
        top = bm25.topk_indices(final, ids, k)
        return [(float(final[i]), int(ids[i])) for i in top]

    def distance_feature_topk(
        self, terms: list[str], mode: str, k: int, field: str, origin: float,
        pivot: float, weight: float, idfs: dict, avgdl: float, k1: float, b: float,
    ) -> list[tuple]:
        """ES distance_feature partial: unlike function_score's multiply,
        the boost is ADDITIVE — final = BM25 + weight · pivot/(pivot+dist)
        (the bool-should clause ES models it as). Same every-match re-rank
        + local top-k shape as boosted_topk."""
        ids, scores = self._score_all_matches(terms, mode, idfs, avgdl, k1, b)
        if len(ids) == 0:
            return []
        vals = self._values_of(field, ids).astype(np.float64)
        final = scores + weight * distance_feature_apply(vals, origin, pivot)
        top = bm25.topk_indices(final, ids, k)
        return [(float(final[i]), int(ids[i])) for i in top]

    def rank_feature_topk(
        self, terms: list[str], mode: str, k: int, field: str, fn: str,
        pivot: float, scaling_factor: float, exponent: float, weight: float,
        idfs: dict, avgdl: float, k1: float, b: float,
    ) -> list[tuple]:
        """ES rank_feature partial: ADDITIVE boost (a bool-should clause,
        like distance_feature) — final = BM25 + weight · kernel(value)."""
        ids, scores = self._score_all_matches(terms, mode, idfs, avgdl, k1, b)
        if len(ids) == 0:
            return []
        vals = self._values_of(field, ids).astype(np.float64)
        final = scores + weight * rank_feature_apply(
            vals, fn, pivot=pivot, scaling_factor=scaling_factor,
            exponent=exponent,
        )
        top = bm25.topk_indices(final, ids, k)
        return [(float(final[i]), int(ids[i])) for i in top]

    def export_matches(
        self,
        terms: list[str],
        mode: str,
        out_dir: str,
        part: int,
        fields: tuple[str, ...],
        idfs: dict | None,
        avgdl: float,
        k1: float,
        b: float,
        rows_per_file: int = 1 << 20,
    ) -> tuple[int, list[str]]:
        """ES scroll/export analogue, shard-local half: write ALL of this
        actor's matching docs (doc_id [, score] [, doc-value fields]) as
        parquet directly from the actor — match sets never cross the network,
        and each actor writes its own partition files (resumable layout:
        deterministic names part-{part}-{chunk}.parquet, overwrite-idempotent
        under retries). Chunked so one file never holds more than
        ``rows_per_file`` rows."""
        import pyarrow.parquet as pq

        if idfs is not None:
            ids, scores = self._score_all_matches(terms, mode, idfs, avgdl, k1, b)
        else:
            ids, scores = self.match_doc_ids(terms, mode), None
        n = len(ids)
        files: list[str] = []
        os.makedirs(out_dir, exist_ok=True)
        for ci, lo in enumerate(range(0, n, rows_per_file)):
            hi = min(lo + rows_per_file, n)
            cols: dict = {"doc_id": pa.array(ids[lo:hi], type=pa.uint64())}
            if scores is not None:
                cols["score"] = pa.array(scores[lo:hi], type=pa.float64())
            for f in fields:
                cols[f] = pa.array(self._values_of(f, ids[lo:hi]))
            path = os.path.join(out_dir, f"part-{part:05d}-{ci:04d}.parquet")
            pq.write_table(pa.table(cols), path)
            files.append(path)
        return n, files

    def distinct_under_query(self, terms: list[str], mode: str, field: str):
        """Distinct doc-values of this actor's MATCHING docs (ES cardinality
        partial). Actors hold disjoint docs, but the same value can appear on
        several actors — the driver unions the per-actor sets."""
        ids = self.match_doc_ids(terms, mode)
        if len(ids) == 0:
            return None
        return np.unique(self._values_of(field, ids)).tolist()

    def value_counts_all(self, field: str):
        """Background value counts over ALL live docs this actor serves (the
        significant-terms denominator). Docs are disjoint across actors, so
        partials sum."""
        _, vals = self._doc_values[field]
        if len(vals) == 0:
            return None
        uniq, counts = np.unique(vals, return_counts=True)
        return ([str(v) for v in uniq], counts.tolist())

    def date_histogram_under_query(
        self, terms: list[str], mode: str, field: str, trunc_chars: int
    ):
        """Calendar-bucket counts of matching docs: the field holds ISO-8601
        date strings, so year/month/day truncation is a fixed-width prefix
        slice (vectorized). Returns (bucket strings, counts) partials."""
        ids = self.match_doc_ids(terms, mode)
        if len(ids) == 0:
            return None
        vals = self._values_of(field, ids)
        sliced = pd.Series(vals, dtype="object").astype(str).str.slice(0, trunc_chars)
        vc = sliced.value_counts()
        return (vc.index.tolist(), vc.to_numpy().tolist())

    def top_by_field(
        self, terms: list[str], mode: str, field: str, k: int, descending: bool,
        after: tuple | None = None,
    ) -> list[tuple]:
        """ES sort-by-field: this shard's top-k MATCHING docs ordered by a
        doc-value (tie → doc_id asc) — local match + local sort, only k rows
        leave the actor. ``after=(value, doc_id)``: search_after over the
        FIELD sort — only rows strictly after the cursor survive."""
        ids = self.match_doc_ids(terms, mode)
        if len(ids) == 0:
            return []
        vals = self._values_of(field, ids)
        if after is not None:
            av, ad = after
            if descending:
                keep = (vals < av) | ((vals == av) & (ids > np.uint64(int(ad))))
            else:
                keep = (vals > av) | ((vals == av) & (ids > np.uint64(int(ad))))
            ids, vals = ids[keep], vals[keep]
            if len(ids) == 0:
                return []
        key = -vals if descending else vals
        order = np.lexsort((ids, key))[:k]
        return [(vals[i], int(ids[i])) for i in order]

    def explain_doc(
        self, terms: list[str], idfs: dict, avgdl: float, doc_id: int,
        k1: float, b: float,
    ) -> list[tuple]:
        """ES _explain analogue: per-term (tf, dl, idf, contribution) for one
        doc in this shard (empty if the doc is not here / superseded)."""
        from .tombstones import in_sorted

        d = np.uint64(doc_id)
        out = []
        for ri in range(len(self.readers)):
            dd = self.dead[ri]
            if dd is not None and in_sorted(np.array([d]), dd)[0]:
                continue
            for t in terms:
                arrs = self._decoded(ri, t)
                if arrs is None:
                    continue
                ids, tfs, dls = arrs
                j = int(np.searchsorted(ids, d))
                if j < len(ids) and ids[j] == d:
                    contrib = float(
                        bm25.contribution(
                            idfs[t], np.float64(tfs[j]), np.float64(dls[j]), avgdl, k1, b
                        )
                    )
                    out.append((t, int(tfs[j]), int(dls[j]), float(idfs[t]), contrib))
        return out

    def _rdf(self, ri: int, term: str) -> int:
        """df of one term in one reader, tombstone-corrected."""
        r = self.readers[ri]
        i = r.lookup(term)
        if i < 0:
            return 0
        d = int(r.dfs[i])
        corr = self._df_corr.get(ri)
        return d - int(corr[i]) if corr is not None else d

    def dfs(self, terms: list[str]) -> list[int]:
        return [
            int(sum(self._rdf(ri, t) for ri in range(len(self.readers)))) for t in terms
        ]

    def all_dfs(self) -> tuple[list[str], np.ndarray]:
        """Full (term, df) of this actor's segments — used by the driver's
        one-shot df preload. Tombstone-corrected (terms whose every posting
        is superseded report df 0 and are dropped)."""
        agg: dict[str, int] = {}
        for ri, r in enumerate(self.readers):
            corr = self._df_corr.get(ri)
            eff = r.dfs - corr if corr is not None else r.dfs
            for t, d in zip(r.terms, eff):
                agg[t] = agg.get(t, 0) + int(d)
        terms = sorted(t for t in agg if agg[t] > 0)
        return terms, np.array([agg[t] for t in terms], dtype=np.int64)

    def _score_readers(self, ri_lo: int, ri_hi: int, q: dict, heap: list) -> None:
        """Score readers [ri_lo, ri_hi) into ``heap`` (one thread's slice)."""
        terms, idfs, avgdl, k = q["terms"], q["idfs"], q["avgdl"], q["k"]
        k1, b = q.get("k1", bm25.K1), q.get("b", bm25.B)
        rds = self.readers[ri_lo:ri_hi]
        gd = (lambda ri: self.dead[ri]) if any(d is not None for d in self.dead) else None
        allowed = q.get("_allowed")
        after = tuple(q["after"]) if q.get("after") else None
        if q.get("groups"):
            _score_synonyms(
                rds, q["groups"], q["group_idfs"], avgdl, k, q["mode"], heap,
                get_blocks=self._blocks, k1=k1, b=b,
                get_decoded=self._decoded, reader_offset=ri_lo, get_dead=gd,
                allowed=allowed, after=after,
            )
        elif q["mode"] == "phrase":
            _score_phrase(
                rds, q["phrase"], idfs, avgdl, k, heap,
                get_blocks=self._blocks, k1=k1, b=b,
                get_decoded=self._decoded, reader_offset=ri_lo, get_dead=gd,
                allowed=allowed, after=after, slop=int(q.get("slop", 0)),
            )
        elif q["mode"] == "span":
            if q["terms"]:  # empty = a clause term is unknown → no match
                _score_spans(
                    rds, q["span"], idfs, avgdl, k, heap, k1=k1, b=b,
                    get_decoded=self._decoded, reader_offset=ri_lo,
                    get_dead=gd, allowed=allowed, after=after,
                )
        elif (
            q["mode"] == "and"
            or q["method"] == "exhaustive"
            or q.get("exclude_terms")
            or q.get("min_should_match")
            or q.get("must_terms")
        ):
            _score_exhaustive(
                rds, terms, idfs, avgdl, k, q["mode"], heap,
                get_blocks=self._blocks, k1=k1, b=b,
                get_decoded=self._decoded, reader_offset=ri_lo,
                exclude_terms=q.get("exclude_terms"), get_dead=gd,
                allowed=allowed, after=after,
                min_should_match=q.get("min_should_match"),
                must_terms=q.get("must_terms"),
            )
        else:
            _score_bmw(
                rds, terms, idfs, avgdl, k, heap,
                get_blocks=self._blocks, k1=k1, b=b, reader_offset=ri_lo, get_dead=gd,
                allowed=allowed, after=after, get_decoded=self._decoded,
                heap_lock=q.get("_heap_lock"),
            )

    @staticmethod
    def _uses_bmw(q: dict) -> bool:
        """Mirror of _score_readers' scorer dispatch: True iff this query
        takes the block-max path (whose pruning needs a SHARED θ heap)."""
        return not (
            q.get("groups")
            or q["mode"] in ("phrase", "and", "span")
            or q["method"] == "exhaustive"
            or q.get("exclude_terms")
            or q.get("min_should_match")
            or q.get("must_terms")
        )

    def search_batch(self, queries: list[dict]) -> list[list[tuple[float, int]]]:
        """queries: [{terms (sorted), idfs, avgdl, k, mode, method}] →
        per query, local top-k as (score, doc_id)."""
        out = []
        n_r = len(self.readers)
        # the per-reader thread pool is a LATENCY lever (parallelize one
        # query's segments across idle CPUs); under a multi-query batch every
        # actor is already busy and extra threads only contend — measured at
        # 2.4M docs/32 actors: batch-of-50 wall 6 s with threads vs the
        # ~0.8 s per-actor serial work
        use_pool = self._pool is not None and n_r > 1 and len(queries) == 1
        for q in queries:
            heap: list = []
            if q["k"] <= 0 or len(q["terms"]) == 0:
                out.append([])
                continue
            if q.get("filters"):
                # ES filter context: the allowed-id set is actor-local doc-
                # values work, computed once per (query, actor)
                q = {**q, "_allowed": self._allowed_ids(q["filters"])}
            elif q.get("allowed_ids") is not None:
                # explicit doc-id restriction (the rescore window): scorers
                # intersect per-reader, so ids outside this actor just no-op
                q = {**q, "_allowed": np.asarray(sorted(q["allowed_ids"]), dtype=np.uint64)}
            if use_pool and self._uses_bmw(q):
                # BMW prunes on a GLOBAL θ: per-thread heaps would each start
                # at θ=-1 and skip nothing. All threads share ONE lock-guarded
                # heap; push batches are ≤k per round so contention is noise.
                import threading

                q = {**q, "_heap_lock": threading.Lock()}
                futs = [
                    self._pool.submit(self._score_readers, ri, ri + 1, q, heap)
                    for ri in range(n_r)
                ]
                for f in futs:
                    f.result()
            elif use_pool:
                # per-reader heaps merged after: identical results (segments
                # hold disjoint docs)
                local_heaps = [[] for _ in range(n_r)]
                futs = [
                    self._pool.submit(self._score_readers, ri, ri + 1, q, local_heaps[ri])
                    for ri in range(n_r)
                ]
                for f in futs:
                    f.result()
                for h in local_heaps:
                    for s, negd in h:
                        _heap_push(heap, q["k"], s, -negd)
            else:
                self._score_readers(0, n_r, q, heap)
            out.append([(s, -negd) for s, negd in sorted(heap, reverse=True)])
        return out

    # ------------------------------------------------- query_string evaluator
    # (index/querystring.py builds the compiled trees on the driver; one
    # scatter ships them here, so an arbitrarily nested boolean costs the
    # same RPC rounds as a flat search)

    def _qs_eval(
        self, node: dict, avgdl: float, k1: float, b: float
    ) -> tuple[np.ndarray, np.ndarray]:
        """Evaluate one compiled query_string node against this WHOLE actor →
        (doc_ids sorted asc, scores). Leaf kinds gather per reader and merge
        (docs are disjoint across readers, so a concat+argsort is a true
        sorted union); set algebra then runs once at the actor level — which
        is what lets range leaves use the actor-wide doc-values directly.
        Scores follow the Lucene sum-of-matching-clauses rule with children
        accumulated in written order (leaf groups ascending-term, the
        repo-wide bit-exactness rule)."""
        from .tombstones import in_sorted

        empty = (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64))

        def merged(parts):
            # parts: per-reader (ids, scores) over DISJOINT docs → sorted asc
            if not parts:
                return empty
            if len(parts) == 1:
                return parts[0]
            ids = np.concatenate([p[0] for p in parts])
            sc = np.concatenate([p[1] for p in parts])
            order = np.argsort(ids)
            return ids[order], sc[order]

        kind = node["kind"]
        if kind == "none":
            return empty
        boost = node.get("boost", 1.0)
        if kind == "range":
            dv = getattr(self, "_doc_values", {}).get(node["field"])
            if dv is None:
                raise KeyError(f"doc-values for '{node['field']}' not loaded")
            dv_ids, vals = dv  # sorted by id, dead-excluded at load
            keep = np.ones(len(dv_ids), dtype=bool)
            if node["lo"] is None and node["hi"] is None:
                # `_exists_:field` — bounded ranges exclude nulls implicitly
                # (NaN/None fail every comparison); the unbounded form must
                # drop them explicitly
                import pandas as pd

                keep &= np.asarray(pd.notna(vals))
            if node["lo"] is not None:
                keep &= (vals >= node["lo"]) if node["lo_incl"] else (vals > node["lo"])
            if node["hi"] is not None:
                keep &= (vals <= node["hi"]) if node["hi_incl"] else (vals < node["hi"])
            ids = dv_ids[keep]
            # Lucene constant-score rewrite: every matching doc scores 1·boost
            return ids, np.full(len(ids), float(boost), dtype=np.float64)
        if kind == "term":
            parts = []
            for ri in range(len(self.readers)):
                arrs = self._decoded(ri, node["term"])
                if arrs is None:
                    continue
                ids, tfs, dls = arrs
                scores = bm25.contribution(node["idf"], tfs, dls, avgdl, k1, b)
                dd = self.dead[ri]
                if dd is not None:
                    alive = ~in_sorted(ids, dd)
                    ids, scores = ids[alive], scores[alive]
                if len(ids):
                    parts.append((ids, scores))
            ids, scores = merged(parts)
            return ids, (scores * boost if boost != 1.0 else scores)
        if kind == "group":
            msm = max(1, int(node.get("msm", 1)))
            parts = []  # per-reader (union, scores, hits)
            for ri in range(len(self.readers)):
                per = []
                for t in node["terms"]:  # pre-sorted ascending by the compiler
                    arrs = self._decoded(ri, t)
                    if arrs is not None:
                        per.append((t, *arrs))
                if len(per) < msm:
                    continue
                union = np.unique(np.concatenate([ids for _, ids, _, _ in per]))
                scores = np.zeros(len(union), dtype=np.float64)
                hits = np.zeros(len(union), dtype=np.int32)
                for t, ids, tfs, dls in per:
                    pos = np.searchsorted(union, ids)
                    scores[pos] += bm25.contribution(node["idfs"][t], tfs, dls, avgdl, k1, b)
                    hits[pos] += 1
                dd = self.dead[ri]
                if dd is not None:
                    alive = ~in_sorted(union, dd)
                    union, scores, hits = union[alive], scores[alive], hits[alive]
                if msm > 1:
                    m = hits >= msm
                    union, scores = union[m], scores[m]
                if len(union):
                    parts.append((union, scores))
            union, scores = merged(parts)
            return union, (scores * boost if boost != 1.0 else scores)
        if kind == "phrase":
            heap: list = []
            _score_phrase(
                self.readers, node["phrase"], node["idfs"], avgdl,
                1 << 60, heap, k1=k1, b=b, get_decoded=self._decoded,
                reader_offset=0, get_dead=lambda i: self.dead[i],
                slop=int(node.get("slop", 0)),
            )
            if not heap:
                return empty
            ids = np.array([-negd for _, negd in heap], dtype=np.uint64)
            scores = np.array([s for s, _ in heap], dtype=np.float64)
            order = np.argsort(ids)
            scores = scores[order]
            return ids[order], (scores * boost if boost != 1.0 else scores)
        if kind == "dismax":
            # Lucene DisjunctionMaxQuery: union of children, score = best
            # child + tie_breaker · (sum of the others). Children accumulate
            # into the union in WRITTEN order (elementwise, so the float
            # pairing is the SQL left-assoc sum).
            parts = [self._qs_eval(c, avgdl, k1, b) for c in node["children"]]
            live = [p for p in parts if len(p[0])]
            if not live:
                return empty
            union = np.unique(np.concatenate([p[0] for p in live]))
            total = np.zeros(len(union), dtype=np.float64)
            mx = np.zeros(len(union), dtype=np.float64)
            for ids, sc in parts:
                cur = np.zeros(len(union), dtype=np.float64)
                if len(ids):
                    cur[np.searchsorted(union, ids)] = sc
                total += cur
                np.maximum(mx, cur, out=mx)
            tie = float(node.get("tie", 0.0))
            scores = mx + tie * (total - mx)
            boost = node.get("boost", 1.0)
            return union, (scores * boost if boost != 1.0 else scores)
        if kind == "boosting":
            # ES boosting query: positive matches keep their score; those
            # ALSO matching the negative clause are demoted by
            # negative_boost (multiplied, not excluded — unlike must_not)
            ids_p, sc_p = self._qs_eval(node["positive"], avgdl, k1, b)
            if len(ids_p) == 0:
                return empty
            ids_n, _ = self._qs_eval(node["negative"], avgdl, k1, b)
            if len(ids_n):
                m = in_sorted(ids_p, ids_n)
                if m.any():
                    sc_p = sc_p.copy()
                    sc_p[m] *= float(node["negative_boost"])
            return ids_p, sc_p
        # bool
        must = [self._qs_eval(c, avgdl, k1, b) for c in node["must"]]
        should = [self._qs_eval(c, avgdl, k1, b) for c in node["should"]]
        if node["must"]:
            base = must[0][0]
            for ids, _ in must[1:]:
                base = np.intersect1d(base, ids, assume_unique=True)
        else:
            msm = max(1, int(node.get("msm", 1)))
            if not should:
                return empty
            union = np.unique(np.concatenate([ids for ids, _ in should]))
            hits = np.zeros(len(union), dtype=np.int32)
            for ids, _ in should:
                hits[np.searchsorted(union, ids)] += 1
            base = union[hits >= msm]
        if len(base) == 0:
            return empty
        # explicit minimum_should_match alongside must clauses (ES: with must
        # present msm defaults to 0 — should is score-only — unless set)
        if node["must"] and should and node.get("msm_explicit"):
            msm = max(1, int(node.get("msm", 1)))
            sh_hits = np.zeros(len(base), dtype=np.int32)
            for ids, _ in should:
                if len(ids):
                    sh_hits += in_sorted(base, ids)
            base = base[sh_hits >= msm]
            if len(base) == 0:
                return empty
        for c in node["must_not"]:
            ids_mn, _ = self._qs_eval(c, avgdl, k1, b)
            if len(ids_mn):
                base = base[~in_sorted(base, ids_mn)]
                if len(base) == 0:
                    return empty
        scores = np.zeros(len(base), dtype=np.float64)
        for ids, sc in must + should:
            if len(ids) == 0:
                continue
            m = in_sorted(ids, base)
            if m.any():
                scores[np.searchsorted(base, ids[m])] += sc[m]
        boost = node.get("boost", 1.0)
        return base, (scores * boost if boost != 1.0 else scores)

    def query_string_batch(
        self, trees: list[dict], k: int, avgdl: float, k1: float, b: float,
        after: tuple[float, int] | None = None,
    ) -> list[list[tuple[float, int]]]:
        """Per compiled tree: this shard's matches as (score, doc_id) —
        top-k when k > 0, ALL matches when k <= 0 (the match-set/count
        shape, e.g. the SQL-oracle entry). ``after``: search_after cursor —
        keep only matches strictly after (score desc, doc_id asc)."""
        out = []
        for tree in trees:
            ids, sc = self._qs_eval(tree, avgdl, k1, b)
            if after is not None and len(ids):
                cs, cd = float(after[0]), np.uint64(int(after[1]))
                m = (sc < cs) | ((sc == cs) & (ids > cd))
                ids, sc = ids[m], sc[m]
            if len(ids) == 0:
                out.append([])
                continue
            if k > 0:
                top = bm25.topk_indices(sc, ids, k)
                out.append([(float(sc[i]), int(ids[i])) for i in top])
            else:
                out.append([(float(s), int(d)) for s, d in zip(sc, ids)])
        return out



def _qs_positive_terms(node: dict) -> set[str]:
    """Every term a compiled query_string tree can SCORE with (must/should
    branches; must_not and range/_exists_ leaves excluded) — the highlight
    term set."""
    kind = node["kind"]
    if kind == "term":
        return {node["term"]}
    if kind == "group":
        return set(node["terms"])
    if kind == "phrase":
        return set(node["phrase"])
    if kind == "bool":
        out: set[str] = set()
        for c in node["must"] + node["should"]:
            out |= _qs_positive_terms(c)
        return out
    return set()  # none / range


class QueryEngine:
    """Driver-side facade. Spawns the shard actor pool lazily on first use and
    reuses it across queries (mmap'd postings stay warm). Never calls
    ray.init (driver contract)."""

    # preload the full df dictionary when the vocabulary is small enough to
    # hold on the driver — removes the df scatter round from every cold query
    # (at 10^12-doc vocab sizes the 2-round path below remains the fallback)
    DF_PRELOAD_MAX_TERMS = 2_000_000

    def __init__(
        self, index_dir: str, *, actor_num_cpus: float | None = None, df_preload: str = "auto"
    ):
        # actors are memory-resident posting servers, mostly idle between
        # scatter calls: a small CPU reservation lets one engine per shard
        # coexist with other stages. The reservation adapts to the cluster —
        # a fixed value deadlocks actor creation whenever
        # num_segments × num_cpus exceeds the CPUs available (e.g. 32 shards
        # × 0.25 CPU on a 4-CPU cluster).
        self.man = Manifest.load(index_dir)
        total = float(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4.0
        if actor_num_cpus is None:
            n_shards = max(self.man.config.num_segments, 1)
            actor_num_cpus = max(0.01, min(0.25, (total * 0.5) / n_shards))
        self.analyzer = get_analyzer(self.man.config.analyzer)
        # upsert tombstones (index/tombstones.py): doc versions superseded by
        # a later run's re-import. {} for single-run / merged indexes (the
        # common state — merge purges them physically).
        from .tombstones import find_superseded

        self._tomb = find_superseded(self.man)
        n_dead = sum(t["n_nonempty"] for t in self._tomb.values())
        dl_dead = sum(t["sum_dl"] for t in self._tomb.values())
        self.N = self.man.n_docs - n_dead
        self.sum_dl = self.man.sum_dl - dl_dead  # exact int (multi-index math)
        self.avgdl = (self.sum_dl / self.N) if self.N else 0.0
        # honor configured BM25 parameters (the manifest records them; scoring
        # must not silently fall back to the module constants)
        self.k1 = float(self.man.config.k1)
        self.b = float(self.man.config.b)
        self._actors = []
        self._df_cache: dict[str, int] = {}
        remote = ray.remote(num_cpus=actor_num_cpus)(QueryShard)
        # group segments onto at most ~CPU actors: a 2-round scatter over 32
        # single-segment actors is RPC-bound at small k; docs are disjoint
        # across segments, so one actor can serve several shards exactly
        from .tombstones import dead_for_segment

        S = self.man.config.num_segments
        shard_dirs = [self.man.segment_dirs(s) for s in range(S)]
        shard_dirs = [d for d in shard_dirs if d]
        n_actors = max(1, min(len(shard_dirs), int(total)))
        # capacity-aware decoded-postings budget: enough to hold the actor's
        # whole share of the index when that is feasible (Zipf query traffic
        # touches a working set ∝ the hot vocabulary; a fixed small budget
        # thrashes — measured at 2.4M docs: every query re-decoded, p50 ~1 s),
        # capped at 16M postings (~384 MB) per actor
        total_postings = sum(
            s.get("n_postings", 0)
            for r in self.man.complete_runs().values()
            for s in r["segments"]
        )
        budget = max(4_000_000, min(16_000_000, -(-total_postings // n_actors)))
        groups: list[list[str]] = [[] for _ in range(n_actors)]
        for i, dirs in enumerate(shard_dirs):
            groups[i % n_actors].extend(dirs)
        for g in groups:
            if g:
                dead = (
                    [dead_for_segment(self._tomb, d, S) for d in g] if self._tomb else None
                )
                self._actors.append(remote.remote(g, budget, dead))
        self._df_complete = False
        if df_preload == "always" or (df_preload == "auto" and self._actors):
            est_terms = sum(
                s.get("n_terms", 0)
                for r in self.man.complete_runs().values()
                for s in r["segments"]
            )
            if df_preload == "always" or est_terms <= self.DF_PRELOAD_MAX_TERMS:
                per = ray.get([a.all_dfs.remote() for a in self._actors])
                for terms_a, dfs_a in per:
                    for t, d in zip(terms_a, dfs_a.tolist()):
                        self._df_cache[t] = self._df_cache.get(t, 0) + d
                self._df_complete = True
        # fire-and-forget hot-term warmup (after the synchronous df preload so
        # init does not queue behind it): each actor pre-decodes its top-df
        # terms; the actor mailbox runs it before the first query, converting
        # the cold-query tail (first decode of the hottest postings) into
        # engine-setup-overlapped work
        for a in self._actors:
            a.warm_hot_terms.remote()

    def analyze(self, text: str) -> list[str]:
        return sorted(set(self.analyzer.analyze_query(text)))

    def global_dfs(self, terms: list[str]) -> np.ndarray:
        """Global df per term (sum over shards), cached on the driver —
        repeat terms skip the scatter round (the df of a term in an immutable
        index only changes when a new run commits; a new QueryEngine is made
        after builds, so the cache cannot go stale within one engine)."""
        if not terms:
            return np.empty(0, dtype=np.int64)
        if self._df_complete:
            return np.array([self._df_cache.get(t, 0) for t in terms], dtype=np.int64)
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            per = ray.get([a.dfs.remote(missing) for a in self._actors])
            for t, v in zip(missing, np.sum(np.array(per, dtype=np.int64), axis=0)):
                self._df_cache[t] = int(v)
        return np.array([self._df_cache[t] for t in terms], dtype=np.int64)

    def search(
        self, text: str, k: int = 10, mode: str = "or", method: str = "auto", slop: int = 0
    ):
        return self.search_many([{"text": text, "mode": mode, "slop": slop}], k=k, method=method)[0]

    # below this many candidate postings per shard, the vectorized exhaustive
    # scorer beats the Python-loop WAND traversal (both are rank-identical)
    AUTO_EXHAUSTIVE_PER_SHARD = 200_000

    def search_many(
        self, queries: list[dict], k: int = 10, method: str = "auto"
    ) -> list[list[tuple[int, float]]]:
        """Batch API: 2 RPC rounds total for any number of queries.

        method="auto" picks per query: exhaustive when the per-shard posting
        volume (Σdf / shards) is small — numpy decode+accumulate wins there —
        and block-max WAND when postings are large enough that skipping pays.
        Both scorers are oracle-identical, so this is purely a latency choice.
        """
        all_terms = sorted(
            {t for q in queries for t in (q.get("terms_override") or self.analyze(q["text"]))}
        )
        dfs = self.global_dfs(all_terms)
        df_map = dict(zip(all_terms, dfs.tolist()))
        prepared = []
        for q in queries:
            terms_all = q.get("terms_override") or self.analyze(q["text"])
            terms = [t for t in terms_all if df_map.get(t, 0) > 0]
            mode = q.get("mode", "or")
            phrase: list[str] = []
            if mode == "phrase":
                if not self.man.config.positions:
                    raise ValueError(
                        "phrase queries need a positional index "
                        "(IndexConfig(positions=True))"
                    )
                # ordered tokens WITH duplicates — adjacency is positional
                phrase = q.get("phrase_override") or self.analyzer.analyze_query(q["text"])
                if any(df_map.get(t, 0) == 0 for t in phrase):
                    terms = []  # a never-seen token can match no phrase
            if mode == "span":
                if not self.man.config.positions:
                    raise ValueError(
                        "span queries need a positional index "
                        "(IndexConfig(positions=True))"
                    )
                if any(df_map.get(t, 0) == 0 for t in q["span"]["clauses"]):
                    terms = []  # every clause term must exist somewhere
            if mode == "and" and len(terms) < len(terms_all):
                terms = []  # AND with unknown term matches nothing
            idfs = {t: float(bm25.idf(self.N, df_map[t])) for t in terms}
            q_method = method
            if method == "auto":
                per_shard = sum(df_map[t] for t in terms) / max(len(self._actors), 1)
                # block-max WAND only pays when skipping is possible: DENSE
                # posting lists (df/N high) make every block's upper bound
                # beat θ, so the DAAT loop visits ~every doc in Python
                # (measured at 2.4M docs with df/N≈0.95 terms: seconds/query
                # vs ~30 ms exhaustive). Dense or small → exhaustive.
                max_density = max((df_map[t] / max(self.N, 1) for t in terms), default=0.0)
                q_method = (
                    "bmw"
                    if per_shard >= self.AUTO_EXHAUSTIVE_PER_SHARD and max_density < 0.10
                    else "exhaustive"
                )
            # ES bool must_not: q["exclude"] text analyzes with the same
            # analyzer; docs containing ANY excluded term are dropped
            exclude_terms = self.analyze(q["exclude"]) if q.get("exclude") else []
            prepared.append(
                {"terms": terms, "idfs": idfs, "avgdl": self.avgdl, "k": k,
                 "mode": mode, "method": q_method, "k1": self.k1, "b": self.b,
                 "phrase": phrase, "exclude_terms": exclude_terms,
                 # clamp keeps the composite-key window (ci<<32 | pos+slop)
                 # inside one candidate's range; 2^20 ≫ any meaningful slop
                 "slop": max(0, min(int(q.get("slop", 0)), 1 << 20)),
                 "filters": q.get("filters"), "after": q.get("after"),
                 "allowed_ids": q.get("allowed_ids"),
                 "must_terms": q.get("must_terms"),
                 "span": q.get("span"),
                 "min_should_match": q.get("min_should_match")}
            )
        shard_results = ray.get([a.search_batch.remote(prepared) for a in self._actors])
        out = []
        for qi in range(len(queries)):
            cand: list[tuple[float, int]] = []
            for sr in shard_results:
                cand.extend(sr[qi])
            if not cand:
                out.append([])
                continue
            scores = np.array([c[0] for c in cand], dtype=np.float64)
            docs = np.array([c[1] for c in cand], dtype=np.uint64)
            top = bm25.topk_indices(scores, docs, k)
            out.append([(int(docs[i]), float(scores[i])) for i in top])
        return out

    def terms_set_search(
        self, text: str, msm_field: str, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES terms_set query: a doc matches when the number of query terms
        it contains is ≥ its OWN value of ``msm_field`` (ES's
        minimum_should_match_field — per-doc, unlike the query-level msm).
        Scored by the ascending-term BM25 sum over the matched terms; terms
        absent from the index simply never count (ES behavior)."""
        terms_all = sorted(set(self.analyzer.analyze_query(text)))
        if not terms_all:
            return []
        dfs = self.global_dfs(terms_all)
        terms = [t for t, df in zip(terms_all, dfs.tolist()) if df > 0]
        if not terms:
            return []
        idfs = {t: float(bm25.idf(self.N, df))
                for t, df in zip(terms_all, dfs.tolist()) if df > 0}
        self._ensure_doc_values([msm_field])
        per = ray.get(
            [
                a.terms_set_topk.remote(
                    terms, idfs, self.avgdl, msm_field, k, self.k1, self.b
                )
                for a in self._actors
            ]
        )
        cand = [c for p in per for c in p]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        top = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in top]

    def span_near_search(
        self,
        text: str,
        *,
        slop: int = 0,
        in_order: bool = True,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES span_near over single-term clause spans: the analyzed tokens of
        ``text`` (duplicates kept, order kept) must co-occur within a window
        of width (span - n) <= slop — strictly increasing positions when
        ``in_order``, any arrangement otherwise (distinct clause terms
        required for unordered: Lucene's overlapping-span rules for repeated
        terms are out of scope and raise). Ranked by BM25 over the unique
        clause terms (documented simplification vs Lucene sloppyFreq)."""
        clauses = self.analyzer.analyze_query(text)
        if not clauses:
            return []
        if not in_order and len(set(clauses)) != len(clauses):
            raise ValueError(
                "unordered span_near with repeated clause terms is not supported"
            )
        return self.search_many(
            [{
                "text": " ".join(clauses), "mode": "span",
                "span": {"kind": "near", "clauses": clauses,
                         "slop": max(0, int(slop)), "in_order": bool(in_order)},
            }],
            k=k,
        )[0]

    def span_first_search(
        self, text: str, end: int, *, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES span_first: the (single) analyzed term must occur with its span
        ending by ``end`` — 0-based position < end. Ranked by the term's
        BM25 (every occurrence counts toward tf exactly as a term query)."""
        clauses = self.analyzer.analyze_query(text)
        if len(clauses) != 1:
            raise ValueError(f"span_first takes exactly one term, got {clauses!r}")
        if end <= 0:
            return []
        return self.search_many(
            [{
                "text": clauses[0], "mode": "span",
                "span": {"kind": "first", "clauses": clauses, "end": int(end)},
            }],
            k=k,
        )[0]

    def search_prefix(
        self, text: str, k: int = 10, max_expansions: int = 50
    ) -> list[tuple[int, float]]:
        """ES prefix-query / autocomplete shape: the LAST analyzed token of
        ``text`` is a prefix, expanded to the first ``max_expansions``
        dictionary terms (lexicographic, globally consistent: each shard
        returns its first ``max_expansions`` matches, so the capped union
        contains the global first ``max_expansions``); expanded terms then
        score as a normal OR query with their own per-term idf."""
        toks = self.analyzer.analyze_query(text)
        if not toks:
            return []
        prefix, rest = toks[-1], toks[:-1]
        per = ray.get([a.expand_prefix.remote(prefix, max_expansions) for a in self._actors])
        expanded = sorted(set().union(*map(set, per)))[:max_expansions]
        terms = sorted(set(rest) | set(expanded))
        if not terms:
            return []
        return self.search_many(
            [{"text": text, "mode": "or", "terms_override": terms}], k=k
        )[0]

    def match_bool_prefix(
        self, text: str, k: int = 10, *, operator: str = "or", max_expansions: int = 50
    ) -> list[tuple[int, float]]:
        """ES match_bool_prefix: every analyzed token is a bool clause, the
        LAST one as a prefix query. ``operator="or"`` = any clause may match
        (ES's default bool should); ``operator="and"`` = every whole-term
        clause must match AND the prefix must match (≥1 dictionary
        expansion present — waived when an expansion IS one of the must
        terms, which already guarantees it). Expansion is the shared
        capped-union contract (global first ``max_expansions`` dictionary
        terms); scoring is BM25 over the doc's matched terms in
        ascending-term order, the repo-wide convention for expanded
        queries."""
        toks = self.analyzer.analyze_query(text)
        if not toks:
            return []
        prefix, rest = toks[-1], toks[:-1]
        per = ray.get(
            [a.expand_prefix.remote(prefix, max_expansions) for a in self._actors]
        )
        expanded = sorted(set().union(*map(set, per)))[:max_expansions]
        if operator == "and":
            if not expanded:
                return []  # the prefix clause is a must; nothing expands
            if not rest:
                return self.search_many(
                    [{"text": text, "mode": "or", "terms_override": expanded}], k=k
                )[0]
            terms = sorted(set(rest) | set(expanded))
            msm = None if set(expanded) & set(rest) else 1
            return self.search_many(
                [{
                    "text": text, "mode": "or", "terms_override": terms,
                    "must_terms": sorted(set(rest)), "min_should_match": msm,
                }],
                k=k,
            )[0]
        terms = sorted(set(rest) | set(expanded))
        if not terms:
            return []
        return self.search_many(
            [{"text": text, "mode": "or", "terms_override": terms}], k=k
        )[0]

    def search_phrase_prefix(
        self, text: str, k: int = 10, *, max_expansions: int = 50, slop: int = 0
    ) -> list[tuple[int, float]]:
        """ES match_phrase_prefix (search-as-you-type): the LAST token is a
        prefix, expanded to the first ``max_expansions`` dictionary terms
        (lexicographic, globally consistent — same contract as
        search_prefix); the doc's score is the BEST completing expansion's
        phrase score. All expansions ride ONE batched scatter (2 RPC rounds),
        and each expansion scores as an ordinary (sloppy) phrase."""
        toks = self.analyzer.analyze_query(text)
        if not toks:
            return []
        prefix, base = toks[-1], toks[:-1]
        per = ray.get(
            [a.expand_prefix.remote(prefix, max_expansions) for a in self._actors]
        )
        expansions = sorted(set().union(*map(set, per)))[:max_expansions]
        if not expansions:
            return []
        phrases = [base + [e] for e in expansions]
        results = self.search_many(
            [
                {"text": " ".join(p), "mode": "phrase", "phrase_override": p,
                 "terms_override": sorted(set(p)), "slop": slop}
                for p in phrases
            ],
            k=k,
        )
        best: dict[int, float] = {}
        for res in results:
            for d, s in res:
                if s > best.get(d, float("-inf")):
                    best[d] = s
        top = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(int(d), float(s)) for d, s in top]

    def highlight(self, text: str, doc_ids: list[int]) -> dict[int, dict[str, list[int]]]:
        """ES-style highlight positions: for each requested doc, the analyzed
        query terms' token indices within that doc (from the positional
        sidecar — no corpus re-read, no re-tokenize). One scatter round; each
        shard touches only its own docs' postings. The caller slices snippets
        from its own copy of the text using the SAME analyzer's token stream.
        Requires IndexConfig(positions=True)."""
        if not self.man.config.positions:
            raise ValueError("highlight needs a positional index (IndexConfig(positions=True))")
        terms = self.analyze(text)
        if not terms or not doc_ids:
            return {}
        per = ray.get([a.matched_positions.remote(terms, list(doc_ids)) for a in self._actors])
        out: dict[int, dict[str, list[int]]] = {}
        for shard in per:
            for d, t, ps in shard:
                out.setdefault(d, {})[t] = ps
        return out

    def _stored_texts(self, doc_ids: list[int]) -> dict[int, str]:
        """doc_id → stored source text (requires store_cols at build time)."""
        content = self.man.config.content_col
        rows = self.resolve(list(doc_ids))
        if len(rows) and content not in rows.columns:
            raise ValueError(
                f"fragment highlighting needs store_cols=({content!r},) at "
                "build time (ES: _source must be enabled)"
            )
        return {
            int(d): str(t)
            for d, t in zip(rows["doc_id"], rows[content])
            if t is not None
        }

    def termvectors(
        self, doc_ids: list[int], *, with_stats: bool = True
    ) -> dict[int, list[dict]]:
        """ES _termvectors / _mtermvectors: per requested doc, its analyzed
        (term, tf, positions[, df]) rows — re-analyzed from the stored
        source with the INDEX analyzer, so the stream is exactly what the
        index saw (ES re-analyzes _source the same way). df (term_statistics)
        is resolved index-wide in ONE global_dfs round over the union of the
        docs' terms. Rows per doc sorted by term."""
        texts = self._stored_texts(doc_ids)
        per_doc: dict[int, dict[str, dict]] = {}
        all_terms: set[str] = set()
        for d, t in texts.items():
            toks = [x for x in self.analyzer.analyze_query(t) if x]
            tv: dict[str, dict] = {}
            for pos, tok in enumerate(toks):
                e = tv.setdefault(tok, {"tf": 0, "positions": []})
                e["tf"] += 1
                e["positions"].append(pos)
            per_doc[d] = tv
            all_terms.update(tv)
        dfs: dict[str, int] = {}
        if with_stats and all_terms:
            uniq = sorted(all_terms)
            dfs = dict(zip(uniq, self.global_dfs(uniq).tolist()))
        out: dict[int, list[dict]] = {}
        for d in doc_ids:
            tv = per_doc.get(int(d))
            if tv is None:
                out[int(d)] = []
                continue
            rows = []
            for term in sorted(tv):
                r = {"term": term, **tv[term]}
                if with_stats:
                    r["df"] = int(dfs.get(term, 0))
                rows.append(r)
            out[int(d)] = rows
        return out

    def highlight_fragments(
        self,
        text: str,
        doc_ids: list[int],
        *,
        fragment_size: int = 100,
        number_of_fragments: int = 5,
        pre_tag: str = "<em>",
        post_tag: str = "</em>",
    ) -> dict[int, list[str]]:
        """ES plain-highlighter: marked-up text fragments per hit doc.

        Unlike ``highlight`` (positional-sidecar token indices), this
        re-analyzes each hit's STORED text with character offsets
        (index/highlight.py) and returns ``pre_tag``matched``post_tag``
        fragments of ~``fragment_size`` chars — the ES response shape.
        Needs ``store_cols=(content_col,)`` but NOT a positional index
        (exactly ES: the plain highlighter works on any stored field).
        Bounded work: only the requested hit docs are touched."""
        from .highlight import highlight_text

        terms = set(self.analyze(text))
        if not terms or not doc_ids:
            return {}
        texts = self._stored_texts(doc_ids)
        return {
            d: frags
            for d, t in texts.items()
            if (
                frags := highlight_text(
                    t, terms, self.analyzer,
                    fragment_size=fragment_size,
                    number_of_fragments=number_of_fragments,
                    pre_tag=pre_tag, post_tag=post_tag,
                )
            )
        }

    def query_string_highlight_fragments(
        self,
        q: str,
        *,
        k: int = 10,
        default_operator: str = "or",
        max_expansions: int = 50,
        minimum_should_match: int | None = None,
        fragment_size: int = 100,
        number_of_fragments: int = 5,
        pre_tag: str = "<em>",
        post_tag: str = "</em>",
    ) -> list[tuple[int, float, list[str]]]:
        """query_string top-k with ES-style marked-up fragments per hit
        (the POSITIVE terms of the compiled query, expansions included —
        what the user's match actually was)."""
        from .highlight import highlight_text

        hits = self.query_string(
            q, k=k, default_operator=default_operator,
            max_expansions=max_expansions,
            minimum_should_match=minimum_should_match,
        )
        if not hits:
            return []
        compiled = self._compile_query_string(q, default_operator, max_expansions)
        terms = set(_qs_positive_terms(compiled))
        if not terms:
            return [(d, s, []) for d, s in hits]
        texts = self._stored_texts([d for d, _ in hits])
        return [
            (
                d,
                s,
                highlight_text(
                    texts[d], terms, self.analyzer,
                    fragment_size=fragment_size,
                    number_of_fragments=number_of_fragments,
                    pre_tag=pre_tag, post_tag=post_tag,
                )
                if d in texts
                else [],
            )
            for d, s in hits
        ]

    def resolve(self, doc_ids: list[int]):
        """doc_id → identity columns (repo/path/commit/…, sha256, doc_len)
        from the build's docmap — how a top-k result becomes user-facing rows.
        Streams the docmap with a broadcast membership mask; only the matched
        rows are materialized. Superseded versions are excluded, so an
        upserted doc resolves to its LATEST identity row only."""
        import pyarrow.compute as pc

        from .tombstones import docmap_dataset

        wanted = pa.array(np.array(sorted(set(int(d) for d in doc_ids)), dtype=np.uint64))

        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(pc.cast(t["doc_id"], pa.uint64()), value_set=wanted))

        return (
            docmap_dataset(self.man, self._tomb)
            .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
        )

    def search_wildcard(self, pattern: str, k: int = 10, max_expansions: int = 50):
        """ES wildcard-query shape: ``*`` matches any run, ``?`` one char.
        The pattern is matched against the term dictionary per shard (range-
        narrowed by the literal prefix), the capped expansion union scores as
        a normal OR query with per-term idf (same blending as search_prefix)."""
        pattern = pattern.lower()
        per = ray.get(
            [a.expand_wildcard.remote(pattern, max_expansions) for a in self._actors]
        )
        expanded = sorted(set().union(*map(set, per)))[:max_expansions]
        if not expanded:
            return []
        return self.search_many(
            [{"text": pattern, "mode": "or", "terms_override": expanded}], k=k
        )[0]

    def search_regexp(self, pattern: str, k: int = 10, max_expansions: int = 50):
        """ES regexp-query shape: the pattern must match WHOLE dictionary
        terms (anchored); the capped expansion union scores as a normal OR
        query with per-term idf (same blending as wildcard/prefix/fuzzy)."""
        # Driver-side probe with the EXECUTING engine (Arrow RE2, not Python
        # re): RE2 rejects lookarounds/backrefs that re accepts, and the
        # mismatch would otherwise surface inside shard actors as an opaque
        # RayTaskError instead of this clean ValueError.
        try:
            pc.match_substring_regex(
                pa.array([""], type=pa.string()), pattern="^(?:" + pattern + ")$"
            )
        except pa.lib.ArrowInvalid as e:
            raise ValueError(f"bad regexp: {e}") from None
        per = ray.get(
            [a.expand_regexp.remote(pattern.lower(), max_expansions) for a in self._actors]
        )
        expanded = sorted(set().union(*map(set, per)))[:max_expansions]
        if not expanded:
            return []
        return self.search_many(
            [{"text": pattern, "mode": "or", "terms_override": expanded}], k=k
        )[0]

    def more_like_this(
        self,
        like: str | int,
        k: int = 10,
        *,
        unlike: str | None = None,
        max_query_terms: int = 25,
        min_term_freq: int = 1,
        min_doc_freq: int = 1,
        minimum_should_match: str | int = "30%",
        method: str = "auto",
    ) -> list[tuple[int, float]]:
        """ES more_like_this: find docs similar to ``like`` (a text, or a
        doc_id when the index stored its content column as doc-values via
        ``IndexConfig(store_cols=(content_col, ...))``).

        The ES algorithm shape: analyze the like-text, keep terms with
        tf >= min_term_freq and global df >= min_doc_freq, rank them by
        tf·idf "interestingness", take the top max_query_terms, and run them
        as an OR query with minimum_should_match (default "30%" like ES).
        When ``like`` is a doc_id the source doc is excluded from results."""
        exclude_id: int | None = None
        if isinstance(like, int):
            exclude_id = int(like)
            content = self.man.config.content_col
            row = self.resolve([like])
            if len(row) == 0:
                return []
            if content not in row.columns:
                raise ValueError(
                    f"more_like_this by doc_id needs store_cols=({content!r},) "
                    "at build time (ES: _source must be enabled)"
                )
            text = str(row[content].iloc[0])
        else:
            text = like
        toks = self.analyzer.analyze_query(text)
        if not toks:
            return []
        from collections import Counter

        tf = Counter(toks)
        # ES `unlike`: terms of the negative example(s) are struck from the
        # interesting-term candidate set before selection (they never make
        # the query, so they neither match nor score)
        skip = set(self.analyzer.analyze_query(unlike)) if unlike else set()
        terms = sorted(t for t, n in tf.items() if n >= min_term_freq and t not in skip)
        dfs = self.global_dfs(terms)
        cand = [
            (t, tf[t] * float(bm25.idf(self.N, df)))
            for t, df in zip(terms, dfs.tolist())
            if df >= max(min_doc_freq, 1)
        ]
        cand.sort(key=lambda ts: (-ts[1], ts[0]))
        selected = sorted(t for t, _ in cand[:max_query_terms])
        if not selected:
            return []
        if isinstance(minimum_should_match, str) and minimum_should_match.endswith("%"):
            pct = float(minimum_should_match[:-1]) / 100.0
            msm = max(1, int(len(selected) * pct))
        else:
            msm = int(minimum_should_match)
        res = self.search_many(
            [
                {
                    "text": text,
                    "mode": "or",
                    "terms_override": selected,
                    "min_should_match": msm,
                }
            ],
            k=k + (1 if exclude_id is not None else 0),
            method=method,
        )[0]
        if exclude_id is not None:
            res = [(d, s) for d, s in res if d != exclude_id][:k]
        return res

    def search_fuzzy(
        self, text: str, k: int = 10, max_edits: int | str = 1,
        max_expansions: int = 50,
    ):
        """ES fuzzy-query shape: the LAST analyzed token expands to every
        dictionary term within ``max_edits`` Levenshtein edits (vectorized DP
        per shard); expansions + the other tokens score as a normal OR query
        with per-term idf. ``max_edits="AUTO"`` applies ES's fuzziness:AUTO
        rule — 0 edits for terms shorter than 3 chars, 1 for 3..5, 2 from 6."""
        toks = self.analyzer.analyze_query(text)
        if not toks:
            return []
        fuzz, rest = toks[-1], toks[:-1]
        if isinstance(max_edits, str):
            if max_edits.upper() != "AUTO":
                raise ValueError(f"max_edits must be an int or 'AUTO', got {max_edits!r}")
            n = len(fuzz)
            max_edits = 0 if n < 3 else (1 if n < 6 else 2)
        per = ray.get(
            [a.expand_fuzzy.remote(fuzz, max_edits, max_expansions) for a in self._actors]
        )
        expanded = sorted(set().union(*map(set, per)))[:max_expansions]
        terms = sorted(set(rest) | set(expanded))
        if not terms:
            return []
        return self.search_many(
            [{"text": text, "mode": "or", "terms_override": terms}], k=k
        )[0]

    def bool_search(
        self,
        *,
        must: str = "",
        should: str = "",
        must_not: str = "",
        filters: list[dict] | None = None,
        minimum_should_match: int = 0,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """The composed ES bool query in one call: a doc must contain EVERY
        ``must`` term, at least ``minimum_should_match`` of the ``should``
        terms, none of the ``must_not`` terms, and pass the (non-scoring)
        ``filters``; its score is the BM25 sum of its matching must+should
        clauses (ES bool semantics — should clauses contribute score even
        when msm is already met). Runs as ONE prepared scatter through the
        exhaustive scorer's per-class hit counting."""
        must_terms = self.analyze(must) if must else []
        should_all = self.analyze(should) if should else []
        should_terms = [t for t in should_all if t not in set(must_terms)]
        all_terms = sorted(set(must_terms) | set(should_terms))
        if not all_terms:
            return []
        dfs = dict(zip(all_terms, self.global_dfs(all_terms).tolist()))
        if any(dfs[t] == 0 for t in must_terms):
            return []  # a required unknown term matches nothing
        live_should = [t for t in should_terms if dfs[t] > 0]
        if minimum_should_match > len(live_should):
            return []
        terms = sorted(set(must_terms) | set(live_should))
        q = {
            "text": must or should,
            "mode": "bool",
            "terms_override": terms,
            "must_terms": sorted(set(must_terms)),
            "min_should_match": minimum_should_match,
            "exclude": must_not or None,
            "filters": filters,
        }
        return self.search_many([q], k=k, method="exhaustive")[0]

    def _compile_flat(self, text: str, df_map: dict[str, int]) -> dict:
        """Analyzed OR clause → compiled term/group node (the query_string
        compiler's leaf shapes, built directly from known dfs)."""
        terms = sorted(
            t for t in set(self.analyzer.analyze_query(text)) if df_map.get(t, 0) > 0
        )
        if not terms:
            return {"kind": "none"}
        if len(terms) == 1:
            t = terms[0]
            return {"kind": "term", "term": t,
                    "idf": float(bm25.idf(self.N, df_map[t])), "boost": 1.0}
        return {"kind": "group", "terms": terms,
                "idfs": {t: float(bm25.idf(self.N, df_map[t])) for t in terms},
                "msm": 1, "boost": 1.0}

    def _eval_tree_topk(self, tree: dict, k: int) -> list[tuple[int, float]]:
        """ONE scatter of a compiled tree to every shard, heap-merged top-k
        (the query_string execution shape for directly-built trees)."""
        shard_results = ray.get(
            [a.query_string_batch.remote([tree], k, self.avgdl, self.k1, self.b, None)
             for a in self._actors]
        )
        cand = [c for sr in shard_results for c in sr[0]]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        top = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in top]

    def dis_max_search(
        self, texts: list[str], *, k: int = 10, tie_breaker: float = 0.0
    ) -> list[tuple[int, float]]:
        """ES/Lucene dis_max query (the multi_match best_fields combiner):
        each text is an OR clause; a doc matching several clauses scores
        best-clause + tie_breaker · (sum of the other clause scores) — the
        union matches, unlike bool's sum-of-all. Shard-local combination
        (the dismax node in _qs_eval), only k rows leave each shard."""
        all_terms = sorted({t for x in texts for t in self.analyzer.analyze_query(x)})
        df_map = dict(zip(all_terms, self.global_dfs(all_terms).tolist()))
        children = [self._compile_flat(x, df_map) for x in texts]
        children = [c for c in children if c["kind"] != "none"]
        if not children:
            return []
        tree = {"kind": "dismax", "tie": float(tie_breaker),
                "children": children, "boost": 1.0}
        return self._eval_tree_topk(tree, k)

    def boosting_search(
        self, positive: str, negative: str, *, negative_boost: float = 0.5, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES boosting query: positive matches rank normally, but docs ALSO
        matching the negative clause are demoted by ``negative_boost``
        (multiplied, not excluded — the soft version of must_not)."""
        if not 0.0 <= negative_boost <= 1.0:
            raise ValueError("negative_boost must be within [0, 1]")
        all_terms = sorted(
            set(self.analyzer.analyze_query(positive))
            | set(self.analyzer.analyze_query(negative))
        )
        df_map = dict(zip(all_terms, self.global_dfs(all_terms).tolist()))
        pos = self._compile_flat(positive, df_map)
        if pos["kind"] == "none":
            return []
        tree = {"kind": "boosting", "positive": pos,
                "negative": self._compile_flat(negative, df_map),
                "negative_boost": float(negative_boost)}
        return self._eval_tree_topk(tree, k)

    def _compile_query_string(
        self, q: str, default_operator: str, max_expansions: int
    ) -> dict:
        """Parse + validate + expand + embed idfs → the picklable evaluation
        tree query_string ships to the shards. Memoized per engine instance
        (the index — and therefore every df and dictionary expansion — is
        immutable for the life of an engine, the same assumption the df
        cache makes), so repeated queries and query_string_highlight's
        second use skip the expansion wave entirely."""
        ck = (q, default_operator, max_expansions)
        if not hasattr(self, "_qs_compile_cache"):
            from collections import OrderedDict

            self._qs_compile_cache: "OrderedDict[tuple, dict]" = OrderedDict()
        hit = self._qs_compile_cache.get(ck)
        if hit is not None:
            self._qs_compile_cache.move_to_end(ck)
            return hit
        from . import querystring as qs

        tree = qs.parse(q, default_operator)
        leaves = qs.collect_leaves(tree)
        field_col = self.man.config.content_col
        range_fields = sorted({lf.field_name for lf in leaves if lf.kind == "range"})
        for lf in leaves:
            if lf.kind == "range":
                continue  # range fields resolve against doc-values, below
            f = lf.field_name if lf.kind == "regexp" else qs.split_field(lf.text)[0]
            if f is not None and f != field_col:
                raise ValueError(
                    f"field {f!r} is not indexed here (single-field index over "
                    f"{field_col!r}; use index/multifield.py for multi-field)"
                )
        if range_fields:
            self._ensure_doc_values(range_fields)
        if any(lf.kind == "phrase" for lf in leaves) and not self.man.config.positions:
            raise ValueError(
                "phrase clauses need a positional index (IndexConfig(positions=True))"
            )
        # one parallel expansion wave for ALL multi-term leaves (prefix /
        # wildcard / fuzzy): fire every per-shard expand, gather once
        expansions: dict[tuple[str, str], list[str]] = {}
        waves: list[tuple[tuple[str, str], list[str], list]] = []
        for lf in leaves:
            key = (lf.kind, lf.text)
            if lf.kind not in ("prefix", "wildcard", "fuzzy", "regexp") or key in expansions:
                continue
            expansions[key] = []
            if lf.kind == "regexp":
                pat = lf.text.lower()  # Leaf.text is the bare pattern
                # probe with the executing engine (Arrow RE2) so bad syntax
                # is a clean driver-side ValueError (same rule as
                # search_regexp / expand_regexp)
                try:
                    pc.match_substring_regex(
                        pa.array([""], type=pa.string()), pattern="^(?:" + pat + ")$"
                    )
                except pa.lib.ArrowInvalid as e:
                    raise ValueError(f"invalid regexp /{lf.text}/: {e}") from None
                waves.append(
                    (key, [], [a.expand_regexp.remote(pat, max_expansions) for a in self._actors])
                )
                continue
            body = qs.split_field(lf.text)[1]
            if lf.kind == "wildcard":
                pat = body.lower()
                waves.append(
                    (key, [], [a.expand_wildcard.remote(pat, max_expansions) for a in self._actors])
                )
                continue
            toks = self.analyzer.analyze_query(body)
            if not toks:
                continue
            seed, rest = toks[-1], toks[:-1]
            if lf.kind == "prefix":
                futs = [a.expand_prefix.remote(seed, max_expansions) for a in self._actors]
            else:
                futs = [
                    a.expand_fuzzy.remote(seed, lf.edits, max_expansions) for a in self._actors
                ]
            waves.append((key, rest, futs))
        for key, rest, futs in waves:
            per = ray.get(futs)
            expanded = sorted(set().union(*map(set, per)))[:max_expansions]
            expansions[key] = sorted(set(rest) | set(expanded))
        # global dfs for every term the tree can reference, then compile
        all_terms: set[str] = set()
        for lf in leaves:
            if lf.kind == "term":
                all_terms.update(self.analyzer.analyze_query(qs.split_field(lf.text)[1]))
            elif lf.kind == "phrase":
                all_terms.update(self.analyzer.analyze_query(lf.text))
        for terms in expansions.values():
            all_terms.update(terms)
        terms_sorted = sorted(all_terms)
        dfs = dict(zip(terms_sorted, self.global_dfs(terms_sorted).tolist()))
        idf_of = lambda t: float(bm25.idf(self.N, dfs[t]))  # noqa: E731
        compiled = qs.compile_tree(
            tree, self.analyzer, dfs, idf_of, expansions, default_operator
        )
        self._qs_compile_cache[ck] = compiled
        if len(self._qs_compile_cache) > 512:
            self._qs_compile_cache.popitem(last=False)
        return compiled

    def query_string(
        self,
        q: str,
        *,
        k: int = 10,
        default_operator: str = "or",
        max_expansions: int = 50,
        minimum_should_match: int | None = None,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """ES/Lucene ``query_string`` mini-language over this index — the
        `q=`-parameter surface the reference's users query ES with (see
        index/querystring.py for the grammar: AND/OR/NOT, +/-, parentheses,
        "phrases"~slop, wild*ards, fuzzy~N, /regexp/, field:[lo TO hi],
        _exists_:field, ^boosts, \\ escapes).

        Execution: parse + analyze + expansion on the driver (one parallel
        expansion wave + the cached df round, memoized per query string),
        then the compiled tree ships to every shard in ONE scatter and is
        evaluated with sorted-array set algebra — an arbitrarily nested
        boolean costs the same RPC rounds as a flat search. Scores follow
        the Lucene sum-of-matching-clauses rule (each leaf BM25 · boost), so
        a flat OR is bit-identical to ``search(mode="or")``.

        ``k <= 0`` returns the FULL match set (count/match-set shape).
        ``after=(score, doc_id)``: ES search_after deep pagination — the
        next k strictly after the cursor in (score desc, doc_id asc)."""
        compiled = self._compile_query_string(q, default_operator, max_expansions)
        if compiled["kind"] == "none":
            return []
        if minimum_should_match is not None:
            # applied at the TOP-level bool only, the ES query_string surface
            # copy before mutating: the compiled tree is cached
            if compiled["kind"] != "bool":
                compiled = {"kind": "bool", "must": [], "should": [compiled],
                            "must_not": [], "msm": 1, "boost": 1.0}
            else:
                compiled = dict(compiled)
            compiled["msm"] = int(minimum_should_match)
            compiled["msm_explicit"] = True
        cursor = None if after is None else (float(after[0]), int(after[1]))
        shard_results = ray.get(
            [
                a.query_string_batch.remote(
                    [compiled], k, self.avgdl, self.k1, self.b, cursor
                )
                for a in self._actors
            ]
        )
        cand = [c for sr in shard_results for c in sr[0]]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        if k <= 0:
            order = np.argsort(docs)
            return [(int(docs[i]), float(scores[i])) for i in order]
        top = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in top]

    def query_string_highlight(
        self,
        q: str,
        *,
        k: int = 10,
        default_operator: str = "or",
        max_expansions: int = 50,
        minimum_should_match: int | None = None,
    ) -> list[tuple[int, float, dict[str, list[int]]]]:
        """query_string top-k + ES-style highlights: per hit, the POSITIVE
        query terms' token indices in that doc (expanded wildcard/prefix/
        fuzzy/regexp terms included — what the user's match actually was).
        One extra scatter over the k hit docs only; requires
        IndexConfig(positions=True). Range/_exists_ leaves contribute no
        highlight terms (they match values, not tokens)."""
        if not self.man.config.positions:
            raise ValueError(
                "highlight needs a positional index (IndexConfig(positions=True))"
            )
        hits = self.query_string(
            q, k=k, default_operator=default_operator,
            max_expansions=max_expansions,
            minimum_should_match=minimum_should_match,
        )
        if not hits:
            return []
        compiled = self._compile_query_string(q, default_operator, max_expansions)
        terms = sorted(_qs_positive_terms(compiled))
        if not terms:
            return [(d, s, {}) for d, s in hits]
        doc_ids = [d for d, _ in hits]
        per = ray.get(
            [a.matched_positions.remote(terms, doc_ids) for a in self._actors]
        )
        hl: dict[int, dict[str, list[int]]] = {}
        for shard in per:
            for d, t, ps in shard:
                hl.setdefault(d, {})[t] = ps
        return [(d, s, hl.get(d, {})) for d, s in hits]

    def query_string_agg(
        self,
        q: str,
        field: str | None = None,
        *,
        agg: str = "stats",
        interval: float | None = None,
        top: int = 10,
        default_operator: str = "or",
        max_expansions: int = 50,
    ):
        """ES aggregations under an arbitrary query_string match set —
        compiled once, then each shard evaluates the tree and aggregates ITS
        matches' doc-values locally (match sets never cross the network; the
        driver combines O(buckets) partials).

        ``agg``: "count" (field optional — ES _count), "stats"
        (count/sum/min/max/avg), "histogram" (needs ``interval``; → sorted
        (bucket, n)), "facets" (terms agg; top-``top`` (value, n))."""
        compiled = self._compile_query_string(q, default_operator, max_expansions)
        if compiled["kind"] == "none":
            return 0 if agg == "count" else (None if agg == "stats" else [])
        if agg == "count":
            per = ray.get(
                [a.qs_agg.remote(compiled, self.avgdl, self.k1, self.b, None)
                 for a in self._actors]
            )
            return int(sum(p for p in per if p is not None))
        if field is None:
            raise ValueError(f"agg={agg!r} needs a doc-value field")
        self._ensure_doc_values([field])
        if agg == "stats":
            per = ray.get(
                [a.qs_agg.remote(compiled, self.avgdl, self.k1, self.b, field)
                 for a in self._actors]
            )
            parts = [p for p in per if p is not None]
            if not parts:
                return None
            n = sum(p[0] for p in parts)
            sm = sum(p[1] for p in parts)
            return {
                "count": int(n), "sum": float(sm),
                "min": float(min(p[2] for p in parts)),
                "max": float(max(p[3] for p in parts)),
                "avg": float(sm / n),
            }
        if agg == "histogram":
            if interval is None:
                raise ValueError("histogram needs interval=")
            per = ray.get(
                [a.qs_agg.remote(compiled, self.avgdl, self.k1, self.b, field,
                                 float(interval))
                 for a in self._actors]
            )
            out: dict[float, int] = {}
            for p in per:
                if p is None:
                    continue
                for key, cnt in zip(*p):
                    out[key] = out.get(key, 0) + int(cnt)
            return sorted(out.items())
        if agg == "facets":
            per = ray.get(
                [a.qs_agg.remote(compiled, self.avgdl, self.k1, self.b, field,
                                 None, True)
                 for a in self._actors]
            )
            out2: dict[str, int] = {}
            for p in per:
                if p is None:
                    continue
                for v, cnt in zip(*p):
                    out2[v] = out2.get(v, 0) + int(cnt)
            return sorted(out2.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
        if agg == "percentiles":
            # exact discrete quantiles (the percentiles() combine: merged
            # per-value count histograms, value at 1-based rank ceil(p/100·n))
            ps = interval if isinstance(interval, (list, tuple)) else (25, 50, 75, 95, 99)
            per = ray.get(
                [a.qs_agg.remote(compiled, self.avgdl, self.k1, self.b, field,
                                 None, "numeric")
                 for a in self._actors]
            )
            hist: dict[float, int] = {}
            for p in per:
                if p is None:
                    continue
                for v, cnt in zip(*p):
                    hist[float(v)] = hist.get(float(v), 0) + int(cnt)
            if not hist:
                return {}
            vals = np.array(sorted(hist))
            counts = np.array([hist[v] for v in vals], dtype=np.int64)
            cum = np.cumsum(counts)
            n2 = int(cum[-1])
            return {
                float(p): float(vals[np.searchsorted(cum, max(1, int(np.ceil(p / 100.0 * n2))))])
                for p in ps
            }
        raise ValueError(f"unknown agg {agg!r} (count|stats|histogram|facets|percentiles)")

    def search_synonyms(
        self,
        text: str,
        synonyms: list[list[str]],
        k: int = 10,
        mode: str = "or",
    ) -> list[tuple[int, float]]:
        """ES query-time synonyms with Lucene SynonymQuery semantics:
        ``synonyms`` is a list of groups of raw tokens (each member passes
        through the query analyzer). A query token expands to its full group,
        and occurrences of ANY member count as ONE pseudo-term — tf summed
        BEFORE the nonlinear BM25 tf-norm, idf blended as idf(N, max member
        df) — so a rare synonym cannot inflate the score the way a plain OR
        expansion would. Tokens outside every group score normally (a
        single-member group is numerically identical to a plain term)."""
        gmap: dict[str, tuple[str, ...]] = {}
        for grp in synonyms:
            members = sorted({m for tok in grp for m in self.analyzer.analyze_query(tok)})
            if members:
                g = tuple(members)
                for m in members:
                    gmap[m] = g
        toks = self.analyze(text)
        if not toks:
            return []
        groups = sorted({gmap.get(t, (t,)) for t in toks})
        all_terms = sorted({m for g in groups for m in g})
        dfs = dict(zip(all_terms, self.global_dfs(all_terms).tolist()))
        live = [(g, max(dfs[m] for m in g)) for g in groups]
        live = [(g, d) for g, d in live if d > 0]
        if not live or (mode == "and" and len(live) < len(groups)):
            return []
        prepared = [{
            "terms": sorted({m for g, _ in live for m in g if dfs[m] > 0}),
            "idfs": {}, "avgdl": self.avgdl, "k": k, "mode": mode,
            "method": "exhaustive", "k1": self.k1, "b": self.b, "phrase": [],
            "groups": [list(g) for g, _ in live],
            "group_idfs": [float(bm25.idf(self.N, d)) for _, d in live],
        }]
        shard_results = ray.get([a.search_batch.remote(prepared) for a in self._actors])
        cand = [c for sr in shard_results for c in sr[0]]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        top = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in top]

    def rescore(
        self,
        text: str,
        rescore_text: str,
        *,
        k: int = 10,
        window: int = 50,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
        mode: str = "or",
        rescore_mode: str = "phrase",
        slop: int = 0,
        score_mode: str = "total",
    ) -> list[tuple[int, float]]:
        """ES rescore API: re-rank the top-``window`` docs of the primary
        query by combining their score with a (usually more expensive)
        rescore query evaluated over ONLY that window — here typically a
        phrase/proximity query. Docs in the window that do not match the
        rescore query keep ``query_weight``·primary (the ES rule); matching
        docs combine per ``score_mode``: total (qw·q + rw·r), multiply
        ((qw·q)·(rw·r)), avg, max, min. Two scatter rounds total: the
        primary search, then the rescore restricted via the scorers' shared
        allowed-id path (no corpus work outside the window)."""
        if score_mode not in ("total", "multiply", "avg", "max", "min"):
            raise ValueError(f"unknown score_mode: {score_mode!r}")
        primary = self.search_many([{"text": text, "mode": mode}], k=window)[0]
        if not primary:
            return []
        ids = sorted(d for d, _ in primary)
        resc = self.search_many(
            [{"text": rescore_text, "mode": rescore_mode, "slop": slop,
              "allowed_ids": ids}],
            k=len(ids),
        )[0]
        rmap = dict(resc)
        combined = []
        for d, s in primary:
            qs = query_weight * s
            if d in rmap:
                rs = rescore_weight * rmap[d]
                c = {
                    "total": qs + rs,
                    "multiply": qs * rs,
                    "avg": (qs + rs) / 2.0,
                    "max": max(qs, rs),
                    "min": min(qs, rs),
                }[score_mode]
            else:
                c = qs
            combined.append((d, c))
        combined.sort(key=lambda x: (-x[1], x[0]))
        return combined[:k]

    def suggest(
        self,
        text: str,
        *,
        max_edits: int = 2,
        top: int = 5,
        suggest_mode: str = "missing",
        max_expansions: int = 50,
    ) -> list[dict]:
        """ES term suggester (did-you-mean): per unique analyzed token,
        dictionary terms within ``max_edits`` Levenshtein edits, ranked the
        ES way — ascending edit distance, then descending document frequency,
        then term. ``suggest_mode``: 'missing' (options only for tokens
        absent from the index — the ES default), 'popular' (options must be
        more frequent than the input token), 'always'.

        One fuzzy-expansion scatter per token over the shard dictionaries
        (vectorized DP, same kernel as fuzzy queries); ranking df comes from
        the driver's cached global df map, distances recompute driver-side
        over the ≤ shards×cap candidate strings."""
        if suggest_mode not in ("missing", "popular", "always"):
            raise ValueError(f"unknown suggest_mode: {suggest_mode!r}")
        toks = []
        for t in self.analyzer.analyze_query(text):
            if t not in toks:
                toks.append(t)
        if not toks:
            return []
        tok_dfs = dict(zip(toks, self.global_dfs(toks).tolist()))
        refs = {
            t: [a.expand_fuzzy.remote(t, max_edits, max_expansions) for a in self._actors]
            for t in toks
            if not (suggest_mode == "missing" and tok_dfs[t] > 0)
        }
        out = []
        for tok in toks:
            options: list[dict] = []
            if tok in refs:
                per = ray.get(refs[tok])
                cands = sorted(set().union(*map(set, per)) - {tok})
                if cands:
                    dfs = self.global_dfs(cands)
                    dist = _levenshtein_distances(np.array(cands, dtype="U"), tok)
                    ranked = sorted(
                        (int(d), -int(f), c)
                        for c, d, f in zip(cands, dist.tolist(), dfs.tolist())
                        if f > 0 and not (suggest_mode == "popular" and f <= tok_dfs[tok])
                    )
                    options = [
                        {"text": c, "distance": d, "freq": -nf}
                        for d, nf, c in ranked[:top]
                    ]
            out.append({"token": tok, "freq": int(tok_dfs[tok]), "options": options})
        return out

    def suggest_complete(
        self, prefix: str, *, top: int = 5, max_expansions: int = 1000
    ) -> list[dict]:
        """ES completion suggester shape (search-as-you-type autocomplete):
        dictionary terms starting with ``prefix``, ranked by document
        frequency as the weight (ES ranks by stored per-suggestion weights;
        an importer that never set weights gets popularity — df — which is
        the same default the terms aggregation uses). One binary-searched
        prefix expansion per shard + the cached df round; returns up to
        ``top`` {text, weight} ranked (weight desc, text asc)."""
        seed = self.analyzer.analyze_query(prefix)
        if len(seed) != 1:
            raise ValueError("completion prefix must analyze to one token")
        per = ray.get(
            [a.expand_prefix.remote(seed[0], max_expansions) for a in self._actors]
        )
        cands = sorted(set().union(*map(set, per)))[:max_expansions]
        if not cands:
            return []
        dfs = self.global_dfs(cands)
        ranked = sorted(
            (-int(f), c) for c, f in zip(cands, dfs.tolist()) if f > 0
        )
        return [{"text": c, "weight": -nf} for nf, c in ranked[:top]]

    def suggest_phrase(
        self,
        text: str,
        *,
        max_edits: int = 1,
        per_token: int = 5,
        top: int = 5,
        backoff: float = 0.4,
        max_expansions: int = 50,
        pre_tag: str = "<em>",
        post_tag: str = "</em>",
    ) -> list[dict]:
        """ES phrase suggester (did-you-mean over WHOLE phrases): per-token
        fuzzy candidate generation (the term-suggester machinery) → candidate
        phrases as the cross product → each phrase scored by a bigram
        stupid-backoff model whose statistics come from the index itself —
        unigram df/N plus the DOC frequency of each adjacent pair measured by
        the positional phrase machinery (the analogue of ES's shingle-field
        requirement: real bigram stats, not unigram-only backoff).

            score(w_1..w_n) = ln(df(w_1)/N) + Σ_i S(w_{i-1} → w_i)
            S(a → b) = ln(bigram_docs(a,b) / df(a))   when the pair co-occurs
                     = ln(backoff · df(b) / N)        otherwise
                       (Brants et al., "Large Language Models in Machine
                       Translation" — the stupid-backoff shape)

        Costs ONE fuzzy-expansion wave for every distinct token plus ONE
        phrase-count scatter for ALL candidate bigrams (compiled phrase
        trees through query_string_batch, k=0 — shard docs are disjoint so
        counts sum). Returns up to ``top`` dicts {text, score, highlighted}
        (changed tokens wrapped in tags), ranked (score desc, text asc),
        the input token sequence itself excluded like ES."""
        import math
        from itertools import product

        if not self.man.config.positions:
            raise ValueError(
                "suggest_phrase needs a positional index "
                "(IndexConfig(positions=True)) for bigram statistics"
            )
        toks = self.analyzer.analyze_query(text)
        if len(toks) < 2:
            raise ValueError("suggest_phrase needs at least two tokens")
        uniq = sorted(set(toks))
        tok_dfs = dict(zip(uniq, self.global_dfs(uniq).tolist()))
        waves = {
            t: [a.expand_fuzzy.remote(t, max_edits, max_expansions) for a in self._actors]
            for t in uniq
        }
        cands: dict[str, list[str]] = {}
        for t in uniq:
            per = ray.get(waves[t])
            cs = sorted(set().union(*map(set, per)) | ({t} if tok_dfs[t] > 0 else set()))
            if not cs:
                cands[t] = [t]  # unscorable position — combos through it drop below
                continue
            dfs = self.global_dfs(cs)
            dist = _levenshtein_distances(np.array(cs, dtype="U"), t)
            ranked = sorted(
                (int(d), -int(f), c)
                for c, d, f in zip(cs, dist.tolist(), dfs.tolist())
                if f > 0
            )
            cands[t] = [c for _, _, c in ranked[:per_token]] or [t]
        pairs = sorted({
            (a, b)
            for i in range(len(toks) - 1)
            for a in cands[toks[i]]
            for b in cands[toks[i + 1]]
        })
        all_terms = sorted({w for p in pairs for w in p})
        dfs_all = dict(zip(all_terms, self.global_dfs(all_terms).tolist()))
        trees = [
            {"kind": "phrase", "phrase": [a, b],
             "idfs": {t: float(bm25.idf(self.N, dfs_all[t])) for t in {a, b}},
             "slop": 0, "boost": 1.0}
            for (a, b) in pairs
        ]
        counts: dict[tuple[str, str], int] = {p: 0 for p in pairs}
        if trees:
            shard = ray.get([
                a.query_string_batch.remote(trees, 0, self.avgdl, self.k1, self.b, None)
                for a in self._actors
            ])
            for sr in shard:
                for p, matches in zip(pairs, sr):
                    counts[p] += len(matches)
        out: list[tuple[float, str, tuple]] = []
        orig = tuple(toks)
        for combo in product(*(cands[t] for t in toks)):
            if combo == orig:
                continue
            if any(dfs_all.get(w, 0) <= 0 for w in combo):
                continue  # an unscorable original survived a candidate-less slot
            score = math.log(dfs_all[combo[0]] / self.N)
            for a, b in zip(combo, combo[1:]):
                big = counts.get((a, b), 0)
                if big > 0:
                    score += math.log(big / dfs_all[a])
                else:
                    score += math.log(backoff * dfs_all[b] / self.N)
            out.append((score, " ".join(combo), combo))
        out.sort(key=lambda s: (-s[0], s[1]))
        res = []
        for score, joined, combo in out[:top]:
            hl = " ".join(
                f"{pre_tag}{w}{post_tag}" if w != o else w
                for w, o in zip(combo, toks)
            )
            res.append({"text": joined, "score": score, "highlighted": hl})
        return res

    def facets(
        self, text: str, field: str, *, mode: str = "or", top: int = 10
    ) -> list[tuple[str, int]]:
        """ES terms-aggregation under a query: value counts of a stored
        field over ALL docs matching the query (not just top-k). Each shard
        counts ITS matching docs against its doc-values column (the
        cluster-scale layout: no match-ID broadcast, no per-query docmap
        streaming — only tiny (value, count) partials reach the driver)."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.agg_under_query.remote(terms, mode, field, value_counts=True)
                for a in self._actors
            ]
        )
        agg: dict[str, int] = {}
        for p in per:
            if p is None:
                continue
            for v, n in zip(*p):
                agg[v] = agg.get(v, 0) + int(n)
        out = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
        return [(v, n) for v, n in out]

    def search_sorted_by(
        self,
        text: str,
        field: str,
        k: int = 10,
        *,
        mode: str = "or",
        descending: bool = True,
        after: tuple | None = None,
    ) -> list[tuple[int, float]]:
        """ES sort-by-field: the top-k docs MATCHING the query ordered by a
        numeric doc-value instead of _score (tie → doc_id asc). Per-shard
        local top-k + driver merge — exact, only shards×k rows move.
        ``after=(field_value, doc_id)``: search_after pagination over the
        FIELD sort — pass the previous page's last row to get the next k."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms or k <= 0:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [a.top_by_field.remote(terms, mode, field, k, descending, after)
             for a in self._actors]
        )
        rows = [r for p in per for r in p]
        rows.sort(key=lambda vd: (-vd[0] if descending else vd[0], vd[1]))
        return [(d, float(v)) for v, d in rows[:k]]

    def explain(self, text: str, doc_id: int, *, mode: str = "or") -> dict:
        """ES _explain analogue: the per-term BM25 breakdown of one doc's
        score for a query — (term, tf, doc_len, idf, contribution) rows plus
        the total, computed with the SAME global idf the ranking uses, so
        total == the doc's search score bit-for-bit."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        dfs = self.global_dfs(terms)
        known = [t for t, df in zip(terms, dfs.tolist()) if df > 0]
        idfs = {t: float(bm25.idf(self.N, df)) for t, df in zip(terms, dfs.tolist()) if df > 0}
        per = ray.get(
            [
                a.explain_doc.remote(known, idfs, self.avgdl, int(doc_id), self.k1, self.b)
                for a in self._actors
            ]
        )
        rows = sorted((r for p in per for r in p))  # ascending term
        total = 0.0
        for _, _, _, _, c in rows:  # ascending-term accumulation (bit-exact)
            total += c
        return {
            "doc_id": int(doc_id),
            "terms": [
                {"term": t, "tf": tf, "doc_len": dl, "idf": idf, "contribution": c}
                for t, tf, dl, idf, c in rows
            ],
            "score": total,
            "matched": bool(rows),
        }

    def count(self, text: str, *, mode: str = "or") -> int:
        """ES _count API: number of docs matching the query (no scoring, no
        top-k) — per-shard match counts summed (docs disjoint across actors);
        tombstones already excluded by match_doc_ids."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return 0
        per = ray.get([a.match_doc_ids.remote(terms, mode) for a in self._actors])
        return int(sum(len(p) for p in per))

    def search_after(
        self,
        text: str,
        after: tuple[float, int],
        k: int = 10,
        mode: str = "or",
        method: str = "auto",
    ) -> list[tuple[int, float]]:
        """ES search_after pagination: the next k results strictly after the
        cursor ``(score, doc_id)`` in (score desc, doc_id asc) order — deep
        pagination without from+size re-scoring on the driver. Exact: page N
        equals the [Nk, (N+1)k) slice of the full ranking (pinned in tests)."""
        return self.search_many(
            [{"text": text, "mode": mode, "after": [float(after[0]), int(after[1])]}],
            k=k,
            method=method,
        )[0]

    def define_runtime_field(
        self, name: str, expr_sql: str, sources: list[str]
    ) -> None:
        """ES runtime mapping: define a query-time computed field from
        existing doc-values with one SQL expression (evaluated by DuckDB in
        each shard — the exact engine the oracles use). After this call the
        field behaves like any doc-value: filters, sorts, every aggregation,
        function_score/distance_feature/rank_feature boosts.

            eng.define_runtime_field("chars_per_weight",
                                     "n_chars::DOUBLE / weight", ["n_chars", "weight"])
        """
        if not sources:
            raise ValueError("runtime field needs at least one source field")
        self._ensure_doc_values(list(sources))
        ray.get(
            [
                a.derive_doc_value.remote(name, expr_sql, list(sources))
                for a in self._actors
            ]
        )
        self._dv_loaded.add(name)

    def _ensure_doc_values(self, fields: list[str]) -> None:
        """Load doc-values for ``fields`` into every shard actor (once per
        field per engine): each actor keeps (doc_id → value) for ITS live
        docs, so filters/aggregations become local actor work."""
        from .tombstones import _run_docmap_files

        if not hasattr(self, "_dv_loaded"):
            self._dv_loaded: set[str] = set()
        # runtime fields were derived into the shards directly — never in
        # the docmap, already resident
        missing = [f for f in fields if f not in self._dv_loaded]
        if not missing:
            return
        run_files = []
        for rid, r in self.man.complete_runs().items():
            files = _run_docmap_files(self.man, r)
            if files:
                t = self._tomb.get(rid)
                run_files.append((files, t["doc_ids"] if t else None))
        if not run_files:
            raise ValueError("doc-values need a docmap (write_docmap=True builds)")
        # validate with the engine that executes (ADVICE r2 rule): probe the
        # docmap schema on the driver so an unknown field is a clean
        # ValueError here, not an ArrowInvalid inside a shard actor
        import pyarrow.parquet as _pq

        avail = set(_pq.read_schema(run_files[0][0][0]).names)
        bad = sorted(f for f in missing if f not in avail)
        if bad:
            raise ValueError(
                f"no doc-values for {bad}; docmap fields: "
                f"{sorted(a for a in avail if not a.startswith('__'))}"
            )
        S = self.man.config.num_segments
        for f in missing:
            ray.get([a.load_doc_values.remote(f, run_files, S) for a in self._actors])
            self._dv_loaded.add(f)

    def search_filtered(
        self,
        text: str,
        filters: list[dict] | dict,
        k: int = 10,
        mode: str = "or",
        method: str = "auto",
    ) -> list[tuple[int, float]]:
        """ES bool filter context: BM25 top-k restricted to docs whose
        doc-values pass every clause — scores are UNCHANGED (same idf/N as
        the unfiltered query; a filter never affects relevance, exactly like
        ES filter vs must). Clauses: {"field": f, "eq": v} | {"field": f,
        "in": [...]} | {"field": f, "gte"/"gt"/"lte"/"lt": x} (combinable) |
        {"field": lat_f, "geo_distance": {"lon_field": lon_f, "origin":
        (lat, lon), "radius_m": r}} (ES bool.filter.geo_distance over
        lat/lon doc-values)."""
        if isinstance(filters, dict):
            filters = [filters]
        needed = {f["field"] for f in filters}
        needed |= {
            f["geo_distance"]["lon_field"] for f in filters if "geo_distance" in f
        }
        self._ensure_doc_values(sorted(needed))
        return self.search_many(
            [{"text": text, "mode": mode, "filters": filters}], k=k, method=method
        )[0]

    def stats(self, text: str, field: str, *, mode: str = "or") -> dict | None:
        """ES stats aggregation under a query: count/min/max/sum/avg of a
        numeric doc-value over ALL matching docs. Local per-actor partials
        (docs are disjoint across actors) + a driver combine — no docmap
        streaming per query."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return None
        self._ensure_doc_values([field])
        per = ray.get(
            [a.agg_under_query.remote(terms, mode, field) for a in self._actors]
        )
        parts = [p for p in per if p is not None]
        if not parts:
            return None
        n = sum(p[0] for p in parts)
        s = sum(p[1] for p in parts)
        return {
            "count": int(n),
            "sum": float(s),
            "min": float(min(p[2] for p in parts)),
            "max": float(max(p[3] for p in parts)),
            "avg": float(s / n),
        }

    def extended_stats(self, text: str, field: str, *, mode: str = "or") -> dict | None:
        """ES extended_stats aggregation: stats + sum_of_squares / variance /
        std_deviation, ES's population formula
        ``variance = (sumOfSqrs - sum²/count) / count``. The per-shard
        partial adds Σx² to the stats tuple via the same per-value numeric
        counts the percentile path ships (bounded-distinct doc-value
        contract), combined on the driver — integer doc-values make every
        sum exact in float64, so the result is order-independent."""
        import math

        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return None
        self._ensure_doc_values([field])
        per = ray.get(
            [a.agg_under_query.remote(terms, mode, field, None, "numeric")
             for a in self._actors]
        )
        parts = [p for p in per if p is not None]
        if not parts:
            return None
        vals = np.concatenate([np.asarray(p[0], dtype=np.float64) for p in parts])
        cnts = np.concatenate([np.asarray(p[1], dtype=np.float64) for p in parts])
        n = float(cnts.sum())
        s = float((vals * cnts).sum())
        ss = float((vals * vals * cnts).sum())
        variance = (ss - s * s / n) / n
        return {
            "count": int(n), "sum": s,
            "min": float(vals.min()), "max": float(vals.max()),
            "avg": s / n, "sum_of_squares": ss,
            "variance": variance,
            "std_deviation": math.sqrt(max(variance, 0.0)),
        }

    def range_agg(
        self,
        text: str,
        field: str,
        ranges: list[tuple[float | None, float | None]],
        *,
        mode: str = "or",
    ) -> list[tuple[float | None, float | None, int]]:
        """ES range aggregation: per-bucket doc counts for explicit
        [from, to) ranges (ES semantics: ``from`` inclusive, ``to``
        exclusive, None = unbounded; buckets may overlap, each counts
        independently). Reuses the per-value numeric-counts partial, so the
        shuffle carries one row per distinct value per shard."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return [(lo, hi, 0) for lo, hi in ranges]
        self._ensure_doc_values([field])
        per = ray.get(
            [a.agg_under_query.remote(terms, mode, field, None, "numeric")
             for a in self._actors]
        )
        parts = [p for p in per if p is not None]
        if not parts:
            return [(lo, hi, 0) for lo, hi in ranges]
        vals = np.concatenate([np.asarray(p[0], dtype=np.float64) for p in parts])
        cnts = np.concatenate([np.asarray(p[1], dtype=np.int64) for p in parts])
        out = []
        for lo, hi in ranges:
            m = np.ones(len(vals), dtype=bool)
            if lo is not None:
                m &= vals >= lo
            if hi is not None:
                m &= vals < hi
            out.append((lo, hi, int(cnts[m].sum())))
        return out

    def filters_agg(self, named: dict[str, tuple[str, str]]) -> dict[str, int]:
        """ES filters aggregation: named (query text, mode) filters → match
        counts, every filter's per-shard match evaluated in ONE concurrent
        wave (futures for all name×shard pairs fire before any gather)."""
        futs: dict[str, list] = {}
        for name, (text, mode) in named.items():
            terms = sorted(set(self.analyzer.analyze_query(text)))
            futs[name] = (
                [a.match_doc_ids.remote(terms, mode) for a in self._actors]
                if terms
                else []
            )
        return {
            name: int(sum(len(ids) for ids in ray.get(fs))) if fs else 0
            for name, fs in futs.items()
        }

    def multi_terms(
        self, text: str, fields: list[str], *, mode: str = "or", top: int = 10
    ) -> list[tuple[tuple, int]]:
        """ES multi_terms aggregation under a query: doc counts per composite
        key of 2+ doc-value fields over ALL matching docs. Per-shard Arrow
        group_by partials, driver combine; top buckets by (count desc, key
        asc) — ES's default order with deterministic ties."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return []
        self._ensure_doc_values(list(fields))
        per = ray.get(
            [a.multi_terms_under_query.remote(terms, mode, list(fields)) for a in self._actors]
        )
        agg: dict[tuple, int] = {}
        for p in per:
            if p is None:
                continue
            for row in p:
                key = tuple(row[f] for f in fields)
                agg[key] = agg.get(key, 0) + int(row["count_all"])
        out = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
        return [(k, n) for k, n in out]

    def terms_stats(
        self,
        text: str,
        group_field: str,
        value_field: str,
        *,
        mode: str = "or",
        top: int = 10,
    ) -> list[dict]:
        """ES terms aggregation with a nested stats sub-aggregation — the
        bread-and-butter ES shape (`terms(lang) { stats(n_chars) }`): per
        bucket count/sum/min/max/avg of a numeric doc-value over ALL
        matching docs. Per-shard Arrow group_by partials combine exactly
        (integer sums stay integers until the avg division); buckets
        ordered (count desc, key asc), ES's terms default."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return []
        self._ensure_doc_values([group_field, value_field])
        per = ray.get(
            [
                a.terms_stats_under_query.remote(terms, mode, group_field, value_field)
                for a in self._actors
            ]
        )
        agg: dict = {}
        for p in per:
            if p is None:
                continue
            for r in p:
                cur = agg.get(r["g"])
                if cur is None:
                    agg[r["g"]] = [r["v_count"], r["v_sum"], r["v_min"], r["v_max"]]
                else:
                    cur[0] += r["v_count"]
                    cur[1] += r["v_sum"]
                    cur[2] = min(cur[2], r["v_min"])
                    cur[3] = max(cur[3], r["v_max"])
        out = [
            {"key": g, "count": int(c), "sum": float(s), "min": float(mn),
             "max": float(mx), "avg": float(s) / int(c)}
            for g, (c, s, mn, mx) in agg.items()
        ]
        out.sort(key=lambda r: (-r["count"], r["key"]))
        return out[: max(0, int(top))]

    def weighted_avg(
        self, text: str, value_field: str, weight_field: str, *, mode: str = "or"
    ) -> float | None:
        """ES weighted_avg aggregation under a query:
        Σ(value·weight) / Σ(weight) over ALL matching docs. Two-float
        partials per shard; None when nothing matches or Σweight == 0."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return None
        self._ensure_doc_values([value_field, weight_field])
        per = ray.get(
            [
                a.weighted_avg_under_query.remote(terms, mode, value_field, weight_field)
                for a in self._actors
            ]
        )
        sum_vw = sum(p[0] for p in per if p is not None)
        sum_w = sum(p[1] for p in per if p is not None)
        if not any(p is not None for p in per) or sum_w == 0.0:
            return None
        return sum_vw / sum_w

    def adjacency_matrix(self, named: dict[str, tuple[str, str]]) -> dict[str, int]:
        """ES adjacency_matrix aggregation: named (query text, mode) filters
        → doc counts of every filter and every pairwise intersection
        (``"a&b"`` keys, names in sorted order — ES's bucket naming). ONE
        scatter carries all compiled filters; shards return count partials
        that sum exactly because docs are disjoint across shards."""
        compiled = {
            name: (sorted(set(self.analyzer.analyze_query(text))), mode)
            for name, (text, mode) in named.items()
        }
        empty = {n for n, (t, _) in compiled.items() if not t}
        live = {n: c for n, c in compiled.items() if n not in empty}
        out: dict[str, int] = {}
        if live:
            per = ray.get([a.adjacency_counts.remote(live) for a in self._actors])
            for p in per:
                for k, n in p.items():
                    out[k] = out.get(k, 0) + n
        # empty-analysis filters match nothing; still emit their zero buckets
        names = sorted(named)
        for i, a_ in enumerate(names):
            out.setdefault(a_, 0)
            for b_ in names[i + 1 :]:
                out.setdefault(f"{a_}&{b_}", 0)
        return out

    def composite_agg(
        self,
        text: str,
        fields: list[str],
        *,
        mode: str = "or",
        size: int = 10,
        after: tuple | None = None,
    ) -> tuple[list[dict], tuple | None]:
        """ES composite aggregation: (field-tuple, doc count) buckets in
        ASCENDING key order with cursor pagination — the agg ES built for
        scroll-style full-bucket exports. Reuses the multi_terms scatter
        (per-shard Arrow group_by partials); ``after`` is the last key tuple
        of the previous page (exclusive). Returns (rows, after_key) where
        after_key is None on the final page — exactly ES's response shape."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return [], None
        self._ensure_doc_values(list(fields))
        per = ray.get(
            [
                a.multi_terms_under_query.remote(terms, mode, list(fields))
                for a in self._actors
            ]
        )
        agg: dict[tuple, int] = {}
        for p in per:
            if p is None:
                continue
            for row in p:
                key = tuple(row[f] for f in fields)
                agg[key] = agg.get(key, 0) + int(row["count_all"])
        keys = sorted(agg)
        if after is not None:
            after_t = tuple(after)
            keys = [k for k in keys if k > after_t]
        page = keys[: max(0, int(size))]
        rows = [
            {**{f: k[i] for i, f in enumerate(fields)}, "doc_count": agg[k]}
            for k in page
        ]
        after_key = tuple(page[-1]) if page and len(keys) > len(page) else None
        return rows, after_key

    def rare_terms(
        self, text: str, field: str, *, max_doc_count: int = 1, mode: str = "or"
    ) -> list[tuple[str, int]]:
        """ES rare_terms aggregation under a query — EXACT here (ES uses a
        CuckooFilter approximation): value buckets of a doc-value field whose
        doc count ≤ max_doc_count, ordered (count asc, term asc) — ES's
        rarest-first order. Reuses the facets scatter (full per-shard value
        counts; the combine must see every shard's count before the ≤ cut,
        a bucket rare on one shard may be common globally)."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.agg_under_query.remote(terms, mode, field, value_counts=True)
                for a in self._actors
            ]
        )
        agg: dict[str, int] = {}
        for p in per:
            if p is None:
                continue
            for v, n in zip(*p):
                agg[v] = agg.get(v, 0) + int(n)
        out = [(v, n) for v, n in agg.items() if n <= max_doc_count]
        out.sort(key=lambda kv: (kv[1], kv[0]))
        return out

    def histogram(
        self, text: str, field: str, interval: float, *, mode: str = "or"
    ) -> list[tuple[float, int]]:
        """ES histogram aggregation under a query: per-bucket doc counts of a
        numeric doc-value over ALL matching docs; bucket key =
        floor(v / interval) * interval. Sorted by bucket key."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.agg_under_query.remote(terms, mode, field, histogram_interval=interval)
                for a in self._actors
            ]
        )
        agg: dict[float, int] = {}
        for p in per:
            if p is None:
                continue
            for key, cnt in zip(*p):
                agg[key] = agg.get(key, 0) + int(cnt)
        return sorted(agg.items())

    def pipeline_agg(
        self,
        text: str,
        field: str,
        interval: float,
        *,
        mode: str = "or",
        window: int = 3,
    ) -> list[dict]:
        """ES pipeline aggregations over a histogram's buckets:
        cumulative_sum, derivative (None for the first bucket, the ES rule)
        and a simple-model moving_avg over the trailing ``window`` buckets.
        The parent histogram is the distributed part (per-actor partials);
        pipeline aggs are pure bucket-list post-processing, so they run on
        the driver over ≤ |buckets| rows — exactly how ES computes them."""
        buckets = self.histogram(text, field, interval, mode=mode)
        out = []
        csum = 0
        counts: list[int] = []
        for i, (key, n) in enumerate(buckets):
            csum += n
            counts.append(n)
            tail = counts[max(0, i + 1 - window) : i + 1]
            out.append(
                {
                    "bucket": key,
                    "n": n,
                    "cumulative_sum": csum,
                    "derivative": (n - counts[i - 1]) if i > 0 else None,
                    "moving_avg": sum(tail) / len(tail),
                }
            )
        return out

    def cardinality(self, text: str, field: str, *, mode: str = "or") -> int:
        """ES cardinality aggregation under a query: the number of DISTINCT
        values of a doc-value field over ALL matching docs. Exact: each actor
        returns its matching docs' distinct values (distinct-sized, not
        match-sized) and the driver unions — correct because actors serve
        disjoint docs. (ES itself answers this approximately with HLL; at a
        vocabulary too large for the driver, swap the per-actor partial for
        the KMV sketch in pipelines/relational.q_approx_distinct.)"""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return 0
        self._ensure_doc_values([field])
        per = ray.get(
            [a.distinct_under_query.remote(terms, mode, field) for a in self._actors]
        )
        vals: set = set()
        for p in per:
            if p is not None:
                vals.update(p)
        return len(vals)

    _DATE_TRUNC_CHARS = {"year": 4, "month": 7, "day": 10}

    def date_histogram(
        self, text: str, field: str, *, interval: str = "month", mode: str = "or"
    ) -> list[tuple[str, int]]:
        """ES date_histogram aggregation under a query (calendar intervals):
        per-bucket doc counts over ALL matching docs, where the doc-value
        field holds ISO-8601 date strings and the bucket key is the
        year/month/day prefix. Local per-actor partials + driver combine —
        same scale shape as facets/stats (only (bucket, count) rows move)."""
        try:
            chars = self._DATE_TRUNC_CHARS[interval]
        except KeyError:
            raise ValueError(f"interval must be one of {sorted(self._DATE_TRUNC_CHARS)}")
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.date_histogram_under_query.remote(terms, mode, field, chars)
                for a in self._actors
            ]
        )
        agg: dict[str, int] = {}
        for p in per:
            if p is None:
                continue
            for key, cnt in zip(*p):
                agg[key] = agg.get(key, 0) + int(cnt)
        return sorted(agg.items())

    def significant_terms(
        self, text: str, field: str, *, mode: str = "or", top: int = 10,
        heuristic: str = "jlh",
    ) -> list[dict]:
        """ES significant_terms aggregation on a keyword doc-value field:
        values over-represented in the query's match set (foreground) vs the
        whole index (background), scored with the chosen heuristic (``jlh``,
        ES's default, or ``chi_square`` — see significance_score). Per-actor
        partials for both counts (docs disjoint across actors), combined on
        the driver; only values appearing in the foreground are scored.
        Output rows: {value, fg_count, bg_count, score} sorted by
        (score desc, value asc), top ``top``."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return []
        self._ensure_doc_values([field])
        fg_parts = ray.get(
            [
                a.agg_under_query.remote(terms, mode, field, value_counts=True)
                for a in self._actors
            ]
        )
        bg_parts = ray.get([a.value_counts_all.remote(field) for a in self._actors])
        fg: dict[str, int] = {}
        bg: dict[str, int] = {}
        for p in fg_parts:
            if p is None:
                continue
            for v, n in zip(*p):
                fg[v] = fg.get(v, 0) + int(n)
        for p in bg_parts:
            if p is None:
                continue
            for v, n in zip(*p):
                bg[v] = bg.get(v, 0) + int(n)
        fg_total = sum(fg.values())
        bg_total = sum(bg.values())
        if fg_total == 0 or bg_total == 0:
            return []
        out = []
        for v, n in fg.items():
            score = significance_score(n, fg_total, bg[v], bg_total, heuristic)
            out.append(
                {"value": v, "fg_count": n, "bg_count": bg[v], "score": float(score)}
            )
        out.sort(key=lambda r: (-r["score"], r["value"]))
        return out[:top]

    def significant_text(
        self,
        text: str,
        *,
        field: str = "text",
        mode: str = "or",
        top: int = 10,
        min_doc_count: int = 3,
        shard_sample: int | None = None,
        heuristic: str = "jlh",
    ) -> list[dict]:
        """ES significant_text aggregation: terms over-represented in the
        RE-ANALYZED stored text of the query's match set vs the whole index,
        JLH-scored exactly like significant_terms but with DOC totals
        (subset = foreground docs counted, superset = N). Foreground term
        doc-counts come from per-shard stored-text re-analysis (one
        scatter); background df is the index's own global_dfs — no second
        corpus pass. ``shard_sample`` caps each shard's foreground at its
        lowest-doc_id matches — a deterministic stand-in for ES's sampler
        (ES samples top-scoring hits; same cost bound, reproducible).
        Output rows {term, fg_count, bg_count, score}, (score desc, term
        asc), top ``top``."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.sig_text_counts.remote(
                    terms, mode, field, self.man.config.analyzer, shard_sample
                )
                for a in self._actors
            ]
        )
        fg: dict[str, int] = {}
        fg_total = 0
        for p in per:
            if p is None:
                continue
            fg_total += p[0]
            for t, n in p[1].items():
                fg[t] = fg.get(t, 0) + n
        if fg_total == 0:
            return []
        cand = sorted(t for t, n in fg.items() if n >= min_doc_count)
        if not cand:
            return []
        bg = dict(zip(cand, self.global_dfs(cand).tolist()))
        out = []
        for t in cand:
            score = significance_score(fg[t], fg_total, int(bg[t]), self.N, heuristic)
            out.append(
                {"term": t, "fg_count": fg[t], "bg_count": int(bg[t]),
                 "score": float(score)}
            )
        out.sort(key=lambda r: (-r["score"], r["term"]))
        return out[:top]

    def percentiles(
        self,
        text: str,
        field: str,
        ps: list[float] = (25, 50, 75, 95, 99),
        *,
        mode: str = "or",
    ) -> dict[float, float]:
        """ES percentiles aggregation under a query — EXACT (not t-digest):
        each actor returns its matching docs' per-value counts (bounded by
        the field's distinct values, the facet contract), the driver merges
        the count histograms and reads each percentile as the value at
        1-based rank ceil(p/100 · n) — the discrete-quantile definition SQL's
        quantile_disc uses, so results are oracle-comparable."""
        terms = sorted(set(self.analyzer.analyze_query(text)))
        if not terms:
            return {}
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.agg_under_query.remote(terms, mode, field, value_counts="numeric")
                for a in self._actors
            ]
        )
        agg: dict[float, int] = {}
        for p in per:
            if p is None:
                continue
            for v, c in zip(*p):
                agg[float(v)] = agg.get(float(v), 0) + int(c)
        if not agg:
            return {}
        vals = np.array(sorted(agg))
        counts = np.array([agg[v] for v in vals], dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        out = {}
        for p in ps:
            rank = max(1, int(np.ceil(p / 100.0 * n)))
            out[float(p)] = float(vals[np.searchsorted(cum, rank)])
        return out

    def _query_idfs(self, text: str, mode: str) -> tuple[list[str], dict]:
        """Analyzed terms with df>0 and their global idfs (AND with an
        unknown term matches nothing — same contract as search_many)."""
        terms_all = sorted(set(self.analyzer.analyze_query(text)))
        dfs = self.global_dfs(terms_all)
        terms = [t for t, df in zip(terms_all, dfs.tolist()) if df > 0]
        if mode == "and" and len(terms) < len(terms_all):
            return [], {}
        idfs = {
            t: float(bm25.idf(self.N, df))
            for t, df in zip(terms_all, dfs.tolist())
            if df > 0
        }
        return terms, idfs

    def top_hits(
        self, text: str, field: str, *, mode: str = "or", n_hits: int = 3,
        top: int = 10,
    ) -> list[dict]:
        """ES terms aggregation with a top_hits sub-aggregation: for each
        value of a doc-value field, the count of matching docs and the top
        ``n_hits`` of them by BM25 score. Exact: each shard returns its local
        per-value counts + top-n (docs disjoint across actors), the driver
        sums counts and merges the per-value candidate lists. Buckets ordered
        by (count desc, value asc), top ``top``."""
        terms, idfs = self._query_idfs(text, mode)
        if not terms:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.top_hits_by_value.remote(
                    terms, mode, field, n_hits, idfs, self.avgdl, self.k1, self.b
                )
                for a in self._actors
            ]
        )
        counts: dict[str, int] = {}
        hits: dict[str, list[tuple[float, int]]] = {}
        for p in per:
            if p is None:
                continue
            cv, cn, hv, hd, hs = p
            for v, n in zip(cv, cn):
                counts[v] = counts.get(v, 0) + int(n)
            for v, d, s in zip(hv, hd, hs):
                hits.setdefault(v, []).append((float(s), int(d)))
        out = []
        for v in sorted(counts, key=lambda v: (-counts[v], str(v)))[:top]:
            cand = sorted(hits.get(v, []), key=lambda sd: (-sd[0], sd[1]))[:n_hits]
            out.append(
                {
                    "value": v,
                    "count": counts[v],
                    "hits": [(d, s) for s, d in cand],
                }
            )
        return out

    def collapse(
        self, text: str, field: str, *, k: int = 10, mode: str = "or"
    ) -> list[dict]:
        """ES field collapsing: the top-``k`` matching docs with at most ONE
        hit — the best-scoring — per distinct value of a doc-value ``field``
        (dedupe search results by domain/repo/author…). Per shard this is one
        scored pass + a per-value local best (the n=1 top_hits partial), so
        only one row per (shard, distinct value) reaches the driver; the
        driver keeps the per-value global best and cuts to k. Scores are the
        ordinary BM25 search scores (collapsing never rescores)."""
        terms, idfs = self._query_idfs(text, mode)
        if not terms:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.top_hits_by_value.remote(
                    terms, mode, field, 1, idfs, self.avgdl, self.k1, self.b
                )
                for a in self._actors
            ]
        )
        best: dict[str, tuple[float, int]] = {}
        for p in per:
            if p is None:
                continue
            _cv, _cn, hv, hd, hs = p
            for v, d, s in zip(hv, hd, hs):
                cur = best.get(v)
                cand = (float(s), int(d))
                # best = higher score, tie → lower doc_id
                if cur is None or (-cand[0], cand[1]) < (-cur[0], cur[1]):
                    best[v] = cand
        ranked = sorted(
            ((s, d, v) for v, (s, d) in best.items()), key=lambda x: (-x[0], x[1])
        )[:k]
        return [{"doc_id": d, "score": s, "value": v} for s, d, v in ranked]

    def search_boosted(
        self,
        text: str,
        field: str,
        *,
        modifier: str = "log1p",
        weight: float = 1.0,
        factor: float = 1.0,
        k: int = 10,
        mode: str = "or",
    ) -> list[tuple[int, float]]:
        """ES function_score with field_value_factor (boost_mode=multiply):
        final score = BM25 · (weight · modifier(factor · doc_value)).
        Re-ranking is value-dependent, so each shard boosts ALL its matches
        locally and returns its boosted top-k; the driver merges — only
        shards×k rows move. The full ES modifier set (log-family base-10 as
        in Lucene): none | log | log1p | log2p | ln | ln1p | ln2p | square |
        sqrt | reciprocal."""
        terms, idfs = self._query_idfs(text, mode)
        if not terms or k <= 0:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.boosted_topk.remote(
                    terms, mode, k, field, modifier, float(weight),
                    idfs, self.avgdl, self.k1, self.b, factor=float(factor),
                )
                for a in self._actors
            ]
        )
        cand = [c for p in per for c in p]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        topi = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in topi]

    def search_decay(
        self,
        text: str,
        field: str,
        *,
        fn: str = "gauss",
        origin: float = 0.0,
        scale: float = 1.0,
        offset: float = 0.0,
        decay: float = 0.5,
        weight: float = 1.0,
        k: int = 10,
        mode: str = "or",
    ) -> list[tuple[int, float]]:
        """ES function_score decay (gauss | exp | linear over a numeric
        doc-value, boost_mode=multiply): final score = BM25 · (weight ·
        decay_fn(doc_value)), where a value exactly ``scale`` away from
        ``origin`` (beyond ``offset``) gets multiplier ``decay`` — ES's
        freshness/recency-boost shape. Same shard-local re-rank + driver
        merge as search_boosted (shards×k rows move, match sets don't)."""
        # validate driver-side for a clean error instead of a RayTaskError
        decay_apply(np.zeros(1), fn, origin, scale, offset, decay)
        terms, idfs = self._query_idfs(text, mode)
        if not terms or k <= 0:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.decay_topk.remote(
                    terms, mode, k, field, fn, float(origin), float(scale),
                    float(offset), float(decay), float(weight),
                    idfs, self.avgdl, self.k1, self.b,
                )
                for a in self._actors
            ]
        )
        cand = [c for p in per for c in p]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        topi = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in topi]

    def search_distance_feature(
        self,
        text: str,
        field: str,
        *,
        origin: float = 0.0,
        pivot: float = 1.0,
        weight: float = 1.0,
        k: int = 10,
        mode: str = "or",
    ) -> list[tuple[int, float]]:
        """ES distance_feature query (bool-should shape): final score =
        BM25 + weight · pivot/(pivot + |doc_value − origin|) — ADDITIVE,
        unlike function_score's multiply; the multiplier is 1 at the origin
        and exactly 0.5 at distance ``pivot`` (ES's recency/proximity
        boost). Same shard-local re-rank + driver merge as search_boosted."""
        if pivot <= 0:
            raise ValueError("distance_feature pivot must be > 0")
        terms, idfs = self._query_idfs(text, mode)
        if not terms or k <= 0:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.distance_feature_topk.remote(
                    terms, mode, k, field, float(origin), float(pivot),
                    float(weight), idfs, self.avgdl, self.k1, self.b,
                )
                for a in self._actors
            ]
        )
        cand = [c for p in per for c in p]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        topi = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in topi]

    def search_rank_feature(
        self,
        text: str,
        field: str,
        *,
        fn: str = "saturation",
        pivot: float = 1.0,
        scaling_factor: float = 1.0,
        exponent: float = 1.0,
        weight: float = 1.0,
        k: int = 10,
        mode: str = "or",
    ) -> list[tuple[int, float]]:
        """ES rank_feature query (bool-should, ADDITIVE like
        distance_feature): final = BM25 + weight · kernel(doc_value) with
        Lucene's FeatureField kernels — saturation v/(v+pivot),
        log ln(scaling_factor·v+1), sigmoid v^e/(v^e+pivot^e). The ES
        popularity/pagerank boost shape. Shard-local every-match re-rank,
        local top-k partials only."""
        if fn not in RANK_FEATURE_FNS:
            raise ValueError(f"rank_feature fn must be one of {RANK_FEATURE_FNS}")
        rank_feature_apply(np.array([1.0]), fn, pivot=pivot,
                           scaling_factor=scaling_factor, exponent=exponent)
        terms, idfs = self._query_idfs(text, mode)
        if not terms or k <= 0:
            return []
        self._ensure_doc_values([field])
        per = ray.get(
            [
                a.rank_feature_topk.remote(
                    terms, mode, k, field, fn, float(pivot),
                    float(scaling_factor), float(exponent), float(weight),
                    idfs, self.avgdl, self.k1, self.b,
                )
                for a in self._actors
            ]
        )
        cand = [c for p in per for c in p]
        if not cand:
            return []
        scores = np.array([c[0] for c in cand], dtype=np.float64)
        docs = np.array([c[1] for c in cand], dtype=np.uint64)
        topi = bm25.topk_indices(scores, docs, k)
        return [(int(docs[i]), float(scores[i])) for i in topi]

    def export_matches(
        self,
        text: str,
        out_dir: str,
        *,
        mode: str = "or",
        fields: tuple[str, ...] = (),
        with_scores: bool = False,
    ) -> dict:
        """ES scroll-the-whole-match-set analogue: write EVERY doc matching
        the query to partitioned parquet under ``out_dir`` — one file set per
        shard actor, written actor-locally (the match set never moves through
        the driver; only counts and file names return). Columns: doc_id
        [, score when with_scores] [, requested doc-value fields]. The output
        is a normal parquet directory: read it back with
        ray.data.read_parquet and continue the pipeline."""
        terms, idfs = self._query_idfs(text, mode)
        if not terms:
            return {"n_rows": 0, "files": []}
        if fields:
            self._ensure_doc_values(list(fields))
        per = ray.get(
            [
                a.export_matches.remote(
                    terms, mode, out_dir, i, tuple(fields),
                    idfs if with_scores else None, self.avgdl, self.k1, self.b,
                )
                for i, a in enumerate(self._actors)
            ]
        )
        return {
            "n_rows": int(sum(n for n, _ in per)),
            "files": sorted(f for _, fs in per for f in fs),
        }

    def close(self) -> None:
        for a in self._actors:
            ray.kill(a)
        self._actors = []
