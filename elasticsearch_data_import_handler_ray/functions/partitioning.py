"""Data-proportional shuffle fan-out (SURVEY.md §4.3 "Partitioning").

Every bucketed groupby / hash join / salted shuffle in this repo used to pick
a fixed constant (8/32/64). A constant means each bucket grows linearly with
the corpus: 1/32 of a 100 TB table in one pandas group does not fit anywhere.
``shuffle_fanout`` sizes the exchange from the data instead: enough partitions
that one partition's rows fit a worker's heap, never fewer than 2× cluster
CPUs (so no stage runs narrower than the machine), bounded above so tiny test
inputs do not explode into thousands of empty groups.

Dataset size is estimated from the source parquet/file footprint
(``ds.input_files()`` — available through lineage without executing the
pipeline). File bytes are compressed; ``bytes_per_part`` is chosen so a part
decompresses to roughly a few hundred MB in memory.
"""

from __future__ import annotations

import os

import ray


def cluster_cpus(default: int = 4) -> int:
    try:
        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        pass
    return default


def pool_concurrency(lo: int = 1) -> tuple[int, int]:
    """Autoscaling (min, max) size for a stateful map_batches actor pool.

    A FIXED pool size is a scale trap: Ray fuses adjacent map_batches into
    the actor-pool operator, so `concurrency=2` caps the whole fused chain
    (a 2.4M-doc tokenize ran on 2 actors for an hour). Autoscaling from
    ``lo`` keeps tiny test inputs cheap (no 32-actor cold start) while
    letting backpressure grow the pool to the cluster on real corpora."""
    return (lo, max(2, cluster_cpus()))


def shuffle_fanout(
    ds=None,
    *,
    bytes_per_part: int = 64 << 20,
    max_parts: int = 4096,
    explode_factor: float = 1.0,
) -> int:
    """Partition/bucket count for a wide operation over ``ds``.

    ``explode_factor`` scales the estimate when the shuffled rows are larger
    than the source (e.g. a tokenize stage exploding 1 doc row into ~100
    posting rows ⇒ explode_factor≈2–4 of the *byte* volume).
    """
    base = 2 * cluster_cpus()
    size = 0
    if ds is not None:
        try:
            for f in ds.input_files():
                try:
                    size += os.path.getsize(f)
                except OSError:
                    pass
        except Exception:
            size = 0
    if size:
        need = -(-int(size * explode_factor) // bytes_per_part)  # ceil
        return int(min(max_parts, max(base, need)))
    return int(min(max_parts, base))


def join_fanout(*dss, bytes_per_part: int = 64 << 20, max_parts: int = 4096) -> int:
    """Partition count for ``Dataset.join``.

    Unlike the bucketed-groupby fanout, Ray's hash-shuffle join spins up one
    aggregator ACTOR per partition and the build/probe work runs inside them
    — partitions beyond the data's needs oversubscribe the cluster and pay
    actor cold-start (measured on sf0.1 orders⋈customer, 32 CPUs:
    64 partitions 44 s cold / 8.2 s warm vs 8 partitions 2.3 s). So the floor
    is a small fraction of the CPUs (~CPUs/4, the measured sweet spot) and
    the count only grows when the input bytes demand it (1/64 MB), which is
    what a 100 TB join needs anyway."""
    base = max(2, cluster_cpus() // 4)
    size = 0
    for ds in dss:
        if ds is None:
            continue
        try:
            for f in ds.input_files():
                try:
                    size += os.path.getsize(f)
                except OSError:
                    pass
        except Exception:
            pass
    need = -(-size // bytes_per_part) if size else 0
    return int(min(max_parts, max(base, need)))
