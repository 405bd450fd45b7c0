"""Reindex: rebuild an index from its own stored document source (the ES
``_reindex`` API, which reads ``_source`` — here, the docmap's stored content
column) into a new index directory with a possibly different configuration
(analyzer, segment count, positions, BM25 parameters).

Shape: the docmap is already partitioned parquet, so the "read side" of
reindex is the live-docs Dataset view (``tombstones.docmap_dataset`` — upsert-
superseded and deleted versions excluded), staged under the destination and
fed to the normal ``build_index`` pipeline. Document ids are preserved: the
docmap's ``doc_id`` column is authoritative, exactly like ES preserving
``_id`` through _reindex. At cluster scale both halves stream — the staging
write is a Dataset ``write_parquet`` and the build re-reads it with column
pruning."""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import replace

from .build import BuildResult, build_index
from ..state.manifest import IndexConfig, Manifest


def reindex(
    src_index_dir: str,
    dst_index_dir: str,
    *,
    config: IndexConfig | None = None,
    **overrides,
) -> BuildResult:
    """Rebuild ``src_index_dir`` into ``dst_index_dir``.

    ``config`` replaces the source config wholesale; ``overrides`` patch
    individual fields of the source config (e.g. ``analyzer="whitespace"``,
    ``positions=True``, ``num_segments=16``). Requires the source index to
    have stored its content column (``store_cols`` includes ``content_col``
    and ``write_docmap=True``) — the ES precondition that ``_source`` is
    enabled. Raises ValueError otherwise."""
    from .tombstones import docmap_dataset, find_superseded

    man = Manifest.load(src_index_dir)
    src_cfg = man.config
    content = src_cfg.content_col
    if content not in src_cfg.store_cols:
        raise ValueError(
            f"reindex needs the source index to store its content column "
            f"(IndexConfig(store_cols=({content!r}, ...))) — ES: _source must "
            "be enabled"
        )
    new_cfg = config if config is not None else replace(src_cfg, **overrides)
    # ids are preserved through the docmap regardless of how the source
    # derived them (explicit doc_id_col or hashed id_cols)
    new_cfg = replace(new_cfg, doc_id_col="doc_id", content_col=content)

    ds = docmap_dataset(man, find_superseded(man))
    cols = ds.schema().names
    keep = ["doc_id", content] + [
        c for c in new_cfg.store_cols if c in cols and c not in ("doc_id", content)
    ]
    # Stage OUTSIDE the destination index dir and clean up afterwards:
    # snapshot/fsck/stats walk the whole index directory, so a staging copy
    # left under <dst>/ would ride along in every snapshot (a second full
    # corpus copy) and confuse on-disk tooling.
    staging = tempfile.mkdtemp(prefix="edih_reindex_src_")
    try:
        ds.select_columns(keep).write_parquet(staging)
        files = [
            os.path.join(staging, f)
            for f in sorted(os.listdir(staging))
            if f.endswith(".parquet")
        ]
        return build_index(files, dst_index_dir, mode="full", config=new_cfg)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
