"""Update-by-query: the ES ``_update_by_query`` API rebuilt on the upsert
machinery.

Shape: the match set comes from ONE ``query_string(k=0)`` scatter (the full
Lucene surface — boolean trees, ranges, _exists_, phrases); the live docmap
view (``tombstones.docmap_dataset``) streams through a broadcast membership
mask, the caller's batch transform rewrites the matched ``_source`` rows,
and the result is staged as parquet and fed to ``build_index(mode=
"incremental")`` — the id-mapped UPSERT path, so the new versions supersede
the old ones exactly like a re-import (df/N/avgdl corrected immediately,
old versions purged physically at the next ``merge_index``).

Scale notes: the corpus never leaves its partitions — only MATCHED rows are
materialized into the staging write, and they stream batch-by-batch through
the transform. The one broadcast is the matched-id array (8 B/doc); an
update that matches a large fraction of a 10^12-doc corpus should go
through ``reindex`` instead (same machinery, no membership mask), and the
docstring contract mirrors ES, whose _update_by_query is also a scan-scoped
tool rather than a full-reindex replacement.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import numpy as np
import pyarrow as pa

from ..state.manifest import Manifest
from .build import build_index


def update_by_query(
    index_dir: str,
    q: str,
    transform,
    *,
    default_operator: str = "or",
    max_expansions: int = 50,
) -> dict:
    """Apply ``transform`` (``pa.Table → pa.Table``) to every live doc
    matching the query_string ``q`` and upsert the rewritten versions.

    The transform receives the stored ``_source`` columns (identity columns,
    the content column, ``store_cols``) and must return the same columns
    with identities UNCHANGED — changing a doc's identity is a delete+create,
    not an update (ES raises there too; here the id check raises ValueError).
    Requires the index to store its content column (the ES ``_source``
    precondition, same as reindex). Returns ``{"matched": n, "updated": n}``.
    """
    from .query import QueryEngine
    from .tombstones import docmap_dataset, find_superseded, in_sorted

    man = Manifest.load(index_dir)
    cfg = man.config
    content = cfg.content_col
    if content not in cfg.store_cols:
        raise ValueError(
            f"update_by_query needs the index to store its content column "
            f"(IndexConfig(store_cols=({content!r}, ...))) — ES: _source must "
            "be enabled"
        )
    eng = QueryEngine(index_dir)
    try:
        matches = eng.query_string(
            q, k=0, default_operator=default_operator, max_expansions=max_expansions
        )
    finally:
        eng.close()
    if not matches:
        return {"matched": 0, "updated": 0}
    matched_ids = np.array([d for d, _ in matches], dtype=np.uint64)  # sorted (k=0)

    import ray

    ids_ref = ray.put(matched_ids)
    ds = docmap_dataset(man, find_superseded(man))
    cols = ds.schema().names
    # the _source columns the rebuild needs (mirrors reindex's staging)
    keep = ["doc_id", content] + [
        c for c in cfg.store_cols if c in cols and c not in ("doc_id", content)
    ]
    if cfg.doc_id_col is None:
        keep += [c for c in cfg.id_cols if c in cols and c not in keep]
    id_check_cols = [c for c in keep if c != content]

    def pick_and_transform(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        m = in_sorted(ids, ray.get(ids_ref))
        if not m.any():
            return t.select(keep).slice(0, 0)
        sub = t.select(keep).filter(pa.array(m))
        out = transform(sub)
        missing = [c for c in keep if c not in out.column_names]
        if missing:
            raise ValueError(f"transform dropped required columns: {missing}")
        out = out.select(keep)
        for c in id_check_cols:
            if not out[c].equals(sub[c]):
                raise ValueError(
                    f"transform changed identity column {c!r} — an identity "
                    "change is a delete+create, not an update"
                )
        return out

    staged = ds.map_batches(pick_and_transform, batch_format="pyarrow", zero_copy_batch=True)
    stage_dir = tempfile.mkdtemp(prefix=f"edih_ubq_{uuid.uuid4().hex[:8]}_")
    try:
        # the rebuild derives the SAME doc ids the docmap recorded: either
        # the id_cols hash (identity columns staged above) or the stored
        # doc_id column itself when the index was built with doc_id_col
        if cfg.doc_id_col is not None and cfg.doc_id_col != "doc_id":
            staged = staged.map_batches(
                lambda t: t.rename_columns(
                    [cfg.doc_id_col if c == "doc_id" else c for c in t.column_names]
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        elif cfg.doc_id_col is None:
            staged = staged.drop_columns(["doc_id"])
        staged.write_parquet(stage_dir)
        files = sorted(
            os.path.join(stage_dir, f)
            for f in os.listdir(stage_dir)
            if f.endswith(".parquet")
        )
        res = build_index(files, index_dir, mode="incremental")
        return {"matched": int(len(matched_ids)), "updated": int(res.n_docs)}
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
