"""Named-Dataset catalog — the Ray-Data replacement for the reference's
Spark temp views (SURVEY.md §2.A1/A2: `sources.jdbc` / `sources.filesystem`
config blocks registered via createOrReplaceTempView).

A ``Catalog`` maps names to lazily-read ``ray.data.Dataset``s; reads prune
columns at the source (parquet column projection / row-group pushdown).
"""

from __future__ import annotations

import os

import ray.data


class Catalog:
    def __init__(self, base_dir: str | None = None):
        self.base_dir = base_dir
        self._datasets: dict[str, ray.data.Dataset] = {}

    def register(self, name: str, ds: ray.data.Dataset) -> None:
        self._datasets[name] = ds

    def register_parquet(self, name: str, path: str | None = None, columns: list[str] | None = None) -> None:
        path = path or os.path.join(self.base_dir or "", f"{name}.parquet")
        self._datasets[name] = ray.data.read_parquet(path, columns=columns)

    def register_csv(self, name: str, path: str) -> None:
        self._datasets[name] = ray.data.read_csv(path)

    def register_json(self, name: str, path: str) -> None:
        # newline-delimited JSON (.jsonl) and .json[l].gz are handled by the
        # same reader (Arrow infers gzip from the extension)
        self._datasets[name] = ray.data.read_json(path)

    def register_sql(
        self,
        name: str,
        sql: str,
        connection_factory,
        *,
        shard_keys: list[str] | None = None,
        parallelism: int = -1,
    ) -> None:
        """SQL-database source — the reference's headline ``sources.jdbc``
        block (SURVEY.md §2.A1). ``connection_factory`` is a zero-arg callable
        returning a DB-API2 connection (sqlite3.connect, psycopg2.connect,
        ...); Ray ships it to read tasks, so it must be picklable (use a
        module-level function or functools.partial, not a live connection).

        Scale shape: with ``shard_keys`` (a column list, e.g. the table's
        integer PK) ``ray.data.read_sql`` splits the query into hash-sharded
        partitions executed as parallel read tasks — the analogue of the
        JDBC partitionColumn/numPartitions knobs. Without shard keys the
        read is one task (correct for small dimension tables; pass keys for
        anything big)."""
        kwargs = {}
        if shard_keys:
            kwargs["shard_keys"] = shard_keys
            kwargs["parallelism"] = parallelism
        self._datasets[name] = ray.data.read_sql(sql, connection_factory, **kwargs)

    def register_text(self, name: str, path: str, *, text_col: str = "text") -> None:
        """Raw text corpus: ONE DOCUMENT PER LINE (the common LLM-corpus
        layout; .gz transparent via Arrow). Each row gets a deterministic
        int64 doc id from a 64-bit content hash — stable under re-sharding
        and partitioning (global line numbers would need a cross-block
        barrier); exact duplicate lines collide by construction, which the
        exact-dedup stage removes anyway."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        ds = ray.data.read_text(path)

        def add_id(t: pa.Table) -> pa.Table:
            txt = t["text"].to_numpy(zero_copy_only=False)
            ids = pd.util.hash_array(txt.astype(object)).astype(np.int64)
            return pa.table({"doc_id": pa.array(ids), text_col: t["text"]})

        self._datasets[name] = ds.map_batches(
            add_id, batch_format="pyarrow", zero_copy_batch=True
        )

    def __getitem__(self, name: str) -> ray.data.Dataset:
        if name not in self._datasets and self.base_dir:
            self.register_parquet(name)
        return self._datasets[name]

    def names(self) -> list[str]:
        return sorted(self._datasets)


def table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read one driver-provided testdata table with column pruning."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
