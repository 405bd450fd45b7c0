"""Document identity + row invariants (SURVEY.md §2.A21/§2.A22).

The reference made re-imports idempotent by mapping a configured id column to
the ES document id (``es.mapping.id``). Here document identity is
``doc_id = blake2b64(repo ‖ path ‖ commit)`` — deterministic, order-free, and
stable across runs/partitionings — and the per-row invariant mandated by
BASELINE.json:15 is ``sha256(content)``.

These are per-row ``hashlib`` calls (cryptographic hashing has no vectorized
numpy kernel); the sha256 invariant forces a per-row pass anyway, so doc_id is
computed in the same pass. Everything else in the build pipeline stays
vectorized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_SEP = b"\x1f"


def doc_id_of(repo: str, path: str, commit: str) -> int:
    h = hashlib.blake2b(
        repo.encode() + _SEP + path.encode() + _SEP + commit.encode(), digest_size=8
    )
    return int.from_bytes(h.digest(), "little")


def doc_ids_batch(repo: pa.Array, path: pa.Array, commit: pa.Array) -> np.ndarray:
    out = np.empty(len(repo), dtype=np.uint64)
    blake = hashlib.blake2b
    for i, (r, p, c) in enumerate(zip(repo.to_pylist(), path.to_pylist(), commit.to_pylist())):
        h = blake(r.encode() + _SEP + p.encode() + _SEP + c.encode(), digest_size=8)
        out[i] = int.from_bytes(h.digest(), "little")
    return out


def sha256_batch(content: pa.Array) -> list[str]:
    sha = hashlib.sha256
    # operate on the raw utf-8 buffers via pyarrow cast to binary (no copy)
    return [sha(v.encode()).hexdigest() for v in content.to_pylist()]
