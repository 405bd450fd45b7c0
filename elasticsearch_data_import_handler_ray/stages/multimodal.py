"""Multimodal plumbing: image/audio/video as opaque binary columns + typed
metadata, processed by actor-pool map_batches stages.

The image/audio codecs are NOT in this container, so the decode kernels are
STUBBED (clearly marked) behind ``Decoder`` strategy objects — the Ray-side
plumbing (schema, small batch sizes for large payloads, actor signature,
output layout) is real and tested. A deployment drops in a real decoder
(PIL/torchaudio/ffmpeg) without touching the pipeline shape.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class Decoder:
    """Strategy object: real deployments plug in PIL/ffmpeg here."""

    def decode(self, payload: bytes, mime: str) -> dict:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "use DeterministicFakeDecoder for tests or plug in a real decoder"
        )


class DeterministicFakeDecoder(Decoder):
    """Deterministic fake: derives 'features' from the bytes themselves so
    tests are reproducible with zero native deps."""

    def decode(self, payload: bytes, mime: str) -> dict:
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        return {
            "n_bytes": len(payload),
            "crc32": crc,
            "feature": [
                float((crc >> (8 * i)) & 0xFF) / 255.0 for i in range(4)
            ],
        }


class MediaFeatureStage:
    """Actor-pool stage: decode/feature-extract a binary media column.

    Use SMALL ``batch_size`` (e.g. 64) when payloads are megabytes — a batch ×
    concurrency must fit the worker heap (ray_guide.md "Memory-aware")."""

    def __init__(self, decoder: Decoder | None = None, payload_col: str = "payload"):
        self.decoder = decoder or DeterministicFakeDecoder()
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [
            self.decoder.decode(p.as_py(), m)
            for p, m in zip(t[self.payload_col], t["mime"].to_pylist())
        ]
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "n_bytes": pa.array([f["n_bytes"] for f in feats], type=pa.int64()),
                "crc32": pa.array([f["crc32"] for f in feats], type=pa.int64()),
                "feature": pa.array([f["feature"] for f in feats], type=pa.list_(pa.float32(), 4)),
            }
        )


class MediaResizeStage:
    """Actor-pool stage shape for image resize: real deployments plug a PIL/
    opencv kernel into ``resize``; here the stub re-emits the payload with the
    requested target dims recorded (STUB — no codec in this container).
    Batch sizing rule as MediaFeatureStage."""

    def __init__(self, width: int = 224, height: int = 224):
        self.width, self.height = width, height

    def resize(self, payload: bytes, mime: str) -> bytes:
        # STUB: a real implementation decodes, resizes, re-encodes.
        return payload

    def __call__(self, t: pa.Table) -> pa.Table:
        out = [self.resize(p.as_py(), m) for p, m in zip(t["payload"], t["mime"].to_pylist())]
        n = len(out)
        return (
            t.set_column(t.schema.get_field_index("payload"), "payload", pa.array(out, type=pa.large_binary()))
            .set_column(t.schema.get_field_index("width"), "width", pa.array(np.full(n, self.width, dtype=np.int32)))
            .set_column(t.schema.get_field_index("height"), "height", pa.array(np.full(n, self.height, dtype=np.int32)))
        )


class FrameSampleStage:
    """Actor-pool stage shape for video frame sampling: emits ``n_frames``
    rows per video row (payload sliced deterministically in the stub; a real
    implementation seeks keyframes). Demonstrates the 1→N explode layout for
    media (flat output schema: media_id, frame_idx, frame_payload)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def sample(self, payload: bytes) -> list[bytes]:
        # STUB: deterministic byte-range slices stand in for decoded frames
        k = max(1, min(self.n_frames, len(payload)))
        step = max(1, len(payload) // k)
        return [payload[i * step : (i + 1) * step] for i in range(k)]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, p, kind in zip(
            t["media_id"].to_pylist(), t["payload"], t["kind"].to_pylist()
        ):
            if kind != "video":
                continue
            for i, fr in enumerate(self.sample(p.as_py())):
                ids.append(mid)
                idxs.append(i)
                frames.append(fr)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "frame_payload": pa.array(frames, type=pa.large_binary()),
            }
        )


def synthesize_media_dataset(texts: pa.Table, id_col: str, text_col: str):
    """Build a deterministic fake media table from a text table (payload =
    utf-8 bytes) — lets the plumbing be exercised without real media files."""
    payloads = [v.encode() for v in texts[text_col].to_pylist()]
    n = len(payloads)
    kinds = ["image", "audio", "video"]
    return pa.table(
        {
            "media_id": texts[id_col].cast(pa.int64()) if hasattr(texts[id_col], "cast") else texts[id_col],
            "kind": pa.array([kinds[i % 3] for i in range(n)], type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(["application/octet-stream"] * n, type=pa.string()),
            "width": pa.array(np.full(n, -1, dtype=np.int32)),
            "height": pa.array(np.full(n, -1, dtype=np.int32)),
            "duration_ms": pa.array(np.full(n, -1, dtype=np.int32)),
        }
    )
