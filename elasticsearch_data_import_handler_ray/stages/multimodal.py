"""Multimodal columns: image/audio/video as opaque binary columns + typed
metadata, processed by actor-pool map_batches stages.

REAL decode kernels for every format decodable with stdlib+numpy:

* images — PPM (P6) / PGM (P5): header parse + numpy frombuffer; resize is
  true nearest-neighbor index gather + re-encode.
* audio — WAV (PCM16) via the stdlib ``wave`` module: samples → vectorized
  numpy features (duration, RMS, peak, zero-crossing rate).
* video — real container formats need ffmpeg (absent here), so the video
  path uses an MJPEG-style container we define: length-prefixed
  concatenated PPM frames. Frame sampling genuinely parses the container;
  swapping in an ffmpeg keyframe reader changes one method, not the
  pipeline shape.

Formats outside this set still raise through the ``Decoder`` strategy
object (a deployment plugs PIL/torchaudio in without touching the Ray
plumbing). Batch sizing rule: payloads are large — keep ``batch_size``
small so batch × concurrency fits the worker heap (ray_guide.md
"Memory-aware").
"""

from __future__ import annotations

import io
import struct
import wave
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

MIME_PPM = "image/x-portable-pixmap"
MIME_PGM = "image/x-portable-graymap"
MIME_WAV = "audio/wav"
MIME_FRAMES = "video/x-concatenated-ppm"  # our MJPEG-style demo container


# ------------------------------------------------------------------ PPM/PGM
def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → uint8 array (H, W, 3) or (H, W)."""
    if not payload.startswith((b"P6", b"P5")):
        raise ValueError("not a binary PPM/PGM payload")
    # header: magic, width, height, maxval — whitespace separated, then ONE
    # whitespace byte before pixel data
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    if maxval != 255:
        raise ValueError("only 8-bit PPM/PGM supported")
    ch = 3 if payload.startswith(b"P6") else 1
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    return pix.reshape(h, w, 3) if ch == 3 else pix.reshape(h, w)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """True nearest-neighbor resize — two index gathers, no Python loops."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[rows][:, cols]


# ---------------------------------------------------------------------- WAV
def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.ascontiguousarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples mono-mixed, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        samples = np.frombuffer(raw, dtype=np.int16)
        if w.getnchannels() > 1:
            samples = samples.reshape(-1, w.getnchannels()).mean(axis=1).astype(np.int16)
    return samples, rate


# -------------------------------------------------- demo video container
def encode_frame_container(frames: list[bytes]) -> bytes:
    """Length-prefixed concatenation (our MJPEG-style demo container)."""
    return b"".join(struct.pack("<I", len(f)) + f for f in frames)


def decode_frame_container(payload: bytes) -> list[bytes]:
    out, i = [], 0
    while i + 4 <= len(payload):
        (n,) = struct.unpack_from("<I", payload, i)
        i += 4
        if i + n > len(payload):
            raise ValueError("truncated frame container")
        out.append(payload[i : i + n])
        i += n
    return out


# ------------------------------------------------------------------ stages
class Decoder:
    """Strategy object: formats beyond PPM/PGM/WAV need a real codec
    (PIL/torchaudio) plugged in here; the Ray pipeline shape is unchanged."""

    def decode(self, payload: bytes, mime: str) -> dict:
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        base = {"n_bytes": len(payload), "crc32": crc}
        if mime in (MIME_PPM, MIME_PGM):
            img = decode_ppm(payload)
            rgb = img if img.ndim == 3 else np.repeat(img[..., None], 3, axis=2)
            means = rgb.reshape(-1, 3).mean(axis=0) / 255.0
            base["feature"] = [
                float(means[0]), float(means[1]), float(means[2]),
                float(rgb.std() / 255.0),
            ]
        elif mime == MIME_FRAMES:
            frames = decode_frame_container(payload)
            first = decode_ppm(frames[0]) if frames else np.zeros((1, 1, 3), np.uint8)
            rgb = first if first.ndim == 3 else np.repeat(first[..., None], 3, axis=2)
            means = rgb.reshape(-1, 3).mean(axis=0) / 255.0
            base["feature"] = [
                float(means[0]), float(means[1]), float(means[2]),
                float(len(frames)),
            ]
        elif mime == MIME_WAV:
            samples, rate = decode_wav(payload)
            x = samples.astype(np.float64) / 32768.0
            zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
            base["feature"] = [
                float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,  # rms
                float(np.abs(x).max()) if len(x) else 0.0,          # peak
                zc,                                                  # zero-cross rate
                float(len(x)) / rate,                                # duration s
            ]
        else:
            raise NotImplementedError(
                f"no codec for {mime!r} in this environment "
                "(plug a PIL/torchaudio-backed Decoder in)"
            )
        return base


class DeterministicFakeDecoder(Decoder):
    """Byte-derived pseudo-features — reproducible with zero decode work;
    kept for payloads in formats this environment cannot decode."""

    def decode(self, payload: bytes, mime: str) -> dict:
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        return {
            "n_bytes": len(payload),
            "crc32": crc,
            "feature": [float((crc >> (8 * i)) & 0xFF) / 255.0 for i in range(4)],
        }


class MediaFeatureStage:
    """Actor-pool stage: decode/feature-extract a binary media column."""

    def __init__(self, decoder: Decoder | None = None, payload_col: str = "payload"):
        self.decoder = decoder or Decoder()  # real PPM/PGM/WAV kernels
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
    """Actor-pool image resize: REAL decode → nearest-neighbor resize →
    re-encode for PPM/PGM; other mimes pass through unchanged (documented —
    a PIL-backed subclass overrides ``resize``)."""

    def __init__(self, width: int = 224, height: int = 224):
        self.width, self.height = width, height

    def resize(self, payload: bytes, mime: str) -> bytes:
        if mime in (MIME_PPM, MIME_PGM):
            img = decode_ppm(payload)
            rgb = img if img.ndim == 3 else np.repeat(img[..., None], 3, axis=2)
            return encode_ppm(resize_nearest(rgb, self.width, self.height))
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
    """Actor-pool video frame sampling: parses the length-prefixed frame
    container and emits ``n_frames`` evenly-spaced frames per video row —
    the 1→N explode layout (flat schema: media_id, frame_idx,
    frame_payload). An ffmpeg-backed subclass overrides ``sample``."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def sample(self, payload: bytes, mime: str) -> list[bytes]:
        if mime == MIME_FRAMES:
            frames = decode_frame_container(payload)
            if len(frames) <= self.n_frames:
                return frames
            idx = (np.arange(self.n_frames) * len(frames)) // self.n_frames
            return [frames[int(i)] for i in idx]
        # unknown container: deterministic byte-range slices (documented fallback)
        k = max(1, min(self.n_frames, len(payload)))
        step = max(1, len(payload) // k)
        return [payload[i * step : (i + 1) * step] for i in range(k)]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, p, kind, mime in zip(
            t["media_id"].to_pylist(), t["payload"], t["kind"].to_pylist(), t["mime"].to_pylist()
        ):
            if kind != "video":
                continue
            for i, fr in enumerate(self.sample(p.as_py(), mime)):
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
    """Deterministic REAL media table derived from a text table: PPM gradient
    images, WAV sine tones, concatenated-PPM 'videos' — every payload decodes
    with the real kernels above; all parameters derive from the row id."""
    ids = [int(v) for v in texts[id_col].to_pylist()]
    n = len(ids)
    kinds, payloads, mimes, widths, heights, durs = [], [], [], [], [], []
    for i, mid in enumerate(ids):
        kind = ("image", "audio", "video")[i % 3]
        kinds.append(kind)
        rng = np.random.default_rng(mid & 0xFFFFFFFF)
        if kind == "image":
            w, h = 32 + (mid % 17), 24 + (mid % 13)
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                    (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                    rng.integers(0, 256, size=(h, w), dtype=np.uint8),
                ],
                axis=2,
            )
            payloads.append(encode_ppm(img))
            mimes.append(MIME_PPM)
            widths.append(w); heights.append(h); durs.append(-1)
        elif kind == "audio":
            rate, freq = 8000, 110.0 + (mid % 40) * 10
            tt = np.arange(rate // 4) / rate  # 250 ms
            samples = (np.sin(2 * np.pi * freq * tt) * 12000).astype(np.int16)
            payloads.append(encode_wav(samples, rate))
            mimes.append(MIME_WAV)
            widths.append(-1); heights.append(-1); durs.append(250)
        else:
            frames = []
            for f in range(6):
                img = np.full((8, 8, 3), (mid + f) % 256, dtype=np.uint8)
                frames.append(encode_ppm(img))
            payloads.append(encode_frame_container(frames))
            mimes.append(MIME_FRAMES)
            widths.append(8); heights.append(8); durs.append(6 * 40)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(mimes, type=pa.string()),
            "width": pa.array(np.array(widths, dtype=np.int32)),
            "height": pa.array(np.array(heights, dtype=np.int32)),
            "duration_ms": pa.array(np.array(durs, dtype=np.int32)),
        }
    )
