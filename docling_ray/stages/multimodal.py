"""Multimodal (image/audio/video) column stages.

Payloads are opaque ``large_binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``).  Decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages with small batch sizes (payloads are MBs — batch × concurrency must
fit worker heap).

The actual codecs (PIL / ffmpeg / torchaudio) are not in this runtime, so
the decode step is STUBBED: with ``strict=True`` it raises
``NotImplementedError`` (the production wiring point), otherwise a
deterministic fake decoder derives pixel/sample statistics from the payload
bytes so the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("media_type", pa.string()),       # image/jpeg, audio/wav, video/mp4, ...
    ("payload", pa.large_binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decode: bytes → pseudo pixel grid."""
    digest = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


class ImageDecodeStage:
    """Actor-pool stage: payload bytes → decoded dimensions + mean color
    features.  Swap ``_decode`` for a PIL/turbojpeg call in production."""

    def __init__(self, strict: bool = False, target_size: int = 64):
        self.strict = strict
        self.target_size = target_size

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "image decode needs PIL/turbojpeg — not in this runtime")
        return _fake_pixels(payload, max(width, 1), max(height, 1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        for payload, w, h in zip(batch["payload"], batch["width"], batch["height"]):
            raw = payload.as_py() or b""
            try:
                pixels = self._decode(raw, w.as_py() or 1, h.as_py() or 1)
                mean = pixels.reshape(-1, 3).mean(axis=0) / 255.0
                feats.append(mean.astype("float32").tolist())
                ok.append(True)
            except NotImplementedError:
                raise
            except Exception:
                feats.append([0.0, 0.0, 0.0])
                ok.append(False)
        out = batch.append_column(
            "mean_rgb", pa.array(feats, pa.list_(pa.float32(), 3)))
        out = out.append_column("decode_ok", pa.array(ok, pa.bool_()))
        return out.drop_columns(["payload"])  # heavy bytes consumed here


class ImageResizeStage:
    """Actor-pool stage: emits resized payloads (fake: truncated digest
    bytes standing in for re-encoded pixels) + new dims."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, payloads = [], [], []
        for payload, w, h in zip(batch["payload"], batch["width"], batch["height"]):
            w0, h0 = max(w.as_py() or 1, 1), max(h.as_py() or 1, 1)
            scale = min(1.0, self.max_side / max(w0, h0))
            widths.append(int(w0 * scale))
            heights.append(int(h0 * scale))
            raw = payload.as_py() or b""
            payloads.append(hashlib.sha256(raw).digest() * 2)
        out = batch.drop_columns(["payload", "width", "height"])
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height", pa.array(heights, pa.int32()))
        return out.append_column("payload", pa.array(payloads, pa.large_binary()))


class FrameSampleStage:
    """Video stage: explode each clip into sampled frame rows (one row per
    sampled timestamp) — the flat-map shape for frame-level models."""

    def __init__(self, fps: float = 1.0):
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, ts_ms, frame_keys = [], [], []
        for media_id, payload, duration in zip(
                batch["media_id"], batch["payload"], batch["duration_ms"]):
            dur = duration.as_py() or 0
            raw = payload.as_py() or b""
            step = int(1000 / self.fps)
            for t in range(0, max(dur, 1), step):
                media_ids.append(media_id.as_py())
                ts_ms.append(t)
                frame_keys.append(
                    hashlib.sha256(raw + t.to_bytes(4, "big")).hexdigest()[:16])
        return pa.table({
            "media_id": pa.array(media_ids, pa.string()),
            "ts_ms": pa.array(ts_ms, pa.int32()),
            "frame_key": pa.array(frame_keys, pa.string()),
        })


def make_media_table(n: int, seed: int = 42, kind: str = "image") -> pa.Table:
    """Deterministic synthetic media rows for tests/benches."""
    rng = np.random.RandomState(seed)
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        payload = rng.bytes(rng.randint(200, 2000))
        rows["media_id"].append(f"{kind}-{seed}-{i:05d}")
        rows["media_type"].append({"image": "image/jpeg", "audio": "audio/wav",
                                   "video": "video/mp4"}[kind])
        rows["payload"].append(payload)
        rows["width"].append(int(rng.randint(32, 1920)) if kind != "audio" else 0)
        rows["height"].append(int(rng.randint(32, 1080)) if kind != "audio" else 0)
        rows["duration_ms"].append(int(rng.randint(1000, 10_000)) if kind != "image" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def image_pipeline(ds, concurrency: int = 2, batch_size: int = 8):
    """Decode as an actor pool with small batches (payload-heavy rows)."""
    return ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=(1, concurrency))
