"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

The Ray-side plumbing here is REAL and tested — schemas, small-batch
actor-pool stages, output layout. The codec work itself (JPEG decode,
resampling, frame sampling) is STUBBED behind ``DecodeBackend`` because
no image/audio library ships in this container: the default backend is a
deterministic fake (byte-statistics "decode"); a real backend (PIL/librosa/
pyav) plugs in via ``fn_constructor_kwargs`` without touching the pipeline.

Scale notes baked into the stage shapes:
- binary payloads dominate block bytes → the stages force SMALL batch
  sizes (``MM_BATCH_SIZE``) so batch × concurrency fits worker heaps;
- metadata-only transforms (``select_columns`` first) never move payloads.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MM_BATCH_SIZE = 16  # payload batches stay small: bytes, not rows, budget

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("format", pa.string()),  # jpeg | png | wav | mp4 | ...
        ("payload", pa.binary()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeBackend:
    """Codec seam. ``decode(payload, fmt) -> np.ndarray`` must return a
    (h, w, c) uint8 array for images / (n_samples,) float32 for audio.
    The deterministic fake derives pixels from a sha256 keystream of the
    payload — stable across runs, no codec deps."""

    real = False

    def decode_image(self, payload: bytes, fmt: str, h: int, w: int) -> np.ndarray:
        if h <= 0 or w <= 0:
            raise NotImplementedError(
                "real image decode requires an imaging library (PIL/cv2) — "
                "not available in this environment; provide dimensions in "
                "metadata or plug a real DecodeBackend"
            )
        n = h * w * 3
        stream = bytearray()
        seed = hashlib.sha256(payload).digest()
        block = seed
        while len(stream) < n:
            block = hashlib.sha256(block).digest()
            stream.extend(block)
        return np.frombuffer(bytes(stream[:n]), dtype=np.uint8).reshape(h, w, 3)

    def decode_audio(self, payload: bytes, fmt: str, n_samples: int) -> np.ndarray:
        img = self.decode_image(payload, fmt, 1, max(1, (n_samples + 2) // 3))
        return (img.reshape(-1)[:n_samples].astype(np.float32) - 127.5) / 127.5

    def decode_video_frame(self, payload: bytes, fmt: str, h: int, w: int,
                           frame_idx: int) -> np.ndarray:
        """One (h, w, 3) frame. The fake salts the keystream with the frame
        index so frames differ deterministically; a real backend (pyav)
        seeks+decodes instead."""
        return self.decode_image(
            payload + int(frame_idx).to_bytes(4, "big"), fmt, h, w
        )


class ImageFeatureExtractor:
    """Actor-pool stage: decode → per-channel mean/std + payload sha —
    the shape of a real embed/feature stage (model in __init__, batched
    inference in __call__)."""

    def __init__(self, backend: Optional[DecodeBackend] = None):
        self.backend = backend or DecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        fmts = batch.column("format").to_pylist()
        hs = batch.column("height").to_pylist()
        ws = batch.column("width").to_pylist()
        means, stds, shas = [], [], []
        for p, f, h, w in zip(payloads, fmts, hs, ws):
            img = self.backend.decode_image(p, f, h, w)
            means.append([float(img[..., c].mean()) for c in range(3)])
            stds.append([float(img[..., c].std()) for c in range(3)])
            shas.append(hashlib.sha256(p).hexdigest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "channel_mean": pa.array(means, pa.list_(pa.float64())),
                "channel_std": pa.array(stds, pa.list_(pa.float64())),
                "payload_sha256": pa.array(shas, pa.string()),
            }
        )


class ImageResizer:
    """Actor-pool stage: decode → nearest-neighbor resize → re-emit payload
    (raw RGB bytes) + updated dims. Resize math is real numpy; only the
    initial codec decode is behind the backend seam."""

    def __init__(self, target: tuple[int, int] = (32, 32),
                 backend: Optional[DecodeBackend] = None):
        self.target = target
        self.backend = backend or DecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, tw = self.target
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        fmts = batch.column("format").to_pylist()
        hs = batch.column("height").to_pylist()
        ws = batch.column("width").to_pylist()
        out_payloads = []
        for p, f, h, w in zip(payloads, fmts, hs, ws):
            img = self.backend.decode_image(p, f, h, w)
            yi = (np.arange(th) * h // th).clip(0, h - 1)
            xi = (np.arange(tw) * w // tw).clip(0, w - 1)
            out_payloads.append(img[yi][:, xi].tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": batch.column("kind"),
                "format": pa.array(["rgb8"] * len(ids), pa.string()),
                "payload": pa.array(out_payloads, pa.binary()),
                "width": pa.array([tw] * len(ids), pa.int32()),
                "height": pa.array([th] * len(ids), pa.int32()),
                "duration_ms": batch.column("duration_ms"),
            }
        )


class AudioFrameSampler:
    """Actor-pool stage: decode audio → fixed-stride frame energies.
    (duration_ms drives the fake sample count: 16 samples/ms.)"""

    def __init__(self, frame: int = 256, backend: Optional[DecodeBackend] = None):
        self.frame = frame
        self.backend = backend or DecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        fmts = batch.column("format").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        energies = []
        for p, f, d in zip(payloads, fmts, durs):
            wave = self.backend.decode_audio(p, f, max(int(d) * 16, self.frame))
            n_frames = len(wave) // self.frame
            fr = wave[: n_frames * self.frame].reshape(n_frames, self.frame)
            energies.append(np.sqrt((fr**2).mean(axis=1)).astype(float).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_rms": pa.array(energies, pa.list_(pa.float64())),
            }
        )


class VideoFrameSampler:
    """Actor-pool stage: fixed-stride frame sampling from video payloads —
    decode only every ``stride``-th frame (the scale-critical property: a
    sampler must never decode all frames), emit per-sampled-frame channel
    means. ``duration_ms`` × ``fps`` derives the frame count."""

    def __init__(self, stride: int = 5, fps: int = 30,
                 backend: Optional[DecodeBackend] = None):
        self.stride = stride
        self.fps = fps
        self.backend = backend or DecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        fmts = batch.column("format").to_pylist()
        hs = batch.column("height").to_pylist()
        ws = batch.column("width").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        sampled_idx, frame_means = [], []
        for p, f, h, w, d in zip(payloads, fmts, hs, ws, durs):
            n_frames = max(1, int(d) * self.fps // 1000)
            idxs = list(range(0, n_frames, self.stride))
            means = [
                float(self.backend.decode_video_frame(p, f, h, w, i).mean())
                for i in idxs
            ]
            sampled_idx.append(idxs)
            frame_means.append(means)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(sampled_idx, pa.list_(pa.int32())),
                "frame_mean": pa.array(frame_means, pa.list_(pa.float64())),
            }
        )


def synthetic_media_table(n: int, seed: int = 0,
                          kinds: tuple = ("image", "audio")) -> pa.Table:
    """Deterministic media fixture rows (binary payloads + metadata)."""
    import random

    rng = random.Random(seed)
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    formats = {"image": "jpeg", "audio": "wav", "video": "mp4"}
    for i in range(n):
        kind = kinds[i % len(kinds)]
        payload = hashlib.sha256(f"media{i}-{seed}".encode()).digest() * (
            4 + rng.randint(0, 4)
        )
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["format"].append(formats[kind])
        rows["payload"].append(payload)
        rows["width"].append(
            rng.choice([16, 32, 64]) if kind != "audio" else -1
        )
        rows["height"].append(rng.choice([16, 32]) if kind != "audio" else -1)
        rows["duration_ms"].append(
            rng.randint(10, 100) if kind != "image" else -1
        )
    return pa.table(rows, schema=MEDIA_SCHEMA)
