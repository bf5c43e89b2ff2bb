"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so the byte-level decoders are STUBBED: by default each
actor uses a deterministic fake decoder (stable hash of the payload →
plausible metadata/features), and ``strict=True`` raises
``NotImplementedError`` at the decode call — while ALL the Ray-side
plumbing is real and tested: schema handling, binary payload batches,
once-per-actor model setup, small-batch sizing for wide rows, output
layout.

Swap ``_decode_image_real`` etc. with a real implementation and the
stage works unchanged.

Schema conventions:
  media(media_id:int64, kind:string in {image,audio,video},
        payload:binary, mime:string)
  → decoded  adds (width:int32, height:int32, n_channels:int32)   [image]
             or (sample_rate:int32, n_samples:int64)              [audio]
  → features adds embedding: fixed_size_list<float32, dim>
  → frames   one row per sampled frame (video): (media_id, frame_idx,
             payload)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from knowledge_graph_ray.functions.hashing import stable_digest

FEATURE_DIM = 32


def synth_media_table(n: int = 24, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (binary payloads)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, kind_col, payloads, mimes = [], [], [], []
    for i in range(n):
        k = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payloads.append(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
        ids.append(i)
        kind_col.append(k)
        mimes.append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[k])
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
        }
    )


def _fake_image_meta(payload: bytes) -> tuple[int, int, int]:
    h = stable_digest(payload)
    return (64 + h % 1024, 64 + (h >> 10) % 1024, 3)


class ImageDecodeActor:
    """Actor stage: decode image payloads → (width, height, n_channels).

    ``strict=True`` → NotImplementedError from the real decoder stub
    (no imaging library in this environment); default uses the
    deterministic fake so pipelines stay testable end-to-end.
    Use SMALL ``batch_size`` (wide binary rows; SURVEY.md §7)."""

    def __init__(self, strict: bool = False):
        self.strict = strict  # "model load" slot — once per actor

    def _decode_image_real(self, payload: bytes):
        raise NotImplementedError(
            "image decoding requires PIL/opencv — not available in this "
            "container; plug a real decoder here"
        )

    def decode(self, payload: bytes) -> tuple[int, int, int]:
        if self.strict:
            return self._decode_image_real(payload)
        return _fake_image_meta(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        meta = [self.decode(p) for p in payloads]
        out = batch.append_column("width", pa.array([m[0] for m in meta], pa.int32()))
        out = out.append_column("height", pa.array([m[1] for m in meta], pa.int32()))
        return out.append_column(
            "n_channels", pa.array([m[2] for m in meta], pa.int32())
        )


class MediaFeatureActor:
    """Actor stage: payload → feature vector (deterministic fake
    'embedding model'; dim configurable). Real model drops into
    ``_embed_real``."""

    def __init__(self, dim: int = FEATURE_DIM, strict: bool = False):
        self.dim = dim
        self.strict = strict

    def _embed_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError("plug a real media encoder here")

    def embed(self, payload: bytes) -> np.ndarray:
        if self.strict:
            return self._embed_real(payload)
        rng = np.random.default_rng(stable_digest(payload))
        v = rng.standard_normal(self.dim).astype(np.float32)
        return v / np.linalg.norm(v)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        vecs = np.stack([self.embed(p) for p in payloads]) if payloads else np.zeros(
            (0, self.dim), dtype=np.float32
        )
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa.float32()), self.dim
        )
        return batch.append_column("embedding", col)


class FrameSampleActor:
    """Actor stage (video): one row in → k frame rows out. Frame
    extraction is stubbed deterministically (byte slices); the
    exploded-row plumbing is the real part."""

    def __init__(self, frames_per_video: int = 4, strict: bool = False):
        self.k = frames_per_video
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("plug ffmpeg-style frame sampling here")
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_idx, o_payload = [], [], []
        for mid, p in zip(ids, payloads):
            n = max(1, len(p) // self.k)
            for f in range(self.k):
                o_id.append(mid)
                o_idx.append(f)
                o_payload.append(p[f * n : (f + 1) * n])
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame_idx": pa.array(o_idx, pa.int32()),
                "payload": pa.array(o_payload, pa.binary()),
            }
        )


def media_pipeline(ds, *, concurrency=2, batch_size: int = 8):
    """images → decode → features; videos → frame-sample → features.
    Small batch_size: payloads are wide binary rows."""
    images = ds.filter(expr="kind == 'image'").map_batches(
        ImageDecodeActor,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    feats = images.map_batches(
        MediaFeatureActor,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    frames = ds.filter(expr="kind == 'video'").map_batches(
        FrameSampleActor,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    return feats, frames
