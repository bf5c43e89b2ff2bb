"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

Decode reality in this sandbox (no PIL / torchaudio / ffmpeg):
- BMP, PNG (every wild variant incl. palette/Adam7 — 4,900+ system
  files decode clean), JPEG (baseline AND progressive), GIF (incl.
  animation — FrameSampleActor samples TRUE frames), TIFF, netpbm and
  RIFF/WAV PCM audio are decoded FOR REAL; MP3 gets real header-walk
  metadata — ``functions/media`` implements the published byte
  formats with stdlib+numpy, each validated against real system
  files, and features are real signal statistics (RMS, ZCR, spectral
  centroid, luminance histograms).
- MP4/H.264 and non-WAV audio upgrade to REAL decode through a
  capability-detected ffmpeg CLI hook (``ffmpeg="auto"`` probes PATH
  once per actor; subprocess per payload, exercised in tests via a
  PATH shim). Without an ffmpeg binary those payloads take the
  declared stub path — deterministic fake metadata by default,
  ``strict=True`` raises at the decode call. The Ray-side plumbing
  (schema, binary batches, once-per-actor setup, small-batch sizing,
  frame-explode layout) is identical for all paths.

Schema conventions:
  media(media_id:int64, kind:string in {image,audio,video},
        payload:binary, mime:string)
  → decoded  adds (width:int32, height:int32, n_channels:int32)   [image]
             or (sample_rate:int32, n_samples:int64, n_channels:int32) [audio]
  → features adds embedding: fixed_size_list<float32, dim>
  → frames   one row per sampled frame (video): (media_id, frame_idx,
             payload, error) — error non-null marks a quarantined
             video (frame_idx=-1, empty payload)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np
import pyarrow as pa

from knowledge_graph_ray.functions import media as M
from knowledge_graph_ray.functions.hashing import stable_digest

FEATURE_DIM = 32
FFMPEG_TIMEOUT_S = 120  # per payload; a hung decode must not wedge the actor


def _resolve_ffmpeg(ffmpeg: str | None) -> str | None:
    """Capability detection for the ffmpeg CLI hook: ``"auto"`` probes
    PATH (once per actor, in __init__), an explicit path/binary name is
    taken as-is, None/"" disables the hook (stub/strict paths apply)."""
    if ffmpeg == "auto":
        return shutil.which("ffmpeg")
    return ffmpeg or None


def synth_media_table(n: int = 24, seed: int = 42) -> pa.Table:
    """Deterministic media corpus with REAL bytes where decodable:
    images rotate genuine 24-bit BMPs, filter-cycled PNGs and 4:2:0
    baseline JPEGs, audio rows are genuine 16-bit PCM WAVs (sine +
    noise), video rows are mp4-signature stubs."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, kind_col, payloads, mimes = [], [], [], []
    for i in range(n):
        k = kinds[i % 3]
        if k == "image":
            w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            fmt = (i // 3) % 3  # rotate real formats: BMP / PNG / JPEG
            if fmt == 0:
                payloads.append(M.encode_bmp(img))
                mimes.append("image/bmp")
            elif fmt == 1:
                payloads.append(M.encode_png(img, filter_type="cycle"))
                mimes.append("image/png")
            else:
                payloads.append(
                    M.encode_jpeg(img, quality=92, subsampling="4:2:0")
                )
                mimes.append("image/jpeg")
        elif k == "audio":
            rate = 8000
            dur = int(rng.integers(400, 1600))
            t = np.arange(dur, dtype=np.float32) / rate
            freq = float(rng.integers(100, 1200))
            x = 0.6 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(dur)
            payloads.append(
                M.encode_wav((np.clip(x, -1, 1) * 32767).astype(np.int16), rate)
            )
            mimes.append("audio/wav")
        elif k == "video" and (i // 3) % 2:
            # real animated GIF: 4 frames of palette-exact noise
            from knowledge_graph_ray.functions.gif import encode_gif

            rr, gg, bb = np.meshgrid(
                np.linspace(0, 255, 6), np.linspace(0, 255, 7), np.linspace(0, 255, 6)
            )
            pal = np.stack([rr, gg, bb], -1).reshape(-1, 3).astype(np.uint8)
            fw, fh = int(rng.integers(8, 17)), int(rng.integers(8, 17))
            frames = [
                pal[rng.integers(0, len(pal), size=(fh, fw))] for _ in range(4)
            ]
            payloads.append(encode_gif(frames))
            mimes.append("image/gif")
        else:
            size = int(rng.integers(256, 4096))
            body = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
            payloads.append(b"\x00\x00\x00\x18ftypmp42" + body)
            mimes.append("video/mp4")
        ids.append(i)
        kind_col.append(k)
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

    BMP, PNG and baseline JPEG payloads decode for real (header/chunk
    parse; zlib inflate + unfilter for PNG; Huffman + IDCT for JPEG).
    Other formats: ``strict=True`` raises from the stub (no codec libs
    in this environment); default falls back to the deterministic
    fake.
    Use SMALL ``batch_size`` (wide binary rows; SURVEY.md §7)."""

    def __init__(self, strict: bool = False):
        self.strict = strict  # "model load" slot — once per actor

    def _decode_image_real(self, payload: bytes):
        raise NotImplementedError(
            "compressed image decoding requires PIL/opencv — not available "
            "in this container; plug a real decoder here"
        )

    def decode(self, payload: bytes) -> tuple[int, int, int]:
        kind = M.sniff_media(payload)
        if kind == "bmp":
            w, h, c, _ = M.decode_bmp(payload)
            return (w, h, c)
        if kind == "png":
            w, h, c, _ = M.decode_png(payload)
            return (w, h, c)
        if kind == "jpeg":
            w, h, c, _ = M.decode_jpeg(payload)
            return (w, h, c)
        if kind == "gif":
            w, h, _ = M.decode_gif(payload)
            return (w, h, 3)
        if kind == "tiff":
            w, h, c, _ = M.decode_tiff(payload)
            return (w, h, c)
        if kind == "netpbm":
            w, h, c, _ = M.decode_netpbm(payload)
            return (w, h, c)
        if self.strict:
            return self._decode_image_real(payload)
        return _fake_image_meta(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        meta, errs = [], []
        for p in payloads:
            # per-row quarantine: a corrupt/truncated payload must not
            # fail the batch (reference discipline: error column, row
            # survives — get_files.py-style)
            try:
                meta.append(self.decode(p))
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — untrusted bytes:
                # any decoder exception (ValueError, zlib/struct errors,
                # NotImplementedError) means quarantine, never job death
                meta.append((0, 0, 0))
                errs.append(f"{type(e).__name__}: {e}")
        out = batch.append_column("width", pa.array([m[0] for m in meta], pa.int32()))
        out = out.append_column("height", pa.array([m[1] for m in meta], pa.int32()))
        out = out.append_column(
            "n_channels", pa.array([m[2] for m in meta], pa.int32())
        )
        return out.append_column("decode_error", pa.array(errs, pa.string()))


class AudioDecodeActor:
    """Actor stage: decode RIFF/WAV PCM payloads → (sample_rate,
    n_samples, n_channels); MP3 payloads get REAL header-walk metadata
    (rate/duration/channels without audio decode —
    ``media.mp3_metadata``). Other audio: strict raises, default emits
    fake metadata (declared stub path)."""

    def __init__(self, strict: bool = False, ffmpeg: str | None = "auto"):
        self.strict = strict
        self.ffmpeg = _resolve_ffmpeg(ffmpeg)  # probed once per actor

    def _decode_via_ffmpeg(self, payload: bytes) -> tuple[int, int, int]:
        """Transcode any codec ffmpeg knows to WAV and reuse the real
        PCM parser (functions/media.decode_wav). File (not pipe)
        output on purpose: ffmpeg finalizes RIFF sizes only on
        seekable outputs."""
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.bin")
            dst = os.path.join(td, "out.wav")
            with open(src, "wb") as f:
                f.write(payload)
            proc = subprocess.run(
                [self.ffmpeg, "-v", "error", "-i", src, dst],
                capture_output=True,
                timeout=FFMPEG_TIMEOUT_S,
            )
            if proc.returncode != 0 or not os.path.exists(dst):
                raise RuntimeError(
                    f"ffmpeg: {proc.stderr.decode(errors='replace')[:200]}"
                )
            with open(dst, "rb") as f:
                rate, data = M.decode_wav(f.read())
        return (rate, data.shape[0], data.shape[1])

    def decode(self, payload: bytes) -> tuple[int, int, int]:
        kind = M.sniff_media(payload)
        if kind == "wav":
            rate, data = M.decode_wav(payload)
            return (rate, data.shape[0], data.shape[1])
        if kind == "mp3":
            rate, n, ch = M.mp3_metadata(payload)
            return (rate, n, ch)
        if self.ffmpeg:
            return self._decode_via_ffmpeg(payload)
        if self.strict:
            raise NotImplementedError(
                "non-WAV audio needs ffmpeg on PATH (none found)"
            )
        h = stable_digest(payload)
        return (8000 + (h % 5) * 8000, 1000 + h % 100000, 1 + h % 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        meta, errs = [], []
        for p in payloads:
            try:
                meta.append(self.decode(p))
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — untrusted bytes
                meta.append((0, 0, 0))
                errs.append(f"{type(e).__name__}: {e}")
        out = batch.append_column(
            "sample_rate", pa.array([m[0] for m in meta], pa.int32())
        )
        out = out.append_column(
            "n_samples", pa.array([m[1] for m in meta], pa.int64())
        )
        out = out.append_column(
            "n_channels", pa.array([m[2] for m in meta], pa.int32())
        )
        return out.append_column("decode_error", pa.array(errs, pa.string()))


class MediaFeatureActor:
    """Actor stage: payload → feature vector. BMP/PNG/JPEG/WAV payloads
    get REAL features (image statistics / DSP); other formats fall back to
    the deterministic hash fake (or raise under strict). A real
    encoder model drops into ``_embed_real``."""

    def __init__(self, dim: int = FEATURE_DIM, strict: bool = False):
        self.dim = dim
        self.strict = strict

    def _embed_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError("plug a real media encoder here")

    def embed(self, payload: bytes) -> np.ndarray:
        kind = M.sniff_media(payload)
        if kind == "bmp":
            _, _, _, img = M.decode_bmp(payload)
            return M.image_features(img, self.dim)
        if kind == "png":
            _, _, _, img = M.decode_png(payload)
            return M.image_features(img, self.dim)
        if kind == "jpeg":
            _, _, _, img = M.decode_jpeg(payload)
            return M.image_features(img, self.dim)
        if kind == "gif":
            _, _, frames = M.decode_gif(payload)
            if frames:
                return M.image_features(frames[0], self.dim)
        if kind == "tiff":
            _, _, _, img = M.decode_tiff(payload)
            return M.image_features(img, self.dim)
        if kind == "netpbm":
            _, _, _, img = M.decode_netpbm(payload)
            return M.image_features(img, self.dim)
        if kind == "wav":
            rate, data = M.decode_wav(payload)
            return M.audio_features(data, rate, self.dim)
        if self.strict:
            return self._embed_real(payload)
        rng = np.random.default_rng(stable_digest(payload))
        v = rng.standard_normal(self.dim).astype(np.float32)
        return v / np.linalg.norm(v)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        vecs, errs = [], []
        for p in payloads:
            try:
                vecs.append(self.embed(p))
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — untrusted bytes
                # corrupt payload: zero vector + error, never a fake
                vecs.append(np.zeros(self.dim, dtype=np.float32))
                errs.append(f"{type(e).__name__}: {e}")
        stacked = (
            np.stack(vecs) if vecs else np.zeros((0, self.dim), dtype=np.float32)
        )
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(stacked.ravel(), pa.float32()), self.dim
        )
        out = batch.append_column("embedding", col)
        return out.append_column("feature_error", pa.array(errs, pa.string()))


class FrameSampleActor:
    """Actor stage (video/animation): one row in → k frame rows out.

    Animated GIFs are decoded FOR REAL (``functions/gif`` LZW +
    composition): k frames are sampled evenly from the true frame
    sequence and re-emitted as standalone PNG payloads, ready for the
    image stages downstream. MP4 (or anything else ffmpeg can read)
    upgrades to REAL frame extraction when an ffmpeg binary is
    capability-detected (``ffmpeg="auto"`` probes PATH once per
    actor); without one the deterministic byte-slice stub applies
    (``strict=True`` raises instead). A failed decode quarantines the
    ROW — one (frame_idx=-1, empty payload, error) marker row — never
    the batch."""

    def __init__(
        self,
        frames_per_video: int = 4,
        strict: bool = False,
        ffmpeg: str | None = "auto",
    ):
        self.k = frames_per_video
        self.strict = strict
        self.ffmpeg = _resolve_ffmpeg(ffmpeg)  # probed once per actor

    def _frames_ffmpeg(self, payload: bytes) -> list[bytes]:
        """Real frame extraction via the ffmpeg CLI: payload → temp
        file → every frame dumped as PNG → k sampled evenly. One
        subprocess per VIDEO (not per frame); for hour-long inputs
        swap the full dump for an ``-vf fps=`` pre-filter."""
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.bin")
            with open(src, "wb") as f:
                f.write(payload)
            proc = subprocess.run(
                [
                    self.ffmpeg,
                    "-v",
                    "error",
                    "-i",
                    src,
                    "-vsync",
                    "0",
                    os.path.join(td, "f%06d.png"),
                ],
                capture_output=True,
                timeout=FFMPEG_TIMEOUT_S,
            )
            outs = sorted(f for f in os.listdir(td) if f.endswith(".png"))
            if proc.returncode != 0 or not outs:
                raise RuntimeError(
                    f"ffmpeg: {proc.stderr.decode(errors='replace')[:200]}"
                )
            pick = np.linspace(0, len(outs) - 1, self.k).round().astype(int)
            frames = []
            for i in pick:
                with open(os.path.join(td, outs[i]), "rb") as f:
                    frames.append(f.read())
        return frames

    def frames_of(self, payload: bytes) -> list[bytes]:
        if M.sniff_media(payload) == "gif":
            _, _, frames = M.decode_gif(payload)
            if not frames:
                return []
            pick = np.linspace(0, len(frames) - 1, self.k).round().astype(int)
            return [M.encode_png(frames[i]) for i in pick]
        if self.ffmpeg:
            return self._frames_ffmpeg(payload)
        if self.strict:
            raise NotImplementedError(
                "video frame sampling needs ffmpeg on PATH (none found)"
            )
        n = max(1, len(payload) // self.k)
        return [payload[f * n : (f + 1) * n] for f in range(self.k)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_idx, o_payload, o_err = [], [], [], []
        for mid, p in zip(ids, payloads):
            try:
                fps = self.frames_of(p)
            except Exception as e:  # noqa: BLE001 — untrusted bytes:
                # quarantine marker row; the batch (and job) survive
                o_id.append(mid)
                o_idx.append(-1)
                o_payload.append(b"")
                o_err.append(f"{type(e).__name__}: {e}")
                continue
            for f, fp in enumerate(fps):
                o_id.append(mid)
                o_idx.append(f)
                o_payload.append(fp)
                o_err.append(None)
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame_idx": pa.array(o_idx, pa.int32()),
                "payload": pa.array(o_payload, pa.binary()),
                "error": pa.array(o_err, pa.string()),
            }
        )


def media_pipeline(
    ds, *, concurrency=2, batch_size: int = 8, ffmpeg: str | None = "auto"
):
    """images → decode → features; audio → decode → features; videos →
    frame-sample. Small batch_size: payloads are wide binary rows.

    ``ffmpeg`` is threaded to the audio/video actors: ``"auto"`` probes
    PATH once per actor (deploy default), ``None`` pins the pure-Python
    stub path — synthetic/stub corpora MUST pass ``None`` so pipeline
    output does not flip with the host's PATH contents (the synth mp4
    stubs are not real media; a host ffmpeg would quarantine them)."""
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
    audio = ds.filter(expr="kind == 'audio'").map_batches(
        AudioDecodeActor,
        fn_constructor_kwargs={"ffmpeg": ffmpeg},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    audio_feats = audio.map_batches(
        MediaFeatureActor,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    frames = ds.filter(expr="kind == 'video'").map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={"ffmpeg": ffmpeg},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    return feats, frames, audio_feats
