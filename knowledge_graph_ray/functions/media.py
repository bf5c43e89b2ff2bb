"""Real byte-level media codecs for the multimodal stages — the
formats a stdlib+numpy sandbox CAN genuinely decode:

- BMP (uncompressed 24-bit, BITMAPINFOHEADER): full header parse +
  pixel-array decode to an (H, W, 3) uint8 RGB array, and the inverse
  encoder (bottom-up rows, 4-byte row padding — the published format).
- WAV (RIFF PCM 16-bit): chunk walk via the stdlib ``wave`` module to
  (sample_rate, (n, channels) int16 samples), plus the encoder.

- PNG (8-bit grayscale / RGB / RGBA, non-interlaced): full chunk walk,
  stdlib ``zlib`` inflate, all five scanline filters (None/Sub/Up/
  Average/Paeth) un-applied per the spec, plus an encoder that can
  exercise every filter type.
- JPEG (``functions/jpeg`` — re-exported here): baseline AND
  progressive (spectral selection + successive approximation) Huffman
  decode, dequant + matrix IDCT, 4:2:0 upsampling, restart intervals;
  validated against real libjpeg-produced files of both kinds.
  Lossless / arithmetic variants raise into the quarantine path.

MP4 needs an H.264 codec that is NOT in this container — video
payloads keep the declared stub path in stages/multimodal.

Feature extraction is real signal processing (numpy only): audio →
RMS / zero-crossing rate / spectral centroid / 4 FFT band energies;
image → per-channel mean+std and an 8-bin luminance histogram.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from knowledge_graph_ray.functions.gif import (  # noqa: F401 (re-export)
    decode_gif,
    encode_gif,
)
from knowledge_graph_ray.functions.jpeg import (  # noqa: F401 (re-export)
    decode_jpeg,
    encode_jpeg,
)

# ------------------------------------------------------------------ BMP

_BMP_HEADER = struct.Struct("<2sIHHI")  # signature, file size, res, offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit BMP bytes."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("24-bit BMP needs 3 channels")
    row_size = (w * 3 + 3) & ~3
    pixel_bytes = row_size * h
    offset = _BMP_HEADER.size + _BMP_INFO.size
    out = bytearray()
    out += _BMP_HEADER.pack(b"BM", offset + pixel_bytes, 0, 0, offset)
    out += _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - w * 3)
    # bottom-up rows, BGR byte order (the format spec)
    for y in range(h - 1, -1, -1):
        out += img[y, :, ::-1].tobytes() + pad
    return bytes(out)


def decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """BMP bytes → (width, height, n_channels, (H, W, 3) uint8 RGB)."""
    sig, _, _, _, offset = _BMP_HEADER.unpack_from(payload, 0)
    if sig != b"BM":
        raise ValueError("not a BMP payload")
    (_, w, h, _, bpp, comp, *_rest) = _BMP_INFO.unpack_from(payload, _BMP_HEADER.size)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=offset
    ).reshape(h, row_size)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if bottom_up:
        img = img[::-1]
    return w, h, 3, np.ascontiguousarray(img)


# ------------------------------------------------------------------ PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray / RGB / RGBA (8-bit)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, *, filter_type: int | str = 0) -> bytes:
    """(H, W) or (H, W, {1,3,4}) uint8 → PNG bytes.

    ``filter_type``: 0–4 applies that scanline filter to every row;
    ``'cycle'`` rotates through all five (one row each) so a decoder
    round-trip test exercises every unfilter path."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int16)
    for y in range(h):
        row = img[y].astype(np.int16)
        ft = (y % 5) if filter_type == "cycle" else int(filter_type)
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
            enc = row - left
        elif ft == 2:  # Up
            enc = row - prev
        elif ft == 3:  # Average
            left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
            enc = row - (left + prev) // 2
        else:  # Paeth
            left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
            ul = np.vstack([np.zeros((1, ch), np.int16), prev[:-1]])
            enc = row - _paeth(left, prev, ul)
        raw += bytes([ft]) + (enc % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.int16)


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """PNG bytes → (width, height, channels, (H, W, C) uint8).

    8-bit grayscale/RGB/RGBA, non-interlaced (the overwhelming web
    majority); palette/16-bit/interlaced raise with a clear message —
    feeding the multimodal stages' quarantine path, never a wrong
    image."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_v, comp, filt, interlace = ihdr
    if depth != 8 or ctype_v not in _PNG_CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={ctype_v}, "
            f"interlace={interlace})"
        )
    ch = _PNG_CHANNELS[ctype_v]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    img = np.zeros((h, w, ch), dtype=np.int16)
    prev = np.zeros((w, ch), dtype=np.int16)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        row = (
            np.frombuffer(raw, np.uint8, stride, off + 1)
            .reshape(w, ch)
            .astype(np.int16)
        )
        if ft == 0:
            cur = row
        elif ft == 2:  # Up — vectorized
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):  # Sub/Average/Paeth — sequential in x
            cur = np.zeros((w, ch), np.int16)
            left = np.zeros(ch, np.int16)
            for x in range(w):
                up = prev[x]
                ul = prev[x - 1] if x else np.zeros(ch, np.int16)
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                cur[x] = (row[x] + pred) % 256
                left = cur[x]
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
        img[y] = cur
        prev = cur
    return w, h, ch, img.astype(np.uint8)


def image_features(img: np.ndarray, dim: int = 32) -> np.ndarray:
    """Real image statistics → unit-norm float32 vector of ``dim``:
    per-channel mean/std (6), 8-bin luminance histogram, aspect ratio,
    zero-padded."""
    f = np.zeros(dim, dtype=np.float32)
    x = img.astype(np.float32) / 255.0
    f[0:3] = x.mean(axis=(0, 1))
    f[3:6] = x.std(axis=(0, 1))
    lum = x @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 1.0))
    f[6:14] = hist / max(1, lum.size)
    f[14] = img.shape[1] / max(1, img.shape[0])
    n = np.linalg.norm(f)
    return f / n if n else f


# ------------------------------------------------------------------ WAV

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 → RIFF/WAVE PCM bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes → (sample_rate, (n, channels) int16)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        data = np.frombuffer(w.readframes(n), dtype="<i2").reshape(-1, ch)
    return rate, data


def audio_features(samples: np.ndarray, sample_rate: int, dim: int = 32) -> np.ndarray:
    """Real DSP features → unit-norm float32 vector of ``dim``: RMS,
    zero-crossing rate, spectral centroid (Hz, normalized by Nyquist),
    4 octave-ish FFT band energy fractions, duration seconds."""
    x = (samples.astype(np.float32) / 32768.0).mean(axis=1)  # mono mix
    f = np.zeros(dim, dtype=np.float32)
    if not len(x):
        return f
    f[0] = float(np.sqrt(np.mean(x**2)))
    f[1] = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))) > 0))
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), d=1.0 / sample_rate)
    tot = spec.sum()
    if tot > 0:
        f[2] = float((spec * freqs).sum() / tot / (sample_rate / 2))
        edges = [0, 250, 1000, 4000, sample_rate / 2]
        for i in range(4):
            band = (freqs >= edges[i]) & (freqs < edges[i + 1])
            f[3 + i] = float(spec[band].sum() / tot)
    f[7] = len(x) / sample_rate
    n = np.linalg.norm(f)
    return f / n if n else f


def sniff_media(payload: bytes) -> str:
    """Byte-signature dispatch: 'bmp' / 'wav' / 'png' / 'gif' /
    'jpeg' / 'mp4' / 'unknown'."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"
