"""Baseline JPEG codec: round-trip PSNR bounds, 4:2:0, restart
intervals, and decode of a REAL libjpeg-produced file (the
external-encoder cross-check that a matched encoder/decoder bug pair
cannot fake)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from knowledge_graph_ray.functions.jpeg import decode_jpeg, encode_jpeg

EXTERNAL_JPEG = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/"
    "ext/flower-of-life.jpg"
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def test_roundtrip_gradient_and_noise():
    yy, xx = np.mgrid[0:32, 0:48]
    grad = np.stack(
        [(yy * 4) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    w, h, c, out = decode_jpeg(encode_jpeg(grad, quality=95))
    assert (w, h, c) == (48, 32, 3) and out.shape == grad.shape
    assert _psnr(grad, out) > 40
    noise = np.random.default_rng(3).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assert _psnr(noise, decode_jpeg(encode_jpeg(noise, quality=95))[3]) > 28


def test_roundtrip_420_subsampling_and_odd_dims():
    yy, xx = np.mgrid[0:33, 0:50]
    img = np.stack(
        [(yy * 4) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    w, h, c, out = decode_jpeg(encode_jpeg(img, quality=92, subsampling="4:2:0"))
    assert (w, h, c) == (50, 33, 3) and out.shape == img.shape
    assert _psnr(img, out) > 38


def test_roundtrip_grayscale():
    img = np.random.default_rng(4).integers(0, 256, (13, 11), dtype=np.uint8)
    w, h, c, out = decode_jpeg(encode_jpeg(img, quality=90))
    assert (w, h, c) == (11, 13, 1)
    assert _psnr(img[:, :, None], out) > 30


@pytest.mark.skipif(
    not os.path.exists(EXTERNAL_JPEG), reason="external fixture not on this host"
)
def test_decodes_real_libjpeg_file():
    # 161x161 RGB baseline with DRI restart interval 21 — exercises
    # restart handling and proves interop beyond our own encoder
    with open(EXTERNAL_JPEG, "rb") as fh:
        w, h, c, img = decode_jpeg(fh.read())
    assert (w, h, c) == (161, 161, 3)
    # black-on-white geometric drawing: bright, near-gray balance
    means = img.mean(axis=(0, 1))
    assert means.min() > 180 and means.max() - means.min() < 10
    assert img.std() > 40  # real structure, not a flat decode


PROGRESSIVE_JPEGS = [
    "/usr/share/doc/nodejs/thin-white-stripe.jpg",
    "/usr/share/doc/nodejs/full-white-stripe.jpg",
]


@pytest.mark.skipif(
    not all(os.path.exists(p) for p in PROGRESSIVE_JPEGS),
    reason="external progressive fixtures not on this host",
)
def test_decodes_real_progressive_jpegs():
    # SOF2 spectral-selection + successive-approximation streams from
    # real encoders; near-white doc banners — a refinement-scan bug
    # shows up immediately as speckle (std blows up)
    for path in PROGRESSIVE_JPEGS:
        with open(path, "rb") as fh:
            w, h, c, img = decode_jpeg(fh.read())
        assert c == 3 and img.shape == (h, w, 3)
        assert img.mean() > 200 and img.std() < 80


def test_unsupported_and_junk_refused():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"JUNK")
    # lossless SOF3 must be refused, not mis-decoded
    import struct

    sof3 = (
        b"\xff\xd8"
        + b"\xff\xc3"
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", 8, 8)
        + bytes([1, 1, 0x11, 0])
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_jpeg(sof3)
