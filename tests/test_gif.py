"""GIF codec: lossless palette round-trip, animation, real-world
files from the host (external-encoder cross-check), and the frame
sampler's real GIF path."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from knowledge_graph_ray.functions.gif import decode_gif, encode_gif

_EXTERNAL = sorted(glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif"))


def _palette() -> np.ndarray:
    r, g, b = np.meshgrid(
        np.linspace(0, 255, 6), np.linspace(0, 255, 7), np.linspace(0, 255, 6)
    )
    return np.stack([r, g, b], axis=-1).reshape(-1, 3).astype(np.uint8)


def test_animated_roundtrip_exact():
    pal = _palette()
    rng = np.random.default_rng(0)
    frames = [pal[rng.integers(0, len(pal), size=(13, 17))] for _ in range(3)]
    w, h, out = decode_gif(encode_gif(frames))
    assert (w, h) == (17, 13) and len(out) == 3
    for a, b in zip(frames, out):
        assert (a == b).all()  # palette-exact colors → lossless


def test_lzw_table_reset_on_large_frame():
    # enough distinct pixel runs to overflow the 4096-entry LZW table,
    # forcing the encoder's clear-code reset path
    pal = _palette()
    rng = np.random.default_rng(1)
    big = pal[rng.integers(0, len(pal), size=(64, 120))]
    w, h, out = decode_gif(encode_gif([big]))
    assert (w, h) == (120, 64) and (out[0] == big).all()


@pytest.mark.skipif(not _EXTERNAL, reason="no system GIFs on this host")
def test_decodes_real_world_gifs():
    decoded = 0
    for f in _EXTERNAL[:10]:
        with open(f, "rb") as fh:
            w, h, frames = decode_gif(fh.read())
        assert frames and frames[0].shape == (h, w, 3)
        assert frames[0].std() > 5  # real content, not a flat decode
        decoded += 1
    assert decoded >= 5


def test_junk_refused():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE")


def test_frame_sampler_decodes_real_gif_frames(ray_session):
    import pyarrow as pa

    from knowledge_graph_ray.functions.media import decode_png
    from knowledge_graph_ray.stages import multimodal as mm

    pal = _palette()
    rng = np.random.default_rng(2)
    frames = [pal[rng.integers(0, len(pal), size=(10, 12))] for _ in range(6)]
    batch = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([encode_gif(frames)], pa.binary()),
        }
    )
    out = mm.FrameSampleActor(frames_per_video=3)(batch)
    assert out.num_rows == 3
    # sampled frames are standalone PNGs holding the TRUE gif frames
    picks = [0, 2, 5]  # linspace(0, 5, 3) rounded
    for row, src in zip(range(3), picks):
        w, h, c, img = decode_png(out.column("payload")[row].as_py())
        assert (w, h, c) == (12, 10, 3)
        assert (img == frames[src]).all()


def test_gce_not_sticky_across_frames():
    # GIF89a: a Graphic Control Extension applies ONLY to the next
    # rendering block. Frame 1 carries transparency (idx 0); frame 2
    # has NO GCE and must composite fully opaque.
    import struct

    from knowledge_graph_ray.functions.gif import _lzw_encode, decode_gif

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)  # 2x1, 2-color GCT
    out += bytes([0, 0, 0, 255, 255, 255])
    def img(indices):
        body = bytearray(b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0))
        body.append(2)  # min code size
        data = _lzw_encode(2, np.array(indices, np.uint8))
        body.append(len(data)); body += data; body.append(0)
        return bytes(body)
    out += b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # GCE: transparent idx 0
    out += img([0, 1])  # pixel0 transparent, pixel1 white
    out += img([0, 0])  # NO GCE: must paint both pixels black
    out += b"\x3b"
    w, h, frames = decode_gif(bytes(out))
    assert (w, h, len(frames)) == (2, 1, 2)
    assert frames[1].tolist() == [[[0, 0, 0], [0, 0, 0]]]
