"""Multimodal stage plumbing + corpus build pipeline + M5 segmentation."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

import numpy as np
import pytest

import ray.data as rd

from knowledge_graph_ray.functions.segment import (
    activated_similarities,
    local_minima,
    semantic_paragraphs,
)
from knowledge_graph_ray.stages import multimodal as mm
from knowledge_graph_ray.stages.embed import HashEmbedder
from knowledge_graph_ray.stages.segment_semantic import SemanticSegmentActor
from knowledge_graph_ray.sources import synth


# ------------------------------------------------------------- multimodal

def test_media_table_deterministic():
    a, b = mm.synth_media_table(12), mm.synth_media_table(12)
    assert a.equals(b)


def test_image_decode_plumbing(ray_session):
    ds = rd.from_arrow(mm.synth_media_table(24))
    feats, frames, audio = mm.media_pipeline(ds, concurrency=1, batch_size=4, ffmpeg=None)
    frows = feats.take_all()
    assert len(frows) == 8  # 24/3 images
    for r in frows:
        # REAL BMP decode: dims are the synth generator's true pixel dims
        assert 8 <= r["width"] <= 32 and 8 <= r["height"] <= 32
        assert r["n_channels"] == 3
        assert len(r["embedding"]) == mm.FEATURE_DIM
        assert abs(float(np.linalg.norm(r["embedding"])) - 1.0) < 1e-5
    arows = audio.take_all()
    assert len(arows) == 8
    for r in arows:
        # REAL WAV decode: generator writes 8 kHz mono PCM
        assert r["sample_rate"] == 8000 and r["n_channels"] == 1
        assert 400 <= r["n_samples"] <= 1600
    vrows = frames.take_all()
    assert len(vrows) == 8 * 4  # frames_per_video
    assert {r["frame_idx"] for r in vrows} == {0, 1, 2, 3}


def test_media_codecs_roundtrip():
    from knowledge_graph_ray.functions import media as M

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    w, h, c, back = M.decode_bmp(M.encode_bmp(img))
    assert (w, h, c) == (21, 13, 3)
    assert (back == img).all()  # byte-exact pixel round-trip

    x = (rng.standard_normal(1234) * 8000).astype(np.int16)
    rate, data = M.decode_wav(M.encode_wav(x, 16000))
    assert rate == 16000 and data.shape == (1234, 1)
    assert (data[:, 0] == x).all()


def test_audio_features_detect_tone():
    from knowledge_graph_ray.functions import media as M

    rate = 8000
    t = np.arange(rate, dtype=np.float32) / rate
    low = (np.sin(2 * np.pi * 150 * t) * 20000).astype(np.int16)[:, None]
    high = (np.sin(2 * np.pi * 3000 * t) * 20000).astype(np.int16)[:, None]
    f_low = M.audio_features(low, rate)
    f_high = M.audio_features(high, rate)
    # spectral centroid (idx 2) is ordered by tone frequency; band
    # energies land in the right octave buckets (3..6)
    assert f_low[2] < f_high[2]
    assert f_low[3] > f_low[5] and f_high[5] > f_high[3]


def test_strict_decode_raises():
    actor = mm.ImageDecodeActor(strict=True)
    with pytest.raises(NotImplementedError):
        actor.decode(b"xx")
    with pytest.raises(NotImplementedError):
        mm.MediaFeatureActor(strict=True).embed(b"xx")


# ------------------------------------------------------------ M5 semantic

def test_local_minima_matches_definition():
    arr = np.array([3.0, 1.0, 2.0, 5.0, 0.5, 4.0, 4.5])
    # indices 1 (1.0 < 3,2,5) and 4 (0.5 < 2,5,4,4.5) are both minima
    assert local_minima(arr, order=2) == [1, 4]
    assert local_minima(np.array([1.0]), order=2) == []


def test_activated_similarities_shape():
    sim = np.eye(5)
    act = activated_similarities(sim, p_size=3)
    assert act.shape == (5,)


def test_semantic_paragraphs_splits_topic_shift():
    emb = HashEmbedder(64)
    topic_a = "the cat sat on the soft warm mat near the door. " * 3
    topic_b = "distributed query engines shuffle arrow record batches fast. " * 3
    paras = semantic_paragraphs(topic_a + topic_b, emb.encode)
    assert len(paras) >= 2
    joined = " ".join(paras)
    assert "cat" in joined and "shuffle" in joined


def test_semantic_segment_actor(ray_session):
    pages = synth.pages_table(6)
    import pyarrow as pa

    docs = pa.table({"url": pages.column("url"), "text": pages.column("text")})
    out = rd.from_arrow(docs).map_batches(
        SemanticSegmentActor, concurrency=1, batch_format="pyarrow"
    )
    rows = out.take_all()
    assert rows and all(r["text"].strip() for r in rows)
    # para_idx dense per doc
    import collections

    by_doc = collections.defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r["para_idx"])
    assert all(v == list(range(len(v))) for v in by_doc.values())


# --------------------------------------------------------------- corpus

def test_build_corpus_end_to_end(ray_session):
    from knowledge_graph_ray.pipelines.corpus import build_corpus

    pages = rd.from_arrow(synth.pages_table(40))
    out = build_corpus(pages, concurrency=1, batch_size=64, normalize=False)
    rows = out.take_all()
    assert rows
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))  # exact dedup held
    # boilerplate header appears on ~30% of pages but survives at most once
    assert sum("Site navigation" in t for t in texts) <= 1
    assert all(len(r["embedding"]) == 64 for r in rows)


def test_build_corpus_normalized_band(ray_session):
    from knowledge_graph_ray.pipelines.corpus import build_corpus

    pages = rd.from_arrow(synth.pages_table(20))
    out = build_corpus(
        pages, concurrency=1, batch_size=64, near_dup=False, normalize=True
    )
    rows = out.take_all()
    assert rows
    assert all(r["n_tokens"] <= 500 for r in rows)


def test_png_roundtrip_all_filters_and_channels():
    from knowledge_graph_ray.functions import media as M

    rng = np.random.default_rng(11)
    for shape in [(9, 7), (13, 21, 3), (6, 5, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in [0, 1, 2, 3, 4, "cycle"]:
            w, h, c, back = M.decode_png(M.encode_png(img, filter_type=ft))
            want = img if img.ndim == 3 else img[:, :, None]
            assert (w, h, c) == (want.shape[1], want.shape[0], want.shape[2])
            assert (back == want).all(), (shape, ft)


def test_png_and_bmp_agree_on_same_pixels():
    # the same pixel array shipped in either container format must
    # decode byte-identically and produce identical features
    from knowledge_graph_ray.functions import media as M

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    _, _, _, via_bmp = M.decode_bmp(M.encode_bmp(img))
    _, _, _, via_png = M.decode_png(M.encode_png(img, filter_type="cycle"))
    assert (via_bmp == via_png).all()
    assert (M.image_features(via_bmp) == M.image_features(via_png)).all()


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    from knowledge_graph_ray.functions import media as M

    sig = b"\x89PNG\r\n\x1a\n"
    # invalid color type 5 must be refused, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 5, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr)
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        M.decode_png(sig + chunk)
    with pytest.raises(ValueError, match="not a PNG"):
        M.decode_png(b"JUNK")


def test_png_real_world_variants_decode():
    # palette (2/4/8-bit), gray, gray+alpha, RGBA, Adam7 — one real
    # system file per variant where present
    import glob
    import struct

    from knowledge_graph_ray.functions.media import decode_png, image_features

    by_kind = {}
    for f in glob.glob("/usr/share/**/*.png", recursive=True):
        head = open(f, "rb").read(29)
        if head[:8] != b"\x89PNG\r\n\x1a\n" or len(head) < 29:
            continue
        _, _, depth, ct, _, _, il = struct.unpack(">IIBBBBB", head[16:29])
        by_kind.setdefault((depth, ct, il), f)
    if not by_kind:
        pytest.skip("no system PNGs on this host")
    for (depth, ct, il), f in sorted(by_kind.items()):
        w, h, c, img = decode_png(open(f, "rb").read())
        assert img.shape[:2] == (h, w) and img.dtype == np.uint8
        fv = image_features(img)
        assert abs(float(np.linalg.norm(fv)) - 1.0) < 1e-5, (depth, ct, il)


MP3_FIXTURE = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"
)


def test_mp3_metadata_synthetic_frames():
    # hand-built MPEG-1 Layer III headers: 44100 Hz stereo, 128 kbps
    # → frame length 144*128000/44100 = 417 bytes, 1152 samples/frame
    from knowledge_graph_ray.functions.media import mp3_metadata, sniff_media

    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * (417 - 4)
    payload = frame * 10
    assert sniff_media(payload) == "mp3"
    rate, n, ch = mp3_metadata(payload)
    assert (rate, n, ch) == (44100, 10 * 1152, 2)


@pytest.mark.skipif(
    not os.path.exists(MP3_FIXTURE), reason="external mp3 not on this host"
)
def test_mp3_metadata_real_file():
    # real LAME-encoded file: header walk must be internally
    # consistent (frames x frame-bytes ~ file size)
    from knowledge_graph_ray.functions.media import mp3_metadata

    with open(MP3_FIXTURE, "rb") as fh:
        data = fh.read()
    rate, n, ch = mp3_metadata(data)
    assert rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000)
    assert ch in (1, 2) and 0 < n / rate < 60


TIFF_FIXTURE = (
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.tiff"
)
LOGO_PNG = (
    "/root/.pyenv/versions/3.7.16/lib/python3.7/test/imghdrdata/python.png"
)


def test_tiff_roundtrip_exact():
    from knowledge_graph_ray.functions.media import decode_tiff, encode_tiff

    rng = np.random.default_rng(13)
    for shape in [(7, 9), (11, 5, 3), (6, 8, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, c, back = decode_tiff(encode_tiff(img))
        want = img if img.ndim == 3 else img[:, :, None]
        assert (back == want).all(), shape


@pytest.mark.skipif(
    not (os.path.exists(TIFF_FIXTURE) and os.path.exists(LOGO_PNG)),
    reason="external fixtures not on this host",
)
def test_tiff_and_png_decoders_agree_on_same_source_image():
    # the Python logo shipped as both TIFF (raw strips) and PNG
    # (zlib + filters): two independent decode paths must produce
    # byte-identical RGB on every opaque pixel
    from knowledge_graph_ray.functions.media import decode_png, decode_tiff

    with open(TIFF_FIXTURE, "rb") as fh:
        _, _, c, tif = decode_tiff(fh.read())
    assert c == 4
    with open(LOGO_PNG, "rb") as fh:
        _, _, _, png = decode_png(fh.read())
    mask = tif[:, :, 3] > 128
    assert mask.sum() > 100
    assert (png[:, :, :3][mask] == tif[:, :, :3][mask]).all()


NETPBM_DIR = "/root/.pyenv/versions/3.7.16/lib/python3.7/test/imghdrdata"


def test_netpbm_roundtrip_and_ascii():
    from knowledge_graph_ray.functions.media import decode_netpbm, encode_netpbm

    rng = np.random.default_rng(14)
    for shape in [(5, 7), (9, 4, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        _, _, _, back = decode_netpbm(encode_netpbm(img))
        want = img if img.ndim == 3 else img[:, :, None]
        assert (back == want).all()
    _, _, _, a = decode_netpbm(b"P2\n# c\n3 2\n255\n0 128 255\n10 20 30\n")
    assert a.ravel().tolist() == [0, 128, 255, 10, 20, 30]


@pytest.mark.skipif(
    not os.path.exists(NETPBM_DIR), reason="imghdrdata not on this host"
)
def test_ppm_decodes_byte_identical_to_png():
    # the same logo shipped as PPM (raw bytes) and PNG (zlib+filters):
    # independent decoders must agree EXACTLY on every pixel
    from knowledge_graph_ray.functions.media import decode_netpbm, decode_png

    with open(os.path.join(NETPBM_DIR, "python.ppm"), "rb") as fh:
        _, _, _, ppm = decode_netpbm(fh.read())
    with open(os.path.join(NETPBM_DIR, "python.png"), "rb") as fh:
        _, _, _, png = decode_png(fh.read())
    assert (ppm == png).all()


def test_corrupt_payload_quarantines_not_raises(ray_session):
    import pyarrow as pa

    from knowledge_graph_ray.functions.media import encode_png

    good = encode_png(np.full((4, 4, 3), 7, np.uint8))
    corrupt = good[:40]  # truncated PNG: valid signature, broken body
    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([good, corrupt], pa.binary()),
        }
    )
    out = mm.ImageDecodeActor(strict=True)(batch)
    assert out.column("decode_error")[0].as_py() is None
    assert out.column("width")[0].as_py() == 4
    assert out.column("decode_error")[1].as_py() is not None
    assert out.column("width")[1].as_py() == 0  # quarantined, batch survived
    fo = mm.MediaFeatureActor(strict=True)(batch)
    assert fo.column("feature_error")[0].as_py() is None
    assert fo.column("feature_error")[1].as_py() is not None
    assert all(v == 0.0 for v in fo.column("embedding")[1].as_py())


# --- ffmpeg CLI hook (r5): capability-detected real decode ---------------

_SHIM = '''#!/usr/bin/env python3
"""Fake ffmpeg: obeys the exact CLI contract the hook issues, so the
subprocess plumbing (temp files, pattern collection, sampling, RIFF
finalize) runs for real even without a system ffmpeg."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from knowledge_graph_ray.functions.media import encode_png, encode_wav
args = sys.argv[1:]
src = args[args.index("-i") + 1]
if open(src, "rb").read().startswith(b"CORRUPT"):
    sys.stderr.write("moov atom not found")
    sys.exit(1)
out = args[-1]
if out.endswith(".png"):
    for i in range(6):  # six frames, value-coded so sampling is checkable
        img = np.full((4, 5, 3), i * 10, dtype=np.uint8)
        open(out % (i + 1), "wb").write(encode_png(img))
else:
    x = (np.sin(np.arange(1600) / 10.0) * 20000).astype(np.int16)
    open(out, "wb").write(encode_wav(x, 8000))
'''


@pytest.fixture()
def fake_ffmpeg(tmp_path):
    p = tmp_path / "ffmpeg"
    p.write_text(_SHIM)
    p.chmod(0o755)
    return str(p)


def test_frame_sample_ffmpeg_hook(fake_ffmpeg):
    mp4 = b"\x00\x00\x00\x18ftypmp42" + b"\x01" * 64
    actor = mm.FrameSampleActor(frames_per_video=3, ffmpeg=fake_ffmpeg)
    frames = actor.frames_of(mp4)
    assert len(frames) == 3
    # evenly sampled from the shim's 6 value-coded frames: 0, 2, 5
    from knowledge_graph_ray.functions.media import decode_png

    vals = []
    for fp in frames:
        w, h, c, img = decode_png(fp)
        assert (w, h, c) == (5, 4, 3)
        vals.append(int(img[0, 0, 0]))
    assert vals == [0, 20, 50]


def test_frame_sample_ffmpeg_quarantines_row(fake_ffmpeg):
    """A failing decode (shim exits 1) must yield the marker row, and
    the good row in the same batch must still produce frames."""
    good = b"\x00\x00\x00\x18ftypmp42" + b"\x01" * 64
    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"CORRUPT" + b"\x00" * 32, good], pa.binary()),
        }
    )
    out = mm.FrameSampleActor(frames_per_video=2, ffmpeg=fake_ffmpeg)(batch)
    rows = out.to_pylist()
    bad = [r for r in rows if r["media_id"] == 1]
    assert len(bad) == 1 and bad[0]["frame_idx"] == -1
    assert "moov atom" in bad[0]["error"]
    goods = [r for r in rows if r["media_id"] == 2]
    assert len(goods) == 2 and all(r["error"] is None for r in goods)


def test_audio_decode_ffmpeg_hook(fake_ffmpeg):
    fake_mp4_audio = b"\x00\x00\x00\x18ftypmp42" + b"\x02" * 64
    actor = mm.AudioDecodeActor(ffmpeg=fake_ffmpeg)
    rate, n, ch = actor.decode(fake_mp4_audio)
    assert (rate, n, ch) == (8000, 1600, 1)  # shim's WAV, really parsed


def test_no_ffmpeg_stub_path_unchanged(ray_session):
    """Without a binary (ffmpeg=None / PATH probe failing) the declared
    stub semantics hold: byte-slice frames, fake audio metadata,
    strict raises — and the quarantine marker row appears under
    strict through the actor call."""
    mp4 = b"\x00\x00\x00\x18ftypmp42" + bytes(range(256))
    actor = mm.FrameSampleActor(frames_per_video=4, ffmpeg=None)
    assert len(actor.frames_of(mp4)) == 4
    strict = mm.FrameSampleActor(frames_per_video=4, strict=True, ffmpeg=None)
    batch = pa.table(
        {"media_id": pa.array([7], pa.int64()), "payload": pa.array([mp4], pa.binary())}
    )
    rows = strict(batch).to_pylist()
    assert len(rows) == 1 and rows[0]["frame_idx"] == -1
    assert "NotImplementedError" in rows[0]["error"]


@pytest.mark.skipif(shutil.which("ffmpeg") is None, reason="no system ffmpeg")
def test_frame_sample_real_ffmpeg():
    mp4 = b"\x00\x00\x00\x18ftypmp42"  # real ffmpeg will reject this stub
    actor = mm.FrameSampleActor(frames_per_video=2)
    assert actor.ffmpeg is not None
