"""Property tests (SURVEY.md §5.5) — hypothesis over the pure kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_graph_ray.functions import canon, dedup
from knowledge_graph_ray.functions.extract import clean_text, extract_text
from knowledge_graph_ray.functions.segment import (
    count_tokens,
    merge_short,
    normalize_lengths,
    split_sentences,
    wrap_long,
)

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=10
)
sentences = st.lists(words, min_size=1, max_size=12).map(" ".join)
texts = st.lists(sentences, min_size=0, max_size=8).map(". ".join)


@given(texts)
@settings(max_examples=50, deadline=None)
def test_extract_never_raises_and_is_pure(t):
    html = f"<html><body><p>{t}</p></body></html>".encode()
    a, b = extract_text(html), extract_text(html)
    assert a == b  # deterministic


@given(st.binary(min_size=0, max_size=512))
@settings(max_examples=50, deadline=None)
def test_extract_arbitrary_bytes_never_raise(raw):
    assert isinstance(extract_text(b"<p>" + raw + b"</p>"), str)


@given(texts)
@settings(max_examples=50, deadline=None)
def test_clean_text_idempotent(t):
    assert clean_text(clean_text(t)) == clean_text(t)


@given(st.lists(sentences, min_size=0, max_size=10))
@settings(max_examples=50, deadline=None)
def test_merge_short_preserves_content(sents):
    merged = merge_short(sents, min_chars=30)
    assert "".join(merged).replace(" ", "") == "".join(sents).replace(" ", "")
    # every output except possibly a lone one is >= threshold
    for s in merged[:-1] if len(merged) > 1 else []:
        assert len(s) >= 30 or merged.index(s) == len(merged) - 1


@given(st.lists(sentences, min_size=1, max_size=6), st.integers(40, 200))
@settings(max_examples=50, deadline=None)
def test_wrap_long_bounds_and_preserves(sents, cap):
    wrapped = wrap_long(sents, max_chars=cap)
    assert all(len(s) <= cap for s in wrapped)
    assert "".join(wrapped) == "".join(sents)


@given(st.lists(sentences, min_size=0, max_size=8), st.integers(5, 40))
@settings(max_examples=50, deadline=None)
def test_normalize_lengths_token_bound(paras, max_tok):
    out = normalize_lengths(paras, min_tokens=max_tok // 2, max_tokens=max_tok)
    assert all(count_tokens(p) <= max_tok for p in out)


@given(words)
@settings(max_examples=100, deadline=None)
def test_normalize_surface_idempotent(s):
    assert canon.normalize_surface(canon.normalize_surface(s)) == canon.normalize_surface(s)


@given(sentences, sentences)
@settings(max_examples=50, deadline=None)
def test_token_set_ratio_symmetric_bounded(a, b):
    r1, r2 = canon.token_set_ratio(a, b), canon.token_set_ratio(b, a)
    assert r1 == r2
    assert 0 <= r1 <= 100
    assert canon.token_set_ratio(a, a) == 100


@given(texts, texts)
@settings(max_examples=30, deadline=None)
def test_minhash_estimate_bounded_by_identity(a, b):
    mh = dedup.MinHasher(n_hashes=64)
    sa, sb = dedup.shingle_hashes(a), dedup.shingle_hashes(b)
    est = float((mh.signature(sa) == mh.signature(sb)).mean())
    assert 0.0 <= est <= 1.0
    assert float((mh.signature(sa) == mh.signature(sa)).mean()) == 1.0


@given(st.lists(st.integers(0, 2**31), min_size=1, max_size=30))
@settings(max_examples=50, deadline=None)
def test_simhash_stable_and_64bit(ids):
    text = " ".join(f"w{i}" for i in ids)
    h1, h2 = dedup.simhash64(text), dedup.simhash64(text)
    assert h1 == h2
    assert 0 <= h1 < 2**64


def test_ivf_matches_bruteforce_topk_on_clustered_data(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from knowledge_graph_ray.stages import knn

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)).astype(np.float64) * 4
    vecs = np.vstack(
        [c + rng.standard_normal((25, 16)) * 0.05 for c in centers]
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    qids = [0, 30, 60, 90]
    brute = knn.knn_topk(ds, qids, vecs[qids], k=3).take_all()
    ivf = knn.knn_ivf(ds, qids, vecs[qids], k=3, nlist=4, nprobe=2).take_all()
    b = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in brute}
    v = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in ivf}
    assert b == v  # tight clusters → IVF exact


# --------------------------------------------------- media codec laws


@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.sampled_from([1, 3, 4]),
    st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_is_lossless(h, w, ch, ft, seed):
    from knowledge_graph_ray.functions.media import decode_png, encode_png

    img = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    _, _, _, back = decode_png(encode_png(img, filter_type=ft))
    assert (back == img).all()


@given(st.integers(1, 16), st.integers(1, 16), st.integers(1, 4), st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_gif_roundtrip_is_lossless_on_palette_colors(h, w, nframes, seed):
    from knowledge_graph_ray.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    r, g, b = np.meshgrid(
        np.linspace(0, 255, 6), np.linspace(0, 255, 7), np.linspace(0, 255, 6)
    )
    pal = np.stack([r, g, b], axis=-1).reshape(-1, 3).astype(np.uint8)
    frames = [pal[rng.integers(0, len(pal), size=(h, w))] for _ in range(nframes)]
    gw, gh, out = decode_gif(encode_gif(frames))
    assert (gw, gh, len(out)) == (w, h, nframes)
    for a, b2 in zip(frames, out):
        assert (a == b2).all()


@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.sampled_from([1, 3]),
    st.sampled_from(["4:4:4", "4:2:0"]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_never_raises_and_bounds_error(h, w, ch, sub, seed):
    from knowledge_graph_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    dw, dh, dc, out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert (dw, dh) == (w, h) and out.shape == (h, w, ch if ch == 3 else 1)
    # quantization error at q95 is bounded — worst-case uniform noise
    # stays far from the 255 ceiling (a structural decode bug does not);
    # 4:2:0 legitimately averages adjacent pixels' chroma, so its bound
    # is looser (extreme-chroma neighbors share one chroma sample)
    err = np.abs(out.astype(int).reshape(h, w, -1) - img.astype(int).reshape(h, w, -1))
    assert err.mean() < (80 if sub == "4:2:0" else 40)
