"""Dedup operator family (SURVEY.md §2.7 + training-data ops)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from knowledge_graph_ray.functions import dedup
from knowledge_graph_ray.pipelines import relational as R


def docs_ds(texts):
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
        )
    )


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill "
    "and the birds sing in the tall green trees near the quiet river bank every single morning"
)
NEAR = BASE.replace("quiet river", "noisy river")  # tiny edit
OTHER = (
    "completely different content about databases and distributed systems with no overlap "
    "in any shingle of meaningful length whatsoever for this particular document example"
)


def test_exact_dedup_first_wins(ray_session):
    ds = docs_ds([BASE, OTHER, BASE, BASE])
    out = dedup.exact_dedup(ds).take_all()
    rows = {r["text"]: (r["keep_id"], r["dup_count"]) for r in out}
    assert rows[BASE] == (0, 3)
    assert rows[OTHER] == (1, 1)


def test_exact_dedup_idempotent(ray_session):
    ds = docs_ds([BASE, OTHER, BASE])
    once = dedup.exact_dedup(ds)
    tbl = pa.Table.from_pylist(once.take_all())
    again = dedup.exact_dedup(
        rd.from_arrow(tbl.rename_columns(["text", "doc_id", "c"]).select(["doc_id", "text"])),
    ).take_all()
    assert len(again) == len(once.take_all())


def test_minhash_signature_estimates_jaccard():
    mh = dedup.MinHasher(n_hashes=128)
    a = dedup.shingle_hashes(BASE)
    b = dedup.shingle_hashes(NEAR)
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    est = (mh.signature(a) == mh.signature(b)).mean()
    assert abs(est - true_j) < 0.15
    assert true_j > 0.7


def test_minhash_lsh_finds_near_dup(ray_session):
    ds = docs_ds([BASE, NEAR, OTHER])
    pairs = dedup.minhash_lsh_pairs(ds, threshold=0.6).take_all()
    found = {(r["a"], r["b"]) for r in pairs}
    assert (0, 1) in found
    assert all(2 not in p for p in found)


def test_simhash_near_dup(ray_session):
    ds = docs_ds([BASE, NEAR, OTHER])
    pairs = dedup.simhash_pairs(ds, max_hamming=8).take_all()
    found = {(r["a"], r["b"]) for r in pairs}
    assert (0, 1) in found
    assert (0, 2) not in found and (1, 2) not in found


def test_ngram_jaccard_exact_verify(ray_session):
    ds = docs_ds([BASE, NEAR, OTHER, BASE])
    pairs = dedup.ngram_jaccard_pairs(ds, threshold=0.7).take_all()
    found = {(r["a"], r["b"]): r["score"] for r in pairs}
    assert (0, 3) in found and found[(0, 3)] == 1.0  # identical
    assert (0, 1) in found and 0.7 <= found[(0, 1)] < 1.0


def test_embedding_cosine_pairs(ray_session):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(32).astype(np.float32)
    near = base + rng.standard_normal(32).astype(np.float32) * 0.02
    far = rng.standard_normal(32).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array([10, 11, 12], pa.int64()),
            "embedding": pa.array(
                [base.tolist(), near.tolist(), far.tolist()], pa.list_(pa.float32())
            ),
        }
    )
    pairs = dedup.embedding_cosine_pairs(
        rd.from_arrow(tbl), threshold=0.95
    ).take_all()
    found = {(r["a"], r["b"]) for r in pairs}
    assert (10, 11) in found
    assert len(found) == 1


def test_drops_and_filter(ray_session):
    ds = docs_ds([BASE, NEAR, OTHER, BASE])
    pairs = dedup.ngram_jaccard_pairs(ds, threshold=0.7)
    drops = dedup.drops_from_pairs(pairs)
    assert drops == {1, 3}
    kept = dedup.filter_dropped(ds, drops).take_all()
    assert sorted(r["doc_id"] for r in kept) == [0, 2]


def test_drops_components_transitive(ray_session):
    # chain 1-3, 2-3: per-pair rule drops only {3}; union-find closure
    # groups {1,2,3} and keeps the min id
    pairs = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 2], pa.int64()),
                "b": pa.array([3, 3], pa.int64()),
                "score": pa.array([1.0, 1.0]),
            }
        )
    )
    assert dedup.drops_from_pairs(pairs, strategy="pair") == {3}
    assert dedup.drops_from_pairs(pairs, strategy="components") == {2, 3}


def test_embedding_banding_recall_on_planted(ray_session):
    # 20 near-identical planted pairs: sign-band recall at cos≈0.9999
    # is deterministic for the fixed seeds — every planted pair found
    rng = np.random.default_rng(11)
    base = rng.standard_normal((20, 64))
    dup = base + rng.standard_normal((20, 64)) * 0.002
    ids = list(range(20)) + list(range(100, 120))
    vecs = np.vstack([base, dup])
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    pairs = dedup.embedding_cosine_pairs(
        rd.from_arrow(tbl), threshold=0.99
    ).take_all()
    found = {(r["a"], r["b"]) for r in pairs}
    assert {(i, i + 100) for i in range(20)} <= found
    # precision: every emitted pair really is >= threshold (re-check)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    by_id = {v: unit[i] for i, v in enumerate(ids)}
    for r in pairs:
        assert float(by_id[r["a"]] @ by_id[r["b"]]) >= 0.99


def test_group_cap_bounds_work(ray_session):
    # 30 identical docs: cap=10 → pairs only among first 10, but doc 0
    # still dominates → all but one of the capped set get dropped
    ds = docs_ds([BASE] * 30)
    pairs = dedup.minhash_lsh_pairs(ds, threshold=0.9, group_cap=10).take_all()
    ids = {x for r in pairs for x in (r["a"], r["b"])}
    assert max(ids) <= 9
    assert len(pairs) == 45  # 10 choose 2


def test_incremental_exact_dedup(ray_session):
    import pyarrow as pa
    import ray.data as rd

    seen = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                                   "text": pa.array(["old a", "old b"])}))
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": pa.array(["old a", "fresh x", "fresh x", "fresh y"]),
    }))
    out = {r["text"]: (r["keep_id"], r["dup_count"])
           for r in dedup.incremental_exact_dedup(new, seen).take_all()}
    # already-ingested text dropped; within-shard first-wins with counts
    assert out == {"fresh x": (11, 2), "fresh y": (13, 1)}


def test_incremental_minhash_drops(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    base = ("the quick brown fox jumps over the lazy dog and then runs far away "
            "into the deep dark woods beyond the river bank tonight")
    seen = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([base, "completely different ingested text about parquet shuffles and arrow kernels in ray data pipelines"]),
    }))
    # persist the band index (the incremental contract: text never re-read)
    idx_dir = str(tmp_path / "bands")
    dedup.minhash_band_index(seen).write_parquet(idx_dir)
    seen_bands = rd.read_parquet(idx_dir)

    near_seen = base.replace("tonight", "today")     # near-dup of ingested 1
    new_a = ("fresh unique document with its own content talking about "
             "entirely new topics like gardening and recipes for slow cooked stews")
    new_b = new_a.replace("stews", "soups")          # near-dup within shard
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array([near_seen, new_a, new_b]),
    }))
    drops = {r["node"] for r in dedup.incremental_minhash_drops(new, seen_bands).take_all()}
    assert 10 in drops          # loses to ingested doc 1
    assert drops & {11, 12} == {12}   # within-shard: min id 11 survives
    survivors = R.semi_join(new, dedup.incremental_minhash_drops(new, seen_bands),
                            on="doc_id", right_on="node", anti=True)
    assert sorted(r["doc_id"] for r in survivors.take_all()) == [11]


def test_shingle_hashes_batch_matches_per_row():
    """The one-md5-pass batch kernel must produce exactly the per-row
    reference hashes (same md5 family, same unique+sort)."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "one two",
        "repeat repeat repeat repeat repeat",
        "单 字 测试 词元 abc def",
    ] + ["doc %d body word%d tail common suffix" % (i, i % 7) for i in range(60)]
    batched = dedup.shingle_hashes_batch(texts, 3)
    assert len(batched) == len(texts)
    for t, got in zip(texts, batched):
        assert np.array_equal(dedup.shingle_hashes(t, 3), got)


def test_md5_fast_paths_match_hashlib():
    """DuckDB md5 kernels (big-batch fast path) are bit-identical to
    the hashlib reference loop (small-batch path) for both families."""
    import hashlib

    from knowledge_graph_ray.functions import hashing

    vals = ["v%d éΔ" % i for i in range(300)]  # > _MD5_FAST_MIN
    ref64 = np.array(
        [
            int.from_bytes(hashlib.md5(v.encode()).digest()[8:], "little")
            for v in vals
        ],
        dtype=np.uint64,
    )
    assert np.array_equal(hashing.md5_hash64_array(vals), ref64)
    assert np.array_equal(hashing.md5_hash64_array(vals[:5]), ref64[:5])
    refhex = [hashlib.md5(v.encode()).hexdigest() for v in vals]
    assert hashing.md5_hex_array(vals).to_pylist() == refhex
    assert hashing.md5_hex_array(vals[:5]).to_pylist() == refhex[:5]
    assert hashing.md5_hex_array(pa.array(vals)).to_pylist() == refhex


def test_hyperplanes_cached_and_deterministic():
    a = dedup._hyperplanes(12, 16, 42)
    assert dedup._hyperplanes(12, 16, 42) is a
    assert np.array_equal(
        a, np.random.default_rng(42).standard_normal((12, 16))
    )


def test_minhash_materialize_bands_same_pairs(ray_session):
    """The banded-table checkpoint knob (VERDICT r4 item 7) changes
    execution (bands pinned, upstream runs once), never results."""
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "completely different document body here",
    ] * 3
    ds = docs_ds(texts)
    base = dedup.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    mat = dedup.minhash_lsh_pairs(
        docs_ds(texts), threshold=0.5, materialize_bands=True
    ).to_pandas()
    key = ["a", "b", "score"]
    assert base.sort_values(key).reset_index(drop=True).equals(
        mat.sort_values(key).reset_index(drop=True)
    )
