"""Deduplication operator family (SURVEY.md §2.7 + training-data ops).

Five dedup strategies, all expressed as Ray Data shuffles with
explicit keys — no global index is ever materialized (the reference
builds a driver-RAM Annoy index over the whole corpus,
remove_duplicate_paragraphs.py:104-132; re-architected here as
banded/bucketed shuffles, SURVEY.md D2):

- exact_dedup        groupby(text) → first-seen (min id) wins   [D1]
- minhash_lsh        shingle → minhash sig → band buckets →
                     within-bucket candidate pairs (est. Jaccard)
- simhash            64-bit simhash → bit-band buckets →
                     within-bucket Hamming check
- ngram_jaccard      exact Jaccard verify on candidate pairs
                     (within minhash buckets)
- embedding_cosine   random-hyperplane buckets over an embedding
                     column → within-bucket cosine pairs

Each pair-producer emits (a, b, score) with a < b; ``drops_from_pairs``
turns pairs into a deterministic survivor rule: a row is dropped iff
it pairs with a smaller id (per-pair rule, not transitive closure —
documented divergence kept deliberately cheap at scale).

Skew control: bucket groups are processed via ``map_groups`` with a
hard ``group_cap`` — a pathological bucket (boilerplate) degrades to
comparing against the cap-first members only, bounding O(n²) work.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from knowledge_graph_ray.functions.hashing import hash64_array, stable_digest

_TOKEN_RE = re.compile(r"\w+")

MERSENNE = np.uint64((1 << 61) - 1)
DEFAULT_GROUP_CAP = 256


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Token k-shingles → uint64 hashes (sorted, unique)."""
    toks = _tokens(text)
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.array([], dtype=np.uint64)
    return np.unique(hash64_array(shingles))


def _collision_only(banded: "Dataset", key: str, max_broadcast: int = 2_000_000):
    """Pre-filter bucket rows to buckets holding >= 2 ids: a native
    count-aggregate finds collision buckets (fast C path), the small
    key set is broadcast, and only colliding rows reach the expensive
    per-group Python kernel. Mostly-singleton bucket spaces (the
    common case) shrink by orders of magnitude. Falls back to the
    unfiltered dataset if the collision set itself is huge."""
    import ray

    counts = banded.groupby(key).aggregate(Count(alias_name="_n"))
    hot_rows = counts.filter(expr="_n >= 2").select_columns([key]).take_all()
    if len(hot_rows) > max_broadcast:
        return banded
    hot = frozenset(r[key] for r in hot_rows)
    ref = ray.put(hot)

    def keep(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        vals = batch.column(key).to_pylist()
        return batch.filter(pa.array([v in s for v in vals], pa.bool_()))

    return banded.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------------ D1

def exact_dedup(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """First-seen-wins exact dedup: one row per distinct text with the
    min id and the duplicate count. Pure shuffle on the text key."""
    return ds.groupby(text_col).aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="dup_count")
    )


# -------------------------------------------------------------- minhash

class MinHasher:
    """Vectorized minhash with fixed random linear permutations."""

    def __init__(self, n_hashes: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=n_hashes, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=n_hashes, dtype=np.uint64)
        self.n_hashes = n_hashes

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.full(self.n_hashes, MERSENNE, dtype=np.uint64)
        # (n_hashes, n_shingles) — permute then min
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % MERSENNE
        return vals.min(axis=1)


def minhash_band_rows(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    carry_text: bool = False,
) -> pa.Table:
    """map_batches kernel: one input row → ``bands`` rows
    (band_key, id, signature[, text]). The band_key combines the band
    index with the hash of that band's signature slice."""
    hasher = MinHasher(n_hashes, seed)
    rows_per_band = n_hashes // bands
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    o_key, o_id, o_sig, o_text = [], [], [], []
    for rid, text in zip(ids, texts):
        sig = hasher.signature(shingle_hashes(text, shingle_k))
        for bidx in range(bands):
            sl = sig[bidx * rows_per_band : (bidx + 1) * rows_per_band]
            key = f"{bidx}:{stable_digest(sl.tobytes()):x}"  # process-stable
            o_key.append(key)
            o_id.append(rid)
            o_sig.append(sig.astype("int64").tolist())
            if carry_text:
                o_text.append(text)
    cols = {
        "band_key": pa.array(o_key, pa.string()),
        "id": pa.array(o_id, pa.int64()),
        "sig": pa.array(o_sig, pa.list_(pa.int64())),
    }
    if carry_text:
        cols["text"] = pa.array(o_text, pa.string())
    return pa.table(cols)


def _bucket_pairs_minhash(
    df: pd.DataFrame, threshold: float, group_cap: int
) -> pd.DataFrame:
    """map_groups kernel: one band bucket → candidate pairs with
    estimated Jaccard (signature agreement). Deterministic order."""
    df = df.drop_duplicates(subset=["id"]).sort_values("id").head(group_cap)
    ids = df["id"].tolist()
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": [], "score": []}).astype(
            {"a": "int64", "b": "int64", "score": "float64"}
        )
    sigs = np.stack([np.asarray(s) for s in df["sig"]])
    a_out, b_out, s_out = [], [], []
    for i in range(len(ids)):
        agree = (sigs[i] == sigs[i + 1 :]).mean(axis=1)
        for j, est in enumerate(agree, start=i + 1):
            if est >= threshold:
                a_out.append(ids[i])
                b_out.append(ids[j])
                s_out.append(float(est))
    return pd.DataFrame({"a": a_out, "b": b_out, "score": s_out})


def minhash_lsh_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    group_cap: int = DEFAULT_GROUP_CAP,
    seed: int = 42,
) -> Dataset:
    """Near-dup candidate pairs via MinHash + LSH banding. The only
    wide op is groupby(band_key); pair dedup is a second small shuffle."""
    banded = ds.map_batches(
        lambda b: minhash_band_rows(
            b,
            text_col=text_col,
            id_col=id_col,
            n_hashes=n_hashes,
            bands=bands,
            shingle_k=shingle_k,
            seed=seed,
        ),
        batch_format="pyarrow",
    )
    pairs = _collision_only(banded, "band_key").groupby("band_key").map_groups(
        lambda df: _bucket_pairs_minhash(df, threshold, group_cap),
        batch_format="pandas",
    )
    # same pair can surface from several bands → dedup on (a, b)
    return pairs.groupby(["a", "b"]).aggregate(Min("score", alias_name="score"))


# -------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    toks = _tokens(text)
    if not toks:
        return 0
    h = hash64_array(toks)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int32
    )
    acc = (2 * bits - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_rows(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
) -> pa.Table:
    """One row per (band, id): band_key = band index + that 16-bit slice
    of the simhash. Two docs within Hamming distance (bands-1) share at
    least one band key (pigeonhole)."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    width = 64 // bands
    mask = (1 << width) - 1
    o_key, o_id, o_sim = [], [], []
    for rid, text in zip(ids, texts):
        sh = simhash64(text)
        for bidx in range(bands):
            o_key.append(f"{bidx}:{(sh >> (bidx * width)) & mask:x}")
            o_id.append(rid)
            o_sim.append(sh)
    return pa.table(
        {
            "band_key": pa.array(o_key, pa.string()),
            "id": pa.array(o_id, pa.int64()),
            "simhash": pa.array(np.array(o_sim, dtype=np.uint64).view(np.int64)),
        }
    )


def _bucket_pairs_simhash(
    df: pd.DataFrame, max_hamming: int, group_cap: int
) -> pd.DataFrame:
    df = df.drop_duplicates(subset=["id"]).sort_values("id").head(group_cap)
    ids = df["id"].tolist()
    sims = df["simhash"].to_numpy().astype(np.uint64)
    a_out, b_out, s_out = [], [], []
    for i in range(len(ids)):
        x = sims[i] ^ sims[i + 1 :]
        dist = np.array([bin(int(v)).count("1") for v in x])
        for j, d in enumerate(dist, start=i + 1):
            if d <= max_hamming:
                a_out.append(ids[i])
                b_out.append(ids[j])
                s_out.append(float(d))
    return pd.DataFrame({"a": a_out, "b": b_out, "score": s_out})


def simhash_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
    group_cap: int = DEFAULT_GROUP_CAP,
) -> Dataset:
    banded = ds.map_batches(
        lambda b: simhash_rows(b, text_col=text_col, id_col=id_col, bands=bands),
        batch_format="pyarrow",
    )
    pairs = _collision_only(banded, "band_key").groupby("band_key").map_groups(
        lambda df: _bucket_pairs_simhash(df, max_hamming, group_cap),
        batch_format="pandas",
    )
    return pairs.groupby(["a", "b"]).aggregate(Min("score", alias_name="score"))


# ------------------------------------------------------- exact jaccard

def ngram_jaccard_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 16,
    group_cap: int = DEFAULT_GROUP_CAP,
    seed: int = 42,
) -> Dataset:
    """Exact n-gram Jaccard near-dup: minhash-LSH generates candidates,
    true Jaccard is verified in-bucket from the carried text (the text
    travels through ONE banded shuffle; no global state)."""
    banded = ds.map_batches(
        lambda b: minhash_band_rows(
            b,
            text_col=text_col,
            id_col=id_col,
            n_hashes=n_hashes,
            bands=bands,
            shingle_k=shingle_k,
            seed=seed,
            carry_text=True,
        ),
        batch_format="pyarrow",
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["id"]).sort_values("id").head(group_cap)
        ids = df["id"].tolist()
        sets = [set(shingle_hashes(t, shingle_k).tolist()) for t in df["text"]]
        a_out, b_out, s_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j]) or 1
                jac = inter / union
                if jac >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    s_out.append(jac)
        return pd.DataFrame({"a": a_out, "b": b_out, "score": s_out})

    pairs = _collision_only(banded, "band_key").groupby("band_key").map_groups(
        verify, batch_format="pandas"
    )
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max("score", alias_name="score"))


# -------------------------------------------------- embedding cosine

def embedding_cosine_pairs(
    ds: Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    nbits: int = 8,
    seed: int = 42,
    group_cap: int = 4 * DEFAULT_GROUP_CAP,
    dim: int | None = None,
) -> Dataset:
    """Near-dup by embedding cosine: random-hyperplane bucket keys
    (docs in the same bucket share all sign bits), within-bucket exact
    cosine. Multi-probe: each row is also emitted into the buckets at
    Hamming distance 1, so near-identical vectors across a plane
    boundary still meet (recall/cost trade-off documented)."""

    def bucket(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float32)
        d = vecs.shape[1]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((d, nbits)).astype(np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1
        unit = vecs / norms
        bits = (unit @ planes) > 0
        sigs = (bits * (1 << np.arange(nbits, dtype=np.int64))).sum(axis=1)
        ids = batch.column(id_col).to_pylist()
        o_key, o_id, o_vec = [], [], []
        for i, (rid, sig) in enumerate(zip(ids, sigs)):
            probes = [int(sig)] + [int(sig) ^ (1 << b) for b in range(nbits)]
            for p in probes:
                o_key.append(p)
                o_id.append(rid)
                o_vec.append(unit[i].tolist())
        return pa.table(
            {
                "bucket": pa.array(o_key, pa.int64()),
                "id": pa.array(o_id, pa.int64()),
                "vec": pa.array(o_vec, pa.list_(pa.float32())),
            }
        )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["id"]).sort_values("id").head(group_cap)
        ids = df["id"].tolist()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "score": []}).astype(
                {"a": "int64", "b": "int64", "score": "float64"}
            )
        m = np.stack([np.asarray(v, dtype=np.float32) for v in df["vec"]])
        sims = m @ m.T
        a_out, b_out, s_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    s_out.append(float(sims[i, j]))
        return pd.DataFrame({"a": a_out, "b": b_out, "score": s_out})

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")
    pairs = _collision_only(bucketed, "bucket").groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max("score", alias_name="score"))


# ------------------------------------------------------------ survivors

def drops_from_pairs(pairs: Dataset) -> set[int]:
    """Deterministic survivor rule: drop the larger id of every pair.
    The drop set is collected to the driver (pairs ≪ corpus) and meant
    to be broadcast into a filter stage via ray.put."""
    drops: set[int] = set()
    for row in pairs.iter_rows():
        drops.add(max(row["a"], row["b"]))
    return drops


def filter_dropped(ds: Dataset, drops: set[int], id_col: str = "doc_id") -> Dataset:
    import ray

    drops_ref = ray.put(frozenset(drops))

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drops_ref)
        ids = batch.column(id_col).to_pylist()
        mask = pa.array([i not in d for i in ids], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
