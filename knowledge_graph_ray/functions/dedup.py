"""Deduplication operator family (SURVEY.md §2.7 + training-data ops).

Five dedup strategies, all expressed as Ray Data shuffles with
explicit keys — no global index is ever materialized (the reference
builds a driver-RAM Annoy index over the whole corpus,
remove_duplicate_paragraphs.py:104-132; re-architected here as
banded/bucketed shuffles, SURVEY.md D2):

- exact_dedup        int hash-bucket shuffle → in-bucket exact-text
                     first-seen (min id) wins                     [D1]
- minhash_lsh        shingle → minhash sig → band buckets →
                     within-bucket candidate pairs (est. Jaccard)
- simhash            64-bit simhash → bit-band buckets →
                     within-bucket Hamming check
- ngram_jaccard      exact Jaccard verify on candidate pairs
                     (within minhash buckets)
- embedding_cosine   hyperplane-sign BAND buckets over an embedding
                     column → within-bucket cosine pairs. Shuffle
                     amplification = ``bands`` (each row emitted once
                     per band; default 2).

Content hashes (shingles, tokens, fingerprints) use the md5 family
(``hashing.md5_hash64_array``) so every score is twinnable in DuckDB
via ``md5_number_lower``; shuffle-only keys stay on vectorized
SipHash. Minhash signatures are computed for a whole batch in one
numpy reduction (no per-row Python loop in the hot path).

Each pair-producer emits (a, b, score) with a < b; ``drops_from_pairs``
turns pairs into a deterministic survivor rule — per-pair (drop the
larger id; cheap, no transitive closure) or ``strategy='components'``
(union-find over the pair set; keep the min id per connected
component — the reference's transitive-evidence semantics,
remove_duplicate_paragraphs.py:123-128).

Skew control: bucket groups are processed via ``map_groups`` with a
``group_cap`` — a pathological bucket (boilerplate) degrades to
comparing against the cap-first members only, bounding O(n²) work.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min

from knowledge_graph_ray.functions.hashing import (
    combine_hashes,
    md5_hash64_array,
)

_TOKEN_RE = re.compile(r"\w+")

MERSENNE = np.uint64((1 << 61) - 1)
DEFAULT_GROUP_CAP = 256
# chunk the (n_hashes × n_shingles) permutation matrix to bound memory
_SIG_CHUNK_SHINGLES = 250_000


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


def _row_shingles(text: str, k: int) -> list[str]:
    toks = _tokens(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Token k-shingles → uint64 md5 hashes (sorted, unique)."""
    shingles = _row_shingles(text, k)
    if not shingles:
        return np.array([], dtype=np.uint64)
    return np.unique(md5_hash64_array(shingles))


def shingle_hashes_batch(texts: list[str], k: int = 3) -> list[np.ndarray]:
    """Per-row sorted-unique shingle hashes for a WHOLE batch with ONE
    md5 pass: concatenate every row's shingle strings, hash once
    (DuckDB's vectorized kernel via ``md5_hash64_array``), split by
    offsets, unique per segment — the ``simhash64_batch`` pattern.
    Same hashes as ``shingle_hashes`` row-by-row (same md5 family)."""
    per_row = [_row_shingles(t, k) for t in texts]
    lens = np.fromiter((len(p) for p in per_row), dtype=np.int64, count=len(per_row))
    if int(lens.sum()) == 0:
        return [np.array([], dtype=np.uint64) for _ in per_row]
    all_hashes = md5_hash64_array([s for p in per_row for s in p])
    bounds = np.zeros(len(per_row) + 1, dtype=np.int64)
    np.cumsum(lens, out=bounds[1:])
    return [
        np.unique(all_hashes[bounds[i] : bounds[i + 1]])
        for i in range(len(per_row))
    ]


def _dedup_pairs(pairs: "Dataset", *, agg: str = "min", num_buckets: int = 16):
    """The same (a, b) pair surfaces from several bands — keep one row
    per pair with the min/max score. Per-block pandas combiner + ONE
    int hash-bucket shuffle: Ray's native sort-based aggregate on the
    two-int-key pair table measured ~13 s for 42 k rows at sf0.1 (the
    engine's known slow path), the bucketed merge is sub-second."""
    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["a", "b"], as_index=False, sort=False).agg(
            score=("score", agg)
        )

    partial = pairs.map_batches(combine, batch_format="pandas", batch_size=None)
    return hash_bucket_agg(partial, ["a", "b"], combine, num_buckets=num_buckets)


def _collision_only(
    banded: "Dataset",
    key: str,
    max_broadcast: int = 2_000_000,
    *,
    materialize: bool = False,
):
    """Pre-filter bucket rows to buckets holding >= 2 ids: a native
    count-aggregate finds collision buckets (fast C path), the small
    key set is broadcast, and only colliding rows reach the expensive
    per-group Python kernel. Mostly-singleton bucket spaces (the
    common case) shrink by orders of magnitude. Falls back to the
    unfiltered dataset if the collision set itself is huge.

    ``materialize=True`` pins the banded table in the object store so
    the filter pass reuses it instead of re-executing the banding
    upstream (the default trade: at corpus scale bands × rows may not
    fit, and re-hashing is cheap; flip it when the upstream is
    expensive relative to memory — e.g. reading from cold storage)."""
    import ray

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    if materialize:
        banded = banded.materialize()
    # counts pass shuffles ONLY the 8-byte key column — never the
    # signature lists riding on the full banded rows (measured 4x the
    # shuffle volume at sf0.1); banded re-executes for the filter pass,
    # which at corpus scale beats materializing bands x corpus rows.
    # Per-block value_counts combiner + int bucket merge (the native
    # sort-based Count paid ~3 s of shuffle constant at sf0.1).
    def count_combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, as_index=False, sort=False).agg(_n=(key, "size"))
        return out

    def count_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, as_index=False, sort=False).agg(_n=("_n", "sum"))

    partial = banded.select_columns([key]).map_batches(
        count_combine, batch_format="pandas", batch_size=None
    )
    counts = hash_bucket_agg(partial, [key], count_merge, num_buckets=16)
    hot_rows = counts.filter(expr="_n >= 2").select_columns([key]).take_all()
    if len(hot_rows) > max_broadcast:
        return banded
    hot = np.sort(np.asarray([r[key] for r in hot_rows]))
    ref = ray.put(hot)

    def keep(batch: pa.Table) -> pa.Table:
        arr = batch.column(key).to_numpy(zero_copy_only=False)
        mask = np.isin(arr, ray.get(ref))
        return batch.filter(pa.array(mask, pa.bool_()))

    return banded.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------------ D1

def exact_dedup(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """First-seen-wins exact dedup: one row per distinct text with the
    min id and the duplicate count.

    Scale path (mirrors pipelines.corpus.dedup_paragraphs_exact): a
    per-block pandas combiner shrinks input first, then ONE int-keyed
    hash-bucket shuffle (``hash_bucket_agg`` on hash64(text)) with an
    in-bucket exact-text merge — never a sort of the corpus by the
    full document body (Ray's sort-based groupby on a raw string key
    is the engine's measured slow path)."""
    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(text_col, as_index=False, sort=False).agg(
            keep_id=(id_col, "min"), dup_count=(id_col, "size")
        )

    partial = ds.map_batches(combine, batch_format="pandas", batch_size=65536)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(text_col, as_index=False, sort=False).agg(
            keep_id=("keep_id", "min"), dup_count=("dup_count", "sum")
        )

    return hash_bucket_agg(partial, [text_col], merge, num_buckets=64)


def incremental_exact_dedup(
    new_docs: Dataset,
    seen: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Append-only ingest dedup (the nightly-shard shape at corpus
    scale): drop NEW rows whose text already exists in the ingested
    corpus, then first-wins exact dedup WITHIN the new shard. ``seen``
    is a Dataset holding the prior corpus texts (any projection with
    ``text_col`` — e.g. the ``text`` column of previous
    ``exact_dedup`` outputs read back from parquet). The seen side
    goes through the size-guarded anti semi-join (broadcast under
    ``max_broadcast``, distributed hash join above), so a shard append
    never re-shuffles or re-deduplicates the existing corpus."""
    from knowledge_graph_ray.pipelines.relational import semi_join

    fresh = semi_join(new_docs, seen, on=text_col, right_on=text_col, anti=True)
    return exact_dedup(fresh, text_col=text_col, id_col=id_col)


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

    def signatures(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """(n_rows, n_hashes) signature matrix for a whole batch in one
        numpy segmented reduction (``np.minimum.reduceat``) — the
        per-row Python loop was the measured cost center of the
        minhash headline query."""
        n = len(shingle_sets)
        sigs = np.full((n, self.n_hashes), MERSENNE, dtype=np.uint64)
        lens = np.fromiter((len(s) for s in shingle_sets), dtype=np.int64, count=n)
        total = int(lens.sum())
        if total == 0:
            return sigs
        all_sh = np.concatenate([s for s in shingle_sets if len(s)])
        # chunk rows so (n_hashes × chunk_shingles) stays bounded
        row_start = 0
        sh_start = 0
        while row_start < n:
            row_end = row_start
            sh_count = 0
            while row_end < n and (
                sh_count == 0 or sh_count + lens[row_end] <= _SIG_CHUNK_SHINGLES
            ):
                sh_count += int(lens[row_end])
                row_end += 1
            chunk_lens = lens[row_start:row_end]
            chunk_sh = all_sh[sh_start : sh_start + sh_count]
            if sh_count:
                # one contiguous 1-D op per hash row: the obvious
                # (n_hashes, S) broadcast is ~100x slower — numpy's
                # uint64 ufuncs degrade badly on strided broadcast
                # operands (measured 29 s vs 0.1 s at S=250k)
                vals = np.empty((self.n_hashes, sh_count + 1), dtype=np.uint64)
                # sentinel column: a trailing empty segment must not
                # index out of bounds (it is overwritten below anyway)
                vals[:, -1] = MERSENNE
                for j in range(self.n_hashes):
                    vals[j, :-1] = (self.a[j] * chunk_sh + self.b[j]) % MERSENNE
                offsets = np.zeros(len(chunk_lens), dtype=np.int64)
                np.cumsum(chunk_lens[:-1], out=offsets[1:])
                mins = np.minimum.reduceat(vals, offsets, axis=1).T
                mins[chunk_lens == 0] = MERSENNE
                sigs[row_start:row_end] = mins
            row_start = row_end
            sh_start += sh_count
        # (rows with zero shingles keep the all-MERSENNE signature)
        return sigs


_HASHERS: dict[tuple[int, int], MinHasher] = {}


def _hasher(n_hashes: int, seed: int) -> MinHasher:
    key = (n_hashes, seed)
    if key not in _HASHERS:
        _HASHERS[key] = MinHasher(n_hashes, seed)
    return _HASHERS[key]


_PLANES: dict[tuple[int, int, int], np.ndarray] = {}


def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    """Per-process cache of the (dim, nbits) random-hyperplane matrix —
    deterministic per (dim, nbits, seed), generated once per worker
    instead of once per batch (the ``_hasher`` pattern)."""
    key = (dim, nbits, seed)
    if key not in _PLANES:
        _PLANES[key] = np.random.default_rng(seed).standard_normal((dim, nbits))
    return _PLANES[key]


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
    (band_key, id, signature[, text]). The int64 band_key mixes the
    band index with that band's signature slice (``combine_hashes``) —
    an int shuffle key, not a string."""
    hasher = _hasher(n_hashes, seed)
    rows_per_band = n_hashes // bands
    n = batch.num_rows
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    sigs = hasher.signatures(shingle_hashes_batch(texts, shingle_k))
    # band keys: (n, bands) → flat; slice j of band b of row i is
    # sigs[i, b*rpb + j]
    sliced = sigs.reshape(n, bands, rows_per_band) if n else sigs.reshape(
        0, bands, rows_per_band
    )
    band_idx = np.tile(np.arange(bands, dtype=np.uint64), n)
    slot_cols = [sliced[:, :, j].reshape(-1) for j in range(rows_per_band)]
    keys = combine_hashes(band_idx, *slot_cols).view(np.int64) if n else np.array(
        [], dtype=np.int64
    )
    out_ids = np.repeat(ids, bands)
    flat_sigs = np.repeat(sigs.view(np.int64), bands, axis=0).reshape(-1)
    offs = np.arange(0, (n * bands + 1) * n_hashes, n_hashes, dtype=np.int32)
    sig_arr = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), pa.array(flat_sigs, pa.int64())
    )
    cols = {
        "band_key": pa.array(keys, pa.int64()),
        "id": pa.array(out_ids, pa.int64()),
        "sig": sig_arr,
    }
    if carry_text:
        take_idx = np.repeat(np.arange(n, dtype=np.int64), bands)
        cols["text"] = pc.take(
            pc.cast(batch.column(text_col), pa.large_string()), take_idx
        )
    return pa.table(cols)


def _pair_frame(
    ids: np.ndarray, score_matrix: np.ndarray, threshold: float
) -> pd.DataFrame:
    """Upper-triangle pairs with score >= threshold, vectorized."""
    m = len(ids)
    if m < 2:
        return pd.DataFrame({"a": [], "b": [], "score": []}).astype(
            {"a": "int64", "b": "int64", "score": "float64"}
        )
    iu, ju = np.triu_indices(m, k=1)
    s = score_matrix[iu, ju]
    keep = s >= threshold
    return pd.DataFrame(
        {
            "a": ids[iu[keep]].astype(np.int64),
            "b": ids[ju[keep]].astype(np.int64),
            "score": s[keep].astype(np.float64),
        }
    )


def _bucket_pairs_minhash(
    df: pd.DataFrame, threshold: float, group_cap: int
) -> pd.DataFrame:
    """map_groups kernel: one band bucket → candidate pairs with
    estimated Jaccard (signature agreement). Deterministic order."""
    df = df.drop_duplicates(subset=["id"]).sort_values("id").head(group_cap)
    ids = df["id"].to_numpy()
    if len(ids) < 2:
        return _pair_frame(ids, np.zeros((0, 0)), threshold)
    sigs = np.stack([np.asarray(s) for s in df["sig"]])
    est = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
    return _pair_frame(ids, est, threshold)


def minhash_band_index(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
) -> Dataset:
    """The banded signature table (band_key, id, sig) — per-doc
    independent, so it doubles as a PERSISTABLE index: write it to
    parquet once per ingested shard and future appends never re-read
    or re-hash the ingested text (see ``incremental_minhash_drops``)."""
    return ds.map_batches(
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


def minhash_pairs_from_bands(
    banded: Dataset,
    *,
    threshold: float = 0.7,
    group_cap: int = DEFAULT_GROUP_CAP,
    materialize_bands: bool = False,
) -> Dataset:
    """Candidate pairs from an (already banded) signature table. The
    only wide op is groupby(band_key); pair dedup is a second small
    shuffle. ``materialize_bands`` checkpoints the banded table so the
    collision-counts pass doesn't re-execute the banding upstream
    (see _collision_only)."""
    pairs = _collision_only(
        banded, "band_key", materialize=materialize_bands
    ).groupby("band_key").map_groups(
        lambda df: _bucket_pairs_minhash(df, threshold, group_cap),
        batch_format="pandas",
    )
    # same pair can surface from several bands → dedup on (a, b)
    return _dedup_pairs(pairs, agg="min")


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
    materialize_bands: bool = False,
) -> Dataset:
    """Near-dup candidate pairs via MinHash + LSH banding
    (band → collision pre-filter → bucket kernel, composed from
    ``minhash_band_index`` + ``minhash_pairs_from_bands``)."""
    banded = minhash_band_index(
        ds,
        text_col=text_col,
        id_col=id_col,
        n_hashes=n_hashes,
        bands=bands,
        shingle_k=shingle_k,
        seed=seed,
    )
    return minhash_pairs_from_bands(
        banded,
        threshold=threshold,
        group_cap=group_cap,
        materialize_bands=materialize_bands,
    )


def incremental_minhash_drops(
    new_docs: Dataset,
    seen_bands: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    group_cap: int = DEFAULT_GROUP_CAP,
    seed: int = 42,
    num_buckets: int = 16,
    precomputed_new_bands: Dataset | None = None,
) -> Dataset:
    """Append-only near-dup: which NEW ids to drop, given the
    PERSISTED band index of the ingested corpus (``seen_bands`` =
    ``minhash_band_index`` output read back from parquet — the
    ingested text is never re-read, re-shingled or re-hashed; only
    its 8-byte band keys + signatures shuffle again).

    Survivor rule (documented): an ingested doc always beats a new
    near-duplicate (the new id is dropped); among the remaining new
    docs, transitive components keep the min id. Id spaces must be
    disjoint across shards (stable global doc ids). Returns a Dataset
    with one column ``node`` (ids to drop), applicable with
    ``relational.semi_join(new_docs, drops, on=id_col,
    right_on='node', anti=True)``."""
    from knowledge_graph_ray.pipelines.relational import semi_join

    # the caller may have banded the shard already (ingest persists the
    # survivors' slice of this table) — never shingle+hash text twice
    new_bands = (
        precomputed_new_bands
        if precomputed_new_bands is not None
        else minhash_band_index(
            new_docs,
            text_col=text_col,
            id_col=id_col,
            n_hashes=n_hashes,
            bands=bands,
            shingle_k=shingle_k,
            seed=seed,
        ).materialize()  # consumed by the key prefilter AND the union
    )
    # Only seen rows whose band_key collides with a NEW band key can
    # ever form a pair involving a new doc (pure seen-seen pairs are
    # discarded below anyway), so prefilter the persisted index by the
    # shard's band keys BEFORE the banded shuffle: increment cost is
    # proportional to the SHARD, not the ingested corpus. Measured at
    # 200k ingested docs / full-re-crawl shard: 108 → 35 s increment.
    # Broadcast np.isin on the int keys, NOT semi_join: the band table
    # carries a list<int64> sig column, and Ray 2.49's hash-shuffle
    # join breaks on nested-type schemas at scale (the CLAUDE.md acero
    # schema-broadcast family). 8 bytes/key → a 6M-doc shard's key set
    # is ~0.8 GB; above the cap skip the prefilter (correct, slower).
    key_cap = 50_000_000
    new_keys = np.unique(
        np.concatenate(
            [
                b.column("band_key").to_numpy(zero_copy_only=False)
                for b in new_bands.select_columns(["band_key"]).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
                if b.num_rows
            ]
            or [np.array([], dtype=np.int64)]
        )
    )
    if len(new_keys) <= key_cap:
        import ray as _ray

        keys_ref = _ray.put(new_keys)

        def hit(batch: pa.Table) -> pa.Table:
            ks = _ray.get(keys_ref)
            mask = np.isin(
                batch.column("band_key").to_numpy(zero_copy_only=False), ks
            )
            return batch.filter(pa.array(mask, pa.bool_()))

        seen_hit = seen_bands.map_batches(hit, batch_format="pyarrow")
    else:
        seen_hit = seen_bands
    pairs = minhash_pairs_from_bands(
        seen_hit.union(new_bands), threshold=threshold, group_cap=group_cap
    ).materialize()  # consumed by several classification joins below
    # materialized ONCE: each semi_join below independently consumes its
    # keys side, and an un-pinned new_ids would re-execute new_docs'
    # whole upstream per join (the consumed-twice re-execution trap)
    new_ids = new_docs.select_columns([id_col]).materialize()
    # classification joins broadcast up to 5M int ids (40 MB driver
    # set, shard-bounded by contract): the distributed fallback rides
    # Ray 2.49's hash join, whose schema broadcast still trips on the
    # empty blocks pair-filtering produces (CLAUDE.md acero family)
    _mb = 5_000_000
    a_new = semi_join(
        pairs, new_ids, on="a", right_on=id_col, max_broadcast=_mb
    ).materialize()
    both_new = semi_join(a_new, new_ids, on="b", right_on=id_col, max_broadcast=_mb)
    a_new_b_seen = semi_join(
        a_new, new_ids, on="b", right_on=id_col, anti=True, max_broadcast=_mb
    )
    a_seen = semi_join(
        pairs, new_ids, on="a", right_on=id_col, anti=True, max_broadcast=_mb
    )
    b_new_a_seen = semi_join(
        a_seen, new_ids, on="b", right_on=id_col, max_broadcast=_mb
    )

    def col_as_node(name):
        def kernel(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column(name)})

        return kernel

    cross = a_new_b_seen.map_batches(
        col_as_node("a"), batch_format="pyarrow"
    ).union(b_new_a_seen.map_batches(col_as_node("b"), batch_format="pyarrow"))
    within = transitive_drops(both_new, num_buckets=num_buckets)
    merged = cross.union(within)

    def distinct(df):
        return df.drop_duplicates()

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    return hash_bucket_agg(
        merged.map_batches(distinct, batch_format="pandas", batch_size=None),
        ["node"],
        distinct,
        num_buckets=num_buckets,
    )


# -------------------------------------------------------------- simhash

def simhash64_batch(texts: list[str]) -> np.ndarray:
    """(n,) texts → (n,) uint64 simhashes in ONE numpy pass: md5-hash
    every token of the batch once, unpack bit columns via the byte
    view (little-endian: bit j == (h >> j) & 1), segment-sum per doc
    with ``np.add.reduceat`` (the ``MinHasher.signatures`` pattern —
    the old per-row ``simhash64`` re-entered numpy once per document).
    Empty docs hash to 0 (unchanged semantics)."""
    tok_lists = [_tokens(t) for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(texts))
    out = np.zeros(len(texts), dtype=np.uint64)
    total = int(lens.sum())
    if total == 0:
        return out
    all_toks = [t for toks in tok_lists for t in toks]
    h = md5_hash64_array(all_toks)
    bits = np.unpackbits(
        h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int32)
    signed = 2 * bits - 1  # (S, 64)
    offsets = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    nonempty = lens > 0  # reduceat needs strictly increasing offsets
    acc = np.add.reduceat(signed, offsets[nonempty], axis=0)  # (m, 64)
    packed = np.packbits(acc > 0, axis=1, bitorder="little")
    out[nonempty] = packed.view(np.uint64).ravel()
    return out


def simhash64(text: str) -> int:
    return int(simhash64_batch([text])[0])


def simhash_rows(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
) -> pa.Table:
    """One row per (band, id): band_key mixes the band index with that
    band's simhash slice — an INT64 key (a bijection of the old
    "bidx:slice" string; string keys put the whole banded table on
    Ray's slow string-sort path). Two docs within Hamming distance
    (bands-1) share at least one band key (pigeonhole)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    sh = simhash64_batch(texts)  # (n,) uint64, one numpy pass
    width = 64 // bands
    rep_sh = np.repeat(sh, bands)
    bidx = np.tile(np.arange(bands, dtype=np.uint64), n)
    if bands == 1:
        keys = rep_sh
    else:
        mask = np.uint64((1 << width) - 1)
        slice_ = (rep_sh >> (bidx * np.uint64(width))) & mask
        keys = bidx * np.uint64(1 << width) + slice_
    return pa.table(
        {
            "band_key": pa.array(keys.view(np.int64)),
            "id": pa.array(np.repeat(ids, bands), pa.int64()),
            "simhash": pa.array(rep_sh.view(np.int64)),
        }
    )


def _bucket_pairs_simhash(
    df: pd.DataFrame, max_hamming: int, group_cap: int
) -> pd.DataFrame:
    df = df.drop_duplicates(subset=["id"]).sort_values("id").head(group_cap)
    ids = df["id"].to_numpy()
    if len(ids) < 2:
        return _pair_frame(ids, np.zeros((0, 0)), 0.0)
    sims = df["simhash"].to_numpy().astype(np.uint64)
    x = sims[:, None] ^ sims[None, :]
    # vectorized popcount via unpackbits over the byte view
    dist = np.unpackbits(x.view(np.uint8).reshape(len(ids), len(ids), 8), axis=2).sum(
        axis=2
    )
    # reuse _pair_frame by mapping "distance <= max_hamming" to a
    # score >= threshold form: score = -dist, threshold = -max_hamming
    out = _pair_frame(ids, -dist.astype(np.float64), -float(max_hamming))
    out["score"] = -out["score"]
    return out


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
    return _dedup_pairs(pairs, agg="min")


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
        ids = df["id"].to_numpy()
        if len(ids) < 2:
            return _pair_frame(ids, np.zeros((0, 0)), threshold)
        sets = [
            set(h.tolist())
            for h in shingle_hashes_batch(list(df["text"]), shingle_k)
        ]
        m = len(ids)
        jac = np.zeros((m, m))
        for i in range(m):
            for j in range(i + 1, m):
                union = len(sets[i] | sets[j]) or 1
                jac[i, j] = len(sets[i] & sets[j]) / union
        return _pair_frame(ids, jac, threshold)

    pairs = _collision_only(banded, "band_key").groupby("band_key").map_groups(
        verify, batch_format="pandas"
    )
    return _dedup_pairs(pairs, agg="max")


# -------------------------------------------------- embedding cosine

def embedding_cosine_pairs(
    ds: Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    nbits: int = 16,
    bands: int = 2,
    seed: int = 42,
    group_cap: int | None = None,
    dim: int | None = None,
) -> Dataset:
    """Near-dup by embedding cosine: random-hyperplane sign BANDS as
    bucket keys, within-bucket exact cosine verify (vectorized matmul
    + upper-triangle mask). Scores rounded to 6 decimals (SQL-oracle
    convention shared with stages.knn).

    Shuffle amplification is exactly ``bands`` (each row is emitted
    once per band — the round-1 multi-probe design emitted nbits+1=9
    copies). A pair collides iff at least one band of sign bits
    agrees; more bands (fewer bits each) → higher recall, linearly
    more shuffle. ``group_cap=None`` (default) never truncates a
    bucket — set it only to bound adversarial boilerplate clusters,
    at a documented recall cost."""
    nbits_per_band = nbits // bands
    weights = 1 << np.arange(nbits_per_band, dtype=np.int64)

    def bucket(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table(
            {
                "band_key": pa.array([], pa.int64()),
                "id": pa.array([], pa.int64()),
                "vec": pa.array([], pa.list_(pa.float64())),
            }
        )
        if n == 0:  # an empty block must not reach vecs.shape[1]
            return empty
        from knowledge_graph_ray.stages.knn import vec_matrix
        vecs = np.asarray(vec_matrix(batch.column(vec_col)), dtype=np.float64)
        d = dim or vecs.shape[1]
        planes = _hyperplanes(d, nbits, seed)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1
        unit = vecs / norms
        bits = (unit @ planes) > 0  # (n, nbits)
        keys = []
        for b in range(bands):
            sl = bits[:, b * nbits_per_band : (b + 1) * nbits_per_band]
            sig = (sl * weights).sum(axis=1)
            keys.append(sig * bands + b)  # disjoint key space per band
        band_key = np.concatenate(keys)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out_ids = np.tile(ids, bands)
        flat = np.tile(unit, (bands, 1)).reshape(-1)
        offs = np.arange(0, (n * bands + 1) * unit.shape[1], unit.shape[1], dtype=np.int32)
        vec_arr = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(flat, pa.float64())
        )
        return pa.table(
            {
                "band_key": pa.array(band_key, pa.int64()),
                "id": pa.array(out_ids, pa.int64()),
                "vec": vec_arr,
            }
        )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["id"]).sort_values("id")
        if group_cap is not None:
            df = df.head(group_cap)
        ids = df["id"].to_numpy()
        if len(ids) < 2:
            return _pair_frame(ids, np.zeros((0, 0)), threshold)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in df["vec"]])
        sims = m @ m.T
        out = _pair_frame(ids, sims, threshold)
        out["score"] = np.round(out["score"], 6)
        return out

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")
    pairs = _collision_only(bucketed, "band_key").groupby("band_key").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    return _dedup_pairs(pairs, agg="max")


# ------------------------------------------------------------ survivors

def drops_from_pairs(pairs: Dataset, strategy: str = "pair") -> set[int]:
    """Deterministic survivor rule over the (small) pair set, collected
    to the driver and meant to be broadcast into a filter stage.

    - ``'pair'``: drop the larger id of every pair (cheap; A→B, B→C
      chains may keep C — the documented per-pair divergence).
    - ``'components'``: union-find transitive closure; keep the min id
      per connected component (reference evidence-chain semantics,
      remove_duplicate_paragraphs.py:123-128)."""
    if strategy == "pair":
        drops: set[int] = set()
        for row in pairs.iter_rows():
            drops.add(max(row["a"], row["b"]))
        return drops
    if strategy != "components":
        raise ValueError(f"unknown survivor strategy: {strategy!r}")
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    members: set[int] = set()
    for row in pairs.iter_rows():
        a, b = int(row["a"]), int(row["b"])
        members.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    keep = {}
    for x in members:
        r = find(x)
        keep[r] = min(keep.get(r, x), x)
    survivors = set(keep.values())
    return {x for x in members if x not in survivors}


def transitive_drops(
    pairs: Dataset, *, num_buckets: int = 32, engine: str = "pregel"
) -> Dataset:
    """Distributed twin of ``drops_from_pairs(strategy='components')``:
    the drop set stays a Dataset (one column ``node``) end to end —
    the scale path when the pair set is corpus-proportional and a
    driver-side union-find (reference
    remove_duplicate_paragraphs.py:123-128) would not fit one process.
    Apply with ``relational.semi_join(docs, drops, on=id_col,
    right_on='node', anti=True)``.

    ``engine='pregel'`` (default, measured 3× faster): partition-pinned
    actors shuffle the edge set once — pair edges must fit cluster
    worker memory (they are pair-table-sized, far below corpus-sized).
    ``engine='dataset'``: pure Ray Data loop, object-store spill-safe,
    but re-shuffles edges every iteration."""
    from knowledge_graph_ray.functions.graph import (
        component_drops,
        connected_components,
        connected_components_pregel,
    )

    cc = connected_components_pregel if engine == "pregel" else connected_components
    return component_drops(cc(pairs, num_buckets=num_buckets))


def filter_dropped(ds: Dataset, drops: set[int], id_col: str = "doc_id") -> Dataset:
    import ray

    drops_ref = ray.put(np.sort(np.fromiter(drops, dtype=np.int64, count=len(drops))))

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drops_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = pa.array(~np.isin(ids, d), pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
