"""Relational building blocks on Ray Data (SURVEY.md §2.4-§2.6).

Join strategy (documented for the 100 TB design):
- small side (dim tables, id sets) → ``broadcast_join`` /
  ``semi_filter``: the build side is ``ray.put`` ONCE and probed
  inside ``map_batches`` — no shuffle, no per-batch re-ship.
- large-large → Ray Data's native hash ``Dataset.join`` with an
  explicit ``num_partitions`` (both sides shuffle on the key).

Reference analogs: pandas ``isin`` semi-joins (J1/J2), dict-lookup FK
enrichment (J3, create_QA_dataset.py:71-95).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def broadcast_join(
    ds: Dataset,
    small: pa.Table,
    *,
    key: str,
    small_key: str | None = None,
    cols: list[str] | None = None,
    how: str = "inner",
) -> Dataset:
    """Map-side hash join against a broadcast small table.

    how='inner' drops probe rows with no match; 'left' keeps them with
    nulls. Build side must be one row per key (dim-table shape).
    """
    import pandas as pd

    small_key = small_key or key
    cols = cols or [c for c in small.column_names if c != small_key]
    # build side shipped once as (key index, per-column Arrow arrays);
    # the probe is a vectorized hash lookup (pandas Index.get_indexer,
    # C-speed) + Arrow take — no per-row Python loop on the hot path
    build_index = pd.Index(small.column(small_key).to_pylist())
    build_cols = {c: small.column(c).combine_chunks() for c in cols}
    ref = ray.put((build_index, build_cols))

    def probe(batch: pa.Table) -> pa.Table:
        index, data = ray.get(ref)
        probe_keys = batch.column(key).to_numpy(zero_copy_only=False)
        pos = index.get_indexer(probe_keys)  # -1 = no match
        if how == "inner":
            hit = pos >= 0
            batch = batch.filter(pa.array(hit, pa.bool_()))
            pos = pos[hit]
        out = batch
        take_idx = pa.array(
            np.where(pos >= 0, pos, np.zeros_like(pos)), pa.int64()
        )
        miss = pa.array(pos < 0, pa.bool_())
        for c in cols:
            vals = data[c].take(take_idx)
            if how != "inner":
                vals = pc.if_else(miss, pa.scalar(None, vals.type), vals)
            out = out.append_column(c, vals)
        return out

    return ds.map_batches(probe, batch_format="pyarrow")


def semi_filter(
    ds: Dataset, keys, *, col: str, anti: bool = False
) -> Dataset:
    """Semi/anti-join against a broadcast key set (J1/J2 shape)."""
    ref = ray.put(frozenset(keys))

    def probe(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        vals = batch.column(col).to_pylist()
        mask = pa.array(
            [(v in s) != anti for v in vals],
            pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(probe, batch_format="pyarrow")


def hash_bucket_agg(
    ds: Dataset,
    keys: list[str],
    combine,
    *,
    num_buckets: int = 64,
):
    """Hash-shuffle aggregation: rows are bucketed by a stable hash of
    the key columns (int key), shuffled once on that SMALL int key, and
    each bucket is reduced by ONE vectorized pandas ``combine`` call.

    Ray's native sort-based Aggregate orders the whole dataset by the
    raw (possibly string) keys — measured ~6k rows/s on 3-string keys.
    Bucketing turns that into an int sort plus ``num_buckets`` pandas
    group-reduces (each ≥ thousands of rows → vectorization wins).
    ``num_buckets`` is the reducer parallelism: size it ≥ cluster cores
    at real scale; hot KEYS are fine (a bucket holds many keys), hot
    buckets only occur if one single key dominates — pre-combine
    upstream first (all call sites here do)."""
    import pandas as pd

    from knowledge_graph_ray.functions.hashing import combine_hashes, hash64_array

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        cols = [hash64_array(df[k].to_numpy()) for k in keys]
        df = df.copy()
        df["_bucket"] = (combine_hashes(*cols) % num_buckets).astype("int64")
        return df

    bucketed = ds.map_batches(bucket, batch_format="pandas", batch_size=None)

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return combine(df.drop(columns=["_bucket"]))

    return bucketed.groupby("_bucket").map_groups(
        reduce_bucket, batch_format="pandas"
    )


def semi_join(
    large: Dataset,
    keys: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    max_broadcast: int = 100_000,
    num_partitions: int = 16,
) -> Dataset:
    """Semi-join where the key side is itself a Dataset, with a size
    guard: a small key side (dim-table filters) is collected once and
    broadcast (``semi_filter``); above ``max_broadcast`` keys the path
    switches to a distributed hash join against the DISTINCT key
    column — never a corpus-proportional ``take_all()`` to the driver
    (the round-1 seed-set pattern flagged in review)."""
    from ray.data.aggregate import Count

    right_on = right_on or on
    keys = keys.select_columns([right_on]).materialize()
    if keys.count() <= max_broadcast:
        vals = [r[right_on] for r in keys.take_all()]
        return semi_filter(large, vals, col=on)
    uniq = (
        keys.groupby(right_on)
        .aggregate(Count(alias_name="_n"))
        .select_columns([right_on])
    )
    joined = hash_join(
        large, uniq, on=on, right_on=right_on, num_partitions=num_partitions
    )

    def drop_key(batch: pa.Table) -> pa.Table:
        extra = [c for c in batch.column_names if c == right_on and c != on]
        return batch.drop_columns(extra) if extra else batch

    return joined.map_batches(drop_key, batch_format="pyarrow")


def hash_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str | tuple,
    right_on: str | tuple | None = None,
    how: str = "inner",
    num_partitions: int = 16,
) -> Dataset:
    """Large-large join: Ray Data native hash join (explicit partition
    count — this is an all-to-all shuffle of BOTH sides; prefer
    broadcast_join whenever one side fits in the object store)."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on)
    )
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on_t,
        right_on=r_t,
    )
