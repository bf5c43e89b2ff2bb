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
    if build_index.has_duplicates:  # get_indexer would raise InvalidIndexError
        raise ValueError(
            f"broadcast_join build side has duplicate keys in {small_key!r}; "
            "deduplicate to one row per key first"
        )
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
    key_list = list(keys)
    value_set = pa.array(key_list) if key_list else None
    ref = ray.put(value_set)

    def probe(batch: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        if vs is None:  # empty key set: inner → nothing, anti → all
            return batch.slice(0, 0) if not anti else batch
        mask = pc.is_in(batch.column(col), value_set=vs.cast(batch.schema.field(col).type))
        if anti:
            mask = pc.invert(pc.fill_null(mask, False))
        else:
            mask = pc.fill_null(mask, False)
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


def _known_size_bytes(ds: Dataset) -> int | None:
    """Metadata-only size estimate (parquet reads and materialized
    datasets know their bytes; transformed plans return None). NEVER
    triggers execution — ``Dataset.size_bytes()`` would run the whole
    upstream plan for unknown sizes, which a partition-count heuristic
    must not do."""
    try:
        return ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        return None


def auto_partitions(
    *sides: Dataset,
    default: int = 16,
    target_bytes: int = 192 << 20,
    cap: int = 1024,
) -> int:
    """Hash-shuffle partition count from the sides' known sizes:
    ~192 MB of input per partition, clamped to [default, cap]. A fixed
    count serializes the shuffle at 100× the data; sizing from bytes
    keeps per-partition build tables bounded. Sides whose size is not
    known from metadata contribute nothing (falling back to ``default``
    when nothing is known — at real scale join inputs are parquet
    reads or materialized checkpoints, whose size IS known)."""
    total = 0
    known = False
    for s in sides:
        b = _known_size_bytes(s)
        if b:
            total += b
            known = True
    if not known:
        return default
    return int(max(default, min(cap, -(-total // target_bytes))))


def pin_schema(ds: Dataset, schema: pa.Schema) -> Dataset:
    """Force every output block to one exact Arrow schema.

    Bucketed pandas kernels leave a rendering hazard at a query
    boundary: pandas nullable dtypes (Int64) — or arrow tables built
    with ``Table.from_pandas``, whose embedded pandas metadata
    reconstructs them — round-trip to a different rendering than
    DuckDB's BIGINT-with-NULL. Rebuilding each block as a
    metadata-free arrow table (plain int64 + validity bitmap) makes
    every comparison level agree; rows are untouched. (Ray bypasses
    the UDF for zero-row blocks, so schema-less empties pass through —
    harmless: row-producing consumers skip them.)"""

    def cast(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return schema.empty_table()
        cols = [
            batch.column(f.name).cast(f.type) for f in schema
        ]
        return pa.Table.from_arrays(cols, schema=schema)

    return ds.map_batches(cast, batch_format="pyarrow")


def semi_join(
    large: Dataset,
    keys: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    max_broadcast: int = 100_000,
    num_partitions: int | None = None,
) -> Dataset:
    """Semi/anti-join where the key side is itself a Dataset, with a
    size guard: a small key side (dim-table filters) is collected once
    and broadcast (``semi_filter``); above ``max_broadcast`` keys the
    path switches to a distributed hash join against the DISTINCT key
    column — never a corpus-proportional ``take_all()`` to the driver
    (the round-1 seed-set pattern flagged in review). ``anti=True``
    keeps rows WITHOUT a key match; Ray's native join has no anti
    type, so the distributed path is a left-outer join against keys
    carrying a marker column, filtered on marker-null."""
    right_on = right_on or on
    keys = keys.select_columns([right_on]).materialize()
    if keys.count() <= max_broadcast:
        vals = [r[right_on] for r in keys.take_all()]
        return semi_filter(large, vals, col=on, anti=anti)

    # distinct of the key column: per-block pc.unique combiner + ONE
    # int hash-bucket shuffle. Ray's native sort-based groupby here
    # was the measured scale cliff — 200k distinct int keys took 256 s
    # of the first 200k-page ingest-increment run; this path is <2 s.
    def uniq_block(batch: pa.Table) -> pa.Table:
        return pa.table({right_on: pc.unique(batch.column(right_on))})

    def uniq_bucket(df):
        return df.drop_duplicates(subset=[right_on])

    uniq = hash_bucket_agg(
        keys.map_batches(uniq_block, batch_format="pyarrow", batch_size=None),
        [right_on],
        uniq_bucket,
        num_buckets=32,
    )
    if anti:

        def mark(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "_anti_m", pa.array(np.ones(batch.num_rows, dtype=np.int8))
            )

        uniq = uniq.map_batches(mark, batch_format="pyarrow")
    joined = hash_join(
        large,
        uniq,
        on=on,
        right_on=right_on,
        how="left_outer" if anti else "inner",
        num_partitions=num_partitions,
    )

    def drop_key(batch: pa.Table) -> pa.Table:
        if anti:
            batch = batch.filter(pc.is_null(batch.column("_anti_m")))
            batch = batch.drop_columns(["_anti_m"])
        extra = [c for c in batch.column_names if c == right_on and c != on]
        return batch.drop_columns(extra) if extra else batch

    return joined.map_batches(drop_key, batch_format="pyarrow")


def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    by: str,
    right_on: str | None = None,
    right_by: str | None = None,
    direction: str = "backward",
    num_buckets: int = 32,
) -> Dataset:
    """Distributed as-of join: each left row gets the nearest right
    row at-or-before (``backward``) / at-or-after (``forward``) its
    ``on`` value, matched within the same ``by`` key.

    Execution (documented partitioning assumption): both sides are
    tagged and bucketed by a hash of the ``by`` key — every key's rows
    from BOTH sides land whole in one bucket — then each bucket runs
    ONE vectorized ``pandas.merge_asof`` over its sorted slice. One
    all-to-all of left+right; no global sort, no driver collection.
    The right ``on`` column is auto-suffixed ``__r_on`` in the output
    when it would collide with a left column (so the default
    ``right_on=None`` with same-named timestamps just works); other
    right-side non-key columns must not collide with left column
    names (rename upstream). A hot ``by`` key bounds one bucket's
    work; pre-aggregate the right side upstream if it is dense."""
    import pandas as pd

    right_on = right_on or on
    right_by = right_by or by
    l_schema, r_schema = left.schema(), right.schema()
    left_names = list(l_schema.names)
    rename_r = {right_by: by}
    if right_on != right_by and right_on in left_names:
        rename_r[right_on] = right_on + "__r_on"
    right_on = rename_r.get(right_on, right_on)
    r_names = [rename_r.get(n, n) if n != right_by else n for n in r_schema.names]
    r_types = dict(zip(r_names, r_schema.types))
    r_keep = [c for c in r_names if c != right_by]
    clash = set(r_keep) & set(left_names)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")
    # one superset Arrow schema (typed nulls for the absent side) so
    # the union is schema-identical — pandas padding would widen int64
    # to float64 on one side only and break the union
    superset = pa.schema(
        [(n, t) for n, t in zip(l_schema.names, l_schema.types)]
        + [(c, r_types[c]) for c in r_keep]
        + [("__side", pa.int8())]
    )

    def pad(tbl: pa.Table, side: int, rename: dict) -> pa.Table:
        tbl = tbl.rename_columns([rename.get(c, c) for c in tbl.column_names])
        cols = []
        for field in superset:
            if field.name == "__side":
                cols.append(pa.array([side] * len(tbl), pa.int8()))
            elif field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(len(tbl), field.type))
        return pa.Table.from_arrays(cols, schema=superset)

    left_t = left.map_batches(
        lambda t: pad(t, 0, {}), batch_format="pyarrow", batch_size=None
    )
    right_t = right.map_batches(
        lambda t: pad(t, 1, rename_r), batch_format="pyarrow", batch_size=None
    )
    both = left_t.union(right_t)

    out_cols = left_names + r_keep

    def _nullable_dtype(t: pa.DataType):
        if pa.types.is_integer(t):
            return "Int64"
        if pa.types.is_floating(t):
            return "Float64"
        if pa.types.is_timestamp(t):
            return "datetime64[ns]"
        if pa.types.is_boolean(t):
            return "boolean"
        return "object"

    # pandas NULLABLE dtypes for the right columns: unmatched left
    # rows hold nulls, and every bucket (matched, unmatched, empty-R)
    # must emit the SAME Arrow schema — merge_asof's float64-NaN
    # widening would make int columns double in some blocks only
    r_pd_dtypes = {c: _nullable_dtype(r_types[c]) for c in r_keep}

    def bucket_kernel(df: pd.DataFrame) -> pd.DataFrame:
        L = df[df["__side"] == 0][left_names]
        # SQL null semantics (merge_asof raises on NaT): null-on left
        # rows pass through unmatched; null right rows never match
        R = df[df["__side"] == 1][[by] + r_keep]
        R = R[R[right_on].notna()]
        if not len(L):
            empty = {c: L[c] for c in left_names}
            empty.update(
                {c: pd.Series([], dtype=r_pd_dtypes[c]) for c in r_keep}
            )
            return pd.DataFrame(empty)
        null_L = L[L[on].isna()]
        L = L[L[on].notna()]
        if not len(L):
            out = null_L.copy()
            for c in r_keep:
                out[c] = pd.Series(
                    [None] * len(out), dtype=r_pd_dtypes[c], index=out.index
                )
            return out[out_cols]
        L = L.sort_values(on, kind="mergesort").reset_index(drop=True)
        if len(R):
            R = R.sort_values(right_on, kind="mergesort").reset_index(drop=True)
            out = pd.merge_asof(
                L,
                R,
                left_on=on,
                right_on=right_on,
                by=by,
                direction=direction,
                suffixes=("", "__r"),
            )
        else:
            out = L.copy()
            for c in r_keep:
                out[c] = pd.Series(
                    [None] * len(L), dtype=r_pd_dtypes[c], index=out.index
                )
        for c in r_keep:
            if str(out[c].dtype) != r_pd_dtypes[c]:
                out[c] = out[c].astype(r_pd_dtypes[c])
        if len(null_L):
            nl = null_L.copy()
            for c in r_keep:
                nl[c] = pd.Series(
                    [None] * len(nl), dtype=r_pd_dtypes[c], index=nl.index
                )
            out = pd.concat([out[out_cols], nl[out_cols]], ignore_index=True)
        return out[out_cols]

    return hash_bucket_agg(both, [by], bucket_kernel, num_buckets=num_buckets)


def range_join_count(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    by: str,
    right_on: str | None = None,
    right_by: str | None = None,
    lower,
    upper,
    value_col: str | None = None,
    count_alias: str = "n_in_range",
    sum_alias: str = "sum_in_range",
    num_buckets: int = 32,
) -> Dataset:
    """Aggregated range join: for each left row, count (and optionally
    sum ``value_col`` over) the right rows of the same ``by`` key whose
    ``right_on`` lies in ``(on + lower, on + upper]``.

    Execution: same co-location scheme as ``asof_join`` (tagged union,
    ONE hash-bucket shuffle on the by-key), then a per-bucket
    vectorized kernel — right rows are sorted per key and reduced to
    cumulative (count, sum) arrays; each left row's window aggregate
    is the difference of two ``searchsorted`` lookups. Never
    materializes the joined pairs, so a dense window cannot explode
    the output (the aggregate form is the scale-safe way to range-join
    at corpus size; emit pairs only behind a cap if you need them)."""
    import pandas as pd

    right_on = right_on or on
    right_by = right_by or by
    l_schema = left.schema()
    left_names = list(l_schema.names)

    r_cols = [right_by, right_on] + ([value_col] if value_col else [])
    right = right.select_columns(list(dict.fromkeys(r_cols)))

    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column("__side", pa.array([0] * len(t), pa.int8()))

    # right side reduced to (by, on, value) with left-compatible names
    def tag_right(t: pa.Table) -> pa.Table:
        cols = {
            by: t.column(right_by),
            "__r_on": t.column(right_on),
        }
        if value_col:
            cols["__r_val"] = t.column(value_col).cast(pa.float64())
        out = pa.table(cols)
        return out.append_column("__side", pa.array([1] * len(t), pa.int8()))

    superset_fields = [(n, t) for n, t in zip(l_schema.names, l_schema.types)]
    superset_fields.append(("__r_on", dict(zip(l_schema.names, l_schema.types))[on]))
    if value_col:
        superset_fields.append(("__r_val", pa.float64()))
    superset_fields.append(("__side", pa.int8()))
    superset = pa.schema(superset_fields)

    def pad(t: pa.Table) -> pa.Table:
        cols = []
        for field in superset:
            if field.name in t.column_names:
                cols.append(t.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(len(t), field.type))
        return pa.Table.from_arrays(cols, schema=superset)

    both = left.map_batches(
        lambda t: pad(tag_left(t)), batch_format="pyarrow", batch_size=None
    ).union(
        right.map_batches(
            lambda t: pad(tag_right(t)), batch_format="pyarrow", batch_size=None
        )
    )

    def bucket_kernel(df: pd.DataFrame) -> pd.DataFrame:
        L = df[df["__side"] == 0][left_names]
        out_empty = L.iloc[0:0].assign(
            **(
                {count_alias: pd.Series([], dtype="int64")}
                | ({sum_alias: pd.Series([], dtype="float64")} if value_col else {})
            )
        )
        if not len(L):
            return out_empty
        R = df[df["__side"] == 1]
        counts = np.zeros(len(L), dtype=np.int64)
        sums = np.zeros(len(L), dtype=np.float64) if value_col else None
        L = L.reset_index(drop=True)
        if len(R):
            r_groups = dict(iter(R.groupby(by, sort=False)))
            for key, li in L.groupby(by, sort=False).indices.items():
                r = r_groups.get(key)
                if r is None or not len(r):
                    continue
                r = r.sort_values("__r_on", kind="mergesort")
                r_on = r["__r_on"].to_numpy()
                lo = np.searchsorted(
                    r_on, (L[on].iloc[li] + lower).to_numpy(), side="right"
                )
                hi = np.searchsorted(
                    r_on, (L[on].iloc[li] + upper).to_numpy(), side="right"
                )
                counts[li] = hi - lo
                if value_col:
                    cs = np.concatenate(
                        [[0.0], np.cumsum(r["__r_val"].to_numpy())]
                    )
                    sums[li] = cs[hi] - cs[lo]
        out = L.copy()
        out[count_alias] = counts
        if value_col:
            out[sum_alias] = sums
        return out

    return hash_bucket_agg(both, [by], bucket_kernel, num_buckets=num_buckets)


def hash_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str | tuple,
    right_on: str | tuple | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
) -> Dataset:
    """Large-large join: Ray Data native hash join (partition count
    derived from known input bytes via ``auto_partitions`` unless
    given — this is an all-to-all shuffle of BOTH sides; prefer
    broadcast_join whenever one side fits in the object store).

    Both sides are coalesced through a no-shuffle ``repartition`` to
    eliminate ZERO-ROW blocks first: Ray 2.49's hash-shuffle join
    broadcasts each side's schema to the partition aggregators only
    from its FIRST shuffle task, and that task early-returns on an
    empty block without broadcasting (hash_shuffle.py:223,584) — any
    partition that then receives no real shard builds a zero-column
    table and pyarrow's acero join raises ``No match ... for key
    field reference``. Filters upstream of a join routinely leave
    empty blocks, hitting this nondeterministically. (A yield-nothing
    map_batches generator does NOT work: a task whose UDF yields no
    batch still emits one schema-less empty block.)"""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on)
    )
    if num_partitions is None:
        num_partitions = auto_partitions(left, right)
    # split repartition itself emits zero-row blocks when a side holds
    # fewer rows than the target count — clamp per side. The row probe
    # is limit(k).count(): it EARLY-STOPS after k rows, so a big side
    # pays a few blocks of re-execution, never a full materialize copy
    def _clamped(side: Dataset) -> Dataset:
        probe = side.limit(num_partitions).count()
        return side.repartition(max(1, min(num_partitions, probe)))

    left, right = _clamped(left), _clamped(right)
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on_t,
        right_on=r_t,
    )
