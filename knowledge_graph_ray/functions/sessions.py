"""Gap-based sessionization — windowed aggregate over an event stream
(training-data op beyond the reference; the events table's analog of
a streaming session window, computed batch-style).

A session is a maximal run of one user's events where consecutive
events are ≤ ``gap`` apart. Doc-local ordering discipline applies
(SURVEY.md §2.11): events are shuffled by user and explicitly sorted
by timestamp inside the group — never implicit block order.
"""

from __future__ import annotations

import pandas as pd

from ray.data import Dataset


def sessionize(
    events: Dataset,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> Dataset:
    """events → one row per (user, session): session_idx (0-based, by
    start time), n_events, start/end timestamps (rendered as strings
    for engine-portable comparison), total value in milli-units.

    Execution: ONE int-keyed hash-bucket shuffle on user (each user
    lands whole in one bucket), then a per-bucket kernel that
    sessionizes ALL of the bucket's users in a single vectorized
    sort + diff + groupby pass — Ray's ``map_groups`` (one pandas
    frame per user) paid ~1 ms of per-group overhead on 10-row
    frames, which dominated wall time."""
    gap = pd.Timedelta(minutes=gap_minutes)

    empty = pd.DataFrame(
        {
            user_col: pd.Series([], dtype="int64"),
            "session_idx": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "session_start": pd.Series([], dtype="str"),
            "session_end": pd.Series([], dtype="str"),
            "total_value_milli": pd.Series([], dtype="int64"),
        }
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty.copy()
        df = df.sort_values([user_col, ts_col], kind="mergesort").reset_index(
            drop=True
        )
        same_user = df[user_col].eq(df[user_col].shift())
        new_session = (~same_user) | (df[ts_col].diff() > gap)
        sid = new_session.cumsum()
        g = df.groupby(sid, sort=True)
        out = pd.DataFrame(
            {
                user_col: g[user_col].first().values,
                "n_events": g.size().values,
                "session_start": g[ts_col].min().dt.strftime("%Y-%m-%d %H:%M:%S").values,
                "session_end": g[ts_col].max().dt.strftime("%Y-%m-%d %H:%M:%S").values,
                "total_value_milli": (g[value_col].sum() * 1000)
                .round(0)
                .astype("int64")
                .values,
            }
        )
        # sessions are emitted in (user, start-ts) order → 0-based
        # per-user index by start time
        out["session_idx"] = out.groupby(user_col, sort=False).cumcount().astype(
            "int64"
        )
        return out[
            [
                user_col,
                "session_idx",
                "n_events",
                "session_start",
                "session_end",
                "total_value_milli",
            ]
        ]

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    return hash_bucket_agg(events, [user_col], per_bucket, num_buckets=32)


def lag_deltas(
    events: Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> Dataset:
    """LAG window op: per event, microseconds since the same user's
    previous event (NULL for the user's first event). Deterministic
    order: (ts, id) within user, matching the SQL twin's
    ``LAG(...) OVER (PARTITION BY user ORDER BY ts, id)``.

    Same execution shape as ``sessionize``: one int-keyed hash-bucket
    shuffle on user, then one vectorized sort + groupby-diff pass per
    bucket (all of the bucket's users at once). Emits nullable Int64
    so every bucket block has an identical Arrow schema."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    user_col: pd.Series([], dtype="int64"),
                    "delta_us": pd.Series([], dtype="Int64"),
                }
            )
        df = df.sort_values([user_col, ts_col, id_col], kind="mergesort").reset_index(
            drop=True
        )
        # explicit µs resolution (pandas 2.x keeps Arrow's us unit;
        # dividing a presumed-ns int64 would be off by 1000)
        us = df[ts_col].astype("datetime64[us]").astype("int64")
        delta = us.groupby(df[user_col]).diff()
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                user_col: df[user_col].astype("int64"),
                "delta_us": delta.astype("Int64"),
            }
        )

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    return hash_bucket_agg(
        events.select_columns([id_col, user_col, ts_col]),
        [user_col],
        per_bucket,
        num_buckets=32,
    )
