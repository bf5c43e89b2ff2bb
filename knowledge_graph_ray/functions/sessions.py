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
    for engine-portable comparison), total value in milli-units."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col]).reset_index(drop=True)
        new_session = df[ts_col].diff() > gap
        session_idx = new_session.cumsum().astype("int64")
        g = df.groupby(session_idx)
        out = pd.DataFrame(
            {
                user_col: df[user_col].iloc[0],
                "session_idx": g.size().index,
                "n_events": g.size().values,
                "session_start": g[ts_col].min().dt.strftime("%Y-%m-%d %H:%M:%S").values,
                "session_end": g[ts_col].max().dt.strftime("%Y-%m-%d %H:%M:%S").values,
                "total_value_milli": (g[value_col].sum() * 1000)
                .round(0)
                .astype("int64")
                .values,
            }
        )
        return out

    return events.groupby(user_col).map_groups(per_user, batch_format="pandas")
