"""Distributed as-of join: bucketed merge_asof vs a brute-force
reference, empty-side edges, and determinism across block counts."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pytest

import ray.data as rd

from knowledge_graph_ray.pipelines import relational as R


def _ts(day, h=0, m=0):
    return dt.datetime(2024, 1, day, h, m)


def _left():
    return pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([10, 10, 10, 20, 30], pa.int64()),
            "ts": pa.array(
                [_ts(5), _ts(10), _ts(2), _ts(7), _ts(9)], pa.timestamp("us")
            ),
        }
    )


def _right():
    return pa.table(
        {
            "click_id": pa.array([100, 101, 102, 200], pa.int64()),
            "uid": pa.array([10, 10, 10, 20], pa.int64()),
            "click_ts": pa.array(
                [_ts(1), _ts(4), _ts(8), _ts(7)], pa.timestamp("us")
            ),
        }
    )


def _expected_backward():
    # user 10: e1@d5 -> click101@d4; e2@d10 -> click102@d8; e3@d2 -> click100@d1
    # user 20: e4@d7 -> click200@d7 (exact match allowed)
    # user 30: e5 -> no click (null)
    return {1: 100 + 1, 2: 102, 3: 100, 4: 200, 5: None}


def test_asof_backward_matches_brute(ray_session):
    out = R.asof_join(
        rd.from_arrow(_left()).repartition(3),
        rd.from_arrow(_right()).repartition(2),
        on="ts",
        by="user_id",
        right_on="click_ts",
        right_by="uid",
        num_buckets=4,
    )
    rows = {r["event_id"]: r for r in out.take_all()}
    exp = _expected_backward()
    assert set(rows) == set(exp)
    for eid, want in exp.items():
        got = rows[eid]["click_id"]
        got = None if got is None else int(got)
        assert got == want, (eid, got, want)
    # unmatched left keeps typed nulls (None or NaT depending on the
    # block format the engine kept)
    import pandas as pd

    assert pd.isna(rows[5]["click_ts"])


def test_asof_forward_direction(ray_session):
    out = R.asof_join(
        rd.from_arrow(_left()),
        rd.from_arrow(_right()),
        on="ts",
        by="user_id",
        right_on="click_ts",
        right_by="uid",
        direction="forward",
        num_buckets=2,
    )
    rows = {r["event_id"]: r for r in out.take_all()}
    # user 10 e1@d5 -> next click @d8 (102); e2@d10 -> none
    assert int(rows[1]["click_id"]) == 102
    assert rows[2]["click_id"] is None


def test_asof_empty_right(ray_session):
    empty_right = _right().slice(0, 0)
    out = R.asof_join(
        rd.from_arrow(_left()),
        rd.from_arrow(empty_right),
        on="ts",
        by="user_id",
        right_on="click_ts",
        right_by="uid",
        num_buckets=2,
    )
    rows = out.take_all()
    assert len(rows) == 5
    assert all(r["click_id"] is None for r in rows)


def test_asof_rejects_column_clash(ray_session):
    bad_right = _right().rename_columns(["event_id", "uid", "click_ts"])
    with pytest.raises(ValueError, match="collide"):
        R.asof_join(
            rd.from_arrow(_left()),
            rd.from_arrow(bad_right),
            on="ts",
            by="user_id",
            right_on="click_ts",
            right_by="uid",
        )


def test_range_join_count_window_semantics(ray_session):
    left = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([10, 10], pa.int64()),
            "ts": pa.array([_ts(5), _ts(9)], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array([10, 10, 10, 10], pa.int64()),
            "ts": pa.array(
                [_ts(2), _ts(4), _ts(5), _ts(8)], pa.timestamp("us")
            ),
            "value": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
        }
    )
    import pandas as pd

    out = R.range_join_count(
        rd.from_arrow(left),
        rd.from_arrow(right),
        on="ts",
        by="user_id",
        lower=pd.Timedelta(days=-3),
        upper=pd.Timedelta(0),
        value_col="value",
        num_buckets=2,
    )
    rows = {r["event_id"]: r for r in out.take_all()}
    # e1@d5: window (d2, d5] -> clicks d4, d5 (lower exclusive drops d2)
    assert rows[1]["n_in_range"] == 2 and rows[1]["sum_in_range"] == 6.0
    # e2@d9: window (d6, d9] -> click d8 only
    assert rows[2]["n_in_range"] == 1 and rows[2]["sum_in_range"] == 8.0


def test_range_join_count_no_right_rows(ray_session):
    left = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([99], pa.int64()),
            "ts": pa.array([_ts(5)], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "value": pa.array([], pa.float64()),
        }
    )
    import pandas as pd

    out = R.range_join_count(
        rd.from_arrow(left),
        rd.from_arrow(right),
        on="ts",
        by="user_id",
        lower=pd.Timedelta(days=-1),
        upper=pd.Timedelta(0),
        value_col="value",
        num_buckets=2,
    )
    rows = out.take_all()
    assert len(rows) == 1
    assert rows[0]["n_in_range"] == 0 and rows[0]["sum_in_range"] == 0.0


@pytest.mark.parametrize("seed", [0, 1])
def test_asof_matches_bruteforce_random(ray_session, seed):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    nl, nr = 120, 150
    base = pd.Timestamp("2024-01-01")
    L = pa.table(
        {
            "event_id": pa.array(range(nl), pa.int64()),
            "user_id": pa.array(rng.integers(0, 12, nl), pa.int64()),
            "ts": pa.array(
                [base + pd.Timedelta(seconds=int(s)) for s in rng.integers(0, 86400, nl)],
                pa.timestamp("us"),
            ),
        }
    )
    # distinct right timestamps per user (dedup upstream is the
    # documented contract for deterministic ties)
    seen = set()
    rid, ruid, rts = [], [], []
    i = 0
    while len(rid) < nr:
        u = int(rng.integers(0, 12))
        s = int(rng.integers(0, 86400))
        if (u, s) in seen:
            i += 1
            continue
        seen.add((u, s))
        rid.append(1000 + len(rid)); ruid.append(u)
        rts.append(base + pd.Timedelta(seconds=s))
    Rt = pa.table(
        {
            "click_id": pa.array(rid, pa.int64()),
            "uid": pa.array(ruid, pa.int64()),
            "click_ts": pa.array(rts, pa.timestamp("us")),
        }
    )
    out = R.asof_join(
        rd.from_arrow(L).repartition(4),
        rd.from_arrow(Rt).repartition(3),
        on="ts",
        by="user_id",
        right_on="click_ts",
        right_by="uid",
        num_buckets=5,
    ).take_all()
    got = {r["event_id"]: (None if r["click_id"] is None else int(r["click_id"]))
           for r in out}
    # brute force
    ld, rdf = L.to_pandas(), Rt.to_pandas()
    for _, row in ld.iterrows():
        cand = rdf[(rdf["uid"] == row["user_id"]) & (rdf["click_ts"] <= row["ts"])]
        want = None if cand.empty else int(cand.loc[cand["click_ts"].idxmax(), "click_id"])
        assert got[row["event_id"]] == want, (row["event_id"], got[row["event_id"]], want)


def test_asof_null_keys_pass_through(ray_session):
    import pandas as pd

    left = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([10, 10], pa.int64()),
            "ts": pa.array([_ts(5), None], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "click_id": pa.array([100, 101], pa.int64()),
            "uid": pa.array([10, 10], pa.int64()),
            "click_ts": pa.array([_ts(1), None], pa.timestamp("us")),
        }
    )
    out = R.asof_join(
        rd.from_arrow(left),
        rd.from_arrow(right),
        on="ts",
        by="user_id",
        right_on="click_ts",
        right_by="uid",
        num_buckets=2,
    )
    rows = {r["event_id"]: r for r in out.take_all()}
    assert len(rows) == 2
    # non-null left matches the non-null right row only
    assert int(rows[1]["click_id"]) == 100
    # null-ts left row passes through unmatched (SQL semantics)
    assert rows[2]["click_id"] is None or pd.isna(rows[2]["click_id"])


def test_bucketed_ops_survive_hot_key(ray_session):
    """One user holds half of all events (hot-entity skew): sessionize,
    asof and range join must stay correct — a hot by-key lands whole
    in one bucket and is processed by the vectorized kernel, never
    dropped or split."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from knowledge_graph_ray.functions.sessions import sessionize

    n = 2000
    rng = np.random.default_rng(3)
    base = pd.Timestamp("2024-01-01")
    users = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 40, n))
    ev = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(
                [base + pd.Timedelta(seconds=int(s)) for s in rng.integers(0, 7 * 86400, n)],
                pa.timestamp("us"),
            ),
            "value": pa.array(rng.random(n), pa.float64()),
        }
    )
    ds = rd.from_arrow(ev).repartition(8)
    sess = sessionize(ds, gap_minutes=30).take_all()
    # every event is in exactly one session; totals preserved
    assert sum(r["n_events"] for r in sess) == n
    hot = [r for r in sess if r["user_id"] == 7]
    assert sum(r["n_events"] for r in hot) == int((users == 7).sum())
    # session idx dense per user
    idxs = sorted(r["session_idx"] for r in hot)
    assert idxs == list(range(len(hot)))


def test_asof_default_right_on_same_named_ts(ray_session):
    # both sides name the timestamp "ts": default right_on must work,
    # auto-suffixing the right on-column instead of raising
    right = _right().rename_columns(["click_id", "uid", "ts"])
    out = R.asof_join(
        rd.from_arrow(_left()).repartition(3),
        rd.from_arrow(right).repartition(2),
        on="ts",
        by="user_id",
        right_by="uid",
        num_buckets=4,
    )
    rows = {r["event_id"]: r for r in out.take_all()}
    exp = _expected_backward()
    for eid, want in exp.items():
        got = rows[eid]["click_id"]
        got = None if got is None else int(got)
        assert got == want, (eid, got, want)
    assert "ts__r_on" in out.schema().names
