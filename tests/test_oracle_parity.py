"""Replay of the driver's correctness protocol at sf0.001: every
queries() entry with an oracle must match DuckDB row-for-row
(order-insensitive, columns sorted by name)."""

from __future__ import annotations

import math
import os

import duckdb
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_table(result) -> pa.Table:
    import pandas as pd

    import ray.data

    if isinstance(result, ray.data.Dataset):
        rows = result.take_all()
        return pa.Table.from_pylist(rows) if rows else pa.table({})
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result)
    return result


def _canon(table: pa.Table):
    cols = sorted(table.column_names)
    rows = []
    data = {c: table.column(c).to_pylist() for c in cols}
    for i in range(table.num_rows):
        row = []
        for c in cols:
            v = data[c][i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isclose(v, round(v), abs_tol=1e-9):
                    v = float(round(v))
            row.append(v)
        rows.append(tuple(row))
    return cols, sorted(rows, key=repr)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF_DIR, t)}.parquet')"
        )
    return c


def oracle_names():
    from knowledge_graph_ray.pipelines.queries import ORACLE_SQL

    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", oracle_names())
def test_query_matches_oracle(name, con, ray_session):
    from knowledge_graph_ray.pipelines.queries import ORACLE_SQL, QUERIES

    ray_tbl = _to_table(QUERIES[name](SF_DIR))
    sql_tbl = con.execute(ORACLE_SQL[name]).arrow()
    r_cols, r_rows = _canon(ray_tbl)
    s_cols, s_rows = _canon(sql_tbl)
    assert r_cols == s_cols, f"{name}: columns {r_cols} != {s_cols}"
    assert len(r_rows) == len(s_rows), f"{name}: {len(r_rows)} vs {len(s_rows)} rows"
    mism = [i for i, (a, b) in enumerate(zip(r_rows, s_rows)) if a != b][:3]
    assert not mism, f"{name}: first mismatches {[(r_rows[i], s_rows[i]) for i in mism]}"
