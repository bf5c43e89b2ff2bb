"""G1/G2 emission, G3 queries, joins (SURVEY.md §2.4, §2.8)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa

import ray.data as rd

from knowledge_graph_ray.functions import triples as T
from knowledge_graph_ray.pipelines import relational as R


def test_node_triples_counts_and_nulls():
    b = pa.table(
        {
            "case_id": pa.array([1, 2], pa.int64()),
            "title": pa.array(["A", None]),
            "score": pa.array([1.5, 2.0], pa.float64()),
        }
    )
    out = T.node_triples(b, id_col="case_id", node_type="case")
    # row1: type + title + score = 3; row2: type + score = 2
    assert out.num_rows == 5
    rows = set(zip(out.column("subj").to_pylist(), out.column("pred").to_pylist(), out.column("obj").to_pylist()))
    assert ("case:1", "rdf:type", "case") in rows
    assert ("case:1", "score", "1.5") in rows
    assert ("case:2", "title", None) not in {r for r in rows}


def test_literal_rendering():
    assert T.render_literal(dt.datetime(1995, 3, 15)) == "1995-03-15 00:00:00"
    assert T.render_literal(dt.date(1995, 3, 15)) == "1995-03-15"
    assert T.render_literal(4032.68) == "4032.68"
    assert T.render_literal(True) == "true"
    assert T.render_literal(7) == "7"


def test_edge_triples_with_roles():
    b = pa.table(
        {
            "case_id": pa.array([1], pa.int64()),
            "actor_id": pa.array([9], pa.int64()),
            "role_id": pa.array([2], pa.int32()),
        }
    )
    out = T.edge_triples(
        b,
        src_col="case_id",
        dst_col="actor_id",
        src_type="case",
        dst_type="actor",
        fwd_pred="hasActor",
        inv_pred="isActorOf",
        role_col="role_id",
        role_map={2: "lead minister"},
    )
    rows = set(zip(out.column("subj").to_pylist(), out.column("pred").to_pylist(), out.column("obj").to_pylist()))
    assert rows == {
        ("case:1", "hasActor", "actor:9"),
        ("actor:9", "isActorOf", "case:1"),
        ("case:1", "lead_minister", "actor:9"),
    }


def test_subjects_matching_conjunction(ray_session):
    rows = [
        ("case:1", "hasActor", "actor:9"),
        ("case:1", "date", "2024-01-05"),
        ("case:2", "hasActor", "actor:9"),
        ("case:2", "date", "2025-06-01"),
        ("case:3", "hasActor", "actor:7"),
        ("case:3", "date", "2024-02-02"),
    ]
    tbl = pa.table(
        {
            "subj": pa.array([r[0] for r in rows]),
            "pred": pa.array([r[1] for r in rows]),
            "obj": pa.array([r[2] for r in rows]),
        }
    )
    ds = rd.from_arrow(tbl)
    out = T.subjects_matching(
        ds,
        [
            {"pred": "hasActor", "obj_in": ["actor:9"]},
            {"pred": "date", "obj_between": ("2024-01-01", "2024-12-31")},
        ],
        num_partitions=2,
    ).take_all()
    assert [r["subj"] for r in out] == ["case:1"]


def test_to_turtle():
    b = pa.table(
        {
            "subj": pa.array(["case:1"]),
            "pred": pa.array(["title"]),
            "obj": pa.array(['say "hi"']),
            "obj_dtype": pa.array(["string"]),
        }
    )
    line = T.to_turtle_batch(b).column("line").to_pylist()[0]
    assert line == '<http://kg.local/case/1> <http://kg.local/title> "say \\"hi\\"" .'


def test_broadcast_join_inner_and_left(ray_session):
    big = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()), "v": pa.array(list("abcd"))})
    )
    dim = pa.table({"k": pa.array([1, 3], pa.int64()), "name": pa.array(["one", "three"])})
    inner = R.broadcast_join(big, dim, key="k").take_all()
    assert {(r["k"], r["name"]) for r in inner} == {(1, "one"), (3, "three")}
    left = R.broadcast_join(big, dim, key="k", how="left").take_all()
    assert len(left) == 4
    assert {r["k"]: r["name"] for r in left}[2] is None


def test_semi_and_anti_filter(ray_session):
    ds = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 4], pa.int64())}))
    assert sorted(r["k"] for r in R.semi_filter(ds, {2, 4}, col="k").take_all()) == [2, 4]
    assert sorted(r["k"] for r in R.semi_filter(ds, {2, 4}, col="k", anti=True).take_all()) == [1, 3]


def test_hash_join_large_large(ray_session):
    left = rd.from_arrow(
        pa.table({"k": pa.array(range(100), pa.int64()), "l": pa.array(range(100), pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array(range(0, 200, 2), pa.int64()), "r": pa.array(range(100), pa.int64())})
    )
    out = R.hash_join(left, right, on="k", num_partitions=4).take_all()
    assert len(out) == 50
    assert all(r["k"] % 2 == 0 for r in out)


def test_stage_builder_chain(ray_session):
    from knowledge_graph_ray.pipelines.builder import Stage, chain
    from knowledge_graph_ray.functions.extract import extract_batch
    from knowledge_graph_ray.functions.segment import paragraphs_batch
    from knowledge_graph_ray.sources import synth

    pages = rd.from_arrow(synth.pages_table(8)).drop_columns(["text"])
    ds = chain(
        pages,
        [
            Stage("extract", fn=extract_batch),
            Stage("segment", fn=paragraphs_batch),
        ],
    )
    assert ds.count() > 8


def test_semi_join_broadcast_and_distributed_agree(ray_session):
    large = rd.from_arrow(
        pa.table(
            {
                "o_key": pa.array([i % 20 for i in range(200)], pa.int64()),
                "v": pa.array(range(200), pa.int64()),
            }
        )
    )
    keys = rd.from_arrow(
        # duplicated keys: the distributed path must dedup before the
        # inner join or it would multiply matching rows
        pa.table({"c_key": pa.array([2, 2, 5, 7, 7, 7], pa.int64())})
    )
    bc = R.semi_join(large, keys, on="o_key", right_on="c_key").take_all()
    dist = R.semi_join(
        large, keys, on="o_key", right_on="c_key", max_broadcast=0
    ).take_all()
    canon = lambda rows: sorted((r["o_key"], r["v"]) for r in rows)
    assert canon(bc) == canon(dist)
    assert len(bc) == 30  # 3 distinct keys × 10 rows each
    assert all(set(r) == {"o_key", "v"} for r in dist)


def test_anti_semi_join_broadcast_and_distributed_agree(ray_session):
    large = rd.from_arrow(
        pa.table(
            {
                "o_key": pa.array([i % 20 for i in range(200)], pa.int64()),
                "v": pa.array(range(200), pa.int64()),
            }
        )
    )
    keys = rd.from_arrow(
        pa.table({"c_key": pa.array([2, 2, 5, 7, 7, 7], pa.int64())})
    )
    bc = R.semi_join(
        large, keys, on="o_key", right_on="c_key", anti=True
    ).take_all()
    dist = R.semi_join(
        large, keys, on="o_key", right_on="c_key", anti=True, max_broadcast=0
    ).take_all()
    canon = lambda rows: sorted((r["o_key"], r["v"]) for r in rows)
    assert canon(bc) == canon(dist)
    assert len(bc) == 170  # 17 of 20 keys survive × 10 rows
    assert not {r["o_key"] for r in bc} & {2, 5, 7}
    assert all(set(r) == {"o_key", "v"} for r in dist)


def test_pin_schema_strips_pandas_nullable_metadata(ray_session):
    import pandas as pd

    def make(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({"a": pd.array([1, None], dtype="Int64")})
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = rd.from_items([{"x": 1}]).map_batches(make, batch_format="pandas")
    pinned = R.pin_schema(ds, pa.schema([("a", pa.int64())]))
    # without pinning, the from_pandas metadata round-trips to Int64;
    # pinned blocks must come back as plain float64-with-NaN
    assert str(pinned.to_pandas()["a"].dtype) == "float64"
    rows = pinned.take_all()
    assert rows[0]["a"] == 1 and rows[1]["a"] is None


def test_hash_join_side_smaller_than_partition_count(ray_session):
    # a 3-row side with num_partitions=16 must not regenerate the
    # zero-row blocks the empty-block guard exists to remove
    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "l": pa.array([10, 20, 30], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([2, 3, 4], pa.int64()), "r": pa.array([7, 8, 9], pa.int64())})
    )
    out = R.hash_join(left, right, on="k", num_partitions=16).take_all()
    assert sorted((r["k"], r["l"], r["r"]) for r in out) == [(2, 20, 7), (3, 30, 8)]


def _g3_union_triples():
    rows = [
        ("case:1", "hasActor", "actor:9"),
        ("case:1", "date", "2024-01-05"),
        ("case:1", "status", "open"),
        ("case:2", "hasActor", "actor:9"),
        ("case:2", "date", "2025-06-01"),
        ("case:2", "status", "closed"),
        ("case:3", "hasActor", "actor:7"),
        ("case:3", "date", "2024-02-02"),
        ("case:3", "status", "closed"),
        ("case:4", "hasActor", "actor:7"),
        ("case:4", "date", "2023-09-09"),
        ("case:4", "status", "open"),
    ]
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows]),
                "pred": pa.array([r[1] for r in rows]),
                "obj": pa.array([r[2] for r in rows]),
            }
        )
    )


def test_filter_pred_obj_expressions(ray_session):
    """FILTER shapes (r5): strict gt/lt string compare + RE2 regex."""
    ds = _g3_union_triples()
    gt = T.filter_pred_obj(ds, pred="date", obj_gt="2024-01-05").take_all()
    assert {r["subj"] for r in gt} == {"case:2", "case:3"}  # strict >
    lt = T.filter_pred_obj(ds, pred="date", obj_lt="2024-01-05").take_all()
    assert {r["subj"] for r in lt} == {"case:4"}
    rx = T.filter_pred_obj(ds, pred="date", obj_regex="^202[34]-0[12]").take_all()
    assert {r["subj"] for r in rx} == {"case:1", "case:3"}


def test_subjects_union_branches(ray_session):
    """SPARQL UNION: ANY-branch semantics, conjunction inside a
    branch, distinct across branches (case:3 matches both)."""
    ds = _g3_union_triples()
    out = T.subjects_union(
        ds,
        [
            # open cases dated 2024+ (conjunctive branch)
            [
                {"pred": "status", "obj_in": ["closed"]},
                {"pred": "date", "obj_regex": "^2024"},
            ],
            # OR any case of actor 7 (single-pattern branch)
            [{"pred": "hasActor", "obj_in": ["actor:7"]}],
        ],
        num_partitions=2,
    ).take_all()
    assert sorted(r["subj"] for r in out) == ["case:3", "case:4"]


def test_chain_subjects_union_start_and_hop(ray_session):
    """Alternation composes into the chain at both positions."""
    ds = _g3_union_triples()
    # start via UNION dict: closed-2024 cases OR actor:7 cases,
    # then hop to their actors
    out = T.chain_subjects(
        ds,
        {"union": [
            [{"pred": "status", "obj_in": ["closed"]},
             {"pred": "date", "obj_regex": "^2024"}],
            [{"pred": "date", "obj_gt": "2025-01-01"}],
        ]},
        [{"pred": "hasActor"}],
        num_partitions=2,
    ).take_all()
    # case:3 (closed, 2024) -> actor:7; case:2 (date>2025) -> actor:9
    assert sorted(r["subj"] for r in out) == ["actor:7", "actor:9"]


def _reach_fixture():
    """Crafted pred+ graph: chain with branch, a cycle that re-reaches
    a seed, a disconnected component, and a non-matching pred edge."""
    rows = [
        # chain a->b->c, branch b->d
        ("a", "next", "b"), ("b", "next", "c"), ("b", "next", "d"),
        # cycle e->f->e (e is a seed: must appear, re-reached via f)
        ("e", "next", "f"), ("f", "next", "e"),
        # disconnected x->y (never reached: x is not a seed)
        ("x", "next", "y"),
        # wrong predicate must be ignored
        ("a", "other", "x"),
        # seed markers (the pattern seeds on pred='is_seed')
        ("a", "is_seed", "1"), ("e", "is_seed", "1"),
    ]
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows]),
                "pred": pa.array([r[1] for r in rows]),
                "obj": pa.array([r[2] for r in rows]),
            }
        )
    )


def test_reachable_subjects_semantics(ray_session):
    triples_ds = _reach_fixture()
    want = {"b", "c", "d", "f", "e"}  # e re-reached through the cycle
    got = {
        r["subj"]
        for r in T.reachable_subjects(
            triples_ds, [{"pred": "is_seed", "obj_in": ["1"]}], "next",
            num_partitions=2,
        ).take_all()
    }
    assert got == want


def test_reachable_pregel_matches_dataset_path(ray_session):
    triples_ds = _reach_fixture()
    start = [{"pred": "is_seed", "obj_in": ["1"]}]
    a = {
        r["subj"]
        for r in T.reachable_subjects(
            triples_ds, start, "next", num_partitions=2
        ).take_all()
    }
    b = {
        r["subj"]
        for r in T.reachable_subjects_pregel(
            triples_ds, start, "next", num_partitions=3
        ).take_all()
    }
    assert a == b == {"b", "c", "d", "f", "e"}
    # no seeds -> empty closure on both paths
    none_start = [{"pred": "is_seed", "obj_in": ["nope"]}]
    assert T.reachable_subjects(triples_ds, none_start, "next").count() == 0
    assert T.reachable_subjects_pregel(triples_ds, none_start, "next").count() == 0


def test_reachable_star_and_bounded(ray_session):
    """pred* (zero-or-more: seeds included) and pred{1,k} (bounded
    rounds) on both the Dataset and Pregel paths."""
    triples_ds = _reach_fixture()
    start = [{"pred": "is_seed", "obj_in": ["1"]}]
    star = {"a", "e", "b", "c", "d", "f"}
    got_ds = {
        r["subj"]
        for r in T.reachable_subjects(
            triples_ds, start, "next", closure="star", num_partitions=2
        ).take_all()
    }
    got_pg = {
        r["subj"]
        for r in T.reachable_subjects_pregel(
            triples_ds, start, "next", closure="star", num_partitions=2
        ).take_all()
    }
    assert got_ds == got_pg == star
    # bounded pred{1,1}: exactly one hop from the seeds
    one_hop = {
        r["subj"]
        for r in T.reachable_subjects(
            triples_ds, start, "next", max_rounds=1, num_partitions=2
        ).take_all()
    }
    assert one_hop == {"b", "f"}
