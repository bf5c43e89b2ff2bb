"""functions/graph.py: distributed connected components + PageRank.

CC is the scale path for the reference's transitive evidence-chain
survivor rule (remove_duplicate_paragraphs.py:123-128); both operators
are also driver-oracle-checked (queries docs_dup_components /
graph_pagerank).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _cc(pairs: pd.DataFrame, **kw) -> dict[int, int]:
    from knowledge_graph_ray.functions.graph import connected_components

    out = connected_components(rd.from_pandas(pairs), **kw).to_pandas()
    return dict(zip(out["node"], out["comp"]))


def test_cc_chains_triangles_and_singletone_pairs(ray_session):
    pairs = pd.DataFrame(
        {
            "a": [2, 3, 4, 10, 20, 21, 20, 30, 7],
            "b": [1, 2, 3, 11, 21, 22, 22, 31, 100],
        }
    )
    got = _cc(pairs, num_buckets=4)
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
        7: 7, 100: 7,
    }


def test_cc_long_chain_pointer_jumping(ray_session):
    # 60-node path: plain propagation needs ~60 rounds; propagation +
    # pointer jumping must converge well inside max_iters=12
    n = 60
    chain = pd.DataFrame({"a": range(1, n), "b": range(0, n - 1)})
    got = _cc(chain, num_buckets=4, max_iters=12)
    assert set(got.values()) == {0}
    assert len(got) == n


def test_cc_matches_driver_union_find(ray_session):
    from knowledge_graph_ray.functions.dedup import drops_from_pairs
    from knowledge_graph_ray.functions.graph import (
        component_drops,
        connected_components,
    )

    rng = np.random.default_rng(7)
    pairs = pd.DataFrame(
        {
            "a": rng.integers(0, 200, 300),
            "b": rng.integers(0, 200, 300),
        }
    )
    pairs = pairs[pairs["a"] != pairs["b"]]
    ds = rd.from_pandas(pairs)
    expected = drops_from_pairs(ds, strategy="components")
    comps = connected_components(ds, num_buckets=8)
    got = set(component_drops(comps).to_pandas()["node"])
    assert got == expected


def test_pagerank_matches_serial_reference(ray_session):
    from knowledge_graph_ray.functions.graph import pagerank

    edges = pd.DataFrame(
        {"src": [1, 1, 2, 3, 4, 5, 5], "dst": [2, 3, 3, 4, 1, 1, 2]}
    )
    pr = (
        pagerank(rd.from_pandas(edges), iters=5, num_buckets=4)
        .to_pandas()
        .sort_values("node")
    )
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n, d = len(nodes), 0.85
    outdeg = edges.groupby("src").size().to_dict()
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        new = np.full(n, (1 - d) / n)
        for s, t in zip(edges["src"], edges["dst"]):
            new[idx[t]] += d * r[idx[s]] / outdeg[s]
        r = new
    got = dict(zip(pr["node"], pr["pr"]))
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - round(r[idx[v]], 9)) < 2e-9
    # rank mass sanity: total ≤ 1 (dangling mass not redistributed)
    assert 0 < sum(got.values()) <= 1 + 1e-9


def test_transitive_drops_matches_driver_union_find(ray_session):
    from knowledge_graph_ray.functions import dedup

    # chain 1-2, 2-3 plus island 10-11: components semantics must drop
    # {2, 3, 11}, while the per-pair rule would differ on the chain
    pairs = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 2, 10], pa.int64()),
                "b": pa.array([2, 3, 11], pa.int64()),
            }
        )
    )
    expected = dedup.drops_from_pairs(pairs, strategy="components")
    got = {
        r["node"]
        for r in dedup.transitive_drops(pairs, num_buckets=4).take_all()
    }
    assert got == expected == {2, 3, 11}


def _cc_both(tbl, **kw):
    from knowledge_graph_ray.functions.graph import (
        connected_components,
        connected_components_pregel,
    )

    ds = rd.from_arrow(tbl)
    ref = (
        connected_components(ds, num_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    got = (
        connected_components_pregel(rd.from_arrow(tbl), num_buckets=4, **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    return ref, got


def test_pregel_cc_matches_dataset_on_long_chain(ray_session):
    # 60-node path: converges only if pointer-jump request/reply works
    # (plain propagation needs diameter rounds > max_iters tested here)
    n = 60
    tbl = pa.table(
        {
            "a": pa.array(list(range(n - 1)), pa.int64()),
            "b": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    ref, got = _cc_both(tbl)
    assert ref.equals(got)
    assert set(got["comp"]) == {0}


def test_pregel_cc_matches_dataset_on_random_graph(ray_session):
    rng = np.random.default_rng(0)
    aa = rng.integers(0, 200, 300)
    bb = rng.integers(0, 200, 300)
    mask = aa != bb
    tbl = pa.table(
        {"a": pa.array(aa[mask], pa.int64()), "b": pa.array(bb[mask], pa.int64())}
    )
    ref, got = _cc_both(tbl)
    assert ref.equals(got)


def test_pregel_transitive_drops_engine_parity(ray_session):
    from knowledge_graph_ray.functions import dedup

    pairs = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 2, 10], pa.int64()),
                "b": pa.array([2, 3, 11], pa.int64()),
            }
        )
    )
    for engine in ("pregel", "dataset"):
        got = {
            r["node"]
            for r in dedup.transitive_drops(
                pairs, num_buckets=4, engine=engine
            ).take_all()
        }
        assert got == {2, 3, 11}, engine


def test_pregel_pagerank_matches_dataset(ray_session):
    from knowledge_graph_ray.functions.graph import pagerank, pagerank_pregel

    rng = np.random.default_rng(1)
    tbl = pa.table(
        {
            "src": pa.array(rng.integers(0, 60, 200), pa.int64()),
            "dst": pa.array(rng.integers(60, 160, 200), pa.int64()),
        }
    )
    ref = (
        pagerank(rd.from_arrow(tbl), num_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    got = (
        pagerank_pregel(rd.from_arrow(tbl), num_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert (ref["node"].values == got["node"].values).all()
    assert np.allclose(ref["pr"], got["pr"], atol=2e-9)


def test_graph_ops_handle_empty_inputs(ray_session):
    from knowledge_graph_ray.functions.graph import (
        connected_components_pregel,
        pagerank,
        pagerank_pregel,
    )

    no_pairs = rd.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    assert connected_components_pregel(no_pairs, num_buckets=4).count() == 0
    no_edges = rd.from_arrow(
        pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    )
    assert pagerank(no_edges, num_buckets=4).count() == 0
    assert pagerank_pregel(no_edges, num_buckets=4).count() == 0


def test_chain_subjects_three_hops(ray_session):
    # hand-built triple set: a -knows-> b -owns-> c -near-> d, with
    # constraints at the start and at hop targets
    import pyarrow as pa
    import ray.data as rd

    from knowledge_graph_ray.functions.triples import chain_subjects

    rows = [
        ("p:1", "kind", "good"), ("p:2", "kind", "bad"),
        ("p:1", "knows", "q:1"), ("p:2", "knows", "q:2"),
        ("q:1", "level", "high"), ("q:2", "level", "high"),
        ("q:1", "owns", "r:1"), ("q:1", "owns", "r:2"), ("q:2", "owns", "r:3"),
        ("r:1", "color", "red"), ("r:2", "color", "blue"), ("r:3", "color", "red"),
        ("r:1", "near", "s:1"), ("r:2", "near", "s:2"), ("r:3", "near", "s:3"),
    ]
    t = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows]),
        "obj_dtype": pa.array(["string"] * len(rows)),
    })
    ds = rd.from_arrow(t).repartition(3)
    out = chain_subjects(
        ds,
        [{"pred": "kind", "obj_in": ["good"]}],            # p:1 only
        [
            {"pred": "knows", "patterns": [{"pred": "level", "obj_in": ["high"]}]},  # q:1
            {"pred": "owns", "patterns": [{"pred": "color", "obj_in": ["red"]}]},    # r:1 (r:2 is blue)
            {"pred": "near"},                                                         # s:1
        ],
        num_partitions=4,
    )
    assert sorted(r["subj"] for r in out.take_all()) == ["s:1"]
