"""Distributed graph primitives on Ray Data (beyond the reference).

The reference resolves transitive near-dup evidence with an in-memory
pass over all pairs (remove_duplicate_paragraphs.py:123-128); the
engine's driver-side twin is ``dedup.drops_from_pairs``. Both assume
the pair set fits one process — false for web corpora, where dup
pairs are corpus-proportional. ``connected_components`` is the scale
path: the pair set stays a Dataset end to end and every step is a
hash-bucketed shuffle.

Execution model shared by both operators (the asof_join tag-union
pattern, relational.py): each iteration tags edge rows and label/rank
rows, buckets both by a stable hash of the join key so every key's
rows co-locate, runs ONE vectorized pandas kernel per bucket, then
min-/sum-combines the emitted messages with a second bucketed
shuffle. No global sort, no driver-side collection, state is
node-proportional (never edge-proportional) between iterations.

Partitioning assumptions (documented for 100 TB): a hot node's edges
bound one bucket's work — raise ``num_buckets`` ≥ cluster cores so
buckets stay cache-sized; label state is materialized per iteration
(it is consumed by the convergence check AND the next round — the
"Dataset consumed twice re-executes upstream" rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from knowledge_graph_ray.functions.hashing import hash64_array

# tag-union row layout: key = join key, val = payload, _side = role
_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),
        ("val", pa.int64()),
        ("_side", pa.int8()),
        ("_bucket", pa.int64()),
    ]
)

_EDGE, _LABEL, _JUMP = 0, 1, 2


def _frame(key, val, side: int, num_buckets: int) -> pd.DataFrame:
    df = pd.DataFrame(
        {
            "key": np.asarray(key, dtype=np.int64),
            "val": np.asarray(val, dtype=np.int64),
        }
    )
    df["_side"] = np.int8(side)
    df["_bucket"] = (hash64_array(df["key"].to_numpy()) % num_buckets).astype(
        "int64"
    )
    return df


def connected_components(
    pairs: Dataset,
    *,
    a: str = "a",
    b: str = "b",
    num_buckets: int = 32,
    max_iters: int = 50,
) -> Dataset:
    """(node, comp) per edge endpoint, comp = min node id reachable —
    the evidence-chain survivor semantics, distributed.

    Min-label propagation PLUS pointer jumping (comp(x) ← comp(comp(x))
    each round), so chains converge in O(log diameter) rounds, not
    O(diameter). Convergence is detected from the label-sum invariant:
    labels only ever decrease, so an unchanged sum means a fixpoint —
    one cheap aggregate, no old-vs-new join.
    """

    def sym_edges(df: pd.DataFrame) -> pd.DataFrame:
        fwd = _frame(df[a], df[b], _EDGE, num_buckets)
        rev = _frame(df[b], df[a], _EDGE, num_buckets)
        return pd.concat([fwd, rev], ignore_index=True)

    edges = pairs.map_batches(
        sym_edges, batch_format="pandas", batch_size=None
    ).materialize()

    # initial label: min(node, min neighbour) — the first propagation
    # round for free, computed per bucket (a node's edges co-locate)
    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("key", sort=False)["val"].min().reset_index()
        return _frame(m["key"], np.minimum(m["key"], m["val"]), _LABEL, num_buckets)

    labels = (
        edges.groupby("_bucket")
        .map_groups(init_labels, batch_format="pandas")
        .materialize()
    )
    total = labels.sum("val")

    def bucket_kernel(df: pd.DataFrame) -> pd.DataFrame:
        L = df[df["_side"] == _LABEL][["key", "val"]]
        lab = L.rename(columns={"key": "lnode", "val": "comp"})
        outs = [L]  # a node always keeps its current label
        for side in (_EDGE, _JUMP):
            probe = df[df["_side"] == side]
            if len(probe):
                hit = probe.merge(
                    lab, left_on="key", right_on="lnode", how="inner"
                )
                # edge (src=key, dst=val): dst learns comp(src)
                # jump (comp=key, node=val): node learns comp(comp)
                outs.append(
                    hit[["val", "comp"]].rename(
                        columns={"val": "key", "comp": "val"}
                    )
                )
        msgs = pd.concat(outs, ignore_index=True)
        m = msgs.groupby("key", sort=False)["val"].min().reset_index()
        return _frame(m["key"], m["val"], _LABEL, num_buckets)

    def min_combine(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("key", sort=False)["val"].min().reset_index()
        return _frame(m["key"], m["val"], _LABEL, num_buckets)

    for _ in range(max_iters):
        # jump probes: re-key labels by their comp so the bucket that
        # owns comp can answer comp(comp) for this node
        def jump_probes(df: pd.DataFrame) -> pd.DataFrame:
            return _frame(df["val"], df["key"], _JUMP, num_buckets)

        probes = labels.map_batches(
            jump_probes, batch_format="pandas", batch_size=None
        )
        msgs = (
            edges.union(labels)
            .union(probes)
            .groupby("_bucket")
            .map_groups(bucket_kernel, batch_format="pandas")
        )
        # messages land in foreign buckets — re-min per node
        labels = (
            msgs.groupby("_bucket")
            .map_groups(min_combine, batch_format="pandas")
            .materialize()
        )
        new_total = labels.sum("val")
        if new_total == total:
            break
        total = new_total

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t.column("key"), "comp": t.column("val")}
        )

    return labels.map_batches(finish, batch_format="pyarrow")


def component_drops(components: Dataset) -> Dataset:
    """Nodes to drop under keep-min-per-component (one column ``node``)."""
    return components.filter(
        expr="node != comp"
    ).select_columns(["node"])


def pagerank(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    num_buckets: int = 32,
) -> Dataset:
    """Fixed-iteration simplified PageRank over an int-keyed edge list:
    ``pr_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} pr_k(u)/outdeg(u)``
    (dangling mass not redistributed — documented; the SQL twin mirrors
    the same recurrence in plain float64, and the final round to 9
    decimals is ~6 orders of magnitude above cross-engine
    summation-order noise). Returns (node, pr).

    Same bucketed tag-union execution as connected_components, but
    message payloads are float64 — NO intermediate quantization, so
    per-bucket partial sums differ from a serial sum only by float
    associativity. Rank state between iterations is node-proportional.
    """

    def _f(key, val, side: int, deg=None) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "key": np.asarray(key, dtype=np.int64),
                "val": np.asarray(val, dtype=np.float64),
            }
        )
        df["_deg"] = np.asarray(
            deg if deg is not None else np.zeros(len(df)), dtype=np.int64
        )
        df["_side"] = np.int8(side)
        df["_bucket"] = (
            hash64_array(df["key"].to_numpy()) % num_buckets
        ).astype("int64")
        return df

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return _f(df[src], df[dst].astype("float64"), _EDGE)

    e0 = edges.map_batches(edge_rows, batch_format="pandas", batch_size=None)

    # out-degree folded onto edge rows per bucket (a src's edges
    # co-locate); node universe emitted from the same pass
    def with_outdeg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_deg"] = df.groupby("key")["key"].transform("size").astype("int64")
        return df

    e = (
        e0.groupby("_bucket")
        .map_groups(with_outdeg, batch_format="pandas")
        .materialize()
    )

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.unique(
            np.concatenate(
                [df["key"].to_numpy(np.int64), df["val"].to_numpy(np.int64)]
            )
        )
        return _f(nodes, np.zeros(len(nodes)), _JUMP)

    def distinct_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["key"])

    nodes = (
        e.map_batches(node_rows, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(distinct_nodes, batch_format="pandas")
        .materialize()
    )
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["val"] = 1.0 / n_nodes
        out["_side"] = np.int8(_LABEL)
        return out

    ranks = nodes.map_batches(
        init_rank, batch_format="pandas", batch_size=None
    ).materialize()

    def contrib_kernel(df: pd.DataFrame) -> pd.DataFrame:
        E = df[df["_side"] == _EDGE]
        R = df[df["_side"] == _LABEL][["key", "val"]].rename(
            columns={"key": "rnode", "val": "rank"}
        )
        if not len(E):
            return _f([], [], _LABEL)
        hit = E.merge(R, left_on="key", right_on="rnode", how="inner")
        out = pd.DataFrame(
            {
                "key": hit["val"].to_numpy(np.int64),
                "c": hit["rank"].to_numpy(np.float64)
                / hit["_deg"].to_numpy(np.float64),
            }
        )
        m = out.groupby("key", sort=False)["c"].sum().reset_index()
        return _f(m["key"], m["c"], _LABEL)

    def apply_rank(df: pd.DataFrame) -> pd.DataFrame:
        sums = df[df["_side"] == _LABEL].groupby("key", sort=False)["val"].sum()
        here = df[df["_side"] == _JUMP]["key"].to_numpy(np.int64)
        incoming = sums.reindex(here, fill_value=0.0).to_numpy(np.float64)
        return _f(here, base + damping * incoming, _LABEL)

    for _ in range(iters):
        msgs = (
            e.union(ranks)
            .groupby("_bucket")
            .map_groups(contrib_kernel, batch_format="pandas")
        )
        ranks = (
            msgs.union(nodes)
            .groupby("_bucket")
            .map_groups(apply_rank, batch_format="pandas")
            .materialize()
        )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": t.column("key"),
                "pr": pc.round(t.column("val"), ndigits=9),
            }
        )

    return ranks.map_batches(finish, batch_format="pyarrow")
