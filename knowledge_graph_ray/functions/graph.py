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

import ray
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


@ray.remote
class _PregelWorker:
    """Partition-pinned vertex-program worker (the raw-Ray scale path).

    Holds one hash bucket's edges AND label state for the whole run —
    the Dataset-API loop above must re-shuffle the static edge set
    through ``groupby(_bucket)`` every iteration because Ray Data
    cannot exploit prior partitioning; here edges are shuffled ONCE at
    load and each superstep moves only the (node, label) messages, the
    classic Pregel cost model. Messages travel as per-target-bucket
    Arrow tables in the object store; the driver only routes refs."""

    def __init__(self, bucket: int, num_buckets: int):
        self.bucket = bucket
        self.n = num_buckets
        self.adj: pd.DataFrame | None = None  # (src, dst) with src in bucket
        self.labels: pd.Series | None = None  # node → comp, nodes in bucket

    def load(self, *edge_parts: pa.Table) -> int:
        dfs = [t.to_pandas() for t in edge_parts if t.num_rows]
        self.adj = (
            pd.concat(dfs, ignore_index=True)
            if dfs
            else pd.DataFrame({"src": [], "dst": []}, dtype="int64")
        )
        # initial label: min(node, min neighbour) over local edges
        m = self.adj.groupby("src")["dst"].min() if len(self.adj) else pd.Series(
            dtype="int64"
        )
        nodes = m.index.to_numpy(np.int64)
        self.labels = pd.Series(
            np.minimum(nodes, m.to_numpy(np.int64)), index=nodes
        )
        return int(self.labels.sum()) if len(self.labels) else 0

    def step(self, *msg_parts: pa.Table) -> list:
        """One superstep. Incoming rows carry ``kind``: 0 = min-label
        message for a node owned here; 1 = pointer-jump REQUEST
        ("node" is a root owned here, "label" is the asking node).
        Apply mins, answer requests from CURRENT labels (the asking
        node learns comp(comp(v)) — O(log d) chain compression), then
        emit edge propagation + fresh requests.
        Returns [sum_delta, msgs×n]."""
        inc = [t.to_pandas() for t in msg_parts if t is not None and t.num_rows]
        old = self.labels
        old_sum = int(old.sum()) if len(old) else 0
        replies = None
        mins = []
        if inc:
            allm = pd.concat(inc, ignore_index=True)
            req = allm[allm["kind"] == 1]
            if len(req):
                # reply with the root's own current label
                root_lab = old.reindex(req["node"].to_numpy(np.int64))
                ok = root_lab.notna().to_numpy()
                replies = pd.DataFrame(
                    {
                        "node": req["label"].to_numpy(np.int64)[ok],
                        "label": root_lab.to_numpy()[ok].astype(np.int64),
                        "kind": np.int8(0),
                    }
                )
            mm = allm[allm["kind"] == 0]
            if len(mm):
                mins.append(mm.groupby("node")["label"].min())
        if mins:
            m = mins[0][mins[0].index.isin(old.index)]
            self.labels = pd.concat([old, m]).groupby(level=0).min()
        new_sum = int(self.labels.sum()) if len(self.labels) else 0
        out: list = [new_sum - old_sum]
        parts = []
        # propagate: each local edge src→dst carries comp(src)
        if len(self.adj):
            lab = self.labels.reindex(self.adj["src"].to_numpy(np.int64))
            parts.append(
                pd.DataFrame(
                    {
                        "node": self.adj["dst"].to_numpy(np.int64),
                        "label": lab.to_numpy(np.int64),
                        "kind": np.int8(0),
                    }
                )
            )
        # pointer-jump request: every non-root node asks its root
        nonroot = self.labels[self.labels != self.labels.index]
        if len(nonroot):
            parts.append(
                pd.DataFrame(
                    {
                        "node": nonroot.to_numpy(np.int64),
                        "label": nonroot.index.to_numpy(np.int64),
                        "kind": np.int8(1),
                    }
                )
            )
        if replies is not None:
            parts.append(replies)
        msgs = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "label": pd.Series([], dtype="int64"),
                 "kind": pd.Series([], dtype="int8")}
            )
        )
        buckets = hash64_array(msgs["node"].to_numpy(np.int64)) % self.n
        for b in range(self.n):
            part = msgs[buckets == b]
            # combine min-messages per node; requests pass through
            m0 = part[part["kind"] == 0]
            m0 = m0.groupby("node", sort=False, as_index=False)["label"].min()
            m0["kind"] = np.int8(0)
            m1 = part[part["kind"] == 1].drop_duplicates()
            out.append(
                pa.Table.from_pandas(
                    pd.concat([m0, m1], ignore_index=True), preserve_index=False
                )
            )
        return out

    def result(self) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(self.labels.index.to_numpy(np.int64)),
                "comp": pa.array(self.labels.to_numpy(np.int64)),
            }
        )


def connected_components_pregel(
    pairs: Dataset,
    *,
    a: str = "a",
    b: str = "b",
    num_buckets: int = 8,
    max_iters: int = 50,
) -> Dataset:
    """Same (node, comp) result as ``connected_components``, computed
    by partition-pinned actors: the edge set is hash-shuffled ONCE at
    load; each superstep ships only node-proportional min-label
    messages between buckets (object-store refs routed by the driver,
    never fetched to it). This is the documented raw-Ray escape hatch
    for iterative graph state the Dataset API re-shuffles per round.

    Partitioning assumption (100 TB): ``num_buckets`` ≥ cluster cores;
    a bucket holds its share of edges in worker memory — size buckets
    so edges/bucket fit, exactly like any Pregel system."""

    if num_buckets < 2:
        raise ValueError("connected_components_pregel needs num_buckets >= 2")

    empty = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )

    # manual one-time shuffle: each input block → num_buckets sub-tables
    @ray.remote
    def bucketize(block) -> list:
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0 or a not in block.column_names:
            return [empty] * num_buckets
        src = pa.concat_arrays(
            [block.column(a).combine_chunks(), block.column(b).combine_chunks()]
        ).cast(pa.int64())
        dst = pa.concat_arrays(
            [block.column(b).combine_chunks(), block.column(a).combine_chunks()]
        ).cast(pa.int64())
        t = pa.table({"src": src, "dst": dst})
        buckets = hash64_array(src.to_numpy(zero_copy_only=False)) % num_buckets
        return [t.filter(pa.array(buckets == i)) for i in range(num_buckets)]

    parts = [
        bucketize.options(num_returns=num_buckets).remote(ref)
        for ref in pairs.to_arrow_refs()
    ]
    workers = [
        _PregelWorker.remote(i, num_buckets) for i in range(num_buckets)
    ]
    ray.get(
        [w.load.remote(*[row[i] for row in parts]) for i, w in enumerate(workers)]
    )

    # supersteps: first round has no incoming messages, so its delta
    # is trivially 0 — and replies lag requests by one round, so a
    # single zero-delta round is not yet a fixpoint: stop on TWO
    # consecutive zero rounds (state provably cannot change again)
    inbox: list[list] = [[] for _ in range(num_buckets)]
    zero_rounds = 0
    for it in range(max_iters):
        outs = [
            w.step.options(num_returns=num_buckets + 1).remote(*inbox[i])
            for i, w in enumerate(workers)
        ]
        deltas = ray.get([o[0] for o in outs])
        inbox = [
            [outs[s][1 + t] for s in range(num_buckets)]
            for t in range(num_buckets)
        ]
        zero_rounds = zero_rounds + 1 if (it > 0 and sum(deltas) == 0) else 0
        if zero_rounds >= 2:
            break
    import ray.data as rd

    return rd.from_arrow_refs([w.result.remote() for w in workers])


def component_drops(components: Dataset) -> Dataset:
    """Nodes to drop under keep-min-per-component (one column ``node``)."""
    return components.filter(
        expr="node != comp"
    ).select_columns(["node"])


@ray.remote
class _PageRankWorker:
    """Partition-pinned PageRank worker: holds one bucket's out-edges
    (with out-degrees) and the ranks of the nodes hashed here; each
    superstep ships only (dst, contribution) float messages."""

    def __init__(self, bucket: int, num_buckets: int):
        self.bucket = bucket
        self.n = num_buckets
        self.adj: pd.DataFrame | None = None
        self.nodes: np.ndarray | None = None
        self.ranks: pd.Series | None = None

    def load(self, *edge_parts: pa.Table) -> list:
        """Store local edges + out-degrees; emit the dst-node universe
        registrations for other buckets. Returns [n_local_srcs,
        regs×n]."""
        dfs = [t.to_pandas() for t in edge_parts if t.num_rows]
        self.adj = (
            pd.concat(dfs, ignore_index=True)
            if dfs
            else pd.DataFrame({"src": [], "dst": []}, dtype="int64")
        )
        if len(self.adj):
            self.adj["outdeg"] = self.adj.groupby("src")["src"].transform(
                "size"
            ).astype("int64")
        else:
            self.adj["outdeg"] = pd.Series([], dtype="int64")
        srcs = np.unique(self.adj["src"].to_numpy(np.int64))
        self.nodes = srcs
        out: list = [srcs]
        dsts = np.unique(self.adj["dst"].to_numpy(np.int64))
        buckets = hash64_array(dsts) % self.n
        for b in range(self.n):
            out.append(pa.table({"node": pa.array(dsts[buckets == b])}))
        return out

    def register(self, *node_parts: pa.Table) -> int:
        """Union registered dst nodes into the local universe."""
        extra = [
            t.column("node").to_numpy(zero_copy_only=False)
            for t in node_parts
            if t.num_rows
        ]
        mine = hash64_array(np.concatenate(extra)) % self.n if extra else None
        if extra:
            allx = np.concatenate(extra)
            self.nodes = np.unique(np.concatenate([self.nodes, allx[mine == self.bucket]]))
        return int(len(self.nodes))

    def init_ranks(self, n_total: int):
        self.n_total = n_total
        self.ranks = pd.Series(
            np.full(len(self.nodes), 1.0 / n_total), index=self.nodes
        )

    def step(self, damping: float, *contrib_parts: pa.Table) -> list:
        """Apply incoming contribution sums, then emit next-round
        contributions along local edges. Returns [None, msgs×n]."""
        base = (1.0 - damping) / self.n_total
        inc = [t.to_pandas() for t in contrib_parts if t is not None and t.num_rows]
        if inc:
            sums = (
                pd.concat(inc, ignore_index=True).groupby("node")["c"].sum()
            )
            incoming = sums.reindex(self.ranks.index, fill_value=0.0)
        else:
            incoming = pd.Series(0.0, index=self.ranks.index)
        self.ranks = base + damping * incoming
        out: list = [None]
        if len(self.adj):
            lab = self.ranks.reindex(self.adj["src"].to_numpy(np.int64))
            msgs = pd.DataFrame(
                {
                    "node": self.adj["dst"].to_numpy(np.int64),
                    "c": lab.to_numpy(np.float64)
                    / self.adj["outdeg"].to_numpy(np.float64),
                }
            )
        else:
            msgs = pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "c": pd.Series([], dtype="float64")}
            )
        buckets = hash64_array(msgs["node"].to_numpy(np.int64)) % self.n
        for b in range(self.n):
            part = msgs[buckets == b]
            m = part.groupby("node", sort=False, as_index=False)["c"].sum()
            out.append(pa.Table.from_pandas(m, preserve_index=False))
        return out

    def _initial_msgs(self) -> list:
        """Round-0 contributions from the uniform initial ranks."""
        out: list = []
        if len(self.adj):
            r0 = 1.0 / self.n_total
            msgs = pd.DataFrame(
                {
                    "node": self.adj["dst"].to_numpy(np.int64),
                    "c": r0 / self.adj["outdeg"].to_numpy(np.float64),
                }
            )
        else:
            msgs = pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "c": pd.Series([], dtype="float64")}
            )
        buckets = hash64_array(msgs["node"].to_numpy(np.int64)) % self.n
        for b in range(self.n):
            part = msgs[buckets == b]
            m = part.groupby("node", sort=False, as_index=False)["c"].sum()
            out.append(pa.Table.from_pandas(m, preserve_index=False))
        return out

    def result(self) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": pa.array(self.ranks.index.to_numpy(np.int64)),
                "pr": pc.round(
                    pa.array(self.ranks.to_numpy(np.float64)), ndigits=9
                ),
            }
        )


def pagerank_pregel(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    num_buckets: int = 8,
) -> Dataset:
    """Same recurrence (and SQL twin) as ``pagerank``, computed by
    partition-pinned actors: edges + out-degrees shuffled once at
    load, each of the ``iters`` supersteps ships only per-bucket
    (dst, contribution) partial sums. Raw-Ray escape hatch for the
    iterative re-shuffle, exactly like ``connected_components_pregel``."""
    if num_buckets < 2:
        raise ValueError("pagerank_pregel needs num_buckets >= 2")

    empty = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )

    @ray.remote
    def bucketize(block) -> list:
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0 or src not in block.column_names:
            return [empty] * num_buckets
        t = pa.table(
            {
                "src": block.column(src).cast(pa.int64()),
                "dst": block.column(dst).cast(pa.int64()),
            }
        )
        buckets = hash64_array(
            t.column("src").to_numpy(zero_copy_only=False)
        ) % num_buckets
        return [t.filter(pa.array(buckets == i)) for i in range(num_buckets)]

    parts = [
        bucketize.options(num_returns=num_buckets).remote(ref)
        for ref in edges.to_arrow_refs()
    ]
    workers = [
        _PageRankWorker.remote(i, num_buckets) for i in range(num_buckets)
    ]
    loads = [
        w.load.options(num_returns=num_buckets + 1).remote(
            *[row[i] for row in parts]
        )
        for i, w in enumerate(workers)
    ]
    counts = ray.get(
        [
            w.register.remote(*[loads[s][1 + i] for s in range(num_buckets)])
            for i, w in enumerate(workers)
        ]
    )
    n_total = sum(counts)
    if n_total == 0:  # empty graph: empty (node, pr) result
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "pr": pa.array([], pa.float64())})
        )
    ray.get([w.init_ranks.remote(n_total) for w in workers])

    inbox = [None] * num_buckets
    first = True
    for _ in range(iters):
        if first:
            outs0 = [
                w._initial_msgs.options(num_returns=num_buckets).remote()
                for w in workers
            ]
            inbox = [
                [outs0[s][t] for s in range(num_buckets)]
                for t in range(num_buckets)
            ]
            first = False
        outs = [
            w.step.options(num_returns=num_buckets + 1).remote(
                damping, *inbox[i]
            )
            for i, w in enumerate(workers)
        ]
        inbox = [
            [outs[s][1 + t] for s in range(num_buckets)]
            for t in range(num_buckets)
        ]
    import ray.data as rd

    return rd.from_arrow_refs([w.result.remote() for w in workers])


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
    if n_nodes == 0:  # empty graph: empty (node, pr) result
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "pr": pa.array([], pa.float64())})
        )
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


@ray.remote
class _ReachWorker:
    """Partition-pinned reachability worker. Bucket assignment uses
    ONE hash for both roles — a node's reached-state lives where its
    out-edges live (h(node) == h(src)) — so marking a node reached and
    expanding its out-edges is a single local step; messages carry
    only destination node ids, routed by h(dst)."""

    def __init__(self, bucket: int, num_buckets: int):
        self.bucket = bucket
        self.n = num_buckets
        self.edges: pa.Table | None = None
        self.reached: set = set()
        self.seeds_pending: set | None = None

    def load(self, *edge_parts: pa.Table) -> int:
        tables = [t for t in edge_parts if t.num_rows]
        self.edges = (
            pa.concat_tables(tables).combine_chunks()
            if tables
            else pa.table(
                {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
            )
        )
        return self.edges.num_rows

    def seed(self, *seed_parts: pa.Table) -> int:
        vals: set = set()
        for t in seed_parts:
            if t.num_rows:
                vals.update(t.column("node").to_pylist())
        self.seeds_pending = vals
        return len(vals)

    def step(self, *msg_parts) -> list:
        """One superstep: mark incoming nodes reached; the frontier
        (newly reached + round-0 seeds, which expand but are NOT output
        unless re-reached) selects local out-edges; dst ids go out
        bucketed by h(dst). Returns [activity, msgs×n] — activity 0
        means this worker sent nothing, so all-zero activity is the
        global fixpoint (no messages can be in flight)."""
        import pyarrow.compute as pc

        incoming: set = set()
        for t in msg_parts:
            if t is not None and t.num_rows:
                incoming.update(t.column("node").to_pylist())
        new = incoming - self.reached
        self.reached |= new
        frontier = set(new)
        if self.seeds_pending is not None:
            frontier |= self.seeds_pending
            self.seeds_pending = None
        empty = pa.table({"node": pa.array([], pa.string())})
        if not frontier:
            return [0, *([empty] * self.n)]
        mask = pc.is_in(
            self.edges.column("src"),
            value_set=pa.array(sorted(frontier), pa.string()),
        )
        dsts = (
            self.edges.column("dst").filter(mask).to_pandas().drop_duplicates()
        )
        outs = []
        if len(dsts):
            buckets = hash64_array(dsts.to_numpy()) % self.n
            for i in range(self.n):
                outs.append(
                    pa.table(
                        {"node": pa.array(dsts[buckets == i], pa.string())}
                    )
                )
        else:
            outs = [empty] * self.n
        return [len(frontier), *outs]

    def result(self) -> pa.Table:
        return pa.table({"subj": pa.array(sorted(self.reached), pa.string())})


def reachable_pregel(
    edges: Dataset,
    seeds: Dataset,
    *,
    src: str = "subj",
    dst: str = "obj",
    seed_col: str = "subj",
    num_buckets: int = 8,
    max_iters: int = 100,
) -> Dataset:
    """Transitive closure (SPARQL ``pred+``) by partition-pinned
    actors — the scale path for deep closures where the Dataset-API
    BFS (triples.reachable_subjects) re-shuffles the static edge set
    every round. Edges are hash-shuffled ONCE at load; each superstep
    ships only frontier-proportional destination ids (object-store
    refs routed by the driver, never fetched to it). Seeds expand on
    round 0 but appear in the output only if some edge re-reaches
    them (≥1-hop semantics, same as the Dataset path).

    Partitioning assumption (100 TB): ``num_buckets`` ≥ cluster
    cores; one bucket's edge share + reached-set must fit a worker."""
    empty = pa.table(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
    )
    empty_seed = pa.table({"node": pa.array([], pa.string())})

    @ray.remote
    def bucketize(block) -> list:
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0 or src not in block.column_names:
            return [empty] * num_buckets
        t = pa.table(
            {
                "src": block.column(src).combine_chunks().cast(pa.string()),
                "dst": block.column(dst).combine_chunks().cast(pa.string()),
            }
        )
        buckets = hash64_array(t.column("src").to_numpy(zero_copy_only=False)) % num_buckets
        return [t.filter(pa.array(buckets == i)) for i in range(num_buckets)]

    @ray.remote
    def bucketize_seeds(block) -> list:
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0 or seed_col not in block.column_names:
            return [empty_seed] * num_buckets
        col = block.column(seed_col).combine_chunks().cast(pa.string())
        t = pa.table({"node": col})
        buckets = hash64_array(col.to_numpy(zero_copy_only=False)) % num_buckets
        return [t.filter(pa.array(buckets == i)) for i in range(num_buckets)]

    parts = [
        bucketize.options(num_returns=num_buckets).remote(ref)
        for ref in edges.to_arrow_refs()
    ]
    seed_parts = [
        bucketize_seeds.options(num_returns=num_buckets).remote(ref)
        for ref in seeds.to_arrow_refs()
    ]
    if num_buckets == 1:  # num_returns=1 unwraps the list
        parts = [[p] for p in parts]
        seed_parts = [[p] for p in seed_parts]
    workers = [_ReachWorker.remote(i, num_buckets) for i in range(num_buckets)]
    ray.get(
        [w.load.remote(*[row[i] for row in parts]) for i, w in enumerate(workers)]
    )
    ray.get(
        [
            w.seed.remote(*[row[i] for row in seed_parts])
            for i, w in enumerate(workers)
        ]
    )
    inbox: list[list] = [[] for _ in range(num_buckets)]
    for _ in range(max_iters):
        outs = [
            w.step.options(num_returns=num_buckets + 1).remote(*inbox[i])
            for i, w in enumerate(workers)
        ]
        activity = ray.get([o[0] for o in outs])
        inbox = [
            [outs[s][1 + t] for s in range(num_buckets)]
            for t in range(num_buckets)
        ]
        if sum(activity) == 0:
            break
    import ray.data as rd

    return rd.from_arrow_refs([w.result.remote() for w in workers])
