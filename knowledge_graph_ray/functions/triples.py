"""Table-driven triple emission + graph query layer (SURVEY.md G1-G3,
S11; reference rdf_graph.ipynb cells 10-48).

G1 node unpivot: one source row → 1 type-triple + one attribute
triple per non-null attribute. G2 edge emission: one link row →
forward edge + inverse edge (+ role-named predicate via a broadcast
role dim, spaces underscore-encoded — cells 14,17,21).

The "graph" is a flat (subj, pred, obj) Dataset sorted/partitioned by
subj; SPARQL-style queries (G3) are filter + semi-join chains over it.
Literal rendering matches SQL CAST(... AS VARCHAR) semantics so every
emission op has an exact DuckDB oracle:
- timestamps → 'YYYY-MM-DD HH:MM:SS'
- floats → shortest round-trip (Python repr == DuckDB varchar cast)
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

from ray.data import Dataset


def render_literal(value) -> str | None:
    if value is None:
        return None
    if isinstance(value, _dt.datetime):
        return value.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(value, _dt.date):
        return value.strftime("%Y-%m-%d")
    if isinstance(value, float):
        return repr(value)
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def literal_dtype(value) -> str:
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, _dt.datetime):
        return "dateTime"
    if isinstance(value, _dt.date):
        return "date"
    if isinstance(value, float):
        return "double"
    if isinstance(value, int):
        return "integer"
    return "string"


def _render_column(col: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, str]:
    """Vectorized ``render_literal`` for a whole column: Arrow kernels
    per type, with the SAME literal text as the scalar path (the
    oracle-parity contract — timestamps '%Y-%m-%d %H:%M:%S', dates
    '%Y-%m-%d', ints exact, bools true/false). Floats keep a Python
    repr() map — Python shortest-round-trip repr equals DuckDB's
    varchar cast, and Arrow's float→string formatting does not."""
    import pyarrow.compute as pc

    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, "string"
    if pa.types.is_boolean(t):
        out = pc.if_else(col, "true", "false")
        return out, "boolean"
    if pa.types.is_integer(t):
        return pc.cast(col, pa.string()), "integer"
    if pa.types.is_timestamp(t):
        # cast to second resolution first: Arrow's %S prints fractional
        # seconds, the scalar path (strftime on datetime) truncates
        secs = pc.cast(col, pa.timestamp("s"), safe=False)
        return pc.strftime(secs, format="%Y-%m-%d %H:%M:%S"), "dateTime"
    if pa.types.is_date(t):
        return pc.strftime(col, format="%Y-%m-%d"), "date"
    if pa.types.is_floating(t):
        vals = col.to_pylist()
        return pa.array(
            [None if v is None else repr(float(v)) for v in vals], pa.string()
        ), "double"
    vals = col.to_pylist()
    return pa.array(
        [None if v is None else render_literal(v) for v in vals], pa.string()
    ), ("string" if not len(vals) or vals[0] is None else literal_dtype(
        next(v for v in vals if v is not None)
    ))


def _uri_column(node_type: str, ids: pa.ChunkedArray | pa.Array) -> pa.Array:
    """'{node_type}:{id}' for a whole column (Arrow concat kernel)."""
    import pyarrow.compute as pc

    as_str = ids if pa.types.is_string(ids.type) else pc.cast(ids, pa.string())
    return pc.binary_join_element_wise(
        pa.scalar(node_type), as_str, ":"
    )


def node_triples(
    batch: pa.Table,
    *,
    id_col: str,
    node_type: str,
    attrs: list[str] | None = None,
) -> pa.Table:
    """G1 unpivot kernel: rows → triples, fully vectorized (one Arrow
    kernel chain per attribute column — no Python row loop; triple
    consumers downstream are order-insensitive). attrs defaults to
    every column except the id."""
    import pyarrow.compute as pc

    cols = attrs if attrs is not None else [c for c in batch.column_names if c != id_col]
    n = batch.num_rows
    subj = _uri_column(node_type, batch.column(id_col))
    parts = [
        pa.table(
            {
                "subj": subj,
                "pred": pa.array(["rdf:type"] * n, pa.string()),
                "obj": pa.array([node_type] * n, pa.string()),
                "obj_dtype": pa.array(["resource"] * n, pa.string()),
            }
        )
    ]
    for c in cols:
        col = batch.column(c)
        rendered, dtype = _render_column(col)
        part = pa.table(
            {
                "subj": subj,
                "pred": pa.array([c] * n, pa.string()),
                "obj": rendered,
                "obj_dtype": pa.array([dtype] * n, pa.string()),
            }
        )
        if col.null_count:  # a null attr emits no triple
            part = part.filter(pc.is_valid(col))
        parts.append(part)
    return pa.concat_tables(parts).combine_chunks()


def encode_role(role: str) -> str:
    """Role label → predicate name (spaces → underscores; cells 14/17/21)."""
    return role.strip().replace(" ", "_")


def edge_triples(
    batch: pa.Table,
    *,
    src_col: str,
    dst_col: str,
    src_type: str,
    dst_type: str,
    fwd_pred: str,
    inv_pred: str,
    role_col: str | None = None,
    role_map: dict | None = None,
) -> pa.Table:
    """G2 kernel: one link row → forward + inverse (+ role) triples.
    role_map is the broadcast role dim (role_id → role label).
    Vectorized: Arrow concat kernels build the URI columns once; the
    role predicate is a pandas map over the broadcast dim (triple
    consumers downstream are order-insensitive)."""
    import pyarrow.compute as pc

    n = batch.num_rows
    subj_col = _uri_column(src_type, batch.column(src_col))
    obj_col = _uri_column(dst_type, batch.column(dst_col))
    res = pa.array(["resource"] * n, pa.string())
    parts = [
        pa.table(
            {
                "subj": subj_col,
                "pred": pa.array([fwd_pred] * n, pa.string()),
                "obj": obj_col,
                "obj_dtype": res,
            }
        ),
        pa.table(
            {
                "subj": obj_col,
                "pred": pa.array([inv_pred] * n, pa.string()),
                "obj": subj_col,
                "obj_dtype": res,
            }
        ),
    ]
    if role_col is not None and role_map:
        import pandas as pd

        roles = batch.column(role_col).to_pandas()
        mapped = roles.map({k: encode_role(v) for k, v in role_map.items()})
        pred = pa.array(mapped.astype("object").where(mapped.notna(), None), pa.string())
        part = pa.table(
            {"subj": subj_col, "pred": pred, "obj": obj_col, "obj_dtype": res}
        )
        if pred.null_count:
            part = part.filter(pc.is_valid(pred))
        parts.append(part)
    return pa.concat_tables(parts).combine_chunks()


# --------------------------------------------------------------- G3

def filter_pred_obj(
    triples: Dataset,
    *,
    pred: str,
    obj_in: list[str] | None = None,
    obj_between: tuple[str, str] | None = None,
    obj_gt: str | None = None,
    obj_lt: str | None = None,
    obj_regex: str | None = None,
) -> Dataset:
    """One SPARQL-style triple pattern → matching rows. Beyond the
    equality/IN/range shapes, FILTER expressions (rdf_graph.ipynb
    cells 43-47 family) compose conjunctively on the object value:
    strict ``obj_gt``/``obj_lt`` string comparisons and ``obj_regex``
    (Arrow's RE2 — the same engine as DuckDB's regexp_matches, so SQL
    twins can share the literal pattern string)."""
    import pyarrow.compute as pc

    ds = triples.filter(expr=f"pred == '{pred}'")
    preds = []
    if obj_in is not None:
        vset = pa.array(sorted(set(obj_in)), pa.string())
        preds.append(lambda c: pc.is_in(c, value_set=vset))
    if obj_between is not None:
        lo, hi = obj_between
        preds.append(
            lambda c: pc.and_(pc.greater_equal(c, lo), pc.less_equal(c, hi))
        )
    if obj_gt is not None:
        preds.append(lambda c: pc.greater(c, obj_gt))
    if obj_lt is not None:
        preds.append(lambda c: pc.less(c, obj_lt))
    if obj_regex is not None:
        preds.append(lambda c: pc.match_substring_regex(c, obj_regex))
    if preds:

        def apply(b: pa.Table) -> pa.Table:
            col = b.column("obj")
            mask = preds[0](col)
            for p in preds[1:]:
                mask = pc.and_(mask, p(col))
            return b.filter(mask)

        ds = ds.map_batches(apply, batch_format="pyarrow")
    return ds


def subjects_matching(
    triples: Dataset,
    patterns: list[dict],
    *,
    num_partitions: int = 8,
) -> Dataset:
    """Conjunctive SPARQL-style query (rdf_graph.ipynb cell 47 shape):
    distinct subjects satisfying EVERY pattern. Implemented as
    tag-union-count: each pattern's matches are tagged with their
    pattern index, the union is aggregated ONCE on subj counting
    distinct pattern tags — a single all-to-all instead of a join per
    pattern."""
    import pandas as pd

    n = len(patterns)
    assert n >= 1, "need at least one pattern"
    tagged = []
    for i, pat in enumerate(patterns):
        matches = filter_pred_obj(triples, **pat).select_columns(["subj"])
        tagged.append(
            matches.map_batches(
                lambda b, tag=i: b.append_column(
                    "_pat", pa.array([tag] * b.num_rows, pa.int32())
                ),
                batch_format="pyarrow",
            )
        )
    union = tagged[0].union(*tagged[1:]) if n > 1 else tagged[0]

    # bucketed conjunction: per-batch combiner, then ONE hash shuffle
    # on subj — every subject's (subj, _pat) rows land whole in a
    # bucket, where a vectorized nunique==n filter runs. (Match sets
    # are corpus-proportional on big graphs; a repartition(1) funnel
    # here would be a single-block scale escape.)
    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    slim = union.map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas", batch_size=None
    )

    def conj(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        counts = df.groupby("subj")["_pat"].nunique().reset_index(name="_n")
        return counts[counts["_n"] == n][["subj"]]

    return hash_bucket_agg(slim, ["subj"], conj, num_buckets=num_partitions)


def subjects_union(
    triples: Dataset,
    branches: list[list[dict]],
    *,
    num_partitions: int = 8,
) -> Dataset:
    """SPARQL UNION (rdf_graph.ipynb cells 43-47: SPARQLBurger
    alternation blocks): distinct subjects satisfying ANY branch,
    where each branch is a conjunctive pattern list in
    ``subjects_matching`` form (FILTER expressions ride on the
    patterns via ``filter_pred_obj``'s obj_* kwargs).

    Execution: single-pattern branches are plain pattern filters
    (no shuffle of their own); multi-pattern branches run the
    tag-union-count conjunction; all branch outputs union into ONE
    bucketed distinct. The triple table is consumed once per branch
    pattern — callers with an expensive upstream should materialize
    it first (``chain_subjects`` already does)."""
    assert branches, "need at least one UNION branch"
    parts = []
    for br in branches:
        if len(br) == 1:
            parts.append(filter_pred_obj(triples, **br[0]).select_columns(["subj"]))
        else:
            parts.append(subjects_matching(triples, br, num_partitions=num_partitions))
    union = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    slim = union.map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas", batch_size=None
    )
    return hash_bucket_agg(
        slim, ["subj"], lambda df: df.drop_duplicates(), num_buckets=num_partitions
    )


def chain_subjects(
    triples: Dataset,
    start: list[dict] | dict,
    hops: list[dict],
    *,
    num_partitions: int = 8,
) -> Dataset:
    """n-hop conjunctive pattern chain — the generalized
    rdf_graph.ipynb cell 36-48 shape (SPARQLBurger-built queries with
    patterns referencing prior bindings): ?v0 satisfies every ``start``
    pattern; each hop ``{'pred': P, 'patterns': [...]}``
    walks (?v_{i-1}, P, ?v_i) edges and keeps the ?v_i bindings that
    satisfy the hop's own conjunctive patterns. Returns the DISTINCT
    bindings of the final variable (one column ``subj``).

    Alternation (SPARQL UNION) composes at either position:
    ``start={'union': [branch, ...]}`` seeds from subjects matching
    ANY branch, and a hop may carry ``'union': [branch, ...]`` instead
    of (or alongside) ``'patterns'`` — the hop's bindings then must
    satisfy at least one branch (each branch a conjunctive pattern
    list, FILTER expressions via filter_pred_obj's obj_* kwargs).

    Execution (partitioning assumption documented): each hop is one
    size-guarded semi-join of the pred-filtered edge table against the
    current binding set plus one bucketed distinct — bindings stay a
    Dataset end to end, nothing corpus-proportional crosses the
    driver, and a third (or tenth) hop is just another loop turn."""
    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg, semi_join

    # the triple table is consumed once per pattern and once per hop —
    # pin it or every consumer re-executes the whole emission pipeline
    # (object-store-backed, spillable; a no-op if already materialized)
    triples = triples.materialize()
    if isinstance(start, dict):
        cur = subjects_union(
            triples, start["union"], num_partitions=num_partitions
        )
    elif start:
        cur = subjects_matching(triples, start, num_partitions=num_partitions)
    else:
        cur = None
    for hop in hops:
        edges = triples.filter(expr=f"pred == '{hop['pred']}'")
        if cur is not None:
            edges = semi_join(edges, cur, on="subj", num_partitions=num_partitions)
        bound = edges.map_batches(
            lambda b: pa.table({"subj": b.column("obj")}), batch_format="pyarrow"
        ).map_batches(
            lambda df: df.drop_duplicates(), batch_format="pandas", batch_size=None
        )
        cur = hash_bucket_agg(
            bound,
            ["subj"],
            lambda df: df.drop_duplicates(),
            num_buckets=num_partitions,
        )
        pats = hop.get("patterns") or []
        if len(pats) == 1:
            # single pattern needs no conjunction shuffle: the pattern
            # matches feed the (dedup-internal) semi-join key side raw
            ok = filter_pred_obj(triples, **pats[0]).select_columns(["subj"])
            cur = semi_join(cur, ok, on="subj", num_partitions=num_partitions)
        elif pats:
            ok = subjects_matching(triples, pats, num_partitions=num_partitions)
            cur = semi_join(cur, ok, on="subj", num_partitions=num_partitions)
        if hop.get("union"):
            ok = subjects_union(triples, hop["union"], num_partitions=num_partitions)
            cur = semi_join(cur, ok, on="subj", num_partitions=num_partitions)
    if cur is None:
        raise ValueError("chain needs start patterns or at least one hop")
    return cur


def reachable_subjects(
    triples: Dataset,
    start: list[dict] | dict,
    pred: str,
    *,
    max_rounds: int = 64,
    num_partitions: int = 8,
    closure: str = "plus",
) -> Dataset:
    """SPARQL ``pred+`` property path (transitive closure): the
    DISTINCT nodes reachable from the seed set via ONE OR MORE
    ``pred`` edges — the iterative fixpoint ``chain_subjects`` cannot
    express because the hop count is not known up front (rdf_graph
    .ipynb-family property paths; DuckDB twin = WITH RECURSIVE).

    ``start`` is a conjunctive pattern list (or ``{'union': ...}``)
    in ``subjects_matching`` form; seeds themselves appear in the
    output only if some edge re-reaches them (≥1-hop semantics).
    ``closure='star'`` gives ``pred*`` (zero-or-more: the seed set is
    unioned into the result); a finite ``max_rounds`` under
    ``'plus'``/``'star'`` is the bounded path ``pred{1,k}`` /
    ``pred{0,k}`` (BFS rounds == path length).

    Execution: frontier BFS over the pred-filtered edge table. Each
    round is one size-guarded semi-join (edges vs the NEW frontier),
    a bucketed distinct, and one anti semi-join dropping
    already-reached bindings, so per-round work is proportional to
    the frontier, not the closure. Binding sets are materialized per
    round (object-store-backed, spillable — never collected to the
    driver). The static edge table is pinned once but re-shuffled by
    the per-round semi-join — the same Dataset-API limitation noted
    for iterative ops in functions/graph.py; for closures expected to
    run >~20 rounds at corpus scale, the partition-pinned Pregel
    actors there (edges shuffled once) are the faster substrate."""
    import pandas as pd  # noqa: F401  (pandas batch format below)

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg, semi_join

    triples = triples.materialize()

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({"subj": batch.column("subj"), "obj": batch.column("obj")})

    edges = (
        triples.filter(expr=f"pred == '{pred}'")
        .map_batches(slim, batch_format="pyarrow")
        .materialize()
    )
    if closure not in ("plus", "star"):
        raise ValueError(f"closure must be 'plus' or 'star', got {closure!r}")
    if isinstance(start, dict):
        frontier = subjects_union(
            triples, start["union"], num_partitions=num_partitions
        )
    else:
        frontier = subjects_matching(triples, start, num_partitions=num_partitions)
    frontier = frontier.materialize()
    seeds = frontier
    reached: Dataset | None = None
    for _ in range(max_rounds):
        hop = semi_join(edges, frontier, on="subj", num_partitions=num_partitions)
        bound = hop.map_batches(
            lambda b: pa.table({"subj": b.column("obj")}), batch_format="pyarrow"
        ).map_batches(
            lambda df: df.drop_duplicates(), batch_format="pandas", batch_size=None
        )
        bound = hash_bucket_agg(
            bound,
            ["subj"],
            lambda df: df.drop_duplicates(),
            num_buckets=num_partitions,
        )
        if reached is not None:
            bound = semi_join(
                bound, reached, on="subj", anti=True, num_partitions=num_partitions
            )
        new = bound.materialize()
        if new.count() == 0:
            break
        reached = new if reached is None else reached.union(new).materialize()
        frontier = new
    if closure == "star":
        # pred*: seeds are reachable via zero hops — union + distinct
        reached = seeds if reached is None else reached.union(seeds)
        return hash_bucket_agg(
            reached,
            ["subj"],
            lambda df: df.drop_duplicates(),
            num_buckets=num_partitions,
        )
    if reached is None:
        import ray.data as rd

        return rd.from_arrow(pa.table({"subj": pa.array([], pa.string())}))
    return reached


def reachable_subjects_pregel(
    triples: Dataset,
    start: list[dict] | dict,
    pred: str,
    *,
    max_rounds: int = 100,
    num_partitions: int = 8,
    closure: str = "plus",
) -> Dataset:
    """Same result as ``reachable_subjects``, computed by the
    partition-pinned Pregel actors (functions.graph.reachable_pregel):
    edges shuffled ONCE, supersteps ship only frontier ids — the scale
    path for deep closures (the Dataset BFS pays a static-edge
    re-shuffle per round). For BOUNDED paths note the superstep
    accounting differs: round 0 here only expands the seeds, so k hops
    take ``max_rounds = k + 1`` (the Dataset path's round == hop); at
    the default bounds both reach the full fixpoint and agree."""
    from knowledge_graph_ray.functions.graph import reachable_pregel

    triples = triples.materialize()

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({"subj": batch.column("subj"), "obj": batch.column("obj")})

    edges = triples.filter(expr=f"pred == '{pred}'").map_batches(
        slim, batch_format="pyarrow"
    )
    if closure not in ("plus", "star"):
        raise ValueError(f"closure must be 'plus' or 'star', got {closure!r}")
    if isinstance(start, dict):
        seeds = subjects_union(triples, start["union"], num_partitions=num_partitions)
    else:
        seeds = subjects_matching(triples, start, num_partitions=num_partitions)
    seeds = seeds.materialize()  # consumed by pregel AND the star union
    out = reachable_pregel(
        edges, seeds, num_buckets=num_partitions, max_iters=max_rounds
    )
    if closure == "star":
        from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

        return hash_bucket_agg(
            out.union(seeds),
            ["subj"],
            lambda df: df.drop_duplicates(),
            num_buckets=num_partitions,
        )
    return out


def optional_hop(
    triples: Dataset,
    bindings: Dataset,
    pred: str,
    *,
    out_col: str = "opt_obj",
    num_partitions: int | None = None,
) -> Dataset:
    """OPTIONAL pattern (SPARQL left-join semantics; the one standard
    rdf_graph.ipynb-family shape ``chain_subjects`` doesn't cover):
    every row of ``bindings`` (one column ``subj``) survives — rows
    gain one output row per (subj, pred, ?x) edge, with ``out_col``
    null when the subject has no such edge.

    Execution: the pred-filtered edge table and the binding set meet
    in one distributed hash join (left-outer); neither side crosses
    the driver. Partition count derives from known input bytes
    (relational.auto_partitions) unless given."""
    from knowledge_graph_ray.pipelines.relational import hash_join

    edges = triples.filter(expr=f"pred == '{pred}'")

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"subj": batch.column("subj"), out_col: batch.column("obj")}
        )

    edges = edges.map_batches(slim, batch_format="pyarrow")
    return hash_join(
        bindings,
        edges,
        on="subj",
        how="left_outer",
        num_partitions=num_partitions,
    )


# --------------------------------------------------------------- S11

def write_turtle(triples: Dataset, out_dir: str, base: str = "http://kg.local/") -> int:
    """S11 sink: stream the triple Dataset to partitioned .ttl shards
    (one file per task — never one giant file; resumable layout).
    Returns the number of lines written."""
    import os

    from knowledge_graph_ray.functions.hashing import stable_digest

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        lines = to_turtle_batch(batch, base).column("line").to_pylist()
        if not lines:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_lines": pa.array([], pa.int64())})
        body = "\n".join(lines) + "\n"
        name = f"part-{stable_digest(body):016x}.ttl"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(body)
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path]), "n_lines": pa.array([len(lines)], pa.int64())}
        )

    manifest = triples.map_batches(write_shard, batch_format="pyarrow").take_all()
    return int(sum(r["n_lines"] for r in manifest))


def to_turtle_batch(batch: pa.Table, base: str = "http://kg.local/") -> pa.Table:
    """Formatting map: triple rows → one turtle line per row."""
    subs = batch.column("subj").to_pylist()
    preds = batch.column("pred").to_pylist()
    objs = batch.column("obj").to_pylist()
    dtypes = (
        batch.column("obj_dtype").to_pylist()
        if "obj_dtype" in batch.column_names
        else ["string"] * len(subs)
    )

    def uri(x: str) -> str:
        return f"<{base}{x.replace(':', '/')}>"

    lines = []
    for s, p, o, d in zip(subs, preds, objs, dtypes):
        if d == "resource":
            obj_repr = uri(o)
        else:
            escaped = o.replace("\\", "\\\\").replace('"', '\\"')
            obj_repr = f'"{escaped}"'
            if d != "string":
                obj_repr += f"^^<http://www.w3.org/2001/XMLSchema#{d}>"
        lines.append(f"{uri(s)} <{base}{p}> {obj_repr} .")
    return pa.table({"line": pa.array(lines, pa.string())})
