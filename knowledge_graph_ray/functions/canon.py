"""Mention / entity canonicalization (SURVEY.md M12, M13, D4, D5;
north rule: groupby(surface_hash)-aggregate clustering, salted).

Clean-room re-expression of the reference's entity_alias_mapping
notebook semantics:
- M12 name cleanup (cell 13): names containing the marker phrase are
  truncated at the first '(' and stripped.
- M13 rule-based typing (cells 9-10): institution iff it has a group
  short-name or only a first / only a last name; else person.
- D4 fuzzy grouping (cell 20): token_set_ratio >= 85 clusters — the
  reference's greedy first-unclaimed-wins is order-dependent; we use
  a deterministic tie-break (min normalized surface / min entity_id
  becomes the cluster head). Documented divergence (SURVEY.md §7).
- D5 same-name union (cell 29): exact-name groups.

Scale design (the north-rule part): distinct-surface statistics are
computed with a SALTED two-round aggregation —
``groupby((surface_hash, salt))`` partial counts, then
``groupby(surface_hash)`` merge — so a hot surface ("Folketinget"
class) never lands on one reducer. Fuzzy clustering then runs per
BLOCK (normalized-token-set hash) via ``map_groups``, with a bounded
within-block candidate cap.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.hashing import hash64_array

CLEANUP_MARKER = "udpeget af"
_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s/]")

DEFAULT_SALTS = 8
FUZZY_THRESHOLD = 85


# ---------------------------------------------------------------- M12/M13

def clean_name(name: str) -> str:
    """M12: for names containing the marker, truncate at first '(' and
    strip; always collapse whitespace."""
    if CLEANUP_MARKER in name:
        cut = name.find("(")
        if cut != -1:
            name = name[:cut]
    return _WS.sub(" ", name).strip()


def clean_names_batch(batch: pa.Table, col: str = "name") -> pa.Table:
    names = [clean_name(n) if n is not None else None for n in batch.column(col).to_pylist()]
    return batch.set_column(
        batch.schema.get_field_index(col), col, pa.array(names, pa.string())
    )


def rule_entity_type(first: str | None, last: str | None, group: str | None) -> str:
    """M13: institution iff group_short present, or only-first/only-last."""
    if group:
        return "institution"
    if (first and not last) or (last and not first):
        return "institution"
    return "person"


def type_entities_batch(batch: pa.Table) -> pa.Table:
    firsts = batch.column("first_name").to_pylist()
    lasts = batch.column("last_name").to_pylist()
    groups = batch.column("group_short").to_pylist()
    types = [rule_entity_type(f, l, g) for f, l, g in zip(firsts, lasts, groups)]
    out = batch
    name = "entity_type_rule"
    return out.append_column(name, pa.array(types, pa.string()))


# ------------------------------------------------------------- normalize

def normalize_surface(surface: str) -> str:
    """Canonical normalized form used for surface_hash keys: lowercase,
    punctuation stripped (keeping '/'), whitespace collapsed."""
    s = _PUNCT.sub(" ", (surface or "").lower())
    return _WS.sub(" ", s).strip()


def token_set(surface: str) -> frozenset[str]:
    return frozenset(normalize_surface(surface).split())


def token_set_ratio(a: str, b: str) -> int:
    """Deterministic token_set_ratio (fuzzywuzzy-style, D4): compare
    sorted token-set intersection/remainder strings via a simple ratio."""
    ta, tb = token_set(a), token_set(b)
    if not ta and not tb:
        return 100
    inter = " ".join(sorted(ta & tb))
    sa = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sb = (inter + " " + " ".join(sorted(tb - ta))).strip()

    def ratio(x: str, y: str) -> int:
        if not x and not y:
            return 100
        import difflib

        # SequenceMatcher.ratio() is order-sensitive; max over both
        # directions keeps token_set_ratio symmetric (property-tested)
        return round(
            100
            * max(
                difflib.SequenceMatcher(None, x, y).ratio(),
                difflib.SequenceMatcher(None, y, x).ratio(),
            )
        )

    return max(ratio(inter, sa), ratio(inter, sb), ratio(sa, sb))


def block_key(surface: str) -> str:
    """Blocking key for fuzzy clustering: sorted normalized token set —
    candidate pairs must share it exactly (SURVEY.md D4 mapping)."""
    return " ".join(sorted(token_set(surface)))


# ------------------------------------------- salted surface statistics

def add_surface_keys(
    batch: pa.Table, surface_col: str = "surface", n_salts: int = DEFAULT_SALTS
) -> pa.Table:
    """map_batches stage: add (norm, surface_hash, salt). Salt derives
    from a second hash of the row position + surface so hot keys spread
    across reducers deterministically."""
    surfaces = batch.column(surface_col).to_pylist()
    norms = [normalize_surface(s) for s in surfaces]
    h = hash64_array(norms)
    salt = (h >> np.uint64(17)).astype(np.uint64) % np.uint64(n_salts)
    # position-mixed salt: same surface still spreads over salts
    pos = np.arange(len(norms), dtype=np.uint64)
    salt = (salt + pos) % np.uint64(n_salts)
    out = batch.append_column("norm", pa.array(norms, pa.string()))
    out = out.append_column("surface_hash", pa.array(h, pa.uint64()))
    out = out.append_column("salt", pa.array(salt, pa.uint64()))
    return out


def surface_stats(mentions_ds, n_salts: int = DEFAULT_SALTS):
    """Two-round salted distinct-surface aggregation.

    Round 0 (combiner): per-block pandas value-count — shrinks the
    shuffle input to distinct-(norm, salt)-per-block before anything
    moves. Round 1: groupby((norm, salt)) → partial count (a hot
    surface is split across n_salts reducers). Round 2: groupby(norm)
    → total count. Returns a Dataset with (norm, n_mentions).
    """
    import pandas as pd

    keyed = mentions_ds.map_batches(
        lambda b: add_surface_keys(b, n_salts=n_salts), batch_format="pyarrow"
    )

    def block_combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["norm", "salt"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "partial_count"})
        )
        return out

    combined = keyed.map_batches(
        block_combine, batch_format="pandas", batch_size=65536
    )

    # final merge: ONE int-keyed hash-bucket shuffle on norm — never a
    # single-block funnel (open-web corpora have unbounded distinct
    # generic-MISC surfaces; the round-1 repartition(1) was the scale
    # escape flagged in review). A hot surface lands in one bucket,
    # but a bucket reduce is a vectorized pandas groupby over many
    # keys, and the upstream salt+combine already shrank its rows.
    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    return hash_bucket_agg(
        combined,
        ["norm"],
        lambda df: df.groupby("norm", as_index=False, sort=False).agg(
            n_mentions=("partial_count", "sum")
        ),
        num_buckets=32,
    )


# ------------------------------------------------------- fuzzy clusters

def cluster_block(df: pd.DataFrame, threshold: int = FUZZY_THRESHOLD) -> pd.DataFrame:
    """map_groups kernel: one blocking-key group of distinct surfaces →
    (norm, canonical) rows. Deterministic: surfaces sorted, head = the
    lexicographically smallest member of each cluster."""
    norms = sorted(df["norm"].tolist())
    heads: list[str] = []
    assign: dict[str, str] = {}
    for n in norms:
        placed = False
        for h in heads:
            if token_set_ratio(n, h) >= threshold:
                assign[n] = h
                placed = True
                break
        if not placed:
            heads.append(n)
            assign[n] = n
    return pd.DataFrame({"norm": norms, "canonical": [assign[n] for n in norms]})


def canonical_surface_map(
    stats_ds,
    threshold: int = FUZZY_THRESHOLD,
    strategy: str = "bucket",
    min_count: int = 1,
    num_buckets: int = 32,
):
    """Distinct surfaces → canonical surface via blocked fuzzy
    clustering. Returns Dataset (norm, canonical).

    strategy='bucket' (default): hash-bucket shuffle on block_key —
    every candidate block lands whole in one bucket (clustering is
    block-local), each bucket clusters its blocks in one vectorized
    pandas kernel with a singleton short-circuit. Distributed in the
    number of distinct surfaces (no single-block funnel — open-web
    generic-MISC spans are unbounded) without paying Ray's per-group
    map_groups overhead on the mostly-singleton block space.
    strategy='shuffle': groupby(block_key).map_groups — one task per
    block.

    ``min_count`` (requires an ``n_mentions`` column, as produced by
    surface_stats) pre-filters rare surfaces out of clustering — they
    pass through self-canonical instead. Use it to cap unbounded
    one-off generic-MISC spans: only surfaces seen >= min_count times
    are worth canonicalizing, and the cluster kernel then never sees
    the long tail.
    """

    def add_block(batch: pa.Table) -> pa.Table:
        norms = batch.column("norm").to_pylist()
        return batch.append_column(
            "block_key", pa.array([block_key(n) for n in norms], pa.string())
        )

    if min_count > 1:
        rare = stats_ds.filter(expr=f"n_mentions < {min_count}")
        stats_ds = stats_ds.filter(expr=f"n_mentions >= {min_count}")

    blocked = stats_ds.map_batches(add_block, batch_format="pyarrow")
    if strategy == "shuffle":
        out = blocked.groupby("block_key").map_groups(
            lambda df: cluster_block(df, threshold), batch_format="pandas"
        )
    else:

        def cluster_bucket(df: pd.DataFrame) -> pd.DataFrame:
            outs = []
            # singleton blocks (the overwhelming majority) short-circuit
            sizes = df.groupby("block_key")["norm"].transform("size")
            single = df[sizes == 1]
            if len(single):
                outs.append(
                    pd.DataFrame({"norm": single["norm"], "canonical": single["norm"]})
                )
            multi = df[sizes > 1]
            for _, g in multi.groupby("block_key", sort=False):
                outs.append(cluster_block(g, threshold))
            return (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame({"norm": [], "canonical": []}).astype("str")
            )

        from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

        out = hash_bucket_agg(
            blocked, ["block_key"], cluster_bucket, num_buckets=num_buckets
        )
    if min_count > 1:

        def self_canon(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "norm": batch.column("norm"),
                    "canonical": batch.column("norm"),
                }
            )

        out = out.union(rare.map_batches(self_canon, batch_format="pyarrow"))
    return out


# ---------------------------------------------------------------- D5

def assemble_alias_map(entities: pa.Table, threshold: int = FUZZY_THRESHOLD) -> pa.Table:
    """G5 alias-map assembly (entity_alias_mapping.ipynb cell 29):
    union of D4 fuzzy clusters + D5 same-name groups + cleaned names →
    exploded (entity_id, alias) table. Each entity aliases its own
    cleaned name, the names of exact-same-named entities, and the
    names of fuzzy-cluster co-members (institutions)."""
    ids = entities.column("entity_id").to_pylist()
    names = [clean_name(n) for n in entities.column("name").to_pylist()]
    types = entities.column("entity_type").to_pylist()
    aliases: dict[int, set[str]] = {eid: {n} for eid, n in zip(ids, names)}

    # D5: exact same cleaned name
    by_name: dict[str, list[int]] = {}
    for eid, n in zip(ids, names):
        by_name.setdefault(n, []).append(eid)
    for group in by_name.values():
        if len(group) > 1:
            for eid in group:
                aliases[eid].update(names[ids.index(g)] for g in group)

    # D4: fuzzy clusters over institution names, blocked
    inst = [(eid, n) for eid, n, t in zip(ids, names, types) if t == "institution"]
    blocks: dict[str, list[tuple[int, str]]] = {}
    for eid, n in inst:
        blocks.setdefault(block_key(n), []).append((eid, n))
    for members in blocks.values():
        if len(members) < 2:
            continue
        for eid_a, n_a in members:
            for eid_b, n_b in members:
                if eid_a != eid_b and token_set_ratio(n_a, n_b) >= threshold:
                    aliases[eid_a].add(n_b)

    o_id, o_alias = [], []
    for eid in ids:
        for a in sorted(aliases[eid]):
            o_id.append(eid)
            o_alias.append(a)
    return pa.table(
        {"entity_id": pa.array(o_id, pa.int64()), "alias": pa.array(o_alias, pa.string())}
    )


def same_name_groups(entities: pa.Table) -> pa.Table:
    """D5: persons sharing the exact cleaned name → (entity_id,
    same_named_id) edge rows (mutual, excluding self)."""
    ids = entities.column("entity_id").to_pylist()
    names = [clean_name(n) for n in entities.column("name").to_pylist()]
    by_name: dict[str, list[int]] = {}
    for eid, n in zip(ids, names):
        by_name.setdefault(n, []).append(eid)
    a, b = [], []
    for group in by_name.values():
        if len(group) < 2:
            continue
        for x in group:
            for y in group:
                if x != y:
                    a.append(x)
                    b.append(y)
    return pa.table(
        {"entity_id": pa.array(a, pa.int64()), "same_named_id": pa.array(b, pa.int64())}
    )
