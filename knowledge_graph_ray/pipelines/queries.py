"""Driver-facing query registry: one entry per implemented operator
family (SURVEY.md §2), each over the driver tables in ``sf_dir`` (or
the deterministic synthetic pages corpus), most with an exact DuckDB
oracle twin (driver protocol, __ray_entry__.py).

Column-name + value parity rules (driver hashes values under sorted
column names):
- every aggregate/computed column is explicitly aliased identically
  in Ray code and SQL;
- double aggregates are rounded (ROUND(x, 3) / round(x, 3)) on both
  sides so float summation order can't flip the hash;
- triple literals render exactly like CAST(x AS VARCHAR).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from knowledge_graph_ray.functions import dedup, textstats
from knowledge_graph_ray.functions import triples as T
from knowledge_graph_ray.pipelines import relational as R
from knowledge_graph_ray.stages import knn


def _read(sf_dir: str, table: str, blocks: int = 32) -> Dataset:
    """Read one driver table; split single-file inputs into multiple
    blocks so downstream map stages parallelize (Ray clamps to the
    file's row-group structure)."""
    return rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), override_num_blocks=blocks
    )


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.001


def pages_count_for(sf_dir: str) -> int:
    return max(100, int(sf_of(sf_dir) * 20000))


# ----------------------------------------------------------------- helpers

def partial_grouped(
    ds: Dataset,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str | None = None,
    tree: bool = True,
) -> Dataset:
    """Pre-aggregate inside map_batches (combiner), then merge partials
    (SURVEY.md §4: push aggregation partial).

    Merge strategies:
    - ``tree=True`` (default): tree aggregation — repartition the
      already-combined partials down (k → 4 → 1 blocks) re-combining at
      each level. An order of magnitude cheaper than the groupby
      barrier when the RESULT cardinality is modest (≤ a few million
      rows); the final level is one block, so this is wrong for
      billion-group results.
    - ``tree=False``: Ray-native sort-based ``groupby().aggregate`` —
      fully scalable in result cardinality; higher constant cost.
    """

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        agg = {alias: (col, "sum") for col, alias in sum_cols.items()}
        if count_alias:
            agg[count_alias] = (keys[0], "size")
        return df.groupby(keys, as_index=False, sort=False).agg(**agg)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = list(sum_cols.values()) + ([count_alias] if count_alias else [])
        agg = {c: (c, "sum") for c in cols}
        return df.groupby(keys, as_index=False, sort=False).agg(**agg)

    # batch_size=None → whole blocks: one pandas groupby per block, not
    # per 1024-row slice (the combiner must see big batches to shrink)
    partials = ds.map_batches(combine, batch_format="pandas", batch_size=None)
    if tree:
        for p in (4, 1):
            partials = partials.repartition(p).map_batches(
                merge, batch_format="pandas", batch_size=None
            )
        return partials
    aggs = [Sum(alias, alias_name=alias) for alias in sum_cols.values()]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)


def int_cols(ds: Dataset, cols: list[str], scale: float = 1.0) -> Dataset:
    """Integerize double aggregates: round(x * scale) as int64. Float
    sums accumulate ~1e-6 error at 1e9 magnitudes; a 3-decimal round
    can land on a grid boundary and flip the driver's value hash — an
    integer cast at unit (or scaled) precision cannot."""

    def fix(df: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            df[c] = (df[c].astype(float) * scale).round(0).astype("int64")
        return df

    return ds.map_batches(fix, batch_format="pandas", batch_size=None)


# ================================================================ queries

# --- A: aggregations -----------------------------------------------------

def q_agg_pricing_summary(sf_dir: str) -> Dataset:
    """TPC-H Q1 shape (SURVEY.md A1/A4): partial combine → final merge."""
    li = _read(sf_dir, "lineitem")

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df[
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "disc_price", "l_discount"]
        ]

    agg = partial_grouped(
        li.map_batches(widen, batch_format="pandas", batch_size=None),
        ["l_returnflag", "l_linestatus"],
        {
            "l_quantity": "sum_qty",
            "l_extendedprice": "sum_base_price",
            "disc_price": "sum_disc_price",
            "l_discount": "sum_disc",
        },
        count_alias="count_order",
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_disc_bp"] = (
            (df["sum_disc"] / df["count_order"]) * 10000
        ).round(0).astype("int64")
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            df[c] = df[c].round(0).astype("int64")
        return df.drop(columns=["sum_disc"])

    return agg.map_batches(finalize, batch_format="pandas")


SQL_AGG_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(l_quantity), 0) AS BIGINT)          AS sum_qty,
       CAST(ROUND(SUM(l_extendedprice), 0) AS BIGINT)     AS sum_base_price,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS BIGINT)
                                                          AS sum_disc_price,
       CAST(ROUND(AVG(l_discount) * 10000, 0) AS BIGINT)  AS avg_disc_bp,
       COUNT(*)                                           AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(sf_dir: str) -> Dataset:
    """3-way join (J3 broadcast FK enrichment) + aggregate."""
    import pyarrow.parquet as pq

    orders = _read(sf_dir, "orders")
    # dim tables: column-pruned single read, broadcast once (never shuffled)
    cust_tbl = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nat_tbl = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    enriched = R.broadcast_join(
        orders, cust_tbl, key="o_custkey", small_key="c_custkey", cols=["c_nationkey"]
    )
    named = R.broadcast_join(
        enriched, nat_tbl, key="c_nationkey", small_key="n_nationkey", cols=["n_name"]
    )
    agg = partial_grouped(
        named,
        ["n_name"],
        {"o_totalprice": "revenue"},
        count_alias="n_orders",
    )
    return int_cols(agg, ["revenue"])


SQL_REVENUE_BY_NATION = """
SELECT n_name, CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS revenue, COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_building_orders(sf_dir: str) -> Dataset:
    """Broadcast semi-join (J1) + aggregate by priority."""
    orders = _read(sf_dir, "orders")
    customer = _read(sf_dir, "customer")
    keys = [
        r["c_custkey"]
        for r in customer.filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
        .take_all()
    ]
    filtered = R.semi_filter(orders, keys, col="o_custkey")
    agg = partial_grouped(
        filtered,
        ["o_orderpriority"],
        {"o_totalprice": "total"},
        count_alias="n_orders",
    )
    return int_cols(agg, ["total"])


SQL_BUILDING_ORDERS = """
SELECT o_orderpriority, CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS total, COUNT(*) AS n_orders
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderpriority
"""


def q_topk_customers(sf_dir: str) -> Dataset:
    """Global sort + limit (K1 global top-k shape)."""
    return (
        _read(sf_dir, "customer")
        .select_columns(["c_custkey", "c_name", "c_acctbal"])
        .sort(["c_acctbal", "c_custkey"], descending=[True, False])
        .limit(10)
    )


SQL_TOPK_CUSTOMERS = """
SELECT c_custkey, c_name, c_acctbal FROM customer
ORDER BY c_acctbal DESC, c_custkey LIMIT 10
"""


def q_distinct_event_types(sf_dir: str) -> Dataset:
    """Distinct (A5)."""
    return (
        _read(sf_dir, "events")
        .groupby("event_type")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["event_type"])
    )


SQL_DISTINCT_EVENT_TYPES = "SELECT DISTINCT event_type FROM events"


def q_daily_user_activity(sf_dir: str) -> Dataset:
    """Windowed-by-day aggregate over the events stream table."""
    events = _read(sf_dir, "events")

    def day(df: pd.DataFrame) -> pd.DataFrame:
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        return df[["user_id", "day", "value"]]

    agg = partial_grouped(
        events.map_batches(day, batch_format="pandas", batch_size=None),
        ["user_id", "day"],
        {"value": "total_value_milli"},
        count_alias="n_events",
    )
    return int_cols(agg, ["total_value_milli"], scale=1000.0)


SQL_DAILY_USER_ACTIVITY = """
SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
       CAST(ROUND(SUM(value) * 1000, 0) AS BIGINT) AS total_value_milli,
       COUNT(*) AS n_events
FROM events GROUP BY user_id, day
"""


# --- B: triple emission (G1/G2/G3) --------------------------------------

def q_customer_node_triples(sf_dir: str) -> Dataset:
    return _read(sf_dir, "customer").map_batches(
        lambda b: T.node_triples(b, id_col="c_custkey", node_type="customer"),
        batch_format="pyarrow",
        batch_size=None,
    )


SQL_CUSTOMER_NODE_TRIPLES = """
SELECT 'customer:' || c_custkey AS subj, 'rdf:type' AS pred,
       'customer' AS obj, 'resource' AS obj_dtype FROM customer
UNION ALL SELECT 'customer:' || c_custkey, 'c_name', c_name, 'string' FROM customer
UNION ALL SELECT 'customer:' || c_custkey, 'c_nationkey',
       CAST(c_nationkey AS VARCHAR), 'integer' FROM customer
UNION ALL SELECT 'customer:' || c_custkey, 'c_acctbal',
       CAST(c_acctbal AS VARCHAR), 'double' FROM customer
UNION ALL SELECT 'customer:' || c_custkey, 'c_mktsegment', c_mktsegment,
       'string' FROM customer
"""


def q_order_edge_triples(sf_dir: str) -> Dataset:
    roles = {
        "1-URGENT": "urgent order",
        "2-HIGH": "high order",
        "3-MEDIUM": "medium order",
        "4-NOT SPECIFIED": "unspecified order",
        "5-LOW": "low order",
    }
    return _read(sf_dir, "orders").map_batches(
        lambda b: T.edge_triples(
            b,
            src_col="o_custkey",
            dst_col="o_orderkey",
            src_type="customer",
            dst_type="order",
            fwd_pred="hasOrder",
            inv_pred="isOrderOf",
            role_col="o_orderpriority",
            role_map=roles,
        ),
        batch_format="pyarrow",
    )


SQL_ORDER_EDGE_TRIPLES = """
SELECT 'customer:' || o_custkey AS subj, 'hasOrder' AS pred,
       'order:' || o_orderkey AS obj, 'resource' AS obj_dtype FROM orders
UNION ALL SELECT 'order:' || o_orderkey, 'isOrderOf', 'customer:' || o_custkey,
       'resource' FROM orders
UNION ALL SELECT 'customer:' || o_custkey,
       CASE o_orderpriority
            WHEN '1-URGENT' THEN 'urgent_order'
            WHEN '2-HIGH' THEN 'high_order'
            WHEN '3-MEDIUM' THEN 'medium_order'
            WHEN '4-NOT SPECIFIED' THEN 'unspecified_order'
            WHEN '5-LOW' THEN 'low_order' END,
       'order:' || o_orderkey, 'resource' FROM orders
"""


def q_subjects_1995_filled(sf_dir: str) -> Dataset:
    """G3 conjunctive pattern query over the order node-triple table."""
    triples_ds = _read(sf_dir, "orders").map_batches(
        lambda b: T.node_triples(b, id_col="o_orderkey", node_type="order"),
        batch_format="pyarrow",
    )
    return T.subjects_matching(
        triples_ds,
        [
            {"pred": "o_orderdate", "obj_between": ("1995-01-01", "1995-12-32")},
            {"pred": "o_orderstatus", "obj_in": ["F"]},
        ],
        num_partitions=8,
    )


SQL_SUBJECTS_1995_FILLED = """
SELECT DISTINCT 'order:' || o_orderkey AS subj FROM orders
WHERE CAST(o_orderdate AS VARCHAR) BETWEEN '1995-01-01' AND '1995-12-32'
  AND o_orderstatus = 'F'
"""


# --- C: documents (dedup + text analysis) --------------------------------

def q_graph_2hop(sf_dir: str) -> Dataset:
    """G3 two-hop traversal ENTIRELY over triple tables: customer
    nodes matching (pred=c_mktsegment, obj=BUILDING) → hasOrder edges
    → distinct order URIs. SPARQL chain as filter + semi-join chain."""
    cust_triples = q_customer_node_triples(sf_dir)
    seeds = {
        r["subj"]
        for r in T.filter_pred_obj(
            cust_triples, pred="c_mktsegment", obj_in=["BUILDING"]
        )
        .select_columns(["subj"])
        .take_all()
    }
    edges = q_order_edge_triples(sf_dir).filter(expr="pred == 'hasOrder'")
    hits = R.semi_filter(edges, seeds, col="subj").select_columns(["obj"])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"order_uri": batch.column("obj")})

    slim = hits.map_batches(rename, batch_format="pyarrow", batch_size=None)
    # tree distinct (order URIs are unique per edge here, but keep the
    # operator shape honest)
    out = slim.map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas", batch_size=None
    )
    for pnum in (4, 1):
        out = out.repartition(pnum).map_batches(
            lambda df: df.drop_duplicates(), batch_format="pandas", batch_size=None
        )
    return out


SQL_GRAPH_2HOP = """
SELECT DISTINCT 'order:' || o_orderkey AS order_uri
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
"""


def q_docs_exact_dedup(sf_dir: str) -> Dataset:
    return dedup.exact_dedup(_read(sf_dir, "documents"))


SQL_DOCS_EXACT_DEDUP = """
SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM documents GROUP BY text
"""


def q_docs_token_counts(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return ds.map_batches(textstats.token_count_batch, batch_format="pyarrow", batch_size=None).select_columns(
        ["doc_id", "n_tokens_ws"]
    )


SQL_DOCS_TOKEN_COUNTS = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens_ws
FROM documents
"""


def q_docs_quality(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return ds.map_batches(textstats.quality_batch, batch_format="pyarrow", batch_size=None).select_columns(
        ["doc_id", "n_words", "n_unique_words"]
    )


SQL_DOCS_QUALITY = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) END
           AS n_unique_words
FROM documents
"""


def q_docs_lang_counts(sf_dir: str) -> Dataset:
    return (
        _read(sf_dir, "documents")
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
    )


SQL_DOCS_LANG_COUNTS = "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang"


# --- D: similarity search ------------------------------------------------

def _query_vectors(sf_dir: str, n: int = 10):
    tbl = (
        _read(sf_dir, "embeddings")
        .filter(expr=f"vec_id < {n}")
        .select_columns(["vec_id", "embedding"])
        .take_all()
    )
    tbl.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in tbl]
    vecs = np.asarray([r["embedding"] for r in tbl], dtype=np.float64)
    return ids, vecs


def q_knn_bruteforce(sf_dir: str) -> Dataset:
    ids, vecs = _query_vectors(sf_dir)
    return knn.knn_topk(_read(sf_dir, "embeddings"), ids, vecs, k=5)


SQL_KNN_BRUTEFORCE = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 6) AS score
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


# --- E: non-SQL-expressible (rows-only driver check) ---------------------

def q_kg_flagship(sf_dir: str) -> Dataset:
    """Full pipeline over the deterministic synthetic pages corpus
    scaled by sf (no external data; FIXTURES.md §1)."""
    from knowledge_graph_ray.pipelines.kg import build_kg
    from knowledge_graph_ray.sources import synth

    n = pages_count_for(sf_dir)
    pages = synth.pages_dataset(n)
    return build_kg(
        pages,
        synth.entities_table(),
        synth.aliases_table(),
        locations=synth.CITIES,
        concurrency=(1, 2),
        batch_size=128,
    )


def q_docs_minhash_pairs(sf_dir: str) -> Dataset:
    return dedup.minhash_lsh_pairs(_read(sf_dir, "documents"), threshold=0.5)


def q_docs_simhash_pairs(sf_dir: str) -> Dataset:
    return dedup.simhash_pairs(_read(sf_dir, "documents"), max_hamming=6)


def q_docs_ngram_jaccard_pairs(sf_dir: str) -> Dataset:
    return dedup.ngram_jaccard_pairs(_read(sf_dir, "documents"), threshold=0.6)


def q_embedding_dup_pairs(sf_dir: str) -> Dataset:
    return dedup.embedding_cosine_pairs(_read(sf_dir, "embeddings"), threshold=0.95)


def q_docs_langid(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return ds.map_batches(textstats.langid_batch, batch_format="pyarrow", batch_size=None).select_columns(
        ["doc_id", "lang_pred"]
    )


def _langid_oracle_sql() -> str:
    """SQL twin of textstats.detect_language, generated from the SAME
    marker lexicon (cannot drift): marker-token counts per language,
    winner = max count, ties broken alphabetically, none → 'und'."""
    from knowledge_graph_ray.functions.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)  # alphabetical = python tie-break order
    counts = []
    for lang in langs:
        lst = ", ".join(f"'{w}'" for w in sorted(LANG_MARKERS[lang]))
        counts.append(
            f"len(list_filter(toks, x -> list_contains([{lst}], x))) AS c_{lang}"
        )
    greatest = "greatest(" + ", ".join(f"c_{l}" for l in langs) + ")"
    case = []
    for i, lang in enumerate(langs):
        conds = " AND ".join(
            f"c_{lang} >= c_{other}" for other in langs[i + 1 :]
        )
        case.append(f"WHEN {conds or 'TRUE'} THEN '{lang}'")
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')
             AS toks
  FROM documents
), s AS (
  SELECT doc_id, {", ".join(counts)} FROM t
)
SELECT doc_id,
       CASE WHEN {greatest} = 0 THEN 'und'
            ELSE (CASE {" ".join(case)} END)
       END AS lang_pred
FROM s
"""


def q_docs_fingerprint(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return ds.map_batches(textstats.fingerprint_batch, batch_format="pyarrow", batch_size=None).select_columns(
        ["doc_id", "fingerprint64"]
    )


def q_knn_lsh(sf_dir: str) -> Dataset:
    ids, vecs = _query_vectors(sf_dir)
    return knn.knn_lsh(_read(sf_dir, "embeddings"), ids, vecs, k=5)


def q_knn_ivf(sf_dir: str) -> Dataset:
    ids, vecs = _query_vectors(sf_dir)
    return knn.knn_ivf(_read(sf_dir, "embeddings"), ids, vecs, k=5)


def q_mention_canonicalization(sf_dir: str) -> Dataset:
    """Salted canonicalization over synthetic page mentions (north-rule
    op as a standalone query; deterministic, rows-only check)."""
    from knowledge_graph_ray.functions.canon import canonical_surface_map, surface_stats
    from knowledge_graph_ray.pipelines.kg import (
        broadcast_entity_side,
        extract_and_segment,
        mention_stage,
    )
    from knowledge_graph_ray.sources import synth

    n = min(pages_count_for(sf_dir), 400)
    pages = synth.pages_dataset(n)
    refs = broadcast_entity_side(
        synth.entities_table(), synth.aliases_table(), synth.CITIES
    )
    paras = extract_and_segment(pages)
    mentions = mention_stage(paras, refs, concurrency=(1, 2), batch_size=128)
    stats = surface_stats(mentions)
    return canonical_surface_map(stats)


# --- F: sampling / global stats / new operator families ------------------

def q_docs_sample_md5(sf_dir: str) -> Dataset:
    """K3 deterministic sampling: keep rows whose md5(id) hex is below
    a threshold prefix (≈10%) — seed-free, engine/SQL-portable."""
    import hashlib

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "lang"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        mask = [
            hashlib.md5(str(i).encode()).hexdigest() < "1a" for i in ids
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


SQL_DOCS_SAMPLE_MD5 = """
SELECT doc_id, lang FROM documents
WHERE md5(CAST(doc_id AS VARCHAR)) < '1a'
"""


def q_events_value_stats(sf_dir: str) -> Dataset:
    """A4 global stats: count / min / max (raw doubles, no arithmetic)
    + integerized mean."""
    events = _read(sf_dir, "events").select_columns(["value"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_events": [len(df)],
                "sum_value": [df["value"].sum()],
                "min_value": [df["value"].min()],
                "max_value": [df["value"].max()],
            }
        )

    partials = events.map_batches(combine, batch_format="pandas", batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_events": [int(df["n_events"].sum())],
                "sum_value": [df["sum_value"].sum()],
                "min_value": [df["min_value"].min()],
                "max_value": [df["max_value"].max()],
            }
        )

    merged = partials.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_value_milli"] = (
            (df["sum_value"] / df["n_events"]) * 1000
        ).round(0).astype("int64")
        return df.drop(columns=["sum_value"])

    return merged.map_batches(finalize, batch_format="pandas", batch_size=None)


SQL_EVENTS_VALUE_STATS = """
SELECT COUNT(*) AS n_events, MIN(value) AS min_value, MAX(value) AS max_value,
       CAST(ROUND(AVG(value) * 1000, 0) AS BIGINT) AS avg_value_milli
FROM events
"""


def q_events_sessions(sf_dir: str) -> Dataset:
    """Gap-based sessionization (windowed aggregate; 30-min gap)."""
    from knowledge_graph_ray.functions.sessions import sessionize

    return sessionize(_read(sf_dir, "events"), gap_minutes=30)


SQL_EVENTS_SESSIONS = """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
marked AS (
  SELECT *, SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM ordered
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(ROUND(SUM(value) * 1000, 0) AS BIGINT) AS total_value_milli
FROM marked GROUP BY user_id, session_idx
"""


def q_search_ranked_contexts(sf_dir: str) -> pa.Table:
    """§3.3 serving pipeline as a batch job (rows-only)."""
    from knowledge_graph_ray.pipelines.corpus import build_corpus
    from knowledge_graph_ray.pipelines.search import search
    from knowledge_graph_ray.sources import synth

    pages = synth.pages_dataset(min(pages_count_for(sf_dir), 200))
    paras = build_corpus(
        pages, near_dup=False, normalize=False, concurrency=(1, 2), batch_size=256
    )
    queries = [
        (1, "who leads Orga 0"),
        (2, "Pera1 Sonsen1 works for which organisation"),
        (3, "where is Orga 2 located"),
    ]
    return search(queries, paras, k_ann=20, k_rerank=10, k_final=8)


def q_qa_pairs_extract(sf_dir: str) -> Dataset:
    """M8 Q/A extraction over a deterministic QA-formatted fixture."""
    from knowledge_graph_ray.functions.qa import qa_pairs_batch

    docs = pa.table(
        {
            "doc_id": pa.array(range(50), pa.int64()),
            "text": pa.array(
                [
                    f"Spørgsmål 1: Hvad er sag {i}? Svar 1: Det er sag {i}. "
                    f"Spørgsmål 2: Hvem leder Orga {i % 7}? Svar 2: Pera{i % 5} Sonsen{i % 5}."
                    for i in range(50)
                ]
            ),
        }
    )
    return rd.from_arrow(docs).map_batches(qa_pairs_batch, batch_format="pyarrow")


def q_alias_map_assembly(sf_dir: str) -> pa.Table:
    """G5 alias-map assembly over the synthetic entity table."""
    from knowledge_graph_ray.functions.canon import assemble_alias_map
    from knowledge_graph_ray.sources import synth

    return assemble_alias_map(synth.entities_table())


def q_corpus_paragraphs(sf_dir: str) -> Dataset:
    """§3.1 corpus build (extract → segment → dedup → near-dup → embed)."""
    from knowledge_graph_ray.pipelines.corpus import build_corpus
    from knowledge_graph_ray.sources import synth

    pages = synth.pages_dataset(min(pages_count_for(sf_dir), 300))
    out = build_corpus(pages, normalize=False, concurrency=(1, 2), batch_size=256)
    return out.drop_columns(["embedding"])


def q_udf_rephrase(sf_dir: str) -> Dataset:
    """§2.9 LLM-shaped stage: retrying quarantining UDF actor pool."""
    from knowledge_graph_ray.stages.udf import RetryingUDFActor

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return ds.map_batches(
        RetryingUDFActor,
        fn_constructor_kwargs={"out_col": "rephrased"},
        concurrency=(1, 2),
        batch_format="pyarrow",
    )


def q_media_features(sf_dir: str) -> Dataset:
    """Multimodal actor stages over the synthetic media table."""
    from knowledge_graph_ray.stages import multimodal as mm

    ds = rd.from_arrow(mm.synth_media_table(48))
    feats, _ = mm.media_pipeline(ds, concurrency=(1, 2), batch_size=8)
    return feats.drop_columns(["payload", "embedding"])


def q_semantic_paragraphs(sf_dir: str) -> Dataset:
    """M5 embedding-minima segmentation (actor pool)."""
    from knowledge_graph_ray.stages.segment_semantic import SemanticSegmentActor
    from knowledge_graph_ray.sources import synth

    pages = synth.pages_dataset(min(pages_count_for(sf_dir), 200))
    docs = pages.drop_columns(["html", "warc_ts", "lang"])
    return docs.map_batches(
        SemanticSegmentActor, concurrency=(1, 2), batch_format="pyarrow"
    )


QUERIES = {
    "agg_pricing_summary": q_agg_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "building_orders": q_building_orders,
    "topk_customers": q_topk_customers,
    "distinct_event_types": q_distinct_event_types,
    "daily_user_activity": q_daily_user_activity,
    "customer_node_triples": q_customer_node_triples,
    "order_edge_triples": q_order_edge_triples,
    "subjects_1995_filled": q_subjects_1995_filled,
    "graph_2hop": q_graph_2hop,
    "docs_exact_dedup": q_docs_exact_dedup,
    "docs_token_counts": q_docs_token_counts,
    "docs_quality": q_docs_quality,
    "docs_lang_counts": q_docs_lang_counts,
    "knn_bruteforce": q_knn_bruteforce,
    # rows-only (non-SQL-expressible)
    "kg_flagship": q_kg_flagship,
    "docs_minhash_pairs": q_docs_minhash_pairs,
    "docs_simhash_pairs": q_docs_simhash_pairs,
    "docs_ngram_jaccard_pairs": q_docs_ngram_jaccard_pairs,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "docs_langid": q_docs_langid,
    "docs_fingerprint": q_docs_fingerprint,
    "knn_lsh": q_knn_lsh,
    "knn_ivf": q_knn_ivf,
    "mention_canonicalization": q_mention_canonicalization,
    "docs_sample_md5": q_docs_sample_md5,
    "events_value_stats": q_events_value_stats,
    "events_sessions": q_events_sessions,
    "search_ranked_contexts": q_search_ranked_contexts,
    "qa_pairs_extract": q_qa_pairs_extract,
    "alias_map_assembly": q_alias_map_assembly,
    "corpus_paragraphs": q_corpus_paragraphs,
    "udf_rephrase": q_udf_rephrase,
    "media_features": q_media_features,
    "semantic_paragraphs": q_semantic_paragraphs,
}

ORACLE_SQL = {
    "agg_pricing_summary": SQL_AGG_PRICING,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "building_orders": SQL_BUILDING_ORDERS,
    "topk_customers": SQL_TOPK_CUSTOMERS,
    "distinct_event_types": SQL_DISTINCT_EVENT_TYPES,
    "daily_user_activity": SQL_DAILY_USER_ACTIVITY,
    "customer_node_triples": SQL_CUSTOMER_NODE_TRIPLES,
    "order_edge_triples": SQL_ORDER_EDGE_TRIPLES,
    "subjects_1995_filled": SQL_SUBJECTS_1995_FILLED,
    "graph_2hop": SQL_GRAPH_2HOP,
    "docs_exact_dedup": SQL_DOCS_EXACT_DEDUP,
    "docs_token_counts": SQL_DOCS_TOKEN_COUNTS,
    "docs_quality": SQL_DOCS_QUALITY,
    "docs_lang_counts": SQL_DOCS_LANG_COUNTS,
    "knn_bruteforce": SQL_KNN_BRUTEFORCE,
    "docs_sample_md5": SQL_DOCS_SAMPLE_MD5,
    "events_value_stats": SQL_EVENTS_VALUE_STATS,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "docs_langid": _langid_oracle_sql(),
}
