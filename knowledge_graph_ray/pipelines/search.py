"""Batch search/serving pipeline (SURVEY.md §3.3):

question → embed → ANN top-k over paragraph embeddings (K1/T7)
        → cross-encoder rerank, top-10 per query (T6/K2)
        → context-window expansion around each hit (K5)
        → first-seen dedup, top-8 (D3)

Two shapes over the same semantics:

- ``search`` — the low-latency serving path: the corpus side streams
  (ANN scan is ``knn_topk``'s per-batch partial top-k); everything
  AFTER candidate generation is collected to the driver (bounded by
  queries × k rows — the reference's interactive path run as a batch
  job over a small query list).
- ``search_distributed`` — the scale path for large query batches:
  candidate volume NEVER lands on the driver. Candidate fetch is a
  hash join on ``para_key``, rerank is the same actor pool over the
  joined Dataset, per-query select/dedup is one bucketed pandas
  kernel keyed on ``query_id``, and context expansion joins the kept
  hits back to their docs' paragraphs on ``doc_id`` and windows each
  (query, rank) group in a second bucketed kernel. The only
  driver-side state is the query list itself, which the ANN scan
  broadcasts anyway. Results are row-identical to ``search``
  (pinned by tests/test_qa_search_misc.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from knowledge_graph_ray.functions.segment import count_tokens
from knowledge_graph_ray.pipelines.corpus import add_para_key
from knowledge_graph_ray.stages.embed import HashEmbedder
from knowledge_graph_ray.stages.knn import knn_topk
from knowledge_graph_ray.stages.rerank import RerankActor


def _window(
    doc_paras: pd.DataFrame, hit_idx: int, budget: int = 120
) -> str:
    """K5: expand around the hit paragraph by token budget, 30% before
    / 70% after (reranker_function.py:26-79 semantics)."""
    doc_paras = doc_paras.sort_values("para_idx").reset_index(drop=True)
    pos = int(doc_paras.index[doc_paras["para_idx"] == hit_idx][0])
    before_budget = int(budget * 0.3)
    after_budget = budget - before_budget
    out = [doc_paras.loc[pos, "text"]]
    used_b = 0
    i = pos - 1
    while i >= 0:
        t = count_tokens(doc_paras.loc[i, "text"])
        if used_b + t > before_budget:
            break
        out.insert(0, doc_paras.loc[i, "text"])
        used_b += t
        i -= 1
    used_a = 0
    i = pos + 1
    while i < len(doc_paras):
        t = count_tokens(doc_paras.loc[i, "text"])
        if used_a + t > after_budget:
            break
        out.append(doc_paras.loc[i, "text"])
        used_a += t
        i += 1
    return " ".join(out)


def search(
    queries: list[tuple[int, str]],
    paragraphs: Dataset,
    *,
    k_ann: int = 100,
    k_rerank: int = 10,
    k_final: int = 8,
    context_tokens: int = 120,
    dim: int = 64,
    concurrency: int | tuple = (1, 2),
) -> pa.Table:
    """queries [(query_id, text)] × paragraph Dataset (doc_id,
    para_idx, text, embedding) → ranked context table
    (query_id, rank, doc_id, para_idx, rerank_score, context)."""
    embedder = HashEmbedder(dim)
    qids = [q for q, _ in queries]
    qtexts = {q: t for q, t in queries}
    qvecs = embedder.encode([t for _, t in queries])

    # pin once: paras is consumed THREE times below (ANN scan,
    # candidate fetch, doc fetch) — without materialize() the whole
    # upstream (extract → segment → dedup → embed actor pool) would
    # re-execute per consumer (CLAUDE.md gotcha). Plasma-backed,
    # spillable; at real scale checkpoint to parquet instead.
    paras = paragraphs.map_batches(add_para_key, batch_format="pyarrow").materialize()
    # K1/T7: streaming ANN — corpus never collected
    cands = knn_topk(
        paras, qids, qvecs, k=k_ann, vec_col="embedding", id_col="para_key",
        exclude_self=False,
    ).take_all()
    cand_keys = {r["neighbor_id"] for r in cands}

    # fetch candidate rows + their docs' paragraphs (small side)
    import ray

    keys_ref = ray.put(pa.array(sorted(cand_keys), pa.int64()))

    def keep_cands(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch.column("para_key"), value_set=ray.get(keys_ref))
        return batch.filter(mask)

    cand_rows = paras.map_batches(keep_cands, batch_format="pyarrow").take_all()
    by_key = {r["para_key"]: r for r in cand_rows}
    hit_docs = {r["doc_id"] for r in cand_rows}
    docs_ref = ray.put(pa.array(sorted(hit_docs), pa.int64()))

    def keep_docs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch.column("doc_id"), value_set=ray.get(docs_ref))
        return batch.filter(mask)

    doc_paras = pd.DataFrame(
        [
            {k: r[k] for k in ("doc_id", "para_idx", "text")}
            for r in paras.map_batches(keep_docs, batch_format="pyarrow").take_all()
        ]
    )

    # T6: rerank candidates (small Dataset → actor pool)
    pairs = pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in cands], pa.int64()),
            "para_key": pa.array([r["neighbor_id"] for r in cands], pa.int64()),
            "query": pa.array(
                [qtexts[r["query_id"]] for r in cands], pa.string()
            ),
            "text": pa.array(
                [by_key[r["neighbor_id"]]["text"] for r in cands], pa.string()
            ),
        }
    )
    import ray.data as rd

    scored = (
        rd.from_arrow(pairs)
        .map_batches(
            RerankActor,
            fn_constructor_kwargs={"dim": dim},
            concurrency=concurrency,
            batch_format="pyarrow",
        )
        .take_all()
    )

    # K2 + D3: per-query sort desc → dedup by text → top-k, then K5
    out_rows = []
    df = pd.DataFrame(scored)
    for qid, g in df.groupby("query_id"):
        g = g.sort_values(
            ["rerank_score", "para_key"], ascending=[False, True]
        ).head(k_rerank)
        seen: set[str] = set()
        rank = 0
        for _, row in g.iterrows():
            hit = by_key[row["para_key"]]
            if hit["text"] in seen:  # D3 first-seen wins
                continue
            seen.add(hit["text"])
            rank += 1
            if rank > k_final:
                break
            ctx = _window(
                doc_paras[doc_paras["doc_id"] == hit["doc_id"]],
                hit["para_idx"],
                budget=context_tokens,
            )
            out_rows.append(
                {
                    "query_id": int(qid),
                    "rank": rank,
                    "doc_id": hit["doc_id"],
                    "para_idx": hit["para_idx"],
                    "rerank_score": float(row["rerank_score"]),
                    "context": ctx,
                }
            )
    return pa.Table.from_pylist(out_rows) if out_rows else pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "para_idx": pa.array([], pa.int32()),
            "rerank_score": pa.array([], pa.float64()),
            "context": pa.array([], pa.string()),
        }
    )


def search_distributed(
    queries: list[tuple[int, str]],
    paragraphs: Dataset,
    *,
    k_ann: int = 100,
    k_rerank: int = 10,
    k_final: int = 8,
    context_tokens: int = 120,
    dim: int = 64,
    concurrency: int | tuple = (1, 2),
    num_buckets: int = 32,
) -> Dataset:
    """Scale twin of ``search`` (same knobs, same rows, Dataset out):
    no stage collects candidate- or corpus-proportional data on the
    driver — see the module docstring for the shuffle plan."""
    import ray
    import ray.data as rd  # noqa: F401  (kept for symmetry with search)

    from knowledge_graph_ray.pipelines.relational import (
        hash_bucket_agg,
        hash_join,
        pin_schema,
    )
    from knowledge_graph_ray.stages.knn import knn_topk

    embedder = HashEmbedder(dim)
    qids = [q for q, _ in queries]
    qvecs = embedder.encode([t for _, t in queries])
    qtext_ref = ray.put({q: t for q, t in queries})

    # consumed twice (ANN scan + the two joins) — pin once, same
    # rationale as `search`; at real scale checkpoint to parquet
    paras = paragraphs.map_batches(add_para_key, batch_format="pyarrow").materialize()
    slim = paras.select_columns(["para_key", "doc_id", "para_idx", "text"])

    cands = knn_topk(
        paras, qids, qvecs, k=k_ann, vec_col="embedding", id_col="para_key",
        exclude_self=False,
    ).select_columns(["query_id", "neighbor_id"])

    # candidate fetch: large-large hash join (embedding column pruned
    # above so vectors never ride the shuffle)
    cand_rows = hash_join(cands, slim, on="neighbor_id", right_on="para_key")

    def add_query_text(batch: pa.Table) -> pa.Table:
        qtexts = ray.get(qtext_ref)
        qs = [qtexts[q] for q in batch.column("query_id").to_pylist()]
        return batch.append_column("query", pa.array(qs, pa.string()))

    scored = cand_rows.map_batches(
        add_query_text, batch_format="pyarrow"
    ).map_batches(
        RerankActor,
        fn_constructor_kwargs={"dim": dim},
        concurrency=concurrency,
        batch_format="pyarrow",
    )

    # K2 + D3: per-query sort → first-seen text dedup → top-k_final,
    # one vectorized kernel per query bucket (each query lives whole
    # in one bucket; hot buckets need one dominant query — bounded by
    # k_ann rows per query, so skew is capped by construction)
    def select(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in df.groupby("query_id"):
            # neighbor_id == para_key (the join key) — same tiebreak
            # as `search`'s (score desc, para_key asc)
            g = g.sort_values(
                ["rerank_score", "neighbor_id"], ascending=[False, True]
            ).head(k_rerank)
            g = g[~g["text"].duplicated()].head(k_final).reset_index(drop=True)
            g["rank"] = g.index + 1
            out.append(
                g[["query_id", "rank", "doc_id", "para_idx", "rerank_score"]]
            )
        if not out:
            return pd.DataFrame(
                columns=["query_id", "rank", "doc_id", "para_idx", "rerank_score"]
            )
        return pd.concat(out, ignore_index=True)

    # materialize the TINY hit table (≤ queries × k_final rows): it
    # closes the first execution graph so join1's shuffle aggregator
    # actors + the rerank pool release their slots before join2 spawns
    # its own aggregators — two live hash joins plus an actor pool in
    # one streaming graph starve small clusters (measured deadlock at
    # 4 CPUs), and without the pin the whole ANN+join+rerank upstream
    # would re-execute for join2's partition-count probe anyway
    hits = hash_bucket_agg(
        scored, ["query_id"], select, num_buckets=num_buckets
    ).materialize()

    def tag_hit(batch: pa.Table) -> pa.Table:
        # the doc-paras join below reuses para_idx for the context rows
        return batch.rename_columns(
            [{"para_idx": "hit_para_idx"}.get(c, c) for c in batch.column_names]
        )

    hits = hits.map_batches(tag_hit, batch_format="pyarrow")

    # K5: each kept hit needs its doc's full paragraph list — join the
    # (small: ≤ queries × k_final) hit table to the corpus on doc_id,
    # then window each (query, rank) group in one bucketed kernel
    ctx_rows = hash_join(
        hits,
        slim.select_columns(["doc_id", "para_idx", "text"]).map_batches(
            lambda b: b.rename_columns(["ctx_doc_id", "para_idx", "text"]),
            batch_format="pyarrow",
        ),
        on="doc_id",
        right_on="ctx_doc_id",
    )

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (qid, rank), g in df.groupby(["query_id", "rank"]):
            ctx = _window(
                g[["para_idx", "text"]],
                int(g["hit_para_idx"].iloc[0]),
                budget=context_tokens,
            )
            out.append(
                {
                    "query_id": int(qid),
                    "rank": int(rank),
                    "doc_id": int(g["doc_id"].iloc[0]),
                    "para_idx": int(g["hit_para_idx"].iloc[0]),
                    "rerank_score": float(g["rerank_score"].iloc[0]),
                    "context": ctx,
                }
            )
        cols = ["query_id", "rank", "doc_id", "para_idx", "rerank_score", "context"]
        return pd.DataFrame(out, columns=cols)

    result = hash_bucket_agg(
        ctx_rows, ["query_id", "rank"], expand, num_buckets=num_buckets
    )
    arrow_schema = paras.schema().base_schema  # ray Schema → pyarrow
    para_idx_t = arrow_schema.field("para_idx").type
    return pin_schema(
        result,
        pa.schema(
            [
                ("query_id", pa.int64()),
                ("rank", pa.int64()),
                ("doc_id", pa.int64()),
                ("para_idx", para_idx_t),
                ("rerank_score", pa.float64()),
                ("context", pa.string()),
            ]
        ),
    )
