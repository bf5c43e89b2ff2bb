"""Corpus build pipeline (reference lifecycle SURVEY.md §3.1):

pages → extract (S3/M1) → segment (M2-M4) → exact paragraph dedup
(D1, first-seen wins) → near-dup removal (D2, MinHash-banded — the
reference's driver-RAM Annoy index re-architected as a shuffle) →
per-doc length normalization (M6) → embedding (T1/T2 actor pool) →
paragraphs with vectors.

Every wide step keys explicitly: D1 on the paragraph text (bucketed
hash shuffle, surviving ROW carried through — no corpus-sized
broadcast), D2 on minhash band keys, M6 on doc_id (doc-local order by
para_idx, SURVEY.md §2.11).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from knowledge_graph_ray.functions import dedup
from knowledge_graph_ray.functions.hashing import combine_hashes
from knowledge_graph_ray.functions.segment import count_tokens, normalize_lengths
from knowledge_graph_ray.pipelines.kg import extract_and_segment
from knowledge_graph_ray.pipelines.relational import hash_bucket_agg
from knowledge_graph_ray.stages.embed import EmbedActor


def add_para_key(batch: pa.Table) -> pa.Table:
    """Stable int64 paragraph key from (doc_id, para_idx) — the
    reference's '{file}_{idx}' composite key as a typed column."""
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype("uint64")
    idx = batch.column("para_idx").to_numpy(zero_copy_only=False).astype("uint64")
    key = combine_hashes(doc, idx).view("int64")
    return batch.append_column("para_key", pa.array(key))


def dedup_paragraphs_exact(paras: Dataset) -> Dataset:
    """D1: one surviving row per distinct paragraph text; winner = min
    (doc_id, para_idx). The surviving row travels through the shuffle —
    nothing corpus-sized is ever collected."""

    def first_per_text(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text", "doc_id", "para_idx"])
        return df.drop_duplicates(subset=["text"], keep="first")

    return hash_bucket_agg(paras, ["text"], first_per_text, num_buckets=64)


def remove_near_dup_paragraphs(
    paras: Dataset, *, threshold: float = 0.85, survivors: str = "distributed"
) -> Dataset:
    """D2: drop near-duplicate paragraphs (boilerplate headers/footers;
    reference threshold semantics remove_duplicate_paragraphs.py:
    104-132 — cosine 0.98 over embeddings ≈ high Jaccard over text).
    Pair generation is the banded MinHash shuffle.

    Survivor selection is DISTRIBUTED by default: dup pairs are
    corpus-proportional on web data, so the drop set stays a Dataset
    (transitive closure via partition-pinned Pregel, keep min id per
    component) and is applied with a size-guarded anti semi-join —
    nothing pair-table-sized ever crosses the driver.
    ``survivors='driver'`` keeps the small-input shortcut (per-pair
    union-find collected driver-side, components semantics)."""
    # materialize: ``keyed`` is consumed twice (pair generation and the
    # final filter) — pinning it stops the extract/segment upstream
    # from re-executing for the second consumer
    keyed = paras.map_batches(add_para_key, batch_format="pyarrow").materialize()
    pairs = dedup.minhash_lsh_pairs(
        keyed, text_col="text", id_col="para_key", threshold=threshold
    )
    if survivors == "driver":
        drops = dedup.drops_from_pairs(pairs, strategy="components")
        return dedup.filter_dropped(keyed, drops, id_col="para_key")
    if survivors != "distributed":
        raise ValueError(f"unknown survivors mode: {survivors!r}")
    from knowledge_graph_ray.pipelines.relational import semi_join

    drops_ds = dedup.transitive_drops(pairs, num_buckets=16)
    return semi_join(keyed, drops_ds, on="para_key", right_on="node", anti=True)


def normalize_doc_lengths(
    paras: Dataset,
    *,
    min_tokens: int = 300,
    max_tokens: int = 500,
    token_unit: str = "ws",
    vocab: list[str] | None = None,
) -> Dataset:
    """M6: per-document merge/split to the token band. Doc-local and
    order-sensitive: ONE hash-bucket shuffle on doc_id (each doc lands
    whole in a bucket), then the bucket kernel normalizes every doc in
    a pandas groupby loop — Ray's map_groups paid ~1 ms of per-group
    overhead per DOC, which dominated on web-scale doc counts.

    ``token_unit='wordpiece'`` measures the band in BERT subwords (the
    reference's actual unit, tokenize_paragraphs.py:14-31) using a
    ``vocab`` (required) broadcast once via ``ray.put`` and rebuilt as
    a tokenizer once per bucket — not per paragraph. Default ``'ws'``
    keeps the cheap whitespace stand-in."""
    tok_ref = None
    if token_unit == "wordpiece":
        if vocab is None:
            raise ValueError("token_unit='wordpiece' needs a vocab")
        tok_ref = ray.put(sorted(vocab))
    elif token_unit != "ws":
        raise ValueError(f"unknown token_unit: {token_unit!r}")

    def fix_doc(df: pd.DataFrame, counter) -> pd.DataFrame:
        df = df.sort_values("para_idx")
        out = normalize_lengths(
            df["text"].tolist(),
            min_tokens=min_tokens,
            max_tokens=max_tokens,
            counter=counter,
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].iloc[0],
                "url": df["url"].iloc[0] if "url" in df else None,
                "para_idx": range(len(out)),
                "text": out,
                "n_tokens": [(counter or count_tokens)(t) for t in out],
            }
        )

    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "url": pd.Series([], dtype="object"),
            "para_idx": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype="object"),
            "n_tokens": pd.Series([], dtype="int64"),
        }
    )

    def fix_bucket(df: pd.DataFrame) -> pd.DataFrame:
        counter = None
        if tok_ref is not None:
            from knowledge_graph_ray.functions.wordpiece import WordPieceTokenizer

            counter = WordPieceTokenizer(ray.get(tok_ref)).count
        outs = [fix_doc(g, counter) for _, g in df.groupby("doc_id", sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else empty.copy()

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    return hash_bucket_agg(paras, ["doc_id"], fix_bucket, num_buckets=32)


def build_corpus(
    pages: Dataset,
    *,
    near_dup: bool = True,
    normalize: bool = True,
    embed_dim: int = 64,
    concurrency: int | tuple = (1, 4),
    batch_size: int = 1024,
) -> Dataset:
    """pages → deduped, (optionally) length-normalized, embedded
    paragraph Dataset."""
    paras = extract_and_segment(pages)
    paras = dedup_paragraphs_exact(paras)
    if near_dup:
        paras = remove_near_dup_paragraphs(paras)
    if normalize:
        paras = normalize_doc_lengths(paras)
    return paras.map_batches(
        EmbedActor,
        fn_constructor_kwargs={"dim": embed_dim},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
