"""M5 semantic segmentation as an actor-pool stage (the reference's
embedding-minima splitter, extract_paragraphs_faster.py:33-127).

The embedder is actor state (loaded once per actor, §2.3); the default
is the deterministic HashEmbedder, a real sentence encoder drops in
via ``embedder_factory``.
"""

from __future__ import annotations

import pyarrow as pa

from knowledge_graph_ray.functions.segment import count_tokens, semantic_paragraphs
from knowledge_graph_ray.stages.embed import HashEmbedder


class SemanticSegmentActor:
    """docs(url?, doc_id?, text, ...) → paragraphs(doc_id, url, para_idx,
    text, n_tokens) using semantic breakpoints. Drop-in alternative to
    the regex/length path (functions.segment.paragraphs_batch)."""

    def __init__(self, dim: int = 64, p_size: int = 10, order: int = 2):
        self.embedder = HashEmbedder(dim)  # once per actor
        self.p_size = p_size
        self.order = order

    def __call__(self, batch: pa.Table) -> pa.Table:
        from knowledge_graph_ray.functions.segment import doc_ids_for

        urls = (
            batch.column("url").to_pylist()
            if "url" in batch.column_names
            else [None] * batch.num_rows
        )
        doc_ids = (
            batch.column("doc_id").to_pylist()
            if "doc_id" in batch.column_names
            else [int(x) for x in doc_ids_for(batch.column("url"))]
        )
        texts = batch.column("text").to_pylist()
        o_doc, o_url, o_idx, o_text, o_tok = [], [], [], [], []
        for did, url, text in zip(doc_ids, urls, texts):
            paras = semantic_paragraphs(
                text or "", self.embedder.encode, p_size=self.p_size, order=self.order
            )
            for j, p in enumerate(paras):
                o_doc.append(did)
                o_url.append(url)
                o_idx.append(j)
                o_text.append(p)
                o_tok.append(count_tokens(p))
        return pa.table(
            {
                "doc_id": pa.array(o_doc, pa.int64()),
                "url": pa.array(o_url, pa.string()),
                "para_idx": pa.array(o_idx, pa.int32()),
                "text": pa.array(o_text, pa.string()),
                "n_tokens": pa.array(o_tok, pa.int32()),
            }
        )
