"""Cross-encoder reranker stage (SURVEY.md T6; reference
bert_rerank.py:38-75 — [CLS] q [SEP] p segment-mean cosine).

Deterministic stand-in with the same operator shape: the 'model' is
actor state built once in __init__; __call__ scores a batch of
(query, paragraph) candidate rows. A real cross-encoder replaces
``score_pairs``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from knowledge_graph_ray.stages.embed import HashEmbedder


class RerankActor:
    def __init__(self, dim: int = 64):
        self.embedder = HashEmbedder(dim)  # once per actor

    def score_pairs(self, queries: list[str], paras: list[str]) -> np.ndarray:
        q = self.embedder.encode(queries)
        p = self.embedder.encode(paras)
        return np.round((q * p).sum(axis=1).astype(np.float64), 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = self.score_pairs(
            batch.column("query").to_pylist(), batch.column("text").to_pylist()
        )
        return batch.append_column("rerank_score", pa.array(scores, pa.float64()))
