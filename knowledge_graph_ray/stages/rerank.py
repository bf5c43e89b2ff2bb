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


class ModelRerankActor(RerankActor):
    """Integration point for a REAL cross-encoder (the reference's
    BERT reranker, bert_rerank.py:38-75): same candidate-row contract
    as ``RerankActor`` but the model comes from a zero-arg
    ``model_loader`` called ONCE per actor — e.g.
    ``lambda: CrossEncoder("cross-encoder/...")``. The loader's object
    must expose ``predict(list[tuple[str, str]]) -> (n,) float
    scores`` (the sentence-transformers CrossEncoder interface).
    Texts are truncated to ``max_chars`` before pairing (crude guard;
    pass the model's own tokenizer-aware truncation upstream for exact
    budgets). Deploy on GPUs via ``map_batches(ModelRerankActor,
    concurrency=N, num_gpus=1, fn_constructor_kwargs=...)``."""

    def __init__(self, model_loader, max_chars: int = 4096):
        self.model = model_loader()  # once per actor (weights / device)
        self.max_chars = max_chars

    def score_pairs(self, queries: list[str], paras: list[str]) -> np.ndarray:
        pairs = [
            ((q or "")[: self.max_chars], (p or "")[: self.max_chars])
            for q, p in zip(queries, paras)
        ]
        scores = np.asarray(self.model.predict(pairs), dtype=np.float64)
        if scores.shape != (len(pairs),):
            raise ValueError(f"model returned {scores.shape}, expected ({len(pairs)},)")
        return np.round(scores, 6)
