"""Embedding stage (SURVEY.md T1-T3): deterministic token-hash
embedder + the actor-pool wrapper.

The reference embeds text with a Danish BERT (bert_embed.py:67-91,
768-d mean-pooled). Real models aren't available in this sandbox, so
the default embedder is a deterministic token-hash bag-of-words
vector: each lowercase word token maps to a fixed unit vector seeded
by its stable digest; a text embeds to the L2-normalized sum. This
preserves the *semantics the pipeline needs* — texts sharing tokens
have high cosine similarity — while being exactly reproducible.

A real model drops in by replacing ``EmbedActor``'s encoder; the Ray
plumbing (actor pool, once-per-actor setup, batched encode) is the
part this repo owns:

    ds.map_batches(EmbedActor, concurrency=N, batch_size=B,
                   fn_constructor_kwargs={"dim": 64, "text_col": "text"})
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from knowledge_graph_ray.functions.hashing import stable_digest

DEFAULT_DIM = 64
_TOKEN_RE = re.compile(r"\w+")


class HashEmbedder:
    """Deterministic bag-of-tokens embedder with a per-instance token
    vector cache (the 'model' loaded once per actor)."""

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def _token_vector(self, tok: str) -> np.ndarray:
        v = self._cache.get(tok)
        if v is None:
            rng = np.random.default_rng(stable_digest("tok:" + tok))
            v = rng.standard_normal(self.dim).astype(np.float32)
            v /= np.linalg.norm(v)
            self._cache[tok] = v
        return v

    def encode(self, texts: list[str]) -> np.ndarray:
        """(n,) texts → (n, dim) float32, rows L2-normalized (zero row
        for empty text)."""
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            toks = _TOKEN_RE.findall((text or "").lower())
            if not toks:
                continue
            acc = np.zeros(self.dim, dtype=np.float32)
            for t in toks:
                acc += self._token_vector(t)
            n = np.linalg.norm(acc)
            if n > 0:
                out[i] = acc / n
        return out


def embed_texts(texts: list[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    """Pure convenience wrapper (used by the synthetic entity table so
    entity vectors and mention vectors live in the same space)."""
    return HashEmbedder(dim).encode(texts)


class EmbedActor:
    """Actor-pool map_batches stage: adds an ``embedding`` column
    (fixed_size_list<float32, dim>) to any table with ``text_col``.

    Reference analog: embed_v14.py:67-75 / embed_paragraphs.py:59-77 —
    there one .npy per paragraph; here the vector travels with the row.
    """

    def __init__(self, dim: int = DEFAULT_DIM, text_col: str = "text"):
        self.embedder = HashEmbedder(dim)  # once per actor
        self.dim = dim
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        vecs = self.embedder.encode(texts)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa.float32()), self.dim
        )
        return batch.append_column("embedding", col)


def embed_stage(
    ds,
    *,
    model_loader=None,
    dim: int = DEFAULT_DIM,
    text_col: str = "text",
    concurrency=(1, 4),
    batch_size: int = 256,
    num_gpus: float | None = None,
    num_cpus: float | None = None,
    **actor_kwargs,
):
    """Deploy wrapper for the embedding actor pool — the ONE code path
    both CPU and GPU users take, so the resource-arg plumbing is a
    tested library surface rather than a docstring. ``num_gpus=1``
    pins each actor to a device (the reference's bert_embed.py GPU
    deployment shape); ``model_loader`` switches to ``ModelEmbedActor``
    (real encoder loaded once per actor), else the deterministic
    ``EmbedActor`` runs. Resource kwargs pass straight through to
    ``Dataset.map_batches``."""
    if model_loader is not None:
        cls = ModelEmbedActor
        ctor = dict(model_loader=model_loader, dim=dim, text_col=text_col,
                    **actor_kwargs)
    else:
        cls = EmbedActor
        ctor = dict(dim=dim, text_col=text_col, **actor_kwargs)
    ray_kwargs = {}
    if num_gpus is not None:
        ray_kwargs["num_gpus"] = num_gpus
    if num_cpus is not None:
        ray_kwargs["num_cpus"] = num_cpus
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=ctor,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        **ray_kwargs,
    )


class ModelEmbedActor(EmbedActor):
    """Integration point for a REAL encoder (the reference's Danish
    BERT, bert_embed.py:67-91): same row/column contract as
    ``EmbedActor``, but the model comes from a zero-arg
    ``model_loader`` called ONCE per actor in ``__init__`` — e.g.
    ``lambda: SentenceTransformer("...").half().cuda()`` — and each
    text is truncated to ``max_tokens`` tokens before encoding (the
    reference truncates at 511 wordpieces, bert_embed.py:74-76; pass a
    ``tokenize`` callable to truncate in the model's own token space,
    default whitespace-ish \\w+|non-space runs).

    The loader must return an object with
    ``encode(list[str]) -> np.ndarray`` of shape (n, dim). Deploy on
    GPUs via ``ds.map_batches(ModelEmbedActor, concurrency=N,
    batch_size=B, num_gpus=1, fn_constructor_kwargs={"model_loader":
    load})`` — ``num_gpus`` pins each actor to a device; batch_size is
    the inference micro-batch.
    """

    def __init__(
        self,
        model_loader,
        dim: int = DEFAULT_DIM,
        text_col: str = "text",
        max_tokens: int = 511,
        tokenize=None,
    ):
        self.model = model_loader()  # once per actor (GPU init, weights)
        self.dim = dim
        self.text_col = text_col
        self.max_tokens = max_tokens
        self.tokenize = tokenize or (lambda t: _TOKEN_RE.findall(t or ""))

    def _truncate(self, text: str) -> str:
        toks = self.tokenize(text or "")
        if len(toks) <= self.max_tokens:
            return text or ""
        return " ".join(toks[: self.max_tokens])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [self._truncate(t) for t in batch.column(self.text_col).to_pylist()]
        vecs = np.asarray(self.model.encode(texts), dtype=np.float32)
        if vecs.shape != (len(texts), self.dim):
            raise ValueError(
                f"model returned {vecs.shape}, expected ({len(texts)}, {self.dim})"
            )
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa.float32()), self.dim
        )
        return batch.append_column("embedding", col)
