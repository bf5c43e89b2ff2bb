"""WordPiece tokenization stage (M7, reference
src/data/tokenize_paragraphs.py:14-31).

Driver trains (or loads) the vocab ONCE, ships it to the cluster with
``ray.put``, and every actor builds its tokenizer from the broadcast
in ``__init__`` — the model-stage pattern (setup once per actor,
never per batch; vocab never re-ships per task)."""

from __future__ import annotations

import pyarrow as pa

import ray
from ray.data import Dataset

from knowledge_graph_ray.functions.wordpiece import (
    WordPieceTokenizer,
    build_wordpiece_vocab,
)


def train_vocab_from_sample(
    ds: Dataset,
    *,
    text_col: str = "text",
    sample_rows: int = 2048,
    vocab_size: int = 8000,
    lowercase: bool = True,
) -> list[str]:
    """Deterministic corpus-trained vocab from a bounded driver-side
    sample (same discipline as the IVF index trainer: the SAMPLE is
    small by construction; the corpus itself never funnels to the
    driver)."""
    rows = ds.select_columns([text_col]).limit(sample_rows).take_all()
    return build_wordpiece_vocab(
        [r[text_col] for r in rows], vocab_size=vocab_size, lowercase=lowercase
    )


class WordPieceActor:
    """map_batches callable: adds ``tokenized_text`` (space-joined
    pieces, the reference's rendering) and ``n_tokens_wp``. Pass
    ``vocab_ref`` (ray.ObjectRef from ray.put) or a plain vocab list."""

    def __init__(self, vocab_ref, text_col: str = "text", lowercase: bool = True):
        vocab = ray.get(vocab_ref) if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref
        self.tok = WordPieceTokenizer(vocab, lowercase=lowercase)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        pieces = [self.tok.tokenize(t or "") for t in texts]
        out = batch.append_column(
            "tokenized_text", pa.array([" ".join(p) for p in pieces], pa.string())
        )
        return out.append_column(
            "n_tokens_wp", pa.array([len(p) for p in pieces], pa.int64())
        )


def tokenize_paragraphs(
    ds: Dataset,
    *,
    text_col: str = "text",
    vocab: list[str] | None = None,
    vocab_size: int = 8000,
    sample_rows: int = 2048,
    concurrency=(1, 4),
    batch_size: int = 4096,
) -> Dataset:
    """Corpus → corpus + (tokenized_text, n_tokens_wp). Trains the
    vocab from a sample when none is given."""
    if vocab is None:
        vocab = train_vocab_from_sample(
            ds, text_col=text_col, sample_rows=sample_rows, vocab_size=vocab_size
        )
    ref = ray.put(list(vocab))
    return ds.map_batches(
        WordPieceActor,
        fn_constructor_kwargs={"vocab_ref": ref, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
