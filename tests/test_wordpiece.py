"""M7 WordPiece tokenizer: exact HF/BERT tokenize semantics over a
fixed vocab, deterministic corpus-trained vocab, and the Ray stage."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray
import ray.data as rd

from knowledge_graph_ray.functions.wordpiece import (
    UNK,
    WordPieceTokenizer,
    basic_tokenize,
    build_wordpiece_vocab,
)


def test_hf_reference_example():
    # the canonical BERT docstring example
    tok = WordPieceTokenizer(["un", "##aff", "##able"])
    assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]


def test_greedy_longest_match_first():
    tok = WordPieceTokenizer(["the", "them", "##m", "##e"])
    # greedy takes "them" (longest prefix), then "##e"
    assert tok.tokenize("theme") == ["them", "##e"]


def test_unk_when_unmatchable():
    tok = WordPieceTokenizer(["un", "##aff"])
    assert tok.tokenize("unaffable") == [UNK]
    assert tok.tokenize("") == []


def test_basic_tokenizer_punctuation_and_case():
    assert basic_tokenize("Hello, world!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("Hello, World!", lowercase=False) == [
        "Hello", ",", "World", "!",
    ]


def test_tokenize_join_matches_reference_rendering():
    tok = WordPieceTokenizer(["un", "##aff", "##able", "fine", ","])
    # tokenize_paragraphs.py:27-28 — pieces re-joined with single spaces
    assert tok.tokenize_join("fine, unaffable") == "fine , un ##aff ##able"


def test_vocab_training_deterministic_and_lossless():
    texts = [
        "hugging face hugs huge hugs",
        "the hug was huge and the face was hugging",
    ] * 3
    v1 = build_wordpiece_vocab(texts, vocab_size=60)
    v2 = build_wordpiece_vocab(list(texts), vocab_size=60)
    assert v1 == v2  # pure function of the corpus
    tok = WordPieceTokenizer(v1)
    # every training word re-tokenizes without UNK (alphabet is in-vocab)
    for t in texts:
        assert UNK not in tok.tokenize(t)
    # merges happened: a frequent word is a single piece or few pieces
    assert len(tok.tokenize("hugs")) < len("hugs")


def test_trained_vocab_merges_by_score():
    # "ab" appears always together; "a"/"b" never elsewhere → pair
    # (a,##b) has the max score and must merge early
    texts = ["ab ab ab cd ce cf"] * 4
    vocab = build_wordpiece_vocab(texts, vocab_size=20)
    tok = WordPieceTokenizer(vocab)
    assert tok.tokenize("ab") == ["ab"]


def test_wordpiece_stage(ray_session):
    from knowledge_graph_ray.stages.tokenize import tokenize_paragraphs

    texts = ["hugging face hugs", "the huge hug", "face the hugging hug"] * 10
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    out = tokenize_paragraphs(ds, vocab_size=80, sample_rows=100, batch_size=8)
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    assert len(rows) == len(texts)
    # counts agree with a driver-side tokenizer built from the same vocab
    from knowledge_graph_ray.stages.tokenize import train_vocab_from_sample

    vocab = train_vocab_from_sample(ds, sample_rows=100, vocab_size=80)
    tok = WordPieceTokenizer(vocab)
    for r in rows[:5]:
        assert r["tokenized_text"] == tok.tokenize_join(r["text"])
        assert r["n_tokens_wp"] == len(r["tokenized_text"].split())


def test_normalize_lengths_in_wordpiece_units(ray_session):
    from knowledge_graph_ray.pipelines.corpus import normalize_doc_lengths

    # vocab splits every word into ~3 pieces ("ab", "##cd", "##ef"),
    # so a 4-word paragraph is 12 subwords but only 4 ws tokens: with
    # a max band of 6 the wordpiece unit must split where the
    # whitespace unit would not
    vocab = ["ab", "##cd", "##ef"]
    word = "abcdef"
    paras = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 1], pa.int64()),
                "url": pa.array(["u", "u"]),
                "para_idx": pa.array([0, 1], pa.int64()),
                "text": pa.array([f"{word} {word}. {word} {word}."] * 2),
            }
        )
    )
    ws = normalize_doc_lengths(paras, min_tokens=1, max_tokens=6).take_all()
    wp = normalize_doc_lengths(
        paras, min_tokens=1, max_tokens=6, token_unit="wordpiece", vocab=vocab
    ).take_all()
    assert len(ws) == 2  # 4 ws tokens per para — under band, untouched
    assert len(wp) == 4  # 12 subwords per para — split at sentences
    # reported n_tokens are in the band's own unit (each split para is
    # "abcdef abcdef." = 3 + 3 pieces + the trailing "." UNK = 7)
    assert all(r["n_tokens"] == 4 for r in ws)
    assert all(r["n_tokens"] == 7 for r in wp)
    with pytest.raises(ValueError, match="needs a vocab"):
        normalize_doc_lengths(paras, token_unit="wordpiece")
