"""Segmentation kernels M2-M6 (SURVEY.md §2.2)."""

from __future__ import annotations

from knowledge_graph_ray.functions.segment import (
    count_tokens,
    merge_short,
    normalize_lengths,
    paragraphs_batch,
    segment_text,
    sentences_batch,
    split_sentences,
    wrap_long,
)
from knowledge_graph_ray.sources import synth


def test_split_sentences_basic():
    assert split_sentences("One two three. Four five?") == ["One two three", "Four five"]


def test_split_sentences_newlines_to_space():
    assert split_sentences("a b c d e f g h\ni j k") == ["a b c d e f g h i j k"]


def test_merge_short_forward():
    sents = ["tiny", "this sentence is long enough to stand alone"]
    out = merge_short(sents, min_chars=30)
    assert out == ["tiny this sentence is long enough to stand alone"]


def test_merge_short_trailing_backward():
    sents = ["this sentence is long enough to stand alone", "tail"]
    out = merge_short(sents, min_chars=30)
    assert out == ["this sentence is long enough to stand alone tail"]


def test_merge_short_single_short_doc():
    assert merge_short(["tiny"], min_chars=30) == ["tiny"]


def test_wrap_long():
    s = "x" * 1250
    out = wrap_long([s], max_chars=500)
    assert [len(p) for p in out] == [500, 500, 250]


def test_segment_text_blocks_are_paragraphs():
    text = "First block sentence one is long enough. Second sentence also long enough.\n\nSecond block only sentence that is long."
    paras = segment_text(text)
    assert len(paras) == 2
    assert len(paras[0]) == 2


def test_normalize_lengths_merges_short():
    paras = ["short para one", "short para two", "short para three"]
    out = normalize_lengths(paras, min_tokens=10, max_tokens=50)
    assert len(out) == 1


def test_normalize_lengths_splits_long():
    long = ". ".join(f"sentence number {i} with several extra words here" for i in range(40))
    out = normalize_lengths([long], min_tokens=10, max_tokens=100)
    assert len(out) > 1
    assert all(count_tokens(p) <= 100 for p in out)


def test_normalize_truncates_unsplittable():
    # one "sentence" with no boundaries and too many tokens
    blob = " ".join(f"w{i}" for i in range(700))
    out = normalize_lengths([blob], min_tokens=10, max_tokens=500)
    assert all(count_tokens(p) <= 500 for p in out)


def test_paragraphs_batch_shapes():
    from knowledge_graph_ray.functions.extract import extract_batch

    pages = synth.pages_table(10)
    docs = extract_batch(pages)
    paras = paragraphs_batch(docs)
    assert paras.num_rows > 10  # exploded
    assert set(paras.column_names) == {"doc_id", "url", "lang", "para_idx", "text", "n_tokens"}
    # para_idx dense per doc starting at 0
    import collections

    seen = collections.defaultdict(list)
    for d, p in zip(paras.column("doc_id").to_pylist(), paras.column("para_idx").to_pylist()):
        seen[d].append(p)
    for idxs in seen.values():
        assert idxs == list(range(len(idxs)))


def test_sentences_batch():
    from knowledge_graph_ray.functions.extract import extract_batch

    pages = synth.pages_table(5)
    sents = sentences_batch(paragraphs_batch(extract_batch(pages)))
    assert sents.num_rows > 0
    assert all(t.strip() for t in sents.column("text").to_pylist())
