"""Sentence / paragraph segmentation (SURVEY.md M2-M6).

Reference semantics reproduced with clean-room code:
- M2 regex sentence split on ``[?.!]`` after newline→space
  (extract_paragraphs_faster.py:71-73) — here applied per newline
  block so document structure survives extraction.
- M3 greedy merge of sentences shorter than ``min_chars`` into their
  successor (extract_paragraphs_faster.py:75-86).
- M4 hard-wrap of sentences longer than ``max_chars``
  (extract_paragraphs_faster.py:88-105).
- M6 paragraph length normalization to a token band with bounded
  passes (adjust_length_paragraphs.py:42-91); token = whitespace
  token (deterministic stand-in for BERT wordpiece, SURVEY.md T9).

All kernels are pure functions of one document → exploded rows, used
as ``map_batches`` task stages over Arrow batches. Intra-document
order is carried explicitly as (doc_id, para_idx, sent_idx) — never
implicit block order (SURVEY.md §2.11).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from knowledge_graph_ray.functions.hashing import hash64_array

_SENT_SPLIT = re.compile(r"[?.!]")
_WS = re.compile(r"\s+")

MIN_SENT_CHARS = 30
MAX_SENT_CHARS = 500


def count_tokens(text: str) -> int:
    text = text.strip()
    return len(_WS.split(text)) if text else 0


def split_sentences(block: str) -> list[str]:
    """M2: one text block → sentences (stripped, non-empty)."""
    block = block.replace("\n", " ")
    return [s.strip() for s in _SENT_SPLIT.split(block) if s.strip()]


def merge_short(sentences: list[str], min_chars: int = MIN_SENT_CHARS) -> list[str]:
    """M3: greedily merge each sentence < min_chars into its successor;
    a trailing short sentence merges backward into its predecessor."""
    out: list[str] = []
    carry = ""
    for s in sentences:
        s = (carry + " " + s).strip() if carry else s
        if len(s) < min_chars:
            carry = s
        else:
            out.append(s)
            carry = ""
    if carry:
        if out:
            out[-1] = out[-1] + " " + carry
        else:
            out.append(carry)
    return out


def wrap_long(sentences: list[str], max_chars: int = MAX_SENT_CHARS) -> list[str]:
    """M4: hard-wrap sentences longer than max_chars."""
    out: list[str] = []
    for s in sentences:
        while len(s) > max_chars:
            out.append(s[:max_chars])
            s = s[max_chars:]
        if s:
            out.append(s)
    return out


def segment_text(text: str) -> list[list[str]]:
    """Document text → list of paragraphs, each a list of cleaned
    sentences. Paragraph boundaries = non-empty newline blocks."""
    paragraphs: list[list[str]] = []
    for block in text.split("\n"):
        if not block.strip():
            continue
        sents = wrap_long(merge_short(split_sentences(block)))
        if sents:
            paragraphs.append(sents)
    return paragraphs


def normalize_lengths(
    paragraphs: list[str],
    min_tokens: int = 300,
    max_tokens: int = 500,
    passes: int = 3,
    counter=None,
) -> list[str]:
    """M6: iteratively merge adjacent short paragraphs and split long
    ones at sentence boundaries, at most ``passes`` rounds, then hard
    truncate anything still over budget.

    ``counter`` sets the band's unit: default whitespace tokens (the
    cheap stand-in); pass ``WordPieceTokenizer(...).count`` to measure
    the band in the reference's wordpiece units
    (tokenize_paragraphs.py:14-31 — its 300–500 band is BERT
    subwords, not words). The hard truncate stays whitespace-wise
    (a subword cut mid-word would corrupt text)."""
    count = counter or count_tokens
    paras = [p for p in paragraphs if p.strip()]
    for _ in range(passes):
        changed = False
        # merge pass
        merged: list[str] = []
        for p in paras:
            if merged and count(merged[-1]) < min_tokens:
                merged[-1] = merged[-1] + " " + p
                changed = True
            else:
                merged.append(p)
        # split pass
        split_out: list[str] = []
        for p in merged:
            if count(p) > max_tokens:
                sents = split_sentences(p)
                cur: list[str] = []
                cur_tok = 0
                for s in sents:
                    t = count(s)
                    if cur and cur_tok + t > max_tokens:
                        split_out.append(". ".join(cur) + ".")
                        cur, cur_tok = [], 0
                        changed = True
                    cur.append(s)
                    cur_tok += t
                if cur:
                    split_out.append(". ".join(cur) + ".")
            else:
                split_out.append(p)
        paras = split_out
        if not changed:
            break
    # hard truncate (reference adjust_length_paragraphs.py:88-91)
    out = []
    for p in paras:
        toks = p.split()
        out.append(" ".join(toks[:max_tokens]) if len(toks) > max_tokens else p)
    return out


# ------------------------------------------------- semantic splitting (M5)

def _rev_sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(0.5 * x))


def activated_similarities(sim: np.ndarray, p_size: int = 10) -> np.ndarray:
    """Weighted sum of the sentence-similarity matrix's upper diagonals
    with reverse-sigmoid distance decay (reference semantics,
    extract_paragraphs_faster.py:37-63): position i scores how similar
    sentence i is to its next ``p_size`` successors."""
    n = sim.shape[0]
    p = min(p_size, n)
    weights = np.zeros(n)
    weights[:p] = _rev_sigmoid(np.linspace(-10, 10, p))
    out = np.zeros(n)
    for k in range(n):
        diag = np.diagonal(sim, offset=k)
        out[: len(diag)] += weights[k] * diag
    return out


def local_minima(arr: np.ndarray, order: int = 2) -> list[int]:
    """Indices that are strictly smaller than every neighbor within
    ``order`` positions (argrelextrema(np.less) semantics)."""
    n = len(arr)
    out = []
    for i in range(n):
        lo, hi = max(0, i - order), min(n, i + order + 1)
        window = np.concatenate([arr[lo:i], arr[i + 1 : hi]])
        if len(window) and np.all(arr[i] < window):
            out.append(i)
    return out


def semantic_paragraphs(
    text: str, embed_fn, *, p_size: int = 10, order: int = 2
) -> list[str]:
    """M5: split a document into paragraphs at semantic breakpoints —
    sentence embeddings → cosine-similarity diagonals → activation →
    paragraph breaks at relative minima (reference
    extract_paragraphs_faster.py:108-127, clean-room).

    ``embed_fn(list[str]) -> (n, d) unit rows`` is injected: the
    deterministic HashEmbedder in tests, a real model in production.
    """
    sents = wrap_long(merge_short(split_sentences(text.replace("\n", " "))))
    if len(sents) <= 1:
        return sents
    emb = np.asarray(embed_fn(sents))
    sim = emb @ emb.T
    act = activated_similarities(sim, p_size=p_size)
    breaks = set(local_minima(act, order=order))
    paragraphs, cur = [], []
    for i, s in enumerate(sents):
        cur.append(s)
        if i in breaks:
            paragraphs.append(" ".join(cur))
            cur = []
    if cur:
        paragraphs.append(" ".join(cur))
    return paragraphs


def doc_ids_for(urls: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Stable int64 doc id from url (the unique page key)."""
    return hash64_array(urls).view(np.int64)


def paragraphs_batch(batch: pa.Table) -> pa.Table:
    """docs(url, text, lang, ...) → paragraphs(doc_id, url, para_idx,
    text, n_tokens). One input row → k output rows (flat_map shape)."""
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = (
        batch.column("lang").to_pylist()
        if "lang" in batch.column_names
        else [None] * len(urls)
    )
    doc_ids = doc_ids_for(batch.column("url"))
    out_doc, out_url, out_lang, out_idx, out_text, out_tok = [], [], [], [], [], []
    for did, url, lang, text in zip(doc_ids, urls, langs, texts):
        for j, sents in enumerate(segment_text(text or "")):
            ptext = " ".join(sents)
            out_doc.append(int(did))
            out_url.append(url)
            out_lang.append(lang)
            out_idx.append(j)
            out_text.append(ptext)
            out_tok.append(count_tokens(ptext))
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "url": pa.array(out_url, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "para_idx": pa.array(out_idx, pa.int32()),
            "text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_tok, pa.int32()),
        }
    )


def sentences_batch(batch: pa.Table) -> pa.Table:
    """paragraphs → sentences(doc_id, para_idx, sent_idx, text)."""
    doc_ids = batch.column("doc_id").to_pylist()
    para_idx = batch.column("para_idx").to_pylist()
    texts = batch.column("text").to_pylist()
    o_doc, o_para, o_sent, o_text = [], [], [], []
    for did, pidx, text in zip(doc_ids, para_idx, texts):
        for k, s in enumerate(split_sentences(text or "")):
            o_doc.append(did)
            o_para.append(pidx)
            o_sent.append(k)
            o_text.append(s)
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.int64()),
            "para_idx": pa.array(o_para, pa.int32()),
            "sent_idx": pa.array(o_sent, pa.int32()),
            "text": pa.array(o_text, pa.string()),
        }
    )
