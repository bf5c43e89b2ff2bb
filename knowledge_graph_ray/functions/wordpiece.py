"""Real WordPiece tokenization (M7, reference
src/data/tokenize_paragraphs.py:14-31: BERT ``tokenizer.tokenize`` per
paragraph, pieces re-joined with spaces).

The reference loads a pretrained Danish-BERT vocab; no pretrained
files exist in this sandbox, so the vocab is TRAINED deterministically
from the corpus itself with the published WordPiece objective (merge
the pair maximizing freq(ab) / (freq(a) * freq(b)) — BERT's likelihood
criterion, as documented in the HuggingFace WordPiece training guide).
The tokenize side is the exact HF/BERT algorithm: basic tokenizer
(lowercase optional, punctuation split, whitespace split) + greedy
longest-match-first with "##" continuation prefixes and [UNK] for
unmatchable words. Swap ``WordPieceTokenizer(vocab=...)`` with a real
BERT vocab file at deploy time for byte-parity with the reference.
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter

UNK = "[UNK]"
_MAX_WORD_CHARS = 100
_WS_RE = re.compile(r"\s+")


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def basic_tokenize(text: str, lowercase: bool = True) -> list[str]:
    """BERT BasicTokenizer: whitespace split, punctuation split into
    standalone tokens, optional lowercasing (no accent stripping — the
    reference corpus is Danish)."""
    if lowercase:
        text = (text or "").lower()
    out: list[str] = []
    for chunk in _WS_RE.split(text or ""):
        if not chunk:
            continue
        word = []
        for ch in chunk:
            if _is_punct(ch):
                if word:
                    out.append("".join(word))
                    word = []
                out.append(ch)
            else:
                word.append(ch)
        if word:
            out.append("".join(word))
    return out


def build_wordpiece_vocab(
    texts: list[str],
    vocab_size: int = 8000,
    lowercase: bool = True,
    min_pair_freq: int = 2,
) -> list[str]:
    """Deterministic WordPiece vocabulary training.

    Published algorithm (BERT §4.1 / HF course chapter 6.6): start
    from the alphabet (word-initial chars plus "##"-prefixed
    continuations), then repeatedly merge the adjacent-pair with the
    highest score freq(ab) / (freq(a) * freq(b)) until ``vocab_size``
    is reached. Ties break lexicographically so the vocab is a pure
    function of the corpus."""
    word_freq: Counter = Counter()
    for t in texts:
        word_freq.update(basic_tokenize(t, lowercase=lowercase))

    # each word as a list of current pieces
    splits: dict[str, list[str]] = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w in word_freq
    }
    vocab: set[str] = {UNK}
    for pieces in splits.values():
        vocab.update(pieces)

    while len(vocab) < vocab_size:
        piece_freq: Counter = Counter()
        pair_freq: Counter = Counter()
        for w, pieces in splits.items():
            f = word_freq[w]
            for p in pieces:
                piece_freq[p] += f
            for a, b in zip(pieces, pieces[1:]):
                pair_freq[(a, b)] += f
        best, best_score = None, 0.0
        for (a, b), f in pair_freq.items():
            if f < min_pair_freq:
                continue
            score = f / (piece_freq[a] * piece_freq[b])
            if best is None or score > best_score or (
                score == best_score and (a, b) < best
            ):
                best, best_score = (a, b), score
        if best is None:
            break
        a, b = best
        merged = a + b[2:] if b.startswith("##") else a + b
        vocab.add(merged)
        for w, pieces in splits.items():
            out = []
            i = 0
            while i < len(pieces):
                if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            splits[w] = out
    return sorted(vocab)


class WordPieceTokenizer:
    """HF/BERT WordPiece: greedy longest-match-first over a fixed
    vocab. ``tokenize`` returns pieces; ``tokenize_join`` reproduces
    the reference's " ".join(pieces) paragraph rendering
    (tokenize_paragraphs.py:27-28)."""

    def __init__(self, vocab: list[str] | set[str], lowercase: bool = True):
        self.vocab = set(vocab)
        self.lowercase = lowercase

    def _word_pieces(self, word: str) -> list[str]:
        if len(word) > _MAX_WORD_CHARS:
            return [UNK]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [UNK]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for word in basic_tokenize(text, lowercase=self.lowercase):
            out.extend(self._word_pieces(word))
        return out

    def tokenize_join(self, text: str) -> str:
        return " ".join(self.tokenize(text))

    def count(self, text: str) -> int:
        """Subword count — the unit of the reference's 300–500
        paragraph band (tokenize_paragraphs.py; bert_embed.py:74-76
        truncates at 511 of these)."""
        return len(self.tokenize(text))
