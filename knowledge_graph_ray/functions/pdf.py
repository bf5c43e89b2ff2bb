"""Minimal pure-stdlib PDF text extraction (SURVEY.md S4).

Reference behavior: ``src/data/get_files.py:23-35`` loops PyPDF2
pages and concatenates ``extractText()`` output. No PDF library ships
in this container, so this is a clean-room minimal extractor with the
same contract (PDF bytes → text, never raises on garbage — callers
quarantine): it

1. finds every ``stream ... endstream`` object,
2. inflates ``/FlateDecode`` streams (zlib; stored streams pass
   through),
3. scans content streams for text blocks (``BT``/``ET``) and collects
   the show-text operators ``Tj``, ``'``, ``"`` and ``TJ`` (array
   form, kern numbers ignored), decoding PDF literal strings
   (``\\(``-escapes, octal) and hex strings.

Line structure: each show-text op contributes one line within its
``BT`` block; blocks are joined with newlines (one block per
synthesized page — see sources.synth.make_pdf, whose output is the
pinned golden for this extractor).

The output is byte-deterministic for a given input — tests pin it
exactly, same discipline as the HTML oracle (functions/extract.py).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"(<<.*?>>)\s*stream\r?\n(.*?)endstream", re.DOTALL)
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
# a literal string (with escapes) or hex string, followed by a show op;
# TJ arrays are matched separately
_SHOW_RE = re.compile(
    rb"(\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>)\s*(Tj|'|\")"
)
_TJ_RE = re.compile(rb"\[((?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]])*)\]\s*TJ")
_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>")

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _decode_literal(raw: bytes) -> bytes:
    """PDF literal string body (without outer parens) → bytes."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal \d{1,3}
            j = i + 1
            while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        else:  # line continuation or unknown escape: drop backslash
            i += 1
    return bytes(out)


def _decode_string(tok: bytes) -> str:
    if tok.startswith(b"("):
        data = _decode_literal(tok[1:-1])
    else:  # hex string
        hx = re.sub(rb"\s", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        data = bytes.fromhex(hx.decode("ascii"))
    # PDFDocEncoding ≈ latin-1 for the printable range (no font cmaps
    # in this minimal extractor)
    return data.decode("latin-1")


def _block_text(block: bytes) -> str:
    """One BT..ET block → its show-text lines."""
    lines: list[str] = []
    # strip TJ arrays first so _SHOW_RE can't double-count their
    # member strings, collecting their text in document order
    pieces: list[tuple[int, str]] = []
    for m in _TJ_RE.finditer(block):
        text = "".join(_decode_string(s.group(0)) for s in _STR_RE.finditer(m.group(1)))
        pieces.append((m.start(), text))
    without_tj = _TJ_RE.sub(b"", block)
    for m in _SHOW_RE.finditer(without_tj):
        # position in the original block is approximate after the sub;
        # ordering within each operator family is preserved, and mixed
        # files interleave per-family — fine for extraction purposes
        pieces.append((m.start(), _decode_string(m.group(1))))
    pieces.sort(key=lambda p: p[0])
    for _, text in pieces:
        if text:
            lines.append(text)
    return "\n".join(lines)


def _inflate(stream_dict: bytes, body: bytes) -> bytes | None:
    if b"/FlateDecode" in stream_dict:
        try:
            return zlib.decompress(body)
        except zlib.error:
            try:  # some writers pad the stream; try raw deflate
                return zlib.decompressobj().decompress(body)
            except zlib.error:
                return None
    return body


def extract_pdf_text(payload: bytes) -> str:
    """PDF bytes → text (all pages' text blocks, newline-joined).
    Never raises on malformed input — returns whatever it could read
    (callers quarantine empty output upstream if needed)."""
    if not isinstance(payload, (bytes, bytearray)):
        raise TypeError("extract_pdf_text expects bytes")
    pages: list[str] = []
    for m in _STREAM_RE.finditer(payload):
        content = _inflate(m.group(1), m.group(2))
        if content is None or b"BT" not in content:
            continue
        blocks = [_block_text(b) for b in _TEXT_BLOCK_RE.findall(content)]
        text = "\n".join(b for b in blocks if b)
        if text:
            pages.append(text)
    return "\n".join(pages)
