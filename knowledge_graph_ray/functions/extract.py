"""HTML → text extraction (frozen oracle) + cleanup.

Reference behavior reproduced (see SURVEY.md S3/M1):
- ``src/data/get_files.py:19-21`` — ``BeautifulSoup(html).get_text()``:
  all text nodes concatenated verbatim, markup removed.
- ``src/data/get_files.py:37-42`` — cleanup: drop the boilerplate
  sentence, collapse >=3 consecutive newlines to exactly two.
- ``src/data/get_files.py:87-99`` — failures are quarantined, never
  raised (``bad_files`` dict → here an ``error`` column).

This module is the **byte-identical fixture oracle** (north rule): it
is pure stdlib (html.parser), has no library-version drift surface,
and MUST NOT change semantics once goldens are checked in. Tests pin
its output byte-for-byte against tests/fixtures/golden_pages.parquet.

Used inside ``map_batches(extract_batch, batch_format="pyarrow")`` —
Arrow in / Arrow out, html column dropped immediately after (wide
binary rows, SURVEY.md §7 watch-list).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

# Tags whose text content is never document text.
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})

# Reference parity: get_files.py:38-39 removes this exact sentence.
BOILERPLATE_SENTENCES = ("PDF to HTML - Convert PDF files to HTML files",)

_MULTI_NEWLINE = re.compile(r"\n{3,}")


class _TextExtractor(HTMLParser):
    """Collect text nodes verbatim, skipping script/style subtrees."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._chunks.append(data)

    def text(self) -> str:
        return "".join(self._chunks)


def decode_html(raw: bytes | str) -> str:
    """Bytes → str with utf-8 → latin-1 fallback (reference's encoding
    chaos, remove_duplicate_paragraphs.py:51-65, normalized at ingest)."""
    if isinstance(raw, str):
        return raw
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("iso-8859-1")


def clean_text(text: str) -> str:
    """Reference process_text (get_files.py:37-42)."""
    for sentence in BOILERPLATE_SENTENCES:
        text = text.replace(sentence, "")
    return _MULTI_NEWLINE.sub("\n\n", text)


def sniff_kind(payload: bytes | str) -> str:
    """Content sniff (S4 dispatch): '%PDF' magic → pdf, else html."""
    if isinstance(payload, bytes) and payload[:5] == b"%PDF-":
        return "pdf"
    return "html"


def extract_text_from_pdf(payload: bytes) -> str:
    """S4 PDF→text (reference get_files.py:23-35, PyPDF2 page loop).
    Pure-stdlib minimal extractor (zlib FlateDecode + BT/ET Tj/TJ
    scan, functions/pdf.py) — byte-deterministic, golden-pinned like
    the HTML oracle."""
    from knowledge_graph_ray.functions.pdf import extract_pdf_text

    return extract_pdf_text(payload)


def extract_text(html: bytes | str) -> str:
    """Frozen pure function: html bytes → cleaned text. Never raises on
    malformed markup (html.parser is forgiving by construction)."""
    parser = _TextExtractor()
    parser.feed(decode_html(html))
    parser.close()
    return clean_text(parser.text())


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, lang, ...) → docs(doc_id?, url, text,
    lang, n_chars, error). Per-row try/except quarantine — one poison
    page can't fail a block (get_files.py:87-99 pattern)."""
    htmls = batch.column("html").to_pylist()
    texts: list[str] = []
    errors: list[str | None] = []
    for raw in htmls:
        try:
            if raw is None:
                texts.append("")
            elif sniff_kind(raw) == "pdf":
                texts.append(clean_text(extract_text_from_pdf(raw)))
            else:
                texts.append(extract_text(raw))
            errors.append(None)
        except Exception as exc:  # quarantine, never raise (bad_files)
            texts.append("")
            errors.append(f"{type(exc).__name__}: {exc}")

    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for name in batch.column_names:
        if name in ("html",):  # drop the wide binary column immediately
            continue
        cols[name] = batch.column(name)
    cols["text"] = pa.array(texts, type=pa.large_string())
    cols["n_chars"] = pa.array([len(t) for t in texts], type=pa.int64())
    cols["error"] = pa.array(errors, type=pa.string())
    return pa.table(cols)
