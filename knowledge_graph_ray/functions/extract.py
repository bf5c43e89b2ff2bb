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


def _slow_extract_text(doc: str) -> str:
    """The original stdlib-HTMLParser path (reference semantics,
    get_files.py:19-21). Kept verbatim as the byte-identity oracle the
    fast scanner must match and falls back to."""
    parser = _TextExtractor()
    parser.feed(doc)
    parser.close()
    return parser.text()


class _Bail(Exception):
    """Fast scanner met a construct whose stdlib handling is hairy
    (raw-tag-as-data emission, EOF-truncated markup, marked sections):
    restart the document on the slow parser before emitting anything."""


# mirrors of html.parser 3.11 module regexes (same objects, so the
# fast scan can never drift from the stdlib's tokenization)
from html import parser as _hp  # noqa: E402
from html import unescape as _unescape  # noqa: E402

_LOCATE_START = getattr(_hp, "locatestarttagend_tolerant", None)
_TAGFIND = getattr(_hp, "tagfind_tolerant", None)
_ATTRFIND = getattr(_hp, "attrfind_tolerant", None)
_ENDTAGFIND = getattr(_hp, "endtagfind", None)
_COMMENT_CLOSE = re.compile(r"--\s*>")
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in ("script", "style")
}
_ASCII_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_HAVE_FAST = all((_LOCATE_START, _TAGFIND, _ATTRFIND, _ENDTAGFIND))


def _fast_extract(doc: str) -> str:
    """Single-pass text extraction, bit-identical to ``_TextExtractor``
    over one ``feed`` + ``close`` (fuzz- and golden-gated). It reuses
    html.parser's OWN tolerant regexes for tag boundaries and raises
    ``_Bail`` on every construct whose stdlib handling is not mirrored
    exactly (truncated markup, bogus start tags, marked sections) —
    the caller then reruns the document through the real parser. The
    win is skipping the parser's per-token callback/bookkeeping
    machinery (goahead/updatepos/handle_*), ~3-4× on markup-dense
    pages."""
    if "\x00" in doc:
        raise _Bail
    out: list[str] = []
    emit = out.append
    skip_depth = 0
    cdata: str | None = None
    i = 0
    n = len(doc)
    find = doc.find
    startswith = doc.startswith
    while i < n:
        if cdata is not None:
            # html.parser drops unterminated CDATA content at close()
            m = _CDATA_CLOSE[cdata].search(doc, i)
            if m is None:
                return "".join(out)
            # content skipped (script/style are _SKIP_TAGS); the close
            # tag both matches endtagfind and ends at the first '>'
            if skip_depth > 0:
                skip_depth -= 1
            i = m.end()
            cdata = None
            continue
        j = find("<", i)
        if j < 0:
            j = n
        if j > i and skip_depth == 0:
            emit(_unescape(doc[i:j]))
        i = j
        if i >= n:
            break
        c = doc[i + 1] if i + 1 < n else ""
        if c in _ASCII_LETTERS:
            m = _LOCATE_START.match(doc, i)
            j = m.end()
            nxt = doc[j : j + 1]
            if nxt == ">":
                endpos = j + 1
            elif nxt == "/" and startswith("/>", j):
                endpos = j + 2
            else:
                raise _Bail  # truncated/bogus start tag
            tm = _TAGFIND.match(doc, i + 1)
            tag = tm.group(1).lower()
            k = tm.end()
            while k < endpos:
                am = _ATTRFIND.match(doc, k)
                if am is None:
                    break
                k = am.end()
            end = doc[k:endpos].strip()
            if end == ">":
                if tag in _SKIP_TAGS:
                    skip_depth += 1
                if tag in ("script", "style"):
                    cdata = tag
            elif end == "/>":
                pass  # startendtag: +1/-1 on skip tags nets to zero
            else:
                raise _Bail  # parser would emit the raw tag as data
            i = endpos
        elif c == "/":
            gt = find(">", i + 1)
            if gt < 0:
                raise _Bail  # truncated end tag at EOF
            em = _ENDTAGFIND.match(doc, i)
            if em is not None:
                tag = em.group(1).lower()
                if tag in _SKIP_TAGS and skip_depth > 0:
                    skip_depth -= 1
                i = em.end()
                continue
            nm = _TAGFIND.match(doc, i + 2)
            if nm is None:
                if startswith("</>", i):
                    i += 3
                    continue
                # bogus comment: consumed to the first '>', not data
                i = gt + 1
                continue
            tag = nm.group(1).lower()
            gt2 = find(">", nm.end())
            if gt2 < 0:
                raise _Bail
            if tag in _SKIP_TAGS and skip_depth > 0:
                skip_depth -= 1
            i = gt2 + 1
        elif startswith("<!--", i):
            m = _COMMENT_CLOSE.search(doc, i + 4)
            if m is None:
                raise _Bail  # unterminated comment at EOF
            i = m.end()
        elif c == "?":
            gt = find(">", i + 2)
            if gt < 0:
                raise _Bail
            i = gt + 1
        elif c == "!":
            if startswith("<![", i):
                raise _Bail  # marked section (stdlib path is complex)
            if doc[i : i + 9].lower() == "<!doctype":
                gt = find(">", i + 9)
            else:  # bogus comment
                gt = find(">", i + 2)
            if gt < 0:
                raise _Bail
            i = gt + 1
        else:
            # lone '<' (incl. at EOF): the parser emits it as data
            if skip_depth == 0:
                emit("<")
            i += 1
    return "".join(out)


def extract_text(html: bytes | str) -> str:
    """Frozen pure function: html bytes → cleaned text. Never raises on
    malformed markup (html.parser is forgiving by construction). The
    fast single-pass scanner handles the common shapes and falls back
    to the stdlib parser on anything exotic — outputs are
    byte-identical either way (golden- and fuzz-pinned)."""
    doc = decode_html(html)
    if _HAVE_FAST:
        try:
            return clean_text(_fast_extract(doc))
        except _Bail:
            pass
    return clean_text(_slow_extract_text(doc))


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
