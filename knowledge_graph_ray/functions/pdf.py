"""Minimal pure-stdlib PDF text extraction (SURVEY.md S4).

Reference behavior: ``src/data/get_files.py:23-35`` loops PyPDF2
pages and concatenates ``extractText()`` output. No PDF library ships
in this container, so this is a clean-room minimal extractor with the
same contract (PDF bytes → text, never raises on garbage — callers
quarantine): it

1. finds every ``stream ... endstream`` object,
2. decodes the stream's ``/Filter`` chain — ``/FlateDecode`` (zlib),
   ``/ASCIIHexDecode``, ``/ASCII85Decode``, arrays applied in order;
   unknown filters quarantine the stream (skipped, never raises),
3. scans content streams for text blocks (``BT``/``ET``) in document
   order, collecting font selects (``Tf``) and the show-text operators
   ``Tj``, ``'``, ``"`` and ``TJ`` (array form, kern numbers ignored),
   decoding PDF literal strings (``\\(``-escapes, octal) and hex
   strings,
4. when the active font carries a simple ``/ToUnicode`` CMap
   (``bfchar``/``bfrange``, resolved through the object table and the
   page ``/Resources /Font`` dicts), maps show-string char codes
   through it; fonts without a CMap fall back to PDFDocEncoding
   (≈ latin-1), same as before.

Line structure: each show-text op contributes one line within its
``BT`` block; blocks are joined with newlines (one block per
synthesized page — see sources.synth.make_pdf, whose output is the
pinned golden for this extractor).

The output is byte-deterministic for a given input — tests pin it
exactly, same discipline as the HTML oracle (functions/extract.py).
"""

from __future__ import annotations

import base64
import binascii
import re
import zlib

_STREAM_RE = re.compile(rb"(<<.*?>>)\s*stream\r?\n(.*?)endstream", re.DOTALL)
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>")
# one pass over a BT block in document order: font select | TJ array |
# single-string show op (Tj ' ")
_TOKEN_RE = re.compile(
    rb"/([A-Za-z0-9.+-]+)\s+[0-9.+-]+\s+Tf"
    rb"|\[((?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]])*)\]\s*TJ"
    rb"|(\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>)\s*(Tj|'|\")"
)
_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")

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


def _string_bytes(tok: bytes) -> bytes:
    if tok.startswith(b"("):
        return _decode_literal(tok[1:-1])
    hx = re.sub(rb"\s", b"", tok[1:-1])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _decode_string(tok: bytes, cmap: "tuple[int, dict[int, str]] | None") -> str:
    data = _string_bytes(tok)
    if cmap is None:
        # PDFDocEncoding ≈ latin-1 for the printable range
        return data.decode("latin-1")
    width, mapping = cmap
    out: list[str] = []
    for i in range(0, len(data) - width + 1, width):
        code = int.from_bytes(data[i : i + width], "big")
        mapped = mapping.get(code)
        if mapped is None:  # unmapped simple-font code: byte fallback
            mapped = chr(code) if code < 256 else ""
        out.append(mapped)
    return "".join(out)


def _block_text(block: bytes, cmaps: dict[str, tuple[int, dict[int, str]]]) -> str:
    """One BT..ET block → its show-text lines, scanned in document
    order (Tf font selects switch the active ToUnicode map)."""
    lines: list[str] = []
    active: tuple[int, dict[int, str]] | None = None
    for m in _TOKEN_RE.finditer(block):
        if m.group(1) is not None:  # /F1 12 Tf
            active = cmaps.get(m.group(1).decode("latin-1", "replace"))
            continue
        if m.group(2) is not None:  # [ ... ] TJ
            text = "".join(
                _decode_string(s.group(0), active)
                for s in _STR_RE.finditer(m.group(2))
            )
        else:  # (s) Tj / ' / "
            text = _decode_string(m.group(3), active)
        if text:
            lines.append(text)
    return "\n".join(lines)


# ------------------------------------------------------------ filters

def _flate(body: bytes) -> bytes | None:
    try:
        return zlib.decompress(body)
    except zlib.error:
        try:  # some writers pad the stream; try raw deflate
            return zlib.decompressobj().decompress(body)
        except zlib.error:
            return None


def _ascii_hex(body: bytes) -> bytes | None:
    data = body.split(b">", 1)[0]  # '>' is the EOD marker
    hx = re.sub(rb"\s", b"", data)
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except (ValueError, UnicodeDecodeError):
        return None


def _ascii85(body: bytes) -> bytes | None:
    data = re.sub(rb"\s", b"", body)
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end != -1:
        data = data[:end]
    try:
        return base64.a85decode(data)
    except (ValueError, binascii.Error):
        return None


_FILTERS = {
    b"FlateDecode": _flate,
    b"Fl": _flate,
    b"ASCIIHexDecode": _ascii_hex,
    b"AHx": _ascii_hex,
    b"ASCII85Decode": _ascii85,
    b"A85": _ascii85,
}


def _decode_stream(stream_dict: bytes, body: bytes) -> bytes | None:
    """Apply the /Filter chain (None = quarantine this stream)."""
    m = _FILTER_RE.search(stream_dict)
    if not m:
        # no /Filter (or one we couldn't parse): stored stream
        return None if b"/Filter" in stream_dict else body
    data: bytes | None = body
    for name in _NAME_RE.findall(m.group(1)):
        fn = _FILTERS.get(name)
        if fn is None or data is None:  # LZW/DCT/...: quarantine
            return None
        data = fn(data)
    return data


# ------------------------------------------------- ToUnicode CMaps

def _utf16be(hx: bytes) -> str:
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be", "replace")
    except (ValueError, UnicodeDecodeError):
        return ""


def _parse_cmap(data: bytes) -> tuple[int, dict[int, str]] | None:
    """ToUnicode CMap bytes → (code width, code→str)."""
    mapping: dict[int, str] = {}
    width = 1
    m = re.search(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", data)
    if m:
        width = max(1, len(m.group(1)) // 2)
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.DOTALL):
        for e in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", sec.group(1)
        ):
            mapping[int(e.group(1), 16)] = _utf16be(e.group(2))
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.DOTALL):
        for e in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(<[0-9A-Fa-f]+>|\[[^\]]*\])",
            sec.group(1),
        ):
            lo, hi = int(e.group(1), 16), int(e.group(2), 16)
            hi = min(hi, lo + 4095)  # bound hostile ranges
            dst = e.group(3)
            if dst.startswith(b"["):
                vals = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for i, v in enumerate(vals):
                    if lo + i > hi:
                        break
                    mapping[lo + i] = _utf16be(v)
            else:
                base = int(dst[1:-1], 16)
                for c in range(lo, hi + 1):
                    cp = base + (c - lo)
                    # lone surrogates are not encodable (Arrow string
                    # builders raise) — a hostile/garbage base must
                    # degrade to U+FFFD, same as _utf16be's 'replace'
                    if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                        mapping[c] = "�"
                    else:
                        mapping[c] = chr(cp)
    return (width, mapping) if mapping else None


def _font_cmaps(payload: bytes) -> dict[str, tuple[int, dict[int, str]]]:
    """Flat resource-name → CMap map (all pages merged, last wins) —
    the fallback when a content stream cannot be tied to a page."""
    return _page_font_cmaps(payload)[1]


def _page_font_cmaps(
    payload: bytes,
) -> tuple[dict[int, dict[str, tuple[int, dict[int, str]]]], dict]:
    """(content-object-number → font name → CMap, merged fallback map),
    by walking ``N G obj`` bodies textually: font objects carrying
    ``/ToUnicode M 0 R``, page objects carrying ``/Contents`` refs and
    ``/Font << /Fx N 0 R >>`` resource dicts (inline or via
    ``/Resources M 0 R``). Page scoping matters: every page reuses the
    same local names (``/F1``), so one global map applied the LAST
    page's CMap to every page (no xref needed — same clean-room
    minimalism as the extractor)."""
    objs = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)}
    font_tu: dict[int, int] = {}
    for num, body in objs.items():
        tu = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body)
        if tu:
            font_tu[num] = int(tu.group(1))

    cmap_cache: dict[int, tuple[int, dict[int, str]] | None] = {}

    def cmap_of(fobj: int):
        if fobj in cmap_cache:
            return cmap_cache[fobj]
        out = None
        tu_obj = font_tu.get(fobj)
        if tu_obj is not None and tu_obj in objs:
            sm = _STREAM_RE.search(objs[tu_obj])
            if sm:
                data = _decode_stream(sm.group(1), sm.group(2))
                if data is not None:
                    out = _parse_cmap(data)
        cmap_cache[fobj] = out
        return out

    def fonts_in(body: bytes) -> dict[str, int]:
        fm = re.search(rb"/Font\s*<<(.*?)>>", body, re.DOTALL)
        if not fm:
            return {}
        return {
            nm.group(1).decode("latin-1"): int(nm.group(2))
            for nm in re.finditer(
                rb"/([A-Za-z0-9.+-]+)\s+(\d+)\s+\d+\s+R", fm.group(1)
            )
        }

    scoped: dict[int, dict[str, tuple[int, dict[int, str]]]] = {}
    merged: dict[str, tuple[int, dict[int, str]]] = {}
    for num, body in objs.items():
        name_to_obj = fonts_in(body)
        if not name_to_obj:
            rm = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", body)
            if rm and int(rm.group(1)) in objs:
                name_to_obj = fonts_in(objs[int(rm.group(1))])
        if not name_to_obj:
            continue
        fmap = {}
        for name, fobj in name_to_obj.items():
            cm = cmap_of(fobj)
            if cm:
                fmap[name] = cm
        merged.update(fmap)
        # register the scope even when fmap is EMPTY: this page's fonts
        # are known to have no CMaps, so its content must decode
        # literally — falling back to `merged` here would re-create the
        # cross-page collision for plain-font pages
        # tie the page's font map to its content stream object(s)
        refs: list[int] = []
        cm1 = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        if cm1:
            refs.append(int(cm1.group(1)))
        carr = re.search(rb"/Contents\s*\[(.*?)\]", body, re.DOTALL)
        if carr:
            refs.extend(
                int(r.group(1))
                for r in re.finditer(rb"(\d+)\s+\d+\s+R", carr.group(1))
            )
        for ref in refs:
            scoped.setdefault(ref, {}).update(fmap)
    return scoped, merged


def extract_pdf_text(payload: bytes) -> str:
    """PDF bytes → text (all pages' text blocks, newline-joined).
    Never raises on malformed input — returns whatever it could read
    (callers quarantine empty output upstream if needed)."""
    if not isinstance(payload, (bytes, bytearray)):
        raise TypeError("extract_pdf_text expects bytes")
    payload = bytes(payload)
    try:
        scoped, merged = _page_font_cmaps(payload)
    except Exception:
        scoped, merged = {}, {}

    def stream_text(content: bytes, cmaps) -> str | None:
        if content is None or b"BT" not in content:
            return None
        if b"begincmap" in content or b"beginbfchar" in content:
            return None  # a CMap stream, not page content
        blocks = [_block_text(b, cmaps) for b in _TEXT_BLOCK_RE.findall(content)]
        return "\n".join(b for b in blocks if b)

    # object walk first: a content stream inside `N 0 obj` uses ITS
    # page's font map (every page names its fonts /F1, /F2, ... — a
    # flat map silently decoded all pages through the last page's CMap)
    pages: list[str] = []
    for om in _OBJ_RE.finditer(payload):
        sm = _STREAM_RE.search(om.group(2))
        if not sm:
            continue
        text = stream_text(
            _decode_stream(sm.group(1), sm.group(2)),
            scoped.get(int(om.group(1)), merged),
        )
        if text:
            pages.append(text)
    if pages:
        return "\n".join(pages)
    # fallback for malformed files whose streams sit outside parseable
    # objects: the old whole-payload scan with the merged font map
    for m in _STREAM_RE.finditer(payload):
        text = stream_text(_decode_stream(m.group(1), m.group(2)), merged)
        if text:
            pages.append(text)
    return "\n".join(pages)
