"""S4 PDF extraction: byte-identical goldens for the stdlib extractor
(functions/pdf.py) over synthesized PDFs (sources.synth.make_pdf) —
same frozen-oracle discipline as the HTML path (reference analog:
get_files.py:23-35 PyPDF2 loop)."""

from __future__ import annotations

import pyarrow as pa

from knowledge_graph_ray.functions.extract import extract_batch, sniff_kind
from knowledge_graph_ray.functions.pdf import extract_pdf_text
from knowledge_graph_ray.sources.synth import (
    make_pdf,
    make_pdf_tounicode,
    pdf_pages_table,
)


def test_roundtrip_compressed_and_stored():
    lines = ["Hello (world)", "Line \\two", "æøå latin-1", "tab\tkeeps"]
    for compress in (True, False):
        assert extract_pdf_text(make_pdf(lines, compress=compress)) == "\n".join(lines)


def test_sniff_dispatch_and_quarantine():
    pdf = make_pdf(["a line"])
    assert sniff_kind(pdf) == "pdf"
    batch = pa.table(
        {
            "url": ["a.pdf", "b.pdf", "c.html"],
            "html": pa.array(
                [pdf, b"%PDF-1.4 truncated garbage", b"<p>hi</p>"], pa.binary()
            ),
        }
    )
    out = extract_batch(batch)
    texts = out.column("text").to_pylist()
    errors = out.column("error").to_pylist()
    assert texts[0] == "a line"
    assert texts[1] == ""  # unreadable → empty, never raises
    assert texts[2] == "hi"
    assert errors == [None, None, None]


def test_tj_array_and_hex_strings():
    # hand-built content stream exercising TJ arrays with kern numbers
    # and hex strings — operators the synthesizer doesn't emit
    content = b"BT [(Hel) -20 (lo)] TJ\n(world) Tj\n<414243> Tj ET"
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(raw) == "Hello\nworld\nABC"


def test_pdf_pages_golden():
    tbl = pdf_pages_table(3)
    out = extract_batch(tbl)
    texts = out.column("text").to_pylist()
    # golden: first line of page 0 is its title, pinned byte-for-byte
    assert texts[0].startswith("Page 0\nThe quarterly report was published")
    assert all(t for t in texts)
    assert out.column("error").to_pylist() == [None] * 3


def test_octal_escapes():
    body = b"BT (\\110i\\051) Tj ET"  # \110 = 'H', \051 = ')'
    raw = (
        b"%PDF-1.0\n1 0 obj\n<< >>\nstream\n" + body + b"\nendstream\nendobj"
    )
    assert extract_pdf_text(raw) == "Hi)"


def test_asciihex_and_ascii85_filters():
    lines = ["Hex encoded body", "æøå roundtrips"]
    for chain in (
        ["ASCIIHexDecode"],
        ["ASCII85Decode"],
        ["ASCIIHexDecode", "FlateDecode"],
        ["ASCII85Decode", "FlateDecode"],
    ):
        pdf = make_pdf(lines, filters=chain)
        assert extract_pdf_text(pdf) == "\n".join(lines), chain


def test_unknown_filter_quarantines_stream_only():
    good = make_pdf(["kept page"])
    # append an LZW-tagged stream: its garbage must not leak into output
    bad = (
        b"\n7 0 obj\n<< /Length 8 /Filter /LZWDecode >>\nstream\n"
        b"BT bogus\nendstream\nendobj\n"
    )
    assert extract_pdf_text(good + bad) == "kept page"


def test_tounicode_cmap_simple_font():
    lines = ["Hello world", "ToUnicode mapped ÆØÅ"]
    pdf = make_pdf_tounicode(lines)
    # codes start at 0x0100, so a latin-1 fallback could never produce
    # the expected text — only the cmap path can
    assert extract_pdf_text(pdf) == "\n".join(lines)


def test_tf_switches_cmap_within_block():
    import zlib

    # two fonts in one BT block: F1 has a cmap (A->Z, B->Y), F2 does not
    cmap = (
        b"begincodespacerange <00> <FF> endcodespacerange\n"
        b"2 beginbfchar\n<41> <005A>\n<42> <0059>\nendbfchar"
    )
    content = b"BT /F1 10 Tf <4142> Tj /F2 10 Tf <4142> Tj ET"
    cz = zlib.compress(cmap)
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Page /Resources << /Font << /F1 2 0 R /F2 4 0 R >> >> "
        b"/Contents 3 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Font /ToUnicode 5 0 R >>\nendobj\n"
        b"3 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Type /Font /Subtype /Type1 >>\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(cz)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + cz + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(raw) == "ZY\nAB"


def test_bfrange_forms():
    from knowledge_graph_ray.functions.pdf import _parse_cmap

    data = (
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfrange\n<0041> <0043> <0061>\nendbfrange\n"
        b"1 beginbfrange\n<0100> <0101> [<0058> <0059>]\nendbfrange"
    )
    width, mapping = _parse_cmap(data)
    assert width == 2
    assert [mapping[c] for c in (0x41, 0x42, 0x43)] == ["a", "b", "c"]
    assert mapping[0x100] == "X" and mapping[0x101] == "Y"


def test_multipage_font_name_collision():
    """Two pages both call their font /F1: page 1 plain Type1 text,
    page 2 a ToUnicode-mapped font. A flat font map applied page 2's
    CMap to page 1 and silently dropped its text (code-review r5)."""
    import zlib

    cmap = (
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfchar\n<0041> <0058>\nendbfchar"
    )
    cz = zlib.compress(cmap)
    c1 = b"BT /F1 10 Tf (Hello) Tj ET"
    c2 = b"BT /F1 10 Tf <0041> Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Page /Resources << /Font << /F1 5 0 R >> >> "
        b"/Contents 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(c1)).encode() + b" >>\nstream\n"
        + c1 + b"\nendstream\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Resources << /Font << /F1 6 0 R >> >> "
        b"/Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(c2)).encode() + b" >>\nstream\n"
        + c2 + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 >>\nendobj\n"
        b"6 0 obj\n<< /Type /Font /ToUnicode 7 0 R >>\nendobj\n"
        b"7 0 obj\n<< /Length " + str(len(cz)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + cz + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == "Hello\nX"


def test_bfrange_surrogate_base_sanitized():
    """A hostile bfrange base in the surrogate range must map to
    U+FFFD — a lone surrogate in the output crashes Arrow string
    builders downstream (never-raises contract)."""
    from knowledge_graph_ray.functions.pdf import _parse_cmap

    data = b"1 beginbfrange\n<41> <42> <D7FF>\nendbfrange"
    width, mapping = _parse_cmap(data)
    assert mapping[0x41] == "퟿"  # last valid BMP cp before surrogates
    assert mapping[0x42] == "�"       # D800 -> replacement, not chr(0xD800)
    # and the string is Arrow-encodable
    import pyarrow as pa

    pa.array([mapping[0x42]])
