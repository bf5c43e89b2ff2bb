"""S4 PDF extraction: byte-identical goldens for the stdlib extractor
(functions/pdf.py) over synthesized PDFs (sources.synth.make_pdf) —
same frozen-oracle discipline as the HTML path (reference analog:
get_files.py:23-35 PyPDF2 loop)."""

from __future__ import annotations

import pyarrow as pa

from knowledge_graph_ray.functions.extract import extract_batch, sniff_kind
from knowledge_graph_ray.functions.pdf import extract_pdf_text
from knowledge_graph_ray.sources.synth import make_pdf, pdf_pages_table


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
