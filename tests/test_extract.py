"""Byte-identical extraction invariant (north rule; SURVEY.md §5.2).

The frozen extractor is the fixture oracle: its output per url is
pinned byte-for-byte against tests/fixtures/golden_pages.parquet
(generated once by tests/fixtures/make_golden.py and checked in).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from knowledge_graph_ray.functions.extract import clean_text, extract_batch, extract_text
from knowledge_graph_ray.sources import synth

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden_pages.parquet")


def test_extract_basic():
    html = b"<html><head><title>T</title><style>x{}</style></head>\n<body>\n<p>Hello world.</p>\n<script>var x=1;</script>\n<p>Second para.</p>\n</body></html>"
    text = extract_text(html)
    assert "Hello world." in text
    assert "Second para." in text
    assert "var x" not in text
    assert "x{}" not in text
    assert "T" == text.split("\n")[0].strip()[:1] or "T" in text


def test_clean_text_collapses_newlines_and_boilerplate():
    raw = "a\n\n\n\n\nb PDF to HTML - Convert PDF files to HTML files c"
    assert clean_text(raw) == "a\n\nb  c"


def test_extract_malformed_never_raises():
    # unclosed tags, stray brackets, latin-1 bytes (FIXTURES.md §10)
    bad = b"<html><body><p>un<closed <b>bold \xe6\xf8\xe5</body>"
    text = extract_text(bad)
    assert isinstance(text, str)


def test_extract_entities_unescaped():
    assert "a & b" in extract_text(b"<p>a &amp; b</p>")


def test_golden_pages_byte_identical():
    """Per-url byte-identical invariant vs the checked-in golden."""
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixture not built yet")
    tbl = pq.read_table(GOLDEN)
    for url, html, golden_text in zip(
        tbl.column("url").to_pylist(),
        tbl.column("html").to_pylist(),
        tbl.column("text").to_pylist(),
    ):
        assert extract_text(html) == golden_text, f"extraction drift for {url}"


def test_extract_batch_drops_html_and_quarantines():
    tbl = synth.pages_table(8)
    out = extract_batch(tbl)
    assert "html" not in out.column_names
    assert out.column("error").null_count == 8
    # extracted text equals the golden text column the generator built
    assert out.column("text").to_pylist() == tbl.column("text").to_pylist()


def test_synth_deterministic_prefix():
    a = synth.pages_table(6)
    b = synth.pages_table(12)
    assert a.equals(b.slice(0, 6))
