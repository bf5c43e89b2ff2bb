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


def test_fast_scanner_matches_stdlib_parser_fuzz():
    """The fast single-pass scanner must be byte-identical to the
    stdlib-HTMLParser oracle on everything it does NOT bail on —
    adversarial construct soup (quoted '>', CDATA fakes, bogus
    comments, truncated markup, charrefs with/without semicolons)."""
    import random

    from knowledge_graph_ray.functions import extract as E

    pieces = [
        "<p>", "</p>", "<a href=\"x>y\">", "<a href='q'>", "text & more",
        "&amp;", "&lt;x", "&#65;", "&#x41;", "&unknown;", "&", "<", ">",
        "<script>var a = '</scr'+'ipt>';</script>", "<script>x<y</script>",
        "<style>a>b{}</style>", "<!-- c -- >", "<!-- nope", "<!doctype html>",
        "<![CDATA[z]]>", "<?pi>", "</>", "</ p>", "</p class>", "<b/>",
        "<br />", "<3", "< a>", "<a b=c>", "<a b='unterminated>", "<a =x>",
        "<noscript>hide</noscript>", "<template>t</template>",
        "<SCRIPT>S</SCRIPT>", "</sCrIpT>", "<a\tb\nc>", "plain ",
        "æøå üñ", "<p", "a<b>c", "&gt", "&#xZZ;", "&#999999999;",
        "<script>", "</script>", "<!x>", "<!", "<a 'q'>", '<a "q">',
        "<div class=>", "<e f==g>", "<h i= >", "\x00", "<a/ b>",
    ]
    rng = random.Random(1234)
    checked = 0
    for _ in range(1500):
        doc = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 12)))
        try:
            fast = E._fast_extract(doc)
        except E._Bail:
            continue  # bail -> slow path runs -> identical by construction
        checked += 1
        assert fast == E._slow_extract_text(doc), repr(doc)
    assert checked > 500  # the fast path must actually cover most docs


def test_fast_scanner_covers_synth_corpus():
    """Every synthetic page takes the fast path and matches the oracle."""
    from knowledge_graph_ray.functions import extract as E
    from knowledge_graph_ray.sources import synth

    for h in synth.pages_table(300).column("html").to_pylist():
        doc = E.decode_html(h)
        assert E._fast_extract(doc) == E._slow_extract_text(doc)


def test_fast_scanner_nasty_edges():
    """Table-driven corner constructs (charref boundary behavior,
    CDATA end-tag whitespace, self-closing forms, bogus doctypes)."""
    from knowledge_graph_ray.functions import extract as E

    cases = [
        "<É>x</É>", "<<b>y</b>", "a &#0; b", "&#x10FFFF;", "&#xD800;",
        "a&#x41", "<p>&notin;</p>", "<p>&not;</p>", "<p>&notit;</p>",
        "&amp", "&ampx", "<script>a</script >b", "<script>a</ScRiPt\t>b",
        "<style>x</style\n>y", "<a b='c'd>t", "<a b=\"c\" 'd'>t", "<p/>x",
        "<p / >x", "<br/>t", "<!doctypex>t", "<!DOCTYPE html>t", "< /p>t",
        "</ >t", "</->t", "x<!-->y", "x<!--->y", "x<!---->y", "<script>",
        "text<", "text<x", "<p>a</p junk>b", "<a href=x>L</a>",
        "<a href=>M</a>", "<td nowrap>N",
    ]
    for doc in cases:
        try:
            fast = E._fast_extract(doc)
        except E._Bail:
            continue
        assert fast == E._slow_extract_text(doc), repr(doc)
