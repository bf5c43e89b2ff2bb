"""WARC source/sink: record framing, gzip-multistream streaming,
quarantine-on-corruption laws, Ray round trip, flagship compatibility."""

from __future__ import annotations

import datetime as dt
import gzip

import pyarrow as pa
import pytest

from knowledge_graph_ray.sources import synth
from knowledge_graph_ray.sources.warc import (
    iter_warc_records,
    read_warc,
    warc_record,
    write_warc,
)

TS = dt.datetime(2026, 1, 2, 3, 4, 5)


def _shard(pages: pa.Table, *, gzip_member: bool) -> bytes:
    return b"".join(
        warc_record(u, t, h, gzip_member=gzip_member)
        for u, t, h in zip(
            pages.column("url").to_pylist(),
            pages.column("warc_ts").to_pylist(),
            pages.column("html").to_pylist(),
        )
    )


@pytest.mark.parametrize("gz", [True, False])
def test_record_round_trip(gz):
    pages = synth.pages_table(25)
    recs = list(iter_warc_records(_shard(pages, gzip_member=gz)))
    assert len(recs) == 25
    assert [r["url"] for r in recs] == pages.column("url").to_pylist()
    assert [r["html"] for r in recs] == pages.column("html").to_pylist()
    # WARC-Date is second-resolution; µs truncate is expected
    assert [r["warc_ts"] for r in recs] == [
        t.replace(microsecond=0) for t in pages.column("warc_ts").to_pylist()
    ]


def test_non_page_records_skipped():
    info = warc_record("", TS, b"software: test", record_type="warcinfo")
    req = warc_record("http://x/", TS, b"GET / HTTP/1.1\r\n\r\n", record_type="request")
    page = warc_record("http://x/", TS, b"<html>hi</html>")
    recs = list(iter_warc_records(info + req + page))
    assert [r["url"] for r in recs] == ["http://x/"]
    assert recs[0]["html"] == b"<html>hi</html>"


def test_html_only_content_type_and_status_filters():
    png = (
        b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\nContent-Length: 3\r\n\r\nabc"
    )
    redirect = (
        b"HTTP/1.1 301 Moved\r\nContent-Type: text/html\r\nContent-Length: 2\r\n\r\nhi"
    )
    raws = []
    for url, payload in [("http://png/", png), ("http://moved/", redirect)]:
        head = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        )
        raws.append(gzip.compress(head + payload + b"\r\n\r\n"))
    raws.append(warc_record("http://ok/", TS, b"<p>ok</p>"))
    recs = list(iter_warc_records(b"".join(raws)))
    assert [r["url"] for r in recs] == ["http://ok/"]
    # html_only=False keeps the 200 non-html payload but not the 301
    recs = list(iter_warc_records(b"".join(raws), html_only=False))
    assert [r["url"] for r in recs] == ["http://png/", "http://ok/"]


def test_corrupt_member_quarantines_only_itself():
    pages = synth.pages_table(10)
    good = _shard(pages, gzip_member=True)
    bad = b"\x1f\x8b\x08\x00garbage-not-a-valid-member"
    recs = list(iter_warc_records(good + bad))
    assert len(recs) == 10
    # corruption mid-stream: the stream RESYNCS at the next gzip magic
    # and every record after the poison member still decodes
    half = _shard(pages.slice(0, 5), gzip_member=True)
    recs = list(iter_warc_records(half + bad + _shard(pages.slice(5), gzip_member=True)))
    assert len(recs) == 10
    assert [r["url"] for r in recs] == pages.column("url").to_pylist()
    # a bad member whose garbage contains a FALSE magic: resync retries
    bad2 = b"\x1f\x8b\x08\x00junk\x1f\x8bmorejunk"
    recs = list(
        iter_warc_records(half + bad2 + _shard(pages.slice(5), gzip_member=True))
    )
    assert len(recs) == 10


def test_truncated_plain_record_yields_prefix():
    pages = synth.pages_table(4)
    raw = _shard(pages, gzip_member=False)
    recs = list(iter_warc_records(raw[: len(raw) - 40]))
    assert 1 <= len(recs) <= 3
    assert [r["url"] for r in recs] == pages.column("url").to_pylist()[: len(recs)]


def test_read_warc_ray_round_trip(ray_session, tmp_path):
    pages = synth.pages_dataset(60, override_num_blocks=4)
    manifest = write_warc(pages, str(tmp_path / "shards"))
    assert sum(m["n_records"] for m in manifest) == 60
    assert len(manifest) >= 2  # one shard per block

    ds = read_warc([m["path"] for m in manifest], chunk_rows=16)
    got = ds.take_all()
    want = synth.pages_table(60)
    assert sorted(r["url"] for r in got) == sorted(want.column("url").to_pylist())
    by_url = {r["url"]: r["html"] for r in got}
    for u, h in zip(want.column("url").to_pylist(), want.column("html").to_pylist()):
        assert by_url[u] == h
    # chunk_rows bounds block size independent of shard size
    assert read_warc([m["path"] for m in manifest], chunk_rows=16).materialize().num_blocks() >= 4


def test_read_warc_feeds_flagship_extract(ray_session, tmp_path):
    """Schema compatibility: the WARC pages run the flagship spine
    unchanged and extract the same text the synthetic corpus does."""
    from knowledge_graph_ray.pipelines.kg import extract_and_segment

    pages = synth.pages_dataset(30, override_num_blocks=2)
    manifest = write_warc(pages, str(tmp_path / "shards"))
    paras_warc = extract_and_segment(read_warc([m["path"] for m in manifest]))
    paras_synth = extract_and_segment(synth.pages_dataset(30))
    a = sorted([(r["url"], r.get("text")) for r in paras_warc.take_all()])
    b = sorted([(r["url"], r.get("text")) for r in paras_synth.take_all()])
    assert a == b


def test_mid_member_corruption_resyncs_at_next_member():
    """ADVICE r4: a gzip member corrupted MID-stream inflates partial
    record bytes before zlib errors; those bytes must not poison the
    framing — every record in a later member still decodes."""
    pages = synth.pages_table(10)
    urls = pages.column("url").to_pylist()
    members = [
        warc_record(u, t, h, gzip_member=True)
        for u, t, h in zip(
            urls,
            pages.column("warc_ts").to_pylist(),
            pages.column("html").to_pylist(),
        )
    ]
    poison = bytearray(members[4])
    # flip bytes past the gzip header, inside the deflate stream, so
    # some prefix typically inflates before the error/CRC failure
    for off in range(len(poison) // 2, min(len(poison) // 2 + 16, len(poison))):
        poison[off] ^= 0xFF
    stream = b"".join(members[:4]) + bytes(poison) + b"".join(members[5:])
    got = [r["url"] for r in iter_warc_records(stream)]
    # all nine good records survive, in order; the poison record may
    # only appear if its corruption missed the payload bytes entirely
    assert [u for u in got if u != urls[4]] == urls[:4] + urls[5:]


def test_mid_member_corruption_partial_payload_bytes():
    """Deterministic partial-output construction: a member holding a
    truncated record prefix (valid deflate, valid CRC, but cut mid-
    payload) — framing breaks exactly as in the mid-stream case and
    the parser must resync at the next member."""
    pages = synth.pages_table(6)
    urls = pages.column("url").to_pylist()
    members = [
        warc_record(u, t, h, gzip_member=True)
        for u, t, h in zip(
            urls,
            pages.column("warc_ts").to_pylist(),
            pages.column("html").to_pylist(),
        )
    ]
    full = warc_record(urls[2], TS, b"<html>" + b"x" * 500 + b"</html>", gzip_member=False)
    truncated = gzip.compress(full[: len(full) // 2])  # header + partial payload
    stream = b"".join(members[:2]) + truncated + b"".join(members[3:])
    got = [r["url"] for r in iter_warc_records(stream)]
    assert got == urls[:2] + urls[3:]


def test_negative_content_length_quarantined():
    """ADVICE r4: Content-Length: -5 parses as int; it must be treated
    as framing loss (resync), never as a negative buffer slice."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad/\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Length: -5\r\n\r\n"
    )
    good = warc_record("http://ok/", TS, b"<p>ok</p>", gzip_member=True)
    # gzip layout: resync recovers the next member
    recs = list(iter_warc_records(gzip.compress(bad) + good))
    assert [r["url"] for r in recs] == ["http://ok/"]
    # plain layout: no later member boundary exists — clean stop, no mangling
    recs = list(iter_warc_records(bad + warc_record("http://ok/", TS, b"<p>ok</p>", gzip_member=False)))
    assert recs == []
