"""WARC (ISO 28500) ingest/egress for web-archive corpora.

The reference fetches raw pages over HTTP one file at a time
(src/data/get_files.py:45-103) and snapshots them to disk; at
Common-Crawl scale the same pages arrive as WARC shards — one
~1 GB ``.warc.gz`` per crawl shard, each record an individual gzip
member. Ray-Data-first design: the FILE is the unit of parallelism
(``read_binary_files`` → one parse task per shard, 90k shards per
crawl saturate any cluster); inside a task records stream
member-by-member through ``zlib.decompressobj`` (a shard never
materializes decompressed) and pages leave as bounded pyarrow chunks
(generator UDF), so output block size is independent of shard size.
The emitted ``html`` column is the UNDECODED payload bytes — charset
sniffing stays in the frozen extract stage (functions/extract.py),
which already accepts bytes.

Malformed input follows the quarantine law (get_files.py:87-99): a
corrupt gzip member or a record with a bad length is skipped and
parsing resumes at the next member boundary; one poison record never
fails a shard, and a truncated shard yields its complete prefix.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
import zlib
from collections.abc import Iterator

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"
_WARC_TS = "%Y-%m-%dT%H:%M:%SZ"


# --------------------------------------------------------------------------
# record-level parsing (pure functions; no Ray)
# --------------------------------------------------------------------------


def _iter_decompressed(chunks: Iterator[bytes]) -> Iterator[tuple[bool, bytes]]:
    """Streaming multistream-gzip inflate: compressed chunks in (any
    sizes — file-read buffers), ``(member_start, bytes)`` out — the
    flag is True on the FIRST output chunk of each gzip member, so the
    record parser downstream can resync framing at a member boundary
    after a poison member inflated partial bytes. Member boundaries
    are carried across input chunks by one ``decompressobj`` at a
    time; plain (non-gzip) input passes through as a single "member".

    A corrupt member quarantines ONLY itself: the stream resyncs at
    the next gzip magic (``1f 8b``, carried across chunk boundaries)
    and later members still decode — one poison record never drops the
    rest of a shard. A false magic inside corrupt bytes just fails
    again and resyncs further (each attempt advances ≥1 byte, so the
    scan terminates). A truncated final member yields what it
    inflated."""
    it = iter(chunks)
    try:
        data = next(it)
    except StopIteration:
        return
    if data[:2] != b"\x1f\x8b":
        yield True, data
        for rest in it:
            yield False, rest
        return
    d = zlib.decompressobj(wbits=31)
    fresh = True  # next non-empty output opens a new member
    while True:
        if not data:
            try:
                data = next(it)
            except StopIteration:
                return
            continue
        try:
            out = d.decompress(data)
        except zlib.error:
            # resync: skip ≥1 byte, then scan for the next member magic
            j = data.find(b"\x1f\x8b", 1)
            while j < 0:
                carry = data[-1:]  # magic may straddle a chunk boundary
                try:
                    data = carry + next(it)
                except StopIteration:
                    return
                j = data.find(b"\x1f\x8b")
            data = data[j:]
            d = zlib.decompressobj(wbits=31)
            fresh = True
            continue
        data = b""
        if out:
            yield fresh, out
            fresh = False
        if d.eof:
            data = d.unused_data
            d = zlib.decompressobj(wbits=31)
            fresh = True


# sentinel: a read spanned a gzip-member boundary — the record was
# truncated by a poison member; the buffer has been repositioned at
# the fresh member's first byte (a new record header)
_CROSSED = object()


class _StreamBuf:
    """Minimal buffered reader over a ``(member_start, bytes)`` chunk
    iterator: supports read_until(delimiter) and read_n(n) without
    concatenating the whole stream, tracking gzip-member-start offsets
    so framing recovery can resync at the next member.

    A WARC record never legitimately spans gzip members (ISO 28500
    record-per-member layout — our reads within one member cross no
    sync point), so a read that WOULD cross one means the current
    record's bytes were cut short by a corrupt member: the read
    returns ``_CROSSED`` with the buffer repositioned at the fresh
    member, and the parser restarts there — later good records
    survive a mid-member corruption instead of being dropped."""

    def __init__(self, chunks: Iterator[tuple[bool, bytes]]):
        self._chunks = chunks
        self._buf = bytearray()
        self._syncs: list[int] = []  # member-start offsets into _buf
        self._eof = False

    def _fill(self) -> bool:
        if self._eof:
            return False
        try:
            start, data = next(self._chunks)
        except StopIteration:
            self._eof = True
            return False
        if start:
            self._syncs.append(len(self._buf))
        self._buf.extend(data)
        return True

    def _consume(self, n: int) -> None:
        del self._buf[:n]
        self._syncs = [s - n for s in self._syncs if s >= n]

    def _sync_within(self, end: int) -> int | None:
        """First member-start offset strictly inside (0, end)."""
        for s in self._syncs:
            if 0 < s < end:
                return s
        return None

    def read_until(self, delim: bytes, max_bytes: int = 1 << 20):
        """Bytes up to and including delim; None at EOF / if the
        delimiter doesn't appear within max_bytes (framing error);
        ``_CROSSED`` if the span would cross a member boundary."""
        search_from = 0
        while True:
            i = self._buf.find(delim, search_from)
            if i >= 0:
                end = i + len(delim)
                s = self._sync_within(end)
                if s is not None:
                    self._consume(s)
                    return _CROSSED
                out = bytes(self._buf[:end])
                self._consume(end)
                return out
            s = self._sync_within(len(self._buf))
            if s is not None:
                # delimiter missing within the record's own member
                self._consume(s)
                return _CROSSED
            if len(self._buf) > max_bytes:
                return None
            search_from = max(0, len(self._buf) - len(delim) + 1)
            if not self._fill():
                return None

    def read_n(self, n: int):
        while len(self._buf) < n:
            s = self._sync_within(len(self._buf))
            if s is not None:  # payload cut short by a poison member
                self._consume(s)
                return _CROSSED
            if not self._fill():
                return None
        s = self._sync_within(n)
        if s is not None:
            self._consume(s)
            return _CROSSED
        out = bytes(self._buf[:n])
        self._consume(n)
        return out

    def skip_crlf(self) -> None:
        while True:
            if len(self._buf) < 2 and not self._eof:
                self._fill()
                continue
            if self._buf[:2] == b"\r\n":
                self._consume(2)
                continue
            return

    def resync(self) -> bool:
        """Framing lost mid-member (garbage header bytes): drop input
        until the NEXT gzip member begins; True if repositioned, False
        at EOF. On a single-member (plain ``.warc``) stream there is
        no later sync point, so this drains to EOF — matching the old
        stop-at-framing-loss behavior for non-gzip input."""
        # callers have already consumed the garbage header, and a head
        # spanning an interior sync comes back _CROSSED instead — so
        # every remaining sync (offset 0 included) is a FRESH member
        while True:
            if self._syncs:
                self._consume(self._syncs[0])
                return True
            if self._buf:  # all junk — discard, keep memory bounded
                self._consume(len(self._buf))
            if not self._fill():
                return False


def _parse_header_block(block: bytes) -> dict[str, str]:
    """WARC or HTTP header lines → {lower-name: value} (first wins)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version/status line
        if not line or b":" not in line:
            continue
        k, _, v = line.partition(b":")
        key = k.strip().lower().decode("ascii", "replace")
        if key not in headers:
            headers[key] = v.strip().decode("ascii", "replace")
    return headers


def _parse_ts(value: str) -> _dt.datetime | None:
    try:
        return _dt.datetime.strptime(value, _WARC_TS)
    except ValueError:
        return None


def iter_warc_records(
    raw: bytes,
    *,
    keep_types: tuple[str, ...] = ("response", "resource", "conversion"),
    html_only: bool = True,
) -> Iterator[dict]:
    """Parse one WARC shard (gzip-multistream or plain) into page
    dicts: {url, warc_ts, html (undecoded bytes), lang ('')}.

    ``response`` payloads are full HTTP responses (status line +
    headers + body; only 2xx with an html/xhtml or absent
    Content-Type survive when html_only); ``resource``/``conversion``
    payloads are the content itself. warcinfo/request/metadata
    records are skipped by type."""
    yield from _records_from_chunks([raw], keep_types=keep_types, html_only=html_only)


def _records_from_chunks(
    chunks: Iterator[bytes] | list[bytes],
    *,
    keep_types: tuple[str, ...] = ("response", "resource", "conversion"),
    html_only: bool = True,
) -> Iterator[dict]:
    buf = _StreamBuf(_iter_decompressed(iter(chunks)))
    while True:
        buf.skip_crlf()
        head = buf.read_until(_CRLF2)
        if head is None:
            return
        if head is _CROSSED:
            continue  # repositioned at a fresh member's header
        if not head.startswith(b"WARC/"):
            # framing lost (e.g. partial bytes a poison member inflated
            # before erroring): resync at the next gzip member and keep
            # going — one corrupt member never drops the shard's tail
            if buf.resync():
                continue
            return
        wh = _parse_header_block(head)
        try:
            length = int(wh.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:  # absent/garbage/negative length = framing loss
            if buf.resync():
                continue
            return
        payload = buf.read_n(length)
        if payload is None:
            return  # truncated record: complete prefix already emitted
        if payload is _CROSSED:
            continue  # poison member cut the payload; parser is resynced
        rtype = wh.get("warc-type", "")
        if rtype not in keep_types:
            continue
        body = payload
        if rtype == "response":
            if not payload.startswith(b"HTTP/"):
                continue
            sep = payload.find(_CRLF2)
            if sep < 0:
                continue
            status_headers, body = payload[:sep], payload[sep + len(_CRLF2):]
            status_line = status_headers.split(b"\r\n", 1)[0].split(b" ")
            if len(status_line) < 2 or not status_line[1].startswith(b"2"):
                continue
            if html_only:
                ctype = _parse_header_block(status_headers).get("content-type", "")
                if ctype and "html" not in ctype.lower():
                    continue
        url = wh.get("warc-target-uri", "")
        yield {
            "url": url,
            "warc_ts": _parse_ts(wh.get("warc-date", "")),
            "html": body,
            "lang": "",
        }


# --------------------------------------------------------------------------
# Ray Data source / sink
# --------------------------------------------------------------------------

_PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("lang", pa.string()),
    ]
)


def _pages_chunk(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def _fs_for(path: str, filesystem=None):
    if filesystem is not None:
        return filesystem, path
    from pyarrow import fs as pafs

    try:
        return pafs.FileSystem.from_uri(path)
    except (ValueError, pa.ArrowInvalid):
        return pafs.LocalFileSystem(), path


def _expand(paths: str | list[str], filesystem=None) -> list[str]:
    """File paths pass through; a directory expands (non-recursive) to
    its ``.warc`` / ``.warc.gz`` files, sorted."""
    from pyarrow import fs as pafs

    out: list[str] = []
    for p in [paths] if isinstance(paths, str) else list(paths):
        fsys, fp = _fs_for(p, filesystem)
        info = fsys.get_file_info(fp)
        if info.type == pafs.FileType.Directory:
            # filesystem paths come back scheme-less ("bucket/key");
            # re-prefix so the per-task _fs_for resolves the same store
            prefix = p.split("://", 1)[0] + "://" if "://" in p else ""
            files = fsys.get_file_info(pafs.FileSelector(fp))
            out.extend(
                sorted(
                    prefix + f.path
                    for f in files
                    if f.is_file and (".warc" in f.base_name)
                )
            )
        else:
            out.append(p)
    return out


def read_warc(
    paths: str | list[str],
    *,
    html_only: bool = True,
    chunk_rows: int = 2048,
    filesystem=None,
    read_buffer_bytes: int = 4 << 20,
):
    """WARC shard files (or a directory of them) → pages Dataset
    (url, warc_ts, html, lang), schema-compatible with
    sources.synth.pages_dataset, so the whole flagship pipeline runs
    unchanged off web-archive input: ``build_kg(read_warc(paths), ...)``.

    One parse task per shard file (a crawl's ~90k shards are its
    natural parallelism); inside a task the shard streams as raw
    ``read_buffer_bytes`` chunks through the member-carrying inflater
    (NOT ``read_binary_files`` — Ray's binary datasource force-infers
    gzip from the ``.gz`` suffix, inflating a whole shard into one
    buffer and raising on corrupt members instead of quarantining),
    and pages leave as ≤chunk_rows-row generator chunks, so both input
    and output memory are bounded regardless of shard size."""
    import ray.data as rd

    files = _expand(paths, filesystem)

    def parse(batch: pa.Table) -> Iterator[pa.Table]:
        rows: list[dict] = []
        for path in batch.column("path").to_pylist():
            fsys, fp = _fs_for(path, filesystem)
            try:
                # compression=None: the pyarrow wrapper's default is
                # 'detect', which would inflate .gz inside Arrow and
                # raise on corrupt members; raw bytes must reach the
                # quarantining member-wise inflater instead
                f = fsys.open_input_stream(fp, compression=None)
            except OSError:
                continue  # missing/unreadable shard: quarantine, don't fail
            with f:

                def chunks():
                    while True:
                        b = f.read(read_buffer_bytes)
                        if not b:
                            return
                        yield b

                for rec in _records_from_chunks(chunks(), html_only=html_only):
                    rows.append(rec)
                    if len(rows) >= chunk_rows:
                        yield _pages_chunk(rows)
                        rows = []
        if rows:
            yield _pages_chunk(rows)

    ds = rd.from_items(
        [{"path": p} for p in files], override_num_blocks=max(1, len(files))
    )
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)


def warc_record(
    url: str,
    warc_ts: _dt.datetime | None,
    html: bytes,
    *,
    gzip_member: bool = True,
    record_type: str = "response",
) -> bytes:
    """Serialize ONE page as a WARC record (its own gzip member by
    default — the Common Crawl layout, which keeps shards seekable
    per record)."""
    ts = (warc_ts or _dt.datetime(1970, 1, 1)).strftime(_WARC_TS)
    if record_type == "response":
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        ctype = b"application/http; msgtype=response"
    else:
        payload, ctype = html, b"text/html"
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {record_type}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {ts}\r\n".encode()
        + f"Content-Type: {ctype.decode()}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
    )
    rec = head + payload + _CRLF2
    return gzip.compress(rec, compresslevel=1) if gzip_member else rec


def write_warc(ds, out_dir: str, *, gzip_members: bool = True) -> list[dict]:
    """pages Dataset → one ``.warc.gz`` shard per block under out_dir
    (distributed write; same shard-manifest pattern as
    functions/triples.write_turtle_partitioned). Returns the manifest
    [{path, n_records}, ...] — block-count-sized, never page-sized."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.gz" if gzip_members else ".warc"

    def write_shard(batch: pa.Table) -> pa.Table:
        # uuid per task, the write_parquet convention: content-derived
        # names collide when two blocks carry the same url sequence
        # (pre-dedup re-crawls) and would silently overwrite a shard
        # while the manifest double-counts
        name = uuid.uuid4().hex[:16]
        path = os.path.join(out_dir, f"part-{name}{suffix}")
        ts_col = batch.column("warc_ts").to_pylist()
        with open(path, "wb") as f:
            if gzip_members:
                for url, ts, html in zip(
                    batch.column("url").to_pylist(), ts_col, batch.column("html").to_pylist()
                ):
                    f.write(warc_record(url, ts, html, gzip_member=True))
            else:
                buf = io.BytesIO()
                for url, ts, html in zip(
                    batch.column("url").to_pylist(), ts_col, batch.column("html").to_pylist()
                ):
                    buf.write(warc_record(url, ts, html, gzip_member=False))
                f.write(buf.getvalue())
        return pa.table(
            {"path": pa.array([path]), "n_records": pa.array([batch.num_rows], pa.int64())}
        )

    return ds.map_batches(
        write_shard, batch_format="pyarrow", batch_size=None
    ).take_all()
