"""Crawl-increment ingest: WARC shards fold into an append-only
corpus with exact + near dedup against what is already ingested;
finished shards are never reprocessed (resume law)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pytest

from knowledge_graph_ray.pipelines.ingest import (
    corpus_docs,
    ingest_increment,
)
from knowledge_graph_ray.sources.warc import warc_record

TS = dt.datetime(2026, 2, 3, 4, 5, 6)

# each doc body is mostly DISTINCT (shared-prefix corpora make every
# pair a near-dup at 3-shingle Jaccard 0.7 — the first version of this
# test learned that the hard way); only the planted near-pair overlaps
BODIES = [
    "Folketinget behandler det nye lovforslag om energiaftalen i salen.",
    "Ministeren svarede på spørgsmål fra ordførerne gennem flere timer.",
    "Udvalget offentliggjorde sin betænkning om skattereformen i går.",
    "Kommunerne får flere midler til klimatilpasning langs kysterne.",
    "Regionerne ansætter nye læger efter sommerens akutte mangel.",
    "Styrelsen reviderede vejledningen for digitale ansøgninger i år.",
]


def _page(url: str, text: str) -> bytes:
    html = f"<html><body><p>{text}</p></body></html>".encode()
    return warc_record(url, TS, html)


def _shard(tmp_path, name: str, pages: list[tuple[str, str]]) -> str:
    p = tmp_path / name
    p.write_bytes(b"".join(_page(u, t) for u, t in pages))
    return str(p)


def test_ingest_increments_dedup_and_resume(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    texts = [b * 3 for b in BODIES]  # long enough to shingle

    s1 = _shard(
        tmp_path,
        "a.warc.gz",
        [(f"http://x/{i}", texts[i]) for i in range(4)]
        + [("http://x/dup", texts[0])],  # exact dup WITHIN the shard
    )
    m1 = ingest_increment([s1], corpus, "a")
    assert m1["n_new_docs"] == 4  # in-shard exact dup collapsed

    s2 = _shard(
        tmp_path,
        "b.warc.gz",
        [
            ("http://y/exact", texts[1]),  # exact dup vs ingested
            ("http://y/near", texts[2][:-5] + "dag."),  # Jaccard 0.889
            ("http://y/fresh1", texts[4]),
            ("http://y/fresh2", texts[5]),
        ],
    )
    m2 = ingest_increment([s2], corpus, "b")
    # exact dup dropped by the anti join, near dup by the band index
    assert m2["n_new_docs"] == 2

    all_docs = corpus_docs(corpus)
    assert all_docs.count() == 6
    got = {r["text"] for r in all_docs.take_all()}
    assert texts[4] in got and texts[5] in got
    assert (texts[2][:-5] + "dag.") not in got

    # resume: a finished tag is a no-op
    m3 = ingest_increment([s2], corpus, "b")
    assert m3["skipped"] is True
    assert corpus_docs(corpus).count() == 6


def test_ingest_first_shard_no_near_dup(ray_session, tmp_path):
    corpus = str(tmp_path / "c2")
    s = _shard(tmp_path, "c.warc.gz", [("http://z/1", BODIES[0])])
    m = ingest_increment([s], corpus, "only", near_dup=False)
    assert m["n_new_docs"] == 1
    assert m["bands_dir"] is None
    assert corpus_docs(corpus).count() == 1


def test_corpus_docs_empty_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        corpus_docs(str(tmp_path / "missing"))


def test_ingest_recapture_and_within_shard_near_dup(ray_session, tmp_path):
    """Round-4 review fixes: byte-identical re-captures of one url
    collapse to one row; distinct texts at one url keep distinct ids;
    the FIRST shard already collapses within-shard near-dups."""
    corpus = str(tmp_path / "c3")
    base = BODIES[2] * 3
    s = _shard(
        tmp_path,
        "d.warc.gz",
        [
            ("http://r/x", base),                 # capture 1
            ("http://r/x", base),                 # byte-identical re-capture
            ("http://r/x", BODIES[3] * 3),        # same url, DIFFERENT text
            ("http://r/near", base[:-5] + "dag."),  # near-dup of capture 1
            ("http://r/other", BODIES[5] * 3),
        ],
    )
    m = ingest_increment([s], corpus, "d")
    docs = corpus_docs(corpus).take_all()
    texts = {r["text"] for r in docs}
    assert m["n_new_docs"] == 3  # recapture collapsed, near-dup dropped
    assert base in texts and (BODIES[3] * 3) in texts and (BODIES[5] * 3) in texts
    assert (base[:-5] + "dag.") not in texts
    ids = [r["doc_id"] for r in docs]
    assert len(ids) == len(set(ids))


def test_ingest_nonlocal_filesystem(ray_session, tmp_path):
    """Corpus state on a non-local pyarrow filesystem handle
    (SubTreeFileSystem as the object-store stand-in): markers, band
    index, docs and resume all flow through fsio (VERDICT r4 item 3).
    WARC shard paths stay local on purpose — they resolve via
    sources.warc, independent of the corpus store."""
    from pyarrow import fs as pafs

    sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    texts = [b * 3 for b in BODIES]
    s1 = _shard(
        tmp_path, "a.warc.gz", [(f"http://x/{i}", texts[i]) for i in range(3)]
    )
    m1 = ingest_increment([s1], "corpus", "a", filesystem=sub)
    assert m1["n_new_docs"] == 3
    s2 = _shard(
        tmp_path,
        "b.warc.gz",
        [("http://y/exact", texts[0]), ("http://y/fresh", texts[4])],
    )
    m2 = ingest_increment([s2], "corpus", "b", filesystem=sub)
    assert m2["n_new_docs"] == 1  # exact dup dropped vs store-side state
    assert corpus_docs("corpus", filesystem=sub).count() == 4
    m3 = ingest_increment([s2], "corpus", "b", filesystem=sub)
    assert m3["skipped"] is True
