"""Crawl-increment ingest: the production append loop, composed from
shipped operators.

The reference ingests one snapshot (get_files.py downloads, extract,
dedup once); a living 100-TB corpus instead receives SHARDS (new WARC
files per crawl) and must fold each shard in without ever re-reading,
re-shuffling or re-deduplicating what is already ingested. This
module glues the incremental pieces end to end:

  WARC shards → read_warc (streamed, quarantined)
    → extract (frozen byte-identical stage, error rows dropped)
    → stable int64 doc ids (md5 of url|shard — re-crawls of a url get
      a NEW id, so the ingested copy wins the near-dup rule)
    → incremental_exact_dedup   (anti semi-join vs ingested texts,
                                 then first-wins within the shard)
    → incremental_minhash_drops (vs the PERSISTED band index —
                                 ingested text is never re-hashed)
    → append docs + band-index partitions under corpus_dir

Layout (one directory per shard, marker-gated → a failed run resumes
by skipping finished shards; the ingested corpus is append-only):

  corpus_dir/docs/shard=<tag>/*.parquet   (doc_id, url, warc_ts, text, lang, text_key)
  corpus_dir/bands/shard=<tag>/*.parquet  (band_key, id, sig)
  corpus_dir/docs/shard=<tag>/_DONE
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from knowledge_graph_ray.functions.dedup import (
    incremental_exact_dedup,
    incremental_minhash_drops,
    minhash_band_index,
)
from knowledge_graph_ray.functions.extract import extract_batch
from knowledge_graph_ray.functions.hashing import md5_hash64_array, md5_hex_array
from knowledge_graph_ray.pipelines.relational import semi_join
from knowledge_graph_ray.sources.warc import read_warc
from knowledge_graph_ray.state import fsio

DOC_COLS = ["doc_id", "url", "warc_ts", "text", "lang", "text_key"]


def _docs_from_warc(shard_paths, tag: str) -> Dataset:
    """WARC shards → clean doc rows with stable int64 ids and a
    128-bit ``text_key`` (md5 hex). Exact dedup anti-joins on the key,
    so a future increment reads 32 bytes per ingested doc instead of
    the full text column — at corpus scale the seen side is ~100×
    smaller IO (collision odds at 1e11 docs are ~1e-17; the key IS the
    exact-dup identity, standard practice)."""
    pages = read_warc(shard_paths)

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.is_null(batch.column("error")),
            pc.greater(pc.utf8_length(batch.column("text")), 0),
        )
        batch = batch.filter(pc.fill_null(keep, False))
        # one vectorized digest pass per batch (DuckDB md5 kernel),
        # same hex keys as the old per-row hashlib loop
        keys = md5_hex_array(batch.column("text"))
        batch = batch.append_column("text_key", keys)
        # id = md5(url|text_key|tag): distinct texts at a re-captured
        # url get DISTINCT ids (the disjoint-id contract the near-dup
        # survivor rule needs); byte-identical re-captures share one id
        # and collapse in the id-dedupe step below
        tagged = pc.binary_join_element_wise(
            batch.column("url"),
            batch.column("text_key"),
            pa.scalar(tag),
            "|",
        )
        ids = md5_hash64_array(tagged).astype("int64")
        batch = batch.append_column("doc_id", pa.array(ids, pa.int64()))
        return batch.select(DOC_COLS)

    return pages.map_batches(extract_batch, batch_format="pyarrow").map_batches(
        finish, batch_format="pyarrow"
    )


def ingest_increment(
    shard_paths,
    corpus_dir: str,
    tag: str,
    *,
    near_dup: bool = True,
    threshold: float = 0.7,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    filesystem=None,
) -> dict:
    """Fold one crawl shard into the corpus. Returns a manifest dict;
    re-running a finished tag is a no-op (resume semantics).

    ``corpus_dir`` may be a URI (``s3://…``) or pair with an explicit
    ``filesystem=`` — all marker/state IO goes through pyarrow.fs
    (state.fsio), so the append loop runs against object stores.
    ``shard_paths`` resolve independently via sources.warc."""
    fsys, root = fsio.resolve_fs(corpus_dir, filesystem)
    docs_dir = fsio.join(root, "docs", f"shard={tag}")
    bands_dir = fsio.join(root, "bands", f"shard={tag}")
    marker = fsio.join(docs_dir, "_DONE")
    if fsio.exists(fsys, marker):
        return {"tag": tag, "skipped": True, "docs_dir": docs_dir}
    # clear half-written partitions: write_parquet APPENDs (uuid file
    # names), so a crashed attempt without its marker would double rows
    fsio.rmtree(fsys, docs_dir)
    fsio.rmtree(fsys, bands_dir)

    # materialize ONCE: the shard feeds exact dedup, the survivor
    # rejoin, the band index and the final write — shard-sized
    # (bounded per increment), plasma-backed, spillable
    full = _dedupe_ids(_docs_from_warc(shard_paths, tag)).materialize()

    seen_shards = _finished_shards(fsys, root)
    seen_doc_files = _parquet_files(fsys, root, "docs", seen_shards)
    if seen_doc_files:
        # 32 bytes/doc, never the ingested text column (see _docs_from_warc)
        seen_keys = rd.read_parquet(
            seen_doc_files, columns=["text_key"], filesystem=fsys
        )
        kept = incremental_exact_dedup(full, seen_keys, text_col="text_key")
    else:
        kept = incremental_exact_dedup(
            full,
            rd.from_arrow(pa.table({"text_key": pa.array([], pa.string())})),
            text_col="text_key",
        )
    # exact_dedup projects down to its key columns; rejoin the full rows
    new_docs = semi_join(
        full, kept, on="doc_id", right_on="keep_id"
    ).materialize()  # consumed by band index + drops + write below

    if near_dup and new_docs.count() > 0:  # materialized: count is free
        kw = dict(
            n_hashes=n_hashes, bands=bands, shingle_k=shingle_k
        )
        # band the shard ONCE; drops reuses it and the survivors' slice
        # is what gets persisted — text is never shingled twice
        new_bands = minhash_band_index(new_docs, **kw).materialize()
        seen_band_files = _parquet_files(fsys, root, "bands", seen_shards)
        if seen_band_files:
            seen_bands = rd.read_parquet(seen_band_files, filesystem=fsys)
        else:
            # first shard: empty seen side with the band schema, so
            # WITHIN-shard near-dups still collapse (transitive min-id)
            seen_bands = rd.from_arrow(
                pa.table(
                    {
                        "band_key": pa.array([], pa.int64()),
                        "id": pa.array([], pa.int64()),
                        "sig": pa.array([], pa.list_(pa.int64())),
                    }
                )
            )
        drops = incremental_minhash_drops(
            new_docs,
            seen_bands,
            threshold=threshold,
            precomputed_new_bands=new_bands,
            **kw,
        )
        new_docs = semi_join(
            new_docs, drops, on="doc_id", right_on="node", anti=True
        ).materialize()
        # survivors' slice of the band table via broadcast isin, not a
        # join: the sig list<int64> column trips Ray 2.49's hash-join
        # schema broadcast on nested types (see dedup.py prefilter)
        import numpy as np

        import ray as _ray

        ids = np.unique(
            np.concatenate(
                [
                    b.column("doc_id").to_numpy(zero_copy_only=False)
                    for b in new_docs.select_columns(["doc_id"]).iter_batches(
                        batch_format="pyarrow", batch_size=None
                    )
                    if b.num_rows
                ]
                or [np.array([], dtype=np.int64)]
            )
        )
        ids_ref = _ray.put(ids)

        def keep_band(batch: pa.Table) -> pa.Table:
            mask = np.isin(
                batch.column("id").to_numpy(zero_copy_only=False), _ray.get(ids_ref)
            )
            return batch.filter(pa.array(mask, pa.bool_()))

        new_bands.map_batches(keep_band, batch_format="pyarrow").write_parquet(
            bands_dir, filesystem=fsys
        )

    new_docs.write_parquet(docs_dir, filesystem=fsys)
    n_new = new_docs.count()
    # an increment that contributes nothing is still FINISHED — the
    # empty write creates no files, so make the marker's home ourselves
    fsio.makedirs(fsys, docs_dir)
    fsio.write_text(fsys, marker, "ok")
    return {
        "tag": tag,
        "skipped": False,
        "n_new_docs": n_new,
        "docs_dir": docs_dir,
        "bands_dir": bands_dir if near_dup else None,
    }


def _dedupe_ids(docs: Dataset) -> Dataset:
    """Collapse byte-identical re-captures (same url, same text, same
    shard → same doc_id by construction) to one row, min warc_ts wins
    — one int-key bucket shuffle, deterministic. Without this, the
    exact-dedup survivor rejoin (on doc_id) would re-admit every copy."""
    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    def first_per_id(df):
        return df.sort_values(["doc_id", "warc_ts"]).drop_duplicates(
            "doc_id", keep="first"
        )

    return hash_bucket_agg(docs, ["doc_id"], first_per_id, num_buckets=32)


def _parquet_files(fsys, root: str, sub: str, shards: list[str]) -> list[str]:
    """Explicit .parquet file lists — read_parquet expands a single
    directory but not a LIST of directories, and the _DONE markers
    must never reach the reader. An empty-contribution shard simply
    adds no files."""
    out: list[str] = []
    for s in shards:
        d = fsio.join(root, sub, s)
        out.extend(
            fsio.join(d, f) for f in fsio.listdir(fsys, d, suffix=".parquet")
        )
    return out


def _finished_shards(fsys, root: str) -> list[str]:
    docs = fsio.join(root, "docs")
    return sorted(
        d
        for d in fsio.listdir(fsys, docs)
        if d.startswith("shard=")
        and fsio.exists(fsys, fsio.join(docs, d, "_DONE"))
    )


def corpus_docs(corpus_dir: str, *, filesystem=None) -> Dataset:
    """The ingested corpus as one Dataset (all finished shards)."""
    fsys, root = fsio.resolve_fs(corpus_dir, filesystem)
    files = _parquet_files(fsys, root, "docs", _finished_shards(fsys, root))
    if not files:
        raise FileNotFoundError(f"no finished shards under {corpus_dir}")
    return rd.read_parquet(files, filesystem=fsys)
