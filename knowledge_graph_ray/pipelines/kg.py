"""Flagship knowledge-graph construction pipeline (north rule;
reference lifecycle SURVEY.md §3.2).

pages(url, warc_ts, html, lang)
  → extract (task map_batches, html dropped immediately)
  → segment (task map_batches, exploded paragraph rows)
  → fused OpenIE + entity linking (ONE actor pool: pattern SVO
    extraction, then exact alias probe → ANN → NIL per surface;
    gazetteer/alias/embedding side broadcast once via ray.put)
  → triple dedup (per-block combiner → hash-bucket shuffle on
    (subj, pred, obj) — the D1 all-to-all)
  → NIL-surface canonicalization (post-dedup: the distinct unlinked
    surfaces are exactly the broadcast map's keys — tiny — so the
    north-rule clustering runs OFF the corpus-sized path)
  → sort(subj) → write_parquet

Only the entity side and the canonical map are ever collected to the
driver (both small by construction); everything else streams. The
mention-corpus-scale canonicalization (salted groupby(surface_hash)
over every mention) remains available as standalone operators
(mention_stage + canon.surface_stats + canon.canonical_surface_map).
``checkpoint_dir`` optionally persists the paragraph stage as a
resume point; shard-level resumability with lineage manifests lives
in ``run_kg_resumable`` (state/checkpoint.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset

from knowledge_graph_ray.functions.canon import canonical_surface_map, surface_stats
from knowledge_graph_ray.functions.extract import extract_batch
from knowledge_graph_ray.functions.segment import paragraphs_batch
from knowledge_graph_ray.stages.ner import GazetteerNER

LABEL_OF_TYPE = {"person": "PER", "institution": "ORG"}


def broadcast_entity_side(entities: pa.Table, aliases: pa.Table, locations=None):
    """Build + ray.put the small broadcast side once: gazetteer
    (alias, label), alias→id pairs, entity embedding matrix.

    Arrow-native where it counts: labels via a dictionary-encode +
    take (no per-entity dict probe), the embedding matrix via the
    flat values buffer (zero-copy reshape — ``to_pylist`` built one
    Python list per entity). The remaining ``to_pylist`` calls build
    the actor-side Python structures (regex gazetteer, probe dict)
    that have to be Python anyway; the entity side is small by
    contract (17k in the reference)."""
    # entity_id -> label, vectorized: join aliases.entity_id against the
    # entities table with an index-take instead of a Python dict probe
    ent_ids_arr = entities.column("entity_id").combine_chunks()
    labels = pa.array(
        [LABEL_OF_TYPE.get(t, "MISC") for t in entities.column("entity_type").to_pylist()],
        pa.string(),
    )
    import pandas as pd

    idx = pd.Index(ent_ids_arr.to_numpy(zero_copy_only=False))
    pos = idx.get_indexer(aliases.column("entity_id").to_numpy(zero_copy_only=False))
    alias_labels = pc.if_else(
        pa.array(pos >= 0, pa.bool_()),
        labels.take(pa.array(np.where(pos >= 0, pos, 0), pa.int64())),
        pa.scalar("MISC", pa.string()),
    )
    alias_list = aliases.column("alias").to_pylist()
    alias_eids = aliases.column("entity_id").to_pylist()
    gazetteer = list(zip(alias_list, alias_labels.to_pylist()))
    alias_pairs = list(zip(alias_list, alias_eids))
    entity_ids = entities.column("entity_id").to_pylist()
    from knowledge_graph_ray.stages.knn import vec_matrix

    emb = entities.column("embedding")
    matrix = (
        np.ascontiguousarray(vec_matrix(emb), dtype=np.float32)
        if len(emb)
        else np.zeros((0, 0), dtype=np.float32)
    )
    return {
        "gazetteer": ray.put(gazetteer),
        "alias_pairs": ray.put(alias_pairs),
        "entity_ids": ray.put(entity_ids),
        "entity_vecs": ray.put(matrix),
        "locations": ray.put(list(locations or [])),
    }


def extract_and_segment(pages: Dataset) -> Dataset:
    """pages → paragraph rows (both task stages, Arrow in/out)."""
    cols = pages.columns()
    if "text" in cols:  # the engine extracts from html; never trust input text
        pages = pages.drop_columns(["text"])
    docs = pages.map_batches(extract_batch, batch_format="pyarrow")
    return docs.map_batches(paragraphs_batch, batch_format="pyarrow")


def mention_stage(paras: Dataset, refs, *, concurrency=(1, 4), batch_size=256) -> Dataset:
    return paras.map_batches(
        GazetteerNER,
        fn_constructor_kwargs={
            "gazetteer": refs["gazetteer"],
            "locations": refs["locations"],
        },
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def _nonself_rows(cmap_ds: Dataset) -> Dataset:
    """(norm, canonical) → only the rows that actually rewrite
    (norm != canonical). Self-canonical singletons dominate open-web
    surface vocabularies, so this filter is what keeps the collected
    map bounded even when the distinct-surface set is not."""

    def kernel(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.equal(batch.column("norm"), batch.column("canonical")))
        )

    return cmap_ds.map_batches(kernel, batch_format="pyarrow")


def canonical_map_from_mentions(
    mentions: Dataset,
    *,
    n_salts: int = 8,
    threshold: int = 85,
    min_count: int = 1,
    max_broadcast: int = 1_000_000,
) -> dict[str, str]:
    """Salted two-round surface stats → blocked fuzzy clustering
    (fully distributed) → driver-side dict of only the rows that
    REWRITE (norm != canonical — the self-canonical long tail never
    crosses the driver). Size-guarded: above ``max_broadcast``
    rewriting rows the dict contract itself is wrong — raise and point
    at the Dataset-native path (canon.canonical_surface_map + a join
    apply, as canonicalize_nil_surfaces does). ``min_count`` caps the
    unbounded one-off-surface tail before clustering (D4 note in
    canon.canonical_surface_map)."""
    unknown = mentions.filter(expr="label == 'MISC'")
    stats = surface_stats(unknown, n_salts=n_salts)
    cmap = canonical_surface_map(stats, threshold=threshold, min_count=min_count)
    nonself = _nonself_rows(cmap).materialize()
    n = nonself.count()
    if n > max_broadcast:
        raise ValueError(
            f"canonical map has {n} rewriting surfaces (> max_broadcast="
            f"{max_broadcast}); a broadcast dict is the wrong shape — use "
            "canon.canonical_surface_map and apply it with a join "
            "(see canonicalize_nil_surfaces' join path), or raise min_count"
        )
    rows = nonself.take_all()
    return {r["norm"]: r["canonical"] for r in rows}


def triple_stage(
    paras: Dataset,
    refs,
    canonical_map: dict[str, str] | None,
    *,
    concurrency=(1, 4),
    batch_size=256,
    ann: str = "brute",
    link_threshold: float = 0.35,
    tagger_loader=None,
) -> Dataset:
    from knowledge_graph_ray.stages.link import ExtractLinkActor

    return paras.map_batches(
        ExtractLinkActor,
        fn_constructor_kwargs={
            "gazetteer": refs["gazetteer_surfaces"],
            "locations": refs["locations"],
            "tagger_loader": tagger_loader,
            "alias_pairs": refs["alias_pairs"],
            "entity_ids": refs["entity_ids"],
            "entity_vecs": refs["entity_vecs"],
            "canonical_map": refs["canonical_map"],
            "ann": ann,
            "threshold": link_threshold,
        },
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def dedup_triples(linked: Dataset) -> Dataset:
    """D1 exact dedup shuffle: one row per distinct (subj, pred, obj),
    with provenance (min doc_id) and support count. A per-block
    combiner shrinks the shuffle input before the all-to-all."""
    import pandas as pd

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["subj", "pred", "obj"], as_index=False, sort=False).agg(
            support=("doc_id", "size"), src_doc=("doc_id", "min")
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["subj", "pred", "obj"], as_index=False, sort=False).agg(
            support=("support", "sum"), src_doc=("src_doc", "min")
        )

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    # large batch_size bundles the actor stage's many small output
    # blocks into few combiner tasks — the combiner only shrinks the
    # shuffle if it sees wide batches; the all-to-all is a hash-bucket
    # shuffle (int key), not a sort on three string keys
    partial = linked.map_batches(combine, batch_format="pandas", batch_size=65536)
    agg = hash_bucket_agg(partial, ["subj", "pred", "obj"], merge, num_buckets=64)

    def finalize(batch: pa.Table) -> pa.Table:
        obj = batch.column("obj")
        is_id = pc.or_(pc.starts_with(obj, "entity:"), pc.starts_with(obj, "surface:"))
        return batch.append_column("obj_is_literal", pc.invert(is_id))

    return agg.map_batches(finalize, batch_format="pyarrow")


def build_kg(
    pages: Dataset,
    entities: pa.Table,
    aliases: pa.Table,
    locations=None,
    *,
    concurrency: int | tuple = (1, 4),
    batch_size: int = 1024,
    ann: str = "brute",
    link_threshold: float = 0.35,
    canonicalize: bool = True,
    n_salts: int = 8,
    checkpoint_dir: str | None = None,
    sort_output: bool = True,
    nil_max_broadcast: int = 100_000,
    tagger_loader=None,
) -> Dataset:
    """pages Dataset → lazy deduplicated triples Dataset
    (subj, pred, obj, support, src_doc, obj_is_literal), sorted by subj.

    ``tagger_loader`` (optional, the ModelNER zero-arg loader shape,
    e.g. ``stages.tagger.load_tagger``) switches extraction from the
    gazetteer alternation to MODEL-tagged spans (stages.openie.
    ModelOpenIE) — real persisted weights loaded once per actor; the
    rest of the pipeline (linking, dedup, canonicalization) is
    unchanged."""
    refs = broadcast_entity_side(entities, aliases, locations)
    refs["gazetteer_surfaces"] = ray.put(
        [a for a, _ in ray.get(refs["alias_pairs"])]
    )

    paras = extract_and_segment(pages)
    if checkpoint_dir is not None:
        # clear before writing: write_parquet APPENDs (uuid filenames),
        # so a rerun with the same dir would double the corpus.
        # pyarrow.fs throughout (state.fsio) — checkpoint dirs may live
        # on an object store
        from knowledge_graph_ray.state import fsio

        ck_fs, ck_root = fsio.resolve_fs(checkpoint_dir)
        fsio.rmtree(ck_fs, ck_root)
        paras.write_parquet(ck_root, filesystem=ck_fs)
        paras = rd.read_parquet(ck_root, filesystem=ck_fs)

    refs["canonical_map"] = ray.put({})
    linked = triple_stage(
        paras,
        refs,
        None,
        concurrency=concurrency,
        batch_size=batch_size,
        ann=ann,
        link_threshold=link_threshold,
        tagger_loader=tagger_loader,
    )
    triples = dedup_triples(linked)
    if canonicalize:
        # pin the post-dedup table (orders of magnitude smaller than
        # the corpus; plasma-backed, spillable) — the NIL-surface scan
        # is a second consumer and must not re-execute the corpus path
        triples = triples.materialize()
        triples = canonicalize_nil_surfaces(
            triples, threshold=85, max_broadcast=nil_max_broadcast
        )
    if sort_output:
        triples = triples.sort("subj")
    return triples


def canonicalize_nil_surfaces(
    triples: Dataset, threshold: int = 85, max_broadcast: int = 100_000
) -> Dataset:
    """Post-dedup NIL canonicalization, size-guarded end to end.

    In the gazetteer-fed flagship the distinct ``surface:`` ids
    surviving dedup are exactly the broadcast map's keys — tiny — and
    the fast driver-side path runs (zero extra stages when nothing
    clusters). In the no-gazetteer ``_CAP_SPAN`` mode (openie.py:83,
    the open-web fallback) NIL surfaces are corpus-proportional, so
    above ``max_broadcast`` distinct surfaces clustering runs
    DISTRIBUTED (the same per-block kernel, bucketed on block_key via
    canon.canonical_surface_map — outputs are identical because
    clustering is block-local and deterministic either way), and the
    resulting map is applied via broadcast dict while it fits, else
    via a hash join. Nothing corpus-proportional ever crosses the
    driver on any path.

    (Mention-corpus-scale canonicalization — salted surface stats over
    every mention — remains available via canon.surface_stats /
    canonical_map_from_mentions; reference semantics D4.)
    """
    import pandas as pd

    from knowledge_graph_ray.functions.canon import (
        block_key,
        canonical_surface_map,
        cluster_block,
    )
    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    def nil_surfaces(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for col in ("subj", "obj"):
            if col not in batch.column_names:
                continue
            vals = batch.column(col)
            hits = vals.filter(pc.starts_with(vals, "surface:"))
            out.update(pc.utf8_slice_codeunits(hits, 8).to_pylist())
        return pa.table({"norm": pa.array(sorted(out), pa.string())})

    # per-block distinct, then a take-based guard: ``take(cap+1)``
    # early-stops, so the bounded-vocabulary flagship case costs ONE
    # cheap scan of the (already materialized) triple table — no
    # shuffle, no extra barrier. Only when the per-block-distinct row
    # count exceeds the cap (conservative: cross-block duplicates
    # count against it) does the distributed distinct+clustering run.
    nil = triples.map_batches(nil_surfaces, batch_format="pyarrow")
    probe = nil.take(max_broadcast + 1)
    if not probe:
        return triples
    if len(probe) <= max_broadcast:
        # driver-side clustering (the flagship's bounded-vocabulary case)
        df = pd.DataFrame({"norm": sorted({r["norm"] for r in probe})})
        df["block_key"] = df["norm"].map(block_key)
        outs = [
            cluster_block(g, threshold) for _, g in df.groupby("block_key", sort=False)
        ]
        cmap = {
            r.norm: r.canonical
            for out in outs
            for r in out.itertuples()
            if r.norm != r.canonical
        }
        if not cmap:
            return triples
        return _remap_merge_broadcast(triples, cmap)
    # above the cap: global distinct via one int hash-bucket shuffle
    # (never a driver-side set()), then distributed clustering —
    # blocks land whole in buckets, same deterministic kernel
    distinct = hash_bucket_agg(
        nil, ["norm"], lambda df: df.drop_duplicates(), num_buckets=16
    )
    nonself = _nonself_rows(
        canonical_surface_map(distinct, threshold=threshold)
    ).materialize()
    m = nonself.count()
    if m == 0:
        return triples
    if m <= max_broadcast:
        cmap = {r["norm"]: r["canonical"] for r in nonself.take_all()}
        return _remap_merge_broadcast(triples, cmap)
    return _remap_merge_join(triples, nonself)


def _merge_collapsed(remapped: Dataset, num_buckets: int = 16) -> Dataset:
    """Re-merge triple rows whose keys collapsed together after a
    surface rewrite (support sums, provenance keeps the min doc)."""
    import pandas as pd

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg

    def merge(df2: pd.DataFrame) -> pd.DataFrame:
        return df2.groupby(
            ["subj", "pred", "obj", "obj_is_literal"], as_index=False, sort=False
        ).agg(support=("support", "sum"), src_doc=("src_doc", "min"))

    return hash_bucket_agg(
        remapped, ["subj", "pred", "obj"], merge, num_buckets=num_buckets
    )


def _remap_merge_broadcast(triples: Dataset, cmap: dict[str, str]) -> Dataset:
    """Apply a canonical map that fits in the object store: broadcast
    once, vectorized pandas .map over the surface: tails per batch."""
    ref = ray.put(cmap)

    def remap(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        cols = {}
        for name in batch.column_names:
            col = batch.column(name)
            if name in ("subj", "obj"):
                s = col.to_pandas().astype("object")
                is_surf = s.str.startswith("surface:")
                if bool(is_surf.any()):
                    tails = s[is_surf].str[8:]
                    s.loc[is_surf] = "surface:" + tails.map(m).fillna(tails)
                cols[name] = pa.array(s, pa.string())
            else:
                cols[name] = col
        return pa.table(cols)

    return _merge_collapsed(triples.map_batches(remap, batch_format="pyarrow"))


def _remap_merge_join(triples: Dataset, cmap_ds: Dataset) -> Dataset:
    """Apply a canonical map too large to broadcast: per remapped
    column, split off the surface-prefixed rows, LEFT-join them
    against the (norm, canonical) Dataset on the tail, rewrite, and
    union the untouched rows back. Two passes (subj, obj), each one
    distributed hash join — the map never crosses the driver."""
    from knowledge_graph_ray.pipelines.relational import hash_join

    out = triples.materialize()  # each pass consumes it twice (split)
    order = list(out.schema().names)
    for col in ("subj", "obj"):

        def split(keep: bool, col=col):
            def kernel(batch: pa.Table) -> pa.Table:
                mask = pc.starts_with(batch.column(col), "surface:")
                return batch.filter(mask if keep else pc.invert(mask))

            return kernel

        def add_tail(batch: pa.Table, col=col) -> pa.Table:
            return batch.append_column(
                "__tail", pc.utf8_slice_codeunits(batch.column(col), 8)
            )

        surf = out.map_batches(split(True), batch_format="pyarrow").map_batches(
            add_tail, batch_format="pyarrow"
        )
        rest = out.map_batches(split(False), batch_format="pyarrow")
        joined = hash_join(
            surf, cmap_ds, on="__tail", right_on="norm", how="left_outer"
        )

        def rebuild(batch: pa.Table, col=col) -> pa.Table:
            tail = batch.column("__tail")
            canon = batch.column("canonical")
            new = pc.binary_join_element_wise(
                "surface:", pc.coalesce(canon, tail), ""
            )
            batch = batch.set_column(
                batch.schema.get_field_index(col), col, new
            )
            drop = [c for c in ("__tail", "norm", "canonical") if c in batch.column_names]
            return batch.drop_columns(drop).select(order)

        out = rest.select_columns(order).union(
            joined.map_batches(rebuild, batch_format="pyarrow")
        ).materialize()
    return _merge_collapsed(out)


def run_kg_resumable(
    pages_dir: str,
    entities: pa.Table,
    aliases: pa.Table,
    out_dir: str,
    *,
    locations=None,
    n_shards: int = 8,
    concurrency: int | tuple = (1, 4),
    batch_size: int = 1024,
    resume: bool = True,
    tagger_loader=None,
) -> dict:
    """Checkpointed flagship run: input pages parquet dir → per-shard
    triple extraction (resumable, SURVEY.md §4) → global merge →
    NIL canonicalization → sort → ``out_dir/final``.

    A killed run restarted with the same arguments recomputes only
    unfinished shards (state/checkpoint.py manifests carry lineage +
    row counts + wall time) and produces identical final output.
    """
    import pandas as pd

    from knowledge_graph_ray.pipelines.relational import hash_bucket_agg
    from knowledge_graph_ray.state import checkpoint as ckpt

    refs = broadcast_entity_side(entities, aliases, locations)
    refs["gazetteer_surfaces"] = ray.put([a for a, _ in ray.get(refs["alias_pairs"])])
    refs["canonical_map"] = ray.put({})

    def build(shard_pages: Dataset) -> Dataset:
        paras = extract_and_segment(shard_pages)
        linked = triple_stage(
            paras,
            refs,
            None,
            concurrency=concurrency,
            batch_size=batch_size,
            tagger_loader=tagger_loader,
        )
        return dedup_triples(linked)  # per-shard local dedup

    from knowledge_graph_ray.state import fsio

    out_fs, out_root = fsio.resolve_fs(out_dir)
    shards = ckpt.shard_input_files(pages_dir, n_shards)
    results = ckpt.run_sharded(
        shards, build, fsio.join(out_dir, "stage_triples"), resume=resume
    )

    # global merge: shard-local distinct rows → one more keyed merge
    merged = hash_bucket_agg(
        ckpt.read_all_shards(fsio.join(out_dir, "stage_triples")),
        ["subj", "pred", "obj"],
        lambda df: df.groupby(
            ["subj", "pred", "obj", "obj_is_literal"], as_index=False, sort=False
        ).agg(support=("support", "sum"), src_doc=("src_doc", "min")),
        num_buckets=max(16, n_shards),
    )
    final = canonicalize_nil_surfaces(merged.materialize()).sort("subj")
    final_dir = fsio.join(out_root, "final")
    fsio.rmtree(out_fs, final_dir)
    final.write_parquet(final_dir, filesystem=out_fs)
    report = ckpt.run_report(results)
    report["final_dir"] = final_dir
    return report


def build_kg_from_dir(corpus_dir: str, **kwargs) -> Dataset:
    """Convenience: corpus dir holding pages/entities/aliases parquet
    (as written by sources.synth.write_corpus)."""
    import pyarrow.parquet as pq

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    entities = pq.read_table(f"{corpus_dir}/entities.parquet")
    aliases = pq.read_table(f"{corpus_dir}/aliases.parquet")
    from knowledge_graph_ray.sources.synth import CITIES

    kwargs.setdefault("locations", CITIES)
    return build_kg(pages, entities, aliases, **kwargs)
