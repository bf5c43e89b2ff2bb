"""Flagship knowledge-graph construction pipeline (north rule;
reference lifecycle SURVEY.md §3.2).

pages(url, warc_ts, html, lang)
  → extract (task map_batches, html dropped immediately)
  → segment (task map_batches, exploded paragraph rows)
  → NER mentions (actor pool, gazetteer broadcast via ray.put)
  → mention canonicalization (salted two-round groupby(surface_hash)
    → blocked fuzzy clustering → small broadcast map)
  → OpenIE triple extraction (actor pool)
  → entity linking (actor pool: exact alias probe → ANN → NIL)
  → triple dedup (groupby(subj,pred,obj) — the D1 shuffle)
  → sort(subj) → write_parquet

Only the canonical-surface map and the entity table are ever
collected to the driver (both small by construction); everything else
streams. The optional ``checkpoint_dir`` writes the paragraph stage
to parquet and re-reads it, so the two consumers (mentions and
triples) don't recompute extraction — and the stage becomes a
resume point (SURVEY.md §4 checkpointing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from knowledge_graph_ray.functions.canon import canonical_surface_map, surface_stats
from knowledge_graph_ray.functions.extract import extract_batch
from knowledge_graph_ray.functions.segment import paragraphs_batch
from knowledge_graph_ray.stages.link import EntityLinker
from knowledge_graph_ray.stages.ner import GazetteerNER
from knowledge_graph_ray.stages.openie import PatternOpenIE

LABEL_OF_TYPE = {"person": "PER", "institution": "ORG"}


def broadcast_entity_side(entities: pa.Table, aliases: pa.Table, locations=None):
    """Build + ray.put the small broadcast side once: gazetteer
    (alias, label), alias→id pairs, entity embedding matrix."""
    type_of = {
        eid: LABEL_OF_TYPE.get(t, "MISC")
        for eid, t in zip(
            entities.column("entity_id").to_pylist(),
            entities.column("entity_type").to_pylist(),
        )
    }
    alias_list = aliases.column("alias").to_pylist()
    alias_eids = aliases.column("entity_id").to_pylist()
    gazetteer = [(a, type_of.get(e, "MISC")) for a, e in zip(alias_list, alias_eids)]
    alias_pairs = list(zip(alias_list, alias_eids))
    entity_ids = entities.column("entity_id").to_pylist()
    emb = entities.column("embedding")
    matrix = np.asarray(emb.to_pylist(), dtype=np.float32)
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


def canonical_map_from_mentions(
    mentions: Dataset, *, n_salts: int = 8, threshold: int = 85
) -> dict[str, str]:
    """Salted two-round surface stats → blocked fuzzy clustering →
    driver-side dict (distinct unknown surfaces only — small side)."""
    unknown = mentions.filter(expr="label == 'MISC'")
    stats = surface_stats(unknown, n_salts=n_salts)
    rows = canonical_surface_map(stats, threshold=threshold).take_all()
    return {r["norm"]: r["canonical"] for r in rows if r["norm"] != r["canonical"]}


def triple_stage(
    paras: Dataset,
    refs,
    canonical_map: dict[str, str] | None,
    *,
    concurrency=(1, 4),
    batch_size=256,
    ann: str = "brute",
    link_threshold: float = 0.35,
) -> Dataset:
    raw = paras.map_batches(
        PatternOpenIE,
        fn_constructor_kwargs={
            "gazetteer": refs["gazetteer_surfaces"],
            "locations": refs["locations"],
        },
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    return raw.map_batches(
        EntityLinker,
        fn_constructor_kwargs={
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
    with provenance (min doc_id) and support count."""
    agg = linked.groupby(["subj", "pred", "obj"]).aggregate(
        Count(alias_name="support"), Min("doc_id", alias_name="src_doc")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        objs = batch.column("obj").to_pylist()
        lit = [not (o.startswith("entity:") or o.startswith("surface:")) for o in objs]
        return batch.append_column("obj_is_literal", pa.array(lit, pa.bool_()))

    return agg.map_batches(finalize, batch_format="pyarrow")


def build_kg(
    pages: Dataset,
    entities: pa.Table,
    aliases: pa.Table,
    locations=None,
    *,
    concurrency: int | tuple = (1, 4),
    batch_size: int = 256,
    ann: str = "brute",
    link_threshold: float = 0.35,
    canonicalize: bool = True,
    n_salts: int = 8,
    checkpoint_dir: str | None = None,
    sort_output: bool = True,
) -> Dataset:
    """pages Dataset → lazy deduplicated triples Dataset
    (subj, pred, obj, support, src_doc, obj_is_literal), sorted by subj."""
    refs = broadcast_entity_side(entities, aliases, locations)
    refs["gazetteer_surfaces"] = ray.put(
        [a for a, _ in ray.get(refs["alias_pairs"])]
    )

    paras = extract_and_segment(pages)
    if checkpoint_dir is not None:
        paras.write_parquet(checkpoint_dir)
        paras = rd.read_parquet(checkpoint_dir)

    canonical_map: dict[str, str] = {}
    if canonicalize:
        mentions = mention_stage(
            paras, refs, concurrency=concurrency, batch_size=batch_size
        )
        canonical_map = canonical_map_from_mentions(mentions, n_salts=n_salts)
    refs["canonical_map"] = ray.put(canonical_map)

    linked = triple_stage(
        paras,
        refs,
        canonical_map,
        concurrency=concurrency,
        batch_size=batch_size,
        ann=ann,
        link_threshold=link_threshold,
    )
    triples = dedup_triples(linked)
    if sort_output:
        triples = triples.sort("subj")
    return triples


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
