"""End-to-end flagship pipeline: golden triples P/R gate (SURVEY.md §5.3)."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data as rd

from knowledge_graph_ray.pipelines.kg import build_kg
from knowledge_graph_ray.sources import synth

N_PAGES = 80


@pytest.fixture(scope="module")
def triples_result(ray_session):
    pages = rd.from_arrow(synth.pages_table(N_PAGES))
    ds = build_kg(
        pages,
        synth.entities_table(),
        synth.aliases_table(),
        locations=synth.CITIES,
        concurrency=1,
        batch_size=64,
    )
    return ds.take_all()


def test_golden_triples_pr(triples_result):
    got = {(r["subj"], r["pred"], r["obj"]) for r in triples_result}
    golden = synth.golden_triples(N_PAGES)
    missing = golden - got
    extra = got - golden
    precision = len(got & golden) / max(len(got), 1)
    recall = len(got & golden) / max(len(golden), 1)
    assert precision == 1.0, f"extra triples: {sorted(extra)[:5]}"
    assert recall == 1.0, f"missing triples: {sorted(missing)[:5]}"


def test_triples_deduped_and_sorted(triples_result):
    keys = [(r["subj"], r["pred"], r["obj"]) for r in triples_result]
    assert len(keys) == len(set(keys))
    subs = [r["subj"] for r in triples_result]
    assert subs == sorted(subs)


def test_support_counts_positive(triples_result):
    assert all(r["support"] >= 1 for r in triples_result)
    assert any(r["support"] > 1 for r in triples_result)  # dup across pages


def test_literal_flags(triples_result):
    for r in triples_result:
        assert r["obj_is_literal"] == (
            not (r["obj"].startswith("entity:") or r["obj"].startswith("surface:"))
        )
        assert r["subj"].startswith("entity:")


def test_partition_count_invariance(ray_session):
    """Same output at 1 block vs 8 blocks (SURVEY.md §5.5)."""
    tbl = synth.pages_table(30)
    sets = []
    for nblocks in (1, 8):
        pages = rd.from_arrow(tbl).repartition(nblocks)
        ds = build_kg(
            pages,
            synth.entities_table(),
            synth.aliases_table(),
            locations=synth.CITIES,
            concurrency=1,
            batch_size=16,
            sort_output=False,
        )
        sets.append({(r["subj"], r["pred"], r["obj"], r["support"]) for r in ds.take_all()})
    assert sets[0] == sets[1]


def test_checkpoint_dir_same_triples(triples_result, tmp_path, ray_session):
    """build_kg's paragraph checkpoint (fsio-routed since r5) changes
    execution — paras persisted and re-read — never the triples."""
    pages = rd.from_arrow(synth.pages_table(N_PAGES))
    ds = build_kg(
        pages,
        synth.entities_table(),
        synth.aliases_table(),
        locations=synth.CITIES,
        concurrency=1,
        batch_size=64,
        checkpoint_dir=str(tmp_path / "paras"),
    )
    got = {(r["subj"], r["pred"], r["obj"], r["support"]) for r in ds.take_all()}
    base = {
        (r["subj"], r["pred"], r["obj"], r["support"]) for r in triples_result
    }
    assert got == base


def test_flagship_with_trained_tagger_matches_golden(ray_session):
    """The WHOLE flagship (extract → segment → OpenIE → link → dedup →
    canonicalize → sort) driven by REAL TRAINED model weights instead
    of the gazetteer alternation: `tagger_loader` switches the fused
    actor stage to ModelOpenIE over stages.tagger's checked-in npz
    (spans generalize past the training index range), and the emitted
    triple set still matches the golden P/R = 1.0 bar — the north-rule
    gate met with a model in the loop."""
    pages = rd.from_arrow(synth.pages_table(60))
    from knowledge_graph_ray.stages.tagger import load_tagger

    ds = build_kg(
        pages,
        synth.entities_table(),
        synth.aliases_table(),
        locations=synth.CITIES,
        concurrency=1,
        batch_size=64,
        tagger_loader=load_tagger,
    )
    got = {(r["subj"], r["pred"], r["obj"]) for r in ds.take_all()}
    golden = synth.golden_triples(60)
    assert len(got & golden) / max(len(got), 1) == 1.0
    assert len(got & golden) / max(len(golden), 1) == 1.0
