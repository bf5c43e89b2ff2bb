"""Entity linking (J7/T7) + canonicalization (M12/M13/D4/D5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from knowledge_graph_ray.functions import canon
from knowledge_graph_ray.stages.embed import embed_texts
from knowledge_graph_ray.stages.link import EntityLinker, LshIndex
from knowledge_graph_ray.sources import synth


def make_linker(**kw):
    ents = synth.entities_table()
    aliases = synth.aliases_table()
    return EntityLinker(
        alias_pairs=list(
            zip(aliases.column("alias").to_pylist(), aliases.column("entity_id").to_pylist())
        ),
        entity_ids=ents.column("entity_id").to_pylist(),
        entity_vecs=np.asarray(ents.column("embedding").to_pylist(), dtype=np.float32),
        **kw,
    )


def test_exact_alias_probe():
    lk = make_linker()
    assert lk.resolve("Orga 3 A/S") == "entity:2003"
    assert lk.resolve("Dr Pera7") == "entity:1007"
    assert lk.resolve("orga  3  a/s") == "entity:2003"  # normalization


def test_ann_fallback_links_token_overlap():
    lk = make_linker()
    # not an alias, but shares tokens 'pera5'/'sonsen5' with entity 1005
    assert lk.resolve("Sonsen5 Pera5") == "entity:1005"


def test_nil_below_threshold_uses_canonical_map():
    lk = make_linker(canonical_map={"totally unknown thing": "unknown thing"})
    assert lk.resolve("Totally Unknown Thing") == "surface:unknown thing"
    lk2 = make_linker()
    out = lk2.resolve("Zzz Qqq Vvv")
    assert out.startswith("surface:")


def test_lsh_agrees_with_brute_on_aliases():
    brute = make_linker()
    lsh = make_linker(ann="lsh")
    for s in ["Sonsen5 Pera5", "Orga 3 A/S", "Pera0 Sonsen0"]:
        assert brute.resolve(s) == lsh.resolve(s)


def test_lsh_index_candidates_contain_self():
    m = embed_texts([f"word{i} extra{i}" for i in range(50)])
    idx = LshIndex(m)
    for i in range(50):
        assert i in idx.candidates(m[i])


def test_clean_name_m12():
    assert canon.clean_name("Hans Hansen (udpeget af Folketinget)") == "Hans Hansen"
    assert canon.clean_name("Plain  Name") == "Plain Name"
    # no marker → parens kept
    assert canon.clean_name("Acme (Denmark)") == "Acme (Denmark)"


def test_rule_typing_m13():
    assert canon.rule_entity_type("A", "B", None) == "person"
    assert canon.rule_entity_type(None, "Solo", None) == "institution"
    assert canon.rule_entity_type("Solo", None, None) == "institution"
    assert canon.rule_entity_type("A", "B", "GRP") == "institution"


def test_typing_on_synth_entities_matches_golden():
    ents = synth.entities_table()
    typed = canon.type_entities_batch(canon.clean_names_batch(ents))
    golden = ents.column("entity_type").to_pylist()
    got = typed.column("entity_type_rule").to_pylist()
    assert got == golden


def test_token_set_ratio_symmetric_and_fuzzy():
    assert canon.token_set_ratio("Miljø Styrelsen", "Styrelsen Miljø") == 100
    assert canon.token_set_ratio("abc", "abc") == 100
    assert canon.token_set_ratio("abc def", "abc") >= 85
    assert canon.token_set_ratio("xyz", "abc") < 50


def test_cluster_block_deterministic_min_head():
    import pandas as pd

    df = pd.DataFrame({"norm": ["styrelsen miljø", "miljø styrelsen"]})
    out = canon.cluster_block(df)
    assert set(out["canonical"]) == {"miljø styrelsen"}


def test_same_name_groups_d5():
    ents = synth.entities_table()
    edges = canon.same_name_groups(ents)
    pairs = set(
        zip(edges.column("entity_id").to_pylist(), edges.column("same_named_id").to_pylist())
    )
    assert (3000, 3001) in pairs and (3001, 3000) in pairs


def test_salted_surface_stats_and_map(ray_session):
    import ray.data as rd

    surfaces = ["Acme Holdings"] * 50 + ["Holdings Acme"] * 3 + ["Zeta Corp"] * 2
    ds = rd.from_arrow(
        pa.table({"surface": pa.array(surfaces), "label": pa.array(["MISC"] * len(surfaces))})
    )
    stats = canon.surface_stats(ds, n_salts=4)
    rows = {r["norm"]: r["n_mentions"] for r in stats.take_all()}
    assert rows == {"acme holdings": 50, "holdings acme": 3, "zeta corp": 2}
    cmap = canon.canonical_surface_map(stats).take_all()
    m = {r["norm"]: r["canonical"] for r in cmap}
    assert m["holdings acme"] == "acme holdings"
    assert m["acme holdings"] == "acme holdings"
    assert m["zeta corp"] == "zeta corp"
