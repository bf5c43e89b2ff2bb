"""Gazetteer NER + pattern OpenIE (SURVEY.md T4, G1-analog text path)."""

from __future__ import annotations

import pyarrow as pa

from knowledge_graph_ray.stages.ner import GazetteerNER, compile_gazetteer
from knowledge_graph_ray.stages.openie import PatternOpenIE


def para_batch(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "para_idx": pa.array([0] * len(texts), pa.int32()),
            "text": pa.array(texts, pa.string()),
        }
    )


GAZ = [("Orga 1", "ORG"), ("Orga 12", "ORG"), ("Pera1 Sonsen1", "PER"), ("Dr Pera1", "PER")]
LOCS = ["City3"]


def test_longest_match_wins():
    ner = GazetteerNER(gazetteer=GAZ, locations=LOCS, generic=False)
    out = ner(para_batch(["Orga 12 acquired Orga 1 today."]))
    assert out.column("surface").to_pylist() == ["Orga 12", "Orga 1"]


def test_no_match_inside_longer_token():
    pat = compile_gazetteer(["Orga 1"])
    assert pat.search("Orga 12") is None


def test_ner_offsets_and_labels():
    ner = GazetteerNER(gazetteer=GAZ, locations=LOCS, generic=False)
    text = "Dr Pera1 works for Orga 1 in City3."
    out = ner(para_batch([text]))
    rows = list(
        zip(
            out.column("surface").to_pylist(),
            out.column("label").to_pylist(),
            out.column("start").to_pylist(),
            out.column("end").to_pylist(),
        )
    )
    assert rows == [
        ("Dr Pera1", "PER", 0, 8),
        ("Orga 1", "ORG", 19, 25),
        ("City3", "LOC", 29, 34),
    ]
    for surf, _, s, e in rows:
        assert text[s:e] == surf


def test_generic_spans_not_overlapping():
    ner = GazetteerNER(gazetteer=GAZ, locations=LOCS, generic=True)
    out = ner(para_batch(["The Unknown Corp hired Pera1 Sonsen1."]))
    surfaces = out.column("surface").to_pylist()
    labels = dict(zip(surfaces, out.column("label").to_pylist()))
    assert "Pera1 Sonsen1" in surfaces and labels["Pera1 Sonsen1"] == "PER"
    assert labels.get("The Unknown Corp") == "MISC"


def test_openie_svo():
    ie = PatternOpenIE(gazetteer=[g for g, _ in GAZ], locations=LOCS)
    out = ie(para_batch(["Pera1 Sonsen1 works for Orga 12. Orga 1 is located in City3."]))
    triples = list(
        zip(
            out.column("subj_surface").to_pylist(),
            out.column("pred").to_pylist(),
            out.column("obj_surface").to_pylist(),
            out.column("obj_kind").to_pylist(),
        )
    )
    assert ("Pera1 Sonsen1", "works_for", "Orga 12", "ent") in triples
    assert ("Orga 1", "located_in", "City3", "loc") in triples


def test_openie_no_verb_no_triple():
    ie = PatternOpenIE(gazetteer=[g for g, _ in GAZ], locations=LOCS)
    out = ie(para_batch(["Orga 1 and Orga 12 had a meeting about nothing."]))
    assert out.num_rows == 0


def test_openie_generic_fallback():
    ie = PatternOpenIE()  # no gazetteer → capitalized spans
    out = ie(para_batch(["Alpha Corp acquired Beta Systems."]))
    assert out.column("subj_surface").to_pylist() == ["Alpha Corp"]
    assert out.column("obj_surface").to_pylist() == ["Beta Systems"]
    assert out.column("obj_kind").to_pylist() == ["span"]


def test_openie_fast_path_matches_full_scan_fuzz():
    # the verb-anchored fast path must be bit-identical to
    # pattern.finditer semantics (leftmost subject, longest-first
    # alternatives, non-overlapping consumption)
    import random

    from knowledge_graph_ray.stages.openie import PatternOpenIE

    gaz = [f"Orga {i}" for i in range(30)] + ["Alpha Beta", "Alpha", "Beta Gamma"]
    ie = PatternOpenIE(gazetteer=gaz, locations=["Kobenhavn", "Aarhus"])
    assert ie.verb_pattern is not None
    verbs = ["is located in", "partnered with", "works for", "acquired",
             "advises", "leads", "met"]
    toks = gaz + verbs + ["and", "the", "x", "Y,", ".", ",", "  ", "Xx", "Kobenhavn"]
    rng = random.Random(13)
    for _ in range(1500):
        t = " ".join(rng.choice(toks) for _ in range(rng.randint(0, 22)))
        slow = ie.extract(t)
        fast = [(s, p, o, ie._kind(o)) for _, s, p, o in ie._matches_fast(t)]
        assert fast == slow, t


def test_openie_fast_path_disabled_when_surface_contains_verb():
    from knowledge_graph_ray.stages.openie import PatternOpenIE

    ie = PatternOpenIE(gazetteer=["Group leads Council", "Orga 1"], locations=[])
    assert ie.verb_pattern is None  # falls back to the full scan
    # and the full scan still finds the leftmost long-subject match
    out = ie.extract("Group leads Council met Orga 1 today")
    assert out == [("Group leads Council", "met", "Orga 1", "ent")]


def test_trie_alternation_matches_flat_fuzz():
    import random
    import re as _re

    from knowledge_graph_ray.stages.ner import trie_alternation

    def flat(surfaces):
        alts = sorted({s for s in surfaces if s}, key=len, reverse=True)
        return _re.compile(r"\b(?:" + "|".join(_re.escape(s) for s in alts) + r")\b")

    base = ["Orga", "Orga 1", "Orga 12", "Orga 123", "A.B", "A.B.C",
            "X-ray", "X", "Alpha Beta", "Alpha", "Beta"]
    rng = random.Random(5)
    for _ in range(800):
        surf = rng.sample(base, rng.randint(1, 8))
        f = flat(surf)
        t = _re.compile(r"\b" + trie_alternation(surf) + r"\b")
        toks = surf + ["xOrga", "Orga 1234", "and", ".", "Orga 12x", "A.B.Cd"]
        text = " ".join(rng.choice(toks) for _ in range(rng.randint(0, 15)))
        fm = [(m.start(), m.group(0)) for m in f.finditer(text)]
        tm = [(m.start(), m.group(0)) for m in t.finditer(text)]
        assert fm == tm, (surf, text)
