"""OpenIE stage: dependency-pattern-style SVO triple extraction as an
actor-pool ``map_batches`` class (north rule; reference analog is the
table-driven emission in rdf_graph.ipynb — here the text path).

Deterministic pattern extractor: a triple is emitted for every
non-overlapping occurrence of

    <entity-surface> <verb-phrase> <entity-surface | location>

where entity surfaces come from a broadcast gazetteer (longest-first
alternation), verb phrases from a fixed predicate lexicon (multi-word
phrases first), locations from a location lexicon. With no gazetteer,
a generic capitalized-span pattern is used (real-corpus fallback).

Output triples_raw schema:
(doc_id:int64, para_idx:int32, subj_surface:string, pred:string,
 obj_surface:string, obj_kind:string in {'ent','loc','span'})
"""

from __future__ import annotations

import re

import pyarrow as pa

from knowledge_graph_ray.stages.ner import _maybe_get

# predicate lexicon: verb phrase -> canonical predicate name
DEFAULT_VERBS: dict[str, str] = {
    "is located in": "located_in",
    "partnered with": "partnered_with",
    "works for": "works_for",
    "acquired": "acquired",
    "advises": "advises",
    "leads": "leads",
    "met": "met",
}

_CAP_SPAN = r"[A-Z][\w]*(?: [A-Z][\w]*)*"


def _alt(surfaces: list[str]) -> str:
    return "|".join(
        re.escape(s) for s in sorted(set(surfaces), key=len, reverse=True)
    )


class PatternOpenIE:
    """Callable class for ``map_batches(PatternOpenIE, concurrency=N,
    fn_constructor_kwargs={'gazetteer': ref, 'locations': ref})``.

    Regex state compiled once per actor (__init__), scanned per batch.
    """

    def __init__(self, gazetteer=None, locations=None, verbs: dict[str, str] | None = None):
        gaz = list(_maybe_get(gazetteer) or [])
        locs = list(_maybe_get(locations) or [])
        self.verbs = dict(verbs or DEFAULT_VERBS)
        verb_alt = _alt(list(self.verbs))
        if gaz:
            ent = _alt(gaz)
            obj_alt = ent + ("|" + _alt(locs) if locs else "")
            pat = rf"\b(?P<s>{ent})\s+(?P<v>{verb_alt})\s+(?P<o>{obj_alt})\b"
        else:
            pat = rf"\b(?P<s>{_CAP_SPAN})\s+(?P<v>{verb_alt})\s+(?P<o>{_CAP_SPAN})\b"
        self.pattern = re.compile(pat)
        self.ent_surfaces = set(gaz)
        self.loc_surfaces = set(locs)

    def _kind(self, surface: str) -> str:
        if surface in self.ent_surfaces:
            return "ent"
        if surface in self.loc_surfaces:
            return "loc"
        return "span"

    def extract(self, text: str) -> list[tuple[str, str, str, str]]:
        out = []
        for m in self.pattern.finditer(text):
            pred = self.verbs[m.group("v")]
            obj = m.group("o")
            out.append((m.group("s"), pred, obj, self._kind(obj)))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        para_idx = batch.column("para_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        o_doc, o_para, o_s, o_p, o_o, o_k = [], [], [], [], [], []
        for did, pidx, text in zip(doc_ids, para_idx, texts):
            for s, p, o, k in self.extract(text or ""):
                o_doc.append(did)
                o_para.append(pidx)
                o_s.append(s)
                o_p.append(p)
                o_o.append(o)
                o_k.append(k)
        return pa.table(
            {
                "doc_id": pa.array(o_doc, pa.int64()),
                "para_idx": pa.array(o_para, pa.int32()),
                "subj_surface": pa.array(o_s, pa.string()),
                "pred": pa.array(o_p, pa.string()),
                "obj_surface": pa.array(o_o, pa.string()),
                "obj_kind": pa.array(o_k, pa.string()),
            }
        )
