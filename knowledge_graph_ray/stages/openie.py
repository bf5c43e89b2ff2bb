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
    # trie-collapsed, match-equivalent to the flat longest-first
    # alternation (see ner.trie_alternation) — O(shared prefix) per
    # position instead of O(alternatives)
    from knowledge_graph_ray.stages.ner import trie_alternation

    return trie_alternation(surfaces)


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
            # verb-anchored fast path: scanning the FULL alternation at
            # every text position is O(positions × surfaces); verbs are
            # a tiny lexicon, so scan for them alone, then try the
            # subject alternation only on the short window before each
            # verb hit and the object alternation anchored right after
            self.verb_pattern = re.compile(rf"\b(?P<v>{verb_alt})\s+")
            self.subj_pattern = re.compile(rf"(?P<s>{ent})$")
            self.obj_pattern = re.compile(rf"(?P<o>{obj_alt})\b")
            self.max_subj = max(len(s) for s in gaz)
            # the fast path anchors on verb hits; a surface that itself
            # contains a verb phrase could start a leftmost match the
            # verb-anchored walk misses — fall back to the full scan
            verb_in_surface = re.compile(rf"\b(?:{verb_alt})\b")
            if any(verb_in_surface.search(s) for s in gaz + locs):
                self.verb_pattern = None
            # a verb phrase that is a proper prefix of another (custom
            # ``verbs``) lets the FULL regex backtrack longer→shorter
            # verb at one position when the longer verb's object fails
            # (e.g. verbs {'works for','works'}, object 'for Yard');
            # finditer on the verb alternation consumes the longer hit
            # and never retries the shorter — fall back to the full scan
            # (DEFAULT_VERBS has no prefix pairs, so the flagship keeps
            # the fast path)
            vkeys = sorted(self.verbs)
            if any(
                b.startswith(a)
                for a, b in zip(vkeys, vkeys[1:])
            ):
                self.verb_pattern = None
        else:
            pat = rf"\b(?P<s>{_CAP_SPAN})\s+(?P<v>{verb_alt})\s+(?P<o>{_CAP_SPAN})\b"
            self.verb_pattern = None
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

    def _matches_fast(self, text: str):
        """Verb-anchored scan, bit-identical to
        ``pattern.finditer(text)`` (leftmost subject start, longest-
        first alternatives, non-overlapping consumption) but O(verb
        hits) alternation work instead of O(text positions)."""
        out = []
        last_end = 0
        for vm in self.verb_pattern.finditer(text):
            a = vm.start()
            if a < last_end:
                continue
            w = a
            while w > last_end and text[w - 1].isspace():
                w -= 1
            if w == a:  # no \s+ separator before the verb
                continue
            win_start = max(last_end, w - self.max_subj)
            window = text[win_start:w]
            pos = 0
            sm = None
            while True:
                sm = self.subj_pattern.search(window, pos)
                if sm is None:
                    break
                q_abs = win_start + sm.start("s")
                # true \b in the FULL text (the window slice can fake
                # a word boundary at its left edge)
                prev = text[q_abs - 1] if q_abs > 0 else " "
                if not (prev.isalnum() or prev == "_"):
                    break
                pos = sm.start("s") + 1
            if sm is None:
                continue
            om = self.obj_pattern.match(text, vm.end())
            if om is None:
                continue
            obj = om.group("o")
            out.append((win_start + sm.start("s"), sm.group("s"),
                        self.verbs[vm.group("v")], obj))
            last_end = om.end()
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        doc_ids = batch.column("doc_id").to_pylist()
        para_idx = batch.column("para_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        # ONE regex scan over the whole batch: rows are joined with a
        # \x00 separator no pattern element can match or span (the
        # alternations contain only \w/space/punct literals), so the
        # match set is exactly the union of per-row matches; match
        # offsets map back to rows via one vectorized searchsorted.
        joined = "\x00".join(t or "" for t in texts)
        starts = np.zeros(len(texts), dtype=np.int64)
        if len(texts) > 1:
            lens = np.fromiter(
                (len(t or "") + 1 for t in texts), dtype=np.int64, count=len(texts)
            )
            np.cumsum(lens[:-1], out=starts[1:])
        m_pos, m_s, m_p, m_o, m_k = [], [], [], [], []
        if self.verb_pattern is not None:
            for pos0, s, p, obj in self._matches_fast(joined):
                m_pos.append(pos0)
                m_s.append(s)
                m_p.append(p)
                m_o.append(obj)
                m_k.append(self._kind(obj))
        else:
            for m in self.pattern.finditer(joined):
                obj = m.group("o")
                m_pos.append(m.start())
                m_s.append(m.group("s"))
                m_p.append(self.verbs[m.group("v")])
                m_o.append(obj)
                m_k.append(self._kind(obj))
        rows = np.searchsorted(starts, np.asarray(m_pos, dtype=np.int64), side="right") - 1
        o_doc = [doc_ids[r] for r in rows]
        o_para = [para_idx[r] for r in rows]
        o_s, o_p, o_o, o_k = m_s, m_p, m_o, m_k
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


class ModelOpenIE:
    """SVO extraction driven by a TRAINED tagger instead of the
    gazetteer alternation: entity spans come from ``model_loader()``
    (the ``ModelNER`` contract — ``predict(list[str]) ->
    list[list[(surface, label, start, end)]]``, e.g.
    ``stages.tagger.load_tagger``), and a triple is emitted when the
    text between two consecutive spans is EXACTLY a verb phrase from
    the predicate lexicon — the same

        <entity-span> \\s+ <verb-phrase> \\s+ <entity-or-loc-span>

    semantics as ``PatternOpenIE`` in gazetteer mode, including
    left-to-right object consumption (a span consumed as an object is
    not reused as the next subject, mirroring the regex's
    non-overlapping ``finditer`` walk). Output schema is identical, so
    the fused link stage and everything downstream is unchanged."""

    def __init__(self, model_loader, verbs: dict[str, str] | None = None):
        self.model = model_loader()  # once per actor (weights load)
        self.verbs = dict(verbs or DEFAULT_VERBS)
        self.gap_pattern = re.compile(
            r"\s+(?P<v>" + "|".join(map(re.escape, sorted(self.verbs, key=len, reverse=True))) + r")\s+"
        )

    def extract(self, text: str) -> list[tuple[str, str, str, str]]:
        spans = self.model.predict([text])[0]
        out: list[tuple[str, str, str, str]] = []
        consumed = -1
        for i in range(len(spans) - 1):
            if i == consumed:
                continue
            s_surf, s_lab, _, s1 = spans[i]
            o_surf, o_lab, o0, _ = spans[i + 1]
            if s_lab == "LOC":  # subjects are entities, not locations
                continue
            m = self.gap_pattern.fullmatch(text, s1, o0)
            if m is None:
                continue
            kind = "loc" if o_lab == "LOC" else "ent"
            out.append((s_surf, self.verbs[m.group("v")], o_surf, kind))
            consumed = i + 1
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
