"""NER stage (SURVEY.md T4/T5 analog): gazetteer + regex tagger as an
actor-pool ``map_batches`` class.

The reference tags with flair (extract_entities.py:16,29-50) and a
transformers pipeline (entity_alias_mapping.ipynb cells 15-16); model
NER isn't available here, so the engine ships a deterministic
gazetteer/regex tagger with the same operator shape: pattern state is
compiled ONCE per actor in ``__init__``; ``__call__`` is a vectorized
scan per batch. A model-backed tagger drops in by subclassing and
replacing ``_tag_text``.

Output mentions schema (SURVEY.md §1):
(doc_id:int64, para_idx:int32, surface:string, label:string,
 start:int32, end:int32)
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray

_GENERIC_SPAN = re.compile(r"\b[A-Z][\w]*(?: [A-Z][\w]*)*\b")


def _maybe_get(obj):
    return ray.get(obj) if isinstance(obj, ray.ObjectRef) else obj


def trie_alternation(surfaces: list[str]) -> str:
    """Trie-collapsed alternation body, match-equivalent to the flat
    longest-first alternation ``(?:s1|s2|...)`` but O(shared-prefix)
    for the regex engine instead of O(alternatives) per text position
    (a 17k-alias gazetteer makes the flat form the scan bottleneck).
    Longest-match order is preserved: shared suffixes become GREEDY
    optional groups — ``(?:X)?`` tries X before empty, and the engine
    backtracks shorter exactly like the flat longest-first form."""
    trie: dict = {}
    for s in sorted(set(surfaces)):
        if not s:
            continue
        node = trie
        for ch in s:
            node = node.setdefault(ch, {})
        node["\0"] = None  # terminal marker (no surface contains NUL)

    def emit(node: dict) -> str | None:
        keys = sorted(k for k in node if k != "\0")
        terminal = "\0" in node
        if not keys:
            return None
        branches = []
        for k in keys:
            sub = emit(node[k])
            branches.append(re.escape(k) + (sub or ""))
        body = branches[0] if len(branches) == 1 else "(?:" + "|".join(branches) + ")"
        if terminal:
            return "(?:" + body + ")?"
        return body

    return "(?:" + (emit(trie) or "") + ")"


def compile_gazetteer(surfaces: list[str]) -> re.Pattern | None:
    """Longest-match gazetteer scanner with word boundaries so 'Orga 1'
    never matches inside 'Orga 12' (trie-collapsed — see
    ``trie_alternation``)."""
    if not surfaces:
        return None
    return re.compile(r"\b" + trie_alternation(surfaces) + r"\b")


class GazetteerNER:
    """Callable class for ``map_batches(GazetteerNER, concurrency=N,
    fn_constructor_kwargs=...)`` over paragraph rows.

    Parameters
    ----------
    gazetteer : list[(surface, label)] or ObjectRef — known entity
        surfaces (aliases) with labels, broadcast once via ``ray.put``.
    locations : list[str] or ObjectRef — location lexicon (LOC label).
    generic : also emit capitalized spans not covered by the gazetteer
        as MISC mentions (canonicalization input for unknown entities).
    """

    def __init__(self, gazetteer=None, locations=None, generic: bool = True):
        gaz = _maybe_get(gazetteer) or []
        locs = _maybe_get(locations) or []
        self.label_of: dict[str, str] = {s: lab for s, lab in gaz}
        for s in locs:
            self.label_of.setdefault(s, "LOC")
        self.pattern = compile_gazetteer(list(self.label_of))
        self.generic = generic

    def _tag_text(self, text: str) -> list[tuple[str, str, int, int]]:
        found: list[tuple[str, str, int, int]] = []
        covered: list[tuple[int, int]] = []
        if self.pattern is not None:
            for m in self.pattern.finditer(text):
                found.append((m.group(0), self.label_of[m.group(0)], m.start(), m.end()))
                covered.append((m.start(), m.end()))
        if self.generic:
            for m in _GENERIC_SPAN.finditer(text):
                if any(s < m.end() and m.start() < e for s, e in covered):
                    continue
                found.append((m.group(0), "MISC", m.start(), m.end()))
        found.sort(key=lambda t: t[2])
        return found

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        para_idx = batch.column("para_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        o_doc, o_para, o_surf, o_lab, o_start, o_end = [], [], [], [], [], []
        for did, pidx, text in zip(doc_ids, para_idx, texts):
            for surf, lab, s, e in self._tag_text(text or ""):
                o_doc.append(did)
                o_para.append(pidx)
                o_surf.append(surf)
                o_lab.append(lab)
                o_start.append(s)
                o_end.append(e)
        return pa.table(
            {
                "doc_id": pa.array(o_doc, pa.int64()),
                "para_idx": pa.array(o_para, pa.int32()),
                "surface": pa.array(o_surf, pa.string()),
                "label": pa.array(o_lab, pa.string()),
                "start": pa.array(o_start, pa.int32()),
                "end": pa.array(o_end, pa.int32()),
            }
        )


class ModelNER(GazetteerNER):
    """Integration point for a REAL tagger (the reference's flair
    SequenceTagger, extract_entities.py:16,29-50): same mentions
    schema as GazetteerNER, model loaded ONCE per actor from a
    zero-arg ``model_loader`` — e.g.
    ``lambda: SequenceTagger.load("flair/ner-danish")``. The loader's
    object must expose ``predict(list[str]) ->
    list[list[(surface, label, start, end)]]`` (one span list per
    text). Deploy on GPUs via ``map_batches(ModelNER, concurrency=N,
    num_gpus=1, fn_constructor_kwargs={"model_loader": load})``.
    """

    def __init__(self, model_loader):
        super().__init__(gazetteer=None, locations=None, generic=False)
        self.model = model_loader()  # once per actor

    def _tag_text(self, text: str) -> list[tuple[str, str, int, int]]:
        spans = self.model.predict([text])[0]
        return sorted(
            ((surf, lab, int(s), int(e)) for surf, lab, s, e in spans),
            key=lambda t: t[2],
        )


class ModelTypeFlipActor:
    """T5 model-based entity typing (entity_alias_mapping.ipynb cells
    15-16): flip a rule-typed ``person`` to ``institution`` when a
    transformers NER pipeline tags the NAME itself as an organisation
    — the upgrade pass the reference runs over the Aktør table after
    the M13 rules.

    ``model_loader`` is called ONCE per actor and must return a
    callable with the HF ``pipeline('ner', aggregation_strategy=...)``
    interface: ``model(list[str]) -> list[list[dict]]`` where each
    span dict carries ``entity_group`` (the reference chunks names
    100 at a time — pass ``batch_size=100`` to ``map_batches`` for the
    same shape). Rows whose rule type is already ``institution`` are
    never un-flipped (reference semantics: the model only upgrades).
    """

    def __init__(
        self,
        model_loader,
        name_col: str = "name",
        type_col: str = "entity_type_rule",
        out_col: str = "entity_type",
        org_labels: tuple = ("ORG",),
    ):
        self.model = model_loader()  # once per actor (weights / device)
        self.name_col = name_col
        self.type_col = type_col
        self.out_col = out_col
        self.org_labels = set(org_labels)

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = [n or "" for n in batch.column(self.name_col).to_pylist()]
        types = batch.column(self.type_col).to_pylist()
        preds = self.model(names)
        out = [
            "institution"
            if t == "person"
            and any(s.get("entity_group") in self.org_labels for s in spans)
            else t
            for t, spans in zip(types, preds)
        ]
        return batch.append_column(self.out_col, pa.array(out, pa.string()))
