"""Entity linking stage (SURVEY.md J7 + T7): exact alias probe, then
ANN candidate scoring over canonical entity embeddings, then NIL →
canonical-surface fallback.

Reference analog: alias dict probe (danlp_experiments.ipynb cell 4)
and FAISS IVFFlat search over entity vectors
(semantic_search_two_towers.py:24-56; create_faiss_index.py:43-68).

Ray design: the entity side is SMALL relative to the corpus (17k in
the reference, bounded in general) — it is broadcast ONCE via
``ray.put`` and each linker actor builds its probe dict + ANN index
in ``__init__``, never per batch. Two ANN backends:

- ``brute``: exact cosine via one numpy matmul per batch of surfaces
  (the correctness baseline; also the reference's exact fallback,
  not_in_use_search_function.py:54-63).
- ``lsh``: random-hyperplane signatures bucketing entity vectors;
  query probes its bucket plus all Hamming-1 neighbors (scale path —
  probe cost independent of entity count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from knowledge_graph_ray.functions.canon import normalize_surface
from knowledge_graph_ray.stages.embed import HashEmbedder
from knowledge_graph_ray.stages.ner import _maybe_get

DEFAULT_THRESHOLD = 0.35


class LshIndex:
    """Random-hyperplane LSH over unit vectors (deterministic seed)."""

    def __init__(self, matrix: np.ndarray, nbits: int = 12, seed: int = 42):
        dim = matrix.shape[1]
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits)).astype(np.float32)
        self.nbits = nbits
        sigs = self._sign(matrix)
        self.buckets: dict[int, list[int]] = {}
        for i, s in enumerate(sigs):
            self.buckets.setdefault(int(s), []).append(i)
        self.matrix = matrix

    def _sign(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes) > 0
        return (bits * (1 << np.arange(self.nbits, dtype=np.int64))).sum(axis=1)

    def candidates(self, vec: np.ndarray) -> list[int]:
        return self.candidates_for_sig(int(self._sign(vec[None, :])[0]))

    def candidates_for_sig(self, sig: int) -> list[int]:
        cands = list(self.buckets.get(sig, []))
        for b in range(self.nbits):  # Hamming-1 probes
            cands.extend(self.buckets.get(sig ^ (1 << b), []))
        return cands


class EntityLinker:
    """Callable class for ``map_batches`` over ``triples_raw`` rows
    (subj_surface / obj_surface) or ``mentions`` rows (surface).

    Resolution order per surface:
    1. exact: normalized surface in the alias map → ``entity:{id}``
    2. ann: embed the surface; best cosine >= threshold → ``entity:{id}``
    3. nil: canonical-surface map (from salted canonicalization) →
       ``surface:{canonical}`` (or the normalized surface itself).
    Location objects stay literal.
    """

    def __init__(
        self,
        alias_pairs=None,  # list[(alias, entity_id)] or ObjectRef
        entity_ids=None,  # list[int] or ObjectRef
        entity_vecs=None,  # np.ndarray (n, dim) or ObjectRef
        canonical_map=None,  # dict[norm -> canonical norm] or ObjectRef
        dim: int = 64,
        threshold: float = DEFAULT_THRESHOLD,
        ann: str = "brute",
        cache_cap: int = 1_000_000,
    ):
        pairs = _maybe_get(alias_pairs) or []
        self.exact: dict[str, int] = {}
        for alias, eid in pairs:
            key = normalize_surface(alias)
            prev = self.exact.get(key)
            # deterministic conflict resolution: min entity_id wins
            self.exact[key] = eid if prev is None else min(prev, eid)
        self.entity_ids = list(_maybe_get(entity_ids) or [])
        vecs = _maybe_get(entity_vecs)
        self.matrix = np.asarray(vecs, dtype=np.float32) if vecs is not None else None
        # brute scoring runs in float64: BLAS gemm and gemv accumulate
        # float32 differently (~2e-7), so near-tie argmax/threshold
        # decisions could flip across builds; float64 keeps the batched
        # gemm decision-identical to sequential scoring (entity side is
        # small, so the 2× matrix copy is bounded). LSH keeps the old
        # per-candidate float32 math.
        self.matrix64 = (
            self.matrix.T.astype(np.float64) if self.matrix is not None else None
        )
        self.canonical_map: dict[str, str] = dict(_maybe_get(canonical_map) or {})
        self.embedder = HashEmbedder(dim)
        self.threshold = threshold
        self.ann = ann
        self.index = (
            LshIndex(self.matrix) if (ann == "lsh" and self.matrix is not None) else None
        )
        # surface -> resolved id (per actor). Bounded: open-vocabulary
        # corpora (the no-gazetteer _CAP_SPAN mode) produce unbounded
        # distinct surfaces, so an uncapped dict is actor-lifetime
        # memory growth. Cleared wholesale above ``cache_cap`` at a
        # batch boundary (the in-batch dedupe in resolve_many captures
        # most of the win; the cross-batch cache is just a bonus).
        self._cache: dict[str, str] = {}
        self._cache_cap = int(cache_cap)

    # ---------------------------------------------------------- core
    def resolve(self, surface: str) -> str:
        return self.resolve_many([surface])[0]

    def resolve_many(self, surfaces: list[str]) -> list[str]:
        """Batch resolution: dedupe the batch's unresolved surfaces and
        score ALL ANN misses against the entity matrix in ONE matmul
        (gemm) instead of one gemv per surface — the flagship's actor
        stage is dominated by this path, and web corpora repeat
        surfaces heavily so the dedupe alone removes most work."""
        if len(self._cache) > self._cache_cap:  # batch-boundary only:
            self._cache.clear()  # mid-call placeholders are never dropped
        pending_surf: list[str] = []
        pending_norm: list[str] = []
        for s in surfaces:
            if s in self._cache:
                continue
            norm = normalize_surface(s)
            eid = self.exact.get(norm)
            if eid is not None:
                self._cache[s] = f"entity:{eid}"
            elif self.matrix is not None and len(self.entity_ids):
                pending_surf.append(s)
                pending_norm.append(norm)
                self._cache[s] = ""  # placeholder: dedupes repeats within batch
            else:
                self._cache[s] = self._nil(norm)
        if pending_surf:
            vecs = self.embedder.encode(pending_norm)  # (m, dim), one pass
            if self.index is not None:
                sigs = self.index._sign(vecs)  # ONE signing matmul per batch
                for s, norm, vec, sig in zip(pending_surf, pending_norm, vecs, sigs):
                    cand = self.index.candidates_for_sig(int(sig))
                    if cand:
                        scores = self.matrix[cand] @ vec
                        best = int(np.argmax(scores))
                        self._cache[s] = (
                            f"entity:{self.entity_ids[cand[best]]}"
                            if scores[best] >= self.threshold
                            else self._nil(norm)
                        )
                    else:
                        self._cache[s] = self._nil(norm)
            else:
                # (m, n_entities): ONE matmul, float64 (see __init__)
                scores = vecs.astype(np.float64) @ self.matrix64
                best = np.argmax(scores, axis=1)
                best_scores = scores[np.arange(len(best)), best]
                for s, norm, b, sc in zip(pending_surf, pending_norm, best, best_scores):
                    self._cache[s] = (
                        f"entity:{self.entity_ids[int(b)]}"
                        if sc >= self.threshold
                        else self._nil(norm)
                    )
        return [self._cache[s] for s in surfaces]

    def _nil(self, norm: str) -> str:
        return "surface:" + self.canonical_map.get(norm, norm)

    # ------------------------------------------------------ map_batches
    def __call__(self, batch: pa.Table) -> pa.Table:
        if "subj_surface" in batch.column_names:
            return self._link_triples(batch)
        return self._link_mentions(batch)

    def _link_triples(self, batch: pa.Table) -> pa.Table:
        subs = batch.column("subj_surface").to_pylist()
        objs = batch.column("obj_surface").to_pylist()
        kinds = batch.column("obj_kind").to_pylist()
        ent_objs = [o for o, k in zip(objs, kinds) if k == "ent"]
        resolved = self.resolve_many(subs + ent_objs)  # one batched pass
        subj = resolved[: len(subs)]
        it = iter(resolved[len(subs) :])
        obj = [next(it) if k == "ent" else o for o, k in zip(objs, kinds)]
        literal = [k != "ent" for k in kinds]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "subj": pa.array(subj, pa.string()),
                "pred": batch.column("pred"),
                "obj": pa.array(obj, pa.string()),
                "obj_is_literal": pa.array(literal, pa.bool_()),
            }
        )

    def _link_mentions(self, batch: pa.Table) -> pa.Table:
        surfaces = batch.column("surface").to_pylist()
        resolved = self.resolve_many(surfaces)
        return batch.append_column("entity", pa.array(resolved, pa.string()))


class ExtractLinkActor:
    """Fused OpenIE + linking actor (operator fusion: one pool, one
    hop — extraction output never re-enters the object store)."""

    def __init__(
        self,
        gazetteer=None,
        locations=None,
        verbs=None,
        tagger_loader=None,
        **linker_kwargs,
    ):
        from knowledge_graph_ray.stages.openie import ModelOpenIE, PatternOpenIE

        if tagger_loader is not None:
            # model-driven extraction (ModelNER loader contract): spans
            # from trained weights loaded once per actor, same fused
            # one-hop layout
            self.ie = ModelOpenIE(tagger_loader, verbs=verbs)
        else:
            self.ie = PatternOpenIE(
                gazetteer=gazetteer, locations=locations, verbs=verbs
            )
        self.linker = EntityLinker(**linker_kwargs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.linker(self.ie(batch))
