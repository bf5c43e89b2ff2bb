"""Model-backed stage integration contract (SURVEY.md T1-T5): a
transformers-style encoder/tagger drops into the actor-pool stages
via constructor hooks — model loaded once per actor, batched
inference, 511-token truncation (reference bert_embed.py:74-76),
num_gpus-ready signature. The fakes here stand in for real models
(none ship in this sandbox) and pin the CONTRACT.

NOTE: the fake model classes are defined INSIDE the test functions —
Ray workers cannot import pytest test modules, so anything shipped to
an actor from here must be serialized by value (function-local
classes are; module-level ones are pickled by reference and hang the
actor pool in an import-retry loop)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def test_model_embed_actor_contract(ray_session):
    from knowledge_graph_ray.stages.embed import ModelEmbedActor

    class FakeEncoder:
        """SentenceTransformer-shaped: encode(list[str]) -> (n, dim)."""

        def __init__(self, dim: int = 16):
            self.dim = dim

        def encode(self, texts):
            out = np.zeros((len(texts), self.dim), dtype=np.float32)
            for i, t in enumerate(texts):
                out[i, 0] = len(t.split())  # deterministic, inspectable
            return out

    long_text = " ".join(f"tok{i}" for i in range(600))  # > 511 tokens
    tbl = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "text": pa.array([long_text, "short text"] * 4),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ModelEmbedActor,
            fn_constructor_kwargs={
                "model_loader": lambda: FakeEncoder(16),
                "dim": 16,
                "max_tokens": 511,
            },
            concurrency=(1, 1),
            batch_size=4,
            num_cpus=1,  # at deploy time: num_gpus=1 pins a device per actor
            batch_format="pyarrow",
        )
        .take_all()
    )
    assert len(out) == 8
    emb = np.array([r["embedding"] for r in out])
    assert emb.shape == (8, 16)
    # truncation: the 600-token text reached the model at exactly 511
    assert {e[0] for e in emb} == {511.0, 2.0}


def test_model_ner_actor_contract(ray_session):
    from knowledge_graph_ray.stages.ner import ModelNER

    class FakeTagger:
        """flair-shaped: predict(list[str]) -> list[list[spans]]."""

        def predict(self, texts):
            out = []
            for t in texts:
                spans = []
                pos = t.find("Orga")
                if pos >= 0:
                    spans.append((t[pos : pos + 6], "ORG", pos, pos + 6))
                out.append(spans)
            return out

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "para_idx": pa.array([0, 0], pa.int32()),
            "text": pa.array(["Pera works at Orga 3 today", "no entities here"]),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ModelNER,
            fn_constructor_kwargs={"model_loader": FakeTagger},
            concurrency=(1, 1),
            batch_format="pyarrow",
        )
        .take_all()
    )
    assert len(out) == 1
    m = out[0]
    assert (m["surface"], m["label"], m["start"], m["end"]) == ("Orga 3", "ORG", 14, 20)
    # schema identical to the gazetteer stage (drop-in)
    assert set(m) == {"doc_id", "para_idx", "surface", "label", "start", "end"}


def test_model_rerank_actor_contract(ray_session):
    from knowledge_graph_ray.stages.rerank import ModelRerankActor

    class FakeCrossEncoder:
        """CrossEncoder-shaped: predict(list[(q, p)]) -> (n,) scores."""

        def predict(self, pairs):
            return np.array([float(len(set(q.split()) & set(p.split()))) for q, p in pairs])

    tbl = pa.table(
        {
            "query": pa.array(["alpha beta", "alpha beta"]),
            "text": pa.array(["beta gamma alpha", "delta"]),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ModelRerankActor,
            fn_constructor_kwargs={"model_loader": FakeCrossEncoder},
            concurrency=(1, 1),
            batch_format="pyarrow",
        )
        .take_all()
    )
    assert [r["rerank_score"] for r in out] == [2.0, 0.0]


def test_loader_imports_framework_module_inside_actor(ray_session, tmp_path):
    # the loader-per-actor path with a REAL import: a dummy module with
    # the sentence-transformers interface is written to a dir visible
    # to workers; the loader imports it INSIDE the actor process (the
    # deploy-time shape: `lambda: SentenceTransformer(name)`)
    from knowledge_graph_ray.stages.embed import ModelEmbedActor

    pkg_dir = "/tmp/fake_frameworks_kgray"
    import os

    os.makedirs(pkg_dir, exist_ok=True)
    with open(os.path.join(pkg_dir, "fake_sentence_transformers.py"), "w") as f:
        f.write(
            "import numpy as np\n"
            "class SentenceTransformer:\n"
            "    def __init__(self, name): self.name = name\n"
            "    def encode(self, texts):\n"
            "        out = np.zeros((len(texts), 8), dtype=np.float32)\n"
            "        for i, t in enumerate(texts): out[i, 1] = len(t)\n"
            "        return out\n"
        )

    def loader():
        import sys

        sys.path.insert(0, "/tmp/fake_frameworks_kgray")
        from fake_sentence_transformers import SentenceTransformer

        return SentenceTransformer("fake/model")

    tbl = pa.table({"text": pa.array(["abc", "defgh"])})
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ModelEmbedActor,
            fn_constructor_kwargs={"model_loader": loader, "dim": 8},
            concurrency=(1, 1),
            batch_format="pyarrow",
        )
        .take_all()
    )
    assert [r["embedding"][1] for r in out] == [3.0, 5.0]


def test_model_type_flip_actor_t5(ray_session):
    # T5: transformers-pipeline-shaped model upgrades rule-typed
    # persons to institutions when the name itself is tagged ORG
    from knowledge_graph_ray.stages.ner import ModelTypeFlipActor

    class FakeNerPipeline:
        def __call__(self, texts):
            return [
                [{"entity_group": "ORG", "word": t}] if "Committee" in t else []
                for t in texts
            ]

    tbl = pa.table(
        {
            "entity_id": pa.array([1, 2, 3], pa.int64()),
            "name": pa.array(["Jane Doe", "Budget Committee", "Fiscal Committee"]),
            "entity_type_rule": pa.array(["person", "person", "institution"]),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ModelTypeFlipActor,
            fn_constructor_kwargs={"model_loader": FakeNerPipeline},
            concurrency=(1, 1),
            batch_size=100,  # the reference's chunk-of-100
            batch_format="pyarrow",
        )
        .take_all()
    )
    got = {r["entity_id"]: r["entity_type"] for r in out}
    assert got == {1: "person", 2: "institution", 3: "institution"}


def test_real_weights_mlp_encoder_through_actor_pool(ray_session):
    """Round-4 verdict item 4: the model path executes REAL persisted
    weights, not a fake — `load_mlp_encoder` reads the checked-in npz
    once per actor and `ModelEmbedActor` runs the forward per batch.
    The loader lives in the library package, so workers import it by
    reference (no by-value pickling caveat)."""
    from knowledge_graph_ray.stages.embed import embed_stage
    from knowledge_graph_ray.stages.mlp_encoder import load_mlp_encoder

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "folketinget vedtog loven",
        "pack my box with five dozen liquor jugs",
        "",
    ] * 4
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = embed_stage(
        rd.from_arrow(tbl),
        model_loader=load_mlp_encoder,
        dim=64,
        concurrency=(1, 2),
        batch_size=4,
        num_cpus=1,
    ).to_pandas().sort_values("doc_id")
    got = np.stack(out["embedding"].to_numpy())
    # actor-pool output == a driver-local forward over the same weights
    want = load_mlp_encoder().encode(texts)
    assert got.shape == (16, 64) and np.allclose(got, want, atol=1e-6)
    # golden pin: the persisted npz itself is part of the contract
    assert np.allclose(
        got[0, :4], [0.040042, 0.060286, 0.248113, 0.096356], atol=1e-5
    )
    # rows are unit vectors (the stage's downstream cosine contract)
    assert np.allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)


def test_real_weights_rerank_through_actor_pool(ray_session):
    """T6 with REAL persisted weights: `load_mlp_cross_scorer` reads
    the checked-in npz once per actor and `ModelRerankActor` scores
    (query, text) pairs through the CrossEncoder contract."""
    from knowledge_graph_ray.stages.mlp_encoder import load_mlp_cross_scorer
    from knowledge_graph_ray.stages.rerank import ModelRerankActor

    tbl = pa.table(
        {
            "query": pa.array(["folketinget vedtog loven"] * 3),
            "text": pa.array(
                [
                    "folketinget vedtog loven i dag",
                    "the quick brown fox",
                    "folketinget vedtog loven",
                ]
            ),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ModelRerankActor,
            fn_constructor_kwargs={"model_loader": load_mlp_cross_scorer},
            concurrency=(1, 1),
            batch_format="pyarrow",
        )
        .take_all()
    )
    scores = [r["rerank_score"] for r in out]
    # actor-pool scores == a driver-local forward over the same weights
    want = load_mlp_cross_scorer().predict(
        list(zip(tbl.column("query").to_pylist(), tbl.column("text").to_pylist()))
    )
    assert np.allclose(scores, np.round(want, 6), atol=1e-6)
    # identical pair scores 1.0; the unrelated text scores strictly lower
    assert abs(scores[2] - 1.0) < 1e-6
    assert scores[1] < scores[0] <= 1.0


def test_mlp_weights_provenance():
    """The checked-in npz equals its documented generation recipe —
    guards silent corruption/drift of the weights file."""
    from knowledge_graph_ray.stages import mlp_encoder as m

    fresh = m._init_weights()
    with np.load(m.WEIGHTS_PATH) as z:
        for k in ("W1", "b1", "W2", "b2"):
            assert np.array_equal(z[k], fresh[k]), k


def test_real_weights_ner_through_actor_pool(ray_session):
    """T4 with REAL TRAINED weights: `load_tagger` reads the
    checked-in softmax-regression npz once per actor and `ModelNER`
    runs the forward per batch. The surfaces here use entity indices
    ≥ 20 — OUTSIDE the 0..19 training range (stages/tagger.py), so
    this pins the model generalizing learned character patterns, not
    replaying a lexicon."""
    from knowledge_graph_ray.stages.ner import ModelNER
    from knowledge_graph_ray.stages.tagger import load_tagger

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 1, 2], pa.int64()),
            "para_idx": pa.array([0, 1, 0], pa.int32()),
            "text": pa.array(
                [
                    "Pera23 Sonsen23 works for Orga 27 A/S.",
                    "The report was published in 1995.",
                    "Orga21 Ltd is located in City9.",
                ]
            ),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ModelNER,
            fn_constructor_kwargs={"model_loader": load_tagger},
            concurrency=(1, 1),
            batch_format="pyarrow",
        )
        .take_all()
    )
    got = {(m["surface"], m["label"]) for m in out}
    assert got == {
        ("Pera23 Sonsen23", "PER"),
        ("Orga 27 A/S", "ORG"),
        ("Orga21 Ltd", "ORG"),
        ("City9", "LOC"),
    }
    # offsets point back into the source text
    by_surf = {m["surface"]: m for m in out}
    m = by_surf["Orga 27 A/S"]
    assert (m["start"], m["end"]) == (26, 37)
    assert set(by_surf["City9"]) == {
        "doc_id", "para_idx", "surface", "label", "start", "end",
    }


def test_real_weights_type_flip_through_actor_pool(ray_session):
    """T5 with REAL TRAINED weights: `load_hf_style_pipeline` exposes
    the transformers-pipeline surface over the same npz;
    `ModelTypeFlipActor` upgrades rule-typed persons whose NAME tags
    as ORG and never un-flips institutions (reference
    entity_alias_mapping.ipynb cells 15-16 semantics)."""
    from knowledge_graph_ray.stages.ner import ModelTypeFlipActor
    from knowledge_graph_ray.stages.tagger import load_hf_style_pipeline

    tbl = pa.table(
        {
            "name": pa.array(
                [
                    "Orga 25 A/S",      # rule said person, model says ORG -> flip
                    "Pera31 Sonsen31",  # genuine person -> keep
                    "Orga 28",          # already institution -> never un-flipped
                ]
            ),
            "entity_type_rule": pa.array(["person", "person", "institution"]),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ModelTypeFlipActor,
            fn_constructor_kwargs={"model_loader": load_hf_style_pipeline},
            concurrency=(1, 1),
            batch_size=100,  # reference chunks names 100 at a time
            batch_format="pyarrow",
        )
        .take_all()
    )
    assert [r["entity_type"] for r in out] == ["institution", "person", "institution"]


def test_tagger_heldout_generalization():
    """Span-level P/R on sentences built ONLY from held-out surface
    indices (persons/orgs 20+, cities 6..11): the north-rule P/R bar
    applied to the trained tagging model itself."""
    from knowledge_graph_ray.stages.tagger import _labeled_sentences, load_tagger

    t = load_tagger()
    sents = _labeled_sentences(range(20, 40), range(20, 30), range(6, 12), 150, seed=7)
    tp = fp = fn = 0
    for text, gold in sents:
        pred = {(s, e, lab) for _, lab, s, e in t.predict([text])[0]}
        gset = {(s, e, lab) for s, e, lab in gold}
        tp += len(pred & gset)
        fp += len(pred - gset)
        fn += len(gset - pred)
    assert tp / max(tp + fp, 1) >= 0.95
    assert tp / max(tp + fn, 1) >= 0.95


def test_tagger_weights_provenance():
    """Retraining with the documented recipe reproduces the checked-in
    npz's BEHAVIOR (argmax labels on held-out text) — guards silent
    drift of weights vs recipe without demanding cross-BLAS bit
    equality of the GD trajectory."""
    from knowledge_graph_ray.stages import tagger as tg

    fresh = tg.NgramTagger(tg._train_weights())
    persisted = tg.load_tagger()
    texts = [
        s
        for s, _ in tg._labeled_sentences(
            range(20, 40), range(20, 30), range(6, 12), 60, seed=11
        )
    ]
    assert fresh.predict(texts) == persisted.predict(texts)


def test_tagger_matches_gazetteer_on_corpus_paragraphs():
    """The trained tagger reproduces the gazetteer oracle's mentions
    EXACTLY (span P/R = 1.0) on real extract→segment paragraphs over
    the full synthetic entity range — including the BIO boundary case
    the segment stage creates by stripping sentence periods (adjacent
    entities must come back as separate spans)."""
    import pyarrow.parquet as pq

    from knowledge_graph_ray.functions.extract import extract_batch
    from knowledge_graph_ray.functions.segment import paragraphs_batch
    from knowledge_graph_ray.sources import synth
    from knowledge_graph_ray.stages.ner import GazetteerNER
    from knowledge_graph_ray.stages.tagger import load_tagger

    paras = paragraphs_batch(extract_batch(synth.pages_table(60)))
    ents = synth.entities_table().to_pylist()
    kind = {r["entity_id"]: ("PER" if r["entity_id"] < 2000 else "ORG") for r in ents}
    gaz = [
        (r["alias"], kind[r["entity_id"]])
        for r in synth.aliases_table().to_pylist()
    ]
    g = GazetteerNER(gazetteer=gaz, locations=synth.CITIES, generic=False)
    t = load_tagger()
    n_want = 0
    for para in paras.column("text").to_pylist():
        want = {(s, e, lab) for _, lab, s, e in g._tag_text(para)}
        got = {(s, e, lab) for _, lab, s, e in t.predict([para])[0]}
        assert got == want, para[:160]
        n_want += len(want)
    assert n_want > 100  # the corpus actually exercised the tagger


def test_tagger_sparse_inference_matches_dense():
    """The sparse memoized-logit fast path labels every token of the
    synthetic corpus identically to the dense matmul reference
    (summation order differs, so this agreement is the gate that lets
    the fast path ship)."""
    from knowledge_graph_ray.functions.extract import extract_batch
    from knowledge_graph_ray.functions.segment import paragraphs_batch
    from knowledge_graph_ray.sources import synth
    from knowledge_graph_ray.stages.tagger import load_tagger

    t = load_tagger()
    paras = paragraphs_batch(extract_batch(synth.pages_table(80)))
    n_tokens = 0
    for text in paras.column("text").to_pylist():
        toks_s, lab_s = t._tag_tokens(text)
        toks_d, lab_d = t._tag_tokens_dense(text)
        assert [m.span() for m in toks_s] == [m.span() for m in toks_d]
        assert lab_s.tolist() == lab_d.tolist(), text[:120]
        n_tokens += len(toks_s)
    assert n_tokens > 5000


def test_model_openie_prefix_verbs_and_verb_surfaces():
    """Two PatternOpenIE fast-path hazards that ModelOpenIE must not
    share: verb phrases where one is a proper prefix of another
    (regex finditer consumes the longer hit and never retries — the
    pattern engine falls back to a full scan), and entity surfaces
    CONTAINING a verb word (disables the verb-anchored walk). The
    model path's anchored gap fullmatch between consecutive spans
    handles both directly; pin equality against the full-scan regex
    engine on both."""
    from knowledge_graph_ray.stages.openie import ModelOpenIE, PatternOpenIE

    verbs = {"works for": "works_for", "works": "works"}
    gaz = ["Alpha Corp", "Beta works Council", "Yard"]

    class FixedTagger:
        """Spans for the crafted sentences (ModelNER predict shape)."""

        def predict(self, texts):
            out = []
            for t in texts:
                spans = []
                for surf in gaz:
                    p = t.find(surf)
                    if p >= 0:
                        spans.append((surf, "ORG", p, p + len(surf)))
                out.append(sorted(spans, key=lambda s: s[2]))
            return out

    pat = PatternOpenIE(gazetteer=gaz, locations=[], verbs=verbs)
    assert pat.verb_pattern is None  # both hazards force the full scan
    mod = ModelOpenIE(FixedTagger, verbs=verbs)
    cases = [
        # prefix pair: 'works for Yard' must bind the LONGER verb
        "Alpha Corp works for Yard today",
        # 'works' inside a surface must not anchor a triple
        "Beta works Council works for Alpha Corp",
        # bare shorter verb
        "Alpha Corp works Yard",
    ]
    for text in cases:
        assert mod.extract(text) == pat.extract(text), text
