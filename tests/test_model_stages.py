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
