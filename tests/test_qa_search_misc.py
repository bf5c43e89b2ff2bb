"""QA parsers (M8-M11, M15-M16), retrying UDF, alias assembly (G5),
turtle sink (S11), PDF dispatch (S4), search pipeline (§3.3)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

import ray.data as rd

from knowledge_graph_ray.functions import qa
from knowledge_graph_ray.functions.extract import extract_batch, sniff_kind
from knowledge_graph_ray.functions.canon import assemble_alias_map
from knowledge_graph_ray.sources import synth


def test_qa_pairs_primary_and_fallbacks():
    text = "Spørgsmål 1: Hvad? Svar 1: Det. Spørgsmål 2: Hvem? Svar 2: Mig."
    assert qa.extract_qa_pairs(text) == [("Hvad?", "Det."), ("Hvem?", "Mig.")]
    assert qa.extract_qa_pairs("Q1: a? A1: b. Q2: c? A2: d.") == [
        ("a?", "b."),
        ("c?", "d."),
    ]
    assert qa.extract_qa_pairs("Question: x? Answer: y.") == [("x?", "y.")]
    assert qa.extract_qa_pairs("no pairs here") == []


def test_pack_chunks_budget_and_quarantine():
    paras = ["w " * 30, "w " * 30, "w " * 30]
    chunks, bad = qa.pack_chunks([p.strip() for p in paras], budget=65)
    assert not bad and len(chunks) == 2
    _, bad2 = qa.pack_chunks(["w " * 100], budget=50)
    assert bad2


def test_normalizers_and_parsers():
    assert qa.normalize_question("  hej med dig \n") == "hej med dig"
    assert qa.strip_title_prefix("Svar på spm. om noget") == "om noget"
    assert qa.parse_relevance_scores("Tekststykke 1: 0.8 Tekststykke 2: 1") == [0.8, 1.0]
    assert qa.parse_mcq_indices("I choose Option: 2 and option #4") == [2, 4]


def test_retrying_udf_quarantines_poison(ray_session):
    from knowledge_graph_ray.stages.udf import RetryingUDFActor

    calls = []

    def flaky(text):
        if text == "poison":
            raise ValueError("boom")
        return text.upper()

    ds = rd.from_arrow(pa.table({"text": pa.array(["ok", "poison", "fine"])}))
    out = ds.map_batches(
        RetryingUDFActor,
        fn_constructor_kwargs={"fn": flaky, "tries": 2},
        concurrency=1,
        batch_format="pyarrow",
    ).take_all()
    by_text = {r["text"]: r for r in out}
    assert by_text["ok"]["udf_out"] == "OK" and by_text["ok"]["error"] is None
    assert by_text["poison"]["udf_out"] is None
    assert "ValueError" in by_text["poison"]["error"]


def test_alias_map_assembly_g5():
    tbl = assemble_alias_map(synth.entities_table())
    pairs = set(zip(tbl.column("entity_id").to_pylist(), tbl.column("alias").to_pylist()))
    # same-named persons alias each other's (identical) cleaned name
    assert (3000, "Hans Hansen") in pairs and (3001, "Hans Hansen") in pairs
    # fuzzy institution variants cross-alias (D4)
    assert (3002, "Styrelsen Miljø") in pairs
    assert (3003, "Miljø Styrelsen") in pairs
    # every entity aliases its own cleaned name
    assert (1000, synth.person_name(0)) in pairs


def test_pdf_sniff_and_dispatch():
    # round 2: the PDF path is a real extractor (functions/pdf.py) —
    # unreadable PDFs yield empty text without raising; readable ones
    # extract (full coverage in tests/test_pdf.py)
    assert sniff_kind(b"%PDF-1.4 rest") == "pdf"
    assert sniff_kind(b"<html>") == "html"
    batch = pa.table(
        {
            "url": pa.array(["u1", "u2"]),
            "html": pa.array([b"%PDF-1.4 binary", b"<p>fine text here</p>"], pa.binary()),
        }
    )
    out = extract_batch(batch)
    assert out.column("error").to_pylist() == [None, None]
    texts = out.column("text").to_pylist()
    assert texts[0] == ""
    assert texts[1] == "fine text here"


def test_write_turtle_partitioned(tmp_path, ray_session):
    from knowledge_graph_ray.functions.triples import write_turtle

    tbl = pa.table(
        {
            "subj": pa.array([f"e:{i}" for i in range(20)]),
            "pred": pa.array(["p"] * 20),
            "obj": pa.array([f"e:{i+1}" for i in range(20)]),
            "obj_dtype": pa.array(["resource"] * 20),
        }
    )
    out_dir = str(tmp_path / "ttl")
    n = write_turtle(rd.from_arrow(tbl).repartition(4), out_dir)
    assert n == 20
    files = [f for f in os.listdir(out_dir) if f.endswith(".ttl")]
    assert len(files) >= 2  # partitioned, never one giant file
    lines = []
    for f in files:
        lines += open(os.path.join(out_dir, f)).read().strip().splitlines()
    assert len(lines) == 20
    assert all(line.endswith(" .") for line in lines)


def test_search_pipeline_finds_relevant_doc(ray_session):
    from knowledge_graph_ray.pipelines.corpus import build_corpus
    from knowledge_graph_ray.pipelines.search import search

    pages = rd.from_arrow(synth.pages_table(60))
    paras = build_corpus(pages, near_dup=False, normalize=False, concurrency=1)
    out = search([(7, "who leads Orga 0")], paras, k_ann=15, k_rerank=8, k_final=5)
    rows = out.to_pylist()
    assert rows
    assert all(r["query_id"] == 7 for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # the top context should actually mention the entity
    assert "Orga" in rows[0]["context"]
    # D3: contexts deduped
    assert len({r["context"] for r in rows}) == len(rows)


def test_search_distributed_matches_serving_path(ray_session):
    import pandas as pd

    from knowledge_graph_ray.pipelines.corpus import build_corpus
    from knowledge_graph_ray.pipelines.search import search, search_distributed

    pages = rd.from_arrow(synth.pages_table(60))
    paras = build_corpus(pages, near_dup=False, normalize=False, concurrency=1)
    queries = [
        (7, "who leads Orga 0"),
        (11, "the museum opened in Aarhus"),
        (3, "the quarterly report was published"),
    ]
    kw = dict(k_ann=15, k_rerank=8, k_final=5)
    a = search(queries, paras, **kw).to_pandas()
    b = search_distributed(queries, paras, **kw).to_pandas()
    a = a.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(a) and len(b)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_write_combined_doc_s12(tmp_path, ray_session):
    import ray.data as rd
    from knowledge_graph_ray.functions.qa import write_combined_doc

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 2, 1], pa.int64()),
                "text": pa.array(["ten", "two", "one"], pa.string()),
            }
        )
    ).repartition(3)
    out = write_combined_doc(ds, str(tmp_path / "combined.txt"))
    content = open(out, encoding="utf-8").read()
    # numerically sorted, reference header + blank line + content + \n
    assert content == (
        "################## Spørgsmål 1 ##################\n\none\n"
        "################## Spørgsmål 2 ##################\n\ntwo\n"
        "################## Spørgsmål 10 ##################\n\nten\n"
    )


def test_training_pairs_rejects_sparse_ids(ray_session):
    """md5-derived (sparse) doc ids must raise loudly — the mod-space
    negative join would otherwise emit ZERO label-0 rows silently."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from knowledge_graph_ray.functions.qa import training_pairs

    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([-8202043845838036568], pa.int64()),
                "pair_idx": pa.array([0], pa.int64()),
                "question": pa.array(["q"]),
                "answer": pa.array(["a"]),
            }
        )
    )
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([-8202043845838036568], pa.int64()),
                "text": pa.array(["t"]),
            }
        )
    )
    with pytest.raises(Exception, match="dense doc ids"):
        training_pairs(pairs, docs, 10).take_all()
