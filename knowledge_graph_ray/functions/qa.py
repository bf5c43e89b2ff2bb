"""QA-pair extraction and text parsers (SURVEY.md M8-M11, M15, M16,
K3-adjacent chunking M9).

Clean-room re-expressions of the reference's regex parsers:
- M8  Q/A pair extraction with fallback formats
  (create_QA_dataset.py:15-42: ``Spørgsmål N: ... Svar N: ...``).
- M9  token-budget chunk packing with quarantine
  (extract_qa.py:19-54).
- M10 question whitespace normalization
  (reword_questions_multiprocessing.py:20-23).
- M11 title prefix strip (getting_random_subset.ipynb cell 25).
- M15 relevance-score parser (assign_relevance.py:66-67).
- M16 MCQ chosen-index parser (mcq_search.py:74-96).

All stateless ``map_batches`` kernels (one row in → k rows out for
M8/M9 — flat_map shape).
"""

from __future__ import annotations

import re

import pyarrow as pa

from knowledge_graph_ray.functions.segment import count_tokens

# M8: primary and fallback Q/A formats
_QA_PRIMARY = re.compile(
    r"Spørgsmål\s+(\d+):\s*(.*?)\s*Svar\s+\1:\s*(.*?)(?=Spørgsmål\s+\d+:|\Z)",
    re.DOTALL,
)
_QA_FALLBACK = re.compile(
    r"Q(\d+):\s*(.*?)\s*A\1:\s*(.*?)(?=Q\d+:|\Z)", re.DOTALL
)
_QA_PLAIN = re.compile(
    r"Question:\s*(.*?)\s*Answer:\s*(.*?)(?=Question:|\Z)", re.DOTALL
)

_WS_EDGES = re.compile(r"^\s+|\s+$")
_TITLE_PREFIX = re.compile(
    r"^(?:svar på spm\.?|svar på spørgsmål|re:|fwd?:)\s*", re.IGNORECASE
)
_RELEVANCE = re.compile(r"Tekststykke \d+: (\d(?:\.\d+)?)")
_MCQ_INDEX = re.compile(r"\b(?:option|valgmulighed|answer)\s*[:#]?\s*(\d+)", re.IGNORECASE)


def extract_qa_pairs(text: str) -> list[tuple[str, str]]:
    """M8: (question, answer) pairs; numbered Danish format first, two
    fallback formats after."""
    pairs = [(q.strip(), a.strip()) for _, q, a in _QA_PRIMARY.findall(text)]
    if not pairs:
        pairs = [(q.strip(), a.strip()) for _, q, a in _QA_FALLBACK.findall(text)]
    if not pairs:
        pairs = [(q.strip(), a.strip()) for q, a in _QA_PLAIN.findall(text)]
    return [(q, a) for q, a in pairs if q and a]


def qa_pairs_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column(text_col).to_pylist()
    o_id, o_q, o_a, o_idx = [], [], [], []
    for did, text in zip(ids, texts):
        for i, (q, a) in enumerate(extract_qa_pairs(text or "")):
            o_id.append(did)
            o_idx.append(i)
            o_q.append(q)
            o_a.append(a)
    return pa.table(
        {
            "doc_id": pa.array(o_id, pa.int64()),
            "pair_idx": pa.array(o_idx, pa.int32()),
            "question": pa.array(o_q, pa.string()),
            "answer": pa.array(o_a, pa.string()),
        }
    )


def pack_chunks(
    paragraphs: list[str], budget: int = 2500
) -> tuple[list[list[str]], bool]:
    """M9: pack paragraphs into <=budget-token chunks; if any single
    paragraph exceeds the budget the document is quarantined
    (reference bad-doc dict → here a boolean)."""
    chunks: list[list[str]] = []
    cur: list[str] = []
    cur_tokens = 0
    for p in paragraphs:
        t = count_tokens(p)
        if t > budget:
            return [], True
        if cur and cur_tokens + t > budget:
            chunks.append(cur)
            cur, cur_tokens = [], 0
        cur.append(p)
        cur_tokens += t
    if cur:
        chunks.append(cur)
    return chunks, False


def normalize_question(q: str) -> str:
    """M10: strip leading/trailing whitespace runs."""
    return _WS_EDGES.sub("", q)


def strip_title_prefix(title: str) -> str:
    """M11: remove reply-style prefixes from titles."""
    return _TITLE_PREFIX.sub("", title).strip()


def parse_relevance_scores(text: str) -> list[float]:
    """M15: ``Tekststykke N: <score>`` floats from model output."""
    return [float(s) for s in _RELEVANCE.findall(text)]


def parse_mcq_indices(text: str) -> list[int]:
    """M16: chosen option indices from model output."""
    return [int(s) for s in _MCQ_INDEX.findall(text)]


def write_combined_doc(
    ds,
    path: str,
    *,
    key: str = "doc_id",
    text_col: str = "text",
    header_fmt: str = "################## Spørgsmål {key} ##################",
) -> str:
    """S12 combined MC doc writer (reference create_MC_doc.py:4-32):
    records sorted numerically by ``key``, each prefixed with a
    header line and a blank line, separated by one newline.

    The sort is distributed (``ds.sort``); only the final
    concatenation streams through the driver via ``iter_batches`` —
    a single human-readable output file is a funnel by definition.
    For corpus-scale graph output use the partitioned turtle sink
    (functions/triples.write_turtle) instead."""
    ordered = ds.select_columns([key, text_col]).sort(key)
    with open(path, "w", encoding="utf-8") as f:
        for batch in ordered.iter_batches(batch_format="pyarrow"):
            keys = batch.column(key).to_pylist()
            texts = batch.column(text_col).to_pylist()
            for k, t in zip(keys, texts):
                f.write(header_fmt.format(key=k) + "\n\n")
                f.write((t or "") + "\n")
    return path


def training_pairs(
    pairs,
    docs,
    n_docs: int,
    *,
    mult_doc: int = 31,
    mult_idx: int = 7,
    offset: int = 1,
):
    """S10/K3 training-pair builder (create_positive_negative_pairs.py:
    8-31 semantics, deterministic): every extracted (question, answer)
    pair yields a positive row (label 1, paragraph = its answer) and a
    negative row (label 0, paragraph = the text of a pseudo-randomly
    but DETERMINISTICALLY chosen other document:
    doc (doc_id·mult_doc + pair_idx·mult_idx + offset) mod n_docs,
    bumped by one — (key+1) mod n_docs — when the draw lands on the
    pair's OWN document, mirroring the reference's re-draw-while-
    negative==positive loop so a label-0 row can never contain the
    true answer). The reference's random.sample negatives are
    irreproducible across runs; the affine-keyed draw keeps the
    negative distribution corpus-wide while staying oracle-checkable
    and resume-stable.

    CONTRACT: doc ids must be DENSE [0, n_docs) — the drawn key is a
    mod-space value joined against ``docs.doc_id`` directly, so sparse
    ids (e.g. ingest's md5-derived int64s) would silently produce ZERO
    negative rows. ``with_key`` asserts the range per batch and raises
    with a remap hint instead of degrading silently. The floor-mods
    below are overflow hygiene for the affine multiply (identity on
    in-range ids; the SQL twin's multiply would raise where int64
    wraps).

    Distributed shape: positives are a pure per-batch projection; the
    negative lookup is one hash join of the (small) pair table against
    the corpus on the computed key — the corpus is never collected,
    and both sides shuffle at auto-derived partition counts."""
    import pyarrow.compute as pc

    from knowledge_graph_ray.pipelines.relational import hash_join

    # consumed by the positive arm, the keyed negative arm AND the
    # join's partition probe — pin once or the extractor upstream
    # re-executes per consumer (the consumed-twice trap)
    pairs = pairs.materialize()

    def pos(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pair_idx": batch.column("pair_idx"),
                "question": batch.column("question"),
                "paragraph": batch.column("answer"),
                "label": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )

    def floor_mod(col):
        # Arrow divide truncates toward zero → trunc-mod; fix the sign
        r = pc.subtract(col, pc.multiply(pc.divide(col, n_docs), n_docs))
        return pc.if_else(pc.less(r, 0), pc.add(r, n_docs), r)

    def with_key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if batch.num_rows and not (
            pc.min(ids).as_py() >= 0 and pc.max(ids).as_py() < n_docs
        ):
            raise ValueError(
                "training_pairs requires dense doc ids in [0, n_docs): "
                "got ids outside that range (md5-derived ids from ingest "
                "must be remapped first, e.g. rank documents by doc_id)"
            )
        key = floor_mod(
            pc.add(
                pc.add(
                    pc.multiply(floor_mod(batch.column("doc_id")), mult_doc),
                    pc.multiply(floor_mod(batch.column("pair_idx")), mult_idx),
                ),
                offset,
            )
        )
        # never draw the pair's own document as its negative
        own = pc.equal(key, batch.column("doc_id"))
        bumped = pc.subtract(
            pc.add(key, 1),
            pc.multiply(pc.divide(pc.add(key, 1), n_docs), n_docs),
        )
        key = pc.if_else(own, bumped, key)
        return batch.append_column("neg_key", key)

    def neg(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pair_idx": batch.column("pair_idx"),
                "question": batch.column("question"),
                "paragraph": batch.column("text"),
                "label": pa.array([0] * batch.num_rows, pa.int64()),
            }
        )

    def rename_doc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id_neg": batch.column("doc_id"), "text": batch.column("text")}
        )

    keyed = pairs.map_batches(with_key, batch_format="pyarrow")
    negs = hash_join(
        keyed,
        docs.map_batches(rename_doc, batch_format="pyarrow"),
        on="neg_key",
        right_on="doc_id_neg",
    ).map_batches(neg, batch_format="pyarrow")
    return pairs.map_batches(pos, batch_format="pyarrow").union(negs)
