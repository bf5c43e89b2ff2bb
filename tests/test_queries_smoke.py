"""Smoke: every rows-only (non-SQL-expressible) queries() entry runs
at sf0.001 and yields a stable, non-degenerate result."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# (round 2 moved minhash/simhash/jaccard/embedding-pairs/fingerprint/
# knn_lsh/knn_ivf/qa_pairs to generated DuckDB oracles — see
# tests/test_oracle_parity.py; only genuinely non-SQL pipelines stay)
ROWS_ONLY = [
    "kg_flagship",
    "mention_canonicalization",
    "search_ranked_contexts",
    "alias_map_assembly",
    "corpus_paragraphs",
    "udf_rephrase",
    "media_features",
    "semantic_paragraphs",
    "pdf_corpus_extract",
    "docs_wordpiece",
    "media_audio_features",
    "media_frames",
    "warc_corpus_extract",
    "docs_compression_ratio",
    "docs_pack_sequences",
]

MUST_HAVE_ROWS = {"kg_flagship", "mention_canonicalization",
                  "search_ranked_contexts", "alias_map_assembly",
                  "corpus_paragraphs", "udf_rephrase", "media_features",
                  "semantic_paragraphs", "pdf_corpus_extract",
                  "warc_corpus_extract", "docs_compression_ratio",
                  "docs_pack_sequences"}


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, ray_session):
    from knowledge_graph_ray.pipelines.queries import ORACLE_SQL, QUERIES

    assert name not in ORACLE_SQL
    res = QUERIES[name](SF_DIR)
    import pyarrow as _pa

    rows = res.to_pylist() if isinstance(res, _pa.Table) else res.take_all()
    if name in MUST_HAVE_ROWS:
        assert len(rows) > 0
    if rows:
        keys = set(rows[0])
        assert all(set(r) == keys for r in rows[:50])


def test_registry_consistency():
    from knowledge_graph_ray.pipelines.queries import ORACLE_SQL, QUERIES

    assert set(ORACLE_SQL) <= set(QUERIES)
    assert set(ROWS_ONLY) == set(QUERIES) - set(ORACLE_SQL)
