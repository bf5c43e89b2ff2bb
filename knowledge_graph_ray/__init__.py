"""knowledge_graph_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the data-processing capabilities of the reference repo
(Rune-Nedergaard/knowledge-graph, see SURVEY.md) as idiomatic Ray Data
pipelines: lazy ``ray.data.Dataset`` stages, zero-copy Arrow batches,
actor pools for stateful stages (embedding, NER, entity linking), and
explicit shuffle keys for the wide steps (dedup, canonicalization,
final triple materialization).

Nothing in this package calls ``ray.init()`` — sessions are owned by
the caller (tests, bench.py, or the driver).
"""

__version__ = "0.1.0"
