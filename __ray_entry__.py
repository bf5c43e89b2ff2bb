"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or anywhere these callables
reach (enforced — the library never owns a Ray session).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship KG pipeline over the deterministic synthetic pages
    corpus at smoke scale: returns the deduplicated, subject-sorted
    (subj, pred, obj, support, src_doc, obj_is_literal) Dataset."""
    from knowledge_graph_ray.pipelines.queries import q_kg_flagship

    return q_kg_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (registry: knowledge_graph_ray/pipelines/queries.py)."""
    from knowledge_graph_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible query (the
    remainder are stateful/approximate pipelines → rows-only check)."""
    from knowledge_graph_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
