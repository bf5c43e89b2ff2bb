"""Build the checked-in golden pages fixture (run ONCE; see test_extract).

python tests/fixtures/make_golden.py
"""

import os

import pyarrow.parquet as pq

from knowledge_graph_ray.sources import synth

OUT = os.path.join(os.path.dirname(__file__), "golden_pages.parquet")

if __name__ == "__main__":
    tbl = synth.pages_table(64, seed=42)
    pq.write_table(tbl, OUT)
    print(f"wrote {tbl.num_rows} rows to {OUT}")
