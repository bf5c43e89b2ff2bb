"""Benchmark harness (driver contract + scaling evidence).

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) in ONE Ray session with
num_cpus=$RAY_GRAFT_CPUS (default 32), printing ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "kg": {"pages": n, "triples": n, "pages_per_sec": x,
          "triples_per_sec": x}}

--scaling: runs the flagship KG pipeline twice in FRESH subprocesses
at num_cpus=N and num_cpus=4N (N = $GRAFT_SCALE_N, default 8) on the
same stored input (sandbox stand-in for N-node vs 4N-node clusters,
per driver instruction), reporting both throughputs, scaling
efficiency = (thr_4N / thr_N) / 4, a hardware-ceiling control
(embarrassingly parallel pure-Python loop — this shared VM has heavy
hypervisor CPU steal), and efficiency normalized to that ceiling.
Corpus size via $GRAFT_SCALING_PAGES (default 600k; fixed barrier
costs amortize with corpus size — see BASELINE.md).

--kg-only: internal mode used by --scaling (one fresh session, one
pipeline run, one JSON line).

--ceiling-only: internal mode used by the pre-probe gate (one fresh
session, one short hardware-ceiling control, one JSON line).

$GRAFT_CEILING_GATE (float, default 0 = off): when set, --scaling
first runs a ~30 s ceiling-only probe pair (fresh N / 4N sessions);
if the box's embarrassingly-parallel ceiling efficiency is below the
gate, the full run is SKIPPED (exit 3, one JSON line with
"gated": true). Criterion attempts on this steal-prone VM only make
sense in qualifying windows — see BASELINE.md round 4.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

HEADLINE_QUERIES = [
    "agg_pricing_summary",
    "revenue_by_nation",
    "building_orders",
    "daily_user_activity",
    "customer_node_triples",
    "order_edge_triples",
    "subjects_1995_filled",
    "docs_exact_dedup",
    "docs_minhash_pairs",
    "docs_quality",
    "knn_bruteforce",
]


def init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def bench_pages_for(sf: float) -> int:
    return int(os.environ.get("GRAFT_KG_PAGES", max(500, int(sf * 50000))))


def scaling_pages_for(sf: float) -> int:
    """Scaling runs need the parallel compute to dominate the fixed
    barrier costs (actor ramp + shuffle constants ≈ 10 s)."""
    return int(os.environ.get("GRAFT_SCALING_PAGES", "600000"))


def consume(ds) -> int:
    """Execute a Dataset fully without pulling blocks to the driver."""
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.count()
    return len(ds)


def ensure_pages(n_pages: int, num_cpus: int) -> str:
    """Materialize the synthetic pages corpus to parquet ONCE (untimed):
    the engine's job starts at stored pages, and both scaling runs must
    read the identical input."""
    import ray.data as rd

    from knowledge_graph_ray.sources import synth

    path = f"/tmp/bench_pages_{n_pages}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        synth.pages_dataset(n_pages, override_num_blocks=128).write_parquet(path)
        open(marker, "w").write("ok")
    return path


def run_ceiling(num_cpus: int, tasks: int = 128, iters: int = 3_000_000) -> dict:
    """Hardware-ceiling control: an embarrassingly parallel pure-Python
    loop (no shuffles, no object-store traffic, no engine code). On an
    unshared machine this scales ~linearly; under hypervisor CPU steal
    it measures the box's achievable ceiling, against which the
    pipeline's scaling efficiency is normalized."""
    import ray.data as rd

    def work(batch):
        s = 0
        for i in range(iters):
            s += i * i
        return {"id": batch["id"]}

    t0 = time.perf_counter()
    rd.range(tasks, override_num_blocks=tasks).map_batches(work, batch_size=1).count()
    dt = time.perf_counter() - t0
    return {"sec": round(dt, 2), "tasks_per_sec": round(tasks / dt, 2)}


def run_kg(num_cpus: int, n_pages: int) -> dict:
    import ray.data as rd

    from knowledge_graph_ray.pipelines.kg import build_kg
    from knowledge_graph_ray.sources import synth

    pages_path = ensure_pages(n_pages, num_cpus)
    t0 = time.perf_counter()
    # read block count scaled to the job: tiny bench corpora waste
    # ~0.5 s of task ramp on 64 trivial read tasks; the 600k/2.4M-page
    # scaling runs keep 128-way parallel decode
    pages = rd.read_parquet(
        pages_path, override_num_blocks=max(8, min(128, n_pages // 512))
    )
    triples = build_kg(
        pages,
        synth.entities_table(),
        synth.aliases_table(),
        locations=synth.CITIES,
        # fixed-size pool, PROPORTIONAL to the session size (a scaling
        # measurement must scale the pool with the "cluster"); half the
        # cores leaves headroom for fused read tasks + shuffle stages,
        # and avoids the oversubscription cliff measured at ~cpus pools
        concurrency=max(1, num_cpus // 2),
        # 4096 measured best even at the 5000-page bench size (fewer,
        # wider tasks beat pool utilization: smaller batches were
        # +10-30% from per-block scheduling + downstream overhead)
        batch_size=4096,
    )
    n_triples = triples.count()
    dt = time.perf_counter() - t0
    return {
        "pages": n_pages,
        "triples": n_triples,
        "sec": round(dt, 2),
        "pages_per_sec": round(n_pages / dt, 1),
        "triples_per_sec": round(n_triples / dt, 1),
    }


def main() -> None:
    from knowledge_graph_ray.pipelines.queries import QUERIES, sf_of

    sf = sf_of(SF_DIR)
    if "--kg-only" in sys.argv:
        init_ray(NUM_CPUS)
        # Untimed warmup, same rationale as the headline mode below: a
        # scaling measurement compares steady-state throughput at two
        # cluster sizes, not process startup. Spawn the worker pool AND
        # pre-import the engine in each worker (Ray reuses warm worker
        # processes for map_batches actors, so the fused stage's 16
        # constructors skip the cold numpy/pyarrow/package import).
        import ray.data as rd

        def _warm(batch):
            import knowledge_graph_ray.pipelines.kg  # noqa: F401
            import knowledge_graph_ray.stages.link  # noqa: F401

            return batch

        rd.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS * 2).map_batches(
            _warm, batch_size=1
        ).count()
        kg = run_kg(NUM_CPUS, scaling_pages_for(sf))
        ceil = run_ceiling(NUM_CPUS)
        print(json.dumps({"kg": kg, "ceiling": ceil, "num_cpus": NUM_CPUS, "sf": sf}))
        import ray

        ray.shutdown()
        return

    if "--ceiling-only" in sys.argv:
        init_ray(NUM_CPUS)
        # shorter than the in-run control: the probe answers "is this
        # window worth a 15-minute criterion run", not "what exactly is
        # the ceiling" — 64 tasks keeps it ~15 s per leg at 32 CPUs
        ceil = run_ceiling(NUM_CPUS, tasks=64, iters=1_500_000)
        print(json.dumps({"ceiling": ceil, "num_cpus": NUM_CPUS, "sf": sf}))
        import ray

        ray.shutdown()
        return

    if "--scaling" in sys.argv:
        lo = int(os.environ.get("GRAFT_SCALE_N", "8"))
        gate = float(os.environ.get("GRAFT_CEILING_GATE", "0"))
        if gate > 0:
            probe = {}
            for cpus in (lo, lo * 4):
                env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--ceiling-only"],
                    env=env,
                    capture_output=True,
                    text=True,
                    check=True,
                )
                line = [
                    l for l in out.stdout.strip().splitlines() if l.startswith("{")
                ][-1]
                probe[cpus] = json.loads(line)["ceiling"]["tasks_per_sec"]
            probe_eff = round((probe[lo * 4] / probe[lo]) / 4, 3)
            if probe_eff < gate:
                print(
                    json.dumps(
                        {
                            "metric": "kg_scaling_pages_per_sec",
                            "gated": True,
                            "probe_ceiling_efficiency": probe_eff,
                            "gate": gate,
                            "note": "window disqualified by ceiling pre-probe; "
                            "full scaling run skipped",
                        }
                    )
                )
                sys.exit(3)
        # generate the shared input once at full parallelism (untimed)
        init_ray(NUM_CPUS)
        ensure_pages(scaling_pages_for(sf), NUM_CPUS)
        import ray

        ray.shutdown()
        results = {}
        for cpus in (lo, lo * 4):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--kg-only"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
        thr_n = results[lo]["kg"]["pages_per_sec"]
        thr_4n = results[lo * 4]["kg"]["pages_per_sec"]
        eff = round((thr_4n / thr_n) / 4, 3)
        c_n = results[lo]["ceiling"]["tasks_per_sec"]
        c_4n = results[lo * 4]["ceiling"]["tasks_per_sec"]
        ceiling_eff = round((c_4n / c_n) / 4, 3)
        normalized = round(eff / ceiling_eff, 3) if ceiling_eff else None
        print(
            json.dumps(
                {
                    "metric": "kg_scaling_pages_per_sec",
                    "value": eff,
                    "unit": "efficiency",
                    "sf": sf,
                    "runs": {
                        f"n{lo}": results[lo],
                        f"n{lo * 4}": results[lo * 4],
                    },
                    "efficiency": eff,
                    "ceiling_efficiency": ceiling_eff,
                    "normalized_efficiency": normalized,
                }
            )
        )
        return

    init_ray(NUM_CPUS)
    # Untimed warmup: spawn the Ray worker pool once so the first timed
    # query measures the pipeline, not process startup (worker spawn was
    # ~2s of the first query's wall time; steady-state is what a
    # long-running 100-TB job sees).
    import ray.data as rd

    rd.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b
    ).count()
    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in HEADLINE_QUERIES:
        t0 = time.perf_counter()
        consume(QUERIES[name](SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)
    kg = run_kg(NUM_CPUS, bench_pages_for(sf))
    timings["kg_flagship"] = kg["sec"]
    total = round(time.perf_counter() - t_all, 2)
    print(
        json.dumps(
            {
                "metric": "headline_pipelines_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "num_cpus": NUM_CPUS,
                "kg": kg,
            }
        )
    )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
