"""CLI entry points (the only place outside tests/bench that may own a
Ray session — guarded, per driver contract).

    python -m knowledge_graph_ray.run synth  --out /tmp/corpus --pages 5000
    python -m knowledge_graph_ray.run kg     --pages-dir /tmp/corpus --out /tmp/kg
    python -m knowledge_graph_ray.run kg     --pages-dir ... --out ... --resume
    python -m knowledge_graph_ray.run corpus --pages-dir ... --out /tmp/paras
    python -m knowledge_graph_ray.run search --pages-dir ... --query "who leads Orga 0"
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="knowledge_graph_ray")
    p.add_argument("command", choices=["synth", "kg", "corpus", "search"])
    p.add_argument("--pages-dir", help="directory of pages parquet")
    p.add_argument("--out", help="output directory")
    p.add_argument("--pages", type=int, default=5000)
    p.add_argument("--query", action="append", default=[])
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--no-resume", dest="resume", action="store_false")
    # actor pools use AUTOSCALING (1, N): a fixed pool of N actors at
    # num_cpus == N starves the task stages feeding it (observed: 300
    # pages hung 9+ min at --num-cpus 4; autoscaled, the same run is
    # seconds) — the same rule the library defaults follow
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument(
        "--model-tagger",
        action="store_true",
        help="extract with the trained BIO tagger weights (ModelOpenIE) "
        "instead of the gazetteer alternation",
    )
    p.add_argument("--batch-size", type=int, default=2048)
    args = p.parse_args(argv)

    _init_ray(args.num_cpus)
    import ray
    import ray.data as rd

    from knowledge_graph_ray.sources import synth

    try:
        if args.command == "synth":
            assert args.out, "--out required"
            os.makedirs(args.out, exist_ok=True)
            synth.pages_dataset(args.pages).write_parquet(args.out)
            print(json.dumps({"pages": args.pages, "out": args.out}))
        elif args.command == "kg":
            assert args.pages_dir and args.out, "--pages-dir and --out required"
            from knowledge_graph_ray.pipelines.kg import run_kg_resumable

            report = run_kg_resumable(
                args.pages_dir,
                synth.entities_table(),
                synth.aliases_table(),
                args.out,
                locations=synth.CITIES,
                n_shards=args.shards,
                concurrency=(1, args.concurrency),
                batch_size=args.batch_size,
                resume=args.resume,
                tagger_loader=(
                    __import__(
                        "knowledge_graph_ray.stages.tagger", fromlist=["load_tagger"]
                    ).load_tagger
                    if args.model_tagger
                    else None
                ),
            )
            print(json.dumps(report))
        elif args.command == "corpus":
            assert args.pages_dir and args.out, "--pages-dir and --out required"
            from knowledge_graph_ray.pipelines.corpus import build_corpus

            out = build_corpus(
                rd.read_parquet(args.pages_dir),
                concurrency=(1, args.concurrency),
                batch_size=args.batch_size,
            )
            out.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        elif args.command == "search":
            assert args.pages_dir and args.query, "--pages-dir and --query required"
            from knowledge_graph_ray.pipelines.corpus import build_corpus
            from knowledge_graph_ray.pipelines.search import search

            paras = build_corpus(
                rd.read_parquet(args.pages_dir), near_dup=False, normalize=False,
                concurrency=(1, args.concurrency), batch_size=args.batch_size,
            )
            queries = list(enumerate(args.query))
            tbl = search(queries, paras)
            for row in tbl.to_pylist():
                print(json.dumps(row))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
