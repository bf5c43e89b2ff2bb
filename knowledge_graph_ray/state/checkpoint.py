"""Per-partition checkpointing with lineage + metrics (north rule;
SURVEY.md §4 resume design).

The reference resumes by checking output-file existence per record
(get_files.py:50-52, extract_paragraphs_faster.py:20-24, ...). Here
the unit of resume is an input SHARD: a named group of input files.
Each shard runs the stage pipeline independently and writes

    out_dir/shard=<name>/*.parquet          (stage output)
    out_dir/_manifest/<name>.json           (lineage + metrics)

The manifest records the input fingerprint (file names + sizes), row
counts in/out, and wall time. On restart, shards whose manifest
matches the current input fingerprint are SKIPPED — a killed run
recomputes only unfinished shards, and the final output (the union of
shard directories) is identical.

This composes with any Dataset-in → Dataset-out stage function; the
flagship uses it via pipelines.kg.run_kg_resumable.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable

import ray.data as rd
from ray.data import Dataset


def fingerprint_files(paths: list[str]) -> str:
    h = hashlib.md5()
    for p in sorted(paths):
        h.update(p.encode())
        h.update(str(os.path.getsize(p)).encode())
    return h.hexdigest()


def shard_input_files(input_dir: str, n_shards: int) -> dict[str, list[str]]:
    """Deterministically group the parquet files of a directory into
    n_shards named shards (round-robin over the sorted listing)."""
    files = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet")
    )
    shards: dict[str, list[str]] = {f"{i:04d}": [] for i in range(min(n_shards, len(files)))}
    for i, f in enumerate(files):
        shards[f"{i % len(shards):04d}"].append(f)
    return shards


def _manifest_path(out_dir: str, shard: str) -> str:
    return os.path.join(out_dir, "_manifest", f"{shard}.json")


def load_manifests(out_dir: str) -> dict[str, dict]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                out[f[:-5]] = json.load(fh)
    return out


def run_sharded(
    shards: dict[str, list[str]],
    build: Callable[[Dataset], Dataset],
    out_dir: str,
    *,
    resume: bool = True,
) -> dict[str, dict]:
    """Run ``build`` over each input shard, checkpointing per shard.

    Returns the manifest dict per shard (including skipped ones).
    Raises whatever ``build``/execution raises — already-finished
    shards keep their checkpoints, so rerunning after a crash resumes.
    """
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    manifests = load_manifests(out_dir) if resume else {}
    results: dict[str, dict] = {}
    for shard, files in sorted(shards.items()):
        fp = fingerprint_files(files)
        prev = manifests.get(shard)
        if prev is not None and prev.get("input_fingerprint") == fp and prev.get(
            "status"
        ) == "done":
            results[shard] = {**prev, "skipped": True}
            continue
        t0 = time.perf_counter()
        ds_in = rd.read_parquet(files)
        rows_in = ds_in.count()
        out_ds = build(ds_in)
        shard_dir = os.path.join(out_dir, f"shard={shard}")
        # A rerun (crash mid-write, or input-fingerprint invalidation)
        # must not APPEND to a stale shard dir: Ray's write_parquet
        # uses per-run uuid filenames, so old files would survive and
        # read_all_shards would silently union old+new rows.
        shutil.rmtree(shard_dir, ignore_errors=True)
        out_ds.write_parquet(shard_dir)
        rows_out = rd.read_parquet(shard_dir).count()
        manifest = {
            "shard": shard,
            "status": "done",
            "input_files": files,
            "input_fingerprint": fp,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        tmp = _manifest_path(out_dir, shard) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, _manifest_path(out_dir, shard))  # atomic commit
        results[shard] = {**manifest, "skipped": False}
    return results


def read_all_shards(out_dir: str) -> Dataset:
    files = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("shard="):
            full = os.path.join(out_dir, d)
            files.extend(
                os.path.join(full, f)
                for f in sorted(os.listdir(full))
                if f.endswith(".parquet")
            )
    return rd.read_parquet(files)


def run_report(results: dict[str, dict]) -> dict:
    """Aggregate manifests into a run report (metrics lineage)."""
    done = [m for m in results.values()]
    return {
        "shards": len(done),
        "skipped": sum(1 for m in done if m.get("skipped")),
        "rows_in": sum(m.get("rows_in", 0) for m in done),
        "rows_out": sum(m.get("rows_out", 0) for m in done),
        "wall_s": round(sum(m.get("wall_s", 0) for m in done if not m.get("skipped")), 3),
    }
