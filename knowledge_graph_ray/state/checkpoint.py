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

All state IO goes through ``state.fsio`` (pyarrow.fs), so the
resumable paths run unchanged against S3/GCS: pass ``filesystem=`` or
URI paths (``s3://bucket/out``). Default remains the local filesystem.
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable

import ray.data as rd
from ray.data import Dataset

from knowledge_graph_ray.state import fsio


def fingerprint_files(paths: list[str], *, filesystem=None) -> str:
    """md5 over (basename, size) pairs — basenames, not full paths, so
    the same corpus seen at /mnt/corpus locally and bucket/corpus via
    an object-store mount fingerprints identically (shard assignment
    is basename-hashed for the same reason)."""
    h = hashlib.md5()
    for p in sorted(paths, key=lambda x: x.rsplit("/", 1)[-1]):
        fsys, fp = fsio.resolve_fs(p, filesystem)
        h.update(p.rsplit("/", 1)[-1].encode())
        h.update(str(fsio.file_size(fsys, fp)).encode())
    return h.hexdigest()


def shard_input_files(
    input_dir: str, n_shards: int, *, filesystem=None
) -> dict[str, list[str]]:
    """Deterministically group the parquet files of a directory into
    up to n_shards named shards, assigned by a stable HASH of each
    file's basename (not round-robin position): a crawl increment
    that drops new files into the directory changes only the shards
    the new files hash into — every untouched shard keeps its exact
    file set, its manifest fingerprint still matches, and resume
    recomputes work proportional to the increment, not the corpus.
    (Position-based assignment reshuffled EVERY shard when one file
    was added.) Empty shards are simply absent. Increment-stability
    holds once the directory holds ≥ n_shards files (the modulus is
    then pinned at n_shards — always true at corpus scale; tiny
    directories below that may still reshuffle as the modulus
    grows)."""
    fsys, root = fsio.resolve_fs(input_dir, filesystem)
    files = [
        fsio.join(input_dir, f)
        for f in fsio.listdir(fsys, root, suffix=".parquet")
    ]
    n = max(1, min(n_shards, len(files)))
    shards: dict[str, list[str]] = {}
    for f in sorted(files):
        # md5 of the basename: stable across runs, machines, and
        # mounts (the directory prefix may differ between local and
        # object-store views of the same corpus)
        name = f.rsplit("/", 1)[-1]
        b = int.from_bytes(
            hashlib.md5(name.encode()).digest()[:8], "big"
        ) % n
        shards.setdefault(f"{b:04d}", []).append(f)
    return shards


def _manifest_path(out_dir: str, shard: str) -> str:
    return fsio.join(out_dir, "_manifest", f"{shard}.json")


def load_manifests(out_dir: str, *, filesystem=None) -> dict[str, dict]:
    fsys, root = fsio.resolve_fs(out_dir, filesystem)
    mdir = fsio.join(root, "_manifest")
    out = {}
    for f in fsio.listdir(fsys, mdir, suffix=".json"):
        try:
            out[f[:-5]] = json.loads(fsio.read_text(fsys, fsio.join(mdir, f)))
        except (ValueError, OSError):
            # a truncated/corrupt manifest (crash mid-write on a
            # filesystem without atomic commit) means the shard is NOT
            # done — treat as absent so resume recomputes that one
            # shard instead of aborting the whole run
            continue
    return out


def run_sharded(
    shards: dict[str, list[str]],
    build: Callable[[Dataset], Dataset],
    out_dir: str,
    *,
    resume: bool = True,
    filesystem=None,
) -> dict[str, dict]:
    """Run ``build`` over each input shard, checkpointing per shard.

    Returns the manifest dict per shard (including skipped ones).
    Raises whatever ``build``/execution raises — already-finished
    shards keep their checkpoints, so rerunning after a crash resumes.
    """
    fsys, root = fsio.resolve_fs(out_dir, filesystem)
    fsio.makedirs(fsys, fsio.join(root, "_manifest"))
    manifests = load_manifests(out_dir, filesystem=filesystem) if resume else {}
    results: dict[str, dict] = {}
    for shard, files in sorted(shards.items()):
        fp = fingerprint_files(files, filesystem=filesystem)
        prev = manifests.get(shard)
        if prev is not None and prev.get("input_fingerprint") == fp and prev.get(
            "status"
        ) == "done":
            results[shard] = {**prev, "skipped": True}
            continue
        t0 = time.perf_counter()
        ds_in = (
            rd.read_parquet(files, filesystem=filesystem)
            if filesystem is not None
            else rd.read_parquet(files)
        )
        rows_in = ds_in.count()
        out_ds = build(ds_in)
        shard_dir = fsio.join(root, f"shard={shard}")
        # A rerun (crash mid-write, or input-fingerprint invalidation)
        # must not APPEND to a stale shard dir: Ray's write_parquet
        # uses per-run uuid filenames, so old files would survive and
        # read_all_shards would silently union old+new rows.
        fsio.rmtree(fsys, shard_dir)
        out_ds.write_parquet(shard_dir, filesystem=fsys)
        rows_out = rd.read_parquet(shard_dir, filesystem=fsys).count()
        manifest = {
            "shard": shard,
            "status": "done",
            "input_files": files,
            "input_fingerprint": fp,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        fsio.write_text_atomic(
            fsys, _manifest_path(root, shard), json.dumps(manifest)
        )
        results[shard] = {**manifest, "skipped": False}
    return results


def read_all_shards(out_dir: str, *, filesystem=None) -> Dataset:
    fsys, root = fsio.resolve_fs(out_dir, filesystem)
    files = []
    for d in fsio.listdir(fsys, root):
        if d.startswith("shard="):
            full = fsio.join(root, d)
            files.extend(
                fsio.join(full, f)
                for f in fsio.listdir(fsys, full, suffix=".parquet")
            )
    return rd.read_parquet(files, filesystem=fsys)


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
