"""Resumable sharded runs with per-partition manifests (SURVEY.md §5.6)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from knowledge_graph_ray.sources import synth
from knowledge_graph_ray.state import checkpoint as ckpt


@pytest.fixture()
def pages_dir(tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    tbl = synth.pages_table(40)
    for i in range(4):
        pq.write_table(tbl.slice(i * 10, 10), str(d / f"part-{i}.parquet"))
    return str(d)


def upper_stage(ds):
    def f(batch: pa.Table) -> pa.Table:
        return batch.select(["url", "lang"])

    return ds.map_batches(f, batch_format="pyarrow")


def test_sharding_deterministic(pages_dir):
    a = ckpt.shard_input_files(pages_dir, 2)
    b = ckpt.shard_input_files(pages_dir, 2)
    assert a == b
    assert sum(len(v) for v in a.values()) == 4


def test_run_and_resume_skips_done(pages_dir, tmp_path, ray_session):
    out = str(tmp_path / "out")
    shards = ckpt.shard_input_files(pages_dir, 4)
    r1 = ckpt.run_sharded(shards, upper_stage, out)
    assert all(not m["skipped"] for m in r1.values())
    assert ckpt.read_all_shards(out).count() == 40
    # restart: everything skipped, identical output
    r2 = ckpt.run_sharded(shards, upper_stage, out)
    assert all(m["skipped"] for m in r2.values())
    assert ckpt.read_all_shards(out).count() == 40


def test_crash_midway_then_resume(pages_dir, tmp_path, ray_session):
    out = str(tmp_path / "out")
    shards = ckpt.shard_input_files(pages_dir, 4)
    n_shards = len(shards)  # hash assignment may collide files into fewer
    assert n_shards >= 2
    calls = {"n": 0}

    def flaky(ds):
        calls["n"] += 1
        if calls["n"] == n_shards:  # crash on the LAST shard
            raise RuntimeError("simulated crash")
        return upper_stage(ds)

    with pytest.raises(RuntimeError):
        ckpt.run_sharded(shards, flaky, out)
    done_before = set(ckpt.load_manifests(out))
    assert len(done_before) == n_shards - 1  # committed before the crash

    r = ckpt.run_sharded(shards, upper_stage, out)
    skipped = {k for k, m in r.items() if m["skipped"]}
    assert skipped == done_before  # finished shards not recomputed
    assert ckpt.read_all_shards(out).count() == 40


def test_input_change_invalidates_manifest(pages_dir, tmp_path, ray_session):
    out = str(tmp_path / "out")
    shards = ckpt.shard_input_files(pages_dir, 2)
    ckpt.run_sharded(shards, upper_stage, out)
    # grow one input file → its shard must recompute
    target = shards["0000"][0]
    tbl = pq.read_table(target)
    pq.write_table(pa.concat_tables([tbl, tbl]), target)
    r = ckpt.run_sharded(ckpt.shard_input_files(pages_dir, 2), upper_stage, out)
    assert r["0000"]["skipped"] is False
    assert r["0001"]["skipped"] is True


def test_manifest_contents(pages_dir, tmp_path, ray_session):
    out = str(tmp_path / "out")
    shards = ckpt.shard_input_files(pages_dir, 1)
    r = ckpt.run_sharded(shards, upper_stage, out)
    m = json.load(open(os.path.join(out, "_manifest", "0000.json")))
    assert m["rows_in"] == 40 and m["rows_out"] == 40
    assert m["wall_s"] > 0 and m["status"] == "done"
    rep = ckpt.run_report(r)
    assert rep["shards"] == 1 and rep["rows_out"] == 40


def test_run_kg_resumable_end_to_end(pages_dir, tmp_path, ray_session):
    from knowledge_graph_ray.pipelines.kg import run_kg_resumable

    out = str(tmp_path / "kg")
    rep = run_kg_resumable(
        pages_dir,
        synth.entities_table(),
        synth.aliases_table(),
        out,
        locations=synth.CITIES,
        n_shards=2,
        concurrency=1,
        batch_size=64,
    )
    final = rd.read_parquet(rep["final_dir"])
    got = {(r["subj"], r["pred"], r["obj"]) for r in final.take_all()}
    assert got == synth.golden_triples(40)
    # resume: shards skipped, final identical
    rep2 = run_kg_resumable(
        pages_dir,
        synth.entities_table(),
        synth.aliases_table(),
        out,
        locations=synth.CITIES,
        n_shards=2,
        concurrency=1,
        batch_size=64,
    )
    assert rep2["skipped"] == 2
    final2 = rd.read_parquet(rep2["final_dir"])
    assert {(r["subj"], r["pred"], r["obj"]) for r in final2.take_all()} == got


def test_rerun_clears_stale_shard_output(pages_dir, tmp_path, ray_session):
    """A shard re-run (input invalidation or crash-mid-write) must
    CLEAR its shard dir first: write_parquet appends uuid-named files,
    so stale output would silently double the final row count."""
    out = str(tmp_path / "out")
    shards = ckpt.shard_input_files(pages_dir, 2)
    ckpt.run_sharded(shards, upper_stage, out)
    n0 = ckpt.read_all_shards(out).count()

    # invalidate shard 0000's manifest (simulates input change) and
    # pre-plant a stale parquet file (simulates crash-mid-write leftovers)
    mpath = os.path.join(out, "_manifest", "0000.json")
    with open(mpath) as fh:
        m = json.load(fh)
    m["input_fingerprint"] = "stale"
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    stale = os.path.join(out, "shard=0000", "stale_leftover.parquet")
    pq.write_table(synth.pages_table(7).select(["url", "lang"]), stale)

    ckpt.run_sharded(shards, upper_stage, out)
    assert ckpt.read_all_shards(out).count() == n0
    assert not os.path.exists(stale)


def test_run_sharded_nonlocal_filesystem(pages_dir, tmp_path, ray_session):
    """VERDICT r4 item 3: the resumable path must run through an
    explicit non-local pyarrow filesystem handle. SubTreeFileSystem
    stands in for an object store — it is not a LocalFileSystem
    instance (so the manifest commit takes the direct-PUT branch, no
    rename), and every path is store-relative."""
    from pyarrow import fs as pafs

    sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    shards = {
        s: [f"pages/{os.path.basename(f)}" for f in files]
        for s, files in ckpt.shard_input_files(pages_dir, 2).items()
    }
    r1 = ckpt.run_sharded(shards, upper_stage, "out", filesystem=sub)
    assert all(not m["skipped"] for m in r1.values())
    assert ckpt.read_all_shards("out", filesystem=sub).count() == 40
    # resume through the same handle: everything skipped
    r2 = ckpt.run_sharded(shards, upper_stage, "out", filesystem=sub)
    assert all(m["skipped"] for m in r2.values())
    # the rename-commit path never ran: no .tmp leftovers
    assert not list((tmp_path / "out" / "_manifest").glob("*.tmp"))


def test_crawl_increment_recomputes_only_new_shards(pages_dir, tmp_path, ray_session):
    """Hash-based file→shard assignment: dropping a NEW crawl file
    into the corpus directory leaves every untouched shard's file set
    (and so its manifest fingerprint) intact — the rerun recomputes
    only the shard(s) the new file hashes into, i.e. increment cost ∝
    increment, not corpus. (Round-robin assignment reshuffled every
    shard on a single added file.)"""
    out = str(tmp_path / "out")
    shards1 = ckpt.shard_input_files(pages_dir, 2)
    r1 = ckpt.run_sharded(shards1, upper_stage, out)
    assert all(not m["skipped"] for m in r1.values())

    # the increment: one new shard file lands in the directory
    pq.write_table(
        synth.pages_table(50).slice(40, 10),
        os.path.join(pages_dir, "part-new.parquet"),
    )
    shards2 = ckpt.shard_input_files(pages_dir, 2)
    changed = {
        name
        for name in set(shards1) | set(shards2)
        if shards1.get(name) != shards2.get(name)
    }
    assert len(changed) == 1  # exactly the shard the new file hashed into
    r2 = ckpt.run_sharded(shards2, upper_stage, out)
    assert all(m["skipped"] for n, m in r2.items() if n not in changed)
    assert all(not m["skipped"] for n, m in r2.items() if n in changed)
    assert ckpt.read_all_shards(out).count() == 50
