"""Checkpoint/resume equivalence (FIXTURES.md F4 / north rule)."""

from __future__ import annotations

import json
import os

import numpy as np

from everythinggraph_ray.graph.engine import GraphEngine, _latest_checkpoint
from everythinggraph_ray.graph.kernels import PageRankKernel


def test_resume_mid_pagerank_is_bitwise_identical(small_build, tmp_path):
    ckpt = str(tmp_path / "ckpt")

    # uninterrupted run
    eng = GraphEngine(small_build)
    try:
        full = eng.run(PageRankKernel(), tol=1e-6)
        full_df = full["dataset"].to_pandas().sort_values("vid")
    finally:
        eng.shutdown()

    # interrupted: run only 7 supersteps, checkpointing every 3
    eng1 = GraphEngine(small_build)
    try:
        eng1.run(
            PageRankKernel(), n_iters=7, checkpoint_dir=ckpt, checkpoint_every=3
        )
    finally:
        eng1.shutdown()
    latest = _latest_checkpoint(ckpt)
    assert latest == 6  # supersteps 3 and 6 snapshotted
    lineage = json.load(open(os.path.join(ckpt, "lineage.json")))
    assert lineage["superstep"] == 6
    assert lineage["metrics"][-1]["superstep"] == 6
    assert lineage["input"]["n_edges"] > 0

    # fresh engine resumes from superstep 6 and finishes
    eng2 = GraphEngine(small_build)
    try:
        resumed = eng2.run(
            PageRankKernel(), tol=1e-6, checkpoint_dir=ckpt, resume=True
        )
        res_df = resumed["dataset"].to_pandas().sort_values("vid")
    finally:
        eng2.shutdown()

    assert resumed["iterations"] == full["iterations"]
    # bitwise identical: same float ops in the same order per partition
    assert np.array_equal(
        full_df["pagerank"].to_numpy(), res_df["pagerank"].to_numpy()
    )
    # metrics cover the full history (pre-resume + post-resume)
    assert [m["superstep"] for m in resumed["metrics"]] == list(
        range(1, resumed["iterations"] + 1)
    )


def test_actor_failure_recovery_via_resume(small_build, tmp_path):
    """Failure model: partition actors hold volatile state; with
    auto-recovery DISABLED (max_recoveries=0) a dead actor fails fast, and
    a NEW engine resumes from the latest complete snapshot, yielding
    results identical to an uninterrupted run. (Auto-recovery itself is
    covered by test_engine_recovers_from_actor_death.)"""
    import ray

    ckpt = str(tmp_path / "ckpt2")

    eng = GraphEngine(small_build)
    try:
        full = eng.run(PageRankKernel(), n_iters=12)
        full_df = full["dataset"].to_pandas().sort_values("vid")
    finally:
        eng.shutdown()

    eng1 = GraphEngine(small_build)
    try:
        eng1.run(PageRankKernel(), n_iters=6, checkpoint_dir=ckpt, checkpoint_every=3)
        # simulate a node loss mid-run
        ray.kill(eng1.actors[1])
        try:
            eng1.run(
                PageRankKernel(),
                n_iters=12,
                checkpoint_dir=ckpt,
                checkpoint_every=3,
                resume=True,
                max_recoveries=0,
            )
            raised = False
        except ray.exceptions.RayActorError:
            raised = True
        assert raised, "dead actor should surface as RayActorError"
    finally:
        for a in eng1.actors:
            try:
                ray.kill(a)
            except Exception:
                pass

    # fresh engine resumes from superstep 6 and matches the clean run
    eng2 = GraphEngine(small_build)
    try:
        resumed = eng2.run(
            PageRankKernel(), n_iters=12, checkpoint_dir=ckpt, checkpoint_every=3, resume=True
        )
        res_df = resumed["dataset"].to_pandas().sort_values("vid")
    finally:
        eng2.shutdown()
    assert np.array_equal(full_df["pagerank"].to_numpy(), res_df["pagerank"].to_numpy())


def test_partitioned_write_manifest_excludes_orphans(tmp_path):
    """A retried spill task leaves orphan chunk files; the manifest (and
    therefore the engine's reader) must exclude them — no silent
    duplication (round-1 ADVICE)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from everythinggraph_ray.graph.build import _write_partitioned, list_partition_files
    from everythinggraph_ray.graph.engine import _read_part_dir

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.arange(100), pa.int64()),
                "dst": pa.array(np.arange(100) % 7, pa.int64()),
                "p": pa.array(np.arange(100) % 4, pa.int64()),
            }
        )
    )
    out = str(tmp_path / "parts")
    rows = _write_partitioned(ds, out, "p")
    assert sum(rows.values()) == 100
    # simulate a failed attempt's orphan chunk landing AFTER the build...
    d = str(tmp_path / "parts" / "p=00001")
    pq.write_table(
        pa.table({"src": pa.array([999], pa.int64()), "dst": pa.array([999], pa.int64())}),
        d + "/chunk-deadbeef-1.parquet",
    )
    # ...manifest-driven readers must not see it
    assert not any("deadbeef" in f for f in list_partition_files(d))
    t = _read_part_dir(d)
    assert t.num_rows == rows[1]
    assert 999 not in t["src"].to_numpy(zero_copy_only=False)


def test_partitioned_write_compaction_bounds_files(tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.graph.build import _write_partitioned, list_partition_files
    from everythinggraph_ray.graph.engine import _read_part_dir

    n = 4000
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.arange(n), pa.int64()),
                "p": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )
    ).repartition(20)  # many batches → many chunk files for partition 0
    out = str(tmp_path / "parts")
    rows = _write_partitioned(ds, out, "p", max_files=8)
    d = str(tmp_path / "parts" / "p=00000")
    files = list_partition_files(d)
    assert len(files) <= 8
    t = _read_part_dir(d)
    assert t.num_rows == rows[0] == n
    assert set(t["src"].to_numpy(zero_copy_only=False)) == set(range(n))


def test_engine_recovers_from_actor_death(tmp_path):
    """Kill a partition actor; run() must respawn the fleet, resume from
    the latest checkpoint, and produce results identical to an untouched
    run."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import PageRankKernel

    rng = np.random.default_rng(3)
    n = 50000
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(rng.integers(0, 900, n), pa.int64()),
                "dst": pa.array(rng.integers(0, 900, n), pa.int64()),
            }
        )
    )
    bdir = str(tmp_path / "g")
    build_graph(edges, bdir, num_partitions=4, hub_threshold=10**9)

    # reference: clean run, fixed 8 iterations
    eng = GraphEngine(bdir)
    try:
        want = (
            eng.run(PageRankKernel(), n_iters=8, checkpoint_dir=str(tmp_path / "c0"),
                    checkpoint_every=3)["dataset"]
            .to_pandas()
            .sort_values("vid")["pagerank"]
            .to_numpy()
        )
    finally:
        eng.shutdown()

    # seeded checkpoint at superstep 3, then a DEAD actor before run()
    ck = str(tmp_path / "c1")
    eng = GraphEngine(bdir)
    try:
        eng.run(PageRankKernel(), n_iters=3, checkpoint_dir=ck, checkpoint_every=3)
        ray.kill(eng.actors[1])  # partition 1 dies "mid-job"
        got = (
            eng.run(PageRankKernel(), n_iters=8, checkpoint_dir=ck, checkpoint_every=3)[
                "dataset"
            ]
            .to_pandas()
            .sort_values("vid")["pagerank"]
            .to_numpy()
        )
    finally:
        eng.shutdown()
    assert np.array_equal(got, want)

    # with recovery disabled the same death is fatal
    eng = GraphEngine(bdir)
    try:
        ray.kill(eng.actors[2])
        import pytest as _pytest

        with _pytest.raises(ray.exceptions.RayActorError):
            eng.run(PageRankKernel(), n_iters=2, max_recoveries=0)
    finally:
        eng.shutdown()


def test_build_cache_param_mismatch(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from everythinggraph_ray.graph.build import build_graph

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.arange(100) % 10, pa.int64()),
                "dst": pa.array(np.arange(100) % 7, pa.int64()),
            }
        )
    )
    d = str(tmp_path / "b")
    build_graph(edges, d, num_partitions=4, hub_threshold=10**9)
    # same params → cached meta returned
    meta = build_graph(edges, d, num_partitions=4, hub_threshold=10**9)
    assert meta["P"] == 4
    with pytest.raises(ValueError, match="mismatched layout"):
        build_graph(edges, d, num_partitions=8, hub_threshold=10**9)
    with pytest.raises(ValueError, match="mismatched layout"):
        build_graph(edges, d, num_partitions=4, hub_threshold=10**9, weighted=True)
    with pytest.raises(ValueError, match="mismatched layout"):
        build_graph(edges, d, num_partitions=4, hub_threshold=10**9, partition_edges_by="dst")


def test_empty_partition_with_hubs_and_seeds(tmp_path):
    """A partition owning ZERO vertices (all vids even, P=2) with hubs
    present must construct and run — both the engine's owned-hub lookup
    and LabelPropKernel's seed injection had empty-array index bugs."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import LabelPropKernel, WCCKernel

    rng = np.random.default_rng(4)
    src = rng.integers(0, 50, 4000) * 2  # all even → partition 1 owns nothing
    dst = rng.integers(0, 50, 4000) * 2
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    d = str(tmp_path / "g")
    build_graph(edges, d, num_partitions=2, hub_threshold=10)  # low threshold → hubs exist
    eng = GraphEngine(d)
    try:
        out = eng.run(WCCKernel())["dataset"].to_pandas()
        assert len(out) > 0
    finally:
        eng.shutdown()
    eng = GraphEngine(d)
    try:
        out = eng.run(LabelPropKernel({0: -1}))["dataset"].to_pandas()
        assert (out["labelprop"] == -1).any()  # seed propagated
    finally:
        eng.shutdown()


def test_resume_rejects_different_kernel_params(small_build, tmp_path):
    import pytest

    ck = str(tmp_path / "ckp")
    eng = GraphEngine(small_build)
    try:
        eng.run(
            PageRankKernel(damping=0.85), n_iters=3, checkpoint_dir=ck, checkpoint_every=3
        )
        with pytest.raises(ValueError, match="kernel params"):
            eng.run(
                PageRankKernel(damping=0.5),
                n_iters=6,
                checkpoint_dir=ck,
                checkpoint_every=3,
                resume=True,
            )
    finally:
        eng.shutdown()


def test_resume_reseeds_aggregator_kernels(small_build, tmp_path):
    """needs_global kernels (DanglingPageRankKernel) resume bitwise: the
    aggregator total for the first post-resume apply is recomputed from
    the LOADED values, not carried stale."""
    from everythinggraph_ray.graph.kernels import DanglingPageRankKernel

    ckpt = str(tmp_path / "ckpt_dg")
    eng = GraphEngine(small_build)
    try:
        full = eng.run(DanglingPageRankKernel(), n_iters=10)
        full_df = full["dataset"].to_pandas().sort_values("vid")
    finally:
        eng.shutdown()

    eng1 = GraphEngine(small_build)
    try:
        eng1.run(
            DanglingPageRankKernel(), n_iters=6, checkpoint_dir=ckpt, checkpoint_every=3
        )
    finally:
        eng1.shutdown()

    eng2 = GraphEngine(small_build)
    try:
        res = eng2.run(
            DanglingPageRankKernel(),
            n_iters=10,
            checkpoint_dir=ckpt,
            checkpoint_every=3,
            resume=True,
        )
        res_df = res["dataset"].to_pandas().sort_values("vid")
    finally:
        eng2.shutdown()

    np.testing.assert_array_equal(
        res_df["pagerank_dangling"].to_numpy(), full_df["pagerank_dangling"].to_numpy()
    )
