"""Filesystem-seam tests: the whole build → engine → checkpoint → resume
cycle runs against an EXPLICIT pyarrow filesystem handle.

Using SubTreeFileSystem (all paths relative to a jail root) is the strong
form of the test: any code path that slipped back to raw ``os`` calls on
the given path would look outside the jail and fail, so green here proves
every durable artifact goes through the seam — the property a multi-node
deployment against s3:// shared storage relies on."""

import numpy as np
import pyarrow as pa
import pytest
from pyarrow import fs as pafs

import ray.data

from everythinggraph_ray.graph.build import build_graph, list_partition_files
from everythinggraph_ray.graph.engine import GraphEngine, _latest_checkpoint
from everythinggraph_ray.graph.kernels import PageRankKernel


def _edges(n_v=200, n_e=5000, seed=3):
    rng = np.random.default_rng(seed)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(rng.integers(0, n_v, n_e), pa.int64()),
                "dst": pa.array(rng.integers(0, n_v, n_e), pa.int64()),
            }
        )
    )


def test_build_and_engine_through_subtree_fs(tmp_path):
    jail = tmp_path / "jail"
    jail.mkdir()
    fs = pafs.SubTreeFileSystem(str(jail), pafs.LocalFileSystem())

    meta = build_graph(_edges(), "build", num_partitions=3, hub_threshold=10**9, filesystem=fs)
    # the layout landed INSIDE the jail, fully manifested
    assert (jail / "build" / "_SUCCESS").exists()
    files = list_partition_files("build/edges/p=00000", filesystem=fs)
    assert files and all(f.endswith(".parquet") for f in files)

    eng = GraphEngine("build", filesystem=fs)
    try:
        res = eng.run(PageRankKernel(), n_iters=5)
        df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    finally:
        eng.shutdown()
    assert len(df) == meta["n_vertices"]

    # local-path run on the same edge table must agree bit-for-bit
    local_dir = str(tmp_path / "local_build")
    build_graph(_edges(), local_dir, num_partitions=3, hub_threshold=10**9)
    eng = GraphEngine(local_dir)
    try:
        want = (
            eng.run(PageRankKernel(), n_iters=5)["dataset"]
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
    finally:
        eng.shutdown()
    assert np.array_equal(df["pagerank"].to_numpy(), want["pagerank"].to_numpy())


def test_checkpoint_resume_through_subtree_fs(tmp_path):
    jail = tmp_path / "jail"
    jail.mkdir()
    fs = pafs.SubTreeFileSystem(str(jail), pafs.LocalFileSystem())
    build_graph(_edges(seed=4), "b", num_partitions=3, hub_threshold=10**9, filesystem=fs)

    eng = GraphEngine("b", filesystem=fs)
    try:
        full = eng.run(PageRankKernel(), n_iters=8, checkpoint_dir="ckpt", checkpoint_every=4)
        df_full = full["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    finally:
        eng.shutdown()
    # snapshots + lineage live inside the jail, _SUCCESS-gated
    assert (jail / "ckpt" / "lineage.json").exists()
    assert _latest_checkpoint("ckpt", fs) == 8

    # resume from superstep 8 and run to 12; compare vs a straight 12
    eng = GraphEngine("b", filesystem=fs)
    try:
        res = eng.run(
            PageRankKernel(), n_iters=12, checkpoint_dir="ckpt", checkpoint_every=4, resume=True
        )
        df_res = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    finally:
        eng.shutdown()
    eng = GraphEngine("b", filesystem=fs)
    try:
        straight = eng.run(PageRankKernel(), n_iters=12)
        df_straight = straight["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    finally:
        eng.shutdown()
    assert np.array_equal(df_res["pagerank"].to_numpy(), df_straight["pagerank"].to_numpy())
    # the resumed run really did skip the first 8 supersteps
    assert res["iterations"] == 12 and len(res["metrics"]) == 12
    assert not np.array_equal(df_full["pagerank"].to_numpy(), df_res["pagerank"].to_numpy())


def test_stale_unmarked_build_is_rebuilt(tmp_path):
    """A build dir without _SUCCESS (half-finished attempt) is deleted and
    rebuilt — stale chunk files can never leak into the new layout."""
    jail = tmp_path / "jail"
    (jail / "b" / "edges" / "p=00000").mkdir(parents=True)
    (jail / "b" / "edges" / "p=00000" / "chunk-stale-0.parquet").write_bytes(b"garbage")
    fs = pafs.SubTreeFileSystem(str(jail), pafs.LocalFileSystem())
    meta = build_graph(_edges(seed=5), "b", num_partitions=2, hub_threshold=10**9, filesystem=fs)
    assert meta["n_edges"] == 5000
    assert not (jail / "b" / "edges" / "p=00000" / "chunk-stale-0.parquet").exists()


def test_layout_cache_roundtrip_and_invalidation(tmp_path):
    """The per-partition layout cache returns bit-identical kernels warm
    vs cold vs disabled, survives the fs seam, and a fingerprint mismatch
    (stale/corrupt cache) falls back to a silent recompute."""
    import glob

    from everythinggraph_ray.graph.engine import _LAYOUT_CACHE_VERSION

    bdir = str(tmp_path / "b")
    build_graph(_edges(seed=9), bdir, num_partitions=3, hub_threshold=100)

    def pr(layout_cache=True):
        eng = GraphEngine(bdir, layout_cache=layout_cache)
        try:
            return (
                eng.run(PageRankKernel(), n_iters=6)["dataset"]
                .to_pandas()
                .sort_values("vid")
                .reset_index(drop=True)
            )
        finally:
            eng.shutdown()

    cold = pr()  # writes the caches
    caches = glob.glob(f"{bdir}/edges/p=*/layout-v{_LAYOUT_CACHE_VERSION}.npz")
    assert len(caches) == 3
    warm = pr()  # loads them
    off = pr(layout_cache=False)
    assert np.array_equal(cold["pagerank"].to_numpy(), warm["pagerank"].to_numpy())
    assert np.array_equal(cold["pagerank"].to_numpy(), off["pagerank"].to_numpy())

    # corrupt one cache file: the engine must fall back to recompute and
    # still produce identical values (and rewrite a valid cache)
    with open(caches[0], "wb") as fh:
        fh.write(b"not an npz")
    again = pr()
    assert np.array_equal(cold["pagerank"].to_numpy(), again["pagerank"].to_numpy())


def test_pull_engines_through_subtree_fs(tmp_path):
    """pagerank_pull and frontier_pull read dst-partitioned builds through
    the filesystem seam too (no hidden local-path reads)."""
    from everythinggraph_ray.graph.pull import frontier_pull, pagerank_pull

    jail = tmp_path / "jail"
    jail.mkdir()
    fs = pafs.SubTreeFileSystem(str(jail), pafs.LocalFileSystem())
    build_graph(
        _edges(seed=6), "pb", num_partitions=3, hub_threshold=10**9,
        partition_edges_by="dst", filesystem=fs,
    )
    pr = pagerank_pull("pb", n_iters=4, filesystem=fs)["dataset"].to_pandas()
    assert len(pr) > 0 and np.isfinite(pr["pagerank"]).all()
    bfs = frontier_pull("pb", 0, kind="bfs", filesystem=fs)["dataset"].to_pandas()
    assert len(bfs) == len(pr)
