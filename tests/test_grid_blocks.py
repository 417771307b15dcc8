"""Two-level grid exchange (build_graph dst_blocks=B): kernel results
must be BIT-IDENTICAL to the flat single-object exchange — the pack
order and per-receiver slices change, the combine math does not.

The reference's 2D blocked grid (init_all.c:252-361, prgrid_cilk.c:48-88)
compared layouts on one address space; here the second level bounds
cross-node exchange traffic (a receiver fetches only its block's bytes
from each sender), so the invariance check IS the layout-correctness
evidence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _edges_ds(n_v=400, n_e=6000, seed=7):
    rng = np.random.default_rng(seed)
    # power-law-ish: square the uniform to bias low vids (hub-like)
    src = (n_v * rng.random(n_e) ** 2).astype(np.int64)
    dst = (n_v * rng.random(n_e)).astype(np.int64)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def _run(bdir, kernel, **kw):
    from everythinggraph_ray.graph.engine import GraphEngine

    eng = GraphEngine(bdir)
    try:
        res = eng.run(kernel, **kw)
        df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
        return df
    finally:
        eng.shutdown()


@pytest.fixture(scope="module")
def builds(tmp_path_factory):
    """Same edge table built flat (B=1) and blocked (P=8, B=4)."""
    from everythinggraph_ray.graph.build import build_graph

    root = tmp_path_factory.mktemp("gridblocks")
    edges = _edges_ds().materialize()
    flat = str(root / "flat")
    blocked = str(root / "blocked")
    build_graph(edges, flat, num_partitions=8, hub_threshold=64)
    build_graph(edges, blocked, num_partitions=8, hub_threshold=64, dst_blocks=4)
    return flat, blocked


def test_dst_blocks_must_divide_P(tmp_path):
    from everythinggraph_ray.graph.build import build_graph

    with pytest.raises(ValueError, match="dst_blocks"):
        build_graph(_edges_ds(n_e=50), str(tmp_path / "bad"), num_partitions=8, dst_blocks=3)


def test_pagerank_identical_across_block_layouts(builds):
    from everythinggraph_ray.graph.kernels import PageRankKernel

    flat, blocked = builds
    a = _run(flat, PageRankKernel(), tol=1e-6)
    b = _run(blocked, PageRankKernel(), tol=1e-6)
    assert np.array_equal(a["vid"].to_numpy(), b["vid"].to_numpy())
    # bit-identical: same combine order within each sender slice, senders
    # folded in the same pid order on both layouts
    assert np.array_equal(a["pagerank"].to_numpy(), b["pagerank"].to_numpy())


def test_frontier_kernels_identical_across_block_layouts(builds):
    from everythinggraph_ray.graph.kernels import BFSKernel, WCCKernel

    flat, blocked = builds
    for kernel_cls, kw in ((WCCKernel, {}), (BFSKernel, {"root": 0})):
        a = _run(flat, kernel_cls(**kw))
        b = _run(blocked, kernel_cls(**kw))
        pd.testing.assert_frame_equal(a, b)


def test_blocked_exchange_at_p64(tmp_path):
    """The verdict's done-bar: P=64 with a dst-blocked second level gives
    the same kernel output while each sender publishes P*B block objects
    whose per-receiver fetch is 1/B of the flat object."""
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import PageRankKernel

    edges = _edges_ds(n_v=600, n_e=8000, seed=11).materialize()
    flat = str(tmp_path / "flat64")
    blocked = str(tmp_path / "blocked64")
    build_graph(edges, flat, num_partitions=64, hub_threshold=10**9)
    build_graph(edges, blocked, num_partitions=64, hub_threshold=10**9, dst_blocks=8)
    a = _run(flat, PageRankKernel(), n_iters=10)
    b = _run(blocked, PageRankKernel(), n_iters=10)
    assert np.array_equal(a["pagerank"].to_numpy(), b["pagerank"].to_numpy())


def test_blocked_exchange_survives_actor_death(tmp_path):
    """Fault tolerance holds under the blocked exchange: kill a partition
    actor between runs; resume from checkpoint must reproduce the clean
    blocked-mode run bit-for-bit (block payload refs are per-round plasma
    objects — nothing durable depends on them)."""
    import ray

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import PageRankKernel

    edges = _edges_ds(n_v=500, n_e=5000, seed=13).materialize()
    bdir = str(tmp_path / "gb")
    build_graph(edges, bdir, num_partitions=8, hub_threshold=64, dst_blocks=4)

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

    ck = str(tmp_path / "c1")
    eng = GraphEngine(bdir)
    try:
        eng.run(PageRankKernel(), n_iters=3, checkpoint_dir=ck, checkpoint_every=3)
        ray.kill(eng.actors[1])
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


def test_weighted_and_sssp_identical_across_block_layouts(tmp_path):
    """Rounds out the invariance matrix: weighted kernels (needs_weights
    edge values) and the adaptive SSSP frontier behave bit-identically
    under the blocked exchange."""
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import (
        SSSPWeightedKernel,
        WeightedPageRankKernel,
    )
    from everythinggraph_ray.stages.edges import synthesize_weights

    edges = synthesize_weights(_edges_ds(n_v=300, n_e=4000, seed=17)).materialize()
    flat = str(tmp_path / "wflat")
    blocked = str(tmp_path / "wblocked")
    build_graph(edges, flat, num_partitions=8, hub_threshold=10**9, weighted=True)
    build_graph(
        edges, blocked, num_partitions=8, hub_threshold=10**9, weighted=True,
        dst_blocks=4,
    )
    a = _run(flat, WeightedPageRankKernel(), n_iters=10)
    b = _run(blocked, WeightedPageRankKernel(), n_iters=10)
    assert np.array_equal(a["wpagerank"].to_numpy(), b["wpagerank"].to_numpy())

    root = int(a["vid"].min())
    c = _run(flat, SSSPWeightedKernel(root=root))
    d = _run(blocked, SSSPWeightedKernel(root=root))
    pd.testing.assert_frame_equal(c, d)


def test_sort_kind_layout_strategies_agree(tmp_path):
    """The construction-strategy option (radix 'stable' vs comparison
    'quicksort' — the reference's init_adj_sort/init_adj_count
    comparison in numpy terms): same build, both strategies produce the
    same CSR SEMANTICS — exact WCC/BFS, allclose PageRank (per-src edge
    order may differ between sorts, reassociating float sums within
    ulps)."""
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import BFSKernel, PageRankKernel, WCCKernel

    edges = _edges_ds(n_v=400, n_e=5000, seed=23).materialize()
    bdir = str(tmp_path / "g")
    build_graph(edges, bdir, num_partitions=4, hub_threshold=64)

    def run(kind, kernel, **kw):
        eng = GraphEngine(bdir, layout_cache=False, sort_kind=kind)
        try:
            return (
                eng.run(kernel, **kw)["dataset"]
                .to_pandas()
                .sort_values("vid")
                .reset_index(drop=True)
            )
        finally:
            eng.shutdown()

    a = run("stable", PageRankKernel(), n_iters=10)
    b = run("quicksort", PageRankKernel(), n_iters=10)
    assert np.allclose(a["pagerank"], b["pagerank"], atol=1e-12)
    pd.testing.assert_frame_equal(run("stable", WCCKernel()), run("quicksort", WCCKernel()))
    pd.testing.assert_frame_equal(
        run("stable", BFSKernel(root=0)), run("quicksort", BFSKernel(root=0))
    )
