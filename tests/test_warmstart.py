"""Warm-start (incremental) PageRank: GraphEngine.save_state +
WarmStartPageRankKernel — the daily-recrawl recompute pattern. The prior
fixpoint is read per-partition through the ctx storage seam (no O(V)
broadcast), new vertices cold-init, and convergence takes far fewer
supersteps than a cold run on the grown graph."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from everythinggraph_ray.graph.build import build_graph
from everythinggraph_ray.graph.engine import GraphEngine
from everythinggraph_ray.graph.kernels import PageRankKernel, WarmStartPageRankKernel


def _edges_ds(sv, dv):
    return ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    )


@pytest.fixture(scope="module")
def base_and_grown(tmp_path_factory):
    rng = np.random.default_rng(42)
    n_base = 3000
    sv = rng.integers(0, 300, n_base)
    dv = rng.integers(0, 300, n_base)
    # delta: 10% new edges, including vertices the base graph never saw
    sv2 = np.concatenate([sv, rng.integers(0, 330, 300)])
    dv2 = np.concatenate([dv, rng.integers(0, 330, 300)])

    root = tmp_path_factory.mktemp("warm")
    base_dir, grown_dir = str(root / "base"), str(root / "grown")
    build_graph(_edges_ds(sv, dv), base_dir, num_partitions=4, hub_threshold=10**9)
    build_graph(_edges_ds(sv2, dv2), grown_dir, num_partitions=4, hub_threshold=10**9)
    return base_dir, grown_dir, str(root / "state")


def test_warm_start_same_graph_converges_immediately(base_and_grown):
    base_dir, _, state_dir = base_and_grown
    eng = GraphEngine(base_dir)
    try:
        cold = eng.run(PageRankKernel(), tol=1e-6)
        eng.save_state(state_dir)
        warm = eng.run(WarmStartPageRankKernel(state_dir), tol=1e-6)
    finally:
        eng.shutdown()
    assert cold["iterations"] > 5
    # starting AT the fixpoint: one superstep re-verifies convergence
    assert warm["iterations"] <= 2
    c = cold["dataset"].to_pandas().sort_values("vid")
    w = warm["dataset"].to_pandas().sort_values("vid")
    np.testing.assert_allclose(
        w["pagerank_warm"].to_numpy(), c["pagerank"].to_numpy(), rtol=0, atol=1e-5
    )


def test_warm_start_on_grown_graph_matches_cold_with_fewer_supersteps(base_and_grown):
    base_dir, grown_dir, state_dir = base_and_grown
    eng_b = GraphEngine(base_dir)
    try:
        eng_b.run(PageRankKernel(), tol=1e-6)
        eng_b.save_state(state_dir)
    finally:
        eng_b.shutdown()

    eng_g = GraphEngine(grown_dir)
    try:
        cold = eng_g.run(PageRankKernel(), tol=1e-6)
        warm = eng_g.run(WarmStartPageRankKernel(state_dir), tol=1e-6)
    finally:
        eng_g.shutdown()

    # both runs sit within tol-scale distance of the unique fixpoint
    c = cold["dataset"].to_pandas().sort_values("vid")
    w = warm["dataset"].to_pandas().sort_values("vid")
    assert list(c["vid"]) == list(w["vid"])
    np.testing.assert_allclose(
        w["pagerank_warm"].to_numpy(), c["pagerank"].to_numpy(), rtol=0, atol=2e-5
    )
    # the point of warm starts: a 10% delta costs a fraction of the supersteps
    assert warm["iterations"] < cold["iterations"]


def test_warm_start_rejects_partition_mismatch(base_and_grown, tmp_path):
    base_dir, _, state_dir = base_and_grown
    rng = np.random.default_rng(1)
    other = str(tmp_path / "p8")
    build_graph(
        _edges_ds(rng.integers(0, 300, 1000), rng.integers(0, 300, 1000)),
        other,
        num_partitions=8,
        hub_threshold=10**9,
    )
    eng = GraphEngine(other)
    try:
        with pytest.raises(Exception, match="P=4"):
            eng.run(WarmStartPageRankKernel(state_dir), tol=1e-6)
    finally:
        eng.shutdown()


def test_warm_start_rejects_incomplete_state_dir(base_and_grown, tmp_path):
    """A state dir without _SUCCESS (crashed half-write) fails loudly
    instead of silently cold-initialising."""
    import shutil

    base_dir, _, state_dir = base_and_grown
    broken = str(tmp_path / "broken_state")
    shutil.copytree(state_dir, broken)
    import os

    os.remove(os.path.join(broken, "_SUCCESS"))
    eng = GraphEngine(base_dir)
    try:
        with pytest.raises(Exception, match="_SUCCESS"):
            eng.run(WarmStartPageRankKernel(broken), tol=1e-6)
    finally:
        eng.shutdown()


def test_warm_start_with_hub_split_build(tmp_path):
    """Warm start on a build WITH hub-split vertices (hub_threshold=8):
    the per-partition state round-trips through save_state across the
    hub/regular ownership split and still lands the cold fixpoint."""
    rng = np.random.default_rng(7)
    # skewed: vertex 0 is a massive hub
    sv = np.concatenate([np.zeros(800, np.int64), rng.integers(0, 120, 1200)])
    dv = np.concatenate([rng.integers(0, 120, 800), rng.integers(0, 120, 1200)])
    bdir = str(tmp_path / "hubby")
    build_graph(_edges_ds(sv, dv), bdir, num_partitions=4, hub_threshold=8)
    state = str(tmp_path / "state")
    eng = GraphEngine(bdir)
    try:
        cold = eng.run(PageRankKernel(), tol=1e-6)
        eng.save_state(state)
        warm = eng.run(WarmStartPageRankKernel(state), tol=1e-6)
    finally:
        eng.shutdown()
    assert warm["iterations"] <= 2
    c = cold["dataset"].to_pandas().sort_values("vid")
    w = warm["dataset"].to_pandas().sort_values("vid")
    np.testing.assert_allclose(
        w["pagerank_warm"].to_numpy(), c["pagerank"].to_numpy(), rtol=0, atol=1e-5
    )


# ---------------------------------------------------------------------------
# Warm-start WCC (WarmStartWCCKernel): unlike PageRank's tol-scale
# agreement, the warm fixpoint must be BIT-IDENTICAL to cold WCC.
# ---------------------------------------------------------------------------

from everythinggraph_ray.graph.kernels import WCCKernel, WarmStartWCCKernel
from everythinggraph_ray.stages.edges import undirect_edges


@pytest.fixture(scope="module")
def und_base_and_grown(tmp_path_factory):
    """Undirected builds of a base edge set and a grown superset whose
    delta MERGES previously-separate components (vids 0..299 vs
    300..599) and adds brand-new vertices (600..629)."""
    rng = np.random.default_rng(11)
    sv_a = rng.integers(0, 300, 1500)
    dv_a = rng.integers(0, 300, 1500)
    sv_b = rng.integers(300, 600, 1500)
    dv_b = rng.integers(300, 600, 1500)
    sv = np.concatenate([sv_a, sv_b])
    dv = np.concatenate([dv_a, dv_b])
    # delta: cross edges joining the two halves + new vertices
    sv2 = np.concatenate([sv, rng.integers(0, 630, 200)])
    dv2 = np.concatenate([dv, rng.integers(0, 630, 200)])

    root = tmp_path_factory.mktemp("warmwcc")
    base_dir, grown_dir = str(root / "base"), str(root / "grown")
    build_graph(
        undirect_edges(_edges_ds(sv, dv)), base_dir, num_partitions=4, hub_threshold=10**9
    )
    build_graph(
        undirect_edges(_edges_ds(sv2, dv2)),
        grown_dir,
        num_partitions=4,
        hub_threshold=10**9,
    )
    return base_dir, grown_dir, str(root / "state")


def test_warm_wcc_same_graph_converges_immediately(und_base_and_grown):
    base_dir, _, state_dir = und_base_and_grown
    eng = GraphEngine(base_dir)
    try:
        cold = eng.run(WCCKernel())
        eng.save_state(state_dir)
        warm = eng.run(WarmStartWCCKernel(state_dir))
    finally:
        eng.shutdown()
    assert cold["iterations"] > 2
    # starting AT the fixpoint: one superstep re-verifies convergence
    assert warm["iterations"] <= 2
    c = cold["dataset"].to_pandas().sort_values("vid")
    w = warm["dataset"].to_pandas().sort_values("vid")
    assert list(w["wcc_warm"]) == list(c["wcc"])


def test_warm_wcc_on_grown_graph_bit_identical_with_fewer_supersteps(
    und_base_and_grown,
):
    base_dir, grown_dir, state_dir = und_base_and_grown
    eng_b = GraphEngine(base_dir)
    try:
        eng_b.run(WCCKernel())
        eng_b.save_state(state_dir)
    finally:
        eng_b.shutdown()

    eng_g = GraphEngine(grown_dir)
    try:
        cold = eng_g.run(WCCKernel())
        warm = eng_g.run(WarmStartWCCKernel(state_dir))
    finally:
        eng_g.shutdown()

    c = cold["dataset"].to_pandas().sort_values("vid")
    w = warm["dataset"].to_pandas().sort_values("vid")
    assert list(c["vid"]) == list(w["vid"])
    # exactness, not tol-scale: min-semiring over pre-propagated labels
    assert list(w["wcc_warm"]) == list(c["wcc"])
    # the delta merged components, yet labels start pre-propagated
    assert warm["iterations"] <= cold["iterations"]


def test_warm_wcc_rejects_incomplete_state_dir(und_base_and_grown, tmp_path):
    import os
    import shutil

    base_dir, _, state_dir = und_base_and_grown
    broken = str(tmp_path / "broken_wcc_state")
    shutil.copytree(state_dir, broken)
    os.remove(os.path.join(broken, "_SUCCESS"))
    eng = GraphEngine(base_dir)
    try:
        with pytest.raises(Exception, match="_SUCCESS"):
            eng.run(WarmStartWCCKernel(broken))
    finally:
        eng.shutdown()
