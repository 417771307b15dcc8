"""Graph kernels vs serial NumPy oracles (reference semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from everythinggraph_ray.graph import oracle as O
from everythinggraph_ray.graph.engine import GraphEngine
from everythinggraph_ray.graph.kernels import (
    BFSKernel,
    LabelPropKernel,
    PageRankKernel,
    SpMVKernel,
    SSSPHopsKernel,
    SSSPWeightedKernel,
    WCCKernel,
)


@pytest.fixture(scope="module")
def engine(small_build):
    eng = GraphEngine(small_build)
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def engine_und(small_build_undirected):
    eng = GraphEngine(small_build_undirected)
    yield eng
    eng.shutdown()


def _vals(res, col):
    df = res["dataset"].to_pandas().sort_values("vid")
    return df["vid"].to_numpy(), df[col].to_numpy()


def test_pagerank_allclose(engine, small_edges):
    sv, dv = small_edges
    res = engine.run(PageRankKernel(), tol=1e-6)
    vids, pr = _vals(res, "pagerank")
    ovids, opr, oiters = O.pagerank_oracle(sv, dv, tol=1e-6)
    assert np.array_equal(vids, ovids)
    np.testing.assert_allclose(pr, opr, rtol=0, atol=1e-6)
    assert res["iterations"] == oiters


def test_pagerank_fixed10_matches_reference_mode(engine, small_edges):
    sv, dv = small_edges
    res = engine.run(PageRankKernel(), n_iters=10)
    _, pr = _vals(res, "pagerank")
    _, opr, _ = O.pagerank_oracle(sv, dv, n_iters=10)
    np.testing.assert_allclose(pr, opr, rtol=0, atol=1e-12)


def test_ppr_matches_numpy_oracle(engine, small_edges):
    from everythinggraph_ray.graph.kernels import PersonalizedPageRankKernel

    sv, dv = small_edges
    mod = 7  # url-hash vids: ~1/7 of vertices become seeds
    verts = np.unique(np.concatenate([sv, dv]))
    n_seeds = int((verts % mod == 0).sum())
    assert n_seeds > 0
    res = engine.run(PersonalizedPageRankKernel(mod, n_seeds), n_iters=10)
    vids, pr = _vals(res, "ppr")
    ovids, opr = O.ppr_oracle(sv, dv, mod, n_iters=10)
    assert np.array_equal(vids, ovids)
    np.testing.assert_allclose(pr, opr, rtol=0, atol=1e-12)
    # teleport mass is confined to seeds: non-seeds unreachable from any
    # seed must hold exactly zero rank
    seeds = set(verts[verts % mod == 0].tolist())
    reach = set(seeds)
    import collections

    adj = collections.defaultdict(list)
    for a, b in zip(sv.tolist(), dv.tolist()):
        adj[a].append(b)
    frontier = list(seeds)
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in reach:
                    reach.add(v)
                    nxt.append(v)
        frontier = nxt
    unreached_mask = np.array([v not in reach for v in vids.tolist()])
    assert np.all(pr[unreached_mask] == 0.0)


def test_katz_matches_numpy_oracle(engine, small_edges):
    from everythinggraph_ray.graph.kernels import KatzKernel

    sv, dv = small_edges
    res = engine.run(KatzKernel(alpha=0.01, beta=1.0), n_iters=10)
    vids, x = _vals(res, "katz")
    ovids, ox = O.katz_oracle(sv, dv, alpha=0.01, beta=1.0, n_iters=10)
    assert np.array_equal(vids, ovids)
    np.testing.assert_allclose(x, ox, rtol=0, atol=1e-10)


def test_dag_depth_matches_serial_topological_dp(tmp_path):
    """DagDepthKernel (max-plus) over a degree-oriented random graph vs a
    serial Kahn-style longest-path DP."""
    import pyarrow as pa

    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import DagDepthKernel

    rng = np.random.default_rng(29)
    sv = rng.integers(0, 150, 3000).astype(np.int64)
    dv = rng.integers(0, 150, 3000).astype(np.int64)
    keep = sv != dv
    sv, dv = sv[keep], dv[keep]
    # canonical undirected distinct pairs + degree orientation (serial)
    lo, hi = np.minimum(sv, dv), np.maximum(sv, dv)
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    vid, cnt = np.unique(pairs.ravel(), return_counts=True)
    deg = dict(zip(vid.tolist(), cnt.tolist()))
    u = np.where(
        [deg[a] <= deg[b] for a, b in pairs], pairs[:, 0], pairs[:, 1]
    )
    v = np.where(
        [deg[a] <= deg[b] for a, b in pairs], pairs[:, 1], pairs[:, 0]
    )
    # serial longest-path DP in (deg, vid) topological order
    order = sorted(vid.tolist(), key=lambda x: (deg[x], x))
    depth = {x: 0 for x in order}
    adj: dict[int, list[int]] = {}
    for a, b in zip(u.tolist(), v.tolist()):
        adj.setdefault(a, []).append(b)
    for x in order:
        for y in adj.get(x, []):
            depth[y] = max(depth[y], depth[x] + 1)

    bdir = str(tmp_path / "dag_build")
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(u, pa.int64()), "dst": pa.array(v, pa.int64())})
    )
    build_graph(ds, bdir, num_partitions=4, hub_threshold=10**9)
    eng = GraphEngine(bdir)
    try:
        res = eng.run(DagDepthKernel())
    finally:
        eng.shutdown()
    vids, x = _vals(res, "dag_depth")
    assert np.array_equal(vids, np.sort(vid))
    assert np.array_equal(x, np.array([depth[i] for i in vids]))
    assert x.max() > 0  # the graph is dense enough that depth propagates


def test_eigenvector_matches_numpy_oracle(engine, small_edges):
    from everythinggraph_ray.graph.kernels import EigenvectorKernel

    sv, dv = small_edges
    res = engine.run(EigenvectorKernel(), n_iters=10)
    vids, x = _vals(res, "eigenvector")
    ovids, ox = O.eigenvector_oracle(sv, dv, n_iters=10)
    assert np.array_equal(vids, ovids)
    np.testing.assert_allclose(x, ox, rtol=0, atol=1e-10)
    # direction converges: one more normalized step barely moves (power
    # iteration has settled near the principal eigvec on this graph)
    _, ox11 = O.eigenvector_oracle(sv, dv, n_iters=11)
    assert np.max(np.abs(ox11 / ox11.sum() - ox / ox.sum())) < 0.05


def test_wpagerank_matches_oracle_with_hub_split(tmp_path):
    import pyarrow as pa

    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import WeightedPageRankKernel

    rng = np.random.default_rng(13)
    sv = rng.integers(0, 120, 4000).astype(np.int64)
    # vertex 7 is a forced hub (degree >> threshold)
    sv[:800] = 7
    dv = rng.integers(0, 120, 4000).astype(np.int64)
    wv = (sv % 10 + dv % 10).astype(np.float64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(sv, pa.int64()),
                "dst": pa.array(dv, pa.int64()),
                "weight": pa.array(wv, pa.float64()),
            }
        )
    )
    bdir = str(tmp_path / "wpr_build")
    build_graph(ds, bdir, num_partitions=4, weighted=True, hub_threshold=100)
    eng = GraphEngine(bdir)
    try:
        res = eng.run(WeightedPageRankKernel(), n_iters=10)
    finally:
        eng.shutdown()
    vids, pr = _vals(res, "wpagerank")
    ovids, opr = O.wpagerank_oracle(sv, dv, wv, n_iters=10)
    assert np.array_equal(vids, ovids)
    np.testing.assert_allclose(pr, opr, rtol=0, atol=1e-12)


def test_wpagerank_requires_weighted_build(engine):
    from everythinggraph_ray.graph.kernels import WeightedPageRankKernel

    with pytest.raises(Exception, match="weighted"):
        engine.run(WeightedPageRankKernel(), n_iters=1)


def test_hits_matches_serial(tmp_path):
    import pyarrow as pa

    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.hits import hits, hits_serial

    rng = np.random.default_rng(9)
    sv = rng.integers(0, 200, 3000).astype(np.int64)
    dv = rng.integers(0, 200, 3000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    )
    bdir = str(tmp_path / "hits_build")
    build_graph(ds, bdir, num_partitions=4, partition_edges_by="dst")
    res = hits(bdir, n_iters=10)
    df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, oauth, ohub = hits_serial(sv, dv, n_iters=10)
    assert np.array_equal(df["vid"].to_numpy(), ovids)
    np.testing.assert_allclose(df["auth"].to_numpy(), oauth, rtol=0, atol=1e-12)
    np.testing.assert_allclose(df["hub"].to_numpy(), ohub, rtol=0, atol=1e-12)
    # L2 norms of the final phases are 1 by construction
    assert abs(np.dot(df["auth"], df["auth"]) - 1.0) < 1e-9
    assert abs(np.dot(df["hub"], df["hub"]) - 1.0) < 1e-9


def test_salsa_matches_serial(tmp_path):
    import pyarrow as pa

    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.hits import salsa, salsa_serial

    rng = np.random.default_rng(10)
    sv = rng.integers(0, 200, 3000).astype(np.int64)
    dv = rng.integers(0, 200, 3000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    )
    bdir = str(tmp_path / "salsa_build")
    build_graph(ds, bdir, num_partitions=4, partition_edges_by="dst")
    res = salsa(bdir, n_iters=10)
    df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, oauth, ohub = salsa_serial(sv, dv, n_iters=10)
    assert np.array_equal(df["vid"].to_numpy(), ovids)
    np.testing.assert_allclose(df["salsa_auth"].to_numpy(), oauth, rtol=0, atol=1e-12)
    np.testing.assert_allclose(df["salsa_hub"].to_numpy(), ohub, rtol=0, atol=1e-12)
    # L1 norms of the final phases are 1 by construction (walk distributions)
    assert abs(df["salsa_auth"].sum() - 1.0) < 1e-9
    assert abs(df["salsa_hub"].sum() - 1.0) < 1e-9


def test_kcore_matches_serial_peel():
    import pyarrow as pa

    import ray.data

    from everythinggraph_ray.graph.kcore import kcore, kcore_serial

    rng = np.random.default_rng(3)
    sv = rng.integers(0, 60, 900)
    dv = rng.integers(0, 60, 900)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    )
    for k in (3, 12, 25, 80):
        core, rounds = kcore(ds, k)
        got = {int(r["vid"]): int(r["deg"]) for r in core.take_all()}
        exp = kcore_serial(sv, dv, k)
        assert got == exp, (k, rounds)
        assert rounds >= 1
    # empty core (k above max degree) and k validation
    core, _ = kcore(ds, 10_000)
    assert core.count() == 0
    with pytest.raises(ValueError):
        kcore(ds, 0)


def test_ppr_rejects_empty_seed_set():
    from everythinggraph_ray.graph.kernels import PersonalizedPageRankKernel

    with pytest.raises(ValueError):
        PersonalizedPageRankKernel(100, 0)


def test_hub_split_is_partition_invariant(small_corpus, small_edges, tmp_path):
    """Skew axis: hub-split build (low threshold → many mirrors) must give
    bit-equal-to-tolerance ranks vs the oracle — partial aggregation over
    disjoint mirror edge sets is exact."""
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.stages.extract import pages_to_edges

    sv, dv = small_edges
    bdir = str(tmp_path / "hubsplit")
    edges = pages_to_edges(ray.data.read_parquet(small_corpus))
    meta = build_graph(edges, bdir, num_partitions=5, hub_threshold=2)
    assert len(meta["hub_vids"]) > 10  # exercise many mirrors
    eng = GraphEngine(bdir)
    try:
        res = eng.run(PageRankKernel(), tol=1e-6)
        vids, pr = _vals(res, "pagerank")
        ovids, opr, _ = O.pagerank_oracle(sv, dv, tol=1e-6)
        np.testing.assert_allclose(pr, opr, rtol=0, atol=1e-6)
    finally:
        eng.shutdown()


def test_wcc_exact(engine_und, small_edges):
    sv, dv = small_edges
    res = engine_und.run(WCCKernel())
    vids, lab = _vals(res, "wcc")
    ovids, olab = O.wcc_oracle(sv, dv)
    assert np.array_equal(vids, ovids)
    assert np.array_equal(lab, olab)


def test_labelprop_with_seeds(engine_und, small_edges):
    sv, dv = small_edges
    ovids, olab = O.wcc_oracle(sv, dv)
    # seed two vertices with tiny labels — their whole components take them
    seeds = {int(ovids[0]): -5, int(ovids[len(ovids) // 2]): -9}
    res = engine_und.run(LabelPropKernel(seeds))
    vids, lab = _vals(res, "labelprop")
    init = ovids.astype(np.int64).copy()
    for v, s in seeds.items():
        init[np.searchsorted(ovids, v)] = s
    _, olab2 = O.wcc_oracle(sv, dv, labels=init)
    assert np.array_equal(lab, olab2)


def test_bfs_exact(engine, small_edges):
    sv, dv = small_edges
    root = int(O.vertex_universe(sv, dv)[0])
    res = engine.run(BFSKernel(root))
    vids, dist = _vals(res, "bfs")
    _, od = O.bfs_oracle(sv, dv, root)
    assert np.array_equal(dist, od)


def test_msbfs_mask_and_levels_match_per_source_bfs(engine, small_edges):
    """MS-BFS (bitwise-OR semiring): the per-vertex source bitmask must
    equal the union of 5 independent BFS reachability sets, and the
    per-superstep extra-stats vector must equal each source's BFS level
    histogram (newly-reached count at every depth)."""
    from everythinggraph_ray.graph.kernels import MultiSourceBFSKernel

    sv, dv = small_edges
    verts = O.vertex_universe(sv, dv)
    sources = [int(v) for v in verts[:5]]
    res = engine.run(MultiSourceBFSKernel(sources))
    vids, mask = _vals(res, "msbfs")

    exp = np.zeros(len(vids), dtype=np.int64)
    dists = []  # bfs_oracle convention: dist[root]=1, hop h -> h+1, unreached 0
    for i, s in enumerate(sorted(sources)):
        _, od = O.bfs_oracle(sv, dv, s)
        dists.append(od)
        exp |= (od != 0).astype(np.int64) << np.int64(i)
    assert np.array_equal(mask, exp)

    for m in res["metrics"]:
        t = m["superstep"]  # bit first set at superstep h == hop distance h
        want = [int(np.count_nonzero(od == t + 1)) for od in dists]
        assert m["extra"] == want


def test_anf_engine_matches_serial_replay(engine, small_edges):
    """The engine's per-superstep ANF histograms equal a serial replay of
    the identical deterministic FM-sketch OR-propagation."""
    from everythinggraph_ray.graph.kernels import ANFKernel

    sv, dv = small_edges
    k = ANFKernel()
    res = engine.run(k)
    got = [m["extra"] for m in res["metrics"]]

    vids = O.vertex_universe(sv, dv)
    s = np.searchsorted(vids, sv)
    d = np.searchsorted(vids, dv)
    cur = k._seed_masks(vids)
    want = []
    while True:
        nxt = cur.copy()
        np.bitwise_or.at(nxt, d, cur[s])
        want.append(np.bincount(k.sum_lsb0(nxt), minlength=64)[:64].tolist())
        if np.array_equal(nxt, cur):
            break
        cur = nxt
    assert got == want


def test_anf_estimate_tracks_exact_neighborhood_function():
    """ANF estimates of N(h) = #pairs within distance h stay within a
    [0.4, 2.2]x band of truth on a 300-vertex random graph and are
    monotone nondecreasing in h (serial replay of the kernel math)."""
    from everythinggraph_ray.graph.kernels import ANFKernel

    rng = np.random.default_rng(17)
    n = 300
    sv = rng.integers(0, n, 900).astype(np.int64)
    dv = rng.integers(0, n, 900).astype(np.int64)
    vids = O.vertex_universe(sv, dv)
    s = np.searchsorted(vids, sv)
    d = np.searchsorted(vids, dv)
    V = len(vids)

    # exact reachability-within-h via boolean matrix closure
    adj = np.zeros((V, V), dtype=bool)
    adj[s, d] = True
    reach = np.eye(V, dtype=bool)
    exact = []
    for _ in range(40):
        new = reach | (reach.astype(np.int32) @ adj.astype(np.int32) > 0)
        exact.append(int(new.sum()))
        if np.array_equal(new, reach):
            break
        reach = new

    k = ANFKernel()
    cur = k._seed_masks(vids)
    ests = []
    for _ in range(len(exact)):
        nxt = cur.copy()
        np.bitwise_or.at(nxt, d, cur[s])
        hist = np.bincount(k.sum_lsb0(nxt), minlength=64)[:64]
        ests.append(k.estimate(hist))
        cur = nxt
    for e, x in zip(ests, exact):
        assert 0.4 * x <= e <= 2.2 * x
    assert all(b >= a for a, b in zip(ests, ests[1:]))


def test_sssp_hops_exact(engine, small_edges):
    sv, dv = small_edges
    root = int(O.vertex_universe(sv, dv)[0])
    res = engine.run(SSSPHopsKernel(root))
    vids, dist = _vals(res, "sssp_hops")
    _, od = O.sssp_hops_oracle(sv, dv, root)
    assert np.array_equal(dist, od)


def test_sssp_weighted_exact(small_corpus, small_edges, tmp_path):
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.stages.edges import synthesize_weights
    from everythinggraph_ray.stages.extract import pages_to_edges

    sv, dv = small_edges
    bdir = str(tmp_path / "weighted")
    edges = synthesize_weights(pages_to_edges(ray.data.read_parquet(small_corpus)))
    build_graph(edges, bdir, num_partitions=4, hub_threshold=8, weighted=True)
    eng = GraphEngine(bdir)
    try:
        root = int(O.vertex_universe(sv, dv)[0])
        res = eng.run(SSSPWeightedKernel(root))
        vids, dist = _vals(res, "sssp_weighted")
        _, od = O.sssp_weighted_oracle(sv, dv, root)
        assert np.array_equal(dist, od)
    finally:
        eng.shutdown()


def test_widest_path_exact(small_corpus, small_edges, tmp_path):
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import WidestPathKernel
    from everythinggraph_ray.stages.edges import synthesize_weights
    from everythinggraph_ray.stages.extract import pages_to_edges

    sv, dv = small_edges
    bdir = str(tmp_path / "weighted_widest")
    edges = synthesize_weights(pages_to_edges(ray.data.read_parquet(small_corpus)))
    build_graph(edges, bdir, num_partitions=4, hub_threshold=8, weighted=True)
    eng = GraphEngine(bdir)
    try:
        root = int(O.vertex_universe(sv, dv)[0])
        res = eng.run(WidestPathKernel(root))
        vids, cap = _vals(res, "widest_path")
        ovids, ocap = O.widest_path_oracle(sv, dv, root)
        assert np.array_equal(vids, ovids)
        assert np.array_equal(cap, ocap)
        # semiring sanity: root holds the sentinel, reached caps are
        # within the synthesized weight range, capacity never exceeds
        # the bottleneck bound of any single out-edge of the root
        assert cap[vids == root][0] == WidestPathKernel.CAP_INIT
        reached = (cap != -np.inf) & (vids != root)
        assert reached.any()
        assert ((cap[reached] >= 0) & (cap[reached] <= 18)).all()
    finally:
        eng.shutdown()


def test_spmv_allclose(engine, small_edges):
    sv, dv = small_edges
    res = engine.run(SpMVKernel())
    vids, y = _vals(res, "spmv")
    _, oy = O.spmv_oracle(sv, dv)
    np.testing.assert_allclose(y, oy, rtol=1e-12)


def test_cross_variant_pagerank_dataset_vs_actor(engine, small_edges, small_corpus):
    """The reference's push-vs-pull cross-check: the pure-Dataset PageRank
    (groupby-sum supersteps) must agree with the actor engine."""
    import ray.data

    from everythinggraph_ray.graph.dataset_kernels import pagerank_dataset
    from everythinggraph_ray.stages.extract import pages_to_edges

    edges = pages_to_edges(ray.data.read_parquet(small_corpus))
    t = pagerank_dataset(edges, tol=1e-6)
    res = engine.run(PageRankKernel(), tol=1e-6)
    vids, pr = _vals(res, "pagerank")
    assert np.array_equal(t["vid"].to_numpy(), vids)
    np.testing.assert_allclose(t["pagerank"].to_numpy(), pr, rtol=0, atol=1e-9)


def test_cross_variant_wcc_dataset_vs_actor(engine_und, small_edges, small_corpus):
    import ray.data

    from everythinggraph_ray.graph.dataset_kernels import wcc_dataset
    from everythinggraph_ray.stages.extract import pages_to_edges

    edges = pages_to_edges(ray.data.read_parquet(small_corpus))
    t = wcc_dataset(edges)
    res = engine_und.run(WCCKernel())
    vids, lab = _vals(res, "wcc")
    assert np.array_equal(t["vid"].to_numpy(), vids)
    assert np.array_equal(t["component"].to_numpy(), lab)


def test_pull_pagerank_matches_push_engine(tmp_path):
    """Push (src-partitioned scatter-combine) and pull (dst-partitioned
    CSC gather with static value routing) formulations agree allclose
    1e-6 — the reference's push-vs-pull methodology
    (pagerank_simple.c:30-84)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import PageRankKernel
    from everythinggraph_ray.graph.pull import pagerank_pull

    rng = np.random.default_rng(5)
    n = 30000
    src = rng.integers(0, 800, n)
    dst = rng.integers(0, 800, n)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )

    push_dir = str(tmp_path / "push")
    build_graph(edges, push_dir, num_partitions=4, hub_threshold=10**9)
    eng = GraphEngine(push_dir)
    try:
        push = (
            eng.run(PageRankKernel(), tol=1e-6)["dataset"]
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
    finally:
        eng.shutdown()

    pull_dir = str(tmp_path / "pull")
    build_graph(
        edges, pull_dir, num_partitions=4, hub_threshold=10**9, partition_edges_by="dst"
    )
    pull = (
        pagerank_pull(pull_dir, tol=1e-6)["dataset"]
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    assert np.array_equal(push["vid"].to_numpy(), pull["vid"].to_numpy())
    assert np.allclose(push["pagerank"].to_numpy(), pull["pagerank"].to_numpy(), atol=1e-6)
    # and with a fixed schedule the two are near-bit-identical (same float64
    # rule, different association only)
    eng = GraphEngine(push_dir)
    try:
        p10 = (
            eng.run(PageRankKernel(), n_iters=10)["dataset"]
            .to_pandas()
            .sort_values("vid")["pagerank"]
            .to_numpy()
        )
    finally:
        eng.shutdown()
    q10 = (
        pagerank_pull(pull_dir, n_iters=10)["dataset"]
        .to_pandas()
        .sort_values("vid")["pagerank"]
        .to_numpy()
    )
    assert np.allclose(p10, q10, atol=1e-12)


def test_parent_sssp_and_validator(tmp_path):
    """Parent-tracking SSSP: dists equal plain hop-SSSP, the parent tree
    passes the distributed structural validator, and a corrupted parent
    is caught."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import (
        ParentSSSPHopsKernel,
        SSSPHopsKernel,
        UNREACHED,
    )
    from everythinggraph_ray.graph.validate import validate_parents

    rng = np.random.default_rng(11)
    n = 20000
    src = rng.integers(0, 600, n)
    dst = rng.integers(0, 600, n)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    bdir = str(tmp_path / "g")
    build_graph(edges, bdir, num_partitions=4, hub_threshold=10**9)
    root = int(min(src.min(), dst.min()))

    eng = GraphEngine(bdir)
    try:
        plain = (
            eng.run(SSSPHopsKernel(root))["dataset"].to_pandas().sort_values("vid")
        )
    finally:
        eng.shutdown()
    eng = GraphEngine(bdir)
    try:
        packed = (
            eng.run(ParentSSSPHopsKernel(root))["dataset"].to_pandas().sort_values("vid")
        )
    finally:
        eng.shutdown()

    dist, parent = ParentSSSPHopsKernel.decode(packed["sssp_parent"].to_numpy())
    assert np.array_equal(dist, plain["sssp_hops"].to_numpy())

    res = pd.DataFrame({"vid": packed["vid"].to_numpy(), "dist": dist, "parent": parent})
    ok = validate_parents(ray.data.from_pandas(res), edges, root)
    assert ok["dist_violations"] == 0 and ok["edge_violations"] == 0
    assert ok["n_claims"] == int(((dist != UNREACHED) & (res["vid"] != root)).sum())

    # corrupt one reached vertex's parent → both checks must trip
    bad = res.copy()
    i = bad.index[(bad["dist"] == 2)][0]
    bad.loc[i, "parent"] = int(bad.loc[i, "vid"])  # self-parent: wrong dist + no edge
    notok = validate_parents(ray.data.from_pandas(bad), edges, root)
    assert notok["dist_violations"] >= 1 or notok["edge_violations"] >= 1


def test_frontier_pull_matches_push_all_modes(tmp_path):
    """Pull BFS / SSSP-hops / SSSP-weighted over the dst-partitioned build
    equal the push engine in FORCED sparse, forced dense and adaptive
    modes — the reference's push<->pull cross-variant methodology
    (bfs_simple.c:104-229, sssp_pushpull.c:69-98)."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import (
        BFSKernel,
        SSSPHopsKernel,
        SSSPWeightedKernel,
    )
    from everythinggraph_ray.graph.pull import frontier_pull
    from everythinggraph_ray.stages.edges import synthesize_weights

    rng = np.random.default_rng(11)
    src = np.r_[rng.integers(0, 300, 6000), [400]]
    dst = np.r_[rng.integers(0, 300, 6000), [401]]  # unreached tail
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    root = 0
    push_dir = str(tmp_path / "push")
    pull_dir = str(tmp_path / "pull")
    pushw_dir = str(tmp_path / "pushw")
    pullw_dir = str(tmp_path / "pullw")
    build_graph(edges, push_dir, num_partitions=3, hub_threshold=10**9)
    build_graph(edges, pull_dir, num_partitions=3, hub_threshold=10**9, partition_edges_by="dst")
    build_graph(synthesize_weights(edges), pushw_dir, num_partitions=3, hub_threshold=10**9, weighted=True)
    build_graph(
        synthesize_weights(edges), pullw_dir, num_partitions=3, hub_threshold=10**9,
        partition_edges_by="dst", weighted=True,
    )

    eng = GraphEngine(push_dir)
    try:
        bfs = eng.run(BFSKernel(root))["dataset"].to_pandas().sort_values("vid")
        hops = eng.run(SSSPHopsKernel(root))["dataset"].to_pandas().sort_values("vid")
    finally:
        eng.shutdown()
    engw = GraphEngine(pushw_dir)
    try:
        wtd = engw.run(SSSPWeightedKernel(root))["dataset"].to_pandas().sort_values("vid")
    finally:
        engw.shutdown()

    for mode in (None, "sparse", "dense"):
        g = frontier_pull(pull_dir, root, kind="bfs", force_mode=mode)["dataset"].to_pandas().sort_values("vid")
        assert np.array_equal(g["bfs"].to_numpy(), bfs["bfs"].to_numpy())
        g = frontier_pull(pull_dir, root, kind="sssp_hops", force_mode=mode)["dataset"].to_pandas().sort_values("vid")
        assert np.array_equal(g["sssp_hops"].to_numpy(), hops["sssp_hops"].to_numpy())
        g = frontier_pull(pullw_dir, root, kind="sssp_weighted", force_mode=mode)["dataset"].to_pandas().sort_values("vid")
        a, b = g["sssp_weighted"].to_numpy(), wtd["sssp_weighted"].to_numpy()
        fin = np.isfinite(a)
        assert np.array_equal(fin, np.isfinite(b)) and np.allclose(a[fin], b[fin])

    # the adaptive run must actually exercise BOTH directions on this graph
    res = frontier_pull(pull_dir, root, kind="sssp_hops")
    assert "sparse" in res["modes"] and "dense" in res["modes"]


def test_validate_components_distributed(tmp_path):
    """The distributed WCC validator (wcc.c:138-182 analogue): a correct
    labeling validates clean; corrupting one vertex's label is caught."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import WCCKernel
    from everythinggraph_ray.graph.validate import validate_components
    from everythinggraph_ray.stages.edges import undirect_edges

    rng = np.random.default_rng(31)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(rng.integers(0, 200, 3000), pa.int64()),
                "dst": pa.array(rng.integers(0, 200, 3000), pa.int64()),
            }
        )
    )
    und = undirect_edges(edges)
    bdir = str(tmp_path / "b")
    build_graph(und, bdir, num_partitions=3, hub_threshold=10**9)
    eng = GraphEngine(bdir)
    try:
        labels = eng.run(WCCKernel())["dataset"].map_batches(
            lambda t: pa.table({"vid": t["vid"], "component": t["wcc"]}),
            batch_format="pyarrow",
        ).materialize()
    finally:
        eng.shutdown()

    ok = validate_components(labels, und)
    assert ok["violations"] == 0 and ok["n_edges"] == und.count()

    # corrupt one connected vertex's label -> every incident edge flags
    df = labels.to_pandas()
    victim = int(edges.take(1)[0]["src"])
    df.loc[df["vid"] == victim, "component"] = -99
    bad = validate_components(ray.data.from_pandas(df), und)
    assert bad["violations"] > 0


def test_anf_lane_math_pure_numpy():
    """No-Ray checks of the ANF sketch math: seed masks land exactly one
    bit per lane, sum_lsb0 agrees with a per-row Python reference for
    both lane widths, and the wide config's estimator is sane."""
    from everythinggraph_ray.graph.kernels import ANFKernel

    def lsb0_ref(x: int, bits: int) -> int:
        for p in range(bits):
            if not (x >> p) & 1:
                return p
        return bits

    rng = np.random.default_rng(41)
    vids = rng.integers(0, 1 << 40, 500).astype(np.int64)
    for k_trials, bits in ((4, 16), (2, 32)):
        k = ANFKernel(k_trials, bits)
        seeds = k._seed_masks(vids)
        for m in seeds.tolist():
            u = m & 0xFFFFFFFFFFFFFFFF
            for t in range(k_trials):
                lane = (u >> (t * bits)) & ((1 << bits) - 1)
                assert lane != 0 and lane & (lane - 1) == 0  # exactly one bit
        masks = rng.integers(0, 1 << 62, 300).astype(np.int64)
        got = k.sum_lsb0(masks)
        want = [
            sum(
                lsb0_ref(((m & 0xFFFFFFFFFFFFFFFF) >> (t * bits)) & ((1 << bits) - 1), bits)
                for t in range(k_trials)
            )
            for m in masks.tolist()
        ]
        assert got.tolist() == want
    with np.testing.assert_raises(ValueError):
        ANFKernel(3, 16)


def test_pagerank_dangling_matches_textbook_oracle(engine, small_edges):
    """Dangling-mass PageRank (the engine's Pregel-style aggregator
    channel): matches the serial textbook oracle and conserves rank mass
    (Σ rank = 1) — the property the reference variant drops."""
    from everythinggraph_ray.graph.kernels import DanglingPageRankKernel

    sv, dv = small_edges
    res = engine.run(DanglingPageRankKernel(), tol=1e-6)
    vids, pr = _vals(res, "pagerank_dangling")
    ovids, opr, oiters = O.pagerank_dangling_oracle(sv, dv, tol=1e-6)
    assert np.array_equal(vids, ovids)
    np.testing.assert_allclose(pr, opr, rtol=0, atol=1e-6)
    assert res["iterations"] == oiters
    np.testing.assert_allclose(pr.sum(), 1.0, rtol=0, atol=1e-9)


def test_pagerank_dangling_fixed10_exact(engine, small_edges):
    from everythinggraph_ray.graph.kernels import DanglingPageRankKernel

    sv, dv = small_edges
    res = engine.run(DanglingPageRankKernel(), n_iters=10)
    _, pr = _vals(res, "pagerank_dangling")
    _, opr, _ = O.pagerank_dangling_oracle(sv, dv, n_iters=10)
    np.testing.assert_allclose(pr, opr, rtol=0, atol=1e-12)


def test_hitting_time_matches_serial_dp(tmp_path):
    """Truncated hitting time (HittingTimeKernel over the reversed
    weighted build) equals the serial DP h_{t}(v) = min(T, 1 + mean over
    out-edge rows of h_{t-1}(dst)), seeds pinned 0, no-out-edge vertices
    pinned T — including a hub-split build (the sum-combine must stay
    correct under mirror splitting)."""
    import pyarrow as pa

    import ray.data
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import HittingTimeKernel

    rng = np.random.default_rng(7)
    n, m, T, mod = 60, 400, 6, 9
    sv = rng.integers(0, n, m).astype(np.int64)
    dv = rng.integers(0, n, m).astype(np.int64)
    # one vertex with NO out-edges and one hub src (exceeds hub_threshold)
    sv = sv[sv != 3]
    dv = dv[: len(sv)]
    hub_dst = rng.integers(0, n, 40).astype(np.int64)
    sv = np.concatenate([sv, np.full(40, 5, np.int64)])
    dv = np.concatenate([dv, hub_dst])

    # serial DP over the ORIGINAL orientation
    verts = np.unique(np.concatenate([sv, dv]))
    outdeg = {int(v): 0 for v in verts}
    adj: dict[int, list[int]] = {int(v): [] for v in verts}
    for a, b in zip(sv.tolist(), dv.tolist()):
        outdeg[a] += 1
        adj[a].append(b)
    h = {int(v): (0.0 if v % mod == 0 else float(T)) for v in verts}
    for _ in range(T):
        nh = {}
        for v in verts:
            v = int(v)
            if v % mod == 0:
                nh[v] = 0.0
            elif outdeg[v] == 0:
                nh[v] = float(T)
            else:
                nh[v] = min(float(T), 1.0 + sum(h[u] for u in adj[v]) / outdeg[v])
        h = nh

    # reversed weighted edge table, built with a LOW hub threshold so the
    # hub src's reversed in-edges exercise mirror splitting
    w = np.array([1.0 / outdeg[a] for a in sv.tolist()])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(dv, pa.int64()),
                "dst": pa.array(sv, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )
    for thr in (10**9, 15):
        bdir = str(tmp_path / f"hit_build_{thr}")
        build_graph(ds, bdir, num_partitions=4, weighted=True, hub_threshold=thr)
        eng = GraphEngine(bdir)
        try:
            res = eng.run(HittingTimeKernel(seed_mod=mod, horizon=T), n_iters=T)
            vids, hv = _vals(res, "hitting")
        finally:
            eng.shutdown()
        want = np.array([h[int(v)] for v in vids.tolist()])
        np.testing.assert_allclose(hv, want, rtol=0, atol=1e-12)


def test_earliest_arrival_respects_time_ordering(tmp_path):
    """Earliest-arrival kernel on a hand-built temporal graph: a path
    with decreasing timestamps must NOT be usable, later edges relax
    arrivals, and the serial label-correcting oracle agrees on a random
    temporal graph."""
    import pyarrow as pa

    import ray.data
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import EarliestArrivalKernel

    def run(sv, dv, tv, root=0, parts=4):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(sv, pa.int64()),
                    "dst": pa.array(dv, pa.int64()),
                    "weight": pa.array(np.asarray(tv, np.float64), pa.float64()),
                }
            )
        )
        bdir = str(tmp_path / f"t_{len(sv)}_{parts}")
        build_graph(ds, bdir, num_partitions=parts, weighted=True, hub_threshold=10**9)
        eng = GraphEngine(bdir)
        try:
            res = eng.run(EarliestArrivalKernel(root=root, start=0.0))
            vids, arr = _vals(res, "arrival")
        finally:
            eng.shutdown()
        return dict(zip(vids.tolist(), arr.tolist()))

    # 0 -(t5)-> 1 -(t3)-> 2 : the 1->2 edge departs BEFORE 1 is reached,
    # so 2 is temporally unreachable; 1 -(t7)-> 3 is fine.
    got = run([0, 1, 1], [1, 2, 3], [5, 3, 7])
    assert got[0] == 0.0 and got[1] == 5.0 and got[3] == 7.0
    assert not np.isfinite(got[2])

    # random temporal graph vs serial label-correcting fixpoint
    rng = np.random.default_rng(11)
    n, m = 40, 300
    sv = rng.integers(0, n, m).astype(np.int64)
    dv = rng.integers(0, n, m).astype(np.int64)
    tv = rng.integers(1, 50, m).astype(np.int64)
    arr = {v: np.inf for v in range(n)}
    arr[0] = 0.0
    for _ in range(n):
        changed = False
        for a, b, t in zip(sv.tolist(), dv.tolist(), tv.tolist()):
            if t >= arr[a] and t < arr[b]:
                arr[b] = float(t)
                changed = True
        if not changed:
            break
    got = run(sv, dv, tv)
    for v, a in got.items():
        assert (np.isinf(a) and np.isinf(arr[v])) or a == arr[v], v


def test_latest_departure_respects_time_ordering(tmp_path):
    """Latest-departure kernel (time-reversed dual): edges that depart
    AFTER the downstream departure budget must not be usable, and the
    serial label-correcting fixpoint agrees on a random temporal
    graph."""
    import pyarrow as pa

    import ray.data
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import LatestDepartureKernel

    def run(sv, dv, tv, target=0, parts=4):
        # REVERSED build: original edge (s, d, t) becomes (d, s, t)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(dv, pa.int64()),
                    "dst": pa.array(sv, pa.int64()),
                    "weight": pa.array(np.asarray(tv, np.float64), pa.float64()),
                }
            )
        )
        bdir = str(tmp_path / f"ld_{len(sv)}_{parts}")
        build_graph(ds, bdir, num_partitions=parts, weighted=True, hub_threshold=10**9)
        eng = GraphEngine(bdir)
        try:
            res = eng.run(LatestDepartureKernel(target=target))
            vids, dep = _vals(res, "departure")
        finally:
            eng.shutdown()
        return dict(zip(vids.tolist(), dep.tolist()))

    # 2 -(t3)-> 1 -(t5)-> 0 : leave 2 at 3, then 1 at 5 — fine (dep(2)=3);
    # 3 -(t9)-> 1 : departs after 1's budget (5) — unusable, 3 unreachable.
    got = run([2, 1, 3], [1, 0, 1], [3, 5, 9])
    assert got[1] == 5.0 and got[2] == 3.0
    assert got[3] == -np.inf

    # random temporal graph vs serial fixpoint
    rng = np.random.default_rng(12)
    n, m = 40, 300
    sv = rng.integers(0, n, m).astype(np.int64)
    dv = rng.integers(0, n, m).astype(np.int64)
    tv = rng.integers(1, 50, m).astype(np.int64)
    CAP = 1e18
    dep = {v: -np.inf for v in range(n)}
    dep[0] = CAP
    for _ in range(n):
        changed = False
        for a, b, t in zip(sv.tolist(), dv.tolist(), tv.tolist()):
            if t <= dep[b] and t > dep[a]:
                dep[a] = float(t)
                changed = True
        if not changed:
            break
    got = run(sv, dv, tv)
    for v, d in got.items():
        assert d == dep[v], v


def test_threshold_cascade_kernel_matches_serial(tmp_path):
    """ThresholdCascadeKernel over the engine == a serial synchronous
    bootstrap-percolation replay on a random distinct digraph: same
    activation rounds per vertex, same per-round active counts, and
    early frontier exhaustion reconstructs the constant tail."""
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import ThresholdCascadeKernel

    rng = np.random.default_rng(23)
    src = rng.integers(0, 120, 900)
    dst = rng.integers(0, 120, 900)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]

    SEED_MAX, TH, R = 6, 2, 8
    # serial synchronous replay
    univ = np.unique(np.concatenate([src, dst]))
    active = set(int(v) for v in univ if v < SEED_MAX)
    act_round = {v: 0 for v in active}
    counts = [len(active)]
    for r in range(1, R + 1):
        cnt: dict[int, int] = {}
        for s, d in zip(src, dst):
            if int(s) in active and int(d) not in active:
                cnt[int(d)] = cnt.get(int(d), 0) + 1
        newly = {v for v, c in cnt.items() if c >= TH}
        for v in newly:
            act_round[v] = r
        active |= newly
        counts.append(len(active))

    bdir = str(tmp_path / "cascade_build")
    build_graph(
        ray.data.from_arrow(
            pa.table(
                {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
            )
        ),
        bdir,
        num_partitions=4,
        hub_threshold=10**9,
    )
    eng = GraphEngine(bdir)
    try:
        res = eng.run(ThresholdCascadeKernel(SEED_MAX, threshold=TH, rounds=R))
        vals = res["dataset"].to_pandas()
    finally:
        eng.shutdown()
    got = ThresholdCascadeKernel.activation_rounds(
        vals["cascade"].to_numpy(np.int64)
    )
    got_map = {
        int(v): int(r) for v, r in zip(vals["vid"], got) if r >= 0
    }
    assert got_map == act_round
    got_counts = [
        sum(1 for r in got_map.values() if r <= k) for k in range(R + 1)
    ]
    assert got_counts == counts
