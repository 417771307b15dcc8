"""Property-style tests: random graphs, engine vs serial oracles.

Mirrors the reference's cross-variant methodology (SURVEY.md §5) with
randomized structure: for several seeded random power-law graphs —
including ones with self-loops, duplicate edges, dangling vertices and
forced hub splitting — the distributed engine must equal the serial
oracle on every kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from everythinggraph_ray.graph import oracle as O
from everythinggraph_ray.graph.build import build_graph
from everythinggraph_ray.graph.engine import GraphEngine
from everythinggraph_ray.graph.kernels import (
    BFSKernel,
    PageRankKernel,
    SSSPHopsKernel,
    WCCKernel,
)
from everythinggraph_ray.stages.edges import undirect_edges


def _rand_graph(seed: int, n_v: int = 300, n_e: int = 1500):
    rng = np.random.default_rng(seed)
    src = (n_v * rng.random(n_e) ** 2.0).astype(np.int64)
    dst = (n_v * rng.random(n_e) ** 1.3).astype(np.int64)
    # sprinkle self-loops and duplicates
    src[:20] = dst[:20]
    src[20:40] = src[0]
    dst[20:40] = dst[0]
    return src, dst


def _ds(sv, dv):
    return ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    )


@pytest.mark.parametrize("seed", [11, 23])
def test_random_graph_all_kernels(seed, tmp_path):
    sv, dv = _rand_graph(seed)
    bdir = str(tmp_path / f"g{seed}")
    # low hub threshold → forced hub splitting on a random graph
    build_graph(_ds(sv, dv), bdir, num_partitions=5, hub_threshold=10)
    eng = GraphEngine(bdir)
    try:
        res = eng.run(PageRankKernel(), tol=1e-6)
        df = res["dataset"].to_pandas().sort_values("vid")
        ovids, opr, oiters = O.pagerank_oracle(sv, dv)
        assert np.array_equal(df["vid"].to_numpy(), ovids)
        np.testing.assert_allclose(df["pagerank"].to_numpy(), opr, rtol=0, atol=1e-6)
        assert res["iterations"] == oiters

        root = int(ovids[seed % len(ovids)])
        res_b = eng.run(BFSKernel(root))
        db = res_b["dataset"].to_pandas().sort_values("vid")["bfs"].to_numpy()
        _, ob = O.bfs_oracle(sv, dv, root)
        assert np.array_equal(db, ob)

        res_s = eng.run(SSSPHopsKernel(root))
        ds_ = res_s["dataset"].to_pandas().sort_values("vid")["sssp_hops"].to_numpy()
        _, os_ = O.sssp_hops_oracle(sv, dv, root)
        assert np.array_equal(ds_, os_)
    finally:
        eng.shutdown()

    bdir_u = str(tmp_path / f"gu{seed}")
    build_graph(undirect_edges(_ds(sv, dv)), bdir_u, num_partitions=5, hub_threshold=10)
    eng2 = GraphEngine(bdir_u)
    try:
        res_w = eng2.run(WCCKernel())
        lw = res_w["dataset"].to_pandas().sort_values("vid")["wcc"].to_numpy()
        _, ow = O.wcc_oracle(sv, dv)
        assert np.array_equal(lw, ow)
    finally:
        eng2.shutdown()


def test_cli_smoke(tmp_path):
    import json

    from everythinggraph_ray.cli import main
    from everythinggraph_ray.sources.binary_edges import write_binary_edges

    sv, dv = _rand_graph(7, n_v=100, n_e=400)
    f = str(tmp_path / "e.bin")
    write_binary_edges(_ds(sv, dv), f)
    out = str(tmp_path / "out")
    rc = main(
        ["pagerank", "--edges-bin", f, "--out", out, "--partitions", "3", "--n-iters", "5"]
    )
    assert rc == 0
    m = json.load(open(f"{out}/metrics.json"))
    assert m["iterations"] == 5
    back = ray.data.read_parquet(f"{out}/data").to_pandas().sort_values("vid")
    _, opr, _ = O.pagerank_oracle(sv, dv, n_iters=5)
    np.testing.assert_allclose(back["pagerank"].to_numpy(), opr, atol=1e-12)


def test_cli_widest_smoke(tmp_path):
    from everythinggraph_ray.cli import main
    from everythinggraph_ray.sources.binary_edges import write_binary_edges

    sv, dv = _rand_graph(13, n_v=100, n_e=400)
    f = str(tmp_path / "e.bin")
    write_binary_edges(_ds(sv, dv), f)
    out = str(tmp_path / "out")
    # widest auto-synthesizes weights when the input carries none
    rc = main(["widest", "--edges-bin", f, "--out", out, "--partitions", "3", "--root", str(int(sv.min()))])
    assert rc == 0
    back = ray.data.read_parquet(f"{out}/data").to_pandas().sort_values("vid")
    _, ocap = O.widest_path_oracle(sv, dv, int(sv.min()))
    assert np.array_equal(back["widest_path"].to_numpy(), ocap)


def test_cli_ppr_smoke(tmp_path):
    import json

    from everythinggraph_ray.cli import main
    from everythinggraph_ray.sources.binary_edges import write_binary_edges

    sv, dv = _rand_graph(11, n_v=100, n_e=400)
    f = str(tmp_path / "e.bin")
    write_binary_edges(_ds(sv, dv), f)
    out = str(tmp_path / "out")
    rc = main(
        [
            "ppr", "--edges-bin", f, "--out", out, "--partitions", "3",
            "--n-iters", "10", "--ppr-seed-mod", "7",
        ]
    )
    assert rc == 0
    m = json.load(open(f"{out}/metrics.json"))
    assert m["iterations"] == 10
    back = ray.data.read_parquet(f"{out}/data").to_pandas().sort_values("vid")
    _, opr = O.ppr_oracle(sv, dv, 7, n_iters=10)
    np.testing.assert_allclose(back["ppr"].to_numpy(), opr, atol=1e-12)


def test_cli_temporal_smoke(tmp_path):
    """Both temporal kernels ride the CLI; latest-departure's reversed
    build agrees with the serial fixpoint."""
    import pyarrow.parquet as pq

    from everythinggraph_ray.cli import main

    rng = np.random.default_rng(19)
    n, m = 30, 150
    sv = rng.integers(0, n, m).astype(np.int64)
    dv = rng.integers(0, n, m).astype(np.int64)
    tv = rng.integers(1, 40, m).astype(np.float64)
    f = str(tmp_path / "e.parquet")
    pq.write_table(
        pa.table(
            {"src": pa.array(sv), "dst": pa.array(dv), "weight": pa.array(tv)}
        ),
        f,
    )
    out = str(tmp_path / "ld")
    rc = main(
        ["latest-departure", "--edges", f, "--out", out,
         "--weighted", "--partitions", "3", "--root", "0"]
    )
    assert rc == 0
    back = ray.data.read_parquet(f"{out}/data").to_pandas().sort_values("vid")
    CAP = 1e18
    dep = {v: -np.inf for v in range(n)}
    dep[0] = CAP
    for _ in range(n):
        ch = False
        for a, b, t in zip(sv.tolist(), dv.tolist(), tv.tolist()):
            if t <= dep[b] and t > dep[a]:
                dep[a] = float(t)
                ch = True
        if not ch:
            break
    for v, d in zip(back["vid"], back["departure"]):
        assert d == dep[int(v)], v
