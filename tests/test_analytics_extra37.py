"""Session-12 twenty-first wave (BFS profile / PageRank curve):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra37 import (
    q_rel_bfs_profile,
    q_rel_pagerank_curve,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_bfs_profile_matches_serial_levels(tmp_path):
    # chain 0->1->2->3 plus a side branch 1->4 and an unreachable 8->9
    edges = np.array(
        [(0, 1), (1, 2), (2, 3), (1, 4), (8, 9)], np.int64
    )
    pd.DataFrame({"l_orderkey": edges[:, 0], "l_partkey": edges[:, 1]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got = (
        _to_df(q_rel_bfs_profile(str(tmp_path)))
        .set_index("dist")["n_vertices"]
        .to_dict()
    )
    # reference level semantics: root dist 1, children 2, ...; 0 = unreached
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 0: 2}


def test_pagerank_curve_converges_and_final_ranks_match_oracle(tmp_path):
    rng = np.random.default_rng(241)
    src = rng.integers(0, 80, 1200)
    dst = rng.integers(0, 80, 1200)
    pd.DataFrame({"l_orderkey": src, "l_partkey": dst}).to_parquet(
        tmp_path / "lineitem.parquet"
    )

    curve = _to_df(q_rel_pagerank_curve(str(tmp_path)))
    assert len(curve) > 5
    assert list(curve["iteration"]) == list(range(1, len(curve) + 1))
    # tail below tolerance (1e-6 * 1e12 = 1e6)
    assert curve["max_delta_e12"].iloc[-1] < 1_000_000
    # eventually decreasing: last value is the minimum, and the curve
    # drops by orders of magnitude overall
    assert curve["max_delta_e12"].iloc[-1] == curve["max_delta_e12"].min()
    assert curve["max_delta_e12"].iloc[0] > 100 * curve["max_delta_e12"].iloc[-1]

    # final ranks equal the serial oracle (reference semantics)
    from everythinggraph_ray.graph.kernels import PageRankKernel
    from everythinggraph_ray.graph.oracle import pagerank_oracle
    from everythinggraph_ray.pipelines.queries import _rel_build, _run_engine

    df = _run_engine(_rel_build(str(tmp_path)), PageRankKernel(), tol=1e-6)
    ovids, oranks, _ = pagerank_oracle(src % 1000, dst % 1000, tol=1e-6)
    ref = dict(zip(ovids.tolist(), oranks.tolist()))
    vids = df["vid"].to_numpy(np.int64)
    got_r = df["pagerank"].to_numpy(np.float64)
    ref_r = np.array([ref[int(v)] for v in vids])
    assert np.allclose(got_r, ref_r, atol=1e-6)
