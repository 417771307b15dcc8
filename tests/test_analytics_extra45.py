"""Session-12 twenty-ninth wave (greedy k-center): serial-replay
exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra45 import (
    KCENTER_K,
    q_rel_kcenter4,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _serial_kcenter(edges, k):
    """Gonzalez replay on the undirected simple graph (hop metric)."""
    adj: dict[int, set[int]] = {}
    verts = set()
    for a, b in edges:
        verts |= {a, b}
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    INF = float("inf")

    def multi_bfs(seeds):
        dist = {v: INF for v in verts}
        frontier = [s for s in seeds if s in verts]
        for s in frontier:
            dist[s] = 0
        d = 0
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if dist[w] == INF:
                        dist[w] = d + 1
                        nxt.append(w)
            frontier = nxt
            d += 1
        return dist

    centers = [min(verts)]
    rows = []
    for rnd in range(1, k + 1):
        dist = multi_bfs(centers)
        radius = -1 if any(v == INF for v in dist.values()) else int(max(dist.values()))
        rows.append((rnd, centers[-1], radius))
        if rnd < k:
            far = sorted(
                verts, key=lambda v: (-(1 if dist[v] == INF else 0),
                                      -(dist[v] if dist[v] != INF else 0), v)
            )[0]
            # unreached first, then farthest, then smallest vid
            far = min(
                verts,
                key=lambda v: (
                    0 if dist[v] == INF else 1,
                    -(dist[v] if dist[v] != INF else 0),
                    v,
                ),
            )
            centers.append(far)
    return rows


def test_kcenter_matches_serial_with_islands(tmp_path):
    # two islands: a path 0-1-2-3-4 and a triangle 10-11-12 — the
    # second pick MUST jump to the unreachable island
    edges = np.array(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)], np.int64
    )
    pd.DataFrame({"l_orderkey": edges[:, 0], "l_partkey": edges[:, 1]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got = _to_df(q_rel_kcenter4(str(tmp_path)))
    ref = pd.DataFrame(
        _serial_kcenter([tuple(map(int, e)) for e in edges], KCENTER_K),
        columns=["rnd", "center_vid", "radius_hops"],
    ).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    # island structure: round 1 radius -1 (triangle unreachable),
    # round 2 picks a triangle vertex, radius becomes finite
    assert got.iloc[0]["radius_hops"] == -1
    assert got.iloc[1]["center_vid"] in (10, 11, 12)
    assert got.iloc[1]["radius_hops"] >= 0
    # radii never increase once finite
    fin = got[got["radius_hops"] >= 0]["radius_hops"]
    assert (fin.diff().dropna() <= 0).all()
