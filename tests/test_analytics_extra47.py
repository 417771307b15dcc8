"""Session-12 thirty-first wave (edge-disjoint path packing):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra47 import (
    PACK_ROUNDS,
    q_rel_path_packing,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_path_packing_on_parallel_chains(tmp_path):
    # s = 0; three edge-disjoint chains to 9 of lengths 2, 3, 4:
    #   0 -> 1 -> 9          (2 hops)
    #   0 -> 2 -> 3 -> 9     (3 hops)
    #   0 -> 4 -> 5 -> 6 -> 9 (4 hops)
    # farthest reachable in round 1 is the deepest chain's interior?
    # distances: 9 is at dist 2; deepest vertex is 6 at dist 3 -> the
    # packing target is 6... make 9 the unique farthest instead by
    # lengthening the tail: add 9 -> 12 chains? Simplest: target the
    # vertex the rule picks and assert against a serial replay.
    edges = np.array(
        [
            (0, 1), (1, 9),
            (0, 2), (2, 3), (3, 9),
            (0, 4), (4, 5), (5, 6), (6, 9),
        ],
        np.int64,
    )
    pd.DataFrame({"l_orderkey": edges[:, 0], "l_partkey": edges[:, 1]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got = _to_df(q_rel_path_packing(str(tmp_path)))

    # serial replay of the same greedy rule
    def sssp_parent(edge_set, s):
        from collections import deque

        adj: dict[int, list[int]] = {}
        for a, b in sorted(edge_set):
            adj.setdefault(a, []).append(b)
        dist = {s: 0}
        parent = {s: s}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in sorted(adj.get(u, [])):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    parent[w] = u
                    q.append(w)
                elif dist[w] == dist[u] + 1:
                    parent[w] = min(parent[w], u)
        return dist, parent

    E = {tuple(map(int, e)) for e in edges}
    s = 0
    dist, parent = sssp_parent(E, s)
    # farthest reachable, tie to larger vid
    t = max((d, v) for v, d in dist.items() if v != s)[1]
    ref = []
    for pn in range(1, PACK_ROUNDS + 1):
        dist, parent = sssp_parent(E, s)
        if t not in dist:
            break
        path = [t]
        while path[-1] != s:
            path.append(parent[path[-1]])
        path.reverse()
        pe = set(zip(path[:-1], path[1:]))
        E -= pe
        ref.append((pn, len(pe), len(pe)))
    refdf = pd.DataFrame(ref, columns=["path_no", "hops", "edges_removed"]).astype(
        "int64"
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), refdf)
    assert len(got) >= 1
    # packed paths were edge-disjoint by construction: total edges
    # removed never exceeds the original edge count
    assert got["edges_removed"].sum() <= len(edges)
