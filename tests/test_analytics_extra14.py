"""Session-11 second wave (sigma path counts / percolation / trimmed
mean): serial-replay exactness on synthetic fixtures."""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra14 import (
    PERC_THRESHOLDS,
    q_lineitem_trimmed_mean,
    q_rel_percolation,
    q_rel_sp_counts,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _serial_sigma(edges: set, verts: list, root: int):
    """Layered BFS with path counting over a simple digraph."""
    adj = defaultdict(list)
    for u, w in edges:
        if u != w:
            adj[u].append(w)
    dist = {v: 0 for v in verts}
    nsp = {v: 0 for v in verts}
    dist[root], nsp[root] = 1, 1
    q = deque([root])
    order = []
    while q:
        u = q.popleft()
        order.append(u)
        for w in adj[u]:
            if dist[w] == 0:
                dist[w] = dist[u] + 1
                q.append(w)
            if dist[w] == dist[u] + 1:
                nsp[w] += nsp[u]
    return dist, nsp


def test_sp_counts_match_serial_with_diamond(tmp_path):
    rng = np.random.default_rng(41)
    n = 1500
    ok = rng.integers(0, 150, n).astype(np.int64)
    pk = rng.integers(0, 90, n).astype(np.int64)
    # plant a known diamond root->a->d, root->b->d plus a duplicate edge
    # (dedup must collapse it or sigma double-counts)
    extra_o = np.array([0, 0, 701, 702, 0], np.int64)  # 0 is min vid = root
    extra_p = np.array([701, 702, 703, 703, 701], np.int64)
    li = pd.DataFrame(
        {
            "l_orderkey": np.r_[ok, extra_o],
            "l_partkey": np.r_[pk, extra_p],
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = (
        _to_df(q_rel_sp_counts(str(tmp_path)))
        .sort_values("vid")
        .reset_index(drop=True)
    )

    src = (li["l_orderkey"] % 1000).to_numpy(np.int64)
    dst = (li["l_partkey"] % 1000).to_numpy(np.int64)
    verts = sorted(set(src) | set(dst))
    edges = set(zip(src.tolist(), dst.tolist()))
    dist, nsp = _serial_sigma(edges, verts, min(verts))
    ref = (
        pd.DataFrame(
            {"vid": verts, "dist": [dist[v] for v in verts], "nsp": [nsp[v] for v in verts]}
        )
        .astype("int64")
        .sort_values("vid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)
    g = got.set_index("vid")
    # the planted diamond: two shortest paths reach 703 (duplicate edge
    # 0->701 collapsed by dedup, so 701 still holds nsp == 1)
    assert int(g.loc[701, "nsp"]) == 1
    assert int(g.loc[703, "nsp"]) == 2
    assert (got["nsp"] > 1).sum() > 2  # multiplicity exercised beyond the plant


def test_percolation_matches_serial(tmp_path):
    rng = np.random.default_rng(42)
    n = 900
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 90, n).astype(np.int64),
            "l_partkey": rng.integers(0, 70, n).astype(np.int64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = (
        _to_df(q_rel_percolation(str(tmp_path)))
        .sort_values("threshold")
        .reset_index(drop=True)
    )

    src = (li["l_orderkey"] % 1000).to_numpy(np.int64)
    dst = (li["l_partkey"] % 1000).to_numpy(np.int64)
    verts = sorted(set(src) | set(dst))
    rows = []
    for t in PERC_THRESHOLDS:
        parent = {v: v for v in verts}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, w in zip(src, dst):
            if u != w and (u % 10 + w % 10) >= t:
                ru, rw = find(u), find(w)
                if ru != rw:
                    parent[ru] = rw
        sizes = defaultdict(int)
        for v in verts:
            sizes[find(v)] += 1
        rows.append((t, len(sizes), max(sizes.values())))
    ref = pd.DataFrame(rows, columns=["threshold", "n_components", "max_size"]).astype(
        "int64"
    )
    pd.testing.assert_frame_equal(got, ref)
    # percolation monotonicity: raising the threshold never merges
    assert got["n_components"].is_monotonic_increasing
    assert got["max_size"].is_monotonic_decreasing
    # singleton path exercised: some vertex lost all its edges at t=13
    assert int(got.iloc[-1]["n_components"]) > int(got.iloc[0]["n_components"])


def test_trimmed_mean_matches_serial(tmp_path):
    rng = np.random.default_rng(43)
    n = 4000
    li = pd.DataFrame(
        {
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_quantity": rng.integers(1, 50, n).astype(float),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_lineitem_trimmed_mean(str(tmp_path)))

    rows = []
    for f, g in li.groupby("l_returnflag"):
        q = np.sort(np.floor(g["l_quantity"].to_numpy() + 0.5).astype(np.int64))
        k = len(q) // 10
        mid = q[k : len(q) - k]
        rows.append((f, (1000 * int(mid.sum())) // len(mid), len(mid)))
    ref = pd.DataFrame(rows, columns=["l_returnflag", "trimmed_mean_milli", "n_kept"])
    ref = ref.sort_values("l_returnflag").reset_index(drop=True).astype(
        {"trimmed_mean_milli": "int64", "n_kept": "int64"}
    )
    pd.testing.assert_frame_equal(got, ref)
    # trimming actually dropped both tails
    assert (ref["n_kept"] < li.groupby("l_returnflag").size().sort_index().to_numpy()).all()
