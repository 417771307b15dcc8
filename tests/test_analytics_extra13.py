"""Session-11 first wave (1-WL colors / weighted median / bipartite
clustering): serial-replay exactness on synthetic fixtures."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra13 import (
    WL_ROUNDS,
    q_lineitem_weighted_median,
    q_rel_wl_colors,
    q_supplier_part_cc,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_wl_colors_match_serial(tmp_path):
    rng = np.random.default_rng(31)
    n = 1200
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 120, n).astype(np.int64),
            "l_partkey": rng.integers(0, 80, n).astype(np.int64),
        }
    )
    # plant a self-loop-only vertex: 777 % 1000 on both sides
    li.loc[len(li)] = [777, 777]
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = (
        _to_df(q_rel_wl_colors(str(tmp_path)))
        .sort_values("vid")
        .reset_index(drop=True)
    )

    src = (li["l_orderkey"] % 1000).to_numpy(np.int64)
    dst = (li["l_partkey"] % 1000).to_numpy(np.int64)
    verts = sorted(set(src) | set(dst))
    nbrs: dict = defaultdict(set)
    for u, w in zip(src, dst):
        if u != w:
            nbrs[u].add(w)
            nbrs[w].add(u)
    c = {v: 0 for v in verts}
    for _ in range(WL_ROUNDS):
        sig = {
            v: f"{c[v]}|" + ",".join(map(str, sorted(c[w] for w in nbrs[v])))
            for v in verts
        }
        rep: dict = {}
        for v in verts:
            rep[sig[v]] = min(rep.get(sig[v], v), v)
        c = {v: rep[sig[v]] for v in verts}
    ref = (
        pd.DataFrame({"vid": verts, "color": [c[v] for v in verts]})
        .astype("int64")
        .sort_values("vid")
        .reset_index(drop=True)
    )
    assert ref["color"].nunique() > 1  # refinement actually separated classes
    assert 777 in set(ref["vid"])  # self-loop-only vertex kept in universe
    pd.testing.assert_frame_equal(got, ref)


def test_weighted_median_matches_serial_and_tie(tmp_path):
    rng = np.random.default_rng(32)
    n = 2000
    li = pd.DataFrame(
        {
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_quantity": rng.integers(1, 30, n).astype(float),
            "l_extendedprice": np.round(rng.uniform(1, 500, n), 2),
        }
    )
    # planted exact-tie group: flag T, values 1 and 2 with equal weight
    tie = pd.DataFrame(
        {
            "l_returnflag": ["T", "T"],
            "l_quantity": [1.0, 2.0],
            "l_extendedprice": [5.0, 5.0],
        }
    )
    li = pd.concat([li, tie], ignore_index=True)
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_lineitem_weighted_median(str(tmp_path)))

    df = li.copy()
    df["q"] = np.floor(df["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    df["wt"] = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    rows = []
    for f, g in df.groupby("l_returnflag"):
        h = g.groupby("q")["wt"].sum().sort_index()
        tot = int(h.sum())
        cum = h.cumsum()
        med = int(cum.index[(2 * cum >= tot).to_numpy().argmax()])
        rows.append((f, med, tot))
    ref = pd.DataFrame(rows, columns=["l_returnflag", "wmedian_qty", "weight_cents"])
    ref = ref.sort_values("l_returnflag").reset_index(drop=True).astype(
        {"wmedian_qty": "int64", "weight_cents": "int64"}
    )
    pd.testing.assert_frame_equal(got, ref)
    # lower-median convention on the planted 50/50 tie: the SMALLER value
    assert int(got.set_index("l_returnflag").loc["T", "wmedian_qty"]) == 1


def test_bipartite_cc_matches_serial(tmp_path):
    rng = np.random.default_rng(33)
    n = 1500
    li = pd.DataFrame(
        {
            "l_suppkey": rng.integers(1, 25, n).astype(np.int64),
            "l_partkey": rng.integers(1, 60, n).astype(np.int64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_supplier_part_cc(str(tmp_path))).iloc[0]

    e = li.drop_duplicates()
    ds_ = e.groupby("l_suppkey").size()
    dp_ = e.groupby("l_partkey").size()
    paths3 = int(
        sum(
            (ds_[s] - 1) * (dp_[p] - 1)
            for s, p in zip(e["l_suppkey"], e["l_partkey"])
        )
    )
    co: dict = defaultdict(int)
    for _, g in e.groupby("l_partkey"):
        ss = sorted(g["l_suppkey"].tolist())
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                co[(ss[i], ss[j])] += 1
    butterflies = sum(c * (c - 1) // 2 for c in co.values())
    assert butterflies > 0 and paths3 > 0
    assert int(got["butterflies"]) == butterflies
    assert int(got["paths3"]) == paths3
    assert int(got["cc_ppm"]) == (4_000_000 * butterflies) // paths3
