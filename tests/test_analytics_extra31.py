"""Session-12 fifteenth wave (BOM rollup / sortedness scan):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra31 import (
    q_orders_sortedness,
    q_part_bom_rollup,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_bom_rollup_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(201)
    n = 60
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(n, dtype=np.int64),  # 0-based keys
            "p_retailprice": rng.uniform(1, 100, n),
        }
    )
    part.to_parquet(tmp_path / "part.parquet")

    got = (
        _to_df(q_part_bom_rollup(str(tmp_path)))
        .sort_values("partkey")
        .reset_index(drop=True)
    )

    price = {
        int(k): int(np.floor(v * 1000 + 0.5))
        for k, v in zip(part["p_partkey"], part["p_retailprice"])
    }
    # brute force: node m's subtree = parts whose 1-based chain hits m+1
    cost = {k: 0 for k in price}
    cnt = {k: 0 for k in price}
    for k in price:
        node = k + 1
        while node >= 1:
            cost[node - 1] += price[k]
            cnt[node - 1] += 1
            node //= 2
    ref = pd.DataFrame(
        {
            "partkey": sorted(price),
            "subtree_cost_milli": [cost[k] for k in sorted(price)],
            "n_desc": [cnt[k] for k in sorted(price)],
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    # root (key 0 -> node 1) covers everything
    r = got.set_index("partkey")
    assert r.loc[0, "n_desc"] == n
    assert r.loc[0, "subtree_cost_milli"] == sum(price.values())
    # a leaf covers only itself
    assert r.loc[n - 1, "n_desc"] == 1


def test_sortedness_matches_lag_scan(tmp_path):
    rng = np.random.default_rng(202)
    n = 3000
    # piecewise-sorted with injected descents; sparse keys with gaps
    v = np.sort(rng.integers(0, 10**6, n))
    drops = rng.choice(n - 1, 40, replace=False) + 1
    v[drops] = v[drops] - rng.integers(1, 10**6, 40)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64) * 7 + 3,
            "o_totalprice": v / 1000.0,
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")

    got = _to_df(q_orders_sortedness(str(tmp_path))).iloc[0]
    vm = np.floor(orders["o_totalprice"].to_numpy() * 1000 + 0.5).astype(np.int64)
    desc = int((vm[1:] < vm[:-1]).sum())
    assert got["n_rows"] == n
    assert got["n_descents"] == desc
    assert got["n_runs"] == desc + 1
    assert desc > 0
