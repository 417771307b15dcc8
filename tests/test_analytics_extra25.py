"""Session-12 ninth wave (spatial grid join / FIFO allocation):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra25 import (
    GRID_D,
    GRID_PX,
    GRID_PY,
    q_cust_grid_neighbors,
    q_lineitem_fifo,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_grid_neighbors_matches_bruteforce(tmp_path):
    keys = np.arange(0, 400, dtype=np.int64)
    pd.DataFrame({"c_custkey": keys, "c_mktsegment": "A"}).to_parquet(
        tmp_path / "customer.parquet"
    )

    got = (
        _to_df(q_cust_grid_neighbors(str(tmp_path)))
        .sort_values("custkey")
        .reset_index(drop=True)
    )

    x = keys % GRID_PX
    y = (keys * 31) % GRID_PY
    ref = np.empty(len(keys), np.int64)
    for i in range(len(keys)):
        m = (
            (np.abs(x - x[i]) <= GRID_D)
            & (np.abs(y - y[i]) <= GRID_D)
            & (keys != keys[i])
        )
        ref[i] = int(m.sum())
    refdf = pd.DataFrame({"custkey": keys, "n_neighbors": ref})
    pd.testing.assert_frame_equal(got, refdf)
    assert ref.max() >= 1  # the grid actually has close pairs
    assert (ref == 0).any()  # and isolated points survive with count 0


def test_fifo_matches_serial_queue(tmp_path):
    rng = np.random.default_rng(151)
    n = 600
    li = pd.DataFrame(
        {
            "l_partkey": rng.integers(1, 20, n).astype(np.int64),
            "l_orderkey": rng.integers(1, 200, n).astype(np.int64),
            "l_linenumber": rng.integers(1, 7, n).astype(np.int64),
            "l_quantity": rng.integers(1, 50, n).astype(np.float64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = (
        _to_df(q_lineitem_fifo(str(tmp_path)))
        .sort_values(["partkey", "r_ok", "r_ln", "i_ok", "i_ln"])
        .reset_index(drop=True)
    )

    # serial FIFO queue replay
    agg = (
        li.assign(q=li["l_quantity"].astype(np.int64))
        .groupby(["l_partkey", "l_orderkey", "l_linenumber"], as_index=False)["q"]
        .sum()
        .sort_values(["l_partkey", "l_orderkey", "l_linenumber"])
    )
    rows = []
    for p, grp in agg.groupby("l_partkey"):
        rec = [
            [r["l_orderkey"], r["l_linenumber"], r["q"]]
            for _, r in grp[grp["l_orderkey"] % 2 == 0].iterrows()
        ]
        iss = [
            [r["l_orderkey"], r["l_linenumber"], r["q"]]
            for _, r in grp[grp["l_orderkey"] % 2 == 1].iterrows()
        ]
        ri = 0
        for iok, iln, need in iss:
            while need > 0 and ri < len(rec):
                rok, rln, avail = rec[ri]
                take = min(need, avail)
                if take > 0:
                    rows.append((p, rok, rln, iok, iln, take))
                rec[ri][2] -= take
                need -= take
                if rec[ri][2] == 0:
                    ri += 1
            if ri >= len(rec):
                break
    ref = (
        pd.DataFrame(
            rows, columns=["partkey", "r_ok", "r_ln", "i_ok", "i_ln", "qty"]
        )
        .astype("int64")
        .sort_values(["partkey", "r_ok", "r_ln", "i_ok", "i_ln"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)
    # conservation: matched quantity per part = min(supply, demand)
    sup = agg[agg["l_orderkey"] % 2 == 0].groupby("l_partkey")["q"].sum()
    dem = agg[agg["l_orderkey"] % 2 == 1].groupby("l_partkey")["q"].sum()
    for p, grp in got.groupby("partkey"):
        assert grp["qty"].sum() == min(int(sup.get(p, 0)), int(dem.get(p, 0)))
