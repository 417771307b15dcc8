"""Session-12 fourteenth wave (Z-order / post-dominators / ISO weeks):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra29 import serial_dominators
from everythinggraph_ray.pipelines.analytics_extra30 import (
    Z_BITS,
    Z_PX,
    Z_PY,
    q_cust_zorder,
    q_orders_iso_week_revenue,
    q_rel_postdominators,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _morton(x: int, y: int) -> int:
    z = 0
    for i in range(Z_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_bit_interleave_and_preserves_locality(tmp_path):
    keys = np.arange(0, 300, dtype=np.int64)
    pd.DataFrame({"c_custkey": keys, "c_mktsegment": "A"}).to_parquet(
        tmp_path / "customer.parquet"
    )
    got = (
        _to_df(q_cust_zorder(str(tmp_path)))
        .sort_values("custkey")
        .reset_index(drop=True)
    )
    for k, z in zip(got["custkey"], got["zcode"]):
        assert z == _morton(int(k) % Z_PX, (int(k) * 31) % Z_PY)
    # locality: z-adjacent quad cells share high bits — spot check the
    # canonical 2x2 block (0,0)(1,0)(0,1)(1,1) -> 0,1,2,3
    assert [_morton(x, y) for x, y in [(0, 0), (1, 0), (0, 1), (1, 1)]] == [0, 1, 2, 3]


def test_postdominators_equal_reverse_dominators(tmp_path):
    edges = np.array(
        [(1, 0), (2, 0), (3, 1), (3, 2), (4, 3), (5, 4), (1, 5), (9, 8)],
        np.int64,
    )
    pd.DataFrame({"l_orderkey": edges[:, 0], "l_partkey": edges[:, 1]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got = (
        _to_df(q_rel_postdominators(str(tmp_path)))
        .sort_values("vid")
        .reset_index(drop=True)
    )
    verts = sorted({int(v) for e in edges for v in e})
    bits = {v: i for i, v in enumerate(verts[:63])}
    rev = [(int(b), int(a)) for a, b in edges]
    ref = serial_dominators(rev, 0, bits)
    for _, row in got.iterrows():
        assert int(row["pdom_mask"]) == ref[int(row["vid"])], row["vid"]
    # the diamond dual: 3 post-dominated only by 0 and itself
    m = got.set_index("vid")["pdom_mask"]
    b = lambda v: 1 << bits[v]  # noqa: E731
    assert m[3] == b(0) | b(3)


def test_iso_week_revenue_handles_year_boundary(tmp_path):
    # 1995-01-01 is ISO 1994-W52; 1996-12-30 is ISO 1997-W01
    dates = ["1995-01-01", "1995-01-02", "1996-12-30", "1996-07-01"]
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_orderdate": pd.to_datetime(dates),
            "o_totalprice": [100.0, 200.0, 300.0, 400.0],
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")
    got = _to_df(q_orders_iso_week_revenue(str(tmp_path)))
    idx = got.set_index(["iso_year", "iso_week"])["rev_milli"]
    assert idx[(1994, 52)] == 100_000
    assert idx[(1995, 1)] == 200_000
    assert idx[(1997, 1)] == 300_000
    assert idx[(1996, 27)] == 400_000
