"""Session-12 sixteenth wave (AR aging / watermark refinements):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra22 import LATENESS_US
from everythinggraph_ray.pipelines.analytics_extra32 import (
    q_events_hourly_refinements,
    q_orders_aging_buckets,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_aging_buckets_band_edges(tmp_path):
    asof = pd.Timestamp("2000-06-30")
    # plant orders exactly at every band edge
    ages = [0, 30, 31, 60, 61, 90, 91, 400]
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(len(ages), dtype=np.int64),
            "o_orderdate": [asof - pd.Timedelta(days=a) for a in ages],
            "o_totalprice": [1.0] * len(ages),
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")

    got = _to_df(q_orders_aging_buckets(str(tmp_path))).set_index("band")
    assert got.loc[0, "n_orders"] == 2  # 0, 30
    assert got.loc[1, "n_orders"] == 2  # 31, 60
    assert got.loc[2, "n_orders"] == 2  # 61, 90
    assert got.loc[3, "n_orders"] == 2  # 91, 400
    assert got["rev_milli"].sum() == 8 * 1000


def test_hourly_refinements_split_matches_serial(tmp_path):
    rng = np.random.default_rng(211)
    n = 600
    base = pd.Timestamp("2025-01-01").value // 1000
    ts_us = base + np.arange(n) * 20_000_000 + rng.integers(
        -15 * 60, 60, n
    ) * 1_000_000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 5, n).astype(np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "value": rng.normal(0, 1, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_hourly_refinements(str(tmp_path)))
        .sort_values("hour_us")
        .reset_index(drop=True)
    )

    HOUR = 3_600_000_000
    cur = None
    rows: dict[int, list[int]] = {}
    for i in range(n):
        lt = int(cur is not None and ts_us[i] < cur - LATENESS_US)
        h = (int(ts_us[i]) // HOUR) * HOUR
        rows.setdefault(h, [0, 0])[lt] += 1
        cur = int(ts_us[i]) if cur is None else max(cur, int(ts_us[i]))
    ref = pd.DataFrame(
        [(h, a, b) for h, (a, b) in sorted(rows.items())],
        columns=["hour_us", "n_ontime", "n_late"],
    ).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    assert got["n_late"].sum() > 0
    assert (got["n_ontime"] + got["n_late"]).sum() == n
