"""Session-12 nineteenth wave (materialized paths / gap filling):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra35 import (
    q_events_hourly_dense,
    q_part_path_enum,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_path_enum_known_paths(tmp_path):
    part = pd.DataFrame(
        {"p_partkey": np.array([0, 1, 4, 12], np.int64), "p_retailprice": 1.0}
    )
    part.to_parquet(tmp_path / "part.parquet")
    got = _to_df(q_part_path_enum(str(tmp_path))).set_index("partkey")
    # node = key + 1: 1 -> "1"; 2 -> "1/2"; 5 -> "1/2/5"; 13 -> "1/3/6/13"
    assert got.loc[0, "path"] == "1" and got.loc[0, "depth"] == 1
    assert got.loc[1, "path"] == "1/2" and got.loc[1, "depth"] == 2
    assert got.loc[4, "path"] == "1/2/5" and got.loc[4, "depth"] == 3
    assert got.loc[12, "path"] == "1/3/6/13" and got.loc[12, "depth"] == 4


def test_hourly_dense_fills_gaps_with_zeros(tmp_path):
    base = pd.Timestamp("2025-03-01")
    # events in hours 0, 1 and 5 only -> hours 2..4 must appear as 0
    hours = [0, 0, 1, 5, 5, 5]
    ev = pd.DataFrame(
        {
            "event_id": np.arange(len(hours), dtype=np.int64),
            "user_id": np.zeros(len(hours), np.int64),
            "ts": [base + pd.Timedelta(hours=h, minutes=7) for h in hours],
            "value": 0.0,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_hourly_dense(str(tmp_path)))
        .sort_values("hour_us")
        .reset_index(drop=True)
    )
    assert len(got) == 6  # hours 0..5 inclusive
    assert list(got["n"]) == [2, 1, 0, 0, 0, 3]
    # spine is exactly hourly
    d = np.diff(got["hour_us"].to_numpy(np.int64))
    assert (d == 3_600_000_000).all()
