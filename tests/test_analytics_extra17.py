"""Session-12 first wave (CSV round-trip / RANGE window):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra17 import (
    RANGE_WINDOW_US,
    q_events_range_window,
    q_rel_edges_csv_roundtrip,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_csv_roundtrip_is_lossless(tmp_path):
    rng = np.random.default_rng(72)
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 5000, 3000).astype(np.int64),
            "l_partkey": rng.integers(0, 5000, 3000).astype(np.int64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_rel_edges_csv_roundtrip(str(tmp_path))).iloc[0]
    s = (li["l_orderkey"] % 1000).to_numpy(np.int64)
    d = (li["l_partkey"] % 1000).to_numpy(np.int64)
    assert got["n_edges"] == len(s)
    assert got["sum_src"] == s.sum()
    assert got["sum_dst"] == d.sum()
    assert got["sum_prod"] == (s * d).sum()


def test_range_window_matches_bruteforce_with_ts_peers(tmp_path):
    rng = np.random.default_rng(73)
    n = 800
    base = pd.Timestamp("2024-03-01").value // 1000  # us
    # coarse second grid ensures duplicate timestamps within users
    ts_us = base + rng.integers(0, 3600, n) * 1_000_000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "value": rng.normal(10, 5, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_range_window(str(tmp_path)))
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    v = np.floor(ev["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    tsv = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = ev["user_id"].to_numpy()
    sums = np.empty(n, np.int64)
    cnts = np.empty(n, np.int64)
    for i in range(n):
        m = (uid == uid[i]) & (tsv >= tsv[i] - RANGE_WINDOW_US) & (tsv <= tsv[i])
        sums[i] = v[m].sum()
        cnts[i] = int(m.sum())
    ref = pd.DataFrame(
        {
            "event_id": ev["event_id"],
            "user_id": ev["user_id"],
            "win_sum_milli": sums,
            "win_cnt": cnts,
        }
    )
    pd.testing.assert_frame_equal(got, ref)
    # peers actually exist (duplicate-ts rows counted in both frames)
    dup = ev.duplicated(subset=["user_id", "ts"], keep=False)
    assert dup.any()
