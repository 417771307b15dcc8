"""Session-12 sixth wave (watermark late arrivals / OHLC candles /
PAVA isotonic): serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra22 import (
    LATENESS_US,
    pava_pools,
    q_events_isotonic,
    q_events_late_arrivals,
    q_events_ohlc_hourly,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_late_arrivals_matches_serial_scan(tmp_path):
    rng = np.random.default_rng(121)
    n = 900
    base = pd.Timestamp("2024-07-01").value // 1000
    # event_id (arrival order) mostly time-ordered with heavy jitter so
    # genuinely late events exist
    ts_us = base + np.arange(n) * 30_000_000 + rng.integers(
        -20 * 60, 60, n
    ) * 1_000_000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 10, n).astype(np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "value": rng.normal(0, 1, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_late_arrivals(str(tmp_path)))
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    wm = np.empty(n, np.int64)
    late = np.empty(n, np.int64)
    cur = None
    for i in range(n):
        wm[i] = -1 if cur is None else cur
        late[i] = int(cur is not None and ts_us[i] < cur - LATENESS_US)
        cur = ts_us[i] if cur is None else max(cur, int(ts_us[i]))
    ref = pd.DataFrame(
        {"event_id": np.arange(n, dtype=np.int64), "watermark_us": wm, "is_late": late}
    )
    pd.testing.assert_frame_equal(got, ref)
    assert late.sum() > 0  # the jitter actually produced late events
    assert got.iloc[0]["watermark_us"] == -1


def test_ohlc_matches_bruteforce_with_duplicate_ts(tmp_path):
    rng = np.random.default_rng(122)
    n = 800
    base = pd.Timestamp("2024-08-01").value // 1000
    ts_us = base + rng.integers(0, 4 * 3600, n) * 1_000_000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 5, n).astype(np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "value": rng.normal(100, 30, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_ohlc_hourly(str(tmp_path)))
        .sort_values("hour_us")
        .reset_index(drop=True)
    )

    v = np.floor(ev["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    HOUR = 3_600_000_000
    h = (ts_us // HOUR) * HOUR
    rows = []
    for hour in sorted(set(h.tolist())):
        m = np.flatnonzero(h == hour)
        order = m[np.lexsort((ev["event_id"].to_numpy()[m], ts_us[m]))]
        rows.append(
            (
                hour,
                v[order[0]],
                v[m].max(),
                v[m].min(),
                v[order[-1]],
            )
        )
    ref = pd.DataFrame(
        rows, columns=["hour_us", "open_milli", "high_milli", "low_milli", "close_milli"]
    ).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    assert ev.duplicated(subset=["ts"], keep=False).any()


def test_pava_pools_properties_and_query(tmp_path):
    # hand-checkable: [3, 1, 2, 10] -> [3,1] pools to 4/2 (mean 2); the
    # next value 2 equals the pool mean (no strict violation, stays its
    # own pool) -> fitted means [2, 2, 2, 10]
    out = pava_pools(np.array([3, 1, 2, 10], np.int64))
    assert out.tolist() == [[4, 2], [4, 2], [2, 1], [10, 1]]
    # already monotone stays untouched
    out2 = pava_pools(np.array([1, 2, 3], np.int64))
    assert out2.tolist() == [[1, 1], [2, 1], [3, 1]]

    rng = np.random.default_rng(123)
    n = 500
    day = rng.integers(0, 40, n)
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(day, unit="D")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "value": 10 + 0.5 * day + rng.normal(0, 6, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = _to_df(q_events_isotonic(str(tmp_path)))
    # fitted means are nondecreasing (cross-multiplied, exact)
    f = got[["fit_num", "fit_den"]].to_numpy(np.int64)
    for i in range(len(f) - 1):
        assert f[i, 0] * f[i + 1, 1] <= f[i + 1, 0] * f[i, 1]
    # replay equality
    dd = ev.copy()
    dd["day"] = dd["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    dd["v"] = np.floor(dd["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    days = dd.groupby("day", as_index=False)["v"].sum().sort_values("day")
    ref = pava_pools(days["v"].to_numpy(np.int64))
    assert (got[["fit_num", "fit_den"]].to_numpy(np.int64) == ref).all()
