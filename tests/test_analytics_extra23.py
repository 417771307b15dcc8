"""Session-12 seventh wave (Benford / regular path query / GROUPS
frame): serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra23 import (
    RPQ_PATTERN,
    RPQ_START_MAX,
    q_events_groups_frame,
    q_lineitem_benford,
    q_rel_rpq_even_odd_even,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_benford_matches_string_digits(tmp_path):
    rng = np.random.default_rng(131)
    # log-uniform prices hit every magnitude; include boundary powers
    price = np.r_[10.0 ** rng.uniform(-1, 4, 3000), [1.0, 10.0, 100.0, 999.995]]
    li = pd.DataFrame({"l_extendedprice": price})
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_lineitem_benford(str(tmp_path)))
    cents = np.floor(price * 100 + 0.5).astype(np.int64)
    ref_first = np.array([int(str(c)[0]) for c in cents])
    for d in range(1, 10):
        row = got[got["digit"] == d]
        n = int(row["n"].iloc[0]) if len(row) else 0
        assert n == int((ref_first == d).sum()), d


def test_rpq_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(132)
    src = rng.integers(0, 60, 1200)
    dst = rng.integers(0, 60, 1200)
    pd.DataFrame({"l_orderkey": src, "l_partkey": dst}).to_parquet(
        tmp_path / "lineitem.parquet"
    )

    got = set(_to_df(q_rel_rpq_even_odd_even(str(tmp_path)))["v"])

    s = (src % 1000).astype(int)
    d = (dst % 1000).astype(int)
    p = (s % 10 + d % 10) % 2
    edges = list(zip(s, d, p))
    frontier = {a for a, _, _ in edges if a < RPQ_START_MAX}
    for want in RPQ_PATTERN:
        frontier = {b for a, b, pp in edges if pp == want and a in frontier}
    assert got == frontier
    assert len(frontier) > 0  # pattern actually matches something


def test_groups_frame_matches_bruteforce_with_ts_peers(tmp_path):
    rng = np.random.default_rng(133)
    n = 700
    base = pd.Timestamp("2024-09-01").value // 1000
    # coarse grid -> many distinct-ts peer groups with >1 member
    ts_us = base + rng.integers(0, 120, n) * 1_000_000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 6, n).astype(np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "value": rng.normal(5, 2, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_groups_frame(str(tmp_path)))
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    v = np.floor(ev["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    uid = ev["user_id"].to_numpy()
    sums = np.empty(n, np.int64)
    cnts = np.empty(n, np.int64)
    for i in range(n):
        same = uid == uid[i]
        ts_u = sorted(set(ts_us[same].tolist()))
        ix = ts_u.index(ts_us[i])
        frame_ts = set(ts_u[max(0, ix - 1) : ix + 1])
        m = same & np.isin(ts_us, list(frame_ts))
        sums[i] = v[m].sum()
        cnts[i] = int(m.sum())
    ref = pd.DataFrame(
        {
            "event_id": ev["event_id"],
            "user_id": ev["user_id"],
            "grp_sum_milli": sums,
            "grp_cnt": cnts,
        }
    )
    pd.testing.assert_frame_equal(got, ref)
    assert ev.duplicated(subset=["user_id", "ts"], keep=False).any()
