"""Session-12 twelfth wave (Misra-Gries heavy hitters / knapsack
folding): serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra28 import (
    KNAP_CAP,
    KNAP_ITEMS,
    MG_K,
    _dp_items,
    _maxplus_convolve,
    _mg_merge,
    q_events_heavy_users_mg,
    q_part_knapsack,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_mg_guarantee_and_query(tmp_path):
    rng = np.random.default_rng(181)
    # skewed: a few hot users + a long uniform tail (the tail forces
    # real trimming inside the per-batch summaries)
    hot = np.repeat(np.arange(5, dtype=np.int64), 400)
    tail = rng.integers(100, 2000, 4000).astype(np.int64)
    users = np.concatenate([hot, tail])
    rng.shuffle(users)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(len(users), dtype=np.int64),
            "user_id": users,
            "ts": pd.to_datetime("2024-01-01"),
            "value": 0.0,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = _to_df(q_events_heavy_users_mg(str(tmp_path)))
    n = len(users)
    cnt = pd.Series(users).value_counts()
    ref = (
        cnt[cnt * MG_K > n]
        .rename_axis("user_id")
        .reset_index(name="n")
        .sort_values("user_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, ref)
    assert set(range(5)) <= set(got["user_id"])  # the hot users found

    # the MG trim itself preserves heavy candidates on a hand case
    m = _mg_merge({1: 10, 2: 3, 3: 3, 4: 3}, 2)
    assert 1 in m and len(m) <= 2


def test_knapsack_matches_serial_dp(tmp_path):
    rng = np.random.default_rng(182)
    n = 300
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(1, n + 1, dtype=np.int64),
            "p_size": rng.integers(1, 50, n).astype(np.int64),
            "p_retailprice": rng.uniform(900, 1000, n),
        }
    )
    part.to_parquet(tmp_path / "part.parquet")

    got = _to_df(q_part_knapsack(str(tmp_path)))

    sub = part[part["p_partkey"] <= KNAP_ITEMS]
    w = sub["p_size"].to_numpy(np.int64)
    v = np.floor(sub["p_retailprice"].to_numpy() * 1000 + 0.5).astype(np.int64)
    ref = _dp_items(w, v, KNAP_CAP)
    assert (got["best_value_milli"].to_numpy(np.int64) == ref).all()
    assert got["best_value_milli"].is_monotonic_increasing
    assert got["best_value_milli"].iloc[0] == 0  # capacity 0
    assert got["best_value_milli"].iloc[-1] > 0


def test_maxplus_convolution_is_associative_identity():
    rng = np.random.default_rng(183)
    cap = 30

    def dpvec():
        w = rng.integers(1, 10, 8)
        v = rng.integers(1, 100, 8)
        return _dp_items(w, v, cap)

    a, b, c = dpvec(), dpvec(), dpvec()
    ab_c = _maxplus_convolve(_maxplus_convolve(a, b, cap), c, cap)
    a_bc = _maxplus_convolve(a, _maxplus_convolve(b, c, cap), cap)
    assert (ab_c == a_bc).all()
    ident = np.zeros(cap + 1, np.int64)
    assert (_maxplus_convolve(ident, a, cap) == a).all()
    assert (_maxplus_convolve(a, ident, cap) == a).all()
