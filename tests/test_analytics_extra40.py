"""Session-12 twenty-fourth wave (Viterbi burst decoding):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra40 import (
    SWITCH_PENALTY,
    q_events_burst_viterbi,
    viterbi_burst,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _brute_force(counts, penalty):
    """Enumerate all 2^n state paths (n small): min cost, tie broken by
    preferring the lexicographically-smallest (base-leaning) path."""
    c = np.asarray(counts, np.int64)
    srt = np.sort(c)
    n = len(c)
    mu0 = int(srt[n // 2] if n % 2 else (srt[n // 2 - 1] + srt[n // 2]) // 2)
    mu1 = 2 * mu0
    best = None
    for mask in range(1 << n):
        st = [(mask >> i) & 1 for i in range(n)]
        cost = sum(abs(int(c[i]) - (mu1 if st[i] else mu0)) for i in range(n))
        cost += penalty * sum(st[i] != st[i - 1] for i in range(1, n))
        key = (cost, st)
        if best is None or key < best:
            best = key
    return best


def test_viterbi_finds_planted_burst():
    # base rate ~10 with a clear burst plateau ~20
    counts = np.array([10, 11, 9, 20, 21, 19, 20, 10, 9, 10], np.int64)
    states, cost, mu0, mu1 = viterbi_burst(counts)
    assert mu0 == 10 and mu1 == 20
    assert list(states) == [0, 0, 0, 1, 1, 1, 1, 0, 0, 0]


def test_viterbi_is_optimal_vs_bruteforce():
    rng = np.random.default_rng(271)
    for _ in range(20):
        n = int(rng.integers(3, 11))
        counts = rng.integers(5, 30, n).astype(np.int64)
        states, cost, mu0, mu1 = viterbi_burst(counts)
        bcost, _ = _brute_force(counts, SWITCH_PENALTY)
        assert cost == bcost, (counts, cost, bcost)
        # and the decoded path attains that cost
        path_cost = sum(
            abs(int(counts[i]) - (mu1 if states[i] else mu0)) for i in range(n)
        ) + SWITCH_PENALTY * int((states[1:] != states[:-1]).sum())
        assert path_cost == cost


def test_burst_query_replays(tmp_path):
    rng = np.random.default_rng(272)
    # 20 base days at ~30/day, 5 burst days at ~60/day
    per_day = [30] * 8 + [60] * 5 + [30] * 12
    rows = []
    eid = 0
    for d, k in enumerate(per_day):
        k = k + int(rng.integers(-3, 4))
        for _ in range(k):
            rows.append(
                (eid, 0, pd.Timestamp("2025-07-01") + pd.Timedelta(days=d, minutes=eid % 1440))
            )
            eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    ev["event_type"] = "click"
    ev["value"] = 0.0
    ev.to_parquet(tmp_path / "events.parquet")

    got = _to_df(q_events_burst_viterbi(str(tmp_path))).sort_values("day")
    states, _, _, _ = viterbi_burst(got["n_events"].to_numpy(np.int64))
    assert (got["burst"].to_numpy(np.int64) == states).all()
    # the planted plateau is flagged
    assert got["burst"].iloc[8:13].min() == 1
    assert got["burst"].iloc[:8].max() == 0
