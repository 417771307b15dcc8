"""Session-12 twenty-second wave (WCC size / session-length
histograms): serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra38 import (
    SESSION_GAP_US,
    q_events_session_length_hist,
    q_rel_wcc_profile,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_wcc_profile_counts_component_sizes(tmp_path):
    # components: {0,1,2} (size 3), {5,6} (size 2), {8,9} (size 2),
    # {20,21,22,23} (size 4 via a path)
    edges = np.array(
        [(0, 1), (1, 2), (5, 6), (8, 9), (20, 21), (21, 22), (22, 23)], np.int64
    )
    pd.DataFrame({"l_orderkey": edges[:, 0], "l_partkey": edges[:, 1]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got = (
        _to_df(q_rel_wcc_profile(str(tmp_path)))
        .set_index("comp_size")["n_components"]
        .to_dict()
    )
    assert got == {2: 2, 3: 1, 4: 1}


def test_session_length_hist_matches_serial(tmp_path):
    rng = np.random.default_rng(251)
    n = 500
    base = pd.Timestamp("2025-05-01").value // 1000
    # bursty: gaps mostly < 30 min with occasional long breaks
    gaps = np.where(rng.random(n) < 0.15, 7200, rng.integers(60, 1200, n)) * 1_000_000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 6, n).astype(np.int64),
            "ts": pd.to_datetime(base + np.cumsum(gaps), unit="us"),
            "value": 0.0,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_session_length_hist(str(tmp_path)))
        .set_index("session_len")["n_sessions"]
        .to_dict()
    )

    ts = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    hist: dict[int, int] = {}
    for _, g in ev.groupby("user_id"):
        ix = g.index.to_numpy()
        order = ix[np.lexsort((ev["event_id"].to_numpy()[ix], ts[ix]))]
        cur = 0
        prev = None
        for j in order:
            if prev is not None and ts[j] - prev > SESSION_GAP_US:
                hist[cur] = hist.get(cur, 0) + 1
                cur = 0
            cur += 1
            prev = int(ts[j])
        if cur:
            hist[cur] = hist.get(cur, 0) + 1
    assert got == hist
    assert len(hist) > 2  # varied session lengths
