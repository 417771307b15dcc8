"""Session-12 twenty-sixth wave (debouncing): serial-replay exactness
on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra42 import (
    DEBOUNCE_US,
    q_events_debounce,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_debounce_matches_serial_chain(tmp_path):
    rng = np.random.default_rng(291)
    n = 700
    base = pd.Timestamp("2025-08-01").value // 1000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 5, n).astype(np.int64),
            "ts": pd.to_datetime(
                base + np.sort(rng.integers(0, 3 * 3600, n)) * 1_000_000, unit="us"
            ),
            "event_type": np.array(["error", "click"])[rng.integers(0, 2, n)],
            "value": 0.0,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_debounce(str(tmp_path)))
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    ts = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ref = np.zeros(n, np.int64)
    for (_, _), g in ev.groupby(["user_id", "event_type"]):
        ix = g.index.to_numpy()
        order = ix[np.lexsort((ev["event_id"].to_numpy()[ix], ts[ix]))]
        last = None
        for j in order:
            if last is None or ts[j] - last >= DEBOUNCE_US:
                ref[j] = 1
                last = int(ts[j])
    assert (got["kept"].to_numpy(np.int64) == ref).all()
    assert 0 < ref.sum() < n  # suppression actually happened


def test_debounce_flap_pattern():
    # crafted: burst of 4 errors 1 min apart, then one 11 min later —
    # only the first and the last survive
    base = pd.Timestamp("2025-08-02")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        ev = pd.DataFrame(
            {
                "event_id": np.arange(5, dtype=np.int64),
                "user_id": np.zeros(5, np.int64),
                "ts": [base + pd.Timedelta(minutes=m) for m in (0, 1, 2, 3, 14)],
                "event_type": "error",
                "value": 0.0,
            }
        )
        ev.to_parquet(os.path.join(d, "events.parquet"))
        got = (
            _to_df(q_events_debounce(d)).sort_values("event_id").reset_index(drop=True)
        )
        assert list(got["kept"]) == [1, 0, 0, 0, 1]
