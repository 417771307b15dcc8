"""Session-10 fourth wave (interval family: overlap join / sweep line
/ union coverage): serial-replay exactness on synthetic fixtures with
sessions that straddle multiple time buckets."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra11 import (
    BUCKET_US,
    COVER_WIN_US,
    GAP_US,
    q_events_max_concurrency,
    q_events_session_overlap,
    q_events_type_coverage,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _mk_events(tmp_path, rng, n_users=25, n_events=900):
    """Events over ~2 days; a few users get dense 20-min-gap chains so
    some sessions span several 1-hour buckets."""
    base = pd.Timestamp("2023-03-01").value // 1000  # epoch us
    rows = []
    for u in range(n_users):
        k = rng.integers(10, n_events // n_users + 20)
        ts = np.sort(rng.integers(0, 2 * 86_400_000_000, k))
        if u % 5 == 0:
            # dense chain: one long session spanning ~4 buckets
            chain = np.arange(12, dtype=np.int64) * (GAP_US - 600_000_000)
            ts = np.sort(np.concatenate([ts, rng.integers(0, 86_400_000_000) + chain]))
        rows.append(
            pd.DataFrame(
                {
                    "user_id": np.full(len(ts), u, np.int64),
                    "ts": pd.to_datetime(base + ts, unit="us"),
                    "event_type": rng.choice(["a", "b", "c"], len(ts)),
                    "event_id": np.arange(len(ts), dtype=np.int64),
                }
            )
        )
    df = pd.concat(rows, ignore_index=True)
    df.to_parquet(tmp_path / "events.parquet")
    return df


def _serial_sessions(df):
    out = []
    for u, g in df.groupby("user_id"):
        t = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        new = np.ones(len(t), bool)
        new[1:] = t[1:] - t[:-1] > GAP_US
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(t)) - 1
        for s, e in zip(starts, ends):
            out.append((u, t[s], t[e]))
    return pd.DataFrame(out, columns=["user_id", "st_us", "en_us"])


def test_session_overlap_matches_serial(tmp_path):
    rng = np.random.default_rng(11)
    df = _mk_events(tmp_path, rng)
    sess = _serial_sessions(df)
    # sessions must exercise the multi-bucket replication path
    assert ((sess["en_us"] // BUCKET_US) - (sess["st_us"] // BUCKET_US)).max() >= 3
    st = sess["st_us"].to_numpy()
    en = sess["en_us"].to_numpy()
    uu = sess["user_id"].to_numpy()
    ov = (
        (st[:, None] <= en[None, :])
        & (st[None, :] <= en[:, None])
        & (uu[:, None] != uu[None, :])
    )
    ref = sess.copy()
    ref["n_overlap"] = ov.sum(axis=1).astype(np.int64)
    ref = ref.sort_values(["user_id", "st_us"]).reset_index(drop=True).astype("int64")
    assert ref["n_overlap"].sum() > 0
    got = (
        _to_df(q_events_session_overlap(str(tmp_path)))
        .sort_values(["user_id", "st_us"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)


def test_max_concurrency_matches_serial(tmp_path):
    rng = np.random.default_rng(12)
    df = _mk_events(tmp_path, rng)
    sess = _serial_sessions(df)
    pts = sorted(
        [(t, 1) for t in sess["st_us"]] + [(t + 1, -1) for t in sess["en_us"]],
        key=lambda p: (p[0], -p[1]),
    )
    run = mx = 0
    at = None
    for t, d in pts:
        run += d
        if run > mx:
            mx, at = run, t
    got = _to_df(q_events_max_concurrency(str(tmp_path)))
    assert got.shape == (1, 2)
    assert int(got["max_concurrency"][0]) == mx
    assert int(got["at_us"][0]) == at


def test_type_coverage_matches_serial(tmp_path):
    rng = np.random.default_rng(13)
    df = _mk_events(tmp_path, rng)
    rows = []
    for et, g in df.groupby("event_type"):
        st = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        en = st + COVER_WIN_US
        cm = np.maximum.accumulate(en)
        new = np.ones(len(st), bool)
        new[1:] = st[1:] > cm[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(st)) - 1
        rows.append((et, int((cm[ends] - st[starts]).sum())))
    ref = (
        pd.DataFrame(rows, columns=["event_type", "covered_us"])
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    got = (
        _to_df(q_events_type_coverage(str(tmp_path)))
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)
    # coverage is capped by window-count x window-length and is positive
    n_by_type = df.groupby("event_type").size()
    for _, r in got.iterrows():
        assert 0 < r["covered_us"] <= int(n_by_type[r["event_type"]]) * COVER_WIN_US
