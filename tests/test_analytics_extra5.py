"""Session-9 third wave (Zipf slope / Q21-lite / seasonality / daily
autocorr / lead time / local bridges): serial-replay exactness on
synthetic fixtures, independent of the driver sweep."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

import ray.data

from everythinggraph_ray.pipelines.analytics_extra5 import (
    LOG_SCALE,
    Q21_LATE_DAYS,
    ZIPF_TOP,
    q_docs_zipf_slope,
    q_events_daily_autocorr,
    q_orders_seasonality,
    q_q21_waiting,
    q_rel_local_bridges,
    q_supplier_lead_time,
)


def _to_df(res):
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_zipf_slope_matches_serial(tmp_path):
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(300)]
    # Zipfian draws so the top-100 cut is nontrivial
    p = 1.0 / np.arange(1, 301)
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, 80, p=p)) for _ in range(60)]
    pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )
    got = _to_df(q_docs_zipf_slope(str(tmp_path)))
    cnt = Counter()
    for t in texts:
        cnt.update(re.findall(r"[a-z0-9]+", t.lower()))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
    n = len(top)
    x = np.floor(np.log(np.arange(1, n + 1)) * LOG_SCALE).astype(np.int64)
    y = np.floor(np.log(np.array([c for _, c in top], np.float64)) * LOG_SCALE).astype(np.int64)
    sx, sy, sxy, sxx = int(x.sum()), int(y.sum()), int((x * y).sum()), int((x * x).sum())
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    assert int(got.loc[0, "n_terms"]) == n
    assert int(got.loc[0, "sx"]) == sx and int(got.loc[0, "sy"]) == sy
    assert int(got.loc[0, "sxy"]) == sxy and int(got.loc[0, "sxx"]) == sxx
    assert float(got.loc[0, "slope"]) == round(float(num) / float(den), 7)
    assert float(got.loc[0, "slope"]) < 0  # Zipfian data slopes down


@pytest.fixture(scope="module")
def orders_li_dir(tmp_path_factory):
    rng = np.random.default_rng(37)
    n_orders, n_lines = 400, 2500
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n_orders + 1, dtype=np.int64),
            "o_orderdate": pd.to_datetime(
                rng.integers(0, 3 * 365, n_orders) * 86_400_000_000, unit="us", origin="1995-01-01"
            ),
            "o_totalprice": np.round(rng.uniform(100, 5000, n_orders), 2),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(1, n_orders + 1, n_lines).astype(np.int64),
            "l_suppkey": rng.integers(1, 30, n_lines).astype(np.int64),
            "l_shipdate": pd.to_datetime(
                rng.integers(0, 3 * 365 + 120, n_lines) * 86_400_000_000,
                unit="us",
                origin="1995-01-01",
            ),
        }
    )
    d = tmp_path_factory.mktemp("q21")
    orders.to_parquet(d / "orders.parquet")
    li.to_parquet(d / "lineitem.parquet")
    return str(d), orders, li


def test_q21_matches_pandas(orders_li_dir):
    d, orders, li = orders_li_dir
    got = _to_df(q_q21_waiting(d)).reset_index(drop=True)
    j = li.merge(orders[["o_orderkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
    lag = (
        j["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        - j["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
    )
    j["late"] = (lag > Q21_LATE_DAYS).astype(np.int64)
    p = j.groupby(["l_orderkey", "l_suppkey"], as_index=False)["late"].max()
    o = p.groupby("l_orderkey")["late"].agg(["sum", "count"])
    p = p.merge(o, left_on="l_orderkey", right_index=True)
    hit = p[(p["late"] == 1) & (p["sum"] == 1) & (p["count"] >= 2)]
    ref = (
        hit.groupby("l_suppkey").size().reset_index(name="n_orders")
        .rename(columns={"l_suppkey": "suppkey"})
        .sort_values(["n_orders", "suppkey"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, ref)


def test_seasonality_matches_pandas(orders_li_dir):
    d, orders, _ = orders_li_dir
    got = _to_df(q_orders_seasonality(d))
    df = orders.copy()
    df["month"] = df["o_orderdate"].dt.month.astype(np.int64)
    df["cents"] = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    ref = df.groupby("month", as_index=False).agg(
        revenue_c=("cents", "sum"), n_orders=("cents", "size")
    )
    ref["share_ppm"] = (1_000_000 * ref["revenue_c"]) // int(ref["revenue_c"].sum())
    pd.testing.assert_frame_equal(got, ref.astype("int64"))
    assert got["share_ppm"].sum() <= 1_000_000


def test_lead_time_matches_pandas(orders_li_dir):
    d, orders, li = orders_li_dir
    got = _to_df(q_supplier_lead_time(d))
    j = li.merge(orders[["o_orderkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
    lag = (
        j["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        - j["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
    )
    j["lag"] = lag
    ref = j.groupby("l_suppkey", as_index=False).agg(n_lines=("lag", "size"), sum_days=("lag", "sum"))
    ref["avg_days"] = np.round(
        ref["sum_days"].to_numpy(np.float64) / ref["n_lines"].to_numpy(np.float64), 7
    )
    ref = ref.rename(columns={"l_suppkey": "suppkey"})
    pd.testing.assert_frame_equal(
        got, ref.astype({"suppkey": "int64", "n_lines": "int64", "sum_days": "int64"})
    )
    # negative lags exist in the fixture and must be preserved exactly
    assert (ref["sum_days"] < ref["n_lines"] * 400).all()


def test_daily_autocorr_matches_serial(tmp_path):
    rng = np.random.default_rng(5)
    # sinusoidal daily rate → strong positive lag-1 autocorrelation
    days = np.repeat(np.arange(40), (80 + 60 * np.sin(np.arange(40) / 3)).astype(int))
    ts = days * 86_400_000_000 + rng.integers(0, 86_400_000_000, len(days))
    pd.DataFrame(
        {"ts": pd.to_datetime(np.sort(ts), unit="us"), "user_id": np.zeros(len(ts), np.int64)}
    ).to_parquet(tmp_path / "events.parquet")
    got = _to_df(q_events_daily_autocorr(str(tmp_path)))
    c = np.unique(days, return_counts=True)[1].astype(np.int64)
    n, S = len(c), int(c.sum())
    dev = n * c - S
    num, den = int((dev[:-1] * dev[1:]).sum()), int((dev * dev).sum())
    assert int(got.loc[0, "n_days"]) == n
    assert int(got.loc[0, "num"]) == num and int(got.loc[0, "den"]) == den
    assert float(got.loc[0, "r1"]) == round(float(num) / float(den), 7)
    assert float(got.loc[0, "r1"]) > 0.5  # smooth seasonal series persists


def test_local_bridges_on_planted_graph(tmp_path, monkeypatch):
    # two triangles joined by one bridge edge: exactly 1 local bridge
    src = np.array([0, 1, 2, 10, 11, 12, 2], np.int64)
    dst = np.array([1, 2, 0, 11, 12, 10, 10], np.int64)
    li = pd.DataFrame({"l_orderkey": src, "l_partkey": dst})
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _to_df(q_rel_local_bridges(str(tmp_path)))
    assert int(got.loc[0, "n_edges"]) == 7
    assert int(got.loc[0, "n_local_bridges"]) == 1
    assert int(got.loc[0, "bridge_ppm"]) == (1_000_000 * 1) // 7
