"""Session-10 fifth wave (Apriori triples / Holt smoothing / ABC
classes): serial-replay exactness on synthetic fixtures."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra12 import (
    TRIPLE_MINSUP,
    _tdiv2,
    q_events_holt,
    q_orders_abc,
    q_part_triples,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_part_triples_matches_serial(tmp_path):
    rng = np.random.default_rng(21)
    n = 2500
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 400, n).astype(np.int64),
            "l_partkey": rng.integers(0, 30, n).astype(np.int64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = (
        _to_df(q_part_triples(str(tmp_path)))
        .sort_values(["a", "b", "c"])
        .reset_index(drop=True)
    )
    d = li.drop_duplicates()
    cnt: dict = {}
    for _, g in d.groupby("l_orderkey"):
        for tri in combinations(sorted(g["l_partkey"].tolist()), 3):
            cnt[tri] = cnt.get(tri, 0) + 1
    ref = (
        pd.DataFrame(
            [(a, b, c, v) for (a, b, c), v in cnt.items() if v >= TRIPLE_MINSUP],
            columns=["a", "b", "c", "cnt"],
        )
        .sort_values(["a", "b", "c"])
        .reset_index(drop=True)
        .astype("int64")
    )
    assert len(ref) > 10
    pd.testing.assert_frame_equal(got, ref)
    # downward closure really holds on the output
    pairs = set()
    for _, g in d.groupby("l_orderkey"):
        for p in combinations(sorted(g["l_partkey"].tolist()), 2):
            pairs.add(p)
    for _, r in got.iterrows():
        for p in combinations((r["a"], r["b"], r["c"]), 2):
            assert p in pairs


def test_holt_matches_serial_with_negative_trend(tmp_path):
    rng = np.random.default_rng(22)
    n = 900
    # strongly decreasing series so the trend goes NEGATIVE and the
    # trunc-vs-floor division divergence is actually exercised
    day = rng.integers(0, 40, n)
    val = (50_000 - 1000 * day + rng.normal(0, 50, n)).astype(float)
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime("2022-06-01")
            + pd.to_timedelta(day, unit="D")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "value": val,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    got = _to_df(q_events_holt(str(tmp_path))).reset_index(drop=True)
    dd = ev.copy()
    dd["day"] = dd["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    dd["v"] = np.floor(dd["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    days = dd.groupby("day", as_index=False)["v"].sum().sort_values("day")
    s = int(days["v"].iloc[0])
    b = 0
    lev, tre = [s], [0]
    for v in days["v"].iloc[1:]:
        s_new = _tdiv2(int(v) + s + b)
        b = _tdiv2(s_new - s + b)
        s = s_new
        lev.append(s)
        tre.append(b)
    days["level_milli"] = np.array(lev, np.int64)
    days["trend_milli"] = np.array(tre, np.int64)
    days["forecast_milli"] = days["level_milli"] + days["trend_milli"]
    ref = days.reset_index(drop=True).astype("int64")
    assert (ref["trend_milli"] < 0).any()  # trunc path exercised
    pd.testing.assert_frame_equal(got, ref)
    assert _tdiv2(-7) == -3 and _tdiv2(7) == 3  # DuckDB // parity


def test_abc_matches_serial(tmp_path):
    rng = np.random.default_rng(23)
    n = 3000
    li = pd.DataFrame(
        {
            "l_partkey": rng.integers(0, 200, n).astype(np.int64),
            # zipf-ish revenue so the A class is a small head
            "l_extendedprice": np.round(rng.pareto(1.5, n) * 100 + 1, 2),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _to_df(q_orders_abc(str(tmp_path))).sort_values("cls").reset_index(drop=True)
    df = li.copy()
    df["rev"] = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    pr = df.groupby("l_partkey", as_index=False)["rev"].sum()
    pr = pr.sort_values(["rev", "l_partkey"], ascending=[False, True])
    tot = int(pr["rev"].sum())
    cum = pr["rev"].cumsum().to_numpy(np.int64)
    cls = np.where(100 * cum <= 80 * tot, "A", np.where(100 * cum <= 95 * tot, "B", "C"))
    ref = (
        pd.DataFrame({"cls": cls, "rev": pr["rev"].to_numpy(np.int64)})
        .groupby("cls", as_index=False)
        .agg(n_parts=("rev", "size"), rev_cents=("rev", "sum"))
        .astype({"n_parts": "int64", "rev_cents": "int64"})
        .sort_values("cls")
        .reset_index(drop=True)
    )
    assert set(ref["cls"]) == {"A", "B", "C"}
    pd.testing.assert_frame_equal(got, ref)
    # the pareto head: A has fewer parts than C but more revenue
    g = got.set_index("cls")
    assert g.loc["A", "n_parts"] < g.loc["C", "n_parts"] or g.loc["A", "rev_cents"] > g.loc["C", "rev_cents"]
