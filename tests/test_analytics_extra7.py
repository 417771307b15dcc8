"""Session-9 fifth wave (Q11-lite / JDM / customer Gini / power-law
alpha / Theil): serial-replay exactness on synthetic fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from everythinggraph_ray.pipelines.analytics_extra7 import (
    LOG_SCALE,
    q_events_powerlaw_alpha,
    q_lineitem_theil,
    q_orders_customer_gini,
    q_q11_part_value,
    q_rel_jdm,
)


def _to_df(res):
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_q11_matches_pandas(tmp_path):
    rng = np.random.default_rng(91)
    li = pd.DataFrame(
        {
            "l_partkey": rng.integers(1, 50, 1200).astype(np.int64),
            "l_extendedprice": np.round(rng.uniform(100, 9000, 1200), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, 1200), 2),
        }
    )
    # plant a dominant part so the gate keeps at least one
    li.loc[:40, "l_partkey"] = 7
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _to_df(q_q11_part_value(str(tmp_path)))
    v = np.floor(
        li["l_extendedprice"].to_numpy() * (1 - li["l_discount"].to_numpy()) * 100 + 0.5
    ).astype(np.int64)
    pv = pd.DataFrame({"partkey": li["l_partkey"], "value_c": v}).groupby(
        "partkey", as_index=False
    )["value_c"].sum()
    n, total = len(pv), int(pv["value_c"].sum())
    ref = (
        pv[2 * n * pv["value_c"] > 3 * total]
        .sort_values("partkey")
        .reset_index(drop=True)
        .astype("int64")
    )
    assert len(ref) >= 1
    pd.testing.assert_frame_equal(got, ref)


def test_jdm_matches_serial(tmp_path):
    rng = np.random.default_rng(47)
    src = rng.integers(0, 90, 400).astype(np.int64)
    dst = rng.integers(0, 90, 400).astype(np.int64)
    pd.DataFrame({"l_orderkey": src, "l_partkey": dst}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got = _to_df(q_rel_jdm(str(tmp_path)))
    a, b = np.minimum(src, dst), np.maximum(src, dst)
    m = a != b
    e = sorted(set(zip(a[m], b[m])))
    deg = {}
    for x, y in e:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    rows = {}
    for x, y in e:
        cx = int(np.floor(np.log2(deg[x]))) + 1
        cy = int(np.floor(np.log2(deg[y]))) + 1
        k = (min(cx, cy), max(cx, cy))
        rows[k] = rows.get(k, 0) + 1
    ref = pd.DataFrame(
        [{"class_lo": lo, "class_hi": hi, "n_edges": n} for (lo, hi), n in sorted(rows.items())]
    ).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    assert int(got["n_edges"].sum()) == len(e)


def test_customer_gini_matches_serial(tmp_path):
    rng = np.random.default_rng(53)
    orders = pd.DataFrame(
        {
            "o_custkey": rng.integers(1, 40, 600).astype(np.int64),
            "o_totalprice": np.round(rng.lognormal(6, 1, 600), 2),
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")
    got = _to_df(q_orders_customer_gini(str(tmp_path)))
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    s = (
        pd.DataFrame({"c": orders["o_custkey"], "x": cents})
        .groupby("c", as_index=False)["x"]
        .sum()
        .sort_values(["x", "c"])
        .reset_index(drop=True)
    )
    n = len(s)
    x = s["x"].to_numpy(np.int64)
    r = np.arange(1, n + 1, dtype=np.int64)
    gini = (2 * int((r * x).sum()) - (n + 1) * int(x.sum())) * 1_000_000 // (n * int(x.sum()))
    assert int(got.loc[0, "n_customers"]) == n
    assert int(got.loc[0, "total_spend_c"]) == int(x.sum())
    assert int(got.loc[0, "gini_ppm"]) == gini
    assert 0 <= gini < 1_000_000


def test_powerlaw_alpha_matches_serial(tmp_path):
    rng = np.random.default_rng(59)
    # heavy-tailed activity: Zipfian user draws
    p = 1.0 / np.arange(1, 81)
    p /= p.sum()
    uid = rng.choice(np.arange(80, dtype=np.int64), 5000, p=p)
    pd.DataFrame({"user_id": uid}).to_parquet(tmp_path / "events.parquet")
    got = _to_df(q_events_powerlaw_alpha(str(tmp_path)))
    x = np.unique(uid, return_counts=True)[1].astype(np.int64)
    q = np.floor(np.log(2 * x.astype(np.float64)) * LOG_SCALE).astype(np.int64)
    n, sq = len(x), int(q.sum())
    assert int(got.loc[0, "n_users"]) == n
    assert int(got.loc[0, "sum_qlog"]) == sq
    assert float(got.loc[0, "alpha"]) == round(1.0 + float(n) * LOG_SCALE / float(sq), 7)
    assert 1.0 < float(got.loc[0, "alpha"]) < 4.0


def test_theil_matches_serial(tmp_path):
    rng = np.random.default_rng(67)
    li = pd.DataFrame(
        {
            "l_extendedprice": np.round(rng.lognormal(7, 0.8, 800), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, 800), 2),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _to_df(q_lineitem_theil(str(tmp_path)))
    x = np.floor(
        li["l_extendedprice"].to_numpy() * (1 - li["l_discount"].to_numpy()) * 100 + 0.5
    ).astype(np.int64)
    x = x[x > 0]
    q = np.floor(np.log(x.astype(np.float64)) * LOG_SCALE).astype(np.int64)
    n, sx, sxq = len(x), int(x.sum()), int((x * q).sum())
    theil = round(float(sxq) / (LOG_SCALE * float(sx)) - float(np.log(float(sx) / n)), 7)
    assert int(got.loc[0, "n_lines"]) == n
    assert int(got.loc[0, "total_c"]) == sx
    assert int(got.loc[0, "sum_xlog"]) == sxq
    assert float(got.loc[0, "theil"]) == theil
    # lognormal revenue is unequal: T strictly positive
    assert theil > 0
