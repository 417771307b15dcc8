"""Session-12 eleventh wave (CEP pattern / calendar proration):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra27 import (
    CEP_MIN_VIEWS,
    q_events_cep_views_purchase,
    q_orders_prorate_monthly,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_cep_matches_handcrafted_and_serial(tmp_path):
    # user 1: v v p        -> match (2 views)
    # user 2: v p          -> no (1 view)
    # user 3: v v v p      -> match (3 views, maximal run)
    # user 4: v v c p      -> no (click breaks adjacency)
    # user 5: v v p v v p  -> two matches
    seq = [
        (1, "view"), (1, "view"), (1, "purchase"),
        (2, "view"), (2, "purchase"),
        (3, "view"), (3, "view"), (3, "view"), (3, "purchase"),
        (4, "view"), (4, "view"), (4, "click"), (4, "purchase"),
        (5, "view"), (5, "view"), (5, "purchase"),
        (5, "view"), (5, "view"), (5, "purchase"),
    ]
    base = pd.Timestamp("2024-11-01")
    ev = pd.DataFrame(
        {
            "event_id": np.arange(len(seq), dtype=np.int64),
            "user_id": np.array([u for u, _ in seq], np.int64),
            "ts": [base + pd.Timedelta(seconds=i) for i in range(len(seq))],
            "event_type": [t for _, t in seq],
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_cep_views_purchase(str(tmp_path)))
        .sort_values(["user_id", "first_view_id"])
        .reset_index(drop=True)
    )
    ref = pd.DataFrame(
        {
            "user_id": [1, 3, 5, 5],
            "first_view_id": [0, 5, 13, 16],
            "purchase_id": [2, 8, 15, 18],
            "n_views": [2, 3, 2, 2],
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    assert (got["n_views"] >= CEP_MIN_VIEWS).all()


def test_prorate_conserves_and_matches_serial(tmp_path):
    rng = np.random.default_rng(171)
    n = 120
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n + 1, dtype=np.int64),
            "o_orderdate": pd.to_datetime("1996-01-15")
            + pd.to_timedelta(rng.integers(0, 500, n), unit="D"),
            "o_totalprice": rng.uniform(100, 100000, n),
        }
    )
    # 1-4 lineitems per order, shipped 0..200 days after order
    rows = []
    for _, o in orders.iterrows():
        for _ in range(rng.integers(1, 5)):
            rows.append(
                (
                    o["o_orderkey"],
                    o["o_orderdate"] + pd.Timedelta(days=int(rng.integers(0, 200))),
                )
            )
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_shipdate"])
    orders.to_parquet(tmp_path / "orders.parquet")
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_orders_prorate_monthly(str(tmp_path)))

    # conservation: per order the allocations sum to the exact total
    rev = {
        int(k): int(np.floor(v * 1000 + 0.5))
        for k, v in zip(orders["o_orderkey"], orders["o_totalprice"])
    }
    sums = got.groupby("orderkey")["alloc_milli"].sum()
    for k, s in sums.items():
        assert s == rev[int(k)], k

    # serial replay on one order with a known span
    k0 = int(orders["o_orderkey"].iloc[0])
    sd = orders["o_orderdate"].iloc[0].normalize()
    ed = max(
        li[li["l_orderkey"] == k0]["l_shipdate"].max().normalize(), sd
    )
    months = pd.period_range(sd, ed, freq="M")
    days = []
    for m in months:
        a = max(m.start_time.normalize(), sd)
        b = min(m.end_time.normalize(), ed)
        days.append((b - a).days + 1)
    tot = sum(days)
    assert tot == (ed - sd).days + 1
    r = rev[k0]
    fl = [r * d // tot for d in days]
    rem = [r * d - f * tot for d, f in zip(days, fl)]
    leftover = r - sum(fl)
    bonus_ix = sorted(range(len(months)), key=lambda i: (-rem[i], i))[:leftover]
    ref = {
        int(str(m).replace("-", "")): f + (i in bonus_ix)
        for i, (m, f) in enumerate(zip(months, fl))
    }
    sub = got[got["orderkey"] == k0].set_index("month_ym")["alloc_milli"].to_dict()
    assert sub == ref
    # multi-month spans actually occur
    assert got.groupby("orderkey").size().max() >= 3
