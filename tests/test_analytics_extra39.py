"""Session-12 twenty-third wave (median polish / dispersion index):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra39 import (
    POLISH_ROUNDS,
    median_polish_scaled,
    q_events_dispersion_by_type,
    q_orders_median_polish,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_median_polish_identity_and_robustness():
    rng = np.random.default_rng(261)
    nr, nc = 5, 7
    row_t = rng.integers(-50, 50, nr)
    col_t = rng.integers(-40, 40, nc)
    grid = 1000 + row_t[:, None] + col_t[None, :]
    grid[2, 3] += 500  # one gross outlier the polish must absorb in resid
    overall, row, col, resid, scale = median_polish_scaled(grid.astype(np.int64))
    S = 1 << scale
    # exact decomposition identity at the shared scale
    for i in range(nr):
        for j in range(nc):
            assert (
                int(grid[i, j]) * S
                == overall + int(row[i]) + int(col[j]) + int(resid[i, j])
            )
    # robustness: the outlier lands in its residual, others are ~0
    r = np.array([[int(x) for x in rr] for rr in resid], dtype=float) / S
    assert abs(r[2, 3] - 500) < 5
    mask = np.ones_like(r, bool)
    mask[2, 3] = False
    assert np.abs(r[mask]).max() < 5


def test_median_polish_query_identity(tmp_path):
    rng = np.random.default_rng(262)
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(50, dtype=np.int64),
            "c_mktsegment": [["AUTO", "BUILD", "FURN"][i % 3] for i in range(50)],
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": rng.integers(0, 50, 800).astype(np.int64),
            "o_orderdate": pd.to_datetime("1995-06-01")
            + pd.to_timedelta(rng.integers(0, 4 * 365, 800), unit="D"),
            "o_totalprice": rng.uniform(100, 9000, 800),
        }
    )
    cust.to_parquet(tmp_path / "customer.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")

    got = _to_df(q_orders_median_polish(str(tmp_path)))
    # serial replay: rebuild the grid and polish
    seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    df = pd.DataFrame(
        {
            "seg": orders["o_custkey"].map(seg_of),
            "year": orders["o_orderdate"].dt.year,
            "rev": np.floor(orders["o_totalprice"].to_numpy() * 1000 + 0.5).astype(
                np.int64
            ),
        }
    ).groupby(["seg", "year"], as_index=False)["rev"].sum()
    segs = sorted(df["seg"].unique())
    years = sorted(df["year"].unique())
    grid = np.zeros((len(segs), len(years)), np.int64)
    for _, r in df.iterrows():
        grid[segs.index(r["seg"]), years.index(r["year"])] = r["rev"]
    _, _, _, resid, scale = median_polish_scaled(grid)
    ref = {
        (segs[i], years[j], int(grid[i, j])): int(resid[i, j])
        for i in range(len(segs))
        for j in range(len(years))
    }
    assert (got["scale_log2"] == scale).all()
    for _, r in got.iterrows():
        assert ref[(r["segment"], int(r["year"]), int(r["cell_milli"]))] == int(
            r["resid_scaled"]
        )


def test_dispersion_moments_match_bruteforce(tmp_path):
    rng = np.random.default_rng(263)
    n = 900
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, np.int64),
            "ts": pd.to_datetime("2025-06-01")
            + pd.to_timedelta(rng.integers(0, 30, n), unit="D"),
            "event_type": np.array(["click", "view", "purchase", "signup", "error"])[
                rng.integers(0, 5, n)
            ],
            "value": 0.0,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = _to_df(q_events_dispersion_by_type(str(tmp_path))).set_index("event_type")
    per = ev.groupby(["event_type", ev["ts"].dt.normalize()]).size()
    for ty in got.index:
        c = per[ty].to_numpy(np.int64)
        assert got.loc[ty, "n_days"] == len(c)
        assert got.loc[ty, "sum_c"] == c.sum()
        assert got.loc[ty, "sum_c2"] == (c * c).sum()
