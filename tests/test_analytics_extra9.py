"""Session-10 second wave (prefix scan / string_agg / OLS slope):
serial-replay exactness on synthetic fixtures, plus bucket-count
invariance of the running_sum primitive."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from everythinggraph_ray.pipelines.analytics_extra9 import (
    q_customer_running_spend,
    q_docs_lang_source_agg,
    q_lineitem_price_slope,
    q_orders_running_revenue,
)
from everythinggraph_ray.stages.agg import running_sum


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("rb,nb", [(2, 4), (16, 8), (5, 3)])
def test_running_sum_global_matches_pandas(rb, nb):
    rng = np.random.default_rng(rb * 100 + nb)
    n = 700
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50, n).astype(np.int64),  # heavy order-key ties
            "tb": rng.permutation(n).astype(np.int64),  # unique tiebreak
            "v": rng.integers(-20, 100, n).astype(np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got = (
        _to_df(running_sum(ds, "k", "tb", "v", num_range_buckets=rb, num_buckets=nb))
        .sort_values(["k", "tb"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "tb"]).reset_index(drop=True)
    ref["running"] = ref["v"].cumsum()
    pd.testing.assert_frame_equal(got[["k", "tb", "v", "running"]], ref)


def test_running_sum_grouped_matches_pandas():
    rng = np.random.default_rng(9)
    n = 900
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 12, n).astype(np.int64),
            "k": rng.integers(0, 30, n).astype(np.int64),
            "tb": rng.permutation(n).astype(np.int64),
            "v": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        _to_df(
            running_sum(
                ds, "k", "tb", "v", group_col="g", num_range_buckets=4, num_buckets=6
            )
        )
        .sort_values(["g", "k", "tb"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["g", "k", "tb"]).reset_index(drop=True)
    ref["running"] = ref.groupby("g")["v"].cumsum()
    pd.testing.assert_frame_equal(got[["g", "k", "tb", "v", "running"]], ref)


def test_orders_running_revenue_matches_pandas(tmp_path):
    rng = np.random.default_rng(2)
    n = 400
    orders = pd.DataFrame(
        {
            "o_orderkey": rng.permutation(10_000)[:n].astype(np.int64),
            "o_custkey": rng.integers(0, 40, n).astype(np.int64),
            "o_totalprice": np.round(rng.uniform(100, 200000, n), 2),
            "o_orderdate": pd.to_datetime("2019-01-01")
            + pd.to_timedelta(rng.integers(0, 900, n), unit="D"),
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")
    got = (
        _to_df(q_orders_running_revenue(str(tmp_path)))
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    ref = orders.sort_values("o_orderkey").reset_index(drop=True)
    ref["run_revenue_c"] = (
        np.floor(ref["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64).cumsum()
    )
    pd.testing.assert_frame_equal(
        got, ref[["o_orderkey", "run_revenue_c"]].astype("int64")
    )


def test_customer_running_spend_matches_pandas(tmp_path):
    rng = np.random.default_rng(3)
    n = 500
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.integers(0, 25, n).astype(np.int64),
            "o_totalprice": np.round(rng.uniform(10, 9000, n), 2),
            "o_orderdate": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(rng.integers(0, 100, n), unit="D"),  # many same-day ties
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")
    got = (
        _to_df(q_customer_running_spend(str(tmp_path)))
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    ref = orders.copy()
    ref["day"] = ref["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
    ref["spend_c"] = np.floor(ref["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        np.int64
    )
    ref = ref.sort_values(["o_custkey", "day", "o_orderkey"])
    ref["run_spend_c"] = ref.groupby("o_custkey")["spend_c"].cumsum()
    ref = ref.sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, ref[["o_orderkey", "o_custkey", "run_spend_c"]].astype("int64")
    )


def test_lang_source_agg_matches_pandas(tmp_path):
    rng = np.random.default_rng(4)
    n = 300
    pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["x"] * n,
            "lang": rng.choice(["en", "de", "fr", "es"], n),
            "source": rng.choice([f"src{i}" for i in range(6)], n),
            "n_chars": np.ones(n, np.int64),
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = _to_df(q_docs_lang_source_agg(str(tmp_path))).sort_values("lang").reset_index(drop=True)
    df = pd.read_parquet(tmp_path / "documents.parquet")
    ref = (
        df.drop_duplicates(["lang", "source"])
        .sort_values(["lang", "source"])
        .groupby("lang", as_index=False)
        .agg(sources=("source", ",".join), n_sources=("source", "size"))
        .astype({"n_sources": "int64"})
    )
    pd.testing.assert_frame_equal(got, ref)


def test_price_slope_matches_serial(tmp_path):
    rng = np.random.default_rng(5)
    n = 2000
    li = pd.DataFrame(
        {
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_quantity": rng.integers(1, 50, n).astype(float),
            "l_extendedprice": np.round(rng.uniform(900, 100000, n), 2),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = (
        _to_df(q_lineitem_price_slope(str(tmp_path)))
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    x = np.round(li["l_quantity"].to_numpy()).astype(np.int64)
    y = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    rows = []
    for f in sorted(li["l_returnflag"].unique()):
        m = (li["l_returnflag"] == f).to_numpy()
        nn, sx, sy = int(m.sum()), int(x[m].sum()), int(y[m].sum())
        sxy, sxx = int((x[m] * y[m]).sum()), int((x[m] * x[m]).sum())
        den = nn * sxx - sx * sx
        slope = round(float(nn * sxy - sx * sy) / float(den), 7) if den else 0.0
        rows.append(
            {"l_returnflag": f, "n": nn, "sx": sx, "sy": sy, "sxy": sxy, "sxx": sxx, "slope": slope}
        )
    ref = pd.DataFrame(rows).astype(
        {"n": "int64", "sx": "int64", "sy": "int64", "sxy": "int64", "sxx": "int64"}
    )
    pd.testing.assert_frame_equal(got, ref)
