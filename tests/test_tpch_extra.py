"""TPC-H-lite batch 2 (Q7/Q10/Q13/Q14/Q15/Q17/Q19): every query agrees
with its DuckDB oracle on an independent synthetic star schema — same
device as test_relstats.test_q6_q18_match_duckdb_on_synthetic, widened
to the full table set (nation/supplier/part included) so the join
chains and the LEFT-join zero bucket are all non-vacuous."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from everythinggraph_ray.pipelines.tpch_extra import (
    TPCH_EXTRA_ORACLES,
    TPCH_EXTRA_QUERIES,
)


def _to_df(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def star(tmp_path_factory):
    """Synthetic star schema: 25 nations, 40 suppliers, 60 customers
    (10 with NO orders -> exercises Q13's zero bucket), 300 parts,
    250 orders, 5000 lineitems spanning 1995-2000."""
    rng = np.random.default_rng(7)
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(25, dtype=np.int64),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int64),
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.arange(40, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(40)],
            "s_nationkey": rng.integers(0, 25, 40).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-900, 9000, 40), 2),
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": np.arange(60, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(60)],
            "c_nationkey": rng.integers(0, 25, 60).astype(np.int32),
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(300, dtype=np.int64),
            "p_brand": [f"Brand#{1 + i % 25}" for i in range(300)],
            "p_type": [
                ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"][i % 6]
                for i in range(300)
            ],
            "p_size": rng.integers(1, 51, 300).astype(np.int32),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(250, dtype=np.int64),
            # only customers 0..49 order: 50..59 hit Q13's zero bucket
            "o_custkey": rng.integers(0, 50, 250).astype(np.int64),
            "o_orderdate": pd.to_datetime(
                rng.integers(0, 5 * 365, 250), unit="D", origin="1995-06-01"
            ),
        }
    )
    n = 5000
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 250, n).astype(np.int64),
            "l_partkey": rng.integers(0, 300, n).astype(np.int64),
            "l_suppkey": rng.integers(0, 40, n).astype(np.int64),
            "l_quantity": rng.integers(1, 51, n).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(100, 90000, n), 2),
            "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
            "l_returnflag": rng.choice(["N", "A", "R"], n),
            "l_shipdate": pd.to_datetime(
                rng.integers(0, 5 * 365, n), unit="D", origin="1995-06-01"
            ),
        }
    )
    d = tmp_path_factory.mktemp("tpch_star")
    tables = {
        "nation": nation,
        "supplier": supplier,
        "customer": customer,
        "part": part,
        "orders": orders,
        "lineitem": li,
    }
    for name, df in tables.items():
        df.to_parquet(d / f"{name}.parquet")
    return str(d), tables


@pytest.mark.parametrize("name", sorted(TPCH_EXTRA_QUERIES))
def test_matches_duckdb_oracle(star, name):
    duckdb = pytest.importorskip("duckdb")
    d, tables = star
    con = duckdb.connect()
    for t, df in tables.items():
        con.register(t, df)
    got = _canon(_to_df(TPCH_EXTRA_QUERIES[name](d)))
    exp = _canon(con.execute(TPCH_EXTRA_ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp) > 0, f"{name}: vacuous fixture"
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert np.allclose(got[c].to_numpy(), exp[c].to_numpy(), rtol=0, atol=0), c
        else:
            assert got[c].tolist() == exp[c].tolist(), c


def test_q13_zero_bucket_present(star):
    """Customers 50..59 place no orders — the LEFT-join zero bucket must
    surface with custdist == 10."""
    d, _ = star
    got = _to_df(TPCH_EXTRA_QUERIES["q13_order_distribution"](d))
    zero = got[got["c_count"] == 0]
    assert len(zero) == 1 and int(zero["custdist"].iloc[0]) == 10


def test_q17_gate_is_strict_cross_multiply(star):
    """The qualifying set equals the serial pandas replay of
    5*qi*n < sum_qi (strict) over the brand's lineitems."""
    d, tables = star
    li, part = tables["lineitem"], tables["part"]
    bp = set(part.loc[part["p_brand"] == "Brand#3", "p_partkey"])
    b = li[li["l_partkey"].isin(bp)].copy()
    b["qi"] = np.rint(b["l_quantity"]).astype(np.int64)
    b["price_c"] = np.floor(b["l_extendedprice"] * 100 + 0.5).astype(np.int64)
    agg = b.groupby("l_partkey")["qi"].agg(["sum", "count"])
    m = b.merge(agg, left_on="l_partkey", right_index=True)
    qual = m[5 * m["qi"] * m["count"] < m["sum"]]
    got = _to_df(TPCH_EXTRA_QUERIES["q17_small_qty"](d))
    assert int(got["n_items"].iloc[0]) == len(qual) > 0
    assert int(got["rev_c"].iloc[0]) == int(qual["price_c"].sum())
