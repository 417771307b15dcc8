"""Session-10 third wave (1-NN join / association metrics / rank family
/ RFM): serial-replay exactness on synthetic fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra10 import (
    q_copurchase_lift,
    q_customer_rfm,
    q_emb_nn1,
    q_lineitem_qty_rank,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_nn1_matches_serial(tmp_path):
    rng = np.random.default_rng(6)
    n = 80
    vecs = rng.normal(0, 1, (n, 12)).astype(np.float32)
    ids = (np.arange(n, dtype=np.int64) * 7 + 3)  # non-contiguous ids
    pd.DataFrame(
        {"vec_id": ids, "embedding": [v.tolist() for v in vecs], "label": 0}
    ).to_parquet(tmp_path / "embeddings.parquet")
    got = (
        _to_df(q_emb_nn1(str(tmp_path))).sort_values("vec_id").reset_index(drop=True)
    )
    v = vecs.astype(np.float64)
    nm = v / np.linalg.norm(v, axis=1, keepdims=True)
    order = np.argsort(ids)
    sids, smat = ids[order], nm[order]
    milli = np.floor(nm @ smat.T * 1000.0).astype(np.int64)
    rows = []
    for i in range(n):
        m = milli[i].copy()
        m[sids == ids[i]] = np.iinfo(np.int64).min
        best = m.max()
        nn = sids[m == best].min()
        rows.append({"vec_id": ids[i], "nn_id": nn, "sim_milli": best})
    ref = (
        pd.DataFrame(rows).sort_values("vec_id").reset_index(drop=True).astype("int64")
    )
    pd.testing.assert_frame_equal(got, ref)


def test_copurchase_lift_matches_serial(tmp_path):
    rng = np.random.default_rng(7)
    n = 1500
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 300, n).astype(np.int64),
            "l_partkey": rng.integers(0, 40, n).astype(np.int64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = (
        _to_df(q_copurchase_lift(str(tmp_path)))
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    d = li.drop_duplicates()
    n_orders = d["l_orderkey"].nunique()
    pc_ = d.groupby("l_partkey").size()
    m = d.merge(d, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    cnt = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    rows = []
    for (a, b), c in cnt.items():
        if c < 2:  # COPURCHASE_MINSUP
            continue
        na, nb = int(pc_[a]), int(pc_[b])
        rows.append(
            {
                "a": a,
                "b": b,
                "cnt": int(c),
                "n_a": na,
                "n_b": nb,
                "conf_ab_ppm": 1_000_000 * int(c) // na,
                "conf_ba_ppm": 1_000_000 * int(c) // nb,
                "lift_ppm": 1_000_000 * int(c) * n_orders // (na * nb),
            }
        )
    ref = (
        pd.DataFrame(rows).sort_values(["a", "b"]).reset_index(drop=True).astype("int64")
    )
    assert len(ref) > 20
    pd.testing.assert_frame_equal(got, ref)
    # lift sanity: a pair occurring as often as independence predicts ≈ 1e6
    assert (got["lift_ppm"] > 0).all()


def test_qty_rank_matches_serial(tmp_path):
    rng = np.random.default_rng(8)
    n = 2000
    li = pd.DataFrame(
        {
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_quantity": rng.integers(1, 20, n).astype(float),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = (
        _to_df(q_lineitem_qty_rank(str(tmp_path)))
        .sort_values(["l_returnflag", "qty"])
        .reset_index(drop=True)
    )
    rows = []
    for f, grp in li.groupby("l_returnflag"):
        qs = np.round(grp["l_quantity"].to_numpy()).astype(np.int64)
        vals, cnts = np.unique(qs, return_counts=True)
        total = int(cnts.sum())
        before = np.concatenate([[0], cnts.cumsum()[:-1]])
        for i, (v, c) in enumerate(zip(vals, cnts)):
            rows.append(
                {
                    "l_returnflag": f,
                    "qty": int(v),
                    "n": int(c),
                    "rank": int(before[i]) + 1,
                    "dense_rank": i + 1,
                    "percent_rank_ppm": 1_000_000 * int(before[i]) // max(total - 1, 1),
                }
            )
    ref = pd.DataFrame(rows).astype(
        {"qty": "int64", "n": "int64", "rank": "int64", "dense_rank": "int64", "percent_rank_ppm": "int64"}
    )
    pd.testing.assert_frame_equal(got, ref)


def test_rfm_matches_serial(tmp_path):
    rng = np.random.default_rng(9)
    n = 600
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.integers(0, 70, n).astype(np.int64),
            "o_totalprice": np.round(rng.uniform(10, 50000, n), 2),
            "o_orderdate": pd.to_datetime("2021-01-01")
            + pd.to_timedelta(rng.integers(0, 700, n), unit="D"),
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")
    got = (
        _to_df(q_customer_rfm(str(tmp_path)))
        .sort_values(["r_tile", "f_tile", "m_tile"])
        .reset_index(drop=True)
    )
    df = orders.copy()
    df["day"] = df["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
    df["spend_c"] = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    m = df.groupby("o_custkey", as_index=False).agg(
        recency_day=("day", "max"), freq=("day", "size"), monetary_c=("spend_c", "sum")
    )
    nc = len(m)

    def tile(col):
        rn = (
            m.sort_values([col, "o_custkey"])
            .reset_index()
            .sort_values("index")
            .index.to_numpy()
        )
        # rn above is wrong orientation; compute row_number directly:
        order = np.lexsort((m["o_custkey"].to_numpy(), m[col].to_numpy()))
        r = np.empty(nc, np.int64)
        r[order] = np.arange(1, nc + 1)
        return (5 * r + nc - 1) // nc

    m["r_tile"], m["f_tile"], m["m_tile"] = (
        tile("recency_day"),
        tile("freq"),
        tile("monetary_c"),
    )
    ref = (
        m.groupby(["r_tile", "f_tile", "m_tile"], as_index=False)
        .size()
        .rename(columns={"size": "n_customers"})
        .astype("int64")
        .sort_values(["r_tile", "f_tile", "m_tile"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)
    assert int(got["n_customers"].sum()) == nc
    # quintiles are balanced within +-1 of n/5 per axis
    per_r = got.groupby("r_tile")["n_customers"].sum()
    assert per_r.max() - per_r.min() <= 1
