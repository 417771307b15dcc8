"""Session-11 third wave (full outer join / pivot / stable matching):
serial-replay exactness + structural certificates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.pipelines.analytics_extra15 import (
    PIVOT_LANGS,
    _acc_pref,
    _prop_pref,
    q_cust_supplier_match,
    q_customer_orders_full,
    q_docs_source_lang_pivot,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_full_outer_join_exact_with_large_int64():
    # keys above 2^53: any float64 coercion in the merge corrupts them
    big = np.int64(1) << np.int64(60)
    lf = pd.DataFrame(
        {
            "k": np.array([1, 2, 3, big + 7], np.int64),
            "lv": np.array([10, 20, 30, big + 1], np.int64),
        }
    )
    rf = pd.DataFrame(
        {
            "k": np.array([2, 3, 4, big + 9], np.int64),
            "rv": np.array([200, 300, 400, big + 2], np.int64),
        }
    )
    import ray

    out = hash_join(
        ray.data.from_pandas(lf),
        ray.data.from_pandas(rf),
        on="k",
        right_cols=["rv"],
        how="full",
    )
    # assert on the ARROW payload: int64-with-nulls floats out through
    # to_pandas (that loss would be the CALLER's, not the join's)
    tbl = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()]).sort_by("k")
    assert tbl.schema.field("lv").type == pa.int64()
    got = tbl.to_pylist()
    lfI = lf.astype("Int64")
    rfI = rf.astype("Int64")
    ref = (
        lfI.merge(rfI, on="k", how="outer").sort_values("k").reset_index(drop=True)
    )
    assert len(got) == 6  # 2 matched + 2 left-only + 2 right-only
    for grow, (_, rrow) in zip(got, ref.iterrows()):
        for c in ("k", "lv", "rv"):
            g, r = grow[c], rrow[c]
            assert (g is None and pd.isna(r)) or int(g) == int(r), (c, g, r)
    # exactness of the >2^53 values specifically
    row = [r for r in got if r["k"] == big + 7][0]
    assert row["lv"] == big + 1 and row["rv"] is None


def test_full_outer_join_native_rejected():
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    try:
        hash_join(ds, ds.select_columns(["k"]), on="k", how="full", impl="native")
        raise AssertionError("native full join should be rejected")
    except ValueError as e:
        assert "bucketed" in str(e)


def test_pivot_matches_serial(tmp_path):
    rng = np.random.default_rng(51)
    n = 800
    docs = pd.DataFrame(
        {
            "source": rng.choice([f"src{i}" for i in range(7)], n),
            "lang": rng.choice(list(PIVOT_LANGS) + ["en", "en"], n),
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    got = _to_df(q_docs_source_lang_pivot(str(tmp_path)))
    ct = docs.groupby(["source", "lang"]).size().unstack(fill_value=0)
    for lg in PIVOT_LANGS:
        if lg not in ct.columns:
            ct[lg] = 0
    ref = pd.DataFrame({"source": sorted(ct.index)})
    for lg in PIVOT_LANGS:
        ref[f"n_{lg}"] = ct.loc[ref["source"], lg].to_numpy(np.int64)
    pd.testing.assert_frame_equal(got, ref)
    assert (got[[f"n_{lg}" for lg in PIVOT_LANGS]].to_numpy().sum()) == n


def _serial_gale_shapley(prop_ids: np.ndarray, acc_ids: np.ndarray):
    """Sequential proposer-optimal G-S under the hash preferences."""
    A = len(acc_ids)
    pref: dict = {}
    for p in prop_ids:
        h = _prop_pref(np.full(A, p, np.int64), acc_ids)
        pref[p] = [acc_ids[i] for i in np.lexsort((np.arange(A), h))]
    hold: dict = {}
    k = {p: 0 for p in prop_ids}
    free = list(prop_ids)
    while free:
        p = free.pop()
        while k[p] < A:
            a = pref[p][k[p]]
            k[p] += 1
            cur = hold.get(a)
            if cur is None:
                hold[a] = p
                break
            sp = int(_acc_pref(np.array([a]), np.array([p]))[0])
            sc = int(_acc_pref(np.array([a]), np.array([cur]))[0])
            if (sp, p) < (sc, cur):
                hold[a] = p
                free.append(cur)
                break
    return hold


def test_stable_match_serial_replay_and_no_blocking_pair(tmp_path):
    sup = pd.DataFrame({"s_suppkey": np.arange(101, 113, dtype=np.int64), "s_name": "x"})
    cust = pd.DataFrame({"c_custkey": np.arange(501, 540, dtype=np.int64)})
    sup.to_parquet(tmp_path / "supplier.parquet")
    cust.to_parquet(tmp_path / "customer.parquet")

    got = _to_df(q_cust_supplier_match(str(tmp_path)))
    N = 12  # min(|suppliers|, 16)
    assert len(got) == N
    acc_ids = np.sort(sup["s_suppkey"].to_numpy(np.int64))[:N]
    prop_ids = np.sort(cust["c_custkey"].to_numpy(np.int64))[:N]

    hold = _serial_gale_shapley(prop_ids, acc_ids)
    ref = (
        pd.DataFrame(
            {"suppkey": list(hold.keys()), "custkey": list(hold.values())}
        )
        .astype("int64")
        .sort_values("suppkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref)

    # structural certificate: perfect matching, NO blocking pair
    assert got["suppkey"].nunique() == N and got["custkey"].nunique() == N
    match_of_p = {int(r["custkey"]): int(r["suppkey"]) for _, r in got.iterrows()}
    match_of_a = {int(r["suppkey"]): int(r["custkey"]) for _, r in got.iterrows()}
    for p in prop_ids:
        for a in acc_ids:
            mp, ma = match_of_p[int(p)], match_of_a[int(a)]
            if mp == a:
                continue
            # p prefers a over its match AND a prefers p over its match?
            p_pref_a = int(_prop_pref(np.array([p]), np.array([a]))[0])
            p_pref_m = int(_prop_pref(np.array([p]), np.array([mp]))[0])
            a_pref_p = int(_acc_pref(np.array([a]), np.array([p]))[0])
            a_pref_m = int(_acc_pref(np.array([a]), np.array([ma]))[0])
            blocking = ((p_pref_a, a) < (p_pref_m, mp)) and (
                (a_pref_p, int(p)) < (a_pref_m, ma)
            )
            assert not blocking, (p, a)
