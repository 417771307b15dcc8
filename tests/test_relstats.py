"""Round-3 relational/graph statistics: modularity, average neighbour
degree, event-type transitions, and the Q6/Q18 TPC-H-lite shapes — each
validated against an independent serial oracle on synthetic fixtures
(the driver's DuckDB sweep covers them again at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _lineitem_dir(tmp_path, pairs, name="sf"):
    d = tmp_path / name
    d.mkdir()
    pd.DataFrame(
        {
            "l_orderkey": np.array([a for a, _ in pairs], np.int64),
            "l_partkey": np.array([b for _, b in pairs], np.int64),
        }
    ).to_parquet(d / "lineitem.parquet")
    return str(d)


def test_modularity_two_cliques(tmp_path):
    """Two disjoint 8-cliques: WCC finds both, and the exact integer
    modularity matches the closed form for an equal split
    (Q = 1/2 - 2·(1/4) ... computed serially below)."""
    from everythinggraph_ray.pipelines.queries import q_rel_modularity

    k = 8
    a = [(i, j) for i in range(k) for j in range(k) if i != j]
    b = [(500 + i, 500 + j) for i in range(k) for j in range(k) if i != j]
    res = q_rel_modularity(_lineitem_dir(tmp_path, a + b)).to_pandas()

    # serial oracle: und = distinct non-loop pairs both directions
    edges = set()
    for s, dd in a + b:
        edges.add((s, dd))
        edges.add((dd, s))
    m2 = len(edges)
    comp_of = lambda v: 0 if v < 100 else 1
    r = [0, 0]
    for u, _ in edges:
        r[comp_of(u)] += 1
    num = sum(m2 * rc - rc * rc for rc in r)
    assert int(res["mod_num"].iloc[0]) == num
    assert int(res["mod_den"].iloc[0]) == m2 * m2
    # equal halves → Q = 1/2 exactly; and it must be > 0 (non-degenerate)
    assert num * 2 == m2 * m2


def test_avg_nbr_degree_matches_serial(tmp_path):
    """Per-src neighbour-outdegree sums equal a pandas merge on a small
    random multigraph (duplicate edges count with multiplicity)."""
    from everythinggraph_ray.pipelines.queries import q_rel_avg_nbr_degree

    rng = np.random.default_rng(7)
    s = rng.integers(0, 40, 300)
    d = rng.integers(0, 40, 300)
    res = (
        q_rel_avg_nbr_degree(_lineitem_dir(tmp_path, list(zip(s.tolist(), d.tolist()))))
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )

    e = pd.DataFrame({"src": s, "dst": d})
    od = e.groupby("src").size()
    deg_of = lambda v: int(od.get(v, 0))
    e["nbr"] = e["dst"].map(deg_of)
    exp = (
        e.groupby("src")
        .agg(nbr_outdeg_sum=("nbr", "sum"), n_out=("nbr", "size"))
        .reset_index()
        .rename(columns={"src": "vid"})
        .sort_values("vid")
        .reset_index(drop=True)
    )
    assert res["vid"].tolist() == exp["vid"].tolist()
    assert res["nbr_outdeg_sum"].tolist() == exp["nbr_outdeg_sum"].tolist()
    assert res["n_out"].tolist() == exp["n_out"].tolist()


def test_events_transitions_matches_serial(tmp_path):
    """Markov transition counts equal the pandas lag() computation,
    including same-ts ties broken by event_id and single-event users
    contributing nothing."""
    from everythinggraph_ray.pipelines.queries import q_events_transitions

    rng = np.random.default_rng(3)
    n = 400
    types = np.array(["view", "click", "purchase"])
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 25, n).astype(np.int64),
            # coarse ts so same-user ties happen and event_id must break them
            "ts": pd.to_datetime(rng.integers(0, 50, n), unit="h", origin="2024-01-01"),
            "event_type": types[rng.integers(0, 3, n)],
            "value": np.zeros(n),
            "props": ["{}"] * n,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    ev.to_parquet(d / "events.parquet")

    res = (
        q_events_transitions(str(d))
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )

    s = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    prev = s.groupby("user_id")["event_type"].shift(1)
    keep = prev.notna()
    exp = (
        pd.DataFrame({"prev_type": prev[keep], "next_type": s["event_type"][keep]})
        .groupby(["prev_type", "next_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    assert res["prev_type"].tolist() == exp["prev_type"].tolist()
    assert res["next_type"].tolist() == exp["next_type"].tolist()
    assert res["n"].tolist() == exp["n"].tolist()


def test_q6_q18_match_duckdb_on_synthetic(tmp_path):
    """Q6 (pushed-down filter + exact cents) and Q18 (HAVING + join-back)
    agree with their SQL oracles on an independent synthetic fixture."""
    duckdb = pytest.importorskip("duckdb")

    from everythinggraph_ray.pipelines.queries import (
        ORACLES,
        q_q6_revenue,
        q_q18_big_orders,
    )

    rng = np.random.default_rng(11)
    n = 2000
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 150, n).astype(np.int64),
            "l_partkey": rng.integers(0, 400, n).astype(np.int64),
            "l_quantity": rng.integers(1, 51, n).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(100, 90000, n), 2),
            "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
            "l_shipdate": pd.to_datetime(
                rng.integers(0, 4 * 365, n), unit="D", origin="1994-06-01"
            ),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(150, dtype=np.int64),
            "o_custkey": rng.integers(0, 30, 150).astype(np.int64),
            "o_totalprice": np.round(rng.uniform(1000, 500000, 150), 2),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(30, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(30)],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet")
    orders.to_parquet(d / "orders.parquet")
    cust.to_parquet(d / "customer.parquet")

    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("orders", orders)
    con.register("customer", cust)

    got6 = q_q6_revenue(str(d)).to_pandas()
    exp6 = con.execute(ORACLES["q6_revenue"]).df()
    assert int(got6["revenue_c4"].iloc[0]) == int(exp6["revenue_c4"].iloc[0])
    assert int(got6["n_items"].iloc[0]) == int(exp6["n_items"].iloc[0])
    assert int(got6["n_items"].iloc[0]) > 0  # the filter kept something

    got18 = (
        q_q18_big_orders(str(d))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    exp18 = (
        con.execute(ORACLES["q18_big_orders"]).df().sort_values("o_orderkey").reset_index(drop=True)
    )
    assert len(got18) == len(exp18) > 0
    for c in ["o_orderkey", "total_qty", "c_name", "o_totalprice_c"]:
        assert got18[c].tolist() == exp18[c].tolist()


def test_grouped_row_number_matches_sql_semantics():
    """grouped_row_number == pandas ROW_NUMBER/NTILE on heavy-tie data
    (ties exercise the equal-values-co-locate range-bucket contract),
    including groups smaller than the tile count."""
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.stages.agg import grouped_row_number

    rng = np.random.default_rng(5)
    n = 1200
    g = np.array(["a", "b", "c", "tiny"])[
        np.minimum(rng.integers(0, 4, n), np.where(np.arange(n) < 3, 3, 2))
    ]
    # only 7 distinct values → massive ties; ids unique
    v = rng.integers(0, 7, n).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"grp": pa.array(g), "val": pa.array(v), "id": pa.array(ids)})
    )
    got = (
        grouped_row_number(
            ds, "grp", "val", "id", ascending=False, ntile=5, num_range_buckets=4
        )
        .to_pandas()
        .sort_values(["grp", "rn"])
        .reset_index(drop=True)
    )

    df = pd.DataFrame({"grp": g, "val": v, "id": ids}).sort_values(
        ["grp", "val", "id"], ascending=[True, False, True], kind="stable"
    )
    df["rn"] = df.groupby("grp", sort=False).cumcount() + 1
    n_g = df.groupby("grp")["rn"].transform("max").to_numpy()
    rn = df["rn"].to_numpy()
    q, r = n_g // 5, n_g % 5
    big = r * (q + 1)
    df["tile"] = np.where(
        rn <= big, (rn - 1) // np.maximum(q + 1, 1), r + (rn - 1 - big) // np.maximum(q, 1)
    ) + 1
    exp = df.sort_values(["grp", "rn"]).reset_index(drop=True)
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["rn"].tolist() == exp["rn"].tolist()
    assert got["tile"].tolist() == exp["tile"].tolist()


def test_grouped_row_number_ungrouped_ascending():
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.stages.agg import grouped_row_number

    rng = np.random.default_rng(9)
    v = rng.integers(0, 1000, 500).astype(np.int64)
    ids = np.arange(500, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"val": pa.array(v), "id": pa.array(ids)}))
    got = grouped_row_number(ds, None, "val", "id").to_pandas().sort_values("rn")
    exp = pd.DataFrame({"val": v, "id": ids}).sort_values(["val", "id"], kind="stable")
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["rn"].tolist() == list(range(1, 501))


def test_docs_rank_corr_matches_serial(tmp_path):
    """Spearman Σd² building blocks equal the serial pandas computation
    (row_number ranks, doc_id tiebreak) on a synthetic corpus."""
    from everythinggraph_ray.datapipe.text import quality_values
    from everythinggraph_ray.pipelines.queries import q_docs_rank_corr

    rng = np.random.default_rng(17)
    n = 600
    langs = np.array(["en", "fr", "de"])[rng.integers(0, 3, n)]
    texts = [
        " ".join(rng.choice(["the", "and", "data", "graph", "sort.", "x,"], size=rng.integers(3, 40)))
        for _ in range(n)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": ["s"] * n,
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")

    got = (
        q_docs_rank_corr(str(d)).to_pandas().sort_values("lang").reset_index(drop=True)
    )

    import pyarrow as pa

    q = quality_values(pa.array(texts), rounded=False)
    docs["qint"] = np.floor(q * 1e8 + 0.5).astype(np.int64)
    s = docs.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True], kind="stable")
    s["rn1"] = s.groupby("lang", sort=False).cumcount() + 1
    s = s.sort_values(["lang", "qint", "doc_id"], ascending=[True, False, True], kind="stable")
    s["rn2"] = s.groupby("lang", sort=False).cumcount() + 1
    dd = s["rn1"] - s["rn2"]
    exp = (
        pd.DataFrame({"lang": s["lang"], "d2": dd * dd, "one": 1})
        .groupby("lang", as_index=False)
        .agg(sum_d2=("d2", "sum"), n=("one", "sum"))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    assert got["lang"].tolist() == exp["lang"].tolist()
    assert got["sum_d2"].tolist() == exp["sum_d2"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    # derived rho stays in [-1, 1]
    for _, row in got.iterrows():
        nn = row["n"]
        if nn > 1:
            rho = 1 - 6 * row["sum_d2"] / (nn * (nn * nn - 1))
            assert -1.0 <= rho <= 1.0


def test_ddsketch_quantiles_error_bound_and_invariance():
    """DDSketch quantiles: within relative error alpha of the exact
    order statistic (quantile_disc convention), invariant to
    partitioning, correct on zero/negative values."""
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.datapipe.sketch import ddsketch_quantiles

    rng = np.random.default_rng(23)
    n = 20000
    g = np.array(["a", "b"])[rng.integers(0, 2, n)]
    # heavy-tailed positives + some zeros and negatives in group b
    v = np.exp(rng.normal(2.0, 1.5, n))
    v[(g == "b") & (np.arange(n) % 17 == 0)] = 0.0
    v[(g == "b") & (np.arange(n) % 23 == 0)] *= -1.0
    ds = ray.data.from_arrow(pa.table({"grp": pa.array(g), "value": pa.array(v)}))

    qs = [0.5, 0.95, 0.99]
    alpha = 0.01
    res = (
        ddsketch_quantiles(ds, "value", qs, alpha=alpha, group_col="grp")
        .to_pandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    assert res["grp"].tolist() == ["a", "b"]
    for gi, gname in enumerate(["a", "b"]):
        vals = np.sort(v[g == gname])
        for q, col in zip(qs, ["p50", "p95", "p99"]):
            exact = vals[max(int(np.ceil(q * len(vals))), 1) - 1]
            got = res[col].iloc[gi]
            if exact == 0.0:
                assert got == 0.0
            else:
                assert abs(got - exact) <= alpha * abs(exact) * 1.0000001, (
                    gname, q, got, exact
                )

    # partition invariance: 16-block layout → identical estimates
    res2 = (
        ddsketch_quantiles(
            ds.repartition(16), "value", qs, alpha=alpha, group_col="grp"
        )
        .to_pandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    for col in ["p50", "p95", "p99"]:
        assert res[col].tolist() == res2[col].tolist()


def test_part_copurchase_serial_oracle(tmp_path):
    """Random baskets vs a brute-force pair count, including duplicate
    (order, part) rows that must collapse before pairing."""
    from itertools import combinations

    from everythinggraph_ray.pipelines.queries import (
        COPURCHASE_MINSUP,
        q_part_copurchase,
    )

    rng = np.random.default_rng(5)
    pairs = [
        (int(o), int(p))
        for o in range(40)
        for p in rng.integers(0, 25, rng.integers(2, 6))
    ]
    pairs += pairs[:10]  # duplicated lineitems: same (order, part) twice
    res = q_part_copurchase(_lineitem_dir(tmp_path, pairs)).to_pandas()
    got = {(a, b): c for a, b, c in zip(res["a"], res["b"], res["cnt"])}

    baskets: dict[int, set[int]] = {}
    for o, p in pairs:
        baskets.setdefault(o, set()).add(p)
    want: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    want = {k: v for k, v in want.items() if v >= COPURCHASE_MINSUP}
    assert got == want


def _orders_dir(tmp_path, okeys, prices, dates):
    d = tmp_path / "sfo"
    d.mkdir()
    pd.DataFrame(
        {
            "o_orderkey": np.asarray(okeys, np.int64),
            "o_totalprice": np.asarray(prices, np.float64),
            "o_orderdate": pd.to_datetime(dates),
        }
    ).to_parquet(d / "orders.parquet")
    return str(d)


def test_orders_skyline_matches_bruteforce(tmp_path):
    """Random orders with forced price/date ties AND one exact-duplicate
    pair (neither dominates the other: both must survive) vs the O(n^2)
    dominance definition."""
    from everythinggraph_ray.pipelines.queries import q_orders_skyline

    rng = np.random.default_rng(9)
    n = 300
    prices = rng.choice([10.0, 20.0, 20.0, 35.5, 50.0, 80.0], n)
    base = pd.Timestamp("1994-01-01")
    dates = [base + pd.Timedelta(days=int(x)) for x in rng.integers(0, 12, n)]
    # exact duplicate twins, placed at the frontier corner
    okeys = list(range(n)) + [900, 901]
    prices = np.r_[prices, [5.0, 5.0]]
    dates = dates + [base, base]

    res = q_orders_skyline(_orders_dir(tmp_path, okeys, prices, dates)).to_pandas()
    got = set(res["o_orderkey"])

    pts = list(zip(okeys, prices, [pd.Timestamp(d) for d in dates]))
    want = {
        k
        for k, p, d in pts
        if not any(
            (p2 <= p and d2 <= d and (p2 < p or d2 < d)) for _, p2, d2 in pts
        )
    }
    assert 900 in want and 901 in want  # duplicate twins both on the frontier
    assert got == want
    # and the surviving rows carry their original values
    row = res[res["o_orderkey"] == 900].iloc[0]
    assert row["o_totalprice"] == 5.0 and pd.Timestamp(row["o_orderdate"]) == base


def test_events_records_matches_serial(tmp_path):
    """Distributed prefix-max record detection equals the serial scan,
    including records suppressed by a maximum set many buckets earlier
    and strict-> tie losing."""
    from everythinggraph_ray.pipelines.queries import q_events_records

    rng = np.random.default_rng(21)
    n = 500
    vals = rng.normal(size=n)
    vals[3] = 50.0  # early global max: every later bucket's prefix must see it
    vals[400] = 50.0  # exact tie with the record -> NOT a record (strict >)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 25, n).astype(np.int64),
            "ts": pd.to_datetime(np.arange(n), unit="m", origin="2024-01-01"),
            "event_type": ["view"] * n,
            "value": vals,
            "props": ["{}"] * n,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    ev.to_parquet(d / "events.parquet")

    res = q_events_records(str(d)).to_pandas().sort_values("event_id")
    vu = np.round(vals * 1e6).astype(np.int64)
    run = np.iinfo(np.int64).min
    want = []
    for i in range(n):
        if vu[i] > run:
            want.append(i)
            run = vu[i]
    assert res["event_id"].tolist() == want
    assert 3 in want and 400 not in res["event_id"].tolist()
    assert res["value_u"].tolist() == [int(vu[i]) for i in want]


def test_events_ks_matches_scipy_style_serial(tmp_path):
    """Integer-exact KS equals the serial pooled-EDF computation on data
    engineered so the max deviation straddles a bucket boundary."""
    from everythinggraph_ray.pipelines.queries import q_events_ks

    rng = np.random.default_rng(8)
    n = 600
    types = np.where(rng.random(n) < 0.5, "click", "purchase")
    vals = np.where(types == "click", rng.normal(0, 1, n), rng.normal(0.7, 1, n))
    # sprinkle other types that must be ignored
    types[::10] = "view"
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(n), unit="m", origin="2024-01-01"),
            "event_type": types,
            "value": vals,
            "props": ["{}"] * n,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    ev.to_parquet(d / "events.parquet")

    res = q_events_ks(str(d))
    vu = np.round(vals * 1e6).astype(np.int64)
    a = np.sort(vu[types == "click"])
    b = np.sort(vu[types == "purchase"])
    n1, n2 = len(a), len(b)
    pool = np.unique(np.r_[a, b])
    s1 = np.searchsorted(a, pool, side="right")
    s2 = np.searchsorted(b, pool, side="right")
    want = int(np.max(np.abs(s1 * n2 - s2 * n1)))
    assert res["ks_num"].iloc[0] == want
    assert res["ks_den"].iloc[0] == n1 * n2
    assert want > 0


def test_events_xcorr_matches_serial(tmp_path):
    from everythinggraph_ray.pipelines.queries import q_events_xcorr

    rng = np.random.default_rng(4)
    n = 500
    types = np.array(["click", "purchase", "view"])[rng.integers(0, 3, n)]
    ts = pd.to_datetime(
        rng.integers(0, 72 * 3600, n), unit="s", origin="2024-01-01"
    ).astype("datetime64[us]")  # testdata convention: µs storage
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "ts": ts,
            "event_type": types,
            "value": np.zeros(n),
            "props": ["{}"] * n,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    ev.to_parquet(d / "events.parquet")

    res = q_events_xcorr(str(d))
    hours = (ts.astype("int64") // 3_600_000_000).to_numpy()  # µs → hours
    mask = np.isin(types, ["click", "purchase"])
    hsel = hours[mask]
    tsel = types[mask]
    uh = np.unique(hsel)
    x = np.array([(tsel[hsel == h] == "click").sum() for h in uh], np.int64)
    y = np.array([(tsel[hsel == h] == "purchase").sum() for h in uh], np.int64)
    assert res["n_hours"].iloc[0] == len(uh)
    assert res["sx"].iloc[0] == x.sum() and res["sy"].iloc[0] == y.sum()
    assert res["sxx"].iloc[0] == (x * x).sum()
    assert res["syy"].iloc[0] == (y * y).sum()
    assert res["sxy"].iloc[0] == (x * y).sum()
