"""TPC-H-lite batch 2: Q7 / Q10 / Q13 / Q14 / Q15 / Q17 / Q19 analogues.

Each query is a (ray_fn, oracle_sql) pair over the driver's star schema,
continuing the relational coverage of queries.py (Q1/Q3/Q4/Q5/Q6/Q18/Q22
live there). Same exactness discipline: money folds as integer cents with
the rounding expression ``floor(x*100 + 0.5)`` shared token-for-token with
DuckDB (numpy rounds half-even, DuckDB half-away — floor(+0.5) sidesteps
both), quantities as exact integers, and any final ratio is ONE IEEE
division of identical integers on both sides.

Distributed shapes (no driver/broadcast state beyond the 25-row nation
map):
- big x big joins go through ``datapipe.joins.hash_join`` (bucketed
  co-group — customer/supplier/part all scale with SF, so no ray.put
  broadcasts of them);
- per-key aggregates use per-batch partial combiners + the bucketed
  ``sum_by_key`` (lineitem never shuffles raw);
- date/brand predicates are pushed to per-batch Arrow masks right at the
  read so only surviving rows carry through the join shuffles.

Reference framing: the reference engine has no relational surface at all
(SURVEY.md SS2.d: its joins are implicit shared-memory gathers), so this
file is pure north-rule/driver coverage, not reference parity.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import sum_by_key

# -- constants shared verbatim with the SQL oracles ---------------------
# chosen to be non-empty on BOTH supplier and customer at every test
# scale (sf0.001 has only 10 suppliers, covering nations {3,8,12,...})
Q7_N1, Q7_N2 = "NATION_3", "NATION_8"
Q10_LO, Q10_HI = "1997-01-01", "1997-07-01"
Q14_LO, Q14_HI = "1997-09-01", "1997-10-01"
Q15_LO, Q15_HI = "1997-01-01", "1997-04-01"
Q17_BRAND = "Brand#3"
Q19_ARMS = (  # (brand, size_lo, size_hi, qty_lo, qty_hi) — all inclusive
    ("Brand#4", 1, 5, 1, 11),
    ("Brand#5", 1, 10, 10, 20),
    ("Brand#6", 1, 15, 20, 30),
)


def _rev_cents(price: np.ndarray, disc: np.ndarray) -> np.ndarray:
    # floor(x+0.5), not np.round: numpy rounds half-EVEN, DuckDB half-away
    return np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)


def _ts(s: str) -> np.datetime64:
    return np.datetime64(s)


def _nation_map(sf_dir: str) -> dict[int, str]:
    n = ray.data.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    return dict(zip(n["n_nationkey"].astype(np.int64), n["n_name"]))


# ----------------------------------------------------------------------
# Q7-lite: volume shipping between two nations per ship year
# ----------------------------------------------------------------------
def q_q7_nation_volume(sf_dir):
    """TPC-H Q7-lite: revenue flowing between NATION_1 and NATION_2
    (both directions) per ship year. supplier and customer each get
    their nation via the 25-row ray.put broadcast; the two big joins
    (lineitem x supplier-nation on suppkey, lineitem x order-customer-
    nation on orderkey) go through the distributed bucketed hash_join.
    Rows not in the nation pair are DROPPED AT THE ATTACH (before any
    shuffle), so only the pair's traffic moves."""
    nmap = _nation_map(sf_dir)
    keep_names = {Q7_N1, Q7_N2}
    nref = ray.put({k: v for k, v in nmap.items() if v in keep_names})

    supp = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )

    def attach_s(batch: pa.Table) -> pa.Table:
        m = ray.get(nref)
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = pd.Series(nk).map(m)
        keep = names.notna().to_numpy()
        return pa.table(
            {
                "s_suppkey": pa.array(
                    batch["s_suppkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "supp_nation": pa.array(names[keep].astype(str), pa.string()),
            }
        )

    supp_n = supp.map_batches(attach_s, batch_format="pyarrow")

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )

    def attach_c(batch: pa.Table) -> pa.Table:
        m = ray.get(nref)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = pd.Series(nk).map(m)
        keep = names.notna().to_numpy()
        return pa.table(
            {
                "c_custkey": pa.array(
                    batch["c_custkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "cust_nation": pa.array(names[keep].astype(str), pa.string()),
            }
        )

    cust_n = cust.map_batches(attach_c, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    ord_n = hash_join(
        orders, cust_n, on="o_custkey", right_on="c_custkey", right_cols=["cust_nation"]
    )

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def rev(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        year = sd.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "ship_year": pa.array(year, pa.int64()),
                "rev_c": pa.array(
                    _rev_cents(
                        batch["l_extendedprice"].to_numpy(zero_copy_only=False),
                        batch["l_discount"].to_numpy(zero_copy_only=False),
                    ),
                    pa.int64(),
                ),
            }
        )

    li_s = hash_join(
        li.map_batches(rev, batch_format="pyarrow"),
        supp_n,
        on="l_suppkey",
        right_on="s_suppkey",
        right_cols=["supp_nation"],
    )
    li_sc = hash_join(
        li_s, ord_n, on="l_orderkey", right_on="o_orderkey", right_cols=["cust_nation"]
    )

    def pair_mask(batch: pa.Table) -> pa.Table:
        sn = np.asarray(batch["supp_nation"].to_pylist(), object)
        cn = np.asarray(batch["cust_nation"].to_pylist(), object)
        keep = ((sn == Q7_N1) & (cn == Q7_N2)) | ((sn == Q7_N2) & (cn == Q7_N1))
        return batch.filter(pa.array(keep))

    from ray.data.aggregate import Count, Sum

    return (
        li_sc.map_batches(pair_mask, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "ship_year"])
        .aggregate(Sum("rev_c", alias_name="revenue_c"), Count(alias_name="n_items"))
    )


SQL_Q7 = (
    "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
    "CAST(year(l.l_shipdate) AS BIGINT) AS ship_year, "
    "CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c, "
    "CAST(count(*) AS BIGINT) AS n_items "
    "FROM lineitem l "
    "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "JOIN nation sn ON sn.n_nationkey = s.s_nationkey "
    "JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "JOIN customer c ON c.c_custkey = o.o_custkey "
    "JOIN nation cn ON cn.n_nationkey = c.c_nationkey "
    f"WHERE (sn.n_name = '{Q7_N1}' AND cn.n_name = '{Q7_N2}') "
    f"   OR (sn.n_name = '{Q7_N2}' AND cn.n_name = '{Q7_N1}') "
    "GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)"
)


# ----------------------------------------------------------------------
# Q10-lite: top returned-item customers
# ----------------------------------------------------------------------
def q_q10_returned_customers(sf_dir):
    """TPC-H Q10-lite: top-20 customers by revenue of RETURNED items
    ('R' flag) for orders placed in a half-year window. Returned
    lineitems pre-fold to (orderkey, rev_c) per batch, the date-filtered
    orders attach custkeys through the bucketed hash_join, per-customer
    cents fold via sum_by_key, and names join on AFTER aggregation (the
    join input is one row per purchasing customer, not per lineitem)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def returned_rev(batch: pa.Table) -> pa.Table:
        flag = np.asarray(batch["l_returnflag"].to_pylist(), object)
        keep = flag == "R"
        return pa.table(
            {
                "l_orderkey": pa.array(
                    batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "rev_c": pa.array(
                    _rev_cents(
                        batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep],
                        batch["l_discount"].to_numpy(zero_copy_only=False)[keep],
                    ),
                    pa.int64(),
                ),
            }
        )

    li_r = li.map_batches(returned_rev, batch_format="pyarrow")

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def date_window(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = (d >= _ts(Q10_LO)) & (d < _ts(Q10_HI))
        return pa.table(
            {
                "o_orderkey": pa.array(
                    batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "o_custkey": pa.array(
                    batch["o_custkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
            }
        )

    ord_w = orders.map_batches(date_window, batch_format="pyarrow")
    li_c = hash_join(
        li_r, ord_w, on="l_orderkey", right_on="o_orderkey", right_cols=["o_custkey"]
    )
    per_cust = sum_by_key(
        li_c.select_columns(["o_custkey", "rev_c"]),
        "o_custkey",
        ["rev_c"],
        out_names=["revenue_c"],
    )
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    named = hash_join(
        per_cust, cust, on="o_custkey", right_on="c_custkey", right_cols=["c_name"]
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["o_custkey"],
                "c_name": batch["c_name"],
                "revenue_c": batch["revenue_c"],
            }
        )

    out = named.map_batches(rename, batch_format="pyarrow")
    return out.sort(["revenue_c", "c_custkey"], descending=[True, False]).limit(20)


SQL_Q10 = (
    "SELECT c.c_custkey, c.c_name, "
    "CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c "
    "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "JOIN customer c ON c.c_custkey = o.o_custkey "
    "WHERE l.l_returnflag = 'R' "
    f"AND o.o_orderdate >= TIMESTAMP '{Q10_LO}' AND o.o_orderdate < TIMESTAMP '{Q10_HI}' "
    "GROUP BY c.c_custkey, c.c_name "
    "ORDER BY revenue_c DESC, c.c_custkey LIMIT 20"
)


# ----------------------------------------------------------------------
# Q13-lite: customer order-count distribution (LEFT join incl. zeros)
# ----------------------------------------------------------------------
def q_q13_order_distribution(sf_dir):
    """TPC-H Q13-lite: how many customers placed exactly k orders, for
    every k INCLUDING 0 — the canonical LEFT-join-then-histogram.
    Orders fold to per-customer counts (batch partials + bucketed sum),
    customers LEFT-join those counts through the distributed hash_join
    (order-less customers surface as nulls -> 0), and the final
    histogram is a second tiny bucketed sum over counts."""
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    )

    def cnt_partial(batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy(zero_copy_only=False)
        u, c = np.unique(k, return_counts=True)
        return pa.table(
            {"o_custkey": pa.array(u, pa.int64()), "n": pa.array(c.astype(np.int64), pa.int64())}
        )

    per_cust = sum_by_key(
        orders.map_batches(cnt_partial, batch_format="pyarrow"),
        "o_custkey",
        ["n"],
        out_names=["c_count"],
    )

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    joined = hash_join(
        cust, per_cust, on="c_custkey", right_on="o_custkey", right_cols=["c_count"],
        how="left",
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        # left-join misses are nulls: order-less customers count as 0
        c = batch["c_count"].to_pandas().fillna(0).astype(np.int64).to_numpy()
        u, n = np.unique(c, return_counts=True)
        return pa.table(
            {"c_count": pa.array(u, pa.int64()), "custdist": pa.array(n.astype(np.int64), pa.int64())}
        )

    return sum_by_key(
        joined.map_batches(hist_partial, batch_format="pyarrow"),
        "c_count",
        ["custdist"],
    )


SQL_Q13 = (
    "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM ("
    "  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count "
    "  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
    "  GROUP BY c.c_custkey"
    ") GROUP BY c_count"
)


# ----------------------------------------------------------------------
# Q14-lite: promo revenue share in one month
# ----------------------------------------------------------------------
def q_q14_promo_share(sf_dir):
    """TPC-H Q14-lite: share of September-1997 revenue from PROMO-type
    parts. One month of lineitem pre-folds to (partkey, rev_c) rows,
    p_type attaches through the bucketed hash_join (part is big-side at
    scale — no broadcast), and both sums ride one per-batch partial
    pass. Surface: the two exact integer sums + their ONE IEEE-division
    percentage (identical integers -> identical double on both sides)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def window_rev(batch: pa.Table) -> pa.Table:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = (d >= _ts(Q14_LO)) & (d < _ts(Q14_HI))
        return pa.table(
            {
                "l_partkey": pa.array(
                    batch["l_partkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "rev_c": pa.array(
                    _rev_cents(
                        batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep],
                        batch["l_discount"].to_numpy(zero_copy_only=False)[keep],
                    ),
                    pa.int64(),
                ),
            }
        )

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    li_t = hash_join(
        li.map_batches(window_rev, batch_format="pyarrow"),
        part,
        on="l_partkey",
        right_on="p_partkey",
        right_cols=["p_type"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = batch["rev_c"].to_numpy(zero_copy_only=False)
        promo = np.asarray(batch["p_type"].to_pylist(), object) == "PROMO"
        return pa.table(
            {
                "promo_rev_c": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_rev_c": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    tot = li_t.map_batches(partial, batch_format="pyarrow").to_pandas()
    p, t = int(tot["promo_rev_c"].sum()), int(tot["total_rev_c"].sum())
    return pd.DataFrame(
        {
            "promo_rev_c": pd.array([p], dtype="int64"),
            "total_rev_c": pd.array([t], dtype="int64"),
            "promo_pct": [100.0 * p / t if t else 0.0],
        }
    )


SQL_Q14 = (
    "WITH w AS (SELECT CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS rev_c, "
    "p.p_type FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
    f"WHERE l.l_shipdate >= TIMESTAMP '{Q14_LO}' AND l.l_shipdate < TIMESTAMP '{Q14_HI}') "
    "SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT) AS promo_rev_c, "
    "CAST(sum(rev_c) AS BIGINT) AS total_rev_c, "
    "100.0 * sum(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) / sum(rev_c) AS promo_pct "
    "FROM w"
)


# ----------------------------------------------------------------------
# Q15-lite: top supplier(s) by quarterly revenue (ties kept)
# ----------------------------------------------------------------------
def q_q15_top_supplier(sf_dir):
    """TPC-H Q15-lite: the supplier(s) with maximum revenue in 1997Q1 —
    the classic aggregate-then-argmax-with-ties. Lineitem folds to
    per-supplier cents (batch partials + bucketed sum); that small
    aggregate is materialized once, its max taken distributed
    (``ds.max``), ties kept by an exact filter, names attached through
    the hash_join (supplier is big-side at scale)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def window_rev(batch: pa.Table) -> pa.Table:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = (d >= _ts(Q15_LO)) & (d < _ts(Q15_HI))
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        rc = _rev_cents(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep],
            batch["l_discount"].to_numpy(zero_copy_only=False)[keep],
        )
        # batch-partial combine before the bucketed sum
        u, inv = np.unique(sk, return_inverse=True)
        return pa.table(
            {
                "l_suppkey": pa.array(u, pa.int64()),
                "rev_c": pa.array(np.bincount(inv, rc).astype(np.int64), pa.int64()),
            }
        )

    per_supp = sum_by_key(
        li.map_batches(window_rev, batch_format="pyarrow"),
        "l_suppkey",
        ["rev_c"],
        out_names=["total_rev_c"],
    ).materialize()  # small: one row per active supplier; read twice (max + filter)
    best = per_supp.max("total_rev_c")

    def keep_max(batch: pa.Table) -> pa.Table:
        m = batch["total_rev_c"].to_numpy(zero_copy_only=False) == best
        return batch.filter(pa.array(m))

    top = per_supp.map_batches(keep_max, batch_format="pyarrow")
    supp = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    named = hash_join(
        top, supp, on="l_suppkey", right_on="s_suppkey", right_cols=["s_name"]
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": batch["l_suppkey"],
                "s_name": batch["s_name"],
                "total_rev_c": batch["total_rev_c"],
            }
        )

    return named.map_batches(rename, batch_format="pyarrow")


SQL_Q15 = (
    "WITH r AS (SELECT l_suppkey, "
    "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_rev_c "
    f"FROM lineitem WHERE l_shipdate >= TIMESTAMP '{Q15_LO}' AND l_shipdate < TIMESTAMP '{Q15_HI}' "
    "GROUP BY l_suppkey) "
    "SELECT s.s_suppkey, s.s_name, r.total_rev_c FROM r "
    "JOIN supplier s ON s.s_suppkey = r.l_suppkey "
    "WHERE r.total_rev_c = (SELECT max(total_rev_c) FROM r)"
)


# ----------------------------------------------------------------------
# Q17-lite: small-quantity-order revenue (per-part average gate)
# ----------------------------------------------------------------------
def q_q17_small_qty(sf_dir):
    """TPC-H Q17-lite: revenue from lineitems of one brand whose
    quantity is below 20%% of that part's average quantity — the
    correlated-average gate. All-integer: with per-part (sum_qi, n),
    ``qty < 0.2*avg``  <=>  ``5*qi*n < sum_qi`` (cross-multiplied, no
    float threshold — the q22 device). Brand parts SEMI-filter lineitem
    through the hash_join, the per-part aggregate attaches back through
    a second hash_join, the gate is a per-batch mask."""
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )

    def brand_only(batch: pa.Table) -> pa.Table:
        keep = np.asarray(batch["p_brand"].to_pylist(), object) == Q17_BRAND
        return pa.table(
            {"p_partkey": pa.array(batch["p_partkey"].to_numpy(zero_copy_only=False)[keep], pa.int64())}
        )

    brand_parts = part.map_batches(brand_only, batch_format="pyarrow")

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": pa.array(batch["l_partkey"].to_numpy(zero_copy_only=False), pa.int64()),
                # quantities are integral doubles (1..50): exact int cast
                "qi": pa.array(
                    np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64),
                    pa.int64(),
                ),
                "price_c": pa.array(
                    np.floor(batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    li_b = hash_join(
        li.map_batches(project, batch_format="pyarrow"),
        brand_parts,
        on="l_partkey",
        right_on="p_partkey",
        how="semi",
    )

    def agg_partial(batch: pa.Table) -> pa.Table:
        k = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qi = batch["qi"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "l_partkey": pa.array(u, pa.int64()),
                "sum_qi": pa.array(np.bincount(inv, qi).astype(np.int64), pa.int64()),
                "n_li": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            }
        )

    per_part = sum_by_key(
        li_b.map_batches(agg_partial, batch_format="pyarrow"),
        "l_partkey",
        ["sum_qi", "n_li"],
    )
    gated = hash_join(
        li_b, per_part, on="l_partkey", right_cols=["sum_qi", "n_li"]
    )

    def gate(batch: pa.Table) -> pa.Table:
        qi = batch["qi"].to_numpy(zero_copy_only=False)
        s = batch["sum_qi"].to_numpy(zero_copy_only=False)
        n = batch["n_li"].to_numpy(zero_copy_only=False)
        keep = 5 * qi * n < s
        pc = batch["price_c"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "rev_c": pa.array([int(pc.sum())], pa.int64()),
                "n_items": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    tot = gated.map_batches(gate, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "rev_c": pd.array([int(tot["rev_c"].sum())], dtype="int64"),
            "n_items": pd.array([int(tot["n_items"].sum())], dtype="int64"),
        }
    )


SQL_Q17 = (
    "WITH b AS (SELECT l.l_partkey, CAST(round(l.l_quantity) AS BIGINT) AS qi, "
    "CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c "
    "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
    f"WHERE p.p_brand = '{Q17_BRAND}'), "
    "a AS (SELECT l_partkey, CAST(sum(qi) AS BIGINT) AS sum_qi, CAST(count(*) AS BIGINT) AS n_li "
    "FROM b GROUP BY l_partkey) "
    "SELECT CAST(coalesce(sum(b.price_c), 0) AS BIGINT) AS rev_c, "
    "CAST(count(*) AS BIGINT) AS n_items "
    "FROM b JOIN a ON a.l_partkey = b.l_partkey "
    "WHERE 5 * b.qi * a.n_li < a.sum_qi"
)


# ----------------------------------------------------------------------
# Q19-lite: disjunctive brand/size/quantity predicate revenue
# ----------------------------------------------------------------------
def q_q19_disjunctive(sf_dir):
    """TPC-H Q19-lite: revenue under a three-arm OR of (brand, size
    range, quantity range) predicates — the disjunctive-pushdown
    pattern. Part attributes attach through the bucketed hash_join;
    the three arms evaluate as one vectorized mask per batch."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": pa.array(batch["l_partkey"].to_numpy(zero_copy_only=False), pa.int64()),
                "qi": pa.array(
                    np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64),
                    pa.int64(),
                ),
                "rev_c": pa.array(
                    _rev_cents(
                        batch["l_extendedprice"].to_numpy(zero_copy_only=False),
                        batch["l_discount"].to_numpy(zero_copy_only=False),
                    ),
                    pa.int64(),
                ),
            }
        )

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand", "p_size"]
    )
    li_p = hash_join(
        li.map_batches(project, batch_format="pyarrow"),
        part,
        on="l_partkey",
        right_on="p_partkey",
        right_cols=["p_brand", "p_size"],
    )

    def arms(batch: pa.Table) -> pa.Table:
        qi = batch["qi"].to_numpy(zero_copy_only=False)
        sz = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        br = np.asarray(batch["p_brand"].to_pylist(), object)
        keep = np.zeros(len(qi), bool)
        for brand, s_lo, s_hi, q_lo, q_hi in Q19_ARMS:
            keep |= (br == brand) & (sz >= s_lo) & (sz <= s_hi) & (qi >= q_lo) & (qi <= q_hi)
        rc = batch["rev_c"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "revenue_c": pa.array([int(rc.sum())], pa.int64()),
                "n_items": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    tot = li_p.map_batches(arms, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "revenue_c": pd.array([int(tot["revenue_c"].sum())], dtype="int64"),
            "n_items": pd.array([int(tot["n_items"].sum())], dtype="int64"),
        }
    )


def _q19_arm_sql(brand: str, s_lo: int, s_hi: int, q_lo: int, q_hi: int) -> str:
    return (
        f"(p.p_brand = '{brand}' AND p.p_size BETWEEN {s_lo} AND {s_hi} "
        f"AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN {q_lo} AND {q_hi})"
    )


SQL_Q19 = (
    "SELECT CAST(coalesce(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)), 0) AS BIGINT) AS revenue_c, "
    "CAST(count(*) AS BIGINT) AS n_items "
    "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
    "WHERE " + " OR ".join(_q19_arm_sql(*arm) for arm in Q19_ARMS)
)


TPCH_EXTRA_QUERIES = {
    "q7_nation_volume": q_q7_nation_volume,
    "q10_returned_customers": q_q10_returned_customers,
    "q13_order_distribution": q_q13_order_distribution,
    "q14_promo_share": q_q14_promo_share,
    "q15_top_supplier": q_q15_top_supplier,
    "q17_small_qty": q_q17_small_qty,
    "q19_disjunctive": q_q19_disjunctive,
}

TPCH_EXTRA_ORACLES = {
    "q7_nation_volume": SQL_Q7,
    "q10_returned_customers": SQL_Q10,
    "q13_order_distribution": SQL_Q13,
    "q14_promo_share": SQL_Q14,
    "q15_top_supplier": SQL_Q15,
    "q17_small_qty": SQL_Q17,
    "q19_disjunctive": SQL_Q19,
}
