"""Analytics batch (session 12, eleventh wave): complex-event pattern
matching and calendar proration.

Distributed shapes:
- ``events_cep_views_purchase``: the MATCH_RECOGNIZE-style CEP pattern
  VIEW{2,} PURCHASE — per user, every MAXIMAL run of >= 2 consecutive
  'view' events immediately followed by a 'purchase' (in (ts,
  event_id) order). One user-bucketed co-group; runs found with
  vectorized boolean flags (run starts = view & not-prev-view, run ids
  = cumsum), the follow-check is one shifted-array lookup. The oracle
  is the gaps-and-islands lowering of the same pattern (DuckDB has no
  MATCH_RECOGNIZE).
- ``orders_prorate_monthly``: CALENDARIZATION — each order's
  total-price millis prorated across the months its [orderdate,
  max(lineitem shipdate)] span covers, by overlap-day counts, with
  LARGEST-REMAINDER rounding so every order's allocations sum exactly
  to its total (ties to the earlier month). One bucketed per-order
  max-shipdate fold + a hash join; the month explosion and the
  per-order remainder ranking are fully vectorized (numpy M8[M]
  calendar arithmetic + one lexsort, no per-order Python loop).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

ANALYTICS27_QUERIES: dict = {}
ANALYTICS27_ORACLES: dict = {}

CEP_MIN_VIEWS = 2


# ----------------------------------------------------------------------
# CEP: VIEW{2,} PURCHASE
# ----------------------------------------------------------------------
def q_events_cep_views_purchase(sf_dir):
    """(user_id, first_view_id, purchase_id, n_views): maximal runs of
    >= 2 consecutive views immediately followed by a purchase."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        ty = np.asarray(t["event_type"].to_pylist(), object)
        code = np.where(ty == "view", 1, np.where(ty == "purchase", 2, 0)).astype(
            np.int64
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pa.array(ts, pa.int64()),
                "code": pa.array(code, pa.int64()),
            }
        )

    def user_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def match(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        code = g["code"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, ts, u))
        u, eid, code = u[o], eid[o], code[o]
        n = len(u)
        new_user = np.r_[True, u[1:] != u[:-1]]
        isv = code == 1
        run_start = isv & (new_user | np.r_[False, ~isv[:-1]])
        # maximal view runs: id per run, length via bincount
        rid = np.cumsum(run_start) - 1
        rid = np.where(isv, rid, -1)
        n_runs = int(run_start.sum())
        if not n_runs:
            return pa.table(
                {
                    c: pa.array([], pa.int64())
                    for c in ["user_id", "first_view_id", "purchase_id", "n_views"]
                }
            )
        lens = np.bincount(rid[isv], minlength=n_runs)
        starts = np.flatnonzero(run_start)
        ends = starts + lens - 1  # runs are contiguous
        # follower: the row right after the run end, same user, purchase
        nxt = ends + 1
        ok = (
            (lens >= CEP_MIN_VIEWS)
            & (nxt < n)
            & ~new_user[np.minimum(nxt, n - 1)]
            & (code[np.minimum(nxt, n - 1)] == 2)
        )
        return pa.table(
            {
                "user_id": pa.array(u[starts[ok]], pa.int64()),
                "first_view_id": pa.array(eid[starts[ok]], pa.int64()),
                "purchase_id": pa.array(eid[nxt[ok]], pa.int64()),
                "n_views": pa.array(lens[ok].astype(np.int64), pa.int64()),
            }
        )

    res = bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"), user_bucket, match)
    return _typed_collect(
        res,
        {
            "user_id": "int64",
            "first_view_id": "int64",
            "purchase_id": "int64",
            "n_views": "int64",
        },
    )


ANALYTICS27_QUERIES["events_cep_views_purchase"] = q_events_cep_views_purchase

ANALYTICS27_ORACLES["events_cep_views_purchase"] = (
    "WITH t AS (SELECT event_id, user_id, event_type, "
    "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn "
    "FROM events), "
    "v AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp "
    "FROM t WHERE event_type = 'view'), "
    "isl AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS n_views, "
    "MAX(rn) AS rn1, arg_min(event_id, rn) AS first_view_id "
    "FROM v GROUP BY 1, 2) "
    "SELECT i.user_id, i.first_view_id, p.event_id AS purchase_id, i.n_views "
    "FROM isl i JOIN t p ON p.user_id = i.user_id AND p.rn = i.rn1 + 1 "
    f"AND p.event_type = 'purchase' WHERE i.n_views >= {CEP_MIN_VIEWS}"
)


# ----------------------------------------------------------------------
# calendar proration (largest-remainder by overlap days)
# ----------------------------------------------------------------------
def q_orders_prorate_monthly(sf_dir):
    """(orderkey, month_ym, alloc_milli): each order's total-price
    millis split across the months of [o_orderdate, max l_shipdate]
    proportionally to overlap days, largest-remainder exact."""
    from everythinggraph_ray.pipelines.queries import _typed_collect
    from everythinggraph_ray.stages.agg import sum_by_key

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_shipdate"]
    )

    def ship_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sd = (
            t["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        u, inv = np.unique(ok, return_inverse=True)
        m = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(m, inv, sd)
        return pa.table(
            {"k": pa.array(u, pa.int64()), "neg": pa.array(-m, pa.int64())}
        )

    # bucketed MAX via min of negatives through sum_by_key? no — use a
    # bucketed reduce with an explicit max
    def k_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["k"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def max_red(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = -g["neg"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(k, return_inverse=True)
        m = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(m, inv, v)
        return pa.table({"k": pa.array(u, pa.int64()), "max_ship": pa.array(m, pa.int64())})

    ship = bucketed_reduce(
        li.map_batches(ship_partial, batch_format="pyarrow"), k_bucket, max_red
    )

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "k": t["o_orderkey"],
                "od": pa.array(
                    t["o_orderdate"].to_numpy(zero_copy_only=False)
                    .astype("datetime64[D]")
                    .astype(np.int64),
                    pa.int64(),
                ),
                "rev": pa.array(
                    np.floor(
                        t["o_totalprice"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    joined = hash_join(orders, ship, on="k", right_cols=["max_ship"])

    def prorate(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        sd = t["od"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        ed0 = t["max_ship"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        ed = np.maximum(sd, ed0)
        rev = t["rev"].to_numpy(zero_copy_only=False)
        m0 = sd.astype("datetime64[M]")
        m1 = ed.astype("datetime64[M]")
        reps = (m1 - m0).astype(np.int64) + 1
        ridx = np.repeat(np.arange(len(k), dtype=np.int64), reps)
        base = np.concatenate([[0], np.cumsum(reps)[:-1]]) if len(k) else np.empty(0, np.int64)
        off = np.arange(ridx.size, dtype=np.int64) - np.repeat(base, reps)
        month = m0[ridx] + off.astype("timedelta64[M]")
        ms = month.astype("datetime64[D]")
        me = (month + np.timedelta64(1, "M")).astype("datetime64[D]") - np.timedelta64(
            1, "D"
        )
        a = np.maximum(ms, sd[ridx])
        b = np.minimum(me, ed[ridx])
        days = (b - a).astype(np.int64) + 1
        # per-order largest remainder
        tot = np.repeat((ed - sd).astype(np.int64) + 1, reps)
        r = rev[ridx]
        fl = r * days // tot
        rem = r * days - fl * tot
        # per-order floor sums -> leftover
        fl_sum = np.zeros(len(k), np.int64)
        np.add.at(fl_sum, ridx, fl)
        leftover = rev - fl_sum
        # rank remainders within order: sort by (order, -rem, month)
        o = np.lexsort((month.astype(np.int64), -rem, ridx))
        pos = np.arange(ridx.size, dtype=np.int64) - np.repeat(base, reps)
        pos_in_order = np.empty(ridx.size, np.int64)
        pos_in_order[o] = pos  # o is grouped by order (stable within)
        bonus = (pos_in_order < leftover[ridx]).astype(np.int64)
        mi = month.astype(np.int64)  # months since 1970
        ym = (1970 + mi // 12) * 100 + (mi % 12 + 1)
        return pa.table(
            {
                "orderkey": pa.array(k[ridx], pa.int64()),
                "month_ym": pa.array(ym, pa.int64()),
                "alloc_milli": pa.array(fl + bonus, pa.int64()),
            }
        )

    res = joined.map_batches(prorate, batch_format="pyarrow")
    return _typed_collect(
        res, {"orderkey": "int64", "month_ym": "int64", "alloc_milli": "int64"}
    )


ANALYTICS27_QUERIES["orders_prorate_monthly"] = q_orders_prorate_monthly

ANALYTICS27_ORACLES["orders_prorate_monthly"] = (
    "WITH mx AS (SELECT l_orderkey AS k, MAX(CAST(l_shipdate AS DATE)) AS ms "
    "FROM lineitem GROUP BY 1), "
    "o2 AS (SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS sd, "
    "GREATEST(CAST(o_orderdate AS DATE), mx.ms) AS ed, "
    "CAST(FLOOR(o_totalprice * 1000 + 0.5) AS BIGINT) AS rev "
    "FROM orders JOIN mx ON mx.k = o_orderkey), "
    "spine AS (SELECT unnest(generate_series(DATE '1992-01-01', DATE '2003-12-01', "
    "INTERVAL 1 MONTH)) AS m1), "
    "ov AS (SELECT k, m1, GREATEST(CAST(m1 AS DATE), sd) AS a, "
    "LEAST(last_day(CAST(m1 AS DATE)), ed) AS b, rev, ed - sd + 1 AS tot "
    "FROM o2 JOIN spine ON CAST(m1 AS DATE) <= ed AND last_day(CAST(m1 AS DATE)) >= sd), "
    "f AS (SELECT k, m1, rev, tot, b - a + 1 AS days, "
    "rev * (b - a + 1) // tot AS fl, "
    "rev * (b - a + 1) - (rev * (b - a + 1) // tot) * tot AS rem FROM ov), "
    "l AS (SELECT k, rev - SUM(fl) AS leftover FROM f GROUP BY k, rev), "
    "r AS (SELECT f.k, f.m1, f.fl, l.leftover, "
    "ROW_NUMBER() OVER (PARTITION BY f.k ORDER BY f.rem DESC, f.m1) AS rn "
    "FROM f JOIN l ON l.k = f.k) "
    "SELECT k AS orderkey, "
    "CAST(year(CAST(m1 AS DATE)) * 100 + month(CAST(m1 AS DATE)) AS BIGINT) AS month_ym, "
    "CAST(fl + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc_milli "
    "FROM r"
)
