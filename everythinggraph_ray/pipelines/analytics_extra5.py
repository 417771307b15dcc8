"""Analytics batch (session 9, third wave): corpus Zipf slope, TPC-H
Q21-lite waiting suppliers, seasonal revenue index, lag-1 autocorrelation
of daily traffic, supplier lead times, and local-bridge census.

Each is a (ray_fn, oracle_sql) pair on queries.py's exactness
discipline. Float surfaces follow the two sanctioned devices: exact
integer moments folded distributed-side with ONE closed-form double at
the end (float(num)/float(den) in Python == CAST(num AS DOUBLE)/CAST(den
AS DOUBLE) in SQL — both round the exact integer once), or ln() over
exact integers quantized to 1e6 BEFORE any summation (the tfidf
ln-parity precedent, so the sums are int64-exact on both sides).

Distributed shapes:
- ``docs_zipf_slope``: exact corpus token counts (the lang-entropy
  bucketed reduce), a constant-group ``grouped_top_k`` cuts the top
  100, and the OLS of ln(freq) on ln(rank) runs on 100 driver rows as
  integer moments of 1e6-quantized logs.
- ``q21_waiting``: per-(order, supplier) lateness fold, an
  order-bucketed co-group decides "this supplier alone was late in a
  multi-supplier order", then a supplier ``sum_by_key`` and top-20.
- ``orders_seasonality``: 12-row month-of-year revenue index in exact
  cents; share is ppm integer division.
- ``events_daily_autocorr``: per-day counts via ``sum_by_key``; the
  O(timespan) day series folds to four integer moments on the driver;
  r1 = (Σ (n·c_t − S)(n·c_{t+1} − S)) / (Σ (n·c_t − S)²) — numerator
  over ORDERED consecutive observed days (SQL lag), one double at the
  end.
- ``supplier_lead_time``: ship − order day lag per lineitem (can be
  negative in this synthetic data — the average therefore uses the
  float-once device, never integer division).
- ``rel_local_bridges``: an edge is a LOCAL BRIDGE when its endpoints
  share no common neighbor (span > 2, Easley–Kleinberg §3.2) ⇔ truss
  support 0 — one fold over the existing ``edge_support`` operator.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import (
    bucketed_reduce,
    grouped_top_k,
    mix64,
    sum_by_key,
)

ANALYTICS5_QUERIES: dict = {}
ANALYTICS5_ORACLES: dict = {}

DAY_US = 86_400_000_000


# ----------------------------------------------------------------------
# Zipf slope of the corpus token frequency spectrum
# ----------------------------------------------------------------------
ZIPF_TOP = 100
LOG_SCALE = 1_000_000


def q_docs_zipf_slope(sf_dir):
    """OLS slope of ln(count) on ln(rank) over the top-100 corpus
    tokens (rank by count desc, token asc) — Zipf's law has slope ≈ −1;
    a corpus of boilerplate repeats flattens it. ln values are
    quantized to floor(ln·1e6) BEFORE summation so all five OLS moments
    are exact int64 on both sides; the slope is one double at the
    end."""
    import re as _re

    from everythinggraph_ray.datapipe.text import WORD_RE

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        rx = _re.compile(WORD_RE)
        cnt: dict[str, int] = {}
        for t in pc.utf8_lower(batch["text"]).to_pylist():
            for w in rx.findall(t or ""):
                cnt[w] = cnt.get(w, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(cnt.keys()), pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    counts = bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"),
        lambda b: _token_bucket(b["token"]),
        lambda g: pa.Table.from_pandas(
            g.to_pandas().groupby("token", as_index=False)["c"].sum(), preserve_index=False
        ),
    )
    g0 = counts.map_batches(
        lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())),
        batch_format="pyarrow",
    )
    top = (
        grouped_top_k(g0, "g", [("c", False), ("token", True)], ZIPF_TOP)
        .to_pandas()
        .sort_values(["c", "token"], ascending=[False, True])
        .reset_index(drop=True)
    )
    n = len(top)
    rank = np.arange(1, n + 1, dtype=np.float64)
    x = np.floor(np.log(rank) * LOG_SCALE).astype(np.int64)
    y = np.floor(np.log(top["c"].to_numpy(np.float64)) * LOG_SCALE).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = round(float(num) / float(den), 7) if den else 0.0
    return pd.DataFrame(
        {
            "n_terms": [n],
            "sx": [sx],
            "sy": [sy],
            "sxy": [sxy],
            "sxx": [sxx],
            "slope": [slope],
        }
    ).astype(
        {"n_terms": "int64", "sx": "int64", "sy": "int64", "sxy": "int64", "sxx": "int64", "slope": "float64"}
    )


def _token_bucket(tokens) -> np.ndarray:
    from everythinggraph_ray.stages.agg import string_buckets

    return string_buckets(tokens)


SQL_ZIPF = (
    "WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t "
    "FROM documents), "
    "c AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t), "
    f"top AS (SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS rk FROM c "
    f"ORDER BY c DESC, t ASC LIMIT {ZIPF_TOP}), "
    f"q AS (SELECT CAST(floor(ln(rk) * {LOG_SCALE}) AS BIGINT) AS x, "
    f"CAST(floor(ln(c) * {LOG_SCALE}) AS BIGINT) AS y FROM top), "
    "m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, "
    "CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy, "
    "CAST(sum(x * x) AS BIGINT) AS sxx FROM q) "
    "SELECT n AS n_terms, sx, sy, sxy, sxx, "
    "CASE WHEN n * sxx - sx * sx <> 0 THEN "
    "round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 7) "
    "ELSE 0.0 END AS slope FROM m"
)

ANALYTICS5_QUERIES["docs_zipf_slope"] = q_docs_zipf_slope
ANALYTICS5_ORACLES["docs_zipf_slope"] = SQL_ZIPF


# ----------------------------------------------------------------------
# TPC-H Q21-lite: suppliers who alone kept a multi-supplier order waiting
# ----------------------------------------------------------------------
Q21_LATE_DAYS = 60
Q21_TOP = 20


def q_q21_waiting(sf_dir):
    """Q21's shape on this schema (ship lag stands in for
    receipt-vs-commit): in orders with ≥ 2 distinct suppliers, find the
    suppliers who shipped a line more than 60 days after the order date
    while EVERY other supplier of that order shipped on time; count
    such orders per supplier, top 20 (count desc, suppkey asc)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate"]
    )
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", right_cols=["o_orderdate"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        late = ((sd // DAY_US) - (od // DAY_US)) > Q21_LATE_DAYS
        df = pd.DataFrame(
            {
                "ok": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "sk": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                "late": late.astype(np.int64),
            }
        )
        out = df.groupby(["ok", "sk"], as_index=False)["late"].max()
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = j.map_batches(pair_partial, batch_format="pyarrow")

    def order_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["ok"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def lone_late(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["ok", "sk"], as_index=False)["late"].max()
        gb = df.groupby("ok")["late"].agg(["sum", "count"]).rename(columns={"sum": "nl", "count": "ns"})
        df = df.merge(gb, left_on="ok", right_index=True)
        hit = df[(df["late"] == 1) & (df["nl"] == 1) & (df["ns"] >= 2)]
        out = hit.groupby("sk", as_index=False).size().rename(columns={"size": "n_orders"})
        return pa.table(
            {
                "suppkey": pa.array(out["sk"].to_numpy(np.int64), pa.int64()),
                "n_orders": pa.array(out["n_orders"].to_numpy(np.int64), pa.int64()),
            }
        )

    per_supp = sum_by_key(bucketed_reduce(pairs, order_bucket, lone_late), "suppkey", ["n_orders"])
    g0 = per_supp.map_batches(
        lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())),
        batch_format="pyarrow",
    )
    top = grouped_top_k(g0, "g", [("n_orders", False), ("suppkey", True)], Q21_TOP)
    return (
        top.to_pandas()[["suppkey", "n_orders"]]
        .sort_values(["n_orders", "suppkey"], ascending=[False, True])
        .reset_index(drop=True)
        .astype("int64")
    )


SQL_Q21 = (
    "WITH p AS (SELECT l_orderkey AS ok, l_suppkey AS sk, "
    "max(CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > "
    f"{Q21_LATE_DAYS} THEN 1 ELSE 0 END) AS late "
    "FROM lineitem JOIN orders ON o_orderkey = l_orderkey GROUP BY 1, 2), "
    "o AS (SELECT ok, CAST(sum(late) AS BIGINT) AS nl, CAST(count(*) AS BIGINT) AS ns "
    "FROM p GROUP BY 1), "
    "hit AS (SELECT p.sk FROM p JOIN o ON o.ok = p.ok "
    "WHERE p.late = 1 AND o.nl = 1 AND o.ns >= 2) "
    "SELECT CAST(sk AS BIGINT) AS suppkey, CAST(count(*) AS BIGINT) AS n_orders "
    f"FROM hit GROUP BY 1 ORDER BY n_orders DESC, suppkey ASC LIMIT {Q21_TOP}"
)

ANALYTICS5_QUERIES["q21_waiting"] = q_q21_waiting
ANALYTICS5_ORACLES["q21_waiting"] = SQL_Q21


# ----------------------------------------------------------------------
# Seasonal revenue index per month-of-year
# ----------------------------------------------------------------------
def q_orders_seasonality(sf_dir):
    """Month-of-year seasonality: total order revenue in exact cents
    per calendar month (1–12) across all years, plus each month's share
    of the grand total in ppm — the 12-row seasonal index."""
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.month(batch["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        u, inv = np.unique(m, return_inverse=True)
        return pa.table(
            {
                "month": pa.array(u, pa.int64()),
                "revenue_c": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64), pa.int64()
                ),
                "n_orders": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            }
        )

    parts = (
        orders.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("month", as_index=False)
        .sum()
    )
    total = int(parts["revenue_c"].sum())
    parts["share_ppm"] = (1_000_000 * parts["revenue_c"]) // total
    return parts.sort_values("month").reset_index(drop=True).astype("int64")


SQL_SEASONALITY = (
    "WITH m AS (SELECT CAST(month(o_orderdate) AS BIGINT) AS month, "
    "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c, "
    "CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1) "
    "SELECT month, revenue_c, n_orders, "
    "CAST(1000000 * revenue_c // (SELECT sum(revenue_c) FROM m) AS BIGINT) AS share_ppm "
    "FROM m"
)

ANALYTICS5_QUERIES["orders_seasonality"] = q_orders_seasonality
ANALYTICS5_ORACLES["orders_seasonality"] = SQL_SEASONALITY


# ----------------------------------------------------------------------
# Lag-1 autocorrelation of daily event counts
# ----------------------------------------------------------------------
def q_events_daily_autocorr(sf_dir):
    """Day-over-day persistence of traffic: lag-1 Pearson
    autocorrelation of the daily event-count series (observed days in
    ascending order). With S = Σc and n days, r1 = Σ_{t<n}(n·c_t −
    S)(n·c_{t+1} − S) / Σ_t (n·c_t − S)² — every term exact int64, one
    double at the end (the lineitem_corr device on the time axis)."""
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        d = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64) // DAY_US
        u, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"day": pa.array(u, pa.int64()), "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    days = (
        sum_by_key(ev.map_batches(partial, batch_format="pyarrow"), "day", ["c"])
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    c = days["c"].to_numpy(np.int64)
    n = len(c)
    S = int(c.sum())
    dev = n * c - S
    num = int((dev[:-1] * dev[1:]).sum())
    den = int((dev * dev).sum())
    r1 = round(float(num) / float(den), 7) if den else 0.0
    return pd.DataFrame(
        {"n_days": [n], "total": [S], "num": [num], "den": [den], "r1": [r1]}
    ).astype({"n_days": "int64", "total": "int64", "num": "int64", "den": "int64", "r1": "float64"})


SQL_DAILY_AUTOCORR = (
    "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS c "
    "FROM events GROUP BY 1), "
    "s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS tot FROM d), "
    "v AS (SELECT (SELECT n FROM s) * c - (SELECT tot FROM s) AS dev, "
    "lead((SELECT n FROM s) * c - (SELECT tot FROM s)) OVER (ORDER BY day) AS nxt FROM d), "
    "m AS (SELECT CAST(sum(CASE WHEN nxt IS NOT NULL THEN dev * nxt ELSE 0 END) AS BIGINT) "
    "AS num, CAST(sum(dev * dev) AS BIGINT) AS den FROM v) "
    "SELECT (SELECT n FROM s) AS n_days, (SELECT tot FROM s) AS total, num, den, "
    "CASE WHEN den <> 0 THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 7) "
    "ELSE 0.0 END AS r1 FROM m"
)

ANALYTICS5_QUERIES["events_daily_autocorr"] = q_events_daily_autocorr
ANALYTICS5_ORACLES["events_daily_autocorr"] = SQL_DAILY_AUTOCORR


# ----------------------------------------------------------------------
# Supplier lead time (ship − order lag, exact day moments)
# ----------------------------------------------------------------------
def q_supplier_lead_time(sf_dir):
    """Per-supplier fulfillment speed: day lag between each lineitem's
    shipdate and its order's orderdate (negative lags exist in this
    synthetic data, so the mean uses the float-once device, never
    integer division): (suppkey, n_lines, sum_days, avg_days r7)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate"]
    )
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", right_cols=["o_orderdate"])

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        lag = (sd // DAY_US) - (od // DAY_US)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(sk, return_inverse=True)
        return pa.table(
            {
                "suppkey": pa.array(u, pa.int64()),
                "n_lines": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "sum_days": pa.array(np.bincount(inv, weights=lag).astype(np.int64), pa.int64()),
            }
        )

    agg = sum_by_key(
        j.map_batches(partial, batch_format="pyarrow"), "suppkey", ["n_lines", "sum_days"]
    ).to_pandas()
    avg = np.round(
        agg["sum_days"].to_numpy(np.int64).astype(np.float64)
        / agg["n_lines"].to_numpy(np.int64).astype(np.float64),
        7,
    )
    agg["avg_days"] = avg
    return (
        agg.sort_values("suppkey")
        .reset_index(drop=True)
        .astype({"suppkey": "int64", "n_lines": "int64", "sum_days": "int64", "avg_days": "float64"})
    )


SQL_LEAD_TIME = (
    "WITH l AS (SELECT l_suppkey AS suppkey, "
    "CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS lag "
    "FROM lineitem JOIN orders ON o_orderkey = l_orderkey) "
    "SELECT suppkey, CAST(count(*) AS BIGINT) AS n_lines, CAST(sum(lag) AS BIGINT) AS sum_days, "
    "round(CAST(sum(lag) AS DOUBLE) / CAST(count(*) AS DOUBLE), 7) AS avg_days "
    "FROM l GROUP BY 1"
)

ANALYTICS5_QUERIES["supplier_lead_time"] = q_supplier_lead_time
ANALYTICS5_ORACLES["supplier_lead_time"] = SQL_LEAD_TIME


# ----------------------------------------------------------------------
# Local-bridge census (edges with truss support 0)
# ----------------------------------------------------------------------
def local_bridge_census(edges: ray.data.Dataset) -> pd.DataFrame:
    """Local bridges of the simple undirected graph: edges whose
    endpoints share no common neighbor (span > 2 — Easley–Kleinberg's
    weak-tie structure) ⇔ triangle support 0. One per-batch fold over
    the existing edge_support operator: (n_edges, n_local_bridges,
    bridge_ppm). Shared by q_rel_local_bridges and the
    ``local-bridges`` CLI op."""
    from everythinggraph_ray.graph.truss import edge_support

    sup = edge_support(edges)

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["support"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_edges": pa.array([len(s)], pa.int64()),
                "n_local_bridges": pa.array([int((s == 0).sum())], pa.int64()),
            }
        )

    parts = sup.map_batches(partial, batch_format="pyarrow").to_pandas()
    ne = int(parts["n_edges"].sum())
    nb = int(parts["n_local_bridges"].sum())
    return pd.DataFrame(
        {
            "n_edges": [ne],
            "n_local_bridges": [nb],
            "bridge_ppm": [(1_000_000 * nb) // ne if ne else 0],
        }
    ).astype("int64")


def q_rel_local_bridges(sf_dir):
    from everythinggraph_ray.pipelines.queries import rel_edges

    return local_bridge_census(rel_edges(sf_dir))


def _local_bridges_sql() -> str:
    from everythinggraph_ray.pipelines.queries import _sql_graph_prelude

    return (
        "WITH "
        + _sql_graph_prelude(undirect=True)
        + ", ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM e WHERE src <> dst), "
        "br AS (SELECT a, b, CASE WHEN EXISTS (SELECT 1 FROM und n1 JOIN und n2 "
        "ON n2.u = ue.b AND n1.v = n2.v WHERE n1.u = ue.a AND n1.v <> ue.a AND n1.v <> ue.b) "
        "THEN 0 ELSE 1 END AS is_bridge FROM ue) "
        "SELECT CAST(count(*) AS BIGINT) AS n_edges, "
        "CAST(sum(is_bridge) AS BIGINT) AS n_local_bridges, "
        "CAST(1000000 * sum(is_bridge) // count(*) AS BIGINT) AS bridge_ppm FROM br"
    )


ANALYTICS5_QUERIES["rel_local_bridges"] = q_rel_local_bridges
# registration happens when queries.py imports this module at its tail
# (the _bowtie_sql circular-import device)
ANALYTICS5_ORACLES["rel_local_bridges"] = _local_bridges_sql()
