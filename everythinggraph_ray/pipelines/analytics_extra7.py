"""Analytics batch (session 9, fifth wave): TPC-H Q11-lite (completing
all 22 TPC-H query shapes), the joint degree matrix, customer-spend
Gini, the power-law exponent of user activity, and the Theil inequality
index of lineitem revenue.

Each is a (ray_fn, oracle_sql) pair on queries.py's exactness
discipline: integer moments distributed-side, at most ONE double at the
end written token-for-token on both sides; ln values quantized to 1e6
BEFORE summation where a sum of logs is needed (the zipf-slope device).

Distributed shapes:
- ``q11_part_value``: per-part revenue cents via ``sum_by_key``, the
  "important parts" gate is the scale-free integer cross-multiply
  2·n·v > 3·total (v > 1.5× the average part value) — TPC-H Q11's
  HAVING against a scalar subquery, without the SF-tuned fraction.
- ``rel_jdm``: the joint degree matrix in log2 degree classes — the
  assortativity structure at class granularity. Two bucketed degree
  attaches (the triangles machinery), one pair-sum over unordered
  (lo, hi) class pairs.
- ``orders_customer_gini``: spend cents per customer ranked by the
  distributed window primitive; the Gini closed form runs on three
  exact integer moments (the degree-Gini device on money).
- ``events_powerlaw_alpha``: continuous-MLE exponent of the per-user
  activity distribution (xmin = 1, Clauset-style): α = 1 + n/Σ ln(2x)
  with each ln quantized to 1e6 before the exact integer sum.
- ``lineitem_theil``: Theil T index of revenue concentration:
  T = Σ xᵢ·ln(xᵢ)/X − ln(X/n), with Σ xᵢ·⌊ln(xᵢ)·1e6⌋ exact int64 and
  one closed-form double at the end.
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
    grouped_row_number,
    mix64,
    sum_by_key,
    sum_by_key_pair,
)

ANALYTICS7_QUERIES: dict = {}
ANALYTICS7_ORACLES: dict = {}

LOG_SCALE = 1_000_000


# ----------------------------------------------------------------------
# TPC-H Q11-lite: parts holding outsized revenue (scale-free gate)
# ----------------------------------------------------------------------
def q_q11_part_value(sf_dir):
    """Q11's shape on this schema (lineitem revenue stands in for
    partsupp stock value): per-part revenue in exact cents, keeping
    parts worth more than 1.5× the average part (integer cross-multiply
    2·n·v > 3·total — scale-free, unlike Q11's SF-tuned fraction).
    Completes the TPC-H-lite suite: all 22 query shapes now have a
    hash-checked analogue."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        v = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 100
            + 0.5
        ).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(p, return_inverse=True)
        return pa.table(
            {
                "partkey": pa.array(u, pa.int64()),
                "value_c": pa.array(np.bincount(inv, weights=v).astype(np.int64), pa.int64()),
            }
        )

    pv = sum_by_key(
        li.map_batches(partial, batch_format="pyarrow"), "partkey", ["value_c"]
    ).materialize()  # small per-part aggregate, read twice (total + gate)
    n = pv.count()
    total = int(pv.sum("value_c"))

    def gate(t: pa.Table, n=n, total=total) -> pa.Table:
        v = t["value_c"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(2 * n * v > 3 * total))

    out = pv.map_batches(gate, batch_format="pyarrow").to_pandas()
    return out.sort_values("partkey").reset_index(drop=True).astype("int64")


SQL_Q11 = (
    "WITH pv AS (SELECT l_partkey AS partkey, "
    "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) "
    "AS BIGINT) AS value_c FROM lineitem GROUP BY 1), "
    "t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(value_c) AS BIGINT) AS s FROM pv) "
    "SELECT partkey, value_c FROM pv "
    "WHERE 2 * (SELECT n FROM t) * value_c > 3 * (SELECT s FROM t)"
)

ANALYTICS7_QUERIES["q11_part_value"] = q_q11_part_value
ANALYTICS7_ORACLES["q11_part_value"] = SQL_Q11


# ----------------------------------------------------------------------
# Joint degree matrix in log2 degree classes
# ----------------------------------------------------------------------
def jdm_classes(edges: ray.data.Dataset) -> pd.DataFrame:
    """Joint degree matrix of the simple undirected graph: for every
    distinct edge, the unordered pair of endpoint DEGREE CLASSES
    (class = bit_length(deg), i.e. log2 buckets) — the
    class-granularity view behind rel_assortativity (which edges exist:
    hub–hub or hub–leaf?). Two bucketed degree attaches + one pair-sum;
    output is O(log²V) rows. Shared by q_rel_jdm and the ``jdm`` CLI op."""
    from everythinggraph_ray.graph.triangles import _canonical_undirected

    ue = _canonical_undirected(edges)

    def explode(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False)
        b = t["dst"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table(
            {"vid": pa.array(u, pa.int64()), "deg": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    deg = sum_by_key(ue.map_batches(explode, batch_format="pyarrow"), "vid", ["deg"])
    j = hash_join(ue, deg, on="src", right_on="vid", right_cols=["deg"])
    j = j.map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"], "deg_a": t["deg"]}),
        batch_format="pyarrow",
    )
    j = hash_join(j, deg, on="dst", right_on="vid", right_cols=["deg"])

    def classes(t: pa.Table) -> pa.Table:
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        db = t["deg"].to_numpy(zero_copy_only=False)
        # class = bit_length(deg); deg >= 1 always (the vertex has this edge)
        ca = np.floor(np.log2(da)).astype(np.int64) + 1
        cb = np.floor(np.log2(db)).astype(np.int64) + 1
        lo = np.minimum(ca, cb)
        hi = np.maximum(ca, cb)
        key = lo * 1000 + hi
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "class_lo": pa.array(u // 1000, pa.int64()),
                "class_hi": pa.array(u % 1000, pa.int64()),
                "n_edges": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    out = sum_by_key_pair(
        j.map_batches(classes, batch_format="pyarrow"), "class_lo", "class_hi", ["n_edges"]
    ).to_pandas()
    return out.sort_values(["class_lo", "class_hi"]).reset_index(drop=True).astype("int64")


def q_rel_jdm(sf_dir):
    from everythinggraph_ray.pipelines.queries import rel_edges

    return jdm_classes(rel_edges(sf_dir))


def _jdm_sql() -> str:
    from everythinggraph_ray.pipelines.queries import _sql_graph_prelude

    return (
        "WITH "
        + _sql_graph_prelude()
        + ", ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM e WHERE src <> dst), "
        "d AS (SELECT u AS vid, CAST(count(*) AS BIGINT) AS deg FROM "
        "(SELECT a AS u FROM ue UNION ALL SELECT b FROM ue) GROUP BY 1), "
        "c AS (SELECT ue.a, ue.b, "
        "CAST(floor(log2(da.deg)) AS BIGINT) + 1 AS ca, "
        "CAST(floor(log2(db.deg)) AS BIGINT) + 1 AS cb "
        "FROM ue JOIN d da ON da.vid = ue.a JOIN d db ON db.vid = ue.b) "
        "SELECT least(ca, cb) AS class_lo, greatest(ca, cb) AS class_hi, "
        "CAST(count(*) AS BIGINT) AS n_edges FROM c GROUP BY 1, 2"
    )


ANALYTICS7_QUERIES["rel_jdm"] = q_rel_jdm


# ----------------------------------------------------------------------
# Customer-spend Gini (the degree-Gini device on money)
# ----------------------------------------------------------------------
def q_orders_customer_gini(sf_dir):
    """Gini coefficient of total order spend per customer — revenue
    concentration (who pays the bills). Exact integer surface: rank
    customers by (spend, custkey) through the distributed window
    primitive, then gini_ppm = (2·Σ rank·x − (n+1)·Σ x)·1e6 // (n·Σ x)
    in Python-int driver arithmetic (HUGEINT analogue)."""
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        c = batch["o_custkey"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(c, return_inverse=True)
        return pa.table(
            {
                "custkey": pa.array(u, pa.int64()),
                "spend_c": pa.array(np.bincount(inv, weights=cents).astype(np.int64), pa.int64()),
            }
        )

    spend = sum_by_key(
        orders.map_batches(partial, batch_format="pyarrow"), "custkey", ["spend_c"]
    )
    ranked = grouped_row_number(spend, None, "spend_c", "custkey")

    def moments(batch: pa.Table) -> pa.Table:
        x = batch["spend_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "srx": pa.array([int((r * x).sum())], pa.int64()),
            }
        )

    p = ranked.map_batches(moments, batch_format="pyarrow").to_pandas()
    n, sx, srx = int(p["n"].sum()), int(p["sx"].sum()), int(p["srx"].sum())
    gini_ppm = (2 * srx - (n + 1) * sx) * 1_000_000 // (n * sx)
    return pd.DataFrame(
        {"n_customers": [n], "total_spend_c": [sx], "gini_ppm": [gini_ppm]}
    ).astype("int64")


SQL_CUSTOMER_GINI = (
    "WITH s AS (SELECT o_custkey, "
    "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x "
    "FROM orders GROUP BY 1), "
    "r AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS rk FROM s), "
    "m AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS sx, "
    "CAST(sum(rk * x) AS HUGEINT) AS srx FROM r) "
    "SELECT CAST(n AS BIGINT) AS n_customers, CAST(sx AS BIGINT) AS total_spend_c, "
    "CAST((2 * srx - (n + 1) * sx) * 1000000 // (n * sx) AS BIGINT) AS gini_ppm FROM m"
)

ANALYTICS7_QUERIES["orders_customer_gini"] = q_orders_customer_gini
ANALYTICS7_ORACLES["orders_customer_gini"] = SQL_CUSTOMER_GINI


# ----------------------------------------------------------------------
# Power-law exponent of user activity (continuous MLE, xmin = 1)
# ----------------------------------------------------------------------
def q_events_powerlaw_alpha(sf_dir):
    """Clauset-style continuous-MLE power-law exponent over per-user
    event counts with xmin = 1: α = 1 + n / Σ ln(xᵢ / 0.5) = 1 + n /
    Σ ln(2·xᵢ). Each ln runs over the exact integer 2·xᵢ and is
    quantized to 1e6 BEFORE the sum (the zipf device), so the sum is
    int64-exact on both sides; α is one double at the end."""
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(batch["user_id"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "x": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    counts = sum_by_key(ev.map_batches(partial, batch_format="pyarrow"), "user_id", ["x"])

    def moments(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.floor(np.log(2 * x.astype(np.float64)) * LOG_SCALE).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sq": pa.array([int(q.sum())], pa.int64()),
            }
        )

    p = counts.map_batches(moments, batch_format="pyarrow").to_pandas()
    n, sq = int(p["n"].sum()), int(p["sq"].sum())
    alpha = round(1.0 + float(n) * LOG_SCALE / float(sq), 7) if sq else 0.0
    return pd.DataFrame({"n_users": [n], "sum_qlog": [sq], "alpha": [alpha]}).astype(
        {"n_users": "int64", "sum_qlog": "int64", "alpha": "float64"}
    )


SQL_POWERLAW = (
    "WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1), "
    f"q AS (SELECT CAST(floor(ln(2 * x) * {LOG_SCALE}) AS BIGINT) AS q FROM c), "
    "m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS sq FROM q) "
    "SELECT n AS n_users, sq AS sum_qlog, "
    f"CASE WHEN sq <> 0 THEN round(1.0 + CAST(n AS DOUBLE) * {LOG_SCALE} / CAST(sq AS DOUBLE), 7) "
    "ELSE 0.0 END AS alpha FROM m"
)

ANALYTICS7_QUERIES["events_powerlaw_alpha"] = q_events_powerlaw_alpha
ANALYTICS7_ORACLES["events_powerlaw_alpha"] = SQL_POWERLAW


# ----------------------------------------------------------------------
# Theil T index of lineitem revenue concentration
# ----------------------------------------------------------------------
def q_lineitem_theil(sf_dir):
    """Theil T inequality of per-lineitem revenue (cents):
    T = Σ xᵢ·ln(xᵢ)/X − ln(X/n). The weighted log sum rides as
    Σ xᵢ·⌊ln(xᵢ)·1e6⌋ — exact int64 per batch, summed exactly — and the
    closed form is one double at the end, token-identical in SQL."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice", "l_discount"]
    )

    def moments(batch: pa.Table) -> pa.Table:
        x = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 100
            + 0.5
        ).astype(np.int64)
        x = x[x > 0]
        q = np.floor(np.log(x.astype(np.float64)) * LOG_SCALE).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sxq": pa.array([int((x * q).sum())], pa.int64()),
            }
        )

    p = li.map_batches(moments, batch_format="pyarrow").to_pandas()
    n, sx, sxq = int(p["n"].sum()), int(p["sx"].sum()), int(p["sxq"].sum())
    theil = (
        round(
            float(sxq) / (LOG_SCALE * float(sx)) - float(np.log(float(sx) / n)), 7
        )
        if sx
        else 0.0
    )
    return pd.DataFrame(
        {"n_lines": [n], "total_c": [sx], "sum_xlog": [sxq], "theil": [theil]}
    ).astype({"n_lines": "int64", "total_c": "int64", "sum_xlog": "int64", "theil": "float64"})


SQL_THEIL = (
    "WITH x AS (SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) "
    "AS x FROM lineitem), "
    f"q AS (SELECT x, x * CAST(floor(ln(x) * {LOG_SCALE}) AS BIGINT) AS xq FROM x WHERE x > 0), "
    "m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, "
    "CAST(sum(xq) AS BIGINT) AS sxq FROM q) "
    "SELECT n AS n_lines, sx AS total_c, sxq AS sum_xlog, "
    f"CASE WHEN sx > 0 THEN round(CAST(sxq AS DOUBLE) / ({LOG_SCALE} * CAST(sx AS DOUBLE)) "
    "- ln(CAST(sx AS DOUBLE) / n), 7) ELSE 0.0 END AS theil FROM m"
)

ANALYTICS7_QUERIES["lineitem_theil"] = q_lineitem_theil
ANALYTICS7_ORACLES["lineitem_theil"] = SQL_THEIL

# registration happens when queries.py imports this module at its tail
# (the _bowtie_sql circular-import device)
ANALYTICS7_ORACLES["rel_jdm"] = _jdm_sql()
