"""Analytics batch (session 10, fifth wave): Apriori level-3 frequent
itemsets (candidate-pruned triple mining), Holt double-exponential
smoothing on an exact integer grid, and ABC (Pareto-class) revenue
analysis riding the distributed prefix scan.

Distributed shapes:
- ``part_triples``: the Apriori step UP from part_copurchase — the
  frequent-PAIR set (support-pruned, the bounded small side Apriori
  assumes) broadcasts once via ray.put as packed int64 keys; triple
  emission stays inside the order-bucketed co-group (orders co-locate
  by orderkey hash; TPC-H bounds an order at 7 lineitems so the
  per-order triple blowup is ≤ 35) and every candidate is pruned by
  all three sub-pairs BEFORE the triple shuffle; global counts via the
  two-key bucketed sum with (b, c) packed into one 62-bit key.
- ``events_holt``: level+trend smoothing (α=β=1/2) over the per-day
  value totals. Day totals fold distributed (per-batch partials →
  calendar-bounded day table, the monthly_growth device); the
  recursion itself is inherently serial and runs on the driver's tiny
  day table in exact integer milli-units with TRUNC division —
  DuckDB's ``//`` truncates toward zero on negatives where Python
  floors, and the trend goes negative, so the shared grid is trunc.
- ``orders_abc``: inventory ABC classes — parts ranked by revenue
  DESC, cumulative share via the exact distributed prefix scan
  (stages/agg.py running_sum over the negated-revenue order key),
  class gates 80% / 95% in exact integer cross-multiplies, 3-row
  class rollup.

Every surfaced value is int64 (cents / milli / counts) so the driver's
value hash is summation-order-proof.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from everythinggraph_ray.stages.agg import (
    bucketed_reduce,
    mix64,
    running_sum,
    sum_by_key,
    sum_by_key_pair,
)

ANALYTICS12_QUERIES: dict = {}
ANALYTICS12_ORACLES: dict = {}

TRIPLE_MINSUP = 2
HOLT_SCALE = 1000  # value milli-units


# ----------------------------------------------------------------------
# Apriori level 3: frequent part triples
# ----------------------------------------------------------------------
def q_part_triples(sf_dir):
    """Frequent co-purchased part TRIPLES (a < b < c, support >=
    TRIPLE_MINSUP) with Apriori candidate pruning: a triple is emitted
    only if all three of its pairs are frequent (the downward-closure
    prune, applied inside the order bucket before anything shuffles).
    Precondition: partkey < 2^31 (packed pair/triple keys)."""
    from everythinggraph_ray.pipelines.queries import (
        COPURCHASE_MINSUP,
        _typed_collect,
        q_part_copurchase,
    )

    pairs = q_part_copurchase(sf_dir)  # (a, b, cnt >= COPURCHASE_MINSUP)

    def pack_pairs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"pk": pa.array((a << np.int64(31)) | b, pa.int64())})

    freq = np.sort(
        pairs.map_batches(pack_pairs, batch_format="pyarrow")
        .to_pandas()["pk"]
        .to_numpy(np.int64)
    )
    # the frequent-pair set is Apriori's bounded broadcast side (support
    # pruning caps it); ray.put ONCE, read per bucket group
    freq_ref = ray.put(freq)

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"]
    )

    def bucket_ok(b: pa.Table) -> np.ndarray:
        return mix64(b["l_orderkey"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        ) & 0x7FFFFFFF

    def emit_triples(g: pa.Table) -> pa.Table:
        fr = ray.get(freq_ref)
        df = g.to_pandas().drop_duplicates()
        if df["l_partkey"].max() >= (1 << 31):
            raise ValueError("part_triples packs partkeys into 31 bits")
        m = df.merge(df, on="l_orderkey", suffixes=("_x", "_y"))
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        m = m.merge(df.rename(columns={"l_partkey": "l_partkey_z"}), on="l_orderkey")
        m = m[m["l_partkey_y"] < m["l_partkey_z"]]
        a = m["l_partkey_x"].to_numpy(np.int64)
        b = m["l_partkey_y"].to_numpy(np.int64)
        c = m["l_partkey_z"].to_numpy(np.int64)
        # downward closure: all three sub-pairs frequent
        keep = (
            (np.searchsorted(fr, (a << 31) | b, "right") - np.searchsorted(fr, (a << 31) | b, "left") > 0)
            & (np.searchsorted(fr, (a << 31) | c, "right") - np.searchsorted(fr, (a << 31) | c, "left") > 0)
            & (np.searchsorted(fr, (b << 31) | c, "right") - np.searchsorted(fr, (b << 31) | c, "left") > 0)
        )
        cand = pd.DataFrame({"a": a[keep], "b": b[keep], "c": c[keep]})
        # per-bucket pre-count (combiner) before the triple shuffle
        cc = cand.groupby(["a", "b", "c"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                "a": pa.array(cc["a"].to_numpy(np.int64), pa.int64()),
                "bc": pa.array(
                    (cc["b"].to_numpy(np.int64) << np.int64(31))
                    | cc["c"].to_numpy(np.int64),
                    pa.int64(),
                ),
                "cnt": pa.array(cc["cnt"].to_numpy(np.int64), pa.int64()),
            }
        )

    cand = bucketed_reduce(li, bucket_ok, emit_triples)
    counts = sum_by_key_pair(cand, "a", "bc", ["cnt"])

    def unpack(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t["cnt"], TRIPLE_MINSUP)
        t = t.filter(keep)
        bc = t["bc"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": t["a"],
                "b": pa.array(bc >> np.int64(31), pa.int64()),
                "c": pa.array(bc & np.int64((1 << 31) - 1), pa.int64()),
                "cnt": t["cnt"],
            }
        )

    out = counts.map_batches(unpack, batch_format="pyarrow")
    assert COPURCHASE_MINSUP <= TRIPLE_MINSUP  # prune must not lose triples
    return _typed_collect(
        out, {"a": "int64", "b": "int64", "c": "int64", "cnt": "int64"}
    )


ANALYTICS12_QUERIES["part_triples"] = q_part_triples
ANALYTICS12_ORACLES["part_triples"] = (
    "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) "
    "SELECT l1.l_partkey AS a, l2.l_partkey AS b, l3.l_partkey AS c, "
    "CAST(count(*) AS BIGINT) AS cnt "
    "FROM d l1 JOIN d l2 ON l1.l_orderkey = l2.l_orderkey "
    "AND l1.l_partkey < l2.l_partkey "
    "JOIN d l3 ON l1.l_orderkey = l3.l_orderkey "
    "AND l2.l_partkey < l3.l_partkey "
    f"GROUP BY 1, 2, 3 HAVING count(*) >= {TRIPLE_MINSUP}"
)


# ----------------------------------------------------------------------
# Holt double-exponential smoothing (integer grid, trunc division)
# ----------------------------------------------------------------------
def _tdiv2(x: int) -> int:
    """Truncate-toward-zero halving — DuckDB's ``//`` semantics (Python's
    ``//`` floors, which differs on the negative trend values)."""
    return -((-x) // 2) if x < 0 else x // 2


def q_events_holt(sf_dir):
    """Holt level+trend smoothing (α=β=1/2) of the daily value-milli
    totals: s_t = trunc((v_t + s_{t-1} + b_{t-1})/2), b_t =
    trunc((s_t − s_{t-1} + b_{t-1})/2), s_1 = v_1, b_1 = 0. Day totals
    fold distributed (per-batch (day, Σv, ) partials); the inherently
    serial 2-state recursion runs over the calendar-bounded day table
    on the driver — same device as orders_monthly_growth."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        day = (
            t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        )
        v = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * HOLT_SCALE + 0.5
        ).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "v": pa.array(np.bincount(inv, weights=v).astype(np.int64), pa.int64()),
            }
        )

    days = (
        ev.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("day", as_index=False)["v"]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    s = int(days["v"].iloc[0])
    b = 0
    lev, tre = [s], [0]
    for v in days["v"].iloc[1:]:
        s_new = _tdiv2(int(v) + s + b)
        b = _tdiv2(s_new - s + b)
        s = s_new
        lev.append(s)
        tre.append(b)
    days["level_milli"] = np.array(lev, np.int64)
    days["trend_milli"] = np.array(tre, np.int64)
    days["forecast_milli"] = days["level_milli"] + days["trend_milli"]
    return days.astype("int64")


ANALYTICS12_QUERIES["events_holt"] = q_events_holt
ANALYTICS12_ORACLES["events_holt"] = (
    "WITH RECURSIVE dd AS (SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, "
    f"CAST(SUM(CAST(FLOOR(value * {HOLT_SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS v "
    "FROM events GROUP BY 1), "
    "days AS (SELECT day, v, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM dd), "
    "h AS (SELECT rn, day, v, v AS s, CAST(0 AS BIGINT) AS b FROM days WHERE rn = 1 "
    "UNION ALL "
    "SELECT d.rn, d.day, d.v, (d.v + h.s + h.b) // 2, "
    "((d.v + h.s + h.b) // 2 - h.s + h.b) // 2 "
    "FROM days d JOIN h ON d.rn = h.rn + 1) "
    "SELECT day, v, s AS level_milli, b AS trend_milli, "
    "s + b AS forecast_milli FROM h"
)


# ----------------------------------------------------------------------
# ABC / Pareto revenue classes over the prefix scan
# ----------------------------------------------------------------------
def q_orders_abc(sf_dir):
    """Inventory ABC analysis: parts ranked by lineitem revenue DESC;
    class A = parts whose cumulative revenue share is ≤ 80%, B ≤ 95%,
    C the rest (gates as exact integer cross-multiplies — no float
    share). The cumulative sum is the exact distributed prefix scan
    (running_sum) over the NEGATED-revenue order key (partkey
    tiebreak), so no worker holds the whole ranked table."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        u, inv = np.unique(pk, return_inverse=True)
        return pa.table(
            {
                "l_partkey": pa.array(u, pa.int64()),
                "rev": pa.array(np.bincount(inv, weights=cents).astype(np.int64), pa.int64()),
            }
        )

    rev = sum_by_key(li.map_batches(partial, batch_format="pyarrow"), "l_partkey", ["rev"])
    total = int(
        rev.map_batches(
            lambda t: pa.table(
                {"s": pa.array([t["rev"].to_numpy(zero_copy_only=False).sum()], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["s"]
        .sum()
    )

    def neg(t: pa.Table) -> pa.Table:
        return t.append_column(
            "neg_rev",
            pa.array(-t["rev"].to_numpy(zero_copy_only=False), pa.int64()),
        )

    scanned = running_sum(
        rev.map_batches(neg, batch_format="pyarrow"),
        "neg_rev",
        "l_partkey",
        "rev",
        out_col="cum",
    )

    def classify(t: pa.Table) -> pa.Table:
        cum = t["cum"].to_numpy(zero_copy_only=False)
        rv = t["rev"].to_numpy(zero_copy_only=False)
        cls = np.where(
            100 * cum <= 80 * total, "A", np.where(100 * cum <= 95 * total, "B", "C")
        )
        df = pd.DataFrame({"cls": cls, "rev": rv})
        g = df.groupby("cls", as_index=False).agg(
            n_parts=("rev", "size"), rev_cents=("rev", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # per-batch partials → 3-key driver fold (class cardinality is 3)
    parts = scanned.map_batches(classify, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("cls", as_index=False)
        .sum()
        .astype({"n_parts": "int64", "rev_cents": "int64"})
    )
    return _typed_collect(
        ray.data.from_pandas(out),
        {"cls": "object", "n_parts": "int64", "rev_cents": "int64"},
    )


ANALYTICS12_QUERIES["orders_abc"] = q_orders_abc
ANALYTICS12_ORACLES["orders_abc"] = (
    "WITH pr AS (SELECT l_partkey, "
    "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev "
    "FROM lineitem GROUP BY 1), "
    "tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS t FROM pr), "
    "r AS (SELECT l_partkey, rev, SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum FROM pr) "
    "SELECT CASE WHEN 100 * cum <= 80 * tot.t THEN 'A' "
    "WHEN 100 * cum <= 95 * tot.t THEN 'B' ELSE 'C' END AS cls, "
    "CAST(count(*) AS BIGINT) AS n_parts, CAST(SUM(rev) AS BIGINT) AS rev_cents "
    "FROM r, tot GROUP BY 1"
)
