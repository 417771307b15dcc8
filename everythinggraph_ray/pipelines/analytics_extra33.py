"""Analytics batch (session 12, seventeenth wave): SCD-2 validity
intervals.

Distributed shape:
- ``orders_scd2_priority``: the slowly-changing-dimension type-2
  history — per customer, the runs of CONSECUTIVE-distinct
  o_orderpriority in (orderdate, orderkey) order become validity rows
  (custkey, priority, valid_from_day, valid_to_day), half-open with
  the successor run's start as valid_to and −1 for the open current
  row. One customer-bucketed co-group; run detection is the CEP
  boolean-flag device, valid_to one shifted lookup. The oracle is the
  textbook double-ROW_NUMBER islands + LEAD lowering.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

ANALYTICS33_QUERIES: dict = {}
ANALYTICS33_ORACLES: dict = {}


def q_orders_scd2_priority(sf_dir):
    """(custkey, priority, valid_from_day, valid_to_day): SCD-2 runs of
    order priority per customer; valid_to −1 = still current."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def prep(t: pa.Table) -> pa.Table:
        d = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "cust": t["o_custkey"],
                "ok": t["o_orderkey"],
                "day": pa.array(d, pa.int64()),
                "prio": t["o_orderpriority"],
            }
        )

    def cust_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["cust"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def runs(g: pa.Table) -> pa.Table:
        c = g["cust"].to_numpy(zero_copy_only=False)
        ok = g["ok"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        pr = np.asarray(g["prio"].to_pylist(), object)
        o = np.lexsort((ok, d, c))
        c, d, pr = c[o], d[o], pr[o]
        new = np.r_[True, (c[1:] != c[:-1]) | (pr[1:] != pr[:-1])]
        starts = np.flatnonzero(new)
        run_cust = c[starts]
        run_prio = pr[starts]
        run_from = d[starts]
        # valid_to = next run's start day if same customer else -1
        nxt_from = np.r_[run_from[1:], np.int64(-1)]
        nxt_cust = np.r_[run_cust[1:], np.int64(-1)]
        valid_to = np.where(nxt_cust == run_cust, nxt_from, -1)
        return pa.table(
            {
                "custkey": pa.array(run_cust, pa.int64()),
                "priority": pa.array(run_prio.tolist(), pa.string()),
                "valid_from_day": pa.array(run_from, pa.int64()),
                "valid_to_day": pa.array(valid_to, pa.int64()),
            }
        )

    res = bucketed_reduce(
        orders.map_batches(prep, batch_format="pyarrow"), cust_bucket, runs
    )
    return _typed_collect(
        res,
        {
            "custkey": "int64",
            "priority": "object",
            "valid_from_day": "int64",
            "valid_to_day": "int64",
        },
    )


ANALYTICS33_QUERIES["orders_scd2_priority"] = q_orders_scd2_priority

ANALYTICS33_ORACLES["orders_scd2_priority"] = (
    "WITH t AS (SELECT o_custkey AS cust, o_orderkey AS ok, "
    "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, "
    "o_orderpriority AS prio FROM orders), "
    "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cust ORDER BY day, ok) "
    "- ROW_NUMBER() OVER (PARTITION BY cust, prio ORDER BY day, ok) AS grp FROM t), "
    "isl AS (SELECT cust, prio, MIN(day) AS valid_from_day, "
    "MIN(day * 1048576 + ok) AS first_key FROM r "
    "GROUP BY cust, prio, grp) "
    "SELECT cust AS custkey, prio AS priority, valid_from_day, "
    "CAST(COALESCE(LEAD(valid_from_day) OVER "
    "(PARTITION BY cust ORDER BY first_key), -1) AS BIGINT) AS valid_to_day "
    "FROM isl"
)
