"""Analytics batch (session 10, second wave): the distributed PREFIX
SCAN (SQL running-total window) global and per-key, ordered string_agg,
and per-group OLS regression slope via exact integer moments.

Each is a (ray_fn, oracle_sql) pair on queries.py's exactness
discipline (cents device, integer moments folded distributed-side, ONE
closed-form double at the end — the zipf-slope precedent).

Distributed shapes:
- ``orders_running_revenue`` / ``customer_running_spend``: the
  range-partitioned two-phase scan (stages/agg.py running_sum — local
  inclusive cumsum + scanned per-bucket offsets broadcast once). The
  only driver state is O(groups × range_buckets) int64 offsets; no
  worker ever holds a whole window partition — SQL's
  ``SUM(...) OVER (PARTITION BY ... ORDER BY ...)`` at any scale.
- ``docs_lang_source_agg``: ordered-set aggregate (string_agg of the
  DISTINCT sources per language) — the distinct pairs come from the
  finest-level distributed count; the join to CSV runs on the
  ≤ langs×sources aggregate.
- ``lineitem_price_slope``: per-returnflag OLS slope of price-cents on
  integer quantity — five BIGINT moments per group folded
  distributed-side, the slope's single double division at the end.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, running_sum

ANALYTICS9_QUERIES: dict = {}
ANALYTICS9_ORACLES: dict = {}


# ----------------------------------------------------------------------
# Global running total (prefix scan, no partition)
# ----------------------------------------------------------------------
def q_orders_running_revenue(sf_dir):
    """SUM(revenue cents) OVER (ORDER BY o_orderkey) — the global
    prefix scan over the whole orders table via the range-partitioned
    two-phase running_sum."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "rev_c": pa.array(
                    np.floor(
                        t["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    out = running_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        "o_orderkey",
        "o_orderkey",
        "rev_c",
        out_col="run_revenue_c",
    ).select_columns(["o_orderkey", "run_revenue_c"])
    return _typed_collect(out, {"o_orderkey": "int64", "run_revenue_c": "int64"})


ANALYTICS9_QUERIES["orders_running_revenue"] = q_orders_running_revenue
ANALYTICS9_ORACLES["orders_running_revenue"] = (
    "SELECT o_orderkey, CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
    "OVER (ORDER BY o_orderkey) AS BIGINT) AS run_revenue_c FROM orders"
)


# ----------------------------------------------------------------------
# Per-customer running spend (partitioned scan)
# ----------------------------------------------------------------------
def q_customer_running_spend(sf_dir):
    """SUM(spend cents) OVER (PARTITION BY o_custkey ORDER BY
    o_orderdate, o_orderkey) — the per-key prefix scan; order key is
    the epoch day, o_orderkey the unique tiebreak."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "day": pa.array(
                    od.astype("datetime64[D]").astype(np.int64), pa.int64()
                ),
                "spend_c": pa.array(
                    np.floor(
                        t["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    out = running_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        "day",
        "o_orderkey",
        "spend_c",
        group_col="o_custkey",
        out_col="run_spend_c",
        num_range_buckets=8,
    ).select_columns(["o_orderkey", "o_custkey", "run_spend_c"])
    return _typed_collect(
        out, {"o_orderkey": "int64", "o_custkey": "int64", "run_spend_c": "int64"}
    )


ANALYTICS9_QUERIES["customer_running_spend"] = q_customer_running_spend
ANALYTICS9_ORACLES["customer_running_spend"] = (
    "SELECT o_orderkey, o_custkey, "
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
    "OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey) "
    "AS BIGINT) AS run_spend_c FROM orders"
)


# ----------------------------------------------------------------------
# Ordered string_agg of distinct sources per language
# ----------------------------------------------------------------------
def q_docs_lang_source_agg(sf_dir):
    """string_agg(DISTINCT source, ',' ORDER BY source) per language —
    the ordered-set aggregate. Distinct pairs via the finest-level
    distributed count; the CSV join runs on the driver-sized
    aggregate (reshapes never touch raw rows)."""
    from everythinggraph_ray.pipelines.queries import _lang_source_counts

    counts = _lang_source_counts(sf_dir)
    g = (
        counts.sort_values(["lang", "source"])
        .groupby("lang", as_index=False)
        .agg(sources=("source", ",".join), n_sources=("source", "size"))
    )
    return pa.table(
        {
            "lang": pa.array(g["lang"].to_numpy(object), pa.string()),
            "sources": pa.array(g["sources"].to_numpy(object), pa.string()),
            "n_sources": pa.array(g["n_sources"].to_numpy(np.int64), pa.int64()),
        }
    )


ANALYTICS9_QUERIES["docs_lang_source_agg"] = q_docs_lang_source_agg
ANALYTICS9_ORACLES["docs_lang_source_agg"] = (
    "WITH d AS (SELECT DISTINCT lang, source FROM documents) "
    "SELECT lang, string_agg(source, ',' ORDER BY source) AS sources, "
    "CAST(count(*) AS BIGINT) AS n_sources FROM d GROUP BY lang"
)


# ----------------------------------------------------------------------
# Per-returnflag OLS slope (price cents ~ quantity), integer moments
# ----------------------------------------------------------------------
def q_lineitem_price_slope(sf_dir):
    """OLS slope of extendedprice-cents on integer quantity per
    returnflag: the five moments (n, Σx, Σy, Σxy, Σx²) are exact int64
    sums folded distributed-side; slope = (n·Σxy − Σx·Σy) /
    (n·Σx² − Σx²) rounds its single double once (the zipf device)."""
    from everythinggraph_ray.datapipe.joins import _key_hash
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        x = np.round(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas().to_numpy(object),
                "n": np.ones(len(x), np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("l_returnflag", as_index=False).sum(), preserve_index=False
        )

    def bucket_of(t: pa.Table) -> np.ndarray:
        return _key_hash(t, ["l_returnflag"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("l_returnflag", as_index=False).sum()
        num = df["n"] * df["sxy"] - df["sx"] * df["sy"]
        den = df["n"] * df["sxx"] - df["sx"] * df["sx"]
        df["slope"] = np.where(
            den != 0, np.round(num.astype(float) / den.astype(float), 7), 0.0
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = bucketed_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), bucket_of, red, num_buckets=4
    )
    return _typed_collect(
        out,
        {
            "l_returnflag": "object",
            "n": "int64",
            "sx": "int64",
            "sy": "int64",
            "sxy": "int64",
            "sxx": "int64",
            "slope": "float64",
        },
    )


ANALYTICS9_QUERIES["lineitem_price_slope"] = q_lineitem_price_slope
ANALYTICS9_ORACLES["lineitem_price_slope"] = (
    "WITH m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sx, "
    "CAST(sum(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sy, "
    "CAST(sum(CAST(ROUND(l_quantity) AS BIGINT) * "
    "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sxy, "
    "CAST(sum(CAST(ROUND(l_quantity) AS BIGINT) * CAST(ROUND(l_quantity) AS BIGINT)) "
    "AS BIGINT) AS sxx FROM lineitem GROUP BY l_returnflag) "
    "SELECT l_returnflag, n, sx, sy, sxy, sxx, "
    "CASE WHEN n * sxx - sx * sx <> 0 THEN "
    "round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 7) "
    "ELSE 0.0 END AS slope FROM m"
)
