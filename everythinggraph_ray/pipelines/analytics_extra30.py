"""Analytics batch (session 12, fourteenth wave): Z-order codes,
post-dominators, and ISO-week aggregation.

Distributed shapes:
- ``cust_zorder``: Morton (Z-order) interleaving of the derived
  (key%97, key·31%89) grid coordinates — the space-filling-curve sort
  key behind clustered storage layouts (Delta Z-ORDER BY, HBase salt
  keys): one vectorized bit-interleave pass, no shuffle; the oracle is
  the same 7-bit interleave as explicit SQL bit arithmetic.
- ``rel_postdominators``: the exact dual of ``rel_dominators`` —
  LandmarkDominatorKernel over the REVERSED rel build (its own cached
  build dir), root = min vid as the exit node. One kernel, two
  analyses: the point of the semiring registry.
- ``orders_iso_week_revenue``: revenue millis by ISO-8601 (year,
  week) — the calendar aggregation whose year-boundary weeks (Jan 1
  belonging to the PREVIOUS iso year) break naive date_trunc
  pipelines; per-batch isocalendar partials + the two-key bucketed
  sum.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import sum_by_key_pair

ANALYTICS30_QUERIES: dict = {}
ANALYTICS30_ORACLES: dict = {}

Z_BITS = 7  # 97, 89 < 2^7
Z_PX = 97
Z_PY = 89


# ----------------------------------------------------------------------
# Z-order (Morton) codes
# ----------------------------------------------------------------------
def q_cust_zorder(sf_dir):
    """(custkey, zcode): 14-bit Morton interleave of the derived grid
    coordinates (x bits even, y bits odd)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )

    def z(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = k % Z_PX
        y = (k * 31) % Z_PY
        code = np.zeros(len(k), np.int64)
        for i in range(Z_BITS):
            code |= ((x >> i) & 1) << (2 * i)
            code |= ((y >> i) & 1) << (2 * i + 1)
        return pa.table(
            {
                "custkey": pa.array(k, pa.int64()),
                "zcode": pa.array(code, pa.int64()),
            }
        )

    return _typed_collect(
        cust.map_batches(z, batch_format="pyarrow"),
        {"custkey": "int64", "zcode": "int64"},
    )


ANALYTICS30_QUERIES["cust_zorder"] = q_cust_zorder


def _zorder_sql() -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(((x >> {i}) & 1) << {2 * i})")
        terms.append(f"(((y >> {i}) & 1) << {2 * i + 1})")
    return (
        f"WITH p AS (SELECT c_custkey AS k, c_custkey % {Z_PX} AS x, "
        f"(c_custkey * 31) % {Z_PY} AS y FROM customer) "
        f"SELECT k AS custkey, CAST({' | '.join(terms)} AS BIGINT) AS zcode FROM p"
    )


ANALYTICS30_ORACLES["cust_zorder"] = _zorder_sql()


# ----------------------------------------------------------------------
# post-dominators (the kernel's dual on the reversed build)
# ----------------------------------------------------------------------
def q_rel_postdominators(sf_dir):
    """(vid, pdom_mask): landmark post-dominators — the dominator
    dataflow on the edge-reversed rel digraph, exit = min vid."""
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import LandmarkDominatorKernel
    from everythinggraph_ray.pipelines.analytics_extra29 import DOM_LANDMARKS
    from everythinggraph_ray.pipelines.flagship import build_dir_for
    from everythinggraph_ray.pipelines.queries import (
        _run_engine,
        _typed_collect,
        rel_edges,
    )
    from everythinggraph_ray.stages.edges import reverse_edges

    def mins(t: pa.Table) -> pa.Table:
        vs = np.unique(
            np.r_[
                t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False),
            ]
        )[:DOM_LANDMARKS]
        return pa.table({"v": pa.array(vs, pa.int64())})

    cand = rel_edges(sf_dir).map_batches(mins, batch_format="pyarrow").to_pandas()
    land = np.unique(cand["v"].to_numpy(np.int64))[:DOM_LANDMARKS]
    bits = {int(v): i for i, v in enumerate(land)}
    root = int(land[0])

    bdir = build_dir_for(f"relrev|{sf_dir}", 8)
    build_graph(
        reverse_edges(rel_edges(sf_dir)), bdir, num_partitions=8, hub_threshold=10**9
    )
    df = _run_engine(bdir, LandmarkDominatorKernel(root, bits))
    out = df.rename(columns={"dominators": "pdom_mask"})[["vid", "pdom_mask"]]
    out["pdom_mask"] = out["pdom_mask"].astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out.reset_index(drop=True)),
        {"vid": "int64", "pdom_mask": "int64"},
    )


ANALYTICS30_QUERIES["rel_postdominators"] = q_rel_postdominators
# no SQL oracle (meet-over-paths); pytest: postdom ≡ dominators of the
# reversed edge list under the serial fixpoint.


# ----------------------------------------------------------------------
# ISO-week revenue
# ----------------------------------------------------------------------
def q_orders_iso_week_revenue(sf_dir):
    """(iso_year, iso_week, rev_milli): order revenue by ISO-8601
    calendar week (year-boundary weeks attach to the ISO year)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        d = pd.to_datetime(
            t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        )
        iso = d.isocalendar()
        rev = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "iso_year": iso["year"].to_numpy(np.int64),
                "iso_week": iso["week"].to_numpy(np.int64),
                "rev_milli": rev,
            }
        )
        g = df.groupby(["iso_year", "iso_week"], as_index=False)["rev_milli"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    res = sum_by_key_pair(
        orders.map_batches(partial, batch_format="pyarrow"),
        "iso_year",
        "iso_week",
        ["rev_milli"],
    )
    return _typed_collect(
        res, {"iso_year": "int64", "iso_week": "int64", "rev_milli": "int64"}
    )


ANALYTICS30_QUERIES["orders_iso_week_revenue"] = q_orders_iso_week_revenue

ANALYTICS30_ORACLES["orders_iso_week_revenue"] = (
    "SELECT CAST(isoyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_year, "
    "CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week, "
    "SUM(CAST(FLOOR(o_totalprice * 1000 + 0.5) AS BIGINT)) AS rev_milli "
    "FROM orders GROUP BY 1, 2"
)
