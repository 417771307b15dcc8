"""Analytics batch (session 12, fifteenth wave): hierarchical BOM
rollup and a distributed sortedness scan.

Distributed shapes:
- ``part_bom_rollup``: recursive-hierarchy aggregation (the BOM /
  org-chart rollup) over the implicit binary forest parent(p) = p//2
  over 1-based keys (partkeys start at 0): every part EXPLODES its <= 11-deep ancestor chain
  (vectorized halving, one map_batches — explosion factor = tree
  depth, the standard closure-table trade), then ONE bucketed sum
  gives every node its subtree cost and descendant count. No
  level-synchronous rounds, no recursion at run time.
- ``orders_sortedness``: natural-run statistics of o_totalprice in
  o_orderkey order — (n_rows, n_descents, n_runs) where a descent is
  an ADJACENT pair v_i < v_{i-1}. Adjacent-pair semantics across
  blocks: static range cells over the dense orderkey axis (no
  quantile pass); each cell reports internal descents + its boundary
  (first/last orderkey+value); the driver stitches the <= C-1
  boundary pairs. The presortedness probe adaptive sorts and
  compaction planners start from.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import sum_by_key

ANALYTICS31_QUERIES: dict = {}
ANALYTICS31_ORACLES: dict = {}

SORT_CELLS = 64


# ----------------------------------------------------------------------
# BOM rollup (ancestor explosion)
# ----------------------------------------------------------------------
def q_part_bom_rollup(sf_dir):
    """(partkey, subtree_cost_milli, n_desc): per node of the implicit
    parent(n)=n//2 forest over n = partkey + 1, the retail cost and size of its subtree
    (self included)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_retailprice"]
    )

    def explode(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = np.floor(
            t["p_retailprice"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        ancs, costs = [], []
        node = k + 1  # 1-based heap key: partkeys start at 0
        alive = node >= 1
        while alive.any():
            ancs.append(node[alive].copy())
            costs.append(price[alive])
            node = node // 2
            alive = node >= 1
        return pa.table(
            {
                "anc": pa.array(np.concatenate(ancs), pa.int64()),
                "cost": pa.array(np.concatenate(costs), pa.int64()),
                "one": pa.array(np.ones(sum(len(a) for a in ancs), np.int64)),
            }
        )

    res = sum_by_key(
        part.map_batches(explode, batch_format="pyarrow"),
        "anc",
        ["cost", "one"],
        out_names=["subtree_cost_milli", "n_desc"],
    ).map_batches(
        lambda t: pa.table(
            {
                "partkey": pa.compute.subtract(t["anc"], 1),
                "subtree_cost_milli": t["subtree_cost_milli"],
                "n_desc": t["n_desc"],
            }
        ),
        batch_format="pyarrow",
    )
    return _typed_collect(
        res, {"partkey": "int64", "subtree_cost_milli": "int64", "n_desc": "int64"}
    )


ANALYTICS31_QUERIES["part_bom_rollup"] = q_part_bom_rollup

ANALYTICS31_ORACLES["part_bom_rollup"] = (
    "WITH RECURSIVE anc AS ("
    "SELECT p_partkey AS part, p_partkey + 1 AS node FROM part "
    "UNION ALL SELECT part, node // 2 FROM anc WHERE node > 1) "
    "SELECT a.node - 1 AS partkey, "
    "SUM(CAST(FLOOR(p.p_retailprice * 1000 + 0.5) AS BIGINT)) AS subtree_cost_milli, "
    "CAST(count(*) AS BIGINT) AS n_desc "
    "FROM anc a JOIN part p ON p.p_partkey = a.part GROUP BY 1"
)


# ----------------------------------------------------------------------
# sortedness scan (natural runs)
# ----------------------------------------------------------------------
def q_orders_sortedness(sf_dir):
    """One row (n_rows, n_descents, n_runs): adjacent-descent count of
    totalprice millis in orderkey order; n_runs = n_descents + 1."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "k": t["o_orderkey"],
                "v": pa.array(
                    np.floor(
                        t["o_totalprice"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    max_k = int(orders.max("k"))
    C = SORT_CELLS

    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    def cell_of(t: pa.Table) -> np.ndarray:
        k = t["k"].to_numpy(zero_copy_only=False)
        return mix64((k * C // (max_k + 1)).astype(np.int64)).astype(np.int64) & 0x7FFFFFFF

    def cell_stats(g: pa.Table) -> pa.Table:
        # a bucket holds one or more COMPLETE cells (co-grouped by cell
        # hash): sort each cell's full slab — no cross-block fragments
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        c = (k * C // (max_k + 1)).astype(np.int64)
        o = np.lexsort((k, c))
        k, v, c = k[o], v[o], c[o]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1, len(c)]
        rows = []
        for i in range(len(starts) - 1):
            lo, hi = starts[i], starts[i + 1]
            seg = v[lo:hi]
            desc = int((seg[1:] < seg[:-1]).sum())
            rows.append((int(c[lo]), hi - lo, desc, int(seg[0]), int(seg[-1])))
        df = pd.DataFrame(rows, columns=["cell", "n", "desc", "v_first", "v_last"])
        return pa.Table.from_pandas(df.astype("int64"), preserve_index=False)

    st = (
        bucketed_reduce(orders, cell_of, cell_stats)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    n_rows = int(st["n"].sum())
    desc = int(st["desc"].sum())
    # stitch the C-1 cell boundaries in global cell order
    desc += int((st["v_first"].to_numpy(np.int64)[1:] < st["v_last"].to_numpy(np.int64)[:-1]).sum())
    out = pd.DataFrame(
        {
            "n_rows": [n_rows],
            "n_descents": [desc],
            "n_runs": [desc + 1 if n_rows else 0],
        }
    ).astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {"n_rows": "int64", "n_descents": "int64", "n_runs": "int64"},
    )


ANALYTICS31_QUERIES["orders_sortedness"] = q_orders_sortedness

ANALYTICS31_ORACLES["orders_sortedness"] = (
    "WITH t AS (SELECT o_orderkey AS k, "
    "CAST(FLOOR(o_totalprice * 1000 + 0.5) AS BIGINT) AS v FROM orders), "
    "l AS (SELECT v, lag(v) OVER (ORDER BY k) AS pv FROM t) "
    "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
    "CAST(SUM(CASE WHEN pv IS NOT NULL AND v < pv THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_descents, "
    "CAST(SUM(CASE WHEN pv IS NOT NULL AND v < pv THEN 1 ELSE 0 END) + 1 AS BIGINT) "
    "AS n_runs FROM l"
)
