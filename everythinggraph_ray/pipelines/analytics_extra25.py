"""Analytics batch (session 12, ninth wave): spatial grid-cell
neighbor counting and FIFO inventory allocation.

Distributed shapes:
- ``cust_grid_neighbors``: the 2D SPATIAL JOIN — per customer, how
  many other customers lie within Chebyshev distance 2 on the derived
  grid (x = key % 97, y = key·31 % 89). Cell size = the radius, so a
  3x3 probe neighborhood provably covers every match: each point is
  replicated to its 9 surrounding cells as a PROBE, stays home once,
  and every cell resolves home x probe candidates with one vectorized
  distance mask — each neighbor relation counted exactly once, in the
  home cell of the counting point. The standard grid-file/geohash
  bucketing every geo pipeline uses, with replication factor 9.
- ``lineitem_fifo``: FIFO allocation (receipts = even orderkeys,
  issues = odd, per part in (orderkey, linenumber) order) — the
  inventory/accounting matcher. The sequential-looking scan is really
  INTERVAL INTERSECTION on the cumulative-unit axis: receipt r covers
  supply units [cum_r - q_r, cum_r), issue i demand units
  [cum_i - q_i, cum_i); FIFO matches r to i for exactly the overlap
  of those ranges. Per-part bucketed co-group; overlap pairs resolve
  with two vectorized searchsorted probes (contiguous ranges), never
  a per-unit loop. The SQL oracle is the same identity as a window
  cumsum + range join.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, mix64_pair

ANALYTICS25_QUERIES: dict = {}
ANALYTICS25_ORACLES: dict = {}

GRID_D = 2
GRID_PX = 97
GRID_PY = 89


# ----------------------------------------------------------------------
# spatial grid-cell neighbor counting
# ----------------------------------------------------------------------
def q_cust_grid_neighbors(sf_dir):
    """(custkey, n_neighbors): other customers within Chebyshev
    distance GRID_D on the derived (key%97, key*31%89) grid."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )

    def replicate(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = k % GRID_PX
        y = (k * 31) % GRID_PY
        cx, cy = x // GRID_D, y // GRID_D
        n = len(k)
        outs = {"key": [], "x": [], "y": [], "cx": [], "cy": [], "home": []}
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs["key"].append(k)
                outs["x"].append(x)
                outs["y"].append(y)
                outs["cx"].append(cx + dx)
                outs["cy"].append(cy + dy)
                outs["home"].append(
                    np.full(n, 1 if (dx == 0 and dy == 0) else 0, np.int64)
                )
        return pa.table(
            {
                "key": pa.array(np.concatenate(outs["key"]), pa.int64()),
                "x": pa.array(np.concatenate(outs["x"]), pa.int64()),
                "y": pa.array(np.concatenate(outs["y"]), pa.int64()),
                "cx": pa.array(np.concatenate(outs["cx"]), pa.int64()),
                "cy": pa.array(np.concatenate(outs["cy"]), pa.int64()),
                "home": pa.array(np.concatenate(outs["home"]), pa.int64()),
            }
        )

    def cell_bucket(t: pa.Table) -> np.ndarray:
        return mix64_pair(
            t["cx"].to_numpy(zero_copy_only=False),
            t["cy"].to_numpy(zero_copy_only=False),
        ).astype(np.int64) & 0x7FFFFFFF

    def count_cell(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        outs = []
        for _, grp in df.groupby(["cx", "cy"], sort=False):
            home = grp[grp["home"] == 1]
            if not len(home):
                continue
            hx = home["x"].to_numpy(np.int64)[:, None]
            hy = home["y"].to_numpy(np.int64)[:, None]
            hk = home["key"].to_numpy(np.int64)[:, None]
            px = grp["x"].to_numpy(np.int64)[None, :]
            py = grp["y"].to_numpy(np.int64)[None, :]
            pk = grp["key"].to_numpy(np.int64)[None, :]
            near = (
                (np.abs(hx - px) <= GRID_D)
                & (np.abs(hy - py) <= GRID_D)
                & (hk != pk)
            )
            outs.append(
                pd.DataFrame(
                    {
                        "custkey": home["key"].to_numpy(np.int64),
                        "n_neighbors": near.sum(axis=1).astype(np.int64),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "custkey": pa.array([], pa.int64()),
                    "n_neighbors": pa.array([], pa.int64()),
                }
            )
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True), preserve_index=False)

    res = bucketed_reduce(
        cust.map_batches(replicate, batch_format="pyarrow"), cell_bucket, count_cell
    )
    return _typed_collect(res, {"custkey": "int64", "n_neighbors": "int64"})


ANALYTICS25_QUERIES["cust_grid_neighbors"] = q_cust_grid_neighbors

ANALYTICS25_ORACLES["cust_grid_neighbors"] = (
    f"WITH p AS (SELECT c_custkey AS k, c_custkey % {GRID_PX} AS x, "
    f"(c_custkey * 31) % {GRID_PY} AS y FROM customer) "
    "SELECT a.k AS custkey, CAST(count(b.k) AS BIGINT) AS n_neighbors "
    "FROM p a LEFT JOIN p b ON b.k <> a.k "
    f"AND abs(a.x - b.x) <= {GRID_D} AND abs(a.y - b.y) <= {GRID_D} "
    "GROUP BY 1"
)


# ----------------------------------------------------------------------
# FIFO inventory allocation
# ----------------------------------------------------------------------
def q_lineitem_fifo(sf_dir):
    """(partkey, r_ok, r_ln, i_ok, i_ln, qty): FIFO match of issue
    quantities (odd orderkeys) against receipts (even), per part in
    (orderkey, linenumber) order — overlap of cumulative unit ranges."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_orderkey", "l_linenumber", "l_quantity"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p": t["l_partkey"],
                "ok": t["l_orderkey"],
                "ln": t["l_linenumber"],
                "q": pa.array(
                    t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def p_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["p"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def fifo(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        outs = []
        for p, grp in df.groupby("p", sort=False):
            # the synthetic lineitem can repeat (ok, ln): collapse to one
            # row per line so the FIFO order is a strict total order
            grp = (
                grp.groupby(["ok", "ln"], as_index=False)["q"]
                .sum()
                .sort_values(["ok", "ln"])
            )
            rec = grp[grp["ok"] % 2 == 0]
            iss = grp[grp["ok"] % 2 == 1]
            if not len(rec) or not len(iss):
                continue
            rq = rec["q"].to_numpy(np.int64)
            iq = iss["q"].to_numpy(np.int64)
            r_end = np.cumsum(rq)
            r_start = r_end - rq
            i_end = np.cumsum(iq)
            i_start = i_end - iq
            # overlapping issues for receipt r: contiguous index range
            lo = np.searchsorted(i_end, r_start, side="right")
            hi = np.searchsorted(i_start, r_end, side="left")
            reps = np.maximum(hi - lo, 0)
            if not reps.sum():
                continue
            r_ix = np.repeat(np.arange(len(rq)), reps)
            base = np.concatenate([[0], np.cumsum(reps)[:-1]])
            i_ix = (
                np.arange(reps.sum(), dtype=np.int64)
                - np.repeat(base, reps)
                + lo[r_ix]
            )
            qty = np.minimum(r_end[r_ix], i_end[i_ix]) - np.maximum(
                r_start[r_ix], i_start[i_ix]
            )
            keep = qty > 0
            outs.append(
                pd.DataFrame(
                    {
                        "partkey": np.full(int(keep.sum()), int(p), np.int64),
                        "r_ok": rec["ok"].to_numpy(np.int64)[r_ix[keep]],
                        "r_ln": rec["ln"].to_numpy(np.int64)[r_ix[keep]],
                        "i_ok": iss["ok"].to_numpy(np.int64)[i_ix[keep]],
                        "i_ln": iss["ln"].to_numpy(np.int64)[i_ix[keep]],
                        "qty": qty[keep].astype(np.int64),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    c: pa.array([], pa.int64())
                    for c in ["partkey", "r_ok", "r_ln", "i_ok", "i_ln", "qty"]
                }
            )
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True), preserve_index=False)

    res = bucketed_reduce(li.map_batches(prep, batch_format="pyarrow"), p_bucket, fifo)
    return _typed_collect(
        res,
        {
            "partkey": "int64",
            "r_ok": "int64",
            "r_ln": "int64",
            "i_ok": "int64",
            "i_ln": "int64",
            "qty": "int64",
        },
    )


ANALYTICS25_QUERIES["lineitem_fifo"] = q_lineitem_fifo

ANALYTICS25_ORACLES["lineitem_fifo"] = (
    "WITH b AS (SELECT l_partkey AS p, l_orderkey AS ok, l_linenumber AS ln, "
    "SUM(CAST(l_quantity AS BIGINT)) AS q, l_orderkey % 2 AS side "
    "FROM lineitem GROUP BY 1, 2, 3, 5), "
    "r AS (SELECT p, ok, ln, q, SUM(q) OVER "
    "(PARTITION BY p ORDER BY ok, ln) AS cum FROM b WHERE side = 0), "
    "i AS (SELECT p, ok, ln, q, SUM(q) OVER "
    "(PARTITION BY p ORDER BY ok, ln) AS cum FROM b WHERE side = 1) "
    "SELECT r.p AS partkey, r.ok AS r_ok, r.ln AS r_ln, "
    "i.ok AS i_ok, i.ln AS i_ln, "
    "CAST(LEAST(r.cum, i.cum) - GREATEST(r.cum - r.q, i.cum - i.q) AS BIGINT) AS qty "
    "FROM r JOIN i ON r.p = i.p "
    "AND r.cum > i.cum - i.q AND i.cum > r.cum - r.q"
)
