"""Analytics batch (session 12, thirteenth wave): landmark dominators
over the new AND semiring, and per-user longest increasing subsequence.

Distributed shapes:
- ``rel_dominators``: dominator sets (restricted to the 63 smallest
  vids as landmarks) of the rel digraph from root = min vid — the
  compiler/CFG analysis (Allen/Cocke iterative dataflow) run on the
  GRAPH ENGINE itself via the newly registered bitwise-AND combine
  (engine._COMBINE_UFUNC): dom(v) = {v} ∪ ⋂ preds dom(p) iterates as
  a frontier kernel exactly like WCC's min-label, with meet = AND of
  64-bit masks. Demonstrates the §2.j extension surface: a new
  semiring rides the unchanged scatter/apply machinery.
- ``events_user_lis``: per-user LONGEST STRICTLY-INCREASING
  SUBSEQUENCE of value-millis in (ts, event_id) order — patience
  sorting (O(n log n) via searchsorted) on each user's slab inside
  one bucketed co-group. Rows-only (LIS has no SQL form); serial
  O(n^2) DP replay pytest.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

ANALYTICS29_QUERIES: dict = {}
ANALYTICS29_ORACLES: dict = {}

DOM_LANDMARKS = 63


# ----------------------------------------------------------------------
# landmark dominators (AND-semiring engine kernel)
# ----------------------------------------------------------------------
def q_rel_dominators(sf_dir):
    """(vid, dom_mask): bit i set iff the i-th smallest vid dominates
    every root→vid path (root = min vid, its own bit 0); unreachable
    vertices keep the full-set sentinel -1."""
    from everythinggraph_ray.graph.kernels import LandmarkDominatorKernel
    from everythinggraph_ray.pipelines.queries import (
        _rel_build,
        _run_engine,
        _typed_collect,
        rel_edges,
    )

    # 63 smallest distinct vids of the universe (one tiny distributed fold)
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

    df = _run_engine(
        _rel_build(sf_dir), LandmarkDominatorKernel(root, bits)
    )
    out = df.rename(columns={"dominators": "dom_mask"})[["vid", "dom_mask"]]
    out["dom_mask"] = out["dom_mask"].astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out.reset_index(drop=True)),
        {"vid": "int64", "dom_mask": "int64"},
    )


ANALYTICS29_QUERIES["rel_dominators"] = q_rel_dominators
# no SQL oracle: iterative meet-over-paths dataflow has no SQL form;
# serial chaotic-iteration replay + structural pytests.


def serial_dominators(
    edges: list[tuple[int, int]], root: int, bits: dict[int, int]
) -> dict[int, int]:
    """Reference fixpoint: dense iteration until stable."""
    verts = sorted({a for a, _ in edges} | {b for _, b in edges})
    preds: dict[int, set[int]] = {v: set() for v in verts}
    for a, b in edges:
        preds[b].add(a)
    full = -1  # all bits; note full | selfbit == full, so unreachable
    # vertices (every pred still full, or no preds at all) keep the
    # sentinel without special-casing — same as the engine, where they
    # simply never receive a message
    dom = {v: full for v in verts}
    dom[root] = 1 << bits[root]
    changed = True
    while changed:
        changed = False
        for v in verts:
            if v == root:
                continue
            m = full
            for p in preds[v]:
                m &= dom[p]
            m |= (1 << bits[v]) if v in bits else 0
            if m != dom[v]:
                dom[v] = m
                changed = True
    return dom


# ----------------------------------------------------------------------
# per-user longest increasing subsequence
# ----------------------------------------------------------------------
def q_events_user_lis(sf_dir):
    """(user_id, n_events, lis_len): longest strictly-increasing
    subsequence of value-millis per user in (ts, event_id) order."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def prep(t: pa.Table) -> pa.Table:
        v = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pa.array(ts, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    def user_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def lis(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, ts, u))
        u, v = u[o], v[o]
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1, len(u)]
        out_u, out_n, out_l = [], [], []
        for i in range(len(starts) - 1):
            lo, hi = starts[i], starts[i + 1]
            tails: list[int] = []
            for x in v[lo:hi]:  # patience: bounded by the user's slab
                j = int(np.searchsorted(np.asarray(tails, np.int64), x, side="left"))
                if j == len(tails):
                    tails.append(int(x))
                else:
                    tails[j] = int(x)
            out_u.append(int(u[lo]))
            out_n.append(hi - lo)
            out_l.append(len(tails))
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "n_events": pa.array(out_n, pa.int64()),
                "lis_len": pa.array(out_l, pa.int64()),
            }
        )

    res = bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"), user_bucket, lis)
    return _typed_collect(
        res, {"user_id": "int64", "n_events": "int64", "lis_len": "int64"}
    )


ANALYTICS29_QUERIES["events_user_lis"] = q_events_user_lis
# LIS as a recursive chain-extension CTE (round-4 VERDICT item 9):
# states (user, rn, v, len) = "an increasing subsequence of length len
# ends at rn"; UNION dedups states, so the frontier is bounded by
# n_events x lis_len per user — fixture-scale tractable, and max(len)
# is exactly the strict-LIS length.
ANALYTICS29_ORACLES["events_user_lis"] = (
    "WITH RECURSIVE ev AS ("
    "SELECT user_id, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v, "
    "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn "
    "FROM events), "
    "n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM ev GROUP BY user_id), "
    "ch(user_id, rn, v, len) AS ("
    "SELECT user_id, rn, v, 1 FROM ev "
    "UNION "
    "SELECT e.user_id, e.rn, e.v, ch.len + 1 FROM ch "
    "JOIN ev e ON e.user_id = ch.user_id AND e.rn > ch.rn AND e.v > ch.v) "
    "SELECT n.user_id, n.n_events, m.lis_len FROM n JOIN "
    "(SELECT user_id, CAST(max(len) AS BIGINT) AS lis_len FROM ch GROUP BY user_id) m "
    "USING (user_id)"
)
