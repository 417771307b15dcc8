"""Distributed triangle counting (SURVEY.md §2.k K6 — north-rule addition,
absent in the reference).

Classic two-round MapReduce-style algorithm over Ray Data, no driver-side
graph materialization:

1. Clean: drop self-loops, undirect + exact-dedup, then ORIENT each
   undirected edge low→high by (degree, vid) order — every triangle
   becomes exactly one length-2 path u→v→w with rank(u)<rank(v)<rank(w).
2. Adjacency: ``groupby(src).map_groups`` → one (src, nbrs[]) row per
   vertex, neighbors sorted. Orientation bounds every list by
   O(sqrt(E)) — the hub problem disappears by construction.
3. Wedge check: for each oriented edge (u, v), ship N+(u) to v's
   adjacency owner (a groupby on v) and count |N+(u) ∩ N+(v)| by sorted
   intersection. Partial counts per group, one tiny final sum.

Partitioning assumption: adjacency and wedge work are co-located by
hash of the join vertex (Ray Data's groupby shuffle); skew is bounded by
the orientation step, so no hub salting is needed here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from everythinggraph_ray.stages.edges import dedup_edges, filter_self_loops


def _orient(edges: ray.data.Dataset, deg_ref) -> ray.data.Dataset:
    """Orient undirected (lo,hi) pairs by (degree, vid) rank."""

    def orient(batch: pa.Table) -> pa.Table:
        import ray as _ray

        dvids, dcnt = _ray.get(deg_ref)
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        da = dcnt[np.searchsorted(dvids, a)]
        db = dcnt[np.searchsorted(dvids, b)]
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})

    return edges.map_batches(orient, batch_format="pyarrow")


def triangle_count(edges: ray.data.Dataset) -> int:
    """Exact triangle count of the (deduped, undirected, loop-free) graph."""
    import ray as _ray

    # canonical undirected edge set as (lo, hi)
    def lo_hi(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d), pa.int64()),
                "dst": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    und = dedup_edges(
        filter_self_loops(edges.select_columns(["src", "dst"])).map_batches(
            lo_hi, batch_format="pyarrow"
        )
    ).materialize()

    # undirected degrees (small table: one row per vertex) → broadcast
    def deg_partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        vid, cnt = np.unique(np.concatenate([s, d]), return_counts=True)
        return pa.table({"vid": pa.array(vid, pa.int64()), "c": pa.array(cnt, pa.int64())})

    deg = (
        und.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("c", alias_name="deg"))
        .to_pandas()
        .sort_values("vid")
    )
    deg_ref = _ray.put((deg["vid"].to_numpy(np.int64), deg["deg"].to_numpy(np.int64)))

    oriented = _orient(und, deg_ref)

    # adjacency lists keyed by the oriented source
    def to_adj(g: pd.DataFrame) -> pd.DataFrame:
        u = int(g["u"].iloc[0])
        nbrs = np.sort(g["v"].to_numpy(np.int64))
        return pd.DataFrame({"key": [u], "nbrs": [nbrs], "is_adj": [True], "u": [np.int64(-1)]})

    adj = oriented.groupby("u").map_groups(to_adj, batch_format="pandas")

    # wedges: each oriented edge (u,v) ships N+(u) to v's group
    def ship(df: pd.DataFrame) -> pd.DataFrame:
        keys, nbrs_col, u_col = [], [], []
        for _, row in df.iterrows():
            nbrs = np.asarray(row["nbrs"], dtype=np.int64)
            for v in nbrs:
                keys.append(int(v))
                nbrs_col.append(nbrs)
                u_col.append(int(row["key"]))
        return pd.DataFrame(
            {
                "key": pd.array(keys, dtype="int64"),
                "nbrs": nbrs_col,
                "is_adj": [False] * len(keys),
                "u": pd.array(u_col, dtype="int64"),
            }
        )

    shipped = adj.map_batches(ship, batch_format="pandas")

    def intersect(g: pd.DataFrame) -> pd.DataFrame:
        mine = g[g["is_adj"]]
        wedges = g[~g["is_adj"]]
        if not len(mine) or not len(wedges):
            return pd.DataFrame({"tri": [0]})
        nv = mine["nbrs"].iloc[0]
        total = 0
        for nu in wedges["nbrs"]:
            total += len(np.intersect1d(nu, nv, assume_unique=True))
        return pd.DataFrame({"tri": [total]})

    per_v = adj.union(shipped).groupby("key").map_groups(intersect, batch_format="pandas")
    out = per_v.sum("tri")
    return int(out)
