"""Edge support and k-truss decomposition.

``edge_support``: for every edge of the simple undirected graph, the
number of triangles it participates in (= common neighbors of its two
endpoints).  Same degree-oriented wedge/close machinery as
graph/triangles.py (the wedge keeps its center like local_clustering),
but the closed wedge credits its three EDGES instead of its three
corners; credits flow through one bucketed two-column sum and re-attach
to the canonical edge list so triangle-free edges keep support 0.

``ktruss``: the maximal subgraph whose every edge has support >= k-2
(Cohen 2008).  Standard simultaneous peeling: each round recomputes
support over the surviving subgraph and drops every edge below the
threshold at once — the fixpoint is the unique k-truss, independent of
execution order.  The driver holds ONE scalar per round (the count of
edges still below threshold); edge sets stay distributed Datasets
throughout, checkpointed per round via ``materialize`` so lineage depth
stays O(1) per round rather than O(rounds).

Reference scope: extends the reference's triangle kernel family
(tri_simple.c) to the cohesive-subgraph decomposition built on it;
SURVEY §2.k north-rule addition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from everythinggraph_ray.graph.triangles import (
    BROADCAST_V_THRESHOLD,
    _oriented_with_degrees,
)
from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, mix64_pair, settle

__all__ = ["edge_support", "ktruss"]

_EMPTY_SUPPORT = pa.table(
    {
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "support": pa.array([], pa.int64()),
    }
)


def edge_support(
    edges: ray.data.Dataset, *, broadcast_threshold: int = BROADCAST_V_THRESHOLD
) -> ray.data.Dataset:
    """(a, b, support) with a < b, one row per simple undirected edge;
    support = triangles through the edge (0-support edges included)."""
    oriented, _deg, _packed = _oriented_with_degrees(edges, broadcast_threshold)
    if oriented is None:
        return ray.data.from_arrow(_EMPTY_SUPPORT)

    def wedge_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["u"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    # wedge rows (a, b, center) — identical emission to local_clustering:
    # per-edge attribution needs the center, so multiplicities can't merge
    def make_wedges(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        dv = g["dv"].to_numpy(zero_copy_only=False)
        o = np.lexsort((v, dv, u))
        u, v = u[o], v[o]
        st = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) if len(u) else np.empty(0, np.int64)
        ends = np.r_[st[1:], len(u)] if len(st) else st
        a_out, b_out, c_out = [], [], []
        for s, e in zip(st, ends):
            nb = v[s:e]
            if len(nb) >= 2:
                i, j = np.triu_indices(len(nb), k=1)
                a_out.append(nb[i])
                b_out.append(nb[j])
                c_out.append(np.full(len(i), u[s], np.int64))
        if not a_out:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "ctr": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_out), pa.int64()),
                "b": pa.array(np.concatenate(b_out), pa.int64()),
                "ctr": pa.array(np.concatenate(c_out), pa.int64()),
            }
        )

    wedges = bucketed_reduce(oriented, wedge_bucket, make_wedges)

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch["u"],
                "b": batch["v"],
                "ctr": pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()),
            }
        )

    tagged = wedges.union(
        oriented.select_columns(["u", "v"]).map_batches(tag_edges, batch_format="pyarrow")
    )

    def close_bucket(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["a"].to_numpy(zero_copy_only=False),
            batch["b"].to_numpy(zero_copy_only=False),
        )

    # per bucket: each closed wedge {ctr, a, b} credits its three edges in
    # canonical (lo, hi) form, partial-summed within the bucket
    def credit_matches(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        ctr = g["ctr"].to_numpy(zero_copy_only=False)
        out_empty = pa.table(
            {
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if not len(a):
            return out_empty
        order = np.lexsort((b, a))
        sa, sb = a[order], b[order]
        gid_sorted = np.r_[0, np.cumsum((sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1]))]
        ids = np.empty(len(a), np.int64)
        ids[order] = gid_sorted
        edge_mask = ctr < 0
        is_edge = np.zeros(int(gid_sorted[-1]) + 1, dtype=bool)
        is_edge[ids[edge_mask]] = True
        hit = (~edge_mask) & is_edge[ids]
        if not hit.any():
            return out_empty
        ha, hb, hc = a[hit], b[hit], ctr[hit]
        # canonicalize ALL three credited edges by value — the closing
        # pair (a, b) arrives in (deg, vid) orientation order, which need
        # not be value order
        ex = np.concatenate([np.minimum(hc, ha), np.minimum(hc, hb), np.minimum(ha, hb)])
        ey = np.concatenate([np.maximum(hc, ha), np.maximum(hc, hb), np.maximum(ha, hb)])
        o2 = np.lexsort((ey, ex))
        ex, ey = ex[o2], ey[o2]
        st = np.flatnonzero(np.r_[True, (ex[1:] != ex[:-1]) | (ey[1:] != ey[:-1])])
        cnt = np.diff(np.r_[st, len(ex)])
        return pa.table(
            {
                "x": pa.array(ex[st], pa.int64()),
                "y": pa.array(ey[st], pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    credits = bucketed_reduce(tagged, close_bucket, credit_matches)

    # re-attach onto the full edge list (support 0 preserved): role-tagged
    # union + one bucketed two-column sum. (a, b) of a wedge closure is in
    # orientation order, so base edges are re-canonicalized by value too.
    def base_rows(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "x": pa.array(np.minimum(u, v), pa.int64()),
                "y": pa.array(np.maximum(u, v), pa.int64()),
                "c": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )

    both = credits.union(
        oriented.select_columns(["u", "v"]).map_batches(base_rows, batch_format="pyarrow")
    )

    def pair_bucket(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["x"].to_numpy(zero_copy_only=False),
            batch["y"].to_numpy(zero_copy_only=False),
        )

    def sum_pairs(g: pa.Table) -> pa.Table:
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        o = np.lexsort((y, x))
        x, y, c = x[o], y[o], c[o]
        st = np.flatnonzero(np.r_[True, (x[1:] != x[:-1]) | (y[1:] != y[:-1])])
        return pa.table(
            {
                "a": pa.array(x[st], pa.int64()),
                "b": pa.array(y[st], pa.int64()),
                "support": pa.array(np.add.reduceat(c, st), pa.int64()),
            }
        )

    return bucketed_reduce(both, pair_bucket, sum_pairs)


def ktruss(
    edges: ray.data.Dataset,
    k: int,
    *,
    max_rounds: int = 100,
    broadcast_threshold: int = BROADCAST_V_THRESHOLD,
) -> tuple[ray.data.Dataset, int]:
    """The k-truss of the simple undirected graph: returns
    ((a, b, support) of the surviving edges — support as of the final
    recompute — and the number of peel rounds).  ``max_rounds`` is a
    runaway guard; the loop normally exits when a round removes nothing."""
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3, got {k}")
    need = k - 2
    cur = edges
    rounds = 0
    while rounds < max_rounds:
        # settle the loop-carried state (stages/agg.py:settle): a plain
        # materialize() chains plans across rounds and blows the recursion
        # limit after ~25 peels, and block counts otherwise accumulate
        # round over round
        sup = settle(edge_support(cur, broadcast_threshold=broadcast_threshold))
        rounds += 1

        def below_partial(batch: pa.Table) -> pa.Table:
            s = batch["support"].to_numpy(zero_copy_only=False)
            return pa.table({"n": pa.array([int((s < need).sum())], pa.int64())})

        below = sup.map_batches(below_partial, batch_format="pyarrow").sum("n")
        if not below:
            return sup, rounds

        def keep(batch: pa.Table) -> pa.Table:
            s = batch["support"].to_numpy(zero_copy_only=False)
            t = batch.filter(pa.array(s >= need, pa.bool_()))
            return pa.table({"src": t["a"], "dst": t["b"]})

        cur = sup.map_batches(keep, batch_format="pyarrow")
    # guard tripped: return the current (not-yet-converged) state honestly
    return edge_support(cur, broadcast_threshold=broadcast_threshold), rounds
