"""Higher-order motif counting: exact 4-cliques.

Every clique appears exactly once as an orientation-sorted tuple under
the (deg, vid) degree orientation (graph/triangles.py) — the same
argument that de-duplicates triangles extends one level: a 4-clique
(q1<q2<q3<q4 in orientation order) is two oriented triangles
(q1,q2,q3) and (q1,q2,q4) sharing their base edge (q1,q2) plus the
closing edge {q3,q4}.  So the pipeline is the triangle machinery run
TWICE:

1. enumerate oriented triangles (wedge/close with the center kept —
   the local_clustering emission, but the match EMITS the triangle
   rows instead of crediting corners)
2. group triangles by their base edge (pair-bucketed), emit the
   value-canonical pairs of third vertices with a within-bucket
   multiplicity combine
3. close those candidate pairs against the value-canonical undirected
   edge set — matched multiplicities sum to the exact 4-clique count,
   <= num_buckets scalars to the driver.

Cost note: step 1 materializes one row per TRIANGLE (inherent to any
shared-base-pair route); at T triangles that is O(T) shuffle rows —
fine wherever triangle counting itself is feasible, but a graph with
10^12 triangles needs sampling instead (out of scope, documented).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from everythinggraph_ray.graph.triangles import (
    BROADCAST_V_THRESHOLD,
    _canonical_undirected,
    _oriented_with_degrees,
)
from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, mix64_pair

__all__ = ["four_clique_count", "enumerate_triangles"]


def enumerate_triangles(
    edges: ray.data.Dataset, *, broadcast_threshold: int = BROADCAST_V_THRESHOLD
) -> ray.data.Dataset:
    """(t1, t2, t3) rows — one per triangle, in orientation-topological
    order (t1→t2, t1→t3, t2→t3 all oriented edges)."""
    oriented, _deg, _packed = _oriented_with_degrees(edges, broadcast_threshold)
    empty = pa.table(
        {
            "t1": pa.array([], pa.int64()),
            "t2": pa.array([], pa.int64()),
            "t3": pa.array([], pa.int64()),
        }
    )
    if oriented is None:
        return ray.data.from_arrow(empty)

    def wedge_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["u"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

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

    def emit_triangles(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        ctr = g["ctr"].to_numpy(zero_copy_only=False)
        if not len(a):
            return pa.table(
                {
                    "t1": pa.array([], pa.int64()),
                    "t2": pa.array([], pa.int64()),
                    "t3": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((b, a))
        sa, sb = a[order], b[order]
        gid_sorted = np.r_[0, np.cumsum((sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1]))]
        ids = np.empty(len(a), np.int64)
        ids[order] = gid_sorted
        edge_mask = ctr < 0
        is_edge = np.zeros(int(gid_sorted[-1]) + 1, dtype=bool)
        is_edge[ids[edge_mask]] = True
        hit = (~edge_mask) & is_edge[ids]
        return pa.table(
            {
                "t1": pa.array(ctr[hit], pa.int64()),
                "t2": pa.array(a[hit], pa.int64()),
                "t3": pa.array(b[hit], pa.int64()),
            }
        )

    return bucketed_reduce(tagged, close_bucket, emit_triangles)


def four_clique_count(
    edges: ray.data.Dataset, *, broadcast_threshold: int = BROADCAST_V_THRESHOLD
) -> int:
    """Exact number of 4-cliques (K4 subgraphs) of the simple undirected
    graph."""
    tris = enumerate_triangles(edges, broadcast_threshold=broadcast_threshold)

    # ---- candidates: pairs of third-vertices per (t1, t2) base edge ----
    def base_bucket(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["t1"].to_numpy(zero_copy_only=False),
            batch["t2"].to_numpy(zero_copy_only=False),
        )

    def make_candidates(g: pa.Table) -> pa.Table:
        t1 = g["t1"].to_numpy(zero_copy_only=False)
        t2 = g["t2"].to_numpy(zero_copy_only=False)
        t3 = g["t3"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if not len(t1):
            return empty
        o = np.lexsort((t3, t2, t1))
        t1, t2, t3 = t1[o], t2[o], t3[o]
        st = np.flatnonzero(np.r_[True, (t1[1:] != t1[:-1]) | (t2[1:] != t2[:-1])])
        ends = np.r_[st[1:], len(t1)]
        xs, ys = [], []
        for s, e in zip(st, ends):
            third = t3[s:e]
            if len(third) >= 2:
                i, j = np.triu_indices(len(third), k=1)
                xs.append(np.minimum(third[i], third[j]))
                ys.append(np.maximum(third[i], third[j]))
        if not xs:
            return empty
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        o2 = np.lexsort((y, x))
        x, y = x[o2], y[o2]
        starts = np.flatnonzero(np.r_[True, (x[1:] != x[:-1]) | (y[1:] != y[:-1])])
        cnt = np.diff(np.r_[starts, len(x)])
        return pa.table(
            {
                "x": pa.array(x[starts], pa.int64()),
                "y": pa.array(y[starts], pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    candidates = bucketed_reduce(tris, base_bucket, make_candidates)

    # ---- close candidates against the value-canonical edge set --------
    und = _canonical_undirected(edges)

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": batch["src"],
                "y": batch["dst"],
                "cnt": pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()),
            }
        )

    tagged = candidates.union(und.map_batches(tag, batch_format="pyarrow"))

    def pair_bucket(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["x"].to_numpy(zero_copy_only=False),
            batch["y"].to_numpy(zero_copy_only=False),
        )

    def count_matches(g: pa.Table) -> pa.Table:
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        if not len(x):
            return pa.table({"k4": pa.array([0], pa.int64())})
        order = np.lexsort((y, x))
        sx, sy = x[order], y[order]
        gid_sorted = np.r_[0, np.cumsum((sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1]))]
        ids = np.empty(len(x), np.int64)
        ids[order] = gid_sorted
        edge_mask = cnt < 0
        is_edge = np.zeros(int(gid_sorted[-1]) + 1, dtype=bool)
        is_edge[ids[edge_mask]] = True
        cm = ~edge_mask
        n = int(cnt[cm][is_edge[ids[cm]]].sum())
        return pa.table({"k4": pa.array([n], pa.int64())})

    res = bucketed_reduce(tagged, pair_bucket, count_matches).sum("k4")
    return int(res) if res is not None else 0
