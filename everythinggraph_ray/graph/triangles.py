"""Distributed triangle counting (SURVEY.md §2.k K6 — north-rule addition,
absent in the reference).

Vectorized two-round algorithm over Ray Data:

1. Clean: drop self-loops, canonicalize (lo,hi), exact-dedup (bucketed).
2. Rank: relabel every vertex to its dense rank in (degree, vid) order —
   after relabeling, degree-orientation is simply ``u < v``, every
   triangle is exactly one rank-increasing path u→v→w, and each
   adjacency list N+(u) is O(sqrt(E)) long (the hub problem disappears
   by construction). The rank map is built from the (small) degree table
   and broadcast via ray.put.
3. Wedges: per src-hash bucket, emit all rank-ordered pairs (v,w) ⊂
   N+(u) — numpy triu indices per vertex, no per-edge Python.
4. Close: wedge rows and oriented-edge rows meet in a hash bucket of
   their (v,w) key; matches counted with one np.isin per bucket.

Partitioning assumption: wedge/edge co-location by hash of the closing
pair (Ray Data groupby shuffle). The rank map is a vertex-count-sized
broadcast — the documented small-side assumption (V ≪ E); a fully
partitioned rank join would replace it at extreme vertex counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64
from everythinggraph_ray.stages.edges import dedup_edges, filter_self_loops


def _canonical_undirected(edges: ray.data.Dataset) -> ray.data.Dataset:
    def lo_hi(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d), pa.int64()),
                "dst": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    return dedup_edges(
        filter_self_loops(edges.select_columns(["src", "dst"])).map_batches(
            lo_hi, batch_format="pyarrow"
        )
    )


def triangle_count(edges: ray.data.Dataset) -> int:
    """Exact triangle count of the (deduped, undirected, loop-free) graph."""
    und = _canonical_undirected(edges).materialize()

    # undirected degree table → dense rank by (deg, vid)
    def deg_partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        vid, cnt = np.unique(np.concatenate([s, d]), return_counts=True)
        return pa.table({"vid": pa.array(vid, pa.int64()), "c": pa.array(cnt, pa.int64())})

    from everythinggraph_ray.stages.agg import sum_by_key

    deg = (
        sum_by_key(
            und.map_batches(deg_partial, batch_format="pyarrow", batch_size=256 * 1024),
            "vid",
            ["c"],
            out_names=["deg"],
        )
        .to_pandas()
    )
    if not len(deg):
        return 0
    vids = deg["vid"].to_numpy(np.int64)
    degs = deg["deg"].to_numpy(np.int64)
    order = np.lexsort((vids, degs))  # rank by (deg, vid)
    vid_sorted_by_rank = vids[order]
    # rank lookup keyed by vid (sorted-by-vid arrays for searchsorted)
    vs = np.sort(vids)
    rank_of_vs = np.empty(len(vids), dtype=np.int64)
    rank_of_vs[np.searchsorted(vs, vid_sorted_by_rank)] = np.arange(len(vids))
    rank_ref = ray.put((vs, rank_of_vs))

    def orient_ranked(batch: pa.Table) -> pa.Table:
        rvs, rk = ray.get(rank_ref)
        a = rk[np.searchsorted(rvs, batch["src"].to_numpy(zero_copy_only=False))]
        b = rk[np.searchsorted(rvs, batch["dst"].to_numpy(zero_copy_only=False))]
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        return pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})

    oriented = und.map_batches(orient_ranked, batch_format="pyarrow").materialize()

    # ---- wedges: rank-ordered pairs within each N+(u) --------------------
    def wedge_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["u"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def make_wedges(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        o = np.lexsort((v, u))
        u, v = u[o], v[o]
        st = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) if len(u) else np.empty(0, np.int64)
        ends = np.r_[st[1:], len(u)] if len(st) else st
        a_out, b_out = [], []
        for s, e in zip(st, ends):
            nb = v[s:e]  # sorted ascending = rank order
            if len(nb) >= 2:
                i, j = np.triu_indices(len(nb), k=1)
                a_out.append(nb[i])
                b_out.append(nb[j])
        if not a_out:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_out), pa.int64()),
                "b": pa.array(np.concatenate(b_out), pa.int64()),
            }
        )

    wedges = bucketed_reduce(oriented, wedge_bucket, make_wedges)

    # ---- close: match wedge (a,b) against oriented edge (u,v) ------------
    def tag(kind: int):
        def f(batch: pa.Table) -> pa.Table:
            cols = batch.column_names
            a = batch[cols[0]].to_numpy(zero_copy_only=False)
            b = batch[cols[1]].to_numpy(zero_copy_only=False)
            key = (a << np.int64(31)) ^ b  # ranks < 2^31: injective
            return pa.table(
                {
                    "key": pa.array(key, pa.int64()),
                    "kind": pa.array(np.full(len(key), kind, np.int8), pa.int8()),
                }
            )

        return f

    tagged = wedges.map_batches(tag(0), batch_format="pyarrow").union(
        oriented.map_batches(tag(1), batch_format="pyarrow")
    )

    def close_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["key"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def count_matches(g: pa.Table) -> pa.Table:
        k = g["key"].to_numpy(zero_copy_only=False)
        kind = g["kind"].to_numpy(zero_copy_only=False)
        ek = np.unique(k[kind == 1])
        n = int(np.isin(k[kind == 0], ek, assume_unique=False).sum())
        return pa.table({"tri": pa.array([n], pa.int64())})

    per_bucket = bucketed_reduce(tagged, close_bucket, count_matches)
    return int(per_bucket.sum("tri"))
