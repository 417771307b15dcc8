"""Common-neighbor link prediction (web-graph / training-data addition,
absent in the reference — the classic unsupervised link-prediction score
of Liben-Nowell & Kleinberg CIKM'03).

For every NON-adjacent vertex pair (a, b) of the simple undirected graph,
score(a, b) = |N(a) ∩ N(b)| — computed by wedge enumeration, the same
shuffle shape as triangle counting (graph/triangles.py) with one crucial
difference: triangles can degree-orient the adjacency (each triangle has
exactly one orientation-source, killing the hub blow-up by construction),
but common-neighbor counting needs EVERY wedge a–u–b, so the per-center
cost is inherently Σ deg(u)·(deg(u)−1)/2. ``center_cap`` bounds that at
web scale by skipping centers above a degree ceiling (a documented recall
trade — hubs like "google.com" connect everything to everything and score
mass, not signal); the default (None) is exact.

Stages (all bucketed, no driver or O(V) single-node state):
1. canonical undirected dedup (shared with triangles)
2. adjacency both directions, bucketed by CENTER hash → per bucket emit
   canonical neighbor pairs (a < b) with a partial count combine
3. pair rows union edge rows (cnt = −1 tag), bucketed by PAIR hash →
   per bucket sum counts, DROP pairs that are edges (the anti-join),
   keep the bucket-local top-k (a superset of the global top-k)
4. exact global top-k: sort (cnt desc, a, b) + limit
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, mix64_pair
from everythinggraph_ray.graph.triangles import _canonical_undirected

_EMPTY = pa.table(
    {
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "cnt": pa.array([], pa.int64()),
    }
)


def common_neighbors_topk(
    edges: ray.data.Dataset,
    k: int = 20,
    *,
    center_cap: int | None = None,
    score: str = "common",
) -> ray.data.Dataset:
    """Top-k non-adjacent pairs, ties broken by (a, b) ascending — fully
    deterministic. ``score='common'`` ranks by |N(a) ∩ N(b)| and returns
    (a, b, cnt); ``score='jaccard'`` ranks by the neighborhood Jaccard
    cnt / (deg(a) + deg(b) − cnt) and returns (a, b, cnt, jaccard) —
    ONE int64÷int64 IEEE division, so it hash-matches a SQL oracle.
    Jaccard needs degrees on every candidate pair BEFORE the top-k, so
    it pays two extra degree-attach co-groups over the candidate set."""
    if score not in ("common", "jaccard", "adamic"):
        raise ValueError(f"score must be common/jaccard/adamic, got {score!r}")
    und = _canonical_undirected(edges).materialize()  # consumed twice: wedges + anti-join

    def both_dir(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([s, d]), pa.int64()),
                "v": pa.array(np.concatenate([d, s]), pa.int64()),
            }
        )

    adj = und.map_batches(both_dir, batch_format="pyarrow")

    def center_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["u"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def emit_pairs(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        o = np.lexsort((v, u))
        u, v = u[o], v[o]
        st = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) if len(u) else np.empty(0, np.int64)
        ends = np.r_[st[1:], len(u)] if len(st) else st
        a_out, b_out, s_out = [], [], []
        for s, e in zip(st, ends):
            nb = v[s:e]  # ascending + distinct (simple graph) ⇒ pairs canonical
            if len(nb) < 2 or (center_cap is not None and len(nb) > center_cap):
                continue
            i, j = np.triu_indices(len(nb), k=1)
            a_out.append(nb[i])
            b_out.append(nb[j])
            if score == "adamic":
                # deg(center) == len(nb): the center's FULL adjacency is in
                # this bucket; len(nb) >= 2 so ln > 0
                su = np.int64(np.floor(1e9 / np.log(float(len(nb)))))
                s_out.append(np.full(len(i), su, np.int64))
        if not a_out:
            return _EMPTY
        wa = np.concatenate(a_out)
        wb = np.concatenate(b_out)
        ws = (
            np.concatenate(s_out)
            if score == "adamic"
            else np.ones(len(wa), np.int64)
        )
        # combine identical pairs before the pair shuffle
        o2 = np.lexsort((wb, wa))
        wa, wb, ws = wa[o2], wb[o2], ws[o2]
        starts = np.flatnonzero(np.r_[True, (wa[1:] != wa[:-1]) | (wb[1:] != wb[:-1])])
        cnt = np.add.reduceat(ws, starts)
        return pa.table(
            {
                "a": pa.array(wa[starts], pa.int64()),
                "b": pa.array(wb[starts], pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    pairs = bucketed_reduce(adj, center_bucket, emit_pairs)

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch["src"],
                "b": batch["dst"],
                "cnt": pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()),
            }
        )

    tagged = pairs.union(und.map_batches(tag_edges, batch_format="pyarrow"))

    def pair_bucket(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["a"].to_numpy(zero_copy_only=False),
            batch["b"].to_numpy(zero_copy_only=False),
        )

    def reduce_pairs(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        if not len(a):
            return _EMPTY
        order = np.lexsort((b, a))
        sa, sb, sc = a[order], b[order], cnt[order]
        new = np.r_[True, (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])]
        gid = np.cumsum(new) - 1
        n_g = int(gid[-1]) + 1
        total = np.zeros(n_g, np.int64)
        np.add.at(total, gid, np.maximum(sc, 0))  # edge tags add 0
        is_edge = np.zeros(n_g, dtype=bool)
        is_edge[gid[sc < 0]] = True
        starts = np.flatnonzero(new)
        keep = (~is_edge) & (total > 0)
        if not keep.any():
            return _EMPTY
        ka, kb, kc = sa[starts][keep], sb[starts][keep], total[keep]
        if score == "jaccard":
            # ranking needs degrees: emit every kept pair, trim later
            o3 = slice(None)
        else:
            # bucket-local top-k (global top-k is a subset of these)
            o3 = np.lexsort((kb, ka, -kc))[:k]
        return pa.table(
            {
                "a": pa.array(ka[o3], pa.int64()),
                "b": pa.array(kb[o3], pa.int64()),
                "cnt": pa.array(kc[o3], pa.int64()),
            }
        )

    top_parts = bucketed_reduce(tagged, pair_bucket, reduce_pairs)
    if score in ("common", "adamic"):
        return top_parts.sort(["cnt", "a", "b"], descending=[True, False, False]).limit(k)

    # jaccard: attach deg(a), deg(b) via the triangles degree co-group
    # (distributed — the degree table never leaves the cluster), then the
    # one-division score and a per-batch partial top-k before the global
    from everythinggraph_ray.stages.agg import sum_by_key
    from everythinggraph_ray.graph.triangles import _attach_degree

    def deg_partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        vid, cnt = np.unique(np.concatenate([s, d]), return_counts=True)
        return pa.table({"vid": pa.array(vid, pa.int64()), "c": pa.array(cnt, pa.int64())})

    deg = sum_by_key(
        und.map_batches(deg_partial, batch_format="pyarrow"), "vid", ["c"], out_names=["deg"]
    )
    with_da = _attach_degree(top_parts, deg, "a", "da")
    with_db = _attach_degree(with_da, deg, "b", "db")

    def jaccard_topk(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        union = batch["da"].to_numpy(zero_copy_only=False) + batch["db"].to_numpy(
            zero_copy_only=False
        ) - c
        jac = c.astype(np.float64) / union.astype(np.float64)
        o = np.lexsort((b, a, -jac))[:k]
        return pa.table(
            {
                "a": pa.array(a[o], pa.int64()),
                "b": pa.array(b[o], pa.int64()),
                "cnt": pa.array(c[o], pa.int64()),
                "jaccard": pa.array(jac[o], pa.float64()),
            }
        )

    return (
        with_db.map_batches(jaccard_topk, batch_format="pyarrow")
        .sort(["jaccard", "a", "b"], descending=[True, False, False])
        .limit(k)
    )


def cocitation_topk(
    edges: ray.data.Dataset,
    k: int = 20,
    *,
    center_cap: int | None = None,
    score: str = "count",
) -> ray.data.Dataset:
    """Top-k co-cited pairs of the DIRECTED graph: (a, b, cnt) with a < b,
    cnt = number of distinct sources linking to both — the bipartite /
    co-citation projection (order→parts, page→out-links, user→items).
    Unlike ``common_neighbors_topk`` this keeps adjacent pairs (the
    projection is a graph of its own, not a link-prediction candidate
    set) and walks only OUT-neighborhoods, so no undirecting happens.
    Ties break by (a, b) ascending; ``center_cap`` bounds the inherent
    Σ outdeg² hub cost (documented recall trade), default exact.

    Shape: distinct directed edges → src-bucketed pair emission with a
    local combine → pair-bucketed sum keeping the bucket-local top-k →
    exact global top-k (sort over ≤ k·buckets rows).

    ``score='cosine'`` ranks by the cosine-normalized co-citation
    cnt / (sqrt(indeg(a)) · sqrt(indeg(b))) — the item-item
    collaborative-filtering similarity (co-citation discounted by item
    popularity). Ranking by the normalized score needs in-degrees on
    every candidate pair BEFORE the top-k, so like the jaccard link
    predictor it keeps all summed pairs and pays two degree-attach
    co-groups; the score is sqrt/division over exact int64 inputs,
    identically expressed in the SQL oracle."""
    if score not in ("count", "cosine"):
        raise ValueError(f"score must be count/cosine, got {score!r}")
    from everythinggraph_ray.stages.edges import dedup_edges

    dist = dedup_edges(edges.select_columns(["src", "dst"]))
    if score == "cosine":
        dist = dist.materialize()  # consumed twice: pair stream + in-degrees

    def center_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["src"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def emit_pairs(g: pa.Table) -> pa.Table:
        u = g["src"].to_numpy(zero_copy_only=False)
        v = g["dst"].to_numpy(zero_copy_only=False)
        o = np.lexsort((v, u))
        u, v = u[o], v[o]
        st = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) if len(u) else np.empty(0, np.int64)
        ends = np.r_[st[1:], len(u)] if len(st) else st
        a_out, b_out = [], []
        for s, e in zip(st, ends):
            nb = v[s:e]  # ascending + distinct ⇒ pairs canonical (a < b)
            if len(nb) < 2 or (center_cap is not None and len(nb) > center_cap):
                continue
            i, j = np.triu_indices(len(nb), k=1)
            a_out.append(nb[i])
            b_out.append(nb[j])
        if not a_out:
            return _EMPTY
        wa = np.concatenate(a_out)
        wb = np.concatenate(b_out)
        o2 = np.lexsort((wb, wa))
        wa, wb = wa[o2], wb[o2]
        starts = np.flatnonzero(np.r_[True, (wa[1:] != wa[:-1]) | (wb[1:] != wb[:-1])])
        cnt = np.diff(np.r_[starts, len(wa)])
        return pa.table(
            {
                "a": pa.array(wa[starts], pa.int64()),
                "b": pa.array(wb[starts], pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    pairs = bucketed_reduce(dist, center_bucket, emit_pairs)

    def pair_bucket(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["a"].to_numpy(zero_copy_only=False),
            batch["b"].to_numpy(zero_copy_only=False),
        )

    def sum_topk(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        if not len(a):
            return _EMPTY
        order = np.lexsort((b, a))
        sa, sb, sc = a[order], b[order], cnt[order]
        new = np.r_[True, (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])]
        starts = np.flatnonzero(new)
        total = np.add.reduceat(sc, starts)
        ka, kb = sa[starts], sb[starts]
        if score == "cosine":
            o3 = slice(None)  # ranking needs in-degrees: trim later
        else:
            o3 = np.lexsort((kb, ka, -total))[:k]
        return pa.table(
            {
                "a": pa.array(ka[o3], pa.int64()),
                "b": pa.array(kb[o3], pa.int64()),
                "cnt": pa.array(total[o3], pa.int64()),
            }
        )

    parts = bucketed_reduce(pairs, pair_bucket, sum_topk)
    if score == "count":
        return parts.sort(["cnt", "a", "b"], descending=[True, False, False]).limit(k)

    # cosine: attach indeg(a), indeg(b) (distinct-source counts) via the
    # same distributed degree co-group the jaccard predictor uses
    from everythinggraph_ray.stages.agg import sum_by_key
    from everythinggraph_ray.graph.triangles import _attach_degree

    def indeg_partial(batch: pa.Table) -> pa.Table:
        d = batch["dst"].to_numpy(zero_copy_only=False)
        vid, cnt = np.unique(d, return_counts=True)
        return pa.table({"vid": pa.array(vid, pa.int64()), "c": pa.array(cnt, pa.int64())})

    indeg = sum_by_key(
        dist.map_batches(indeg_partial, batch_format="pyarrow"), "vid", ["c"],
        out_names=["deg"],
    )
    with_da = _attach_degree(parts, indeg, "a", "da")
    with_db = _attach_degree(with_da, indeg, "b", "db")

    def cosine_topk(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        da = batch["da"].to_numpy(zero_copy_only=False).astype(np.float64)
        db = batch["db"].to_numpy(zero_copy_only=False).astype(np.float64)
        cos = c.astype(np.float64) / (np.sqrt(da) * np.sqrt(db))
        o = np.lexsort((b, a, -cos))[:k]
        return pa.table(
            {
                "a": pa.array(a[o], pa.int64()),
                "b": pa.array(b[o], pa.int64()),
                "cnt": pa.array(c[o], pa.int64()),
                "cosine": pa.array(cos[o], pa.float64()),
            }
        )

    return (
        with_db.map_batches(cosine_topk, batch_format="pyarrow")
        .sort(["cosine", "a", "b"], descending=[True, False, False])
        .limit(k)
    )


def butterfly_count(
    edges: ray.data.Dataset,
    *,
    center_cap: int | None = None,
    num_buckets: int = 64,
) -> int:
    """Exact butterfly (bipartite 4-cycle / K_{2,2}) count of the directed
    graph viewed as a src→dst bipartite incidence: for every dst pair
    (d1 < d2), C(c, 2) butterflies where c = distinct srcs linking to
    both — i.e. Σ over co-citation pairs of C(cnt, 2) (Wang et al.,
    butterfly counting via wedge aggregation).  Reuses the co-citation
    pair stream; the final stage folds each pair bucket to ONE partial
    sum, so only ≤ num_buckets scalars reach the driver."""
    from everythinggraph_ray.stages.edges import dedup_edges

    dist = dedup_edges(edges.select_columns(["src", "dst"]))

    def center_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["src"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def emit_pairs(g: pa.Table) -> pa.Table:
        u = g["src"].to_numpy(zero_copy_only=False)
        v = g["dst"].to_numpy(zero_copy_only=False)
        o = np.lexsort((v, u))
        u, v = u[o], v[o]
        st = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) if len(u) else np.empty(0, np.int64)
        ends = np.r_[st[1:], len(u)] if len(st) else st
        a_out, b_out = [], []
        for s, e in zip(st, ends):
            nb = v[s:e]
            if len(nb) < 2 or (center_cap is not None and len(nb) > center_cap):
                continue
            i, j = np.triu_indices(len(nb), k=1)
            a_out.append(nb[i])
            b_out.append(nb[j])
        if not a_out:
            return _EMPTY
        wa = np.concatenate(a_out)
        wb = np.concatenate(b_out)
        o2 = np.lexsort((wb, wa))
        wa, wb = wa[o2], wb[o2]
        starts = np.flatnonzero(np.r_[True, (wa[1:] != wa[:-1]) | (wb[1:] != wb[:-1])])
        cnt = np.diff(np.r_[starts, len(wa)])
        return pa.table(
            {
                "a": pa.array(wa[starts], pa.int64()),
                "b": pa.array(wb[starts], pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    pairs = bucketed_reduce(dist, center_bucket, emit_pairs, num_buckets=num_buckets)

    def pair_bucket(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["a"].to_numpy(zero_copy_only=False),
            batch["b"].to_numpy(zero_copy_only=False),
        )

    def fold(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        if not len(a):
            return pa.table({"bf": pa.array([0], pa.int64())})
        order = np.lexsort((b, a))
        sa, sb, sc = a[order], b[order], cnt[order]
        new = np.r_[True, (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])]
        total = np.add.reduceat(sc, np.flatnonzero(new))
        return pa.table(
            {"bf": pa.array([int((total * (total - 1) // 2).sum())], pa.int64())}
        )

    res = bucketed_reduce(pairs, pair_bucket, fold).sum("bf")
    return int(res) if res is not None else 0
