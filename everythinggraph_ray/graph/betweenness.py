"""Betweenness centrality — level-synchronous Brandes over Datasets.

The reference's kernel family (SURVEY.md §2.k) covers the
distance/reachability semiring (BFS/SSSP/WCC) and the sum semiring
(PageRank/SpMV); Brandes (2001) composes BOTH: a forward BFS that
sum-combines shortest-path counts sigma per level, then a backward sweep
that sum-combines dependencies delta down the shortest-path DAG. Neither
phase fits the single-semiring actor engine (the backward sweep walks
levels in reverse), so this is the documented Dataset-composition path.

Shape per level — ONE streaming pass over the materialized simple edge
set, no per-level edge shuffle (the frontier is the small side, so it is
broadcast via ``ray.put`` and looked up inside ``map_batches``; a
hash-join formulation was measured at >10 min at sf0.01 because it
re-shuffled the full edge table 2·max_levels times):

- forward:  broadcast frontier (per-source sorted vid → sigma) →
  ``de.map_batches``: searchsorted lookup of src, emit packed
  ``(source_idx << 40) | dst`` with sigma, in-block partial group-sum →
  collect the (small) partials → driver combine → anti vs visited →
  next frontier.
- backward: broadcast level t+1's (vid → (1+delta)/sigma) the same way,
  keyed on dst, emitting predecessors; joined onto level t by
  searchsorted; ``delta = sigma · acc``.
- bc(v) = Σ_{sources s ≠ v} delta_s(v), over levels ≥ 1 only (a
  source's own delta is excluded, Brandes' definition).

Driver/state contract: per-level frontier state is Θ(S · V) for S sample
sources — with S fixed at 8 that is the SAME order as the (vid, bc)
result frame this function already returns, so holding levels as driver
numpy arrays adds no new asymptotic footprint. What stays distributed is
the only big thing: the edge scan (streamed from the object store,
zero-copy, with in-block partial combining so per-level collect traffic
is bounded by blocks × distinct touched vertices, not by edge count).
At 100 TB graph scale, run source batches of 8 and sum bc frames.

Determinism contract with the SQL oracle (pipelines/queries.py
`_betweenness_sql`): sigma is DOUBLE on both sides (exact while counts
stay < 2^53), both sides cap at ``max_levels`` (truncated Brandes —
exact whenever every shortest path from the sources is shorter), and
the final bc is ``round(·, 7)`` — the repo-wide float-parity device
(same as `_pagerank10_sql`), absorbing summation-order ulps.

Packing requires vid < 2^40 (checked); 63-bit url-hash spaces must
renumber first (same documented precondition as ParentSSSPHopsKernel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_VID_BITS = 40
_VID_MASK = np.int64((1 << _VID_BITS) - 1)

def _pack(i: np.ndarray, vid: np.ndarray) -> np.ndarray:
    return (i.astype(np.int64) << np.int64(_VID_BITS)) | vid.astype(np.int64)


def _distinct_simple_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """DISTINCT (src, dst), self-loops dropped — Brandes is defined on
    the simple digraph (duplicate edges must not multiply sigma)."""

    def clean(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        t = pa.table({"src": pa.array(s[keep], pa.int64()), "dst": pa.array(d[keep], pa.int64())})
        return t.group_by(["src", "dst"]).aggregate([])  # batch-local dedup

    per_batch = edges.map_batches(clean, batch_format="pyarrow")
    # global dedup via the bucketed reduce: key on (src, dst) pairs
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64_pair

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return (
            mix64_pair(
                batch["src"].to_numpy(zero_copy_only=False),
                batch["dst"].to_numpy(zero_copy_only=False),
            ).astype(np.int64)
            & 0x7FFFFFFF
        )

    def dedup(g: pa.Table) -> pa.Table:
        return g.group_by(["src", "dst"]).aggregate([])

    return bucketed_reduce(per_batch, bucket_of, dedup)


def _group_sum(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted exact group-sum (argsort + reduceat) — deterministic order."""
    if len(keys) == 0:
        return keys.astype(np.int64), vals.astype(np.float64)
    o = np.argsort(keys, kind="stable")
    ks = keys[o]
    st = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    return ks[st], np.add.reduceat(vals[o], st)


def _member_mask(sorted_keys: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """probe ∈ sorted_keys, vectorized (searchsorted membership)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=bool)
    pos = np.searchsorted(sorted_keys, probe)
    pos_c = np.minimum(pos, len(sorted_keys) - 1)
    return sorted_keys[pos_c] == probe


def _scan_levels(
    de: ray.data.Dataset,
    key_col: str,
    emit_col: str,
    per_source: list[tuple[np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray]:
    """One streaming pass over the edge set: for each source i, rows
    whose ``key_col`` endpoint is in that source's broadcast (vids, val)
    table emit ``(i << 40) | emit_col`` carrying val; in-block partial
    group-sum, then a driver combine of the (small) partials."""
    bcast = ray.put(per_source)

    def scan(batch: pa.Table):
        # generator: emit nothing for untouched blocks (a zero-row table
        # confuses the executor's schema tracking into noisy warnings)
        tabs = ray.get(bcast)  # zero-copy plasma read
        k = batch[key_col].to_numpy(zero_copy_only=False)
        e = batch[emit_col].to_numpy(zero_copy_only=False)
        out_k: list[np.ndarray] = []
        out_v: list[np.ndarray] = []
        for i, (vids, vals) in enumerate(tabs):
            if len(vids) == 0:
                continue
            pos = np.searchsorted(vids, k)
            pos_c = np.minimum(pos, len(vids) - 1)
            m = vids[pos_c] == k
            if not m.any():
                continue
            out_k.append(np.int64(i << _VID_BITS) | e[m].astype(np.int64))
            out_v.append(vals[pos_c[m]])
        if out_k:
            ks, vs = _group_sum(np.concatenate(out_k), np.concatenate(out_v))
            yield pa.table(
                {"ivid": pa.array(ks, pa.int64()), "val": pa.array(vs, pa.float64())}
            )

    parts = [
        t
        for t in ray.get(
            de.map_batches(scan, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    tab = pa.concat_tables(parts)
    return _group_sum(
        tab["ivid"].to_numpy(zero_copy_only=False),
        tab["val"].to_numpy(zero_copy_only=False),
    )


def _by_source(
    iv: np.ndarray, val: np.ndarray, nsrc: int
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Split a sorted packed (ivid, val) level into per-source
    (sorted vids, vals) broadcast tables."""
    bounds = np.searchsorted(iv, np.arange(nsrc + 1, dtype=np.int64) << _VID_BITS)
    return [
        (iv[bounds[i] : bounds[i + 1]] & _VID_MASK, val[bounds[i] : bounds[i + 1]])
        for i in range(nsrc)
    ]


def betweenness(
    edges: ray.data.Dataset,
    sources: list[int],
    *,
    max_levels: int = 12,
) -> "pd.DataFrame":
    """Betweenness of every vertex w.r.t. shortest paths from the given
    sample ``sources`` (directed, hop metric), truncated at
    ``max_levels`` hops. Returns a pandas frame (vid, bc) over the full
    vertex universe, bc rounded to 7 decimals."""
    import pandas as pd

    de = _distinct_simple_edges(edges).materialize()

    # vertex universe (src ∪ dst) — O(V) driver, same order as the result
    def vs(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["src"].to_numpy(zero_copy_only=False),
                    batch["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"vid": pa.array(u, pa.int64())})

    all_vids = np.unique(
        np.concatenate(
            [
                t["vid"].to_numpy(zero_copy_only=False)
                for t in ray.get(
                    de.map_batches(vs, batch_format="pyarrow").to_arrow_refs()
                )
                if t.num_rows
            ]
            or [np.empty(0, np.int64)]
        )
    )

    srcs = np.asarray(sorted(int(s) for s in sources), dtype=np.int64)
    nsrc = len(srcs)
    if nsrc and int(srcs.max()) >= (1 << _VID_BITS):
        raise ValueError(
            f"betweenness packs (source_idx << {_VID_BITS}) | vid; "
            f"vid must be < 2^{_VID_BITS} — renumber the vertex space first"
        )
    idx = np.arange(nsrc, dtype=np.int64)

    # levels[t]: (sorted packed ivid, sigma) numpy pair
    lvl_iv: list[np.ndarray] = [np.sort(_pack(idx, srcs))]
    lvl_sig: list[np.ndarray] = [np.ones(nsrc, np.float64)]
    visited = lvl_iv[0].copy()

    for _t in range(max_levels):
        cand_iv, cand_sig = _scan_levels(
            de, "src", "dst", _by_source(lvl_iv[-1], lvl_sig[-1], nsrc)
        )
        fresh = ~_member_mask(visited, cand_iv)
        if not fresh.any():
            break
        lvl_iv.append(cand_iv[fresh])  # already sorted (group-sum output)
        lvl_sig.append(cand_sig[fresh])
        visited = np.concatenate([visited, cand_iv[fresh]])
        visited.sort()

    # backward sweep: delta[t] aligned to lvl_iv[t]
    T = len(lvl_iv) - 1
    deltas: list[np.ndarray] = [np.empty(0)] * (T + 1)
    deltas[T] = np.zeros(len(lvl_iv[T]), np.float64)
    for t in range(T - 1, -1, -1):
        contrib_val = (1.0 + deltas[t + 1]) / lvl_sig[t + 1]
        acc_iv, acc_val = _scan_levels(
            de, "dst", "src", _by_source(lvl_iv[t + 1], contrib_val, nsrc)
        )
        # left-join acc onto level t (acc keys outside level t are
        # non-DAG predecessors — dropped, which IS the dist(u)=t filter)
        d = np.zeros(len(lvl_iv[t]), np.float64)
        if len(acc_iv):
            pos = np.searchsorted(lvl_iv[t], acc_iv)
            pos_c = np.minimum(pos, len(lvl_iv[t]) - 1)
            m = lvl_iv[t][pos_c] == acc_iv
            d[pos_c[m]] = acc_val[m]
        deltas[t] = lvl_sig[t] * d

    # bc(v) = Σ over levels ≥ 1 (sources' own deltas excluded)
    if T >= 1:
        kv = np.concatenate([iv & _VID_MASK for iv in lvl_iv[1:]])
        dv = np.concatenate(deltas[1:])
        bk, bv = _group_sum(kv, dv)
        bc = np.zeros(len(all_vids), np.float64)
        pos = np.searchsorted(all_vids, bk)
        bc[pos] = bv  # bk ⊆ all_vids by construction
    else:
        bc = np.zeros(len(all_vids), np.float64)
    return pd.DataFrame({"vid": all_vids, "bc": np.round(bc, 7)})


def betweenness_serial(src, dst, sources, *, max_levels: int = 12):
    """Pure-Python truncated Brandes oracle for tests (same semantics:
    simple digraph, hop metric, level cap, sources' own deltas
    excluded)."""
    import collections

    import pandas as pd

    es = {(int(a), int(b)) for a, b in zip(src, dst) if int(a) != int(b)}
    adj: dict[int, list[int]] = collections.defaultdict(list)
    for a, b in es:
        adj[a].append(b)
    verts = sorted({v for e in es for v in e})
    bc = {v: 0.0 for v in verts}
    for s in sources:
        dist = {int(s): 0}
        sigma = {int(s): 1.0}
        levels = [[int(s)]]
        for t in range(max_levels):
            nxt: dict[int, float] = collections.defaultdict(float)
            for u in levels[-1]:
                for v in adj.get(u, ()):
                    if v not in dist:
                        nxt[v] += sigma[u]
            if not nxt:
                break
            for v, sg in nxt.items():
                dist[v] = t + 1
                sigma[v] = sg
            levels.append(sorted(nxt))
        delta = {v: 0.0 for v in dist}
        for t in range(len(levels) - 2, -1, -1):
            for u in levels[t]:
                acc = 0.0
                for v in adj.get(u, ()):
                    if dist.get(v) == t + 1:
                        acc += (1.0 + delta[v]) / sigma[v]
                delta[u] = sigma[u] * acc
        for t in range(1, len(levels)):
            for v in levels[t]:
                bc[v] += delta[v]
    return pd.DataFrame(
        {"vid": verts, "bc": [round(bc[v], 7) for v in verts]}
    )
