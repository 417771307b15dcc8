"""Pull-mode kernels: per-partition CSC gather — the cross-variants that
complete the reference's push-vs-pull methodology (pagerank_simple.c:72-84
``pagerank_pull``; NUMA pull pr_numa.c:245-354; BFS pull branch
bfs_simple.c:104-229; SSSP pull sssp_pushpull.c:69-98).

Two kernel families share the static value-routing machinery:

- ``pagerank_pull``: dense every round (PR touches every edge).
- ``frontier_pull`` (BFS / SSSP hops / SSSP weighted): owners publish only
  the dists that CHANGED last round; each partition then relaxes either
  SPARSE (expand only the changed srcs' edge runs — the push-direction
  analogue) or DENSE (one min.reduceat over the full CSC — the pull scan),
  switched per round by the driver on the reference's Beamer threshold
  ``frontier_size + frontier_degree > n_edges / 20`` (bfs_simple.c:191,
  sssp_pushpull.c:169-174) computed from driver-side counts.

Physical layout: edges partitioned by ``dst % P`` (build_graph
``partition_edges_by='dst'``) — each partition holds the FULL in-edge CSC
of its owned vertices, grouped by dst. The distributed pull problem is
that src values live remotely; the solution here is static value routing:

    init:       each gatherer announces WHICH src vids it needs from each
                owner (a one-time need-list exchange, precomputed index
                positions on both sides);
    superstep:  each owner packs ``value/outdeg`` for exactly the vids
                each requester needs — one SEPARATE object per requester
                per round (``num_returns=P``), so each gatherer fetches
                ONLY its own slice (per-round traffic on a real cluster is
                exactly Σ|need lists|, never P× that); it scatters the
                slices onto its edge positions and reduces by dst with one
                ``add.reduceat``.

Traffic per round is Σ |distinct srcs needed per partition| values — the
classic pull advantage on skewed graphs (a hub's value crosses each
partition boundary ONCE, never per-edge), without any distributed atomic.
Results are cross-checked allclose-1e-6 against the push engine in tests.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.graph.engine import _read_part_dir


@ray.remote
class PullPartition:
    """One pull partition: in-edge CSC over owned dsts + owned src state."""

    def __init__(self, pid: int, build_dir: str, meta: dict, filesystem=None):
        self.pid = pid
        self.P = int(meta["P"])

        vt = _read_part_dir(os.path.join(build_dir, "verts", f"p={pid:05d}"), filesystem)
        if vt is None:
            ov = np.empty(0, np.int64)
            od = np.empty(0, np.int64)
        else:
            ov = vt["vid"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            od = vt["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        o = np.argsort(ov)
        self.owned_vids, self.owned_outdeg = ov[o], od[o]

        et = _read_part_dir(os.path.join(build_dir, "edges", f"p={pid:05d}"), filesystem)
        if et is None:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
        else:
            src = et["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            dst = et["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        assert len(dst) == 0 or (dst % self.P == pid).all(), (
            f"pull partition {pid}: edge not owned by dst — build with partition_edges_by='dst'"
        )
        # CSC: edges grouped by dst for one reduceat per gather
        o = np.argsort(dst, kind="stable")
        src, dst = src[o], dst[o]
        self.n_edges = len(dst)
        starts = (
            np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]]) if len(dst) else np.empty(0, np.int64)
        )
        self.red_starts = starts
        self.dst_pos = (
            np.searchsorted(self.owned_vids, dst[starts]) if len(starts) else np.empty(0, np.int64)
        )

        # distinct srcs this partition gathers, and their owner partitions
        self.need_srcs = np.unique(src)
        self.src_idx = np.searchsorted(self.need_srcs, src).astype(np.int32)
        self.src_vals = np.zeros(len(self.need_srcs), dtype=np.float64)

        # routing: positions of the slice each OWNER will send us
        owner = self.need_srcs % self.P
        order = np.argsort(owner, kind="stable")
        self.recv_perm = order  # need_srcs[recv_perm] is owner-contiguous
        self.recv_offsets = np.r_[0, np.cumsum(np.bincount(owner, minlength=self.P))]

        self.vals: np.ndarray | None = None
        # filled by exchange_needs: for each requester q, positions into
        # owned_vids of the vids q needs from us
        self.send_idx: list[np.ndarray] = [np.empty(0, np.int64)] * self.P

    def need_lists(self) -> list[np.ndarray]:
        """needed vids per owner partition (owner-contiguous slices)."""
        s = self.need_srcs[self.recv_perm]
        return [
            s[self.recv_offsets[q] : self.recv_offsets[q + 1]] for q in range(self.P)
        ]

    def set_send_lists(self, wanted: list[np.ndarray]) -> int:
        """wanted[q] = vids requester q needs from ME (all owned here)."""
        out = []
        for w in wanted:
            idx = np.searchsorted(self.owned_vids, w)
            assert len(idx) == 0 or (
                (idx < len(self.owned_vids)).all() and (self.owned_vids[idx] == w).all()
            ), f"pull partition {self.pid}: requested vid not owned"
            out.append(idx)
        self.send_idx = out
        self.send_offsets = np.r_[0, np.cumsum([len(x) for x in out])]
        self.send_cat = np.concatenate(out) if out else np.empty(0, np.int64)
        return int(self.send_offsets[-1])

    def init_values(self, init: float) -> int:
        self.vals = np.full(len(self.owned_vids), init, dtype=np.float64)
        return len(self.owned_vids)

    def publish(self):
        """Pack value/outdeg for every requester — one object PER
        REQUESTER per round (called with ``num_returns=P``), so a gatherer
        on another node fetches only its own slice, never the whole pack."""
        msgs = self.vals / np.maximum(self.owned_outdeg, 1)
        packed = msgs[self.send_cat]
        out = tuple(
            packed[self.send_offsets[q] : self.send_offsets[q + 1]] for q in range(self.P)
        )
        return out if self.P > 1 else out[0]

    def gather(self, pub_refs, damping: float, n_vertices: int) -> tuple[float, int]:
        """Fetch MY slice from every owner (pub_refs[q] is owner q's slice
        for this partition), scatter onto edge positions, reduce by dst,
        apply the PageRank rule."""
        pubs = ray.get(list(pub_refs))
        for q, vals in enumerate(pubs):
            sl = self.recv_perm[self.recv_offsets[q] : self.recv_offsets[q + 1]]
            self.src_vals[sl] = vals
        agg = np.zeros(len(self.owned_vids), dtype=np.float64)
        if len(self.red_starts):
            per_edge = self.src_vals[self.src_idx]
            agg[self.dst_pos] = np.add.reduceat(per_edge, self.red_starts)
        new = (1.0 - damping) / max(1, n_vertices) + damping * agg
        delta = float(np.max(np.abs(new - self.vals))) if len(new) else 0.0
        self.vals = new
        return delta, self.n_edges

    def collect(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(self.owned_vids, pa.int64()),
                "pagerank": pa.array(self.vals, pa.float64()),
            }
        )


def pagerank_pull(
    build_dir: str,
    *,
    damping: float = 0.85,
    tol: float | None = 1e-6,
    n_iters: int | None = None,
    max_iters: int = 10_000,
    filesystem=None,
) -> dict:
    """Run pull-mode PageRank over a ``partition_edges_by='dst'`` build.
    Same update rule and init (prev=0.15, pagerank_simple.c:51-55) as the
    push engine — values agree to float64 associativity (~1e-14)."""
    from everythinggraph_ray.state.fs import read_json, resolve_fs

    meta = read_json(resolve_fs(filesystem), os.path.join(build_dir, "meta.json"))
    assert meta.get("partition_edges_by") == "dst", (
        "pull engine needs a dst-partitioned build (partition_edges_by='dst')"
    )
    P = int(meta["P"])
    actors = [PullPartition.remote(p, build_dir, meta, filesystem) for p in range(P)]
    try:
        needs = ray.get([a.need_lists.remote() for a in actors])
        # transpose: owner q receives, for each requester p, needs[p][q]
        ray.get(
            [
                actors[q].set_send_lists.remote([needs[p][q] for p in range(P)])
                for q in range(P)
            ]
        )
        ray.get([a.init_values.remote(0.15) for a in actors])

        limit = n_iters if n_iters is not None else max_iters
        metrics = []
        it = 0
        while it < limit:
            t0 = time.perf_counter()
            # one object per (owner, requester) pair: gatherer p receives
            # only pub[q][p] — its own slice from each owner q
            pub = [
                a.publish.options(num_returns=P).remote() if P > 1 else [a.publish.remote()]
                for a in actors
            ]
            stats = ray.get(
                [
                    actors[p].gather.remote(
                        [pub[q][p] for q in range(P)], damping, meta["n_vertices"]
                    )
                    for p in range(P)
                ]
            )
            delta = max(s[0] for s in stats)
            it += 1
            metrics.append(
                {
                    "superstep": it,
                    "wall_sec": round(time.perf_counter() - t0, 6),
                    "delta": delta,
                    "edges": meta["n_edges"],
                }
            )
            if n_iters is None and tol is not None and delta < tol:
                break
        out_refs = [a.collect.remote() for a in actors]
        ray.get(out_refs)  # resolve + surface errors before actor teardown
        ds = ray.data.from_arrow_refs(out_refs)
        return {
            "dataset": ds,
            "iterations": it,
            "metrics": metrics,
            "n_vertices": meta["n_vertices"],
            "n_edges": meta["n_edges"],
        }
    finally:
        for a in actors:
            ray.kill(a)


_I64_UNREACHED = np.iinfo(np.int64).max


@ray.remote
class FrontierPullPartition:
    """One frontier-kernel pull partition over a dst-partitioned build:
    in-edge CSC of the owned dsts, the owned dist state, and an
    incrementally-updated mirror of every needed src dist.

    kind: 'hops' relaxes ``dist + 1`` int64 (sssp_pushpull.c:46 push
    semantics, shared by BFS via root-dist=1); 'weighted' relaxes
    ``dist + edge.weight`` float64 (the reference PULL asymmetry,
    sssp_pushpull.c:81). Self-loop edges are dropped at load: a
    self-relax can never improve a dist (weights are >= 0)."""

    def __init__(
        self, pid: int, build_dir: str, meta: dict, kind: str, root: int, root_value,
        filesystem=None,
    ):
        self.pid = pid
        self.P = int(meta["P"])
        self.kind = kind
        self.dtype = np.float64 if kind == "weighted" else np.int64
        self.unreached = np.inf if kind == "weighted" else _I64_UNREACHED

        vt = _read_part_dir(os.path.join(build_dir, "verts", f"p={pid:05d}"), filesystem)
        if vt is None:
            ov, od = np.empty(0, np.int64), np.empty(0, np.int64)
        else:
            ov = vt["vid"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            od = vt["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        o = np.argsort(ov)
        self.owned_vids, self.owned_outdeg = ov[o], od[o]

        et = _read_part_dir(os.path.join(build_dir, "edges", f"p={pid:05d}"), filesystem)
        if et is None:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
            w = None
        else:
            src = et["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            dst = et["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            w = (
                et["weight"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
                if "weight" in et.column_names
                else None
            )
        assert len(dst) == 0 or (dst % self.P == pid).all(), (
            f"frontier pull partition {pid}: edge not owned by dst — "
            "build with partition_edges_by='dst'"
        )
        if kind == "weighted" and w is None:
            raise ValueError("kind='weighted' needs a weighted build")
        keep = src != dst  # self-relax never improves (w >= 0)
        src, dst = src[keep], dst[keep]
        if w is not None:
            w = w[keep]
        self.n_edges = len(dst)

        # distinct needed srcs + per-edge index into them
        self.need_srcs = np.unique(src)
        src_idx = np.searchsorted(self.need_srcs, src).astype(np.int32)

        # DENSE layout: edges grouped by dst for one min.reduceat
        od_perm = np.argsort(dst, kind="stable")
        dst_d = dst[od_perm]
        self.src_idx_d = src_idx[od_perm]
        self.w_d = w[od_perm] if w is not None else None
        starts = (
            np.flatnonzero(np.r_[True, dst_d[1:] != dst_d[:-1]])
            if len(dst_d)
            else np.empty(0, np.int64)
        )
        self.red_starts = starts
        self.dst_pos_d = (
            np.searchsorted(self.owned_vids, dst_d[starts]) if len(starts) else np.empty(0, np.int64)
        )

        # SPARSE layout: edges grouped by src — changed srcs expand to
        # their edge runs only (the push-direction relax)
        os_perm = np.argsort(src_idx, kind="stable")
        self.sp_src_idx = src_idx[os_perm]
        self.sp_dst_pos = (
            np.searchsorted(self.owned_vids, dst[os_perm]) if len(dst) else np.empty(0, np.int64)
        )
        self.sp_w = w[os_perm] if w is not None else None
        # run boundaries per need_src (every need_src has >= 1 edge)
        counts = np.bincount(self.sp_src_idx, minlength=len(self.need_srcs))
        self.sp_starts = np.r_[0, np.cumsum(counts)]

        # routing: identical to PullPartition
        owner = self.need_srcs % self.P
        order = np.argsort(owner, kind="stable")
        self.recv_perm = order
        self.recv_offsets = np.r_[0, np.cumsum(np.bincount(owner, minlength=self.P))]

        # state
        self.dist = np.full(len(self.owned_vids), self.unreached, dtype=self.dtype)
        self.changed = np.zeros(len(self.owned_vids), dtype=bool)
        i = np.searchsorted(self.owned_vids, root)
        if i < len(self.owned_vids) and self.owned_vids[i] == root:
            self.dist[i] = root_value
            self.changed[i] = True
        self.src_vals = np.full(len(self.need_srcs), self.unreached, dtype=self.dtype)
        self.send_idx: list[np.ndarray] = [np.empty(0, np.int64)] * self.P

    # routing handshake (one-time) -------------------------------------
    def need_lists(self) -> list[np.ndarray]:
        s = self.need_srcs[self.recv_perm]
        return [s[self.recv_offsets[q] : self.recv_offsets[q + 1]] for q in range(self.P)]

    def set_send_lists(self, wanted: list[np.ndarray]) -> tuple[int, int]:
        out = []
        for wv in wanted:
            idx = np.searchsorted(self.owned_vids, wv)
            assert len(idx) == 0 or (
                (idx < len(self.owned_vids)).all() and (self.owned_vids[idx] == wv).all()
            ), f"frontier pull partition {self.pid}: requested vid not owned"
            out.append(idx)
        self.send_idx = out
        # seed stats so the driver can pick round 1's mode
        return int(self.changed.sum()), int(self.owned_outdeg[self.changed].sum())

    # per-round protocol ------------------------------------------------
    def publish_changed(self):
        """Per requester: (positions-within-its-slice, dist values) of the
        owned vids that changed last round ∩ its need list. One object per
        requester (num_returns=P): a real cluster ships only deltas."""
        out = []
        for q in range(self.P):
            idx = self.send_idx[q]
            m = self.changed[idx] if len(idx) else np.empty(0, bool)
            rel = np.flatnonzero(m)
            out.append((rel.astype(np.int32), self.dist[idx[rel]]))
        return tuple(out) if self.P > 1 else out[0]

    def relax(self, pub_refs, dense: bool) -> tuple[int, int, int]:
        """Ingest my delta slices from every owner, then relax either
        DENSE (full CSC min.reduceat) or SPARSE (only the changed srcs'
        edge runs). Returns (n_changed, changed_outdeg_sum, edges_scanned)."""
        pubs = ray.get(list(pub_refs))
        upd = []
        for q, (rel, vals) in enumerate(pubs):
            if not len(rel):
                continue
            sl = self.recv_perm[self.recv_offsets[q] + rel]
            self.src_vals[sl] = vals
            upd.append(sl)
        pend = np.concatenate(upd) if upd else np.empty(0, np.int64)
        agg = np.full(len(self.owned_vids), self.unreached, dtype=self.dtype)
        scanned = 0
        if dense:
            if len(self.red_starts):
                if self.kind == "weighted":
                    per_edge = self.src_vals[self.src_idx_d] + self.w_d
                else:
                    sv = self.src_vals[self.src_idx_d]
                    per_edge = np.where(sv == self.unreached, self.unreached, sv + 1)
                red = np.minimum.reduceat(per_edge, self.red_starts)
                np.minimum.at(agg, self.dst_pos_d, red)
                scanned = self.n_edges
        else:
            chg = np.unique(pend)
            if len(chg):
                lens = self.sp_starts[chg + 1] - self.sp_starts[chg]
                total = int(lens.sum())
                if total:
                    e = np.repeat(self.sp_starts[chg] - np.r_[0, np.cumsum(lens)[:-1]], lens) + np.arange(total)
                    sv = self.src_vals[self.sp_src_idx[e]]
                    if self.kind == "weighted":
                        per_edge = sv + self.sp_w[e]
                    else:
                        per_edge = np.where(sv == self.unreached, self.unreached, sv + 1)
                    np.minimum.at(agg, self.sp_dst_pos[e], per_edge)
                    scanned = total
        improved = agg < self.dist
        self.dist[improved] = agg[improved]
        self.changed = improved
        return (
            int(improved.sum()),
            int(self.owned_outdeg[improved].sum()),
            scanned,
        )

    def collect(self, value_col: str, unreached_to_zero: bool = False) -> pa.Table:
        vals = self.dist
        if unreached_to_zero:
            vals = np.where(vals == self.unreached, 0, vals)
        return pa.table(
            {
                "vid": pa.array(self.owned_vids, pa.int64()),
                value_col: pa.array(vals),
            }
        )


def frontier_pull(
    build_dir: str,
    root: int,
    *,
    kind: str = "sssp_hops",
    max_iters: int = 100_000,
    switch_den: int = 20,
    force_mode: str | None = None,
    filesystem=None,
) -> dict:
    """Run a frontier kernel over a ``partition_edges_by='dst'`` build in
    pull layout with the reference's adaptive direction switch.

    kind: 'bfs' (dist init 0 / root 1 / unreached stays 0 — the
    bfs_simple.c level semantics, identical values to the push BFSKernel),
    'sssp_hops' (root 0, +1 relax, unreached int64 max) or
    'sssp_weighted' (root 0.0, +w relax, unreached +inf; needs a weighted
    build). force_mode ('sparse' | 'dense') pins the per-round decision
    for cross-variant tests; default None = the Beamer rule
    ``frontier + frontier_degree > n_edges / switch_den`` from driver-side
    counts (bfs_simple.c:191)."""
    from everythinggraph_ray.state.fs import read_json, resolve_fs

    meta = read_json(resolve_fs(filesystem), os.path.join(build_dir, "meta.json"))
    assert meta.get("partition_edges_by") == "dst", (
        "frontier_pull needs a dst-partitioned build (partition_edges_by='dst')"
    )
    P = int(meta["P"])
    inner = "weighted" if kind == "sssp_weighted" else "hops"
    root_value = 1 if kind == "bfs" else (0.0 if inner == "weighted" else 0)
    actors = [
        FrontierPullPartition.remote(p, build_dir, meta, inner, root, root_value, filesystem)
        for p in range(P)
    ]
    try:
        needs = ray.get([a.need_lists.remote() for a in actors])
        seed = ray.get(
            [
                actors[q].set_send_lists.remote([needs[p][q] for p in range(P)])
                for q in range(P)
            ]
        )
        changed = sum(s[0] for s in seed)
        changed_deg = sum(s[1] for s in seed)
        n_edges = int(meta["n_edges"])
        it = 0
        metrics = []
        modes: list[str] = []
        while changed and it < max_iters:
            if force_mode:
                dense = force_mode == "dense"
            else:
                dense = (changed + changed_deg) > n_edges / switch_den
            t0 = time.perf_counter()
            pub = [
                a.publish_changed.options(num_returns=P).remote()
                if P > 1
                else [a.publish_changed.remote()]
                for a in actors
            ]
            stats = ray.get(
                [
                    actors[p].relax.remote([pub[q][p] for q in range(P)], dense)
                    for p in range(P)
                ]
            )
            changed = sum(s[0] for s in stats)
            changed_deg = sum(s[1] for s in stats)
            it += 1
            modes.append("dense" if dense else "sparse")
            metrics.append(
                {
                    "superstep": it,
                    "wall_sec": round(time.perf_counter() - t0, 6),
                    "mode": modes[-1],
                    "changed": changed,
                    "edges_scanned": sum(s[2] for s in stats),
                }
            )
        value_col = {"bfs": "bfs", "sssp_hops": "sssp_hops", "sssp_weighted": "sssp_weighted"}[kind]
        out_refs = [a.collect.remote(value_col, kind == "bfs") for a in actors]
        ray.get(out_refs)
        return {
            "dataset": ray.data.from_arrow_refs(out_refs),
            "iterations": it,
            "metrics": metrics,
            "modes": modes,
            "n_vertices": meta["n_vertices"],
            "n_edges": meta["n_edges"],
        }
    finally:
        for a in actors:
            ray.kill(a)
