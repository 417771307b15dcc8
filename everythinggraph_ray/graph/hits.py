"""HITS (hubs & authorities) over a dst-partitioned build.

Completes the link-analysis kernel family next to PageRank/Katz: per
iteration ``auth[v] = Σ_{u→v} hub[u]`` then ``hub[u] = Σ_{u→v} auth[v]``,
each phase L2-normalized (Kleinberg's power iteration on A^T A / A A^T).
The reference has no HITS binary; this rides the pull engine's layout
(pull.py) because one dst-partitioned edge set serves BOTH directions:

- AUTH phase is exactly the pull gather: remote hub values of the
  partition's needed srcs arrive as per-requester slices (static value
  routing — one object per (owner, requester) pair per round), then one
  ``add.reduceat`` over the CSC order produces every owned auth.
- HUB phase needs no new routing: every edge's auth[dst] is LOCAL
  (dst is owned here), so the partition reduces per-edge auth by src
  over a precomputed src-sorted view — producing partial hub sums keyed
  by the SAME need_srcs list the gather uses — and ships each owner its
  slice back along the REVERSED routing (the requester→owner direction
  of the same need lists; owners accumulate with one indexed add per
  requester).

Driver state per iteration: 2·P scalar partial sums of squares (the L2
norms) — no vertex-sized pulls. Normalization divides by the norm (not
multiply-by-inverse) so the SQL oracle's ``x / n`` matches op-for-op.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.graph.engine import _read_part_dir


class _HITSPartitionImpl:
    """One HITS partition: in-edge CSC + src-sorted view of the same
    edges, plus the owned vertices' (auth, hub) state. (Plain class so
    SALSA can subclass it; the actor handles are the decorated aliases
    below.)"""

    def __init__(self, pid: int, build_dir: str, meta: dict, filesystem=None):
        self.pid = pid
        self.P = int(meta["P"])

        vt = _read_part_dir(os.path.join(build_dir, "verts", f"p={pid:05d}"), filesystem)
        ov = (
            vt["vid"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            if vt is not None
            else np.empty(0, np.int64)
        )
        self.owned_vids = np.sort(ov)

        et = _read_part_dir(os.path.join(build_dir, "edges", f"p={pid:05d}"), filesystem)
        if et is None:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
        else:
            src = et["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            dst = et["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        assert len(dst) == 0 or (dst % self.P == pid).all(), (
            f"hits partition {pid}: edge not owned by dst — build with partition_edges_by='dst'"
        )
        # CSC view (grouped by dst) for the auth reduce
        o = np.argsort(dst, kind="stable")
        src_c, dst_c = src[o], dst[o]
        self.n_edges = len(dst_c)
        starts = (
            np.flatnonzero(np.r_[True, dst_c[1:] != dst_c[:-1]])
            if len(dst_c)
            else np.empty(0, np.int64)
        )
        self.c_red_starts = starts
        self.c_dst_pos = (
            np.searchsorted(self.owned_vids, dst_c[starts]) if len(starts) else np.empty(0, np.int64)
        )

        self.need_srcs = np.unique(src_c)
        self.c_src_idx = np.searchsorted(self.need_srcs, src_c).astype(np.int32)
        self.src_vals = np.zeros(len(self.need_srcs), dtype=np.float64)

        # src-sorted view (grouped by src) for the hub reduce: per-edge
        # auth[dst] reduced by src yields one partial per need_src
        o2 = np.argsort(src, kind="stable")
        src_s, dst_s = src[o2], dst[o2]
        self.s_red_starts = (
            np.flatnonzero(np.r_[True, src_s[1:] != src_s[:-1]])
            if len(src_s)
            else np.empty(0, np.int64)
        )
        # src_s[s_red_starts] enumerates unique srcs in sorted order == need_srcs
        self.s_dst_pos = np.searchsorted(self.owned_vids, dst_s)

        # routing (identical to pull.py): needs grouped by owner
        owner = self.need_srcs % self.P
        self.recv_perm = np.argsort(owner, kind="stable")
        self.recv_offsets = np.r_[0, np.cumsum(np.bincount(owner, minlength=self.P))]
        self.send_idx: list[np.ndarray] = [np.empty(0, np.int64)] * self.P

        self.auth = np.ones(len(self.owned_vids), dtype=np.float64)
        self.hub = np.ones(len(self.owned_vids), dtype=np.float64)

    def need_lists(self) -> list[np.ndarray]:
        s = self.need_srcs[self.recv_perm]
        return [s[self.recv_offsets[q] : self.recv_offsets[q + 1]] for q in range(self.P)]

    def set_send_lists(self, wanted: list[np.ndarray]) -> int:
        out = []
        for w in wanted:
            idx = np.searchsorted(self.owned_vids, w)
            assert len(idx) == 0 or (
                (idx < len(self.owned_vids)).all() and (self.owned_vids[idx] == w).all()
            ), f"hits partition {self.pid}: requested vid not owned"
            out.append(idx)
        self.send_idx = out
        self.send_offsets = np.r_[0, np.cumsum([len(x) for x in out])]
        self.send_cat = np.concatenate(out) if out else np.empty(0, np.int64)
        return int(self.send_offsets[-1])

    def publish_hub(self):
        """Hub values for every requester — one object per requester."""
        packed = self.hub[self.send_cat]
        out = tuple(
            packed[self.send_offsets[q] : self.send_offsets[q + 1]] for q in range(self.P)
        )
        return out if self.P > 1 else out[0]

    def auth_step(self, pub_refs) -> float:
        """auth_raw = Σ hub[src] per owned dst; returns Σ auth_raw²."""
        pubs = ray.get(list(pub_refs))
        for q, vals in enumerate(pubs):
            sl = self.recv_perm[self.recv_offsets[q] : self.recv_offsets[q + 1]]
            self.src_vals[sl] = vals
        raw = np.zeros(len(self.owned_vids), dtype=np.float64)
        if len(self.c_red_starts):
            per_edge = self.src_vals[self.c_src_idx]
            raw[self.c_dst_pos] = np.add.reduceat(per_edge, self.c_red_starts)
        self.auth = raw
        return float(np.dot(raw, raw))

    def scale_auth(self, norm: float) -> None:
        if norm > 0.0:
            self.auth = self.auth / norm

    def hub_partials(self):
        """Partial hub sums (Σ auth[dst] per src over MY edges), sliced
        per owner — one object per owner, shipped along the reversed
        gather routing."""
        partial = np.zeros(len(self.need_srcs), dtype=np.float64)
        if len(self.s_red_starts):
            per_edge = self.auth[self.s_dst_pos]
            partial[:] = np.add.reduceat(per_edge, self.s_red_starts)
        packed = partial[self.recv_perm]  # owner-contiguous
        out = tuple(
            packed[self.recv_offsets[q] : self.recv_offsets[q + 1]] for q in range(self.P)
        )
        return out if self.P > 1 else out[0]

    def hub_step(self, partial_refs) -> float:
        """Accumulate every requester's partials into owned hub_raw
        (positions = the send lists); returns Σ hub_raw²."""
        parts = ray.get(list(partial_refs))
        raw = np.zeros(len(self.owned_vids), dtype=np.float64)
        for p, vals in enumerate(parts):
            idx = self.send_idx[p]
            if len(idx):
                raw[idx] += vals  # idx unique within one requester's list
        self.hub = raw
        return float(np.dot(raw, raw))

    def scale_hub(self, norm: float) -> None:
        if norm > 0.0:
            self.hub = self.hub / norm

    def collect(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(self.owned_vids, pa.int64()),
                "auth": pa.array(self.auth, pa.float64()),
                "hub": pa.array(self.hub, pa.float64()),
            }
        )


HITSPartition = ray.remote(_HITSPartitionImpl)


def hits(build_dir: str, *, n_iters: int = 10, filesystem=None) -> dict:
    """Run HITS over a ``partition_edges_by='dst'`` build; returns
    {dataset(vid, auth, hub), iterations, metrics, ...}."""
    from everythinggraph_ray.state.fs import read_json, resolve_fs

    meta = read_json(resolve_fs(filesystem), os.path.join(build_dir, "meta.json"))
    assert meta.get("partition_edges_by") == "dst", (
        "hits needs a dst-partitioned build (partition_edges_by='dst')"
    )
    P = int(meta["P"])
    actors = [HITSPartition.remote(p, build_dir, meta, filesystem) for p in range(P)]
    try:
        needs = ray.get([a.need_lists.remote() for a in actors])
        ray.get(
            [
                actors[q].set_send_lists.remote([needs[p][q] for p in range(P)])
                for q in range(P)
            ]
        )
        metrics = []
        for it in range(1, n_iters + 1):
            t0 = time.perf_counter()
            pub = [
                a.publish_hub.options(num_returns=P).remote() if P > 1 else [a.publish_hub.remote()]
                for a in actors
            ]
            sq = ray.get(
                [actors[p].auth_step.remote([pub[q][p] for q in range(P)]) for p in range(P)]
            )
            na = float(np.sqrt(np.sum(sq)))
            ray.get([a.scale_auth.remote(na) for a in actors])
            par = [
                a.hub_partials.options(num_returns=P).remote()
                if P > 1
                else [a.hub_partials.remote()]
                for a in actors
            ]
            sq2 = ray.get(
                [actors[q].hub_step.remote([par[p][q] for p in range(P)]) for q in range(P)]
            )
            nh = float(np.sqrt(np.sum(sq2)))
            ray.get([a.scale_hub.remote(nh) for a in actors])
            metrics.append(
                {
                    "superstep": it,
                    "wall_sec": round(time.perf_counter() - t0, 6),
                    "auth_norm": na,
                    "hub_norm": nh,
                }
            )
        out_refs = [a.collect.remote() for a in actors]
        ray.get(out_refs)  # surface errors before teardown
        ds = ray.data.from_arrow_refs(out_refs)
        return {
            "dataset": ds,
            "iterations": n_iters,
            "metrics": metrics,
            "n_vertices": meta["n_vertices"],
            "n_edges": meta["n_edges"],
        }
    finally:
        for a in actors:
            ray.kill(a)


def hits_serial(src: np.ndarray, dst: np.ndarray, *, n_iters: int = 10):
    """Serial numpy oracle. Returns (vids, auth, hub)."""
    vids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(vids, src)
    d = np.searchsorted(vids, dst)
    n = len(vids)
    auth = np.ones(n, dtype=np.float64)
    hub = np.ones(n, dtype=np.float64)
    for _ in range(n_iters):
        raw = np.zeros(n, dtype=np.float64)
        np.add.at(raw, d, hub[s])
        na = np.sqrt(np.dot(raw, raw))
        auth = raw / na if na > 0 else raw
        raw = np.zeros(n, dtype=np.float64)
        np.add.at(raw, s, auth[d])
        nh = np.sqrt(np.dot(raw, raw))
        hub = raw / nh if nh > 0 else raw
    return vids, auth, hub


class _SALSAPartitionImpl(_HITSPartitionImpl):
    """SALSA (Lempel & Moran, WWW'00): HITS's power iteration on the
    degree-normalized bipartite walk instead of A^T A. Per iteration
    ``auth[v] = Σ_{u→v} hub[u]/outdeg(u)`` then
    ``hub[u] = Σ_{u→v} auth[v]/indeg(v)``, each phase L1-normalized (the
    scores are walk distributions). Same dst-partitioned layout and
    routing as HITS — the only structural addition is a one-time
    out-degree exchange (dst-partitioned builds scatter a src's edges
    across partitions, so outdeg rides the reversed need-list routing
    once; indeg is local by layout). Edge multiset semantics match HITS
    (multi-edges count)."""

    def __init__(self, pid: int, build_dir: str, meta: dict, filesystem=None):
        super().__init__(pid, build_dir, meta, filesystem)
        # indeg of every owned vid is LOCAL: all in-edges live here.
        self.indeg = np.zeros(len(self.owned_vids), dtype=np.float64)
        if len(self.c_red_starts):
            counts = np.diff(np.r_[self.c_red_starts, self.n_edges])
            self.indeg[self.c_dst_pos] = counts
        self.owned_outdeg = np.zeros(len(self.owned_vids), dtype=np.float64)
        self.src_outdeg = np.ones(len(self.need_srcs), dtype=np.float64)

    # --- one-time out-degree exchange (reuses the hub routing) ---
    def outdeg_partials(self):
        """Local edge count per need_src, sliced per owner."""
        partial = np.zeros(len(self.need_srcs), dtype=np.float64)
        if len(self.s_red_starts):
            partial[:] = np.diff(np.r_[self.s_red_starts, self.n_edges])
        packed = partial[self.recv_perm]
        out = tuple(
            packed[self.recv_offsets[q] : self.recv_offsets[q + 1]] for q in range(self.P)
        )
        return out if self.P > 1 else out[0]

    def outdeg_accumulate(self, partial_refs) -> None:
        parts = ray.get(list(partial_refs))
        for p, vals in enumerate(parts):
            idx = self.send_idx[p]
            if len(idx):
                self.owned_outdeg[idx] += vals

    def publish_outdeg(self):
        packed = self.owned_outdeg[self.send_cat]
        out = tuple(
            packed[self.send_offsets[q] : self.send_offsets[q + 1]] for q in range(self.P)
        )
        return out if self.P > 1 else out[0]

    def set_src_outdeg(self, pub_refs) -> None:
        pubs = ray.get(list(pub_refs))
        for q, vals in enumerate(pubs):
            sl = self.recv_perm[self.recv_offsets[q] : self.recv_offsets[q + 1]]
            self.src_outdeg[sl] = vals

    # --- per-iteration phases (HITS shapes, normalized messages + L1) ---
    def publish_hub(self):
        """hub/outdeg for every requester (outdeg > 0 for any requested
        vid — a vid is requested only if it appears as some edge's src)."""
        packed = self.hub[self.send_cat] / np.maximum(self.owned_outdeg[self.send_cat], 1.0)
        out = tuple(
            packed[self.send_offsets[q] : self.send_offsets[q + 1]] for q in range(self.P)
        )
        return out if self.P > 1 else out[0]

    def auth_step(self, pub_refs) -> float:
        """auth_raw = Σ hub[src]/outdeg(src) per owned dst; returns Σ raw (L1)."""
        pubs = ray.get(list(pub_refs))
        for q, vals in enumerate(pubs):
            sl = self.recv_perm[self.recv_offsets[q] : self.recv_offsets[q + 1]]
            self.src_vals[sl] = vals
        raw = np.zeros(len(self.owned_vids), dtype=np.float64)
        if len(self.c_red_starts):
            per_edge = self.src_vals[self.c_src_idx]
            raw[self.c_dst_pos] = np.add.reduceat(per_edge, self.c_red_starts)
        self.auth = raw
        return float(raw.sum())

    def hub_partials(self):
        """Partial Σ auth[dst]/indeg(dst) per src over MY edges."""
        partial = np.zeros(len(self.need_srcs), dtype=np.float64)
        if len(self.s_red_starts):
            per_edge = self.auth[self.s_dst_pos] / np.maximum(self.indeg[self.s_dst_pos], 1.0)
            partial[:] = np.add.reduceat(per_edge, self.s_red_starts)
        packed = partial[self.recv_perm]
        out = tuple(
            packed[self.recv_offsets[q] : self.recv_offsets[q + 1]] for q in range(self.P)
        )
        return out if self.P > 1 else out[0]

    def hub_step(self, partial_refs) -> float:
        parts = ray.get(list(partial_refs))
        raw = np.zeros(len(self.owned_vids), dtype=np.float64)
        for p, vals in enumerate(parts):
            idx = self.send_idx[p]
            if len(idx):
                raw[idx] += vals
        self.hub = raw
        return float(raw.sum())

    def collect(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(self.owned_vids, pa.int64()),
                "salsa_auth": pa.array(self.auth, pa.float64()),
                "salsa_hub": pa.array(self.hub, pa.float64()),
            }
        )


SALSAPartition = ray.remote(_SALSAPartitionImpl)


def salsa(build_dir: str, *, n_iters: int = 10, filesystem=None) -> dict:
    """Run fixed-iteration SALSA over a ``partition_edges_by='dst'``
    build; returns {dataset(vid, salsa_auth, salsa_hub), ...}. Driver
    state per iteration: 2·P scalar L1 partials — same footprint as
    hits()."""
    from everythinggraph_ray.state.fs import read_json, resolve_fs

    meta = read_json(resolve_fs(filesystem), os.path.join(build_dir, "meta.json"))
    assert meta.get("partition_edges_by") == "dst", (
        "salsa needs a dst-partitioned build (partition_edges_by='dst')"
    )
    P = int(meta["P"])
    actors = [SALSAPartition.remote(p, build_dir, meta, filesystem) for p in range(P)]
    try:
        needs = ray.get([a.need_lists.remote() for a in actors])
        ray.get(
            [
                actors[q].set_send_lists.remote([needs[p][q] for p in range(P)])
                for q in range(P)
            ]
        )
        # one-time out-degree exchange along the established routing
        par = [
            a.outdeg_partials.options(num_returns=P).remote()
            if P > 1
            else [a.outdeg_partials.remote()]
            for a in actors
        ]
        ray.get([actors[q].outdeg_accumulate.remote([par[p][q] for p in range(P)]) for q in range(P)])
        pub = [
            a.publish_outdeg.options(num_returns=P).remote()
            if P > 1
            else [a.publish_outdeg.remote()]
            for a in actors
        ]
        ray.get([actors[p].set_src_outdeg.remote([pub[q][p] for q in range(P)]) for p in range(P)])

        metrics = []
        for it in range(1, n_iters + 1):
            t0 = time.perf_counter()
            pub = [
                a.publish_hub.options(num_returns=P).remote() if P > 1 else [a.publish_hub.remote()]
                for a in actors
            ]
            s1 = ray.get(
                [actors[p].auth_step.remote([pub[q][p] for q in range(P)]) for p in range(P)]
            )
            na = float(np.sum(s1))
            ray.get([a.scale_auth.remote(na) for a in actors])
            par = [
                a.hub_partials.options(num_returns=P).remote()
                if P > 1
                else [a.hub_partials.remote()]
                for a in actors
            ]
            s2 = ray.get(
                [actors[q].hub_step.remote([par[p][q] for p in range(P)]) for q in range(P)]
            )
            nh = float(np.sum(s2))
            ray.get([a.scale_hub.remote(nh) for a in actors])
            metrics.append(
                {
                    "superstep": it,
                    "wall_sec": round(time.perf_counter() - t0, 6),
                    "auth_norm": na,
                    "hub_norm": nh,
                }
            )
        out_refs = [a.collect.remote() for a in actors]
        ray.get(out_refs)
        ds = ray.data.from_arrow_refs(out_refs)
        return {
            "dataset": ds,
            "iterations": n_iters,
            "metrics": metrics,
            "n_vertices": meta["n_vertices"],
            "n_edges": meta["n_edges"],
        }
    finally:
        for a in actors:
            ray.kill(a)


def salsa_serial(src: np.ndarray, dst: np.ndarray, *, n_iters: int = 10):
    """Serial numpy oracle for fixed-iteration SALSA. Returns
    (vids, salsa_auth, salsa_hub)."""
    vids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(vids, src)
    d = np.searchsorted(vids, dst)
    n = len(vids)
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    indeg = np.bincount(d, minlength=n).astype(np.float64)
    auth = np.ones(n, dtype=np.float64)
    hub = np.ones(n, dtype=np.float64)
    for _ in range(n_iters):
        raw = np.zeros(n, dtype=np.float64)
        np.add.at(raw, d, hub[s] / outdeg[s])
        na = raw.sum()
        auth = raw / na if na > 0 else raw
        raw = np.zeros(n, dtype=np.float64)
        np.add.at(raw, s, auth[d] / indeg[d])
        nh = raw.sum()
        hub = raw / nh if nh > 0 else raw
    return vids, auth, hub
