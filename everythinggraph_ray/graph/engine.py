"""Superstep engine: partition actors + BSP driver + checkpoint/lineage.

This is the one place the Dataset API genuinely can't express the
semantics — per-partition CSR blocks and vertex-state arrays that persist
across supersteps (the reference's global ``nodes[] + edge_array_out``,
random.h:82-93, rebuilt here as per-partition numpy buffers inside Ray
actors, SURVEY.md §2.c C1/C2). Everything around it (extract, dedup,
degree, partition spill, result collection) is Ray Data.

Message flow per superstep (the distributed replacement for the
reference's atomic scatter, pagerank_simple.c:31-36):

  driver: hub_ref = broadcast of hub-vertex values (ray.put once)
  each actor.scatter(): gather src values (owned state or hub broadcast)
      → per-edge messages over the local CSR (vectorized numpy)
      → PARTIAL-aggregate by dst (sort+reduceat, precomputed for the
        all-active path) → bucket by dst % P → ray.put each bucket
  each actor.apply(refs): fetch its P buckets straight from the object
      store (never through the driver), final-aggregate, apply, report
      (delta, n_changed). BSP barrier = the driver's ray.get.

Partitioning assumption (documented per SURVEY.md §2 custom-operator
rule): vertex v's state is owned by partition ``v % P``; all edges with
src=v live in partition ``v % P`` EXCEPT hub srcs (outdeg > threshold),
whose edges are spread ``(src+dst) % P`` and whose values are broadcast —
mirrors emit partial aggregates, edge coverage stays disjoint.

Checkpoint/resume (north rule): every ``checkpoint_every`` supersteps each
actor writes its owned state ``(vid, value, active)`` to
``ckpt/superstep=K/part-PID.parquet``; the driver then writes
``lineage.json`` (superstep, input fingerprint, partition map, per-step
metrics) and a ``_SUCCESS`` marker. ``run(..., resume=True)`` loads the
latest complete snapshot and continues mid-iteration.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from everythinggraph_ray.graph.kernels import Kernel


def _read_part_dir(path: str) -> pa.Table | None:
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])


@ray.remote
class GraphPartition:
    """One graph partition: pinned CSR block + owned vertex state."""

    def __init__(self, pid: int, build_dir: str, meta: dict):
        self.pid = pid
        self.P = int(meta["P"])
        self.meta = meta

        # ---- edges of this partition (src-grouped CSR) -------------------
        et = _read_part_dir(os.path.join(build_dir, "edges", f"p={pid:05d}"))
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
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        if w is not None:
            w = w[order]
        self.usrc, self.out_counts = np.unique(src, return_counts=True)
        self.dst_by_src = dst
        self.w_by_src = w
        self.n_edges = len(dst)
        srcs_expanded = np.repeat(self.usrc, self.out_counts)
        self.not_self = srcs_expanded != dst  # for skip_self_loops kernels

        # dst-grouping precompute for the all-active fast path
        self.perm_dst = np.argsort(dst, kind="stable")
        dst_sorted = dst[self.perm_dst]
        if len(dst_sorted):
            starts = np.flatnonzero(np.r_[True, dst_sorted[1:] != dst_sorted[:-1]])
        else:
            starts = np.empty(0, np.int64)
        self.red_starts = starts
        self.uniq_dst = dst_sorted[starts] if len(starts) else np.empty(0, np.int64)
        self.uniq_dst_bucket = (self.uniq_dst % self.P).astype(np.int64)

        # ---- owned vertices + out-degrees --------------------------------
        vt = _read_part_dir(os.path.join(build_dir, "verts", f"p={pid:05d}"))
        if vt is None:
            self.owned_vids = np.empty(0, np.int64)
            self.owned_outdeg = np.empty(0, np.int64)
        else:
            ov = vt["vid"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            od = vt["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            o = np.argsort(ov)
            self.owned_vids, self.owned_outdeg = ov[o], od[o]

        # ---- hub bookkeeping --------------------------------------------
        self.hub_vids = np.asarray(meta.get("hub_vids", []), dtype=np.int64)
        self.hub_outdeg = np.asarray(meta.get("hub_outdeg", []), dtype=np.int64)
        hi = np.searchsorted(self.hub_vids, self.usrc) if len(self.hub_vids) else np.empty(0, np.int64)
        if len(self.hub_vids):
            self.src_is_hub = (hi < len(self.hub_vids)) & (
                self.hub_vids[np.minimum(hi, len(self.hub_vids) - 1)] == self.usrc
            )
            self.src_hub_idx = np.minimum(hi, len(self.hub_vids) - 1)
        else:
            self.src_is_hub = np.zeros(len(self.usrc), dtype=bool)
            self.src_hub_idx = np.zeros(len(self.usrc), dtype=np.int64)
        # non-hub srcs must be owned here (partitioning invariant)
        nh = ~self.src_is_hub
        oi = np.searchsorted(self.owned_vids, self.usrc[nh])
        assert len(oi) == 0 or (
            (oi < len(self.owned_vids)).all() and (self.owned_vids[oi] == self.usrc[nh]).all()
        ), f"partition {pid}: non-hub src not owned — partitioning invariant broken"
        self.src_owned_idx = np.zeros(len(self.usrc), dtype=np.int64)
        self.src_owned_idx[nh] = oi
        # src out-degrees (local CSR count is NOT the global degree for hubs)
        self.src_outdeg = np.where(
            self.src_is_hub,
            self.hub_outdeg[self.src_hub_idx] if len(self.hub_vids) else 0,
            self.owned_outdeg[self.src_owned_idx] if len(self.owned_vids) else 0,
        )
        # owned hub positions (for hub snapshots)
        if len(self.hub_vids):
            own_h = np.searchsorted(self.owned_vids, self.hub_vids)
            mask = (own_h < len(self.owned_vids)) & (
                self.owned_vids[np.minimum(own_h, len(self.owned_vids) - 1)] == self.hub_vids
            )
            self.owned_hub_pos = own_h[mask]
            self.owned_hub_vids = self.hub_vids[mask]
        else:
            self.owned_hub_pos = np.empty(0, np.int64)
            self.owned_hub_vids = np.empty(0, np.int64)

        self.kernel: Kernel | None = None
        self.vals: np.ndarray | None = None
        self.active: np.ndarray | None = None

    # ------------------------------------------------------------------
    def init_kernel(self, kernel: Kernel, ctx: dict) -> int:
        self.kernel = kernel
        self.ctx = ctx
        self.vals = kernel.init_values(self.owned_vids, self.owned_outdeg, ctx)
        self.active = kernel.init_active(self.owned_vids, ctx)
        return int(self.active.sum())

    def hub_snapshot(self):
        """(hub_vids, values, active) for hubs owned by this partition."""
        if not len(self.owned_hub_pos):
            return None
        return (
            self.owned_hub_vids,
            self.vals[self.owned_hub_pos],
            self.active[self.owned_hub_pos],
        )

    # ------------------------------------------------------------------
    def scatter(self, hub_state=None):
        """Produce P message buckets; returns list of P ObjectRefs of
        (dst_ids, values) or None for empty buckets."""
        k = self.kernel
        if hub_state is not None:
            hvids, hvals, hactive = hub_state
        # per-src values + activity
        src_vals = np.empty(len(self.usrc), dtype=k.dtype)
        src_act = np.empty(len(self.usrc), dtype=bool)
        nh = ~self.src_is_hub
        if len(self.owned_vids):
            src_vals[nh] = self.vals[self.src_owned_idx[nh]]
            src_act[nh] = self.active[self.src_owned_idx[nh]]
        if self.src_is_hub.any():
            pos = np.searchsorted(hvids, self.usrc[self.src_is_hub])
            src_vals[self.src_is_hub] = hvals[pos]
            src_act[self.src_is_hub] = hactive[pos]

        msgs = k.src_messages(src_vals, self.src_outdeg)
        per_edge = np.repeat(msgs, self.out_counts)
        if k.needs_weights:
            per_edge = k.edge_values(per_edge, self.w_by_src)

        all_active = (not k.frontier) or bool(src_act.all())
        if all_active and not k.skip_self_loops:
            # fast path: precomputed dst grouping
            v = per_edge[self.perm_dst]
            if k.combine == "sum":
                agg = np.add.reduceat(v, self.red_starts) if len(self.red_starts) else v[:0]
            else:
                agg = np.minimum.reduceat(v, self.red_starts) if len(self.red_starts) else v[:0]
            uniq, bucket = self.uniq_dst, self.uniq_dst_bucket
        else:
            emask = np.repeat(src_act, self.out_counts)
            if k.skip_self_loops:
                emask = emask & self.not_self
            d = self.dst_by_src[emask]
            v = per_edge[emask]
            if len(d):
                o = np.argsort(d, kind="stable")
                d, v = d[o], v[o]
                st = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
                uniq = d[st]
                agg = (np.add.reduceat(v, st) if k.combine == "sum" else np.minimum.reduceat(v, st))
            else:
                uniq = np.empty(0, np.int64)
                agg = v[:0]
            bucket = (uniq % self.P).astype(np.int64)

        out = []
        for q in range(self.P):
            m = bucket == q
            if m.any():
                out.append(ray.put((uniq[m], agg[m])))
            else:
                out.append(None)
        return out

    # ------------------------------------------------------------------
    def apply(self, refs):
        """Final-combine this partition's incoming buckets and apply."""
        k = self.kernel
        parts = [ray.get(r) for r in refs if r is not None]
        n_msgs = sum(len(p[0]) for p in parts)
        agg_full = (
            np.zeros(len(self.owned_vids), dtype=k.dtype)
            if k.combine == "sum"
            else np.full(
                len(self.owned_vids),
                np.inf if k.dtype == np.float64 else np.iinfo(np.int64).max,
                dtype=k.dtype,
            )
        )
        has_msg = np.zeros(len(self.owned_vids), dtype=bool)
        for dvid, dval in parts:
            pos = np.searchsorted(self.owned_vids, dvid)
            if k.combine == "sum":
                agg_full[pos] += dval
            else:
                np.minimum.at(agg_full, pos, dval)
            has_msg[pos] = True
        new, changed, delta = k.apply(self.vals, agg_full, has_msg, self.ctx)
        self.vals = new
        self.active = changed if k.frontier else np.ones(len(self.owned_vids), dtype=bool)
        # piggyback the fresh hub snapshot: saves the driver a whole extra
        # RPC round per superstep
        return float(delta), int(changed.sum()), int(n_msgs), self.hub_snapshot()

    # ------------------------------------------------------------------
    def collect(self, value_col: str = "value") -> pa.Table:
        return pa.table(
            {"vid": pa.array(self.owned_vids, pa.int64()), value_col: pa.array(self.vals)}
        )

    def save_checkpoint(self, ckpt_dir: str, superstep: int) -> int:
        d = os.path.join(ckpt_dir, f"superstep={superstep:05d}")
        os.makedirs(d, exist_ok=True)
        t = pa.table(
            {
                "vid": pa.array(self.owned_vids, pa.int64()),
                "value": pa.array(self.vals),
                "active": pa.array(self.active.astype(np.int8), pa.int8()),
            }
        )
        tmp = os.path.join(d, f".part-{self.pid:05d}.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(d, f"part-{self.pid:05d}.parquet"))
        return self.pid

    def load_checkpoint(self, ckpt_dir: str, superstep: int) -> int:
        f = os.path.join(ckpt_dir, f"superstep={superstep:05d}", f"part-{self.pid:05d}.parquet")
        t = pq.read_table(f)
        vids = t["vid"].to_numpy(zero_copy_only=False)
        assert np.array_equal(vids, self.owned_vids), "checkpoint/partition mismatch"
        self.vals = t["value"].to_numpy(zero_copy_only=False).astype(self.kernel.dtype, copy=True)
        self.active = t["active"].to_numpy(zero_copy_only=False).astype(bool)
        return self.pid


class GraphEngine:
    """Driver for the partition-actor fleet."""

    def __init__(self, build_dir: str, *, actor_cpus: float = 0.0):
        """``actor_cpus=0`` by default: partition actors are resident state
        holders that compute only during supersteps (when nothing else
        runs), and reserving CPUs for them would starve the Ray Data
        stages that read inputs / collect results on the same node —
        a fleet of P actors at num_cpus=1 deadlocks a P-CPU cluster the
        moment a Dataset job needs a task slot. On a dedicated multi-node
        deployment set actor_cpus to pin real capacity per partition."""
        with open(os.path.join(build_dir, "meta.json")) as fh:
            self.meta = json.load(fh)
        self.build_dir = build_dir
        self.P = int(self.meta["P"])
        self.actors = [
            GraphPartition.options(num_cpus=actor_cpus).remote(p, build_dir, self.meta)
            for p in range(self.P)
        ]
        self.has_hubs = bool(self.meta.get("hub_vids"))

    # ------------------------------------------------------------------
    @staticmethod
    def _combine_hub_snaps(snaps):
        snaps = [s for s in snaps if s]
        if not snaps:
            return None
        vids = np.concatenate([s[0] for s in snaps])
        vals = np.concatenate([s[1] for s in snaps])
        act = np.concatenate([s[2] for s in snaps])
        o = np.argsort(vids)
        return ray.put((vids[o], vals[o], act[o]))

    def run(
        self,
        kernel: Kernel,
        *,
        tol: float = 1e-6,
        max_iters: int = 10_000,
        n_iters: int | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 0,
        resume: bool = False,
    ) -> dict:
        """Run ``kernel`` to convergence (or ``n_iters``). Returns a dict:
        {dataset, iterations, metrics, n_vertices, n_edges}."""
        ctx = {"n_vertices": self.meta["n_vertices"], "n_edges": self.meta["n_edges"]}
        ray.get([a.init_kernel.remote(kernel, ctx) for a in self.actors])

        start_iter = 0
        metrics: list[dict] = []
        if resume and checkpoint_dir:
            latest = _latest_checkpoint(checkpoint_dir)
            if latest is not None:
                ray.get([a.load_checkpoint.remote(checkpoint_dir, latest) for a in self.actors])
                with open(os.path.join(checkpoint_dir, "lineage.json")) as fh:
                    lineage = json.load(fh)
                start_iter = latest
                metrics = lineage.get("metrics", [])[:latest]

        if kernel.fixed_iters is not None:
            n_iters = kernel.fixed_iters
        limit = n_iters if n_iters is not None else max_iters

        it = start_iter
        hub_snaps = (
            ray.get([a.hub_snapshot.remote() for a in self.actors]) if self.has_hubs else []
        )
        while it < limit:
            t0 = time.perf_counter()
            hub_ref = self._combine_hub_snaps(hub_snaps) if self.has_hubs else None
            buckets = ray.get([a.scatter.remote(hub_ref) for a in self.actors])
            results = ray.get(
                [
                    self.actors[q].apply.remote([buckets[p][q] for p in range(self.P)])
                    for q in range(self.P)
                ]
            )
            delta = max(r[0] for r in results)
            changed = sum(r[1] for r in results)
            n_msgs = sum(r[2] for r in results)
            hub_snaps = [r[3] for r in results]
            it += 1
            metrics.append(
                {
                    "superstep": it,
                    "wall_sec": round(time.perf_counter() - t0, 6),
                    "messages": n_msgs,
                    "changed": changed,
                    "delta": delta if delta != float("inf") else None,
                    "edges": self.meta["n_edges"],
                }
            )
            if checkpoint_dir and checkpoint_every and it % checkpoint_every == 0:
                self._checkpoint(checkpoint_dir, it, kernel, metrics)
            if kernel.frontier and changed == 0:
                break
            if n_iters is None and not kernel.frontier and delta < tol:
                break

        refs = [a.collect.remote(kernel.name) for a in self.actors]
        ds = ray.data.from_arrow_refs(refs)
        return {
            "dataset": ds,
            "iterations": it,
            "metrics": metrics,
            "n_vertices": self.meta["n_vertices"],
            "n_edges": self.meta["n_edges"],
        }

    def _checkpoint(self, ckpt_dir: str, superstep: int, kernel: Kernel, metrics: list):
        ray.get([a.save_checkpoint.remote(ckpt_dir, superstep) for a in self.actors])
        lineage = {
            "superstep": superstep,
            "kernel": kernel.name,
            "input": {
                "build_dir": self.build_dir,
                "n_vertices": self.meta["n_vertices"],
                "n_edges": self.meta["n_edges"],
                "P": self.P,
                "hub_count": len(self.meta.get("hub_vids", [])),
            },
            "partition_map": {"owner": "vid % P", "hub_edges": "(src + dst) % P"},
            "metrics": metrics,
        }
        tmp = os.path.join(ckpt_dir, ".lineage.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(lineage, fh)
        os.replace(tmp, os.path.join(ckpt_dir, "lineage.json"))
        with open(os.path.join(ckpt_dir, f"superstep={superstep:05d}", "_SUCCESS"), "w") as fh:
            fh.write("ok")

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def _latest_checkpoint(ckpt_dir: str) -> int | None:
    done = []
    for d in glob.glob(os.path.join(ckpt_dir, "superstep=*")):
        if os.path.exists(os.path.join(d, "_SUCCESS")):
            done.append(int(os.path.basename(d).split("=")[1]))
    return max(done) if done else None
