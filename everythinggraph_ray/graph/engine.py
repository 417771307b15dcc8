"""Superstep engine: partition actors + BSP driver + checkpoint/lineage.

This is the one place the Dataset API genuinely can't express the
semantics — per-partition CSR blocks and vertex-state arrays that persist
across supersteps (the reference's global ``nodes[] + edge_array_out``,
random.h:82-93, rebuilt here as per-partition numpy buffers inside Ray
actors, SURVEY.md §2.c C1/C2). Everything around it (extract, dedup,
degree, partition spill, result collection) is Ray Data.

Execution model — ONE fused RPC round per superstep:

    step(prev_refs):
        apply   — fetch my slice of every sender's packed messages from
                  the previous round (zero-copy plasma), final-combine,
                  kernel.apply  (superstep i)
        scatter — partial-aggregate my partition's fresh messages by dst,
                  pack receiver-contiguously, return ONE object
                  (superstep i+1)

The returned object carries (dst_ids, values, offsets, hub_snapshot,
stats); the driver reads only stats (zero-copy) and hands the refs to the
next round. The ray.get barrier between rounds IS the BSP barrier. The
partial-aggregate + final-combine pair replaces the reference's atomic
``write_add``/``writeMin`` scatter (pagerank_simple.c:31-36, wcc.c:21-27).

Skew (power-law hubs): a src whose out-degree exceeds the build's
hub_threshold is NOT scattered by its owner. Its edges are partitioned by
``dst % P`` and applied RECEIVER-side: each partition holds a static
hub-edge CSC block over its owned dsts (the distributed analogue of the
reference's per-socket NUMA mirrors, pr_numa.c:136-196), and the hub
VALUES (8 bytes each) ride along in every scatter output — post-apply of
the same superstep as regular messages, so semantics are exact. No
broadcast round, no mirror imbalance: a 10^8-degree hub costs each
partition deg/P edge-applies and one float of traffic.

Partitioning assumptions (documented per SURVEY.md §2): vertex v's state
lives at partition ``v % P``; non-hub out-edges at ``src % P``; hub
out-edges at ``dst % P``.

Checkpoint/resume (north rule): every ``checkpoint_every`` supersteps each
actor writes its owned state ``(vid, value, active)`` to
``ckpt/superstep=K/part-PID.parquet``; the driver then writes
``lineage.json`` (superstep, input fingerprint, partition map, per-step
metrics) and a ``_SUCCESS`` marker. ``run(..., resume=True)`` loads the
latest complete snapshot and continues mid-iteration.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from everythinggraph_ray.graph.kernels import Kernel
from everythinggraph_ray.state.fs import (
    fs_is_dir,
    fs_listdir,
    fs_mkdirs,
    read_json,
    resolve_fs,
    write_json,
    write_text,
)


# combine semirings the scatter/apply machinery supports: the reference's
# atomic write_add / writeMin (pagerank_simple.c:31-36, wcc.c:21-27) plus
# bitwise OR for bit-parallel frontier kernels (MS-BFS masks — idempotent
# and monotone like min, so resend-safe kernels may use it) and max for
# the widest-path (max–min) semiring
_COMBINE_UFUNC = {
    "sum": np.add,
    "min": np.minimum,
    "max": np.maximum,
    "or": np.bitwise_or,
    "and": np.bitwise_and,  # meet of bitsets: dataflow kernels (dominators)
}


def _combine_identity(combine: str, dtype) -> float | int:
    if combine == "min":
        return np.inf if dtype == np.float64 else np.iinfo(np.int64).max
    if combine == "max":
        return -np.inf if dtype == np.float64 else np.iinfo(np.int64).min
    if combine == "and":
        return -1  # all 64 bits set: the full set is AND's identity
    return 0  # sum / or


def _read_part_dir(path: str, filesystem=None) -> pa.Table | None:
    """Read one partition dir through its manifest (build.py publishes one
    listing only successful-attempt chunk files; orphans from retried
    spill tasks are excluded). ``filesystem``: optional pyarrow fs for
    builds on shared storage (s3://, ...); default local."""
    from everythinggraph_ray.graph.build import list_partition_files

    fs = resolve_fs(filesystem)
    files = list_partition_files(path, filesystem=filesystem) if fs_is_dir(fs, path) else []
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f, filesystem=fs) for f in files])


# every derived array a GraphPartition pins; pure functions of the
# immutable build layout, so they are cacheable per (build, partition)
_LAYOUT_ATTRS = (
    "owned_vids", "owned_outdeg", "usrc", "out_counts", "dst_by_src",
    "not_self", "src_owned_idx", "src_outdeg", "red_starts", "uniq_dst",
    "src_idx_dst_sorted", "pack_perm", "pack_offsets", "uniq_packed",
    "hub_src_idx", "hub_not_self", "hub_red_starts", "hub_dst_pos",
    "hub_dst_all_pos", "owned_hub_pos", "owned_hub_global_idx",
)
_LAYOUT_OPTIONAL = (
    "w_by_src", "hub_w", "owned_woutdeg", "src_woutdeg",
)  # None when unweighted
_LAYOUT_CACHE_VERSION = "2"  # v2: weighted out-degree arrays


@ray.remote
class GraphPartition:
    """One graph partition: pinned CSR/CSC blocks + owned vertex state.

    The derived layout (sorted CSR/CSC index arrays, packing
    permutations) is a pure function of the immutable published build, so
    after the first spawn it is cached as one npz per partition inside
    the build dir (``layout_cache=True``): a build-once-run-many workload
    (resume, repeated kernels, benchmarks) pays the radix sorts once, and
    every later fleet spawn mostly just reads buffers back. The cache is
    keyed on the partition manifests + layout params and falls back to a
    full recompute on any mismatch or read error."""

    def __init__(
        self,
        pid: int,
        build_dir: str,
        meta: dict,
        cpu_limit: int | None = None,
        filesystem=None,
        layout_cache: bool = True,
        sort_kind: str = "stable",
    ):
        if cpu_limit:
            # honest parallelism-level emulation on a shared box: pin this
            # actor to ONE of the first cpu_limit cores (the reference pins
            # its workers the same way, init_all.c:792-800) — single-core
            # pinning keeps each partition's CSR hot in that core's cache
            # and avoids migration churn in the BSP barrier tail. Without
            # pinning, num_cpus=0 actors would silently use every physical
            # core and the N-vs-4N scaling evidence would measure nothing.
            os.sched_setaffinity(0, {pid % int(cpu_limit)})
        self.pid = pid
        self.P = int(meta["P"])
        # two-level grid exchange (build.py dst_blocks): receivers group
        # into B blocks (block of q = q % B); messages pack BLOCK-major so
        # each block's region is contiguous and ships as its own plasma
        # object. B=1 degenerates to the flat one-object exchange with the
        # identical pack order (pos == bucket).
        self.B = int(meta.get("dst_blocks", 1) or 1)
        self.meta = meta
        # layout construction strategy (the reference's init_adj_sort vs
        # init_adj_count comparison, init_all.c:444-790, re-expressed in
        # numpy terms): "stable" argsort = LSD radix on int64 keys (the
        # deterministic default — ties keep spill order), "quicksort" =
        # comparison introsort, measured ~1.6x FASTER on 32M power-law
        # int64 keys (BASELINE.md round 4) and equally deterministic for
        # a fixed on-disk build (no randomness; manifests fix read
        # order). The layout cache is keyed on the choice.
        self.sort_kind = sort_kind
        self.filesystem = filesystem  # picklable pyarrow fs (None = local)
        self.fs = resolve_fs(filesystem)

        hub_vids = np.asarray(meta.get("hub_vids", []), dtype=np.int64)  # sorted
        hub_outdeg = np.asarray(meta.get("hub_outdeg", []), dtype=np.int64)
        self.hub_vids = hub_vids
        self.hub_outdeg = hub_outdeg
        self.hub_woutdeg = np.asarray(meta.get("hub_woutdeg", []), dtype=np.float64)

        self._cache_path = os.path.join(
            build_dir, "edges", f"p={pid:05d}", f"layout-v{_LAYOUT_CACHE_VERSION}.npz"
        )
        self._cache_fp = self._layout_fingerprint(build_dir)
        if layout_cache and self._load_layout_cache():
            self.kernel = None
            self.vals = None
            self.active = None
            return

        # ---- owned vertices + out-degrees --------------------------------
        vt = _read_part_dir(os.path.join(build_dir, "verts", f"p={pid:05d}"), filesystem)
        if vt is None:
            self.owned_vids = np.empty(0, np.int64)
            self.owned_outdeg = np.empty(0, np.int64)
            self.owned_woutdeg = (
                np.empty(0, np.float64) if meta.get("weighted") else None
            )
        else:
            ov = vt["vid"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            od = vt["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            o = np.argsort(ov)
            self.owned_vids, self.owned_outdeg = ov[o], od[o]
            self.owned_woutdeg = (
                vt["woutdeg"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)[o]
                if "woutdeg" in vt.column_names
                else None
            )

        # ---- edges of this partition -------------------------------------
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
        # split: hub edges (applied receiver-side) vs regular (scattered)
        if len(hub_vids):
            hi = np.searchsorted(hub_vids, src)
            is_hub = (hi < len(hub_vids)) & (hub_vids[np.minimum(hi, len(hub_vids) - 1)] == src)
        else:
            is_hub = np.zeros(len(src), dtype=bool)
        h_src, h_dst = src[is_hub], dst[is_hub]
        h_w = w[is_hub] if w is not None else None
        src, dst = src[~is_hub], dst[~is_hub]
        if w is not None:
            w = w[~is_hub]
        self.n_edges = len(dst) + len(h_dst)

        # ---- regular out-edge CSR (grouped by src) -----------------------
        order = np.argsort(src, kind=self.sort_kind)
        src, dst = src[order], dst[order]
        if w is not None:
            w = w[order]
        self.usrc, self.out_counts = np.unique(src, return_counts=True)
        self.dst_by_src = dst
        self.w_by_src = w
        srcs_expanded = np.repeat(self.usrc, self.out_counts)
        self.not_self = srcs_expanded != dst

        # regular srcs must be owned here (non-hub partitioning invariant)
        oi = np.searchsorted(self.owned_vids, self.usrc)
        assert len(oi) == 0 or (
            (oi < len(self.owned_vids)).all() and (self.owned_vids[oi] == self.usrc).all()
        ), f"partition {pid}: non-hub src not owned — partitioning invariant broken"
        self.src_owned_idx = oi
        self.src_outdeg = (
            self.owned_outdeg[oi] if len(self.owned_vids) else np.empty(0, np.int64)
        )
        self.src_woutdeg = (
            self.owned_woutdeg[oi]
            if self.owned_woutdeg is not None and len(self.owned_vids)
            else (np.empty(0, np.float64) if self.owned_woutdeg is not None else None)
        )

        # dst-grouping precompute for the all-active fast path: edges in
        # dst-sorted order as int32 indices into the per-src message vector
        perm_dst = np.argsort(dst, kind=self.sort_kind)
        dst_sorted = dst[perm_dst]
        starts = (
            np.flatnonzero(np.r_[True, dst_sorted[1:] != dst_sorted[:-1]])
            if len(dst_sorted)
            else np.empty(0, np.int64)
        )
        self.red_starts = starts
        self.uniq_dst = dst_sorted[starts] if len(starts) else np.empty(0, np.int64)
        self.src_idx_dst_sorted = np.repeat(
            np.arange(len(self.usrc), dtype=np.int32), self.out_counts
        )[perm_dst]

        # static message packing: bucket-sorted, BLOCK-major (pos of
        # receiver q is (q % B) * (P // B) + q // B; for B=1 pos == q, the
        # historical flat order) — one contiguous region per receiver,
        # grouped contiguously by block
        bucket = (self.uniq_dst % self.P).astype(np.int64)
        pos = (bucket % self.B) * (self.P // self.B) + bucket // self.B
        self.pack_perm = np.argsort(pos, kind=self.sort_kind)
        self.pack_offsets = np.r_[0, np.cumsum(np.bincount(pos, minlength=self.P))]
        self.uniq_packed = self.uniq_dst[self.pack_perm]

        # ---- hub-edge CSC block (incoming, receiver-side gather) ---------
        # edges here satisfy dst % P == pid; grouped by dst for reduceat
        assert len(h_dst) == 0 or (h_dst % self.P == pid).all(), (
            f"partition {pid}: hub edge not owned by dst — partitioning broken"
        )
        ho = np.argsort(h_dst, kind=self.sort_kind)
        h_src, h_dst = h_src[ho], h_dst[ho]
        if h_w is not None:
            h_w = h_w[ho]
        self.hub_w = h_w
        self.hub_src_idx = np.searchsorted(hub_vids, h_src).astype(np.int32)
        self.hub_not_self = h_src != h_dst
        h_starts = (
            np.flatnonzero(np.r_[True, h_dst[1:] != h_dst[:-1]])
            if len(h_dst)
            else np.empty(0, np.int64)
        )
        self.hub_red_starts = h_starts
        self.hub_dst_pos = (
            np.searchsorted(self.owned_vids, h_dst[h_starts])
            if len(h_starts)
            else np.empty(0, np.int64)
        )
        self.hub_dst_all_pos = np.searchsorted(self.owned_vids, h_dst) if len(h_dst) else np.empty(0, np.int64)

        # hubs owned by this partition (their values ride in scatter output)
        if len(hub_vids) and len(self.owned_vids):
            own_h = np.searchsorted(self.owned_vids, hub_vids)
            mask = (own_h < len(self.owned_vids)) & (
                self.owned_vids[np.minimum(own_h, len(self.owned_vids) - 1)] == hub_vids
            )
            self.owned_hub_pos = own_h[mask]
            # static positions of this partition's hubs in the GLOBAL array
            self.owned_hub_global_idx = np.flatnonzero(mask)
        else:
            self.owned_hub_pos = np.empty(0, np.int64)
            self.owned_hub_global_idx = np.empty(0, np.int64)

        self.kernel: Kernel | None = None
        self.vals: np.ndarray | None = None
        self.active: np.ndarray | None = None
        if layout_cache:
            self._save_layout_cache()

    # ------------------------------------------------------------------
    def _layout_fingerprint(self, build_dir: str) -> str:
        """The cache key: this partition's manifest file lists + every
        layout parameter that shapes the derived arrays. Builds are
        immutable once _SUCCESS'd (build.py deletes marker-less dirs), so
        matching manifests imply identical parquet bytes."""
        from everythinggraph_ray.graph.build import list_partition_files

        parts = [
            f"v{_LAYOUT_CACHE_VERSION}",
            f"P={self.P}",
            f"hubs={len(self.hub_vids)}",
            f"th={self.meta.get('hub_threshold')}",
            f"w={self.meta.get('weighted')}",
            f"by={self.meta.get('partition_edges_by', 'src')}",
            f"dstb={self.B}",
            f"sk={self.sort_kind}",
        ]
        for sub in ("edges", "verts"):
            d = os.path.join(build_dir, sub, f"p={self.pid:05d}")
            files = list_partition_files(d, filesystem=self.filesystem) if fs_is_dir(self.fs, d) else []
            parts.append(sub + ":" + ",".join(os.path.basename(f) for f in files))
        return "|".join(parts)

    def _load_layout_cache(self) -> bool:
        import io

        from everythinggraph_ray.state.fs import fs_exists

        try:
            if not fs_exists(self.fs, self._cache_path):
                return False
            with self.fs.open_input_stream(self._cache_path) as inp:
                data = np.load(io.BytesIO(inp.read()), allow_pickle=False)
            if str(data["fingerprint"]) != self._cache_fp:
                return False
            for a in _LAYOUT_ATTRS:
                setattr(self, a, data[a])
            for a in _LAYOUT_OPTIONAL:
                setattr(self, a, data[a] if f"has_{a}" in data.files else None)
            self.n_edges = int(data["n_edges"])
            return True
        except Exception:
            return False  # any corruption -> recompute from the parquet

    def _save_layout_cache(self) -> None:
        import io

        try:
            arrays = {a: getattr(self, a) for a in _LAYOUT_ATTRS}
            for a in _LAYOUT_OPTIONAL:
                v = getattr(self, a)
                if v is not None:
                    arrays[a] = v
                    arrays[f"has_{a}"] = np.array(1)
            arrays["n_edges"] = np.array(self.n_edges, dtype=np.int64)
            arrays["fingerprint"] = np.array(self._cache_fp)
            buf = io.BytesIO()
            np.savez(buf, **arrays)
            with self.fs.open_output_stream(self._cache_path) as out:
                out.write(buf.getvalue())
        except Exception:
            pass  # best-effort: the cache is an optimization only

    # ------------------------------------------------------------------
    def set_cpu_limit(self, cpu_limit: int | None) -> int:
        """Re-pin this actor (interleaved A/B scaling measurement)."""
        if cpu_limit:
            os.sched_setaffinity(0, {self.pid % int(cpu_limit)})
        else:
            os.sched_setaffinity(0, set(range(os.cpu_count())))
        return self.pid

    def init_kernel(self, kernel: Kernel, ctx: dict) -> int:
        self.kernel = kernel
        # enrich with partition identity + the storage seam so kernels can
        # read per-partition side state (warm starts) without O(V) broadcasts
        self.ctx = dict(ctx, pid=self.pid, n_partitions=self.P, fs=self.fs)
        self.vals = kernel.init_values(self.owned_vids, self.owned_outdeg, self.ctx)
        self.active = kernel.init_active(self.owned_vids, self.ctx)
        return int(self.active.sum())

    def _hub_snapshot(self):
        """(global_idx, values, active) of hubs owned by this partition."""
        if not len(self.owned_hub_pos):
            return None
        return (
            self.owned_hub_global_idx,
            self.vals[self.owned_hub_pos],
            self.active[self.owned_hub_pos],
        )

    # ------------------------------------------------------------------
    def _scatter(self):
        """Partial-aggregate this partition's regular out-edge messages by
        dst; return (dst_ids, values, offsets) packed receiver-contiguously
        (receiver q's slice is offsets[q]:offsets[q+1])."""
        k = self.kernel
        src_vals = self.vals[self.src_owned_idx]
        src_act = self.active[self.src_owned_idx]
        if k.needs_weighted_outdeg:
            if self.src_woutdeg is None:
                raise ValueError(
                    f"kernel '{k.name}' needs a weighted build "
                    "(build_graph(..., weighted=True))"
                )
            msgs = k.src_messages_w(src_vals, self.src_outdeg, self.src_woutdeg)
        else:
            msgs = k.src_messages2(src_vals, self.src_outdeg, self.usrc)

        # direction adaptivity (the reference's push<->pull switch,
        # bfs_simple.c:191): min-semiring kernels may harmlessly RE-SEND
        # current values, so once the frontier is large we use the dense
        # precomputed scatter instead of masking edge-by-edge
        send_from = src_act
        n_src = max(1, len(src_act))
        if k.frontier and k.resend_safe and src_act.sum() > 0.05 * n_src:
            m = k.send_mask(src_vals)
            send_from = (
                np.ones(len(src_act), dtype=bool) if m is None else (m | src_act)
            )
        all_active = (not k.frontier) or bool(send_from.all())
        uf = _COMBINE_UFUNC[k.combine]
        if all_active and not k.skip_self_loops and not k.needs_weights:
            v = msgs[self.src_idx_dst_sorted]
            agg = uf.reduceat(v, self.red_starts) if len(self.red_starts) else v[:0]
            return self._pack_out(self.uniq_packed, agg[self.pack_perm], self.pack_offsets)
        per_edge = np.repeat(msgs, self.out_counts)
        if k.needs_weights:
            per_edge = k.edge_values(per_edge, self.w_by_src)
        emask = np.repeat(send_from, self.out_counts)
        if k.skip_self_loops:
            emask = emask & self.not_self
        d = self.dst_by_src[emask]
        v = per_edge[emask]
        if len(d):
            o = np.argsort(d, kind="stable")
            d, v = d[o], v[o]
            st = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            uniq = d[st]
            agg = uf.reduceat(v, st)
        else:
            uniq = np.empty(0, np.int64)
            agg = v[:0]
        bucket = (uniq % self.P).astype(np.int64)
        pos = (bucket % self.B) * (self.P // self.B) + bucket // self.B
        order = np.argsort(pos, kind="stable")
        offsets = np.r_[0, np.cumsum(np.bincount(pos, minlength=self.P))]
        return self._pack_out(uniq[order], agg[order], offsets)

    def _pack_out(self, uniq, agg, offsets):
        """Flat exchange (B=1): ship the packed arrays in the step return
        itself. Blocked exchange (B>1): split the block-major pack into B
        plasma objects — each (uniq, agg, local offsets over the block's
        P//B receivers) — so a receiver fetches only its block's bytes
        from this sender. Return shape is (first, agg, offsets) with
        ``agg=None`` marking blocked mode for _apply."""
        if self.B == 1:
            return uniq, agg, offsets
        Pb = self.P // self.B
        refs = []
        for b in range(self.B):
            lo, hi = int(offsets[b * Pb]), int(offsets[(b + 1) * Pb])
            local = offsets[b * Pb : (b + 1) * Pb + 1] - offsets[b * Pb]
            refs.append(ray.put((uniq[lo:hi], agg[lo:hi], local)))
        return refs, None, None

    def _apply(self, outs):
        """Final-combine my slices of every sender's packed messages plus
        the receiver-side hub gather, then kernel.apply."""
        k = self.kernel
        n_hub = len(self.hub_vids)
        uf = _COMBINE_UFUNC[k.combine]
        agg_full = np.full(
            len(self.owned_vids), _combine_identity(k.combine, k.dtype), dtype=k.dtype
        )
        has_msg = np.zeros(len(self.owned_vids), dtype=bool)
        n_msgs = 0

        hub_vals = np.zeros(n_hub, dtype=k.dtype) if n_hub else None
        hub_act = np.zeros(n_hub, dtype=bool) if n_hub else None
        # normalize the exchange: flat mode slices each sender's whole
        # packed object by the global offsets; blocked mode (dst_blocks>1)
        # fetches only MY block's object from each sender — one batched
        # ray.get — and slices by the block-local offsets (my index within
        # the block is pid // B since block members are q ≡ pid (mod B))
        if outs and outs[0][1] is None:
            payloads = ray.get([o[0][self.pid % self.B] for o in outs])
            i = self.pid // self.B
            slices = [(u, a, int(off[i]), int(off[i + 1])) for u, a, off in payloads]
        else:
            slices = [
                (o[0], o[1], int(o[2][self.pid]), int(o[2][self.pid + 1])) for o in outs
            ]
        for (uniq, agg, lo, hi), out in zip(slices, outs):
            hub_snap = out[3]
            if hi > lo:
                dvid, dval = uniq[lo:hi], agg[lo:hi]
                pos = np.searchsorted(self.owned_vids, dvid)
                # dsts are unique within one sender's pre-aggregated slice,
                # so the fancy-indexed combine is exact (and vectorized)
                agg_full[pos] = uf(agg_full[pos], dval)
                has_msg[pos] = True
                n_msgs += hi - lo
            if hub_snap is not None:
                gidx, gvals, gact = hub_snap
                hub_vals[gidx] = gvals
                hub_act[gidx] = gact

        # receiver-side hub gather (the NUMA-mirror analogue)
        if n_hub and len(self.hub_src_idx):
            if k.needs_weighted_outdeg:
                hub_msgs = k.src_messages_w(hub_vals, self.hub_outdeg, self.hub_woutdeg)
            else:
                hub_msgs = k.src_messages2(hub_vals, self.hub_outdeg, self.hub_vids)
            if (not k.frontier or bool(hub_act.all())) and not k.skip_self_loops and not k.needs_weights:
                v = hub_msgs[self.hub_src_idx]
                h_agg = uf.reduceat(v, self.hub_red_starts)
                # hub_dst_pos entries are unique (one per distinct dst)
                agg_full[self.hub_dst_pos] = uf(agg_full[self.hub_dst_pos], h_agg)
                has_msg[self.hub_dst_pos] = True
                n_msgs += len(self.hub_src_idx)
            else:
                per_edge = hub_msgs[self.hub_src_idx]
                if k.needs_weights:
                    per_edge = k.edge_values(per_edge, self.hub_w)
                emask = hub_act[self.hub_src_idx]
                if k.skip_self_loops:
                    emask = emask & self.hub_not_self
                if emask.any():
                    pos = self.hub_dst_all_pos[emask]
                    v = per_edge[emask]
                    uf.at(agg_full, pos, v)  # pos has duplicates: ufunc.at
                    has_msg[pos] = True
                    n_msgs += int(emask.sum())

        old = self.vals
        new, changed, delta = k.apply(old, agg_full, has_msg, self.ctx)
        self.vals = new
        self.active = changed if k.frontier else np.ones(len(self.owned_vids), dtype=bool)
        # optional per-superstep kernel aggregate (e.g. MS-BFS per-source
        # newly-reached counts) — a SMALL fixed-size vector per partition,
        # summed by the driver into the superstep's metrics entry
        extra = k.extra_stats(old, new, changed, self.ctx) if k.has_extra_stats else None
        # Pregel-style aggregator: the partition's POST-apply contribution
        # to the next superstep's global scalar (e.g. dangling rank mass);
        # the driver sums the P floats and broadcasts the total back into
        # the next round's ctx["global_in"]
        gp = self.global_partial_now() if k.needs_global else None
        return float(delta), int(changed.sum()), int(n_msgs), extra, gp

    # ------------------------------------------------------------------
    def global_partial_now(self) -> float:
        """This partition's aggregator contribution from CURRENT values
        (post-init or post-resume seed for the first apply)."""
        k = self.kernel
        if not k.needs_global:
            return 0.0
        return float(k.global_partial(self.vals, self.owned_outdeg, self.ctx))

    def step(self, prev_refs=None, global_in=None):
        """One fused round: apply superstep i's messages (prev_refs from
        round i), then scatter superstep i+1's. Returns the packed scatter
        plus this partition's hub snapshot and apply stats. ``global_in``
        is the driver-reduced aggregator total for THIS round's apply."""
        stats = None
        if prev_refs is not None:
            if global_in is not None:
                self.ctx["global_in"] = float(global_in)
            stats = self._apply(ray.get(list(prev_refs)))
        uniq, agg, off = self._scatter()
        return uniq, agg, off, self._hub_snapshot(), stats

    def apply_only(self, prev_refs, global_in=None):
        """Final round: apply without producing further messages."""
        if global_in is not None:
            self.ctx["global_in"] = float(global_in)
        return self._apply(ray.get(list(prev_refs)))

    # ------------------------------------------------------------------
    def collect(self, value_col: str = "value") -> pa.Table:
        return pa.table(
            {"vid": pa.array(self.owned_vids, pa.int64()), value_col: pa.array(self.vals)}
        )

    def save_state(self, state_dir: str) -> int:
        """Write this partition's final (vid, value) for warm starts —
        same layout as checkpoints but kernel-agnostic and meant to
        outlive the run (checkpoints are lineage-validated against ONE
        input; warm-start state is deliberately reusable on a CHANGED
        graph, see WarmStartPageRankKernel)."""
        fs_mkdirs(self.fs, state_dir)
        t = pa.table(
            {
                "vid": pa.array(self.owned_vids, pa.int64()),
                "value": pa.array(self.vals),
            }
        )
        pq.write_table(
            t, os.path.join(state_dir, f"part-{self.pid:05d}.parquet"), filesystem=self.fs
        )
        return self.pid

    def save_checkpoint(self, ckpt_dir: str, superstep: int) -> int:
        d = os.path.join(ckpt_dir, f"superstep={superstep:05d}")
        fs_mkdirs(self.fs, d)
        t = pa.table(
            {
                "vid": pa.array(self.owned_vids, pa.int64()),
                "value": pa.array(self.vals),
                "active": pa.array(self.active.astype(np.int8), pa.int8()),
            }
        )
        # direct write — validity is gated by the snapshot's _SUCCESS
        # marker the driver publishes only after ALL parts landed, so no
        # tmp-file + rename is needed (object-store-safe)
        pq.write_table(t, os.path.join(d, f"part-{self.pid:05d}.parquet"), filesystem=self.fs)
        return self.pid

    def load_checkpoint(self, ckpt_dir: str, superstep: int) -> int:
        f = os.path.join(ckpt_dir, f"superstep={superstep:05d}", f"part-{self.pid:05d}.parquet")
        t = pq.read_table(f, filesystem=self.fs)
        vids = t["vid"].to_numpy(zero_copy_only=False)
        assert np.array_equal(vids, self.owned_vids), "checkpoint/partition mismatch"
        self.vals = t["value"].to_numpy(zero_copy_only=False).astype(self.kernel.dtype, copy=True)
        self.active = t["active"].to_numpy(zero_copy_only=False).astype(bool)
        return self.pid


class GraphEngine:
    """Driver for the partition-actor fleet."""

    def __init__(
        self,
        build_dir: str,
        *,
        actor_cpus: float = 0.0,
        cpu_limit: int | None = None,
        filesystem=None,
        layout_cache: bool = True,
        sort_kind: str = "stable",
    ):
        """``actor_cpus=0`` by default: partition actors are resident state
        holders that compute only during supersteps (when nothing else
        runs), and reserving CPUs for them would starve the Ray Data
        stages that read inputs / collect results on the same node —
        a fleet of P actors at num_cpus=1 deadlocks a P-CPU cluster the
        moment a Dataset job needs a task slot. On a dedicated multi-node
        deployment set actor_cpus to pin real capacity per partition.
        ``cpu_limit`` pins every actor to the first N cores — the
        in-sandbox N-vs-4N parallelism emulation (see GraphPartition).
        ``filesystem``: optional pyarrow fs for builds/checkpoints on
        shared storage — handed to every partition actor (picklable).
        ``layout_cache``: cache each partition's derived CSR/CSC arrays
        as one npz inside the (immutable) build dir, so repeat fleet
        spawns skip the radix sorts (see GraphPartition)."""
        self._filesystem = filesystem
        self._fs = resolve_fs(filesystem)
        self._layout_cache = layout_cache
        self._sort_kind = sort_kind
        self.meta = read_json(self._fs, os.path.join(build_dir, "meta.json"))
        self.build_dir = build_dir
        self.P = int(self.meta["P"])
        self._actor_cpus = actor_cpus
        self._cpu_limit = cpu_limit
        self._spawn_actors()

    def _spawn_actors(self):
        self.actors = [
            GraphPartition.options(num_cpus=self._actor_cpus).remote(
                p, self.build_dir, self.meta, self._cpu_limit, self._filesystem,
                self._layout_cache, self._sort_kind,
            )
            for p in range(self.P)
        ]

    def _rebuild_actors(self):
        """Kill whatever survives and respawn the fleet (the partitioned
        build on disk is the source of truth for topology; values come
        from the latest checkpoint or a fresh init)."""
        for a in self.actors:
            try:
                ray.kill(a)
            except Exception:
                pass
        self._spawn_actors()

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
        max_recoveries: int = 2,
    ) -> dict:
        """Run ``kernel`` to convergence (or ``n_iters``), surviving up to
        ``max_recoveries`` partition-actor deaths: on ``RayActorError`` the
        fleet is respawned from the on-disk build and the run continues
        from the latest complete checkpoint (or restarts from superstep 0
        when no checkpoint_dir is set — still correct, just slower). The
        north rule's resume machinery doubles as mid-run fault tolerance.
        Returns {dataset, iterations, metrics, n_vertices, n_edges}."""
        attempt = 0
        while True:
            try:
                return self._run_once(
                    kernel,
                    tol=tol,
                    max_iters=max_iters,
                    n_iters=n_iters,
                    checkpoint_dir=checkpoint_dir,
                    checkpoint_every=checkpoint_every,
                    resume=resume or attempt > 0,
                )
            except ray.exceptions.RayActorError:
                if attempt >= max_recoveries:
                    raise
                attempt += 1
                self._rebuild_actors()

    def _run_once(
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
        ctx = {"n_vertices": self.meta["n_vertices"], "n_edges": self.meta["n_edges"]}
        ray.get([a.init_kernel.remote(kernel, ctx) for a in self.actors])

        start_iter = 0
        metrics: list[dict] = []
        if resume and checkpoint_dir:
            latest = _latest_checkpoint(checkpoint_dir, self._filesystem)
            if latest is not None:
                lineage = read_json(self._fs, os.path.join(checkpoint_dir, "lineage.json"))
                # the checkpoint is only valid for the SAME kernel on the
                # SAME built graph — a stale dir would otherwise silently
                # cast another kernel's values into this one's dtype
                if lineage.get("kernel") != kernel.name:
                    raise ValueError(
                        f"checkpoint at {checkpoint_dir} is for kernel "
                        f"{lineage.get('kernel')!r}, not {kernel.name!r}"
                    )
                # same kernel NAME is not enough: a BFS from another root /
                # PR with another damping would silently resume wrong values
                want_params = _kernel_fingerprint(kernel)
                have_params = lineage.get("kernel_params")
                if have_params is not None and have_params != want_params:
                    raise ValueError(
                        f"checkpoint at {checkpoint_dir} was written with "
                        f"kernel params {have_params}, current run has "
                        f"{want_params}"
                    )
                lin_in = lineage.get("input", {})
                for field in ("n_vertices", "n_edges", "P"):
                    want = self.meta[field] if field != "P" else self.P
                    if lin_in.get(field) != want:
                        raise ValueError(
                            f"checkpoint input mismatch on {field}: "
                            f"lineage={lin_in.get(field)} current={want}"
                        )
                ray.get([a.load_checkpoint.remote(checkpoint_dir, latest) for a in self.actors])
                start_iter = latest
                metrics = lineage.get("metrics", [])[:latest]

        if kernel.fixed_iters is not None:
            n_iters = kernel.fixed_iters
        limit = n_iters if n_iters is not None else max_iters

        if (
            n_iters is not None
            and not checkpoint_dir
            and start_iter == 0
            and limit > start_iter
            # extra-stats kernels need the stepwise loop: the pipelined
            # path only sees the FINAL round's stats
            and not kernel.has_extra_stats
            # aggregator kernels need the stepwise loop: the global total
            # must round-trip through the driver every superstep
            and not kernel.needs_global
        ):
            return self._run_pipelined(kernel, limit)

        # aggregator seed for the FIRST apply (post-init / post-resume
        # values; P floats → one total)
        gin = (
            sum(ray.get([a.global_partial_now.remote() for a in self.actors]))
            if kernel.needs_global
            else None
        )

        it = start_iter
        # round 0: scatter only (messages of superstep start_iter+1) —
        # skipped entirely when the resumed checkpoint already meets the
        # limit (a full discarded edge pass otherwise)
        t_round = time.perf_counter()
        refs = [a.step.remote(None) for a in self.actors] if it < limit else []
        while it < limit:
            # decide whether superstep it+1 is the last allowed — if so,
            # apply without scattering the (wasted) next round
            last = it + 1 >= limit
            # one ray.put of the ref list per round: the driver would
            # otherwise serialize P refs into each of P actor calls (P^2
            # ref serializations per superstep — measurable at P=32)
            prev = ray.put(refs)
            if last:
                results = ray.get([a.apply_only.remote(prev, gin) for a in self.actors])
                stats = results
            else:
                refs = [a.step.remote(prev, gin) for a in self.actors]
                outs = ray.get(refs)  # zero-copy: driver reads only stats
                stats = [o[4] for o in outs]
            delta = max(s[0] for s in stats)
            changed = sum(s[1] for s in stats)
            n_msgs = sum(s[2] for s in stats)
            extras = [s[3] for s in stats if s[3] is not None]
            if kernel.needs_global:
                gin = sum(s[4] for s in stats)
            it += 1
            entry = {
                "superstep": it,
                "wall_sec": round(time.perf_counter() - t_round, 6),
                "messages": n_msgs,
                "changed": changed,
                "delta": delta if delta != float("inf") else None,
                "edges": self.meta["n_edges"],
            }
            if extras:
                # elementwise sum across partitions; ints for JSON lineage
                entry["extra"] = [int(x) for x in np.sum(extras, axis=0)]
            metrics.append(entry)
            t_round = time.perf_counter()
            if checkpoint_dir and checkpoint_every and it % checkpoint_every == 0:
                self._checkpoint(checkpoint_dir, it, kernel, metrics)
            if kernel.frontier and changed == 0:
                break
            if n_iters is None and not kernel.frontier and delta < tol:
                break

        out_refs = [a.collect.remote(kernel.name) for a in self.actors]
        # resolve collection BEFORE returning: (a) the caller may
        # shutdown() the actors next, and a still-queued collect task would
        # die with them; (b) ray.get (unlike ray.wait) RAISES on an
        # actor-death error, which keeps the failure inside run()'s
        # max_recoveries retry loop. Zero-copy: the tables stay in plasma.
        ray.get(out_refs)
        ds = ray.data.from_arrow_refs(out_refs)
        return {
            "dataset": ds,
            "iterations": it,
            "metrics": metrics,
            "n_vertices": self.meta["n_vertices"],
            "n_edges": self.meta["n_edges"],
        }

    def _run_pipelined(self, kernel: Kernel, limit: int) -> dict:
        """Fixed-iteration fast path: submit every round up front — the BSP
        dependency is enforced inside each actor (its step ray.gets the
        previous round's refs), so driver dispatch latency overlaps with
        compute entirely. Values are bit-identical to the stepwise path
        (same ops, same order); only wall-clock attribution is coarser
        (total / supersteps)."""
        from collections import deque

        WINDOW = 3  # rounds in flight: bounds live message objects to
        # ~WINDOW x (message volume per superstep) — submit-ahead without a
        # window spilled the object store at 10^8-edge scale (measured 18x
        # slower); the window keeps dispatch hidden while memory stays flat
        t0 = time.perf_counter()
        refs = [a.step.remote(None) for a in self.actors]
        inflight: deque = deque([refs])
        for _ in range(limit - 1):
            if len(inflight) >= WINDOW:
                ray.wait(list(inflight.popleft()), num_returns=self.P)
            packed = ray.put(refs)  # one serialization of the P refs
            refs = [a.step.remote(packed) for a in self.actors]
            inflight.append(refs)
        final_stats = ray.get([a.apply_only.remote(ray.put(refs)) for a in self.actors])
        total = time.perf_counter() - t0
        delta = max(s[0] for s in final_stats)
        changed = sum(s[1] for s in final_stats)
        n_msgs = sum(s[2] for s in final_stats)
        per = total / limit
        metrics = [
            {
                "superstep": i + 1,
                "wall_sec": round(per, 6),
                "messages": n_msgs if i == limit - 1 else None,
                "changed": changed if i == limit - 1 else None,
                "delta": (delta if delta != float("inf") else None) if i == limit - 1 else None,
                "edges": self.meta["n_edges"],
                "pipelined": True,
            }
            for i in range(limit)
        ]
        out_refs = [a.collect.remote(kernel.name) for a in self.actors]
        ray.get(out_refs)  # resolve + surface errors before teardown (see run())
        return {
            "dataset": ray.data.from_arrow_refs(out_refs),
            "iterations": limit,
            "metrics": metrics,
            "n_vertices": self.meta["n_vertices"],
            "n_edges": self.meta["n_edges"],
        }

    def set_cpu_limit(self, cpu_limit: int | None):
        """Re-pin every partition actor to the first N cores (or all)."""
        ray.get([a.set_cpu_limit.remote(cpu_limit) for a in self.actors])

    def _checkpoint(self, ckpt_dir: str, superstep: int, kernel: Kernel, metrics: list):
        ray.get([a.save_checkpoint.remote(ckpt_dir, superstep) for a in self.actors])
        lineage = {
            "superstep": superstep,
            "kernel": kernel.name,
            "kernel_params": _kernel_fingerprint(kernel),
            "input": {
                "build_dir": self.build_dir,
                "n_vertices": self.meta["n_vertices"],
                "n_edges": self.meta["n_edges"],
                "P": self.P,
                "hub_count": len(self.meta.get("hub_vids", [])),
            },
            "partition_map": {
                "owner": "vid % P",
                "regular_edges": "src % P",
                "hub_edges": "dst % P (receiver-side gather)",
            },
            "metrics": metrics,
        }
        # lineage is one JSON put (atomic on object stores); the snapshot
        # _SUCCESS marker goes LAST — readers ignore marker-less snapshots
        write_json(self._fs, os.path.join(ckpt_dir, "lineage.json"), lineage)
        write_text(
            self._fs, os.path.join(ckpt_dir, f"superstep={superstep:05d}", "_SUCCESS"), "ok"
        )

    def save_state(self, state_dir: str):
        """Persist the fleet's final per-partition (vid, value) state for
        warm starts on a LATER (possibly grown) graph — see
        WarmStartPageRankKernel. All parts land in parallel, then
        meta.json + _SUCCESS publish validity (marker-less dirs are
        ignored by consumers, matching the checkpoint convention)."""
        fs_mkdirs(self._fs, state_dir)
        ray.get([a.save_state.remote(state_dir) for a in self.actors])
        write_json(
            self._fs,
            os.path.join(state_dir, "meta.json"),
            {"P": self.P, "n_vertices": self.meta["n_vertices"]},
        )
        write_text(self._fs, os.path.join(state_dir, "_SUCCESS"), "ok")

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def _kernel_fingerprint(kernel: Kernel) -> str:
    """Deterministic string of the kernel's constructor state (root,
    damping, seeds, ...) for lineage validation."""
    try:
        items = sorted(vars(kernel).items())
    except TypeError:
        items = []
    return json.dumps([[k, repr(v)] for k, v in items])


def _latest_checkpoint(ckpt_dir: str, filesystem=None) -> int | None:
    from everythinggraph_ray.state.fs import fs_exists

    fs = resolve_fs(filesystem)
    done = []
    for name in fs_listdir(fs, ckpt_dir):
        if name.startswith("superstep=") and fs_exists(
            fs, os.path.join(ckpt_dir, name, "_SUCCESS")
        ):
            done.append(int(name.split("=")[1]))
    return max(done) if done else None
