"""Pull-mode PageRank: per-partition CSC gather — the cross-variant that
completes the reference's push-vs-pull methodology (pagerank_simple.c:72-84
``pagerank_pull``; NUMA pull pr_numa.c:245-354).

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

import json
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

    def __init__(self, pid: int, build_dir: str, meta: dict):
        self.pid = pid
        self.P = int(meta["P"])

        vt = _read_part_dir(os.path.join(build_dir, "verts", f"p={pid:05d}"))
        if vt is None:
            ov = np.empty(0, np.int64)
            od = np.empty(0, np.int64)
        else:
            ov = vt["vid"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            od = vt["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        o = np.argsort(ov)
        self.owned_vids, self.owned_outdeg = ov[o], od[o]

        et = _read_part_dir(os.path.join(build_dir, "edges", f"p={pid:05d}"))
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
) -> dict:
    """Run pull-mode PageRank over a ``partition_edges_by='dst'`` build.
    Same update rule and init (prev=0.15, pagerank_simple.c:51-55) as the
    push engine — values agree to float64 associativity (~1e-14)."""
    with open(os.path.join(build_dir, "meta.json")) as fh:
        meta = json.load(fh)
    assert meta.get("partition_edges_by") == "dst", (
        "pull engine needs a dst-partitioned build (partition_edges_by='dst')"
    )
    P = int(meta["P"])
    actors = [PullPartition.remote(p, build_dir, meta) for p in range(P)]
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
