"""Strongly connected components (SCC) by distributed min-label peeling.

The reference's component kernel is undirected WCC (wcc.c:211-216); SCC
extends the same min-semiring machinery to DIRECTED mutual reachability —
the web bowtie decomposition (giant SCC + IN/OUT tendrils) that
link-graph pipelines run right after WCC. Expressed over this repo's
existing primitives (no new engine machinery):

    repeat until no edges remain:
      trim   — iterated: a vertex with remaining in-degree 0 or
               out-degree 0 lies on no cycle, so its SCC is a singleton;
               drop it (cheap bucketed distinct + semi-join passes, no
               actor fleet). This peels the DAG tendrils.
      F      — min-label FORWARD propagation (WCCKernel on the directed
               build): F(v) = min vid with a path TO v (incl. itself).
      B      — the same on the REVERSED build: B(v) = min vid v reaches.
      assign — F(v) == B(v) == c  ⇔  c and v are mutually reachable, so
               {v : F(v) == B(v) == c} is EXACTLY SCC(c): F and B are
               constant across an SCC (everything reaching one member
               reaches all), and c is the component's min vid. Assign
               those rows, then filter the edge set to the survivors
               (two bucketed semi-joins, as kcore.py).

Every round assigns at least the SCC containing the smallest surviving
vid (its F and B are both that vid), so rounds <= #SCCs; on web-shaped
graphs trim + one or two F/B rounds finish. Adversarial chains degrade
to O(V) trim passes — the known FW-BW-family worst case, documented.

Scale shape: propagation state lives in partition actors (per-round
throwaway builds, layout cache off); the shrinking edge set and the
label tables ride bucketed co-groups; the driver sees only counts.
Vertices never claimed by an F==B round (trimmed or isolated) are
singleton SCCs and are resolved by ONE final anti-join against the
original vertex set.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa

import ray.data

from everythinggraph_ray.graph.build import build_graph
from everythinggraph_ray.graph.engine import GraphEngine
from everythinggraph_ray.graph.kernels import WCCKernel
from everythinggraph_ray.stages.agg import settle
from everythinggraph_ray.stages.edges import (
    dedup_edges,
    filter_self_loops,
    out_degrees,
    reverse_edges,
)


def _distinct_vids(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Distinct values of one int64 column as (vid): per-batch unique
    (the combiner) -> one bucketed global unique per hash bucket."""
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    local = ds.map_batches(
        lambda t: pa.table({"vid": pa.array(np.unique(t[col].to_numpy(zero_copy_only=False)), pa.int64())}),
        batch_format="pyarrow",
        batch_size=256 * 1024,
    )
    return bucketed_reduce(
        local,
        lambda t: mix64(t["vid"].to_numpy(zero_copy_only=False)),
        lambda g: pa.table({"vid": pa.array(np.unique(g["vid"].to_numpy(zero_copy_only=False)), pa.int64())}),
    )


def _filter_edges_to(
    edges: ray.data.Dataset, vids: ray.data.Dataset
) -> ray.data.Dataset:
    """Edges with BOTH endpoints in ``vids`` (two bucketed semi-joins),
    materialized — the loop-carried state of the peel. Empty ``vids``
    short-circuits to an empty edge table (hash_join needs a non-empty
    right side to infer its schema)."""
    from everythinggraph_ray.datapipe.joins import hash_join

    if vids.count() == 0:
        return ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
    return settle(
        hash_join(
            hash_join(edges, vids, on="src", right_on="vid", how="semi"),
            vids,
            on="dst",
            right_on="vid",
            how="semi",
        )
    )


def _minlabel(edges: ray.data.Dataset, label_col: str, num_partitions: int) -> ray.data.Dataset:
    """Directed min-label propagation to fixpoint: (vid, label) where
    label = min vid with a directed path to vid (including itself).
    Runs WCCKernel on a throwaway directed build; the result is copied
    out of the fleet's plasma (map_batches -> materialize) BEFORE the
    actors die."""
    root = tempfile.mkdtemp(prefix="egray_scc_")
    bdir = os.path.join(root, "g")
    try:
        build_graph(edges, bdir, num_partitions=num_partitions)
        eng = GraphEngine(bdir, layout_cache=False)
        try:
            res = eng.run(WCCKernel())
            return (
                res["dataset"]
                .map_batches(
                    lambda t: t.rename_columns(["vid", label_col]), batch_format="pyarrow"
                )
                .materialize()
            )
        finally:
            eng.shutdown()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def scc(
    edges: ray.data.Dataset,
    *,
    num_partitions: int = 8,
    max_rounds: int = 64,
) -> tuple[ray.data.Dataset, int]:
    """SCC of the directed (src, dst) edge Dataset. Returns
    ``(components, rounds)``: one row per vertex (any endpoint of any
    edge, self-loops included) with ``scc`` = the component's min vid;
    ``rounds`` counts the F/B peel rounds executed."""
    from everythinggraph_ray.datapipe.joins import hash_join

    edges = edges.select_columns(["src", "dst"])
    verts_all = out_degrees(edges).select_columns(["vid"]).materialize()
    # self-loops / duplicates never change mutual reachability
    cur = dedup_edges(filter_self_loops(edges)).materialize()

    assigned: list[ray.data.Dataset] = []
    rounds = 0
    while cur.count() > 0:
        # ---- iterated trim: keep only vertices with BOTH in- and
        # out-edges (everything else is a singleton SCC, resolved by the
        # final anti-join) --------------------------------------------
        while True:
            n_e = cur.count()
            if n_e == 0:
                break
            core = settle(
                hash_join(
                    _distinct_vids(cur, "src"),
                    _distinct_vids(cur, "dst"),
                    on="vid",
                    how="semi",
                )
            )
            cur = _filter_edges_to(cur, core)
            if cur.count() == n_e:
                break
        if cur.count() == 0:
            break

        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"scc did not converge in {max_rounds} F/B rounds")

        f = _minlabel(cur, "f", num_partitions)
        b = _minlabel(reverse_edges(cur), "b", num_partitions)
        fb = settle(hash_join(f, b, on="vid", right_cols=["b"]))

        def split(batch: pa.Table, *, want_done: bool) -> pa.Table:
            fv = batch["f"].to_numpy(zero_copy_only=False)
            bv = batch["b"].to_numpy(zero_copy_only=False)
            mask = pa.array(fv == bv if want_done else fv != bv, pa.bool_())
            t = batch.filter(mask)
            if want_done:
                return pa.table({"vid": t["vid"], "scc": t["f"]})
            return t.select(["vid"])

        assigned.append(
            settle(fb.map_batches(lambda t: split(t, want_done=True), batch_format="pyarrow"))
        )
        survivors = settle(
            fb.map_batches(lambda t: split(t, want_done=False), batch_format="pyarrow")
        )
        cur = _filter_edges_to(cur, survivors)

    # everything never claimed by an F==B round is a singleton SCC
    assigned = [a for a in assigned if a.count() > 0]
    claimed = assigned[0].union(*assigned[1:]) if len(assigned) > 1 else (
        assigned[0] if assigned else None
    )
    if claimed is None:
        singles = verts_all
    else:
        singles = hash_join(verts_all, claimed, on="vid", how="anti")
    singles = singles.map_batches(
        lambda t: pa.table({"vid": t["vid"], "scc": t["vid"]}), batch_format="pyarrow"
    )
    out = singles if claimed is None else claimed.union(singles)
    return out, rounds


def scc_serial(src, dst) -> dict[int, int]:
    """Serial oracle (tests): iterative Tarjan, scc id = min vid of the
    component. Handles every endpoint (self-loops included)."""
    adj: dict[int, list[int]] = {}
    verts = set()
    for a, b in zip(np.asarray(src).tolist(), np.asarray(dst).tolist()):
        a, b = int(a), int(b)
        verts.add(a)
        verts.add(b)
        if a != b:
            adj.setdefault(a, []).append(b)

    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    result: dict[int, int] = {}
    counter = [0]

    for start in sorted(verts):
        if start in index:
            continue
        # iterative Tarjan (explicit work stack: (v, child-iterator))
        work = [(start, iter(adj.get(start, ())))]
        index[start] = low[start] = counter[0]
        counter[0] += 1
        stack.append(start)
        on_stack.add(start)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                cid = min(comp)
                for w in comp:
                    result[w] = cid
    return result
