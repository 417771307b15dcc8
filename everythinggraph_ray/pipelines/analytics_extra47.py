"""Analytics batch (session 12, thirty-first wave): edge-disjoint path
packing.

Distributed shape:
- ``rel_path_packing``: greedy EDGE-DISJOINT s→t path packing (s = min
  vid, t = the farthest vertex reachable from s in round 1 — tie to
  the larger vid — up to 6 rounds) — the flow-family primitive: each
  round runs the engine's parent-tracking hop SSSP (deterministic
  min-parent shortest path), extracts the s→t path on the driver
  (path-length walk over the parent map), and removes its edges with
  one distributed filter before the next round. The packed path count
  LOWER-BOUNDS the s-t max-flow / edge connectivity (Menger); it is
  NOT exact max-flow — that needs residual back-arcs, and greedy
  shortest-path packing without them can under-pack (documented;
  pytest includes a case where greedy is nonetheless exact). Output
  (path_no, hops, edges_removed) per packed path. Rows-only (the
  iterative peeling has no SQL form); serial replay + disjointness +
  Menger-bound pytests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

ANALYTICS47_QUERIES: dict = {}
ANALYTICS47_ORACLES: dict = {}

PACK_ROUNDS = 6
UNREACHED32 = (np.iinfo(np.int64).max >> 32)  # dist field of UNREACHED


def q_rel_path_packing(sf_dir):
    """(path_no, hops, edges_removed): greedy shortest-path packing
    from the min vid to its farthest reachable vertex on the deduped
    simple digraph."""
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import ParentSSSPHopsKernel
    from everythinggraph_ray.pipelines.flagship import build_dir_for
    from everythinggraph_ray.pipelines.queries import (
        _run_engine,
        _typed_collect,
        rel_edges,
    )
    from everythinggraph_ray.stages.agg import sever, sum_by_key_pair

    def distinct_tag(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.not_equal(t["src"], t["dst"]))
        return pa.table(
            {
                "src": keep["src"],
                "dst": keep["dst"],
                "one": pa.array(np.ones(keep.num_rows, np.int64)),
            }
        )

    edges = sever(
        sum_by_key_pair(
            rel_edges(sf_dir).map_batches(distinct_tag, batch_format="pyarrow"),
            "src",
            "dst",
            ["one"],
        ).map_batches(
            lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
            batch_format="pyarrow",
        )
    )

    # s, t from the universe in one pass
    def minmax(t: pa.Table) -> pa.Table:
        vs = np.r_[
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False),
        ]
        return pa.table(
            {
                "lo": pa.array([vs.min()], pa.int64()),
                "hi": pa.array([vs.max()], pa.int64()),
            }
        )

    mm = edges.map_batches(minmax, batch_format="pyarrow").to_pandas()
    s = int(mm["lo"].min())
    t_vid = None  # picked from round 1: farthest reachable (tie: max vid)

    rows = []
    for path_no in range(1, PACK_ROUNDS + 1):
        bdir = build_dir_for(f"pack|{sf_dir}|{path_no}", 8)
        build_graph(edges, bdir, num_partitions=8, hub_threshold=10**9)
        df = _run_engine(bdir, ParentSSSPHopsKernel(s))
        dist, par = ParentSSSPHopsKernel.decode(df["sssp_parent"].to_numpy())
        vids = df["vid"].to_numpy(np.int64)
        reached = dist < UNREACHED32
        if t_vid is None:
            cand = reached & (vids != s)
            if not cand.any():
                break
            order = np.lexsort((-vids, -np.where(cand, dist, -1)))
            t_vid = int(vids[order[0]])
        at = np.searchsorted(vids, t_vid)
        if at >= len(vids) or vids[at] != t_vid or not reached[at]:
            break
        parent = dict(zip(vids.tolist(), par.astype(np.int64).tolist()))
        path = [t_vid]
        while path[-1] != s:
            path.append(int(parent[path[-1]]))
        path.reverse()
        packed = np.array(
            [(a << 32) | b for a, b in zip(path[:-1], path[1:])], np.int64
        )
        hops = len(packed)
        pe_ref = ray.put(packed)

        def drop_path(t: pa.Table) -> pa.Table:
            pe = ray.get(pe_ref)
            a = t["src"].to_numpy(zero_copy_only=False)
            b = t["dst"].to_numpy(zero_copy_only=False)
            keep = ~np.isin((a << 32) | b, pe)
            return t.filter(pa.array(keep))

        edges = sever(edges.map_batches(drop_path, batch_format="pyarrow"))
        rows.append((path_no, hops, hops))
    out = pd.DataFrame(rows, columns=["path_no", "hops", "edges_removed"]).astype(
        "int64"
    )
    return _typed_collect(
        ray.data.from_pandas(out)
        if len(out)
        else ray.data.from_pandas(
            pd.DataFrame(
                {c: pd.array([], dtype="int64") for c in ["path_no", "hops", "edges_removed"]}
            )
        ),
        {"path_no": "int64", "hops": "int64", "edges_removed": "int64"},
    )


ANALYTICS47_QUERIES["rel_path_packing"] = q_rel_path_packing
# rows-only: iterative peeling has no SQL form; serial replay,
# disjointness and Menger-bound pytests.
