"""k-core decomposition by distributed peeling.

The k-core is the maximal subgraph in which every vertex has degree >= k
(on the simple undirected graph) — the classic web-graph quality /
spam-tail filter. The reference has no k-core binary; this extends its
kernel family (SURVEY.md §2.j extension surface) with the standard
iterative peel, expressed Ray-Data-first:

    repeat:
        deg   = per-vertex degree of the surviving edge set
                (per-batch partial counts -> one bucketed sum, the
                init_all.c:425-443 degree-pass analogue)
        keep  = vertices with deg >= k
        edges = edges with BOTH endpoints in keep
                (two bucketed semi-joins — datapipe/joins.py hash_join,
                the same one-shuffle co-group as every other wide op)
    until the surviving vertex count stops changing.

Scale shape: the edge set shrinks monotonically; each round's survivors
are materialized because they are the loop-carried state (re-executing
the lazy lineage would recompute every earlier round per iteration —
the iterative-dataset analogue of a superstep checkpoint). The driver
holds only per-round COUNTS; peel rounds on power-law graphs converge
in O(10) rounds for fixed k.

Input contract: a directed (src, dst) edge Dataset; duplicates and
self-loops are normalized away here (degree counts DISTINCT neighbors).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from everythinggraph_ray.stages.edges import (
    dedup_edges,
    filter_self_loops,
    out_degrees,
    undirect_edges,
)


def kcore(
    edges: ray.data.Dataset, k: int, *, max_rounds: int = 100
) -> tuple[ray.data.Dataset, int]:
    """Peel to the k-core. Returns ``(core, rounds)`` where ``core`` has
    one row per surviving vertex: (vid, deg) with deg its degree INSIDE
    the k-core (all >= k), and ``rounds`` is the number of peel rounds
    executed (including the final no-change round that proves the
    fixpoint)."""
    if k < 1:
        raise ValueError("kcore requires k >= 1")
    from everythinggraph_ray.datapipe.joins import hash_join

    # simple undirected graph: both directions present, so out-degree of
    # `und` IS the vertex degree
    und = dedup_edges(undirect_edges(filter_self_loops(edges))).materialize()
    n_prev = -1
    keep = None
    for r in range(1, max_rounds + 1):
        keep = (
            out_degrees(und)
            .map_batches(
                lambda t: t.filter(pc.greater_equal(t["outdeg"], k)),
                batch_format="pyarrow",
            )
            .materialize()
        )
        n = keep.count()
        if n == n_prev or n == 0:
            break
        n_prev = n
        und = hash_join(
            hash_join(und, keep, on="src", right_on="vid", how="semi"),
            keep,
            on="dst",
            right_on="vid",
            how="semi",
        ).materialize()
    else:
        raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")
    if keep.count() == 0:  # keep a stable (vid, deg) schema when empty
        empty = pa.table({"vid": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())})
        return ray.data.from_arrow(empty), r
    return (
        keep.map_batches(
            lambda t: t.select(["vid", "outdeg"]).rename_columns(["vid", "deg"]),
            batch_format="pyarrow",
        ),
        r,
    )


def kcore_serial(src, dst, k: int):
    """Serial numpy oracle (tests): peel on the simple undirected graph.
    Returns dict vid -> in-core degree."""
    import numpy as np

    pairs = {
        (int(a), int(b)) if a < b else (int(b), int(a))
        for a, b in zip(src.tolist(), dst.tolist())
        if a != b
    }
    while True:
        deg: dict[int, int] = {}
        for a, b in pairs:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            return deg
        pairs = {(a, b) for a, b in pairs if a not in drop and b not in drop}
        if not pairs:
            return {}
