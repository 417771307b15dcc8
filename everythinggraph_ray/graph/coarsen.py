"""Graph coarsening (contraction): collapse a vertex grouping into a
weighted supergraph — the multilevel-partitioning / domain-graph primitive
(page graph -> domain graph on the web; METIS-style V-cycles elsewhere).

``contract`` maps every edge (u, v) to its group pair (g(u), g(v)) and
counts the underlying edges per group pair; the count becomes the
supergraph's edge weight, so weight-proportional kernels (graph/kernels.py
WeightedPageRankKernel) run on the coarse graph unchanged.

Scale shape: ONE streaming pass — each batch reduces to its distinct
(gsrc, gdst, partial-count) rows via a packed-key ``np.unique`` (a batch of
B edges leaves at most min(B, G^2) rows), then stages/agg.py:sum_by_key
combines the partials with the standard bucketed reduce.  Nothing is
driver-resident; the supergraph (<= G^2 rows) streams out as a Dataset
ready for graph/build.py:build_graph(weighted=True).

The grouping is a deterministic callable over the vid array (default
``vid % num_groups``) so results are reproducible and SQL-expressible;
a real web pipeline would pass the url->domain id map instead.

Reference scope: EverythingGraph has no coarsening pass; included as the
standard multilevel/web-aggregation primitive a link-graph engine needs.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import sum_by_key

__all__ = ["contract"]


def contract(
    edges: ray.data.Dataset,
    num_groups: int,
    *,
    group_of: Callable[[np.ndarray], np.ndarray] | None = None,
    drop_self_loops: bool = True,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """(src, dst, weight) supergraph: src/dst are group ids in
    [0, num_groups), weight (float64) counts the underlying edges between
    the two groups.  Contracted self-loops (both endpoints in one group)
    are dropped by default — rank mass recirculating inside a supernode
    is not link structure.  Pass the DISTINCT simple edge set for
    well-defined weights (stages/edges.py:dedup_edges)."""
    G = np.int64(num_groups)
    if group_of is None:
        group_of = lambda v: v % G  # noqa: E731 - the documented default

    def partial(batch: pa.Table) -> pa.Table:
        gs = group_of(batch[src_col].to_numpy(zero_copy_only=False)).astype(np.int64)
        gd = group_of(batch[dst_col].to_numpy(zero_copy_only=False)).astype(np.int64)
        if drop_self_loops:
            keep = gs != gd
            gs, gd = gs[keep], gd[keep]
        packed, cnt = np.unique(gs * G + gd, return_counts=True)
        return pa.table(
            {
                "gk": pa.array(packed, pa.int64()),
                "weight": pa.array(cnt.astype(np.float64), pa.float64()),
            }
        )

    summed = sum_by_key(
        edges.map_batches(partial, batch_format="pyarrow"), "gk", ["weight"]
    )

    def unpack(batch: pa.Table) -> pa.Table:
        gk = batch["gk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(gk // G, pa.int64()),
                "dst": pa.array(gk % G, pa.int64()),
                "weight": batch["weight"],
            }
        )

    return summed.map_batches(unpack, batch_format="pyarrow")
