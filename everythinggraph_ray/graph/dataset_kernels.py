"""Pure Ray-Data kernel variants (no long-lived actors).

The reference validates itself by running the same kernel through
different physical layouts (push vs pull vs grid, SURVEY.md §5); our
analogue is a second, independently-built formulation of PageRank using
only Dataset ops — ``map_batches`` partial aggregation + ``groupby.sum``
per superstep — cross-checked against the actor engine in tests.

Scale note: this variant broadcasts the vertex-state vector (``ray.put``
once per superstep, read by every task) and collects the combined sums on
the driver; it is the right shape when V ≪ E (vertex state fits one
node's memory — e.g. billions of edges over tens of millions of
vertices). The actor engine (engine.py) is the path where vertex state
itself must be partitioned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from everythinggraph_ray.stages.edges import out_degrees


def pagerank_dataset(
    edges: ray.data.Dataset,
    *,
    damping: float = 0.85,
    tol: float | None = 1e-6,
    n_iters: int | None = None,
    max_iters: int = 200,
) -> pa.Table:
    """Reference-semantics PageRank over Dataset ops only.

    Same update rule as PageRankKernel (pagerank_simple.c:51-55: prev init
    0.15, rank = (1-d)/N + d*Σ prev[u]/outdeg[u], dangling mass dropped).
    Returns an Arrow table (vid, pagerank) sorted by vid.
    """
    edges = edges.select_columns(["src", "dst"]).materialize()
    deg = out_degrees(edges).to_pandas().sort_values("vid")
    vids = deg["vid"].to_numpy(np.int64)
    outdeg = np.maximum(deg["outdeg"].to_numpy(np.int64), 1)
    n = len(vids)
    const = (1.0 - damping) / max(1, n)  # empty graph: no division crash
    prev = np.full(n, 0.15)

    limit = n_iters if n_iters is not None else max_iters
    it = 0
    while it < limit:
        msg_ref = ray.put((vids, prev / outdeg))

        def partial(batch: pa.Table) -> pa.Table:
            mv, mm = ray.get(msg_ref)
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            if not len(d):  # empty block: reduceat on [0] would raise
                return pa.table(
                    {"dst": pa.array([], pa.int64()), "partial": pa.array([], pa.float64())}
                )
            contrib = mm[np.searchsorted(mv, s)]
            o = np.argsort(d, kind="stable")
            ds_, cs = d[o], contrib[o]
            st = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
            return pa.table(
                {
                    "dst": pa.array(ds_[st], pa.int64()),
                    "partial": pa.array(np.add.reduceat(cs, st), pa.float64()),
                }
            )

        agg = (
            edges.map_batches(partial, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("partial", alias_name="s"))
            .to_pandas()
        )
        rank = np.zeros(n)
        pos = np.searchsorted(vids, agg["dst"].to_numpy(np.int64))
        rank[pos] = agg["s"].to_numpy()
        rank = const + damping * rank
        delta = float(np.max(np.abs(rank - prev)))
        prev = rank
        it += 1
        if n_iters is None and delta < tol:
            break

    return pa.table({"vid": pa.array(vids, pa.int64()), "pagerank": pa.array(prev, pa.float64())})


def wcc_dataset(edges: ray.data.Dataset, *, max_iters: int = 200) -> pa.Table:
    """Pure-Dataset WCC cross-variant: symmetric min-label propagation via
    per-superstep map_batches partial-min + small driver-side combine
    (labels broadcast via ray.put each round). Same fixpoint as WCCKernel;
    cross-checked in tests. Small-V assumption as pagerank_dataset."""
    import numpy as np

    edges = edges.select_columns(["src", "dst"]).materialize()
    deg = out_degrees(edges).to_pandas().sort_values("vid")
    vids = deg["vid"].to_numpy(np.int64)
    labels = vids.copy()

    for _ in range(max_iters):
        ref = ray.put((vids, labels))

        def partial(batch: pa.Table) -> pa.Table:
            mv, ml = ray.get(ref)
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            if not len(d):  # empty block: reduceat on [0] would raise
                return pa.table(
                    {"vid": pa.array([], pa.int64()), "lab": pa.array([], pa.int64())}
                )
            ls = ml[np.searchsorted(mv, s)]
            ld = ml[np.searchsorted(mv, d)]
            # symmetric: each endpoint proposes its label to the other
            vid = np.concatenate([d, s])
            lab = np.concatenate([ls, ld])
            o = np.argsort(vid, kind="stable")
            vid, lab = vid[o], lab[o]
            st = np.flatnonzero(np.r_[True, vid[1:] != vid[:-1]])
            return pa.table(
                {
                    "vid": pa.array(vid[st], pa.int64()),
                    "lab": pa.array(np.minimum.reduceat(lab, st), pa.int64()),
                }
            )

        prop = edges.map_batches(partial, batch_format="pyarrow", batch_size=256 * 1024).to_pandas()
        agg = prop.groupby("vid")["lab"].min()
        new = labels.copy()
        pos = np.searchsorted(vids, agg.index.to_numpy(np.int64))
        np.minimum.at(new, pos, agg.to_numpy(np.int64))
        if np.array_equal(new, labels):
            break
        labels = new

    return pa.table({"vid": pa.array(vids, pa.int64()), "component": pa.array(labels, pa.int64())})
