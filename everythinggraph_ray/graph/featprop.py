"""Multi-channel feature propagation over the link graph — the
GNN-preprocessing aggregate (SGC / LightGCN-style: x_{t+1}[v] =
Σ_{(u,v)∈E} x_t[u] / outdeg(u)), i.e. an SpMM where the vertex state is
a d-dim feature row instead of the engine's scalar (graph/kernels.py
SpMVKernel is the d=1 special case; reference semantics
spmv.c:61-79 generalized per column).

Ray-Data-first composition, no engine change and no driver state:
each iteration is (1) an inner hash_join of the feature table with the
src out-degree table (datapipe/joins.py — one bucketed shuffle), the
division fused into the join bucket's merge output via a map_batches,
(2) a hash_join of the DISTINCT edge table against the scaled features
on src (second shuffle), and (3) a per-batch partial sum by dst feeding
sum_by_key (stages/agg.py — third shuffle, combiner-first like A1/A2).
Shuffle volume per iteration is O(E + V·d) rows; features never land on
the driver. At 100 TB the feature table is the small side of nothing —
both sides stream through the same mix64 bucket convention every other
wide op here uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import sum_by_key
from everythinggraph_ray.stages.edges import dedup_edges


def features_from_embeddings(
    embeddings: ray.data.Dataset,
    dim: int,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """(vid, f0..f{dim-1}) float64 from the first ``dim`` embedding
    dims — the feature slice a propagation pass runs over."""

    def slice_dims(batch: pa.Table) -> pa.Table:
        m = np.stack(
            [np.asarray(v[:dim], dtype=np.float64) for v in batch[emb_col].to_pylist()]
        ) if batch.num_rows else np.empty((0, dim))
        cols = {"vid": pa.array(
            batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()
        )}
        for i in range(dim):
            cols[f"f{i}"] = pa.array(m[:, i], pa.float64())
        return pa.table(cols)

    return embeddings.map_batches(slice_dims, batch_format="pyarrow")


def feature_propagation(
    edges: ray.data.Dataset,
    features: ray.data.Dataset,
    *,
    n_iters: int = 2,
    dim: int = 4,
) -> ray.data.Dataset:
    """``n_iters`` rounds of x[v] ← Σ_{(u,v)} x[u]/outdeg(u) over the
    distinct-edge graph. ``features`` is (vid, f0..f{dim-1}); vertices
    absent from it contribute nothing but still receive. Returns
    (vid, f0..f{dim-1}) for vertices with ≥1 contributing in-edge."""
    fcols = [f"f{i}" for i in range(dim)]
    e = dedup_edges(edges.select_columns(["src", "dst"])).materialize()

    # src out-degree of the distinct graph (matches the SQL GROUP BY src):
    # per-batch partial counts, bucketed exact sum
    def deg_partial(batch: pa.Table) -> pa.Table:
        su, sc = np.unique(
            batch["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        return pa.table(
            {"vid": pa.array(su, pa.int64()),
             "deg_partial": pa.array(sc.astype(np.int64), pa.int64())}
        )

    deg = sum_by_key(
        e.map_batches(deg_partial, batch_format="pyarrow"),
        "vid", ["deg_partial"], out_names=["outdeg"],
    )

    # ONE-TIME degree-weighted edge table (round-5: outdeg was re-joined
    # to the feature table every round, and e/deg re-executed their
    # lineage per reuse — 3 shuffles/round + recomputes → 2 shuffles/
    # round over a materialized static table). The per-term value is the
    # SAME f64 division x[src]/outdeg(src), just evaluated per edge.
    ew = hash_join(e, deg, on="src", right_on="vid", right_cols=["outdeg"]).materialize()

    x = features
    for _ in range(n_iters):
        contrib = hash_join(ew, x, on="src", right_on="vid", right_cols=fcols)

        def partial(batch: pa.Table) -> pa.Table:
            d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            od = batch["outdeg"].to_numpy(zero_copy_only=False).astype(np.float64)
            o = np.argsort(d, kind="stable")
            ds_ = d[o]
            st = (
                np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
                if len(ds_) else np.empty(0, np.int64)
            )
            cols = {"vid": pa.array(ds_[st] if len(ds_) else ds_, pa.int64())}
            for c in fcols:
                v = batch[c].to_numpy(zero_copy_only=False)[o] / od[o]
                cols[c] = pa.array(
                    np.add.reduceat(v, st) if len(st) else v[:0], pa.float64()
                )
            return pa.table(cols)

        x = sum_by_key(
            contrib.map_batches(partial, batch_format="pyarrow"), "vid", fcols
        )
    return x
