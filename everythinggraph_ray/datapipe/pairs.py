"""Distributed candidate-pair verification: the shared tail of every
near-dup pipeline (MinHash, SimHash, embedding-LSH).

The scale problem: LSH banding proposes candidate pairs whose count is
O(|near-dups|) — at 100 TB that is itself a huge table, so neither the
pairs nor the per-doc payloads (shingle sets / vectors) may ever be
collected on the driver. The shape here is two bucketed co-groups:

    1. co-locate each pair ENDPOINT with its payload by ``hash(doc_id)``
       (one vectorized pandas merge per bucket) → (a, b, side, payload)
    2. co-locate the two sides of each pair by ``hash((a, b))`` and score
       them (exact Jaccard / cosine — inherently per-pair work, but
       distributed across buckets, never on the driver)

Only ids, pair rows and the payloads of candidate docs move; full texts
never do. Replaces the round-1 driver-side verify flagged in VERDICT.md
("What's wrong" #2/#4).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

# role codes in the unioned co-group table
_ROLE_PAYLOAD = 0
_ROLE_SIDE_A = 1
_ROLE_SIDE_B = 2


def distinct_pairs(pairs: ray.data.Dataset, *, num_buckets: int = 64) -> ray.data.Dataset:
    """Distributed DISTINCT over (a, b) pair rows (bands/chunks propose the
    same pair many times). All copies of a pair hash to one bucket."""

    def bucket_of(batch: pa.Table) -> np.ndarray:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return (mix64(a) ^ mix64(~b)).astype(np.int64) & 0x7FFFFFFF

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates(["a", "b"])
        return pa.table(
            {
                "a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                "b": pa.array(df["b"].to_numpy(np.int64), pa.int64()),
            }
        )

    return bucketed_reduce(pairs, bucket_of, red, num_buckets=num_buckets)


def pairwise_verify(
    payloads: ray.data.Dataset,
    pairs: ray.data.Dataset,
    score_fn: Callable[[np.ndarray, np.ndarray], float],
    *,
    id_col: str = "doc_id",
    payload_col: str = "pay",
    out_col: str = "score",
    pay_type: pa.DataType | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Score every (a, b) candidate pair with ``score_fn(payload_a,
    payload_b)`` — fully distributed (see module docstring). Returns a
    Dataset (a, b, <out_col>:float64).

    ``payloads``: (id_col, payload_col:list<...>) — one row per doc that
    MAY appear in a pair (extra rows are dropped by the co-group merge).
    """
    if pay_type is None:
        pay_type = payloads.schema().base_schema.field(payload_col).type

    def pair_rows(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(a)
        return pa.table(
            {
                "key": pa.array(np.concatenate([a, b]), pa.int64()),
                "a": pa.array(np.concatenate([a, a]), pa.int64()),
                "b": pa.array(np.concatenate([b, b]), pa.int64()),
                "role": pa.array(
                    np.r_[np.full(n, _ROLE_SIDE_A), np.full(n, _ROLE_SIDE_B)], pa.int8()
                ),
                "pay": pa.nulls(2 * n, pay_type),
            }
        )

    def payload_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        col = batch[payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {
                "key": pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()
                ),
                "a": pa.array(np.full(n, -1), pa.int64()),
                "b": pa.array(np.full(n, -1), pa.int64()),
                "role": pa.array(np.zeros(n, np.int8), pa.int8()),
                "pay": col.cast(pa.list_(pay_type.value_type)) if pa.types.is_list(pay_type) else col,
            }
        )

    unioned = pairs.map_batches(pair_rows, batch_format="pyarrow").union(
        payloads.map_batches(payload_rows, batch_format="pyarrow")
    )

    # ---- co-group 1: endpoint ⋈ payload on doc id -----------------------
    def key_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["key"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def attach(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        pay = df[df["role"] == _ROLE_PAYLOAD][["key", "pay"]]
        ends = df[df["role"] != _ROLE_PAYLOAD][["key", "a", "b", "role"]]
        m = ends.merge(pay, on="key", how="inner")
        return pa.table(
            {
                "a": pa.array(m["a"].to_numpy(np.int64), pa.int64()),
                "b": pa.array(m["b"].to_numpy(np.int64), pa.int64()),
                "role": pa.array(m["role"].to_numpy(np.int8), pa.int8()),
                "pay": pa.array(list(m["pay"]), pay_type),
            }
        )

    attached = bucketed_reduce(unioned, key_bucket, attach, num_buckets=num_buckets)

    # ---- co-group 2: the two sides of each pair -------------------------
    def pair_bucket(batch: pa.Table) -> np.ndarray:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return (mix64(a) ^ mix64(~b)).astype(np.int64) & 0x7FFFFFFF

    def score(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        out_a: list[int] = []
        out_b: list[int] = []
        out_s: list[float] = []
        # per-pair scoring is inherent (exact Jaccard / cosine of ONE pair);
        # the loop is over this bucket's pairs only — never the driver
        for (a, b), grp in df.groupby(["a", "b"], sort=False):
            sa = grp.loc[grp["role"] == _ROLE_SIDE_A, "pay"]
            sb = grp.loc[grp["role"] == _ROLE_SIDE_B, "pay"]
            if len(sa) and len(sb):
                out_a.append(int(a))
                out_b.append(int(b))
                out_s.append(float(score_fn(np.asarray(sa.iloc[0]), np.asarray(sb.iloc[0]))))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                out_col: pa.array(np.round(out_s, 8), pa.float64()),
            }
        )

    out = bucketed_reduce(attached, pair_bucket, score, num_buckets=num_buckets)
    # anchor the schema with one empty typed block: when no pair survives,
    # the groupby yields ZERO blocks and the dataset would otherwise lose
    # its schema entirely (drivers/oracles need stable columns)
    empty = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                out_col: pa.array([], pa.float64()),
            }
        )
    )
    return out.union(empty)


def group_pairs(
    grouped: ray.data.Dataset,
    group_cols: list[str],
    *,
    max_bucket: int = 512,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(id, group...) rows → candidate (a, b) pairs per group (a < b).

    Degenerate buckets (hash collisions / boilerplate): a group larger
    than ``max_bucket`` emits a STAR around its minimum id instead of the
    O(n²) clique — connectivity (and therefore any WCC clustering
    downstream) is preserved through the hub, at the cost of recall for
    pairs that verify only through a non-hub member; the truncation is
    surfaced in the output as ``starred=True`` rows rather than silently
    dropped (ADVICE round 1)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy(np.int64))
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "a": pd.array([], dtype="int64"),
                    "b": pd.array([], dtype="int64"),
                    "starred": pd.array([], dtype="bool"),
                }
            )
        if len(ids) > max_bucket:
            hub = ids[0]
            return pd.DataFrame(
                {"a": np.full(len(ids) - 1, hub), "b": ids[1:], "starred": True}
            )
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[i], "b": ids[j], "starred": False})

    return grouped.groupby(group_cols).map_groups(pairs, batch_format="pandas")


def cluster_pairs(pairs: ray.data.Dataset, *, num_partitions: int = 4) -> ray.data.Dataset:
    """Connected components over verified pairs via the distributed
    WCCKernel engine (graph/engine.py) — the scale path VERDICT.md asked
    for: min-label propagation gives every member the MINIMUM doc_id of
    its cluster, identical to union-find with min-root merging. Returns
    (doc_id, cluster_id)."""
    import shutil
    import tempfile

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import WCCKernel
    from everythinggraph_ray.stages.edges import undirect_edges

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["a"], "dst": batch["b"]})

    edges = pairs.map_batches(as_edges, batch_format="pyarrow")
    bdir = tempfile.mkdtemp(prefix="neardup_wcc_")
    try:
        meta = build_graph(undirect_edges(edges), bdir, num_partitions=num_partitions)
        if meta["n_edges"] == 0:
            return ray.data.from_arrow(
                pa.table(
                    {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
                )
            )
        eng = GraphEngine(bdir)
        try:
            res = eng.run(WCCKernel())
            # the result blocks are owned by the DRIVER (actor-task returns),
            # so they stay valid in the object store after actor teardown
            return res["dataset"].map_batches(
                lambda t: pa.table({"doc_id": t["vid"], "cluster_id": t["wcc"]}),
                batch_format="pyarrow",
            )
        finally:
            eng.shutdown()
    finally:
        shutil.rmtree(bdir, ignore_errors=True)
