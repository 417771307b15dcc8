"""Distributed parent-tree validation for BFS/SSSP results.

The reference validates its traversals via the parent array
(sssp_pushpull.c:57-68 stores the relaxing src; wcc.c:138-182 runs a
post-hoc structural check). The distributed analogue here checks, without
collecting anything on the driver:

    1. dist relation — every reached non-root vertex v must satisfy
       ``dist[v] == dist[parent[v]] + 1`` and its parent must be reached
       (bucketed co-group of claim rows keyed by the parent's vid against
       the result rows themselves);
    2. edge existence — ``(parent[v], v)`` must be a real edge of the
       input (bucketed co-group of claims against the edge table).

Returns violation counts; a valid tree yields all zeros.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, mix64_pair


def _sum_col(ds: ray.data.Dataset, col: str) -> int:
    v = ds.sum(col)
    return int(v) if v is not None else 0


def validate_parents(
    result: ray.data.Dataset,
    edges: ray.data.Dataset,
    root: int,
    *,
    unreached: int = np.iinfo(np.int64).max,
) -> dict:
    """``result``: (vid, dist, parent) rows; ``edges``: (src, dst).
    Returns {"n_claims", "dist_violations", "edge_violations"}."""

    # ---- claims: one row per reached non-root vertex ---------------------
    def claims(batch: pa.Table) -> pa.Table:
        vid = batch["vid"].to_numpy(zero_copy_only=False)
        dist = batch["dist"].to_numpy(zero_copy_only=False)
        parent = batch["parent"].to_numpy(zero_copy_only=False)
        m = (dist != unreached) & (vid != root)
        return pa.table(
            {
                "u": pa.array(parent[m].astype(np.int64), pa.int64()),  # claimed parent
                "v": pa.array(vid[m].astype(np.int64), pa.int64()),
                "d": pa.array(dist[m].astype(np.int64), pa.int64()),
                "role": pa.array(np.ones(int(m.sum()), np.int8), pa.int8()),
            }
        )

    claim_ds = result.map_batches(claims, batch_format="pyarrow").materialize()
    n_claims = claim_ds.count()

    # ---- check 1: dist[v] == dist[parent] + 1, parent reached ------------
    def owner_rows(batch: pa.Table) -> pa.Table:
        vid = batch["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        dist = batch["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(vid)
        return pa.table(
            {
                "u": pa.array(vid, pa.int64()),  # keyed by the parent-side vid
                "v": pa.array(np.full(n, -1), pa.int64()),
                "d": pa.array(dist, pa.int64()),
                "role": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    u1 = claim_ds.union(result.map_batches(owner_rows, batch_format="pyarrow"))

    def by_u(batch: pa.Table) -> np.ndarray:
        return mix64(batch["u"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def check_dist(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        owners = df[df["role"] == 0][["u", "d"]].rename(columns={"d": "pd"})
        cl = df[df["role"] == 1]
        m = cl.merge(owners, on="u", how="left")
        bad = int((m["pd"].isna() | (m["pd"] == unreached) | (m["d"] != m["pd"] + 1)).sum())
        return pa.table({"viol": pa.array([bad], pa.int64())})

    dist_viol = _sum_col(bucketed_reduce(u1, by_u, check_dist), "viol")

    # ---- check 2: (parent, v) is a real edge -----------------------------
    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(s)
        return pa.table(
            {
                "u": pa.array(s, pa.int64()),
                "v": pa.array(d, pa.int64()),
                "d": pa.array(np.zeros(n, np.int64), pa.int64()),
                "role": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    u2 = claim_ds.union(
        edges.select_columns(["src", "dst"]).map_batches(edge_rows, batch_format="pyarrow")
    )

    def by_uv(batch: pa.Table) -> np.ndarray:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return mix64_pair(u, v)

    def check_edge(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        have = df[df["role"] == 0][["u", "v"]].drop_duplicates()
        cl = df[df["role"] == 1][["u", "v"]]
        m = cl.merge(have.assign(ok=True), on=["u", "v"], how="left")
        bad = int(m["ok"].isna().sum())
        return pa.table({"viol": pa.array([bad], pa.int64())})

    edge_viol = _sum_col(bucketed_reduce(u2, by_uv, check_edge), "viol")

    return {
        "n_claims": int(n_claims),
        "dist_violations": dist_viol,
        "edge_violations": edge_viol,
    }


def validate_components(
    result: ray.data.Dataset,
    edges: ray.data.Dataset,
    *,
    label_col: str = "component",
) -> dict:
    """Distributed form of the reference's WCC validator (wcc.c:138-182):
    every edge's endpoints must carry the SAME component label (the
    reference exits on the first violation; we count them). Labels attach
    to each endpoint via one bucketed co-group per side — edges and labels
    co-locate by vid hash, nothing lands on the driver.

    ``result``: (vid, <label_col>); ``edges``: (src, dst).
    Returns {"n_edges", "violations"} — a valid labeling yields 0."""

    def lab_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": pa.array(
                    batch["vid"].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()
                ),
                "other": pa.array(np.full(n, -1), pa.int64()),
                "lab": pa.array(
                    batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()
                ),
                "role": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    labels = result.map_batches(lab_rows, batch_format="pyarrow")

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(s)
        return pa.table(
            {
                "key": pa.array(s, pa.int64()),  # attach the SRC label first
                "other": pa.array(d, pa.int64()),
                "lab": pa.array(np.full(n, -1), pa.int64()),
                "role": pa.array(np.ones(n, np.int8), pa.int8()),
            }
        )

    def by_key(batch: pa.Table) -> np.ndarray:
        return mix64(batch["key"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def attach(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        lab = df[df["role"] == 0][["key", "lab"]].rename(columns={"lab": "key_lab"})
        ed = df[df["role"] == 1][["key", "other"]]
        m = ed.merge(lab, on="key", how="left")
        # an endpoint with NO label row is itself a violation: mark -2
        kl = m["key_lab"].fillna(-2).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(m["other"].to_numpy(np.int64), pa.int64()),  # now keyed by dst
                "other": pa.array(m["key"].to_numpy(np.int64), pa.int64()),
                "lab": pa.array(kl.to_numpy(np.int64), pa.int64()),
                "role": pa.array(np.ones(len(m), np.int8), pa.int8()),
            }
        )

    half = bucketed_reduce(labels.union(edges.map_batches(edge_rows, batch_format="pyarrow")), by_key, attach)

    def check(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        lab = df[df["role"] == 0][["key", "lab"]].rename(columns={"lab": "dst_lab"})
        ed = df[df["role"] == 1]
        m = ed.merge(lab, on="key", how="left")
        dl = m["dst_lab"].fillna(-2).astype(np.int64).to_numpy()
        sl = m["lab"].to_numpy(np.int64)
        bad = int(((sl != dl) | (sl == -2)).sum())  # mismatch OR missing endpoint
        return pa.table({"viol": pa.array([bad], pa.int64()), "n": pa.array([len(m)], pa.int64())})

    out = bucketed_reduce(labels.union(half), by_key, check).materialize()
    return {"n_edges": _sum_col(out, "n"), "violations": _sum_col(out, "viol")}
