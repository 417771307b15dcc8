"""Deterministic graph walks (DeepWalk-style corpus sampling, training-data
addition — absent in the reference).

Each walker starts at a seed vertex and, at step t standing on u, moves to
the out-neighbor v minimizing ``md5(f"{t}:{u}:{v}")`` (hex compare, ties by
v) — the repo's no-RNG determinism convention (curate.py shares it with
DuckDB's ``md5``): any worker, a resumed run, any cluster size, and the SQL
oracle all walk the same paths. Hashing the step makes revisits escape
2-cycles; hashing u makes walkers independent per vertex. Walkers at a
sink (no out-edges) simply stop.

Scale shape: the successor map succ(u, t) for ALL steps is built in ONE
pass over the edge table (per-batch partial argmin per (src, step), then a
bucketed final argmin — never a per-key Ray aggregate), so the edge table
is scanned once regardless of walk length; the walk itself is then L tiny
frontier ⋈ succ bucketed joins. Frontiers are |seeds| rows — the succ
table is V·L rows, hash-partitioned, never on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64


def _argmin_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Per (src, step): the (h, nxt)-lexicographic minimum."""
    df = df.sort_values(["src", "step", "h", "nxt"], kind="stable")
    return df.groupby(["src", "step"], as_index=False).first()


def successor_map(edges: ray.data.Dataset, length: int) -> ray.data.Dataset:
    """(src, step, h, nxt) for step 0..length-1: the deterministic
    successor of every vertex at every step, in one edge pass."""

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        rows = {"src": [], "step": [], "h": [], "nxt": []}
        for t in range(length):
            pre = f"{t}:"
            for u, v in zip(s.tolist(), d.tolist()):
                rows["src"].append(u)
                rows["step"].append(t)
                rows["h"].append(hashlib.md5(f"{pre}{u}:{v}".encode()).hexdigest())
                rows["nxt"].append(v)
        df = _argmin_frame(pd.DataFrame(rows))
        return pa.table(
            {
                "src": pa.array(df["src"].to_numpy(np.int64), pa.int64()),
                "step": pa.array(df["step"].to_numpy(np.int64), pa.int64()),
                "h": pa.array(df["h"], pa.string()),
                "nxt": pa.array(df["nxt"].to_numpy(np.int64), pa.int64()),
            }
        )

    partials = edges.select_columns(["src", "dst"]).map_batches(
        partial, batch_format="pyarrow", batch_size=64 * 1024
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["src"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def final(g: pa.Table) -> pa.Table:
        df = _argmin_frame(g.to_pandas())
        return pa.table(
            {
                "src": pa.array(df["src"].to_numpy(np.int64), pa.int64()),
                "step": pa.array(df["step"].to_numpy(np.int64), pa.int64()),
                "h": pa.array(df["h"], pa.string()),
                "nxt": pa.array(df["nxt"].to_numpy(np.int64), pa.int64()),
            }
        )

    return bucketed_reduce(partials, bucket_of, final)


def deterministic_walks(
    edges: ray.data.Dataset, seeds: ray.data.Dataset, length: int
) -> ray.data.Dataset:
    """Walk ``length`` steps from every seed. ``seeds`` is a Dataset with
    one int64 column ``vid`` (walk id = seed vid). Returns
    (walk, step, vid) rows, step 0..length (shorter when a walker hits a
    sink)."""
    from everythinggraph_ray.datapipe.joins import hash_join

    succ = successor_map(edges, length).materialize()  # reused L times

    def seed_rows(batch: pa.Table) -> pa.Table:
        v = batch["vid"]
        return pa.table(
            {"walk": v, "step": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()), "vid": v}
        )

    frontier = seeds.map_batches(seed_rows, batch_format="pyarrow").materialize()
    outs = [frontier]
    for t in range(length):
        # every walker may stop early (all at sinks): hash_join probes
        # schemas with take_batch(1), which raises on an empty side
        if frontier.count() == 0:
            break
        step_succ = succ.filter(expr=f"step == {t}").select_columns(["src", "nxt"])
        nxt = hash_join(
            frontier.select_columns(["walk", "vid"]),
            step_succ,
            on="vid",
            right_on="src",
            right_cols=["nxt"],
            how="inner",
        )

        def advance(batch: pa.Table, _t=t) -> pa.Table:
            return pa.table(
                {
                    "walk": batch["walk"],
                    "step": pa.array(np.full(batch.num_rows, _t + 1, np.int64), pa.int64()),
                    "vid": batch["nxt"],
                }
            )

        frontier = nxt.map_batches(advance, batch_format="pyarrow").materialize()
        outs.append(frontier)

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
