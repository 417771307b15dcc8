"""Edge-table transforms (SURVEY.md §2.b M1-M5, §2.g).

All operate on a Ray Data Dataset with int64 ``src``/``dst`` columns
(optional float64 ``weight``), vectorized pyarrow/numpy per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def reverse_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(src,dst) → (dst,src); the reference's in-edge build
    (init_all.c:745-760)."""

    def swap(batch: pa.Table) -> pa.Table:
        cols = {"src": batch["dst"], "dst": batch["src"]}
        if "weight" in batch.column_names:
            cols["weight"] = batch["weight"]
        return pa.table(cols)

    return edges.map_batches(swap, batch_format="pyarrow")


def undirect_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Append reversed edges (the reference's ``-u`` createUndir,
    random.c:80-82). Single pass: each batch emits both directions —
    a union with reverse_edges would scan the input twice."""

    def both(batch: pa.Table) -> pa.Table:
        cols = {
            "src": pa.concat_arrays(
                [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]
            ),
            "dst": pa.concat_arrays(
                [batch["dst"].combine_chunks(), batch["src"].combine_chunks()]
            ),
        }
        if "weight" in batch.column_names:
            w = batch["weight"].combine_chunks()
            cols["weight"] = pa.concat_arrays([w, w])
        return pa.table(cols)

    return edges.map_batches(both, batch_format="pyarrow")


def filter_self_loops(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Drop src==dst rows (the reference's skip_loops flag, init_all.h:40)."""
    return edges.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["src"], t["dst"]))),
        batch_format="pyarrow",
    )


def synthesize_weights(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Add weight = src%10 + dst%10 (the reference's CREATE_WEIGHT,
    init_all.c:663-666) as float64."""

    def add_w(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        w = (s % 10 + d % 10).astype(np.float64)
        out = batch
        if "weight" in out.column_names:
            out = out.drop_columns(["weight"])
        return out.append_column("weight", pa.array(w, pa.float64()))

    return edges.map_batches(add_w, batch_format="pyarrow")


def dedup_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Exact (src,dst) dedup: within-batch unique first (the combiner,
    removes the bulk), then a bucketed global pass — one vectorized
    np.unique per hash bucket, never a per-key group call."""
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64_pair

    def local(batch: pa.Table) -> pa.Table:
        arr = np.stack(
            [
                batch["src"].to_numpy(zero_copy_only=False),
                batch["dst"].to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        u = np.unique(arr, axis=0)
        return pa.table({"src": pa.array(u[:, 0], pa.int64()), "dst": pa.array(u[:, 1], pa.int64())})

    local_ds = edges.select_columns(["src", "dst"]).map_batches(
        local, batch_format="pyarrow", batch_size=256 * 1024
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return mix64_pair(s, d)

    def red(g: pa.Table) -> pa.Table:
        arr = np.stack(
            [g["src"].to_numpy(zero_copy_only=False), g["dst"].to_numpy(zero_copy_only=False)],
            axis=1,
        )
        u = np.unique(arr, axis=0)
        return pa.table({"src": pa.array(u[:, 0], pa.int64()), "dst": pa.array(u[:, 1], pa.int64())})

    return bucketed_reduce(local_ds, bucket_of, red)


def out_degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(vid, outdeg) for every vertex in the universe (dst-only vertices get
    outdeg 0). Per-batch partial counts (the combiner for A1,
    init_all.c:425-443), then a bucketed vectorized sum — NOT a per-key
    Ray aggregate (~80x slower at 10^5+ keys)."""
    from everythinggraph_ray.stages.agg import sum_by_key

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        su, sc = np.unique(s, return_counts=True)
        du = np.unique(d)
        vid = np.concatenate([su, du])
        cnt = np.concatenate([sc.astype(np.int64), np.zeros(len(du), np.int64)])
        return pa.table({"vid": pa.array(vid, pa.int64()), "outdeg_partial": pa.array(cnt, pa.int64())})

    partials = edges.select_columns(["src", "dst"]).map_batches(
        partial, batch_format="pyarrow", batch_size=256 * 1024
    )
    return sum_by_key(partials, "vid", ["outdeg_partial"], out_names=["outdeg"])


def weighted_out_degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(vid, outdeg, woutdeg) — out_degrees plus the per-src SUM of edge
    weights (0.0 for dst-only vertices), the divisor of weight-
    proportional rank splitting. Same combiner + bucketed-sum shape as
    out_degrees; GLOBAL per-vertex sums, so hub mirrors see the true
    weighted degree (a local sum would undercount split hubs)."""
    from everythinggraph_ray.stages.agg import sum_by_key

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        o = np.argsort(s, kind="stable")
        ss, ws = s[o], w[o]
        st = np.flatnonzero(np.r_[True, ss[1:] != ss[:-1]]) if len(ss) else np.empty(0, np.int64)
        su = ss[st] if len(ss) else ss
        sc = np.diff(np.r_[st, len(ss)]) if len(ss) else np.empty(0, np.int64)
        sw = np.add.reduceat(ws, st) if len(st) else ws[:0]
        du = np.unique(d)
        vid = np.concatenate([su, du])
        cnt = np.concatenate([sc.astype(np.int64), np.zeros(len(du), np.int64)])
        wsum = np.concatenate([sw, np.zeros(len(du), np.float64)])
        return pa.table(
            {
                "vid": pa.array(vid, pa.int64()),
                "outdeg_partial": pa.array(cnt, pa.int64()),
                "woutdeg_partial": pa.array(wsum, pa.float64()),
            }
        )

    partials = edges.select_columns(["src", "dst", "weight"]).map_batches(
        partial, batch_format="pyarrow", batch_size=256 * 1024
    )
    return sum_by_key(
        partials,
        "vid",
        ["outdeg_partial", "woutdeg_partial"],
        out_names=["outdeg", "woutdeg"],
    )


def seed_vertex_count(edges: ray.data.Dataset, mod: int) -> int:
    """Global count of distinct vertices with vid % mod == 0 (the
    personalized-PageRank seed rule). Per-batch unique shrinks each batch
    to <= V/mod candidate rows before the distinct, so the shuffle moves
    near-nothing."""

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"vid": pa.array([], pa.int64())})
        v = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"vid": pa.array(v[v % mod == 0], pa.int64())})

    return len(edges.map_batches(partial, batch_format="pyarrow").unique("vid"))


def neighbor_sample(edges: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """GraphSAGE-style deterministic neighbor sampling: for each src keep
    the ``k`` out-neighbors whose ``md5("{src}_{dst}")`` hex digest sorts
    smallest (ties by dst asc) — a uniform-without-RNG sample whose
    membership is reproducible across runs, resumes and cluster sizes,
    the property an RNG draw lacks on a resumable 100 TB job. Input should
    be deduplicated (``dedup_edges``) so "sample k neighbors" is
    well-defined. Emits (src, dst, rnk) with 1-based hash-order rank.

    Scale shape: the md5 column rides the edge batch; selection is
    ``grouped_top_k`` (per-batch partial top-k combiner, so at most
    k x |srcs-in-batch| rows reach the bucketed shuffle)."""
    from everythinggraph_ray.stages.agg import grouped_top_k

    def add_hash(batch: pa.Table) -> pa.Table:
        # per-row md5 is inherent to hash semantics (shared verbatim with
        # the DuckDB oracle); numpy-free by necessity, like fingerprinting
        import hashlib

        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        h = [
            hashlib.md5(f"{a}_{b}".encode("utf-8")).hexdigest()
            for a, b in zip(s.tolist(), d.tolist())
        ]
        return batch.append_column("__h", pa.array(h, pa.string()))

    sampled = grouped_top_k(
        edges.select_columns(["src", "dst"]).map_batches(add_hash, batch_format="pyarrow"),
        "src",
        [("__h", True), ("dst", True)],
        k,
        rank_col="rnk",
    )
    return sampled.select_columns(["src", "dst", "rnk"])
