"""Greedy graph coloring by deterministic Jones–Plassmann rounds — the
third member of the fixed-priority family (graph/mis.py on vertices,
graph/matching.py on edges).

Priorities are fixed md5 keys (mis.py's ``_keys`` convention, shared
verbatim with the DuckDB oracle).  A round colors every UNCOLORED vertex
whose key is the minimum among its uncolored neighbors; its color is the
mex (minimum excludant) of its already-colored neighbors' colors.  With
FIXED priorities the parallel fixpoint equals the sequential greedy
coloring taken in key order: when u wins, its smaller-key neighbors are
exactly its colored neighbors (same-round winners are an independent
set), so the mex u sees is the mex the sequential sweep sees.  Round
count is the priority DAG's depth — the longest key-decreasing path —
small for hash-random keys (measured 7 on a 60-vertex random graph).

Round shape (FUSED — unlike mis.py's winner/loser/shrink cascade, one
round here is 2 joins + 1 reduce + 1 settle, because the winner test and
the color assignment read the same annotated adjacency):
  1. annotate the STATIC full adjacency with both endpoints' current
     colors (two hash_joins against the colored set)
  2. one bucketed reduce per src: over rows whose src is uncolored,
     min key among UNCOLORED neighbors decides the win, and the mex of
     COLORED neighbors' colors is the color — winners exit the reduce
     already colored
  3. colored ∪= winners (settled: loop-carried state)
Isolated vertices take color 0 before round 1.  A serial tail below
``tail_threshold`` uncolored vertices (the mis.py device) finishes the
remaining induced subgraph greedily given the fixed colors — exactly the
parallel fixpoint of what's left.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.graph.mis import _keys
from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, settle, sum_by_key
from everythinggraph_ray.stages.edges import dedup_edges, filter_self_loops, undirect_edges

__all__ = ["greedy_coloring", "coloring_serial"]

_EMPTY_COLORED = pa.table(
    {"vid": pa.array([], pa.int64()), "color": pa.array([], pa.int64())}
)


def _mex(used: np.ndarray) -> int:
    """Minimum non-negative integer absent from ``used``."""
    c = 0
    for u in np.unique(used):
        if u == c:
            c += 1
        elif u > c:
            break
    return int(c)


def _with_color(ds: ray.data.Dataset, color: int) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: b.append_column(
            "color", pa.array(np.full(b.num_rows, color, np.int64), pa.int64())
        ),
        batch_format="pyarrow",
    )


def greedy_coloring(
    edges: ray.data.Dataset, *, max_rounds: int = 200, tail_threshold: int = 1_000_000
) -> tuple[ray.data.Dataset, int]:
    """Returns ``(result, rounds)``: one row per vertex of the universe,
    (vid, color int64) — the greedy-by-md5-key coloring of the simple
    undirected graph (proper: no edge is monochromatic).

    ``tail_threshold``: once the uncolored count drops below it, the
    remainder is finished serially on the driver (exact — see module
    docstring); driver memory is bounded by the tail's incident-edge
    count. Set 0 to stay fully distributed."""
    from everythinggraph_ray.datapipe.joins import hash_join

    def universe_partial(b: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    b["src"].to_numpy(zero_copy_only=False),
                    b["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table(
            {"vid": pa.array(u, pa.int64()), "one": pa.array(np.ones(len(u), np.int64), pa.int64())}
        )

    universe = sum_by_key(
        edges.map_batches(universe_partial, batch_format="pyarrow"), "vid", ["one"]
    ).select_columns(["vid"]).materialize()
    n_total = universe.count()
    if n_total == 0:
        return ray.data.from_arrow(_EMPTY_COLORED), 0
    # full adjacency is STATIC: each round re-annotates it with current
    # endpoint colors instead of shrinking a copy (fewer barriers; the
    # volume is O(E) per round either way, as in any BSP kernel here)
    full_und = dedup_edges(undirect_edges(filter_self_loops(edges))).materialize()
    if full_und.count() == 0:
        return _with_color(universe, 0), 0

    # isolated vertices (no surviving self-loop-free edge) take 0 now
    colored = settle(
        _with_color(hash_join(universe, full_und, on="vid", right_on="src", how="anti"), 0)
    )
    n_colored = colored.count()

    rounds = 0
    for rounds in range(1, max_rounds + 1):
        remaining = n_total - n_colored
        if remaining == 0:
            rounds -= 1
            break
        if remaining <= tail_threshold:
            # hash_join peeks both sides' schemas — guard empty colored
            active = (
                hash_join(universe, colored, on="vid", how="anti")
                if n_colored
                else universe
            )
            vids = active.to_pandas()["vid"].to_numpy(np.int64)
            empty = np.empty(0, np.int64)
            inc = hash_join(full_und, active, on="src", right_on="vid", how="semi")
            if inc.count() and n_colored:
                idf = hash_join(
                    inc, colored, on="dst", right_on="vid", right_cols=["color"], how="left"
                ).to_pandas()
            elif inc.count():
                idf = inc.to_pandas()
                idf["color"] = pd.array([None] * len(idf), dtype="Int64")
            else:
                idf = pd.DataFrame({"src": empty, "dst": empty, "color": empty})
            tv, tc = coloring_serial_active(
                vids,
                idf["src"].to_numpy(np.int64) if len(idf) else empty,
                idf["dst"].to_numpy(np.int64) if len(idf) else empty,
                idf["color"].to_numpy(dtype=object) if len(idf) else np.empty(0, object),
            )
            tail = ray.data.from_arrow(
                pa.table({"vid": pa.array(tv, pa.int64()), "color": pa.array(tc, pa.int64())})
            )
            colored = colored.union(tail)
            break

        # annotate both endpoints with current colors (null = uncolored);
        # hash_join emits left columns + right_cols in order, and peeks
        # both sides' schemas — branch while nothing is colored yet
        if n_colored:
            ann = hash_join(
                full_und, colored, on="src", right_on="vid", right_cols=["color"], how="left"
            ).map_batches(
                lambda b: b.rename_columns(["src", "dst", "s_color"]), batch_format="pyarrow"
            )
            ann = hash_join(
                ann, colored, on="dst", right_on="vid", right_cols=["color"], how="left"
            )
        else:
            ann = full_und.map_batches(
                lambda b: pa.table(
                    {
                        "src": b["src"],
                        "dst": b["dst"],
                        "s_color": pa.array([None] * b.num_rows, pa.int64()),
                        "color": pa.array([None] * b.num_rows, pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )

        def partial(b: pa.Table) -> pa.Table:
            sc = b["s_color"].to_numpy(zero_copy_only=False)
            m = pd.isna(sc)  # rows whose src is still uncolored
            if not m.any():
                return pa.table(
                    {
                        "u": pa.array([], pa.int64()),
                        "dk": pa.array([], pa.string()),
                        "dc": pa.array([], pa.int64()),
                    }
                )
            u = b["src"].to_numpy(zero_copy_only=False)[m]
            d = b["dst"].to_numpy(zero_copy_only=False)[m]
            dc = b["color"].to_numpy(zero_copy_only=False)[m]
            dcn = pd.isna(dc)
            dk = [k if n else None for k, n in zip(_keys(d), dcn)]
            return pa.table(
                {
                    "u": pa.array(u.astype(np.int64), pa.int64()),
                    "dk": pa.array(dk, pa.string()),
                    "dc": pa.array(
                        [None if n else int(c) for c, n in zip(dc, dcn)], pa.int64()
                    ),
                }
            )

        def bucket_u(b: pa.Table) -> np.ndarray:
            return mix64(b["u"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

        def decide(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            vids: list[int] = []
            cols: list[int] = []
            for v, grp in df.groupby("u", sort=False):
                dks = grp["dk"].dropna()
                if len(dks):
                    own = _keys([int(v)])[0]
                    if own >= dks.min():
                        continue  # an uncolored neighbor has priority
                used = grp["dc"].dropna().to_numpy(np.int64)
                vids.append(int(v))
                cols.append(_mex(used))
            return pa.table(
                {"vid": pa.array(vids, pa.int64()), "color": pa.array(cols, pa.int64())}
            )

        winners = bucketed_reduce(
            ann.map_batches(partial, batch_format="pyarrow"), bucket_u, decide
        )
        colored = settle(colored.union(winners))
        n_colored = colored.count()
    else:
        raise RuntimeError(f"coloring did not converge in {max_rounds} rounds")

    return colored, rounds


def coloring_serial_active(
    vids: np.ndarray, src: np.ndarray, dst: np.ndarray, nbr_color: np.ndarray
) -> tuple[list[int], list[int]]:
    """Greedy coloring in md5-key order over an explicit active set,
    given its incident adjacency with already-fixed neighbor colors
    (None/NaN where the neighbor is itself active) — the distributed
    loop's serial tail. Returns parallel (vid, color) lists."""
    fixed_used: dict[int, set[int]] = {int(v): set() for v in vids.tolist()}
    adj: dict[int, set[int]] = {int(v): set() for v in vids.tolist()}
    act = set(fixed_used)
    for a, b, c in zip(src.tolist(), dst.tolist(), nbr_color.tolist()):
        a, b = int(a), int(b)
        if pd.isna(c):
            if b in act:
                adj[a].add(b)
        else:
            fixed_used[a].add(int(c))
    order = sorted(act, key=lambda v: _keys([v])[0])
    color: dict[int, int] = {}
    out_v: list[int] = []
    out_c: list[int] = []
    for v in order:
        used = fixed_used[v] | {color[w] for w in adj[v] if w in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
        out_v.append(v)
        out_c.append(c)
    return out_v, out_c


def coloring_serial(src, dst) -> dict[int, int]:
    """Serial oracle: greedy coloring in md5-key order (== the
    fixed-priority parallel rounds' fixpoint). Returns vid -> color."""
    verts = sorted({int(v) for v in src.tolist()} | {int(v) for v in dst.tolist()})
    adj: dict[int, set[int]] = {v: set() for v in verts}
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    order = sorted(verts, key=lambda v: _keys([v])[0])
    color: dict[int, int] = {}
    for v in order:
        used = {color[w] for w in adj[v] if w in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color
