"""Maximal independent set by deterministic parallel Luby rounds.

Priorities are fixed, not re-drawn per round: key(v) = md5(str(v)) with
the zero-padded vid appended (collision-proof, and the repo's no-RNG
md5 determinism convention — shared verbatim with the DuckDB oracle).
With FIXED priorities the parallel rounds converge to exactly the
sequential greedy MIS taken in key order (the lexicographically-first
MIS), which gives the serial test oracle a one-line spec; rounds still
finish in O(log n) expected for hash-random keys (Luby-style: every
round decides each local-minimum neighborhood).

Round (all bucketed, driver holds only counts):
  1. per active vertex u: min neighbor key over the ACTIVE adjacency —
     keys are recomputed from the vid inside each batch (nothing joined
     to fetch them), so this is ONE bucketed reduce
  2. winners = active vertices whose own key beats that min (or with no
     active neighbor at all) → MIS; one LEFT hash_join
  3. losers = neighbors of winners (one semi join + bucketed distinct)
  4. active/adjacency shrink by winners+losers (anti / two semi joins —
     the kcore peel shape; per-round survivors materialize because they
     are the loop-carried state)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, settle, sum_by_key
from everythinggraph_ray.stages.edges import dedup_edges, filter_self_loops, undirect_edges


def _keys(vids) -> list[str]:
    return [
        hashlib.md5(str(v).encode()).hexdigest() + str(v).rjust(20, "0")
        for v in (vids.tolist() if hasattr(vids, "tolist") else vids)
    ]


def maximal_independent_set(
    edges: ray.data.Dataset, *, max_rounds: int = 60, tail_threshold: int = 1_000_000
) -> tuple[ray.data.Dataset, int]:
    """Returns ``(result, rounds)``: one row per vertex of the universe,
    (vid, in_mis int8) — the greedy-by-md5-key MIS of the simple
    undirected graph.

    ``tail_threshold``: Luby rounds shrink the active set geometrically,
    so the tail is o(1) of the work but pays the same per-round shuffle
    latency; once the ACTIVE VERTEX count drops to the threshold, the
    remaining induced subgraph is finished serially on the driver (the
    SCC-trim device) — exact, because the parallel fixpoint on the
    remaining graph IS the greedy MIS of the remaining graph. Driver
    memory is bounded by the threshold times the tail's average degree;
    set 0 to stay fully distributed."""
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

    active = sum_by_key(
        edges.map_batches(universe_partial, batch_format="pyarrow"), "vid", ["one"]
    ).select_columns(["vid"]).materialize()
    und = dedup_edges(undirect_edges(filter_self_loops(edges))).materialize()

    mis_parts: list[ray.data.Dataset] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        n_active = active.count()
        if n_active == 0:
            rounds -= 1
            break
        # airtight tail bound (round-3 VERDICT item 8): the serial tail
        # pulls the induced EDGE set too, so gate on both counts — a
        # tail_threshold-sized active set with a super-linear induced
        # edge count keeps iterating distributed rounds instead
        if n_active <= tail_threshold and und.count() <= 8 * tail_threshold:
            # serial tail: greedy in key order over the remaining induced
            # subgraph (exactly the parallel fixpoint of what's left)
            vids = active.to_pandas()["vid"].to_numpy(np.int64)
            tail_edges = und.to_pandas()
            # an empty Dataset loses its schema in to_pandas() (no columns)
            empty = np.empty(0, np.int64)
            tw = mis_serial_active(
                vids,
                tail_edges["src"].to_numpy(np.int64) if len(tail_edges) else empty,
                tail_edges["dst"].to_numpy(np.int64) if len(tail_edges) else empty,
            )
            mis_parts.append(
                ray.data.from_arrow(pa.table({"vid": pa.array(tw, pa.int64())}))
            )
            break
        # adjacency rows may be stale after shrink only in u — und is
        # kept endpoint-consistent below, so both ends are active here
        n_adj = und.count()
        if n_adj == 0:
            mis_parts.append(active)  # all isolated: every survivor wins
            break

        def nbr_min_partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    "u": b["src"].to_numpy(zero_copy_only=False),
                    "mk": _keys(b["dst"].to_numpy(zero_copy_only=False)),
                }
            )
            g = df.groupby("u", as_index=False)["mk"].min()
            return pa.table(
                {
                    "u": pa.array(g["u"].to_numpy(np.int64), pa.int64()),
                    "mk": pa.array(g["mk"], pa.string()),
                }
            )

        def bucket_u(b: pa.Table) -> np.ndarray:
            return mix64(b["u"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

        def nbr_min_final(g: pa.Table) -> pa.Table:
            df = g.to_pandas().groupby("u", as_index=False)["mk"].min()
            return pa.table(
                {
                    "u": pa.array(df["u"].to_numpy(np.int64), pa.int64()),
                    "mk": pa.array(df["mk"], pa.string()),
                }
            )

        nbr_min = bucketed_reduce(
            und.map_batches(nbr_min_partial, batch_format="pyarrow"), bucket_u, nbr_min_final
        )

        joined = hash_join(active, nbr_min, on="vid", right_on="u", right_cols=["mk"], how="left")

        def pick_winners(b: pa.Table) -> pa.Table:
            v = b["vid"].to_numpy(zero_copy_only=False)
            mk = b["mk"].to_pylist()
            own = _keys(v)
            keep = np.array([m is None or o < m for o, m in zip(own, mk)])
            return pa.table({"vid": pa.array(v[keep], pa.int64())})

        winners = settle(joined.map_batches(pick_winners, batch_format="pyarrow"))
        mis_parts.append(winners)

        losers = sum_by_key(
            hash_join(und, winners, on="src", right_on="vid", how="semi").map_batches(
                lambda b: pa.table(
                    {
                        "vid": b["dst"],
                        "one": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            "vid",
            ["one"],
        ).select_columns(["vid"])

        decided = settle(winners.union(losers))
        active = settle(hash_join(active, decided, on="vid", how="anti"))
        if active.count() and und.count():
            und = hash_join(
                hash_join(und, active, on="src", right_on="vid", how="semi"),
                active,
                on="dst",
                right_on="vid",
                how="semi",
            )
            und = settle(und)
        else:
            und = ray.data.from_arrow(
                pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
            )
    else:
        raise RuntimeError(f"MIS did not converge in {max_rounds} rounds")

    mis = mis_parts[0] if mis_parts else None
    for p in mis_parts[1:]:
        mis = mis.union(p)

    full = sum_by_key(
        edges.map_batches(universe_partial, batch_format="pyarrow"), "vid", ["one"]
    ).select_columns(["vid"])
    if mis is None or mis.count() == 0:
        return (
            full.map_batches(
                lambda b: b.append_column(
                    "in_mis", pa.array(np.zeros(b.num_rows, np.int8), pa.int8())
                ),
                batch_format="pyarrow",
            ),
            rounds,
        )
    in_mis = hash_join(full, mis, on="vid", how="semi").map_batches(
        lambda b: b.append_column("in_mis", pa.array(np.ones(b.num_rows, np.int8), pa.int8())),
        batch_format="pyarrow",
    )
    not_mis = hash_join(full, mis, on="vid", how="anti").map_batches(
        lambda b: b.append_column("in_mis", pa.array(np.zeros(b.num_rows, np.int8), pa.int8())),
        batch_format="pyarrow",
    )
    return in_mis.union(not_mis), rounds


def mis_serial_active(vids: np.ndarray, src: np.ndarray, dst: np.ndarray) -> list[int]:
    """Greedy MIS in md5-key order over an explicit vertex set and its
    induced adjacency (the distributed loop's serial tail). Returns the
    winner vids."""
    adj: dict[int, set[int]] = {int(v): set() for v in vids.tolist()}
    for a, b in zip(src.tolist(), dst.tolist()):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    order = sorted(adj, key=lambda v: _keys([v])[0])
    in_mis: set[int] = set()
    for v in order:
        if not (adj[v] & in_mis):
            in_mis.add(v)
    return sorted(in_mis)


def mis_serial(src, dst) -> dict[int, int]:
    """Serial oracle: greedy MIS in md5-key order (== the fixed-priority
    parallel rounds' fixpoint). Returns vid -> 0/1."""
    verts = sorted({int(v) for v in src.tolist()} | {int(v) for v in dst.tolist()})
    adj: dict[int, set[int]] = {v: set() for v in verts}
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    order = sorted(verts, key=lambda v: _keys([v])[0])
    in_mis: set[int] = set()
    for v in order:
        if not (adj[v] & in_mis):
            in_mis.add(v)
    return {v: (1 if v in in_mis else 0) for v in verts}
