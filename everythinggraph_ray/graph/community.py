"""One-level Louvain-style community detection — synchronous,
deterministic greedy modularity moves (Blondel et al. 2008's local-move
phase, made BSP-deterministic the same way the repo's coloring kernel
makes Luby/Jones-Plassmann deterministic: a parity schedule instead of
an asynchronous sweep).

Round r moves only vertices with (vid + r) % 2 == 0, all evaluated
against the SAME start-of-round snapshot and applied simultaneously.
A mover v in community a with degree d considers every neighbor
community c (plus staying): the modularity gain comparison reduces to
the all-integer score

    score(c) = 2m·k_{v,c} − d·(tot(c) − d·[c == a])

(k_{v,c} = v's edges into c, tot(c) = Σ degrees in c); v moves to the
max-score community (ties → smallest community id) iff that score
STRICTLY beats score(a). Integer scores make every decision exact and
partition-invariant — no float-tie nondeterminism.

Distributed shape per round (no per-vertex driver state):
  tot(c)   one bucketed sum over the state table;
  k_{v,c}  symmetric edges ⋈ state (comm of the far endpoint) via the
           bucketed hash_join, then one bucketed pair sum;
  scores   two small attach joins (state row, tot) + vectorized math;
  argmax   grouped top-1 per vertex (the grouped_top_k combiner);
  apply    one left join writes the movers' new communities.

The serial reference (`louvain_serial`) implements the identical rule
for the pytest equality check; no SQL form (iterative argmax rewiring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import (
    bucketed_reduce,
    grouped_top_k,
    mix64,
    settle,
    sum_by_key,
    sum_by_key_pair,
)


def _und_sym(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Canonical undirected distinct pairs → both directions (m, n)."""
    from everythinggraph_ray.graph.triangles import _canonical_undirected

    und = _canonical_undirected(edges)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "m": pa.array(np.concatenate([a, b]), pa.int64()),
                "n": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    return und.map_batches(sym, batch_format="pyarrow")


def louvain_one_level(
    edges: ray.data.Dataset, *, n_rounds: int = 3
) -> ray.data.Dataset:
    """Returns (vid, community) after ``n_rounds`` parity-scheduled
    synchronous greedy-modularity rounds over the simple undirected
    graph (distinct pairs, self-loops dropped)."""
    sym = _und_sym(edges).materialize()  # consumed every round
    m2 = int(sym.count())  # = 2m directed-pair rows
    if m2 == 0:
        return ray.data.from_arrow(
            pa.table(
                {"vid": pa.array([], pa.int64()), "community": pa.array([], pa.int64())}
            )
        )

    # deg = distinct-neighbor degree; init comm = vid
    def deg_partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(batch["m"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"vid": pa.array(v, pa.int64()), "deg": pa.array(c.astype(np.int64), pa.int64())}
        )

    state = sum_by_key(
        sym.map_batches(deg_partial, batch_format="pyarrow"), "vid", ["deg"]
    ).map_batches(
        lambda t: t.append_column("comm", t["vid"]), batch_format="pyarrow"
    ).materialize()

    for r in range(n_rounds):
        tot = sum_by_key(
            state.map_batches(
                lambda t: pa.table({"comm": t["comm"], "deg": t["deg"]}),
                batch_format="pyarrow",
            ),
            "comm",
            ["deg"],
            out_names=["tot"],
        )
        tot = settle(tot)  # hash_join probes schemas by executing one
        # batch — with a shuffle upstream that is the whole pipeline;
        # pinning the small per-round tables avoids the double execution,
        # and settling (repartition+materialize) bounds the block growth
        # that otherwise inflates every later round (the MSF/SCC lesson)

        # k_{v, c}: far endpoint's community attached to each directed row;
        # a zero-count row for every vertex's OWN community rides along so
        # score(a) always has a candidate row (round 0 starts with
        # singleton communities and no self-loops — without these rows the
        # stay comparison would have nothing to join)
        far = hash_join(sym, state, on="m", right_on="vid", right_cols=["comm"])
        own_zero = state.map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "cand": t["comm"],
                    "k": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        kvc = sum_by_key_pair(
            far.map_batches(
                lambda t: pa.table(
                    {
                        "vid": t["n"],
                        "cand": t["comm"],
                        "k": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ).union(own_zero),
            "vid",
            "cand",
            ["k"],
        )
        kvc = settle(kvc)
        # movers only, with own (deg, comm) and tot(cand) attached
        def movers_only(t: pa.Table, _r=r) -> pa.Table:
            v = t["vid"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((v + _r) % 2 == 0, pa.bool_()))

        cand = hash_join(
            kvc.map_batches(movers_only, batch_format="pyarrow"),
            state,
            on="vid",
            right_cols=["deg", "comm"],
        )
        cand = settle(cand)  # the second join's schema probe would
        # otherwise re-execute this whole join
        cand = hash_join(cand, tot, on="cand", right_on="comm", right_cols=["tot"])

        def score_rows(t: pa.Table, _m2=m2) -> pa.Table:
            k = t["k"].to_numpy(zero_copy_only=False)
            d = t["deg"].to_numpy(zero_copy_only=False)
            c = t["cand"].to_numpy(zero_copy_only=False)
            a = t["comm"].to_numpy(zero_copy_only=False)
            tt = t["tot"].to_numpy(zero_copy_only=False)
            score = _m2 * k - d * (tt - np.where(c == a, d, 0))
            return pa.table(
                {
                    "vid": t["vid"],
                    "cand": pa.array(c, pa.int64()),
                    "score": pa.array(score, pa.int64()),
                    "comm": pa.array(a, pa.int64()),
                }
            )

        scored = settle(cand.map_batches(score_rows, batch_format="pyarrow"))
        best = settle(grouped_top_k(scored, "vid", [("score", False), ("cand", True)], 1))

        # score(a): the cand == comm row (guaranteed by own_zero)
        def stay_rows(t: pa.Table) -> pa.Table:
            c = t["cand"].to_numpy(zero_copy_only=False)
            a = t["comm"].to_numpy(zero_copy_only=False)
            keep = c == a
            return pa.table(
                {
                    "vid": pa.array(
                        t["vid"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                    ),
                    "stay_score": pa.array(
                        t["score"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                    ),
                }
            )

        stays = settle(scored.map_batches(stay_rows, batch_format="pyarrow"))
        decision = hash_join(best, stays, on="vid", right_cols=["stay_score"])

        def decide(t: pa.Table) -> pa.Table:
            best_c = t["cand"].to_numpy(zero_copy_only=False)
            best_s = t["score"].to_numpy(zero_copy_only=False)
            stay = t["stay_score"].to_numpy(zero_copy_only=False)
            move = best_s > stay
            return pa.table(
                {
                    "vid": pa.array(
                        t["vid"].to_numpy(zero_copy_only=False)[move], pa.int64()
                    ),
                    "new_comm": pa.array(best_c[move], pa.int64()),
                }
            )

        moves = settle(decision.map_batches(decide, batch_format="pyarrow"))
        if moves.count() == 0:
            continue  # this half is settled; the other parity may still move

        # apply: left join state ⋈ moves
        state = hash_join(
            state, moves, on="vid", right_cols=["new_comm"], how="left"
        ).map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "deg": t["deg"],
                    "comm": pa.array(
                        np.where(
                            pd.isna(t["new_comm"].to_pandas().to_numpy()),
                            t["comm"].to_numpy(zero_copy_only=False),
                            t["new_comm"].to_pandas().fillna(0).to_numpy(),
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        state = settle(state)

    return state.map_batches(
        lambda t: pa.table({"vid": t["vid"], "community": t["comm"]}),
        batch_format="pyarrow",
    )


def louvain_serial(
    src: np.ndarray, dst: np.ndarray, *, n_rounds: int = 3
) -> pd.DataFrame:
    """Serial reference implementing the identical synchronous parity
    rule. Returns (vid, community) sorted by vid."""
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    keep = lo != hi
    pairs = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    adj: dict[int, list[int]] = {}
    for a, b in pairs.tolist():
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    vids = sorted(adj)
    deg = {v: len(adj[v]) for v in vids}
    m2 = 2 * len(pairs)
    comm = {v: v for v in vids}
    for r in range(n_rounds):
        tot: dict[int, int] = {}
        for v in vids:
            tot[comm[v]] = tot.get(comm[v], 0) + deg[v]
        new_comm = dict(comm)
        for v in vids:
            if (v + r) % 2 != 0:
                continue
            a = comm[v]
            k: dict[int, int] = {}
            for u in adj[v]:
                k[comm[u]] = k.get(comm[u], 0) + 1
            d = deg[v]

            def score(c: int) -> int:
                return m2 * k.get(c, 0) - d * (tot[c] - (d if c == a else 0))

            cands = sorted(k, key=lambda c: (-score(c), c))
            stay = score(a)
            if cands and score(cands[0]) > stay:
                new_comm[v] = cands[0]
        comm = new_comm
    return pd.DataFrame(
        {"vid": vids, "community": [comm[v] for v in vids]}
    ).astype("int64")


def community_conductance(
    edges: ray.data.Dataset, labels: ray.data.Dataset, *, min_size: int = 1
) -> ray.data.Dataset:
    """(community, vol, cut) per community over the simple undirected
    graph: vol(c) = Σ_{v∈c} deg(v), cut(c) = boundary edge-endpoints
    (each cut edge counted once from each side), so conductance =
    cut / min(vol, 2m − vol) is exactly reconstructable from the integer
    surface. Composition shape: the symmetrized edge list streams
    through two bucketed hash_joins (labels attach to each endpoint —
    labels are a VERTEX-sized table, co-partitioned by the same mix64
    buckets, never a broadcast), then per-batch per-community partials
    reduce through sum_by_key."""
    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.stages.agg import sum_by_key

    sym = _und_sym(edges)
    lab_src = labels.map_batches(
        lambda b: pa.table({"m": b["vid"], "c_src": b["community"]}),
        batch_format="pyarrow",
    )
    lab_dst = labels.map_batches(
        lambda b: pa.table({"n": b["vid"], "c_dst": b["community"]}),
        batch_format="pyarrow",
    )
    e1 = hash_join(sym, lab_src, on="m", right_cols=["c_src"])
    e2 = hash_join(e1, lab_dst, on="n", right_cols=["c_dst"])

    def partial(batch: pa.Table) -> pa.Table:
        cs = batch["c_src"].to_numpy(zero_copy_only=False).astype(np.int64)
        cd = batch["c_dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(cs, return_inverse=True)
        vol = np.bincount(inv).astype(np.int64)
        cut = np.bincount(inv, weights=(cs != cd)).astype(np.int64)
        return pa.table(
            {
                "community": pa.array(u, pa.int64()),
                "vol": pa.array(vol, pa.int64()),
                "cut": pa.array(cut, pa.int64()),
            }
        )

    out = sum_by_key(
        e2.map_batches(partial, batch_format="pyarrow"), "community", ["vol", "cut"]
    )
    if min_size > 1:
        def gate(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pa.array(batch["vol"].to_numpy(zero_copy_only=False) >= min_size)
            )

        out = out.map_batches(gate, batch_format="pyarrow")
    return out
