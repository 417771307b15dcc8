"""k-core decomposition by distributed peeling.

The k-core is the maximal subgraph in which every vertex has degree >= k
(on the simple undirected graph) — the classic web-graph quality /
spam-tail filter. The reference has no k-core binary; this extends its
kernel family (SURVEY.md §2.j extension surface) with the standard
iterative peel, expressed Ray-Data-first:

    repeat:
        deg   = per-vertex degree of the surviving edge set
                (per-batch partial counts -> one bucketed sum, the
                init_all.c:425-443 degree-pass analogue)
        keep  = vertices with deg >= k
        edges = edges with BOTH endpoints in keep
                (two bucketed semi-joins — datapipe/joins.py hash_join,
                the same one-shuffle co-group as every other wide op)
    until the surviving vertex count stops changing.

Scale shape: the edge set shrinks monotonically; each round's survivors
are materialized because they are the loop-carried state (re-executing
the lazy lineage would recompute every earlier round per iteration —
the iterative-dataset analogue of a superstep checkpoint). The driver
holds only per-round COUNTS; peel rounds on power-law graphs converge
in O(10) rounds for fixed k.

Input contract: a directed (src, dst) edge Dataset; duplicates and
self-loops are normalized away here (degree counts DISTINCT neighbors).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from everythinggraph_ray.stages.edges import (
    dedup_edges,
    filter_self_loops,
    out_degrees,
    undirect_edges,
)


def kcore(
    edges: ray.data.Dataset, k: int, *, max_rounds: int = 100
) -> tuple[ray.data.Dataset, int]:
    """Peel to the k-core. Returns ``(core, rounds)`` where ``core`` has
    one row per surviving vertex: (vid, deg) with deg its degree INSIDE
    the k-core (all >= k), and ``rounds`` is the number of peel rounds
    executed (including the final no-change round that proves the
    fixpoint)."""
    if k < 1:
        raise ValueError("kcore requires k >= 1")
    from everythinggraph_ray.datapipe.joins import hash_join

    # simple undirected graph: both directions present, so out-degree of
    # `und` IS the vertex degree
    und = dedup_edges(undirect_edges(filter_self_loops(edges))).materialize()
    n_prev = -1
    keep = None
    for r in range(1, max_rounds + 1):
        keep = (
            out_degrees(und)
            .map_batches(
                lambda t: t.filter(pc.greater_equal(t["outdeg"], k)),
                batch_format="pyarrow",
            )
            .materialize()
        )
        n = keep.count()
        if n == n_prev or n == 0:
            break
        n_prev = n
        und = hash_join(
            hash_join(und, keep, on="src", right_on="vid", how="semi"),
            keep,
            on="dst",
            right_on="vid",
            how="semi",
        ).materialize()
    else:
        raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")
    if keep.count() == 0:  # keep a stable (vid, deg) schema when empty
        empty = pa.table({"vid": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())})
        return ray.data.from_arrow(empty), r
    return (
        keep.map_batches(
            lambda t: t.select(["vid", "outdeg"]).rename_columns(["vid", "deg"]),
            batch_format="pyarrow",
        ),
        r,
    )


def kcore_serial(src, dst, k: int):
    """Serial numpy oracle (tests): peel on the simple undirected graph.
    Returns dict vid -> in-core degree."""
    import numpy as np

    pairs = {
        (int(a), int(b)) if a < b else (int(b), int(a))
        for a, b in zip(src.tolist(), dst.tolist())
        if a != b
    }
    while True:
        deg: dict[int, int] = {}
        for a, b in pairs:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            return deg
        pairs = {(a, b) for a, b in pairs if a not in drop and b not in drop}
        if not pairs:
            return {}


def coreness(
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 10_000,
    broadcast_threshold: int = 5_000_000,
) -> tuple[ray.data.Dataset, int]:
    """FULL core decomposition: (vid, core) for every vertex of the
    edge universe — core = the largest k such that the vertex survives
    the k-core peel. The standard level-sweep peel expressed with the
    same devices as :func:`kcore`:

        k = 0
        repeat until no edges remain:
            deg = degrees of the surviving simple undirected graph
            k   = max(k, min(deg))          # advance to the next level
            assign core=k to every vertex with deg <= k, remove them
            (two bucketed semi-joins keep only edges between survivors)

    Each iteration removes at least one vertex, and on power-law graphs
    the number of (level, peel) rounds is O(degeneracy + peel depth) —
    the loop-carried edge set is settled/materialized per round exactly
    like kcore's. Vertices of the universe with no simple undirected
    edge (self-loop-only) get core 0. The driver holds only scalar
    counts and the k level; assignments accumulate as per-round
    datasets and union at the end (O(V) rows total — the output)."""
    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.stages.agg import settle

    # universe BEFORE simplification (self-loop-only vertices core 0):
    # per-batch distinct vids -> one bucketed distinct via sum_by_key
    from everythinggraph_ray.stages.agg import sum_by_key

    def verts_of(t: pa.Table) -> pa.Table:
        import numpy as np

        v = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table(
            {
                "vid": pa.array(v, pa.int64()),
                "one": pa.array([1] * len(v), pa.int64()),
            }
        )

    universe = sum_by_key(
        edges.map_batches(verts_of, batch_format="pyarrow"), "vid", ["one"]
    ).select_columns(["vid"])

    und = dedup_edges(undirect_edges(filter_self_loops(edges))).materialize()
    assigned: list[ray.data.Dataset] = []
    k = 0
    rounds = 0
    # lineage cut: Ray chains STATS parents across materialize(), and a
    # peel can run hundreds of rounds (deg<=1 cascades) — deep enough to
    # blow the stats summarizer's recursion. A periodic parquet spill +
    # re-read starts a genuinely fresh plan (the loop-state analogue of
    # the engine's checkpoint); 20 rounds of stats stay well under the
    # interpreter limit.
    import shutil
    import tempfile

    spill_every = 20
    spill_dirs: list[str] = []

    def _cut(ds: ray.data.Dataset) -> ray.data.Dataset:
        d = tempfile.mkdtemp(prefix="coreness_spill_")
        spill_dirs.append(d)
        ds.write_parquet(d)
        return ray.data.read_parquet(d).materialize()

    while und.count() > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"coreness did not converge in {max_rounds} rounds")
        if rounds % spill_every == 0:
            und = _cut(und)
            # collected assignments so far also carry per-round lineage
            merged = _cut(
                assigned[0].union(*assigned[1:]) if len(assigned) > 1 else assigned[0]
            )
            assigned = [merged]
            if len(spill_dirs) > 4:  # keep only the live spills
                shutil.rmtree(spill_dirs.pop(0), ignore_errors=True)
                shutil.rmtree(spill_dirs.pop(0), ignore_errors=True)
        deg = out_degrees(und).materialize()
        k = max(k, int(deg.min("outdeg")))
        kk = k  # bind per round: map_batches closures are late-binding
        # lazy over the materialized deg (shallow lineage, no barrier);
        # the periodic spill-merge above bounds the accumulated chain
        low = deg.map_batches(
            lambda t, _k=kk: t.filter(pc.less_equal(t["outdeg"], _k)),
            batch_format="pyarrow",
        )
        assigned.append(
            low.map_batches(
                lambda t, _k=kk: pa.table(
                    {
                        "vid": t["vid"],
                        "core": pa.array([_k] * t.num_rows, pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        # materialized: the two semi-joins below both consume it (a lazy
        # diamond re-plans the branch and blows the planner's recursion)
        keep = deg.map_batches(
            lambda t, _k=kk: t.filter(pc.greater(t["outdeg"], _k)),
            batch_format="pyarrow",
        ).materialize()
        n_keep = keep.count()
        if n_keep == 0:  # final peel took every remaining vertex
            break
        if n_keep <= broadcast_threshold:
            # cost-based broadcast semi-join (the triangles.py
            # BROADCAST_V_THRESHOLD device): one ray.put of the keep
            # set, one map_batches filter — no shuffle per round
            import numpy as _np

            kref = ray.put(
                _np.sort(
                    keep.select_columns(["vid"])
                    .to_pandas()["vid"]
                    .to_numpy(_np.int64)
                )
            )

            def both_kept(t: pa.Table, _ref=kref) -> pa.Table:
                import numpy as np

                kv = ray.get(_ref)
                s = t["src"].to_numpy(zero_copy_only=False)
                d = t["dst"].to_numpy(zero_copy_only=False)
                m = (kv[np.searchsorted(kv, s).clip(0, len(kv) - 1)] == s) & (
                    kv[np.searchsorted(kv, d).clip(0, len(kv) - 1)] == d
                )
                return t.filter(pa.array(m))

            und = settle(und.map_batches(both_kept, batch_format="pyarrow")).materialize()
        else:
            und = settle(
                hash_join(
                    hash_join(und, keep, on="src", right_on="vid", how="semi"),
                    keep,
                    on="dst",
                    right_on="vid",
                    how="semi",
                )
            ).materialize()
    got = assigned[0].union(*assigned[1:]) if assigned else None
    zeros = (
        hash_join(universe, got.select_columns(["vid"]), on="vid", how="anti")
        if got is not None
        else universe
    ).map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "core": pa.array([0] * t.num_rows, pa.int64())}
        ),
        batch_format="pyarrow",
    )
    out = got.union(zeros) if got is not None else zeros
    return out, rounds


def coreness_serial(src, dst):
    """Serial oracle (tests): textbook min-degree peel. Returns dict
    vid -> core number over the full universe (self-loop-only vertices
    core 0)."""
    import numpy as np

    universe = {int(v) for v in np.concatenate([np.asarray(src), np.asarray(dst)])}
    pairs = {
        (int(a), int(b)) if a < b else (int(b), int(a))
        for a, b in zip(np.asarray(src).tolist(), np.asarray(dst).tolist())
        if a != b
    }
    core = {v: 0 for v in universe}
    k = 0
    while pairs:
        deg: dict[int, int] = {}
        for a, b in pairs:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        k = max(k, min(deg.values()))
        drop = {v for v, d in deg.items() if d <= k}
        for v in drop:
            core[v] = k
        pairs = {(a, b) for a, b in pairs if a not in drop and b not in drop}
    return core
