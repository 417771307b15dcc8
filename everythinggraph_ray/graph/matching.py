"""Maximal matching by deterministic parallel rounds — the edge-side
sibling of graph/mis.py.

Edge priorities are fixed: key(a, b) = md5(f"{a}:{b}") with the
zero-padded endpoint pair appended (collision-proof total order, the
repo's no-RNG md5 convention).  A round matches every active edge whose
key is the minimum among the active edges at BOTH its endpoints (a local
minimum of the line graph); matched endpoints retire all their other
edges.  With FIXED keys the parallel fixpoint equals the sequential
greedy matching taken in key order — the serial oracle is a one-liner —
while rounds finish in O(log E) expected for hash-random keys.

Round shape (all bucketed, driver holds only counts):
  1. per endpoint: min incident edge key — edges emit (endpoint, key)
     both ways, ONE bucketed string-min
  2. winners: two LEFT hash_joins attach each edge's endpoint minima;
     the edge wins iff its own key equals both
  3. shrink: matched endpoints (winners' both ends) anti-join the active
     edge set on a then on b; survivors materialize (loop-carried state)
  4. serial tail below ``tail_threshold`` active edges (the mis.py /
     SCC-trim device): exact, because the parallel fixpoint of the
     remaining subgraph IS its greedy matching.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, settle
from everythinggraph_ray.stages.edges import dedup_edges, filter_self_loops

__all__ = ["maximal_matching", "matching_serial"]

_EMPTY = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})


def _ekeys(a, b, weighted: bool = False) -> list[str]:
    """Edge priority strings. ``weighted=True`` prepends the 2-digit
    ``99 - w`` with w = a%10 + b%10 (the reference's synthesized weight,
    symmetric in the endpoints), so the lexicographic order is
    weight-DESC with the md5 hash as tiebreak — the greedy
    maximum-weight matching key (classic 1/2-approximation). Shared
    verbatim with the SQL oracle's lpad expression."""
    out = []
    for x, y in zip(
        a.tolist() if hasattr(a, "tolist") else a,
        b.tolist() if hasattr(b, "tolist") else b,
    ):
        pre = f"{99 - (x % 10 + y % 10):02d}" if weighted else ""
        out.append(
            pre
            + hashlib.md5(f"{x}:{y}".encode()).hexdigest()
            + f"{x}".rjust(20, "0")
            + f"{y}".rjust(20, "0")
        )
    return out


def _canonical(edges: ray.data.Dataset) -> ray.data.Dataset:
    def lo_hi(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d), pa.int64()),
                "dst": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    return dedup_edges(
        filter_self_loops(edges.select_columns(["src", "dst"])).map_batches(
            lo_hi, batch_format="pyarrow"
        )
    )


def matching_serial(src, dst, weighted: bool = False) -> set[tuple[int, int]]:
    """Sequential greedy matching in key order over the canonical
    simple edge set — the exact spec of the parallel fixpoint."""
    es = sorted({(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d})
    keyed = (
        sorted(
            (k, e)
            for k, e in zip(_ekeys(*map(np.array, zip(*es)), weighted=weighted), es)
        )
        if es
        else []
    )
    used: set[int] = set()
    out: set[tuple[int, int]] = set()
    for _k, (a, b) in keyed:
        if a not in used and b not in used:
            used.update((a, b))
            out.add((a, b))
    return out


def maximal_matching(
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 60,
    tail_threshold: int = 1_000_000,
    num_buckets: int = 64,
    weighted: bool = False,
) -> tuple[ray.data.Dataset, int]:
    """Returns ``(matched_edges, rounds)``: (a, b) rows with a < b — the
    greedy-by-md5-key maximal matching of the simple undirected graph.
    ``num_buckets`` sizes every shuffle in the round (a round is ~7
    bucketed exchanges, so small graphs should pass a small value — the
    per-bucket fixed cost dominates them otherwise). ``weighted=True``
    switches the priority to weight-DESC (w = a%10 + b%10, the
    synthesized-weight rule) with md5 tiebreak: the greedy
    maximum-weight matching, a 1/2-approximation of the optimum.
    Weight stratification multiplies the round count (~O(weight levels
    * log E): descending-weight chains retire one level per round) —
    pass a larger ``max_rounds`` than the unweighted kernel needs."""
    from everythinggraph_ray.datapipe.joins import hash_join

    active = settle(_canonical(edges), num_buckets)
    matched_parts: list[ray.data.Dataset] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        n_active = active.count()
        if n_active == 0:
            rounds -= 1
            break
        if n_active <= tail_threshold:
            df = active.to_pandas()
            tw = sorted(
                matching_serial(df["src"].to_numpy(), df["dst"].to_numpy(), weighted=weighted)
            )
            matched_parts.append(
                ray.data.from_arrow(
                    pa.table(
                        {
                            "a": pa.array([x for x, _ in tw], pa.int64()),
                            "b": pa.array([y for _, y in tw], pa.int64()),
                        }
                    )
                )
            )
            break

        def vmin_partial(bt: pa.Table) -> pa.Table:
            s = bt["src"].to_numpy(zero_copy_only=False)
            d = bt["dst"].to_numpy(zero_copy_only=False)
            k = _ekeys(s, d, weighted=weighted)
            df = pd.DataFrame({"v": np.concatenate([s, d]), "mk": k + k})
            g = df.groupby("v", as_index=False)["mk"].min()
            return pa.table(
                {
                    "v": pa.array(g["v"].to_numpy(np.int64), pa.int64()),
                    "mk": pa.array(g["mk"], pa.string()),
                }
            )

        def bucket_v(bt: pa.Table) -> np.ndarray:
            return mix64(bt["v"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

        def vmin_final(g: pa.Table) -> pa.Table:
            df = g.to_pandas().groupby("v", as_index=False)["mk"].min()
            return pa.table(
                {
                    "v": pa.array(df["v"].to_numpy(np.int64), pa.int64()),
                    "mk": pa.array(df["mk"], pa.string()),
                }
            )

        vmin = bucketed_reduce(
            active.map_batches(vmin_partial, batch_format="pyarrow"),
            bucket_v,
            vmin_final,
            num_buckets=num_buckets,
        )

        with_a = hash_join(
            active, vmin, on="src", right_on="v", right_cols=["mk"], how="left", num_buckets=num_buckets
        ).map_batches(
            lambda bt: pa.table(
                {"src": bt["src"], "dst": bt["dst"], "mka": bt["mk"]}
            ),
            batch_format="pyarrow",
        )
        with_ab = hash_join(
            with_a, vmin, on="dst", right_on="v", right_cols=["mk"], how="left", num_buckets=num_buckets
        ).map_batches(
            lambda bt: pa.table(
                {"src": bt["src"], "dst": bt["dst"], "mka": bt["mka"], "mkb": bt["mk"]}
            ),
            batch_format="pyarrow",
        )

        def pick_winners(bt: pa.Table) -> pa.Table:
            s = bt["src"].to_numpy(zero_copy_only=False)
            d = bt["dst"].to_numpy(zero_copy_only=False)
            own = _ekeys(s, d, weighted=weighted)
            ma = bt["mka"].to_pylist()
            mb = bt["mkb"].to_pylist()
            keep = np.array(
                [o == x and o == y for o, x, y in zip(own, ma, mb)], dtype=bool
            )
            return pa.table(
                {"a": pa.array(s[keep], pa.int64()), "b": pa.array(d[keep], pa.int64())}
            )

        winners = settle(with_ab.map_batches(pick_winners, batch_format="pyarrow"), num_buckets)
        if winners.count() == 0:
            # every active edge lost both local minima to a neighbor that
            # itself lost the other endpoint — impossible with a total
            # order (the globally-minimal active edge always wins)
            raise RuntimeError("matching round made no progress")
        matched_parts.append(winners)

        def endpoints(bt: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": pa.array(
                        np.unique(
                            np.concatenate(
                                [
                                    bt["a"].to_numpy(zero_copy_only=False),
                                    bt["b"].to_numpy(zero_copy_only=False),
                                ]
                            )
                        ),
                        pa.int64(),
                    )
                }
            )

        saturated = winners.map_batches(endpoints, batch_format="pyarrow")
        # two-step shrink with an emptiness gate between the anti-joins:
        # hash_join peeks the left schema (take_batch) and raises on an
        # empty input, which the src-side join can legitimately produce
        active = settle(
            hash_join(
                active, saturated, on="src", right_on="vid", how="anti", num_buckets=num_buckets
            ),
            num_buckets,
        )
        if active.count():
            active = settle(
                hash_join(
                    active, saturated, on="dst", right_on="vid", how="anti", num_buckets=num_buckets
                ),
                num_buckets,
            )
    else:
        raise RuntimeError(f"matching did not converge in {max_rounds} rounds")

    if not matched_parts:
        return ray.data.from_arrow(_EMPTY), rounds
    out = matched_parts[0]
    for p in matched_parts[1:]:
        out = out.union(p)
    return out, rounds
