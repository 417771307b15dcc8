"""Minimum spanning forest — distributed Borůvka over Datasets.

The reference's kernel set covers fixpoint semirings (min/sum/max/or);
Borůvka (1926) is the classic algorithm that does NOT fit one semiring
pass: each round every component picks its minimum outgoing edge, the
picked edges merge components, and the edge set shrinks — O(log V)
rounds. This is the documented Dataset-composition path (the k-core /
SCC peel pattern: per-round materialize IS the loop-carried state,
the driver sees only counts).

Determinism: edges carry the TOTAL order ``(w, u, v)`` (canonical
u < v), which makes all edge weights distinct, so the MSF is unique —
the distributed result equals serial Kruskal under the same order
(`msf_serial`), checked exactly in tests.

Shape per round (everything bucketed, nothing per-row on the driver):

1. attach component labels to both endpoints of the surviving edge set
   (two bucketed ``hash_join``s against the (vid, comp) label table),
2. drop intra-component edges (the shrink),
3. per-component min edge: per-batch partial argmin by ``(w, u, v)``
   (each cross edge bids for BOTH endpoint components) → comp-bucketed
   final argmin,
4. dedup picked edges (both sides may pick the same edge) → forest
   edges of this round,
5. contract: the picked edges' (cu, cv) component graph — geometrically
   shrinking — runs through the WCCKernel engine (`pairs.cluster_pairs`)
   for min-label merged components; labels update via one LEFT
   ``hash_join`` (untouched components keep their label).

At 100 TB the big side (the edge set) only ever streams through joins
and filters; per-round state is the V-sized label table and the
≤ #components picked-edge table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, mix64_pair, settle


def _canonical_weighted(edges: ray.data.Dataset) -> ray.data.Dataset:
    """DISTINCT undirected simple edges (u < v) with the MIN weight per
    pair — Borůvka is defined on the weighted simple graph."""

    def canon(batch: pa.Table):
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        keep = u != v
        df = pd.DataFrame({"u": u[keep], "v": v[keep], "w": w[keep]})
        if len(df) == 0:
            return
        g = df.groupby(["u", "v"], as_index=False)["w"].min()
        yield pa.table(
            {
                "u": pa.array(g["u"], pa.int64()),
                "v": pa.array(g["v"], pa.int64()),
                "w": pa.array(g["w"], pa.float64()),
            }
        )

    def bucket_pair(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["u"].to_numpy(zero_copy_only=False),
            batch["v"].to_numpy(zero_copy_only=False),
        )

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["u", "v"], as_index=False)["w"].min()
        return pa.table(
            {
                "u": pa.array(df["u"], pa.int64()),
                "v": pa.array(df["v"], pa.int64()),
                "w": pa.array(df["w"], pa.float64()),
            }
        )

    return bucketed_reduce(
        edges.map_batches(canon, batch_format="pyarrow"), bucket_pair, red
    )


def _rename(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({new: batch[old] for old, new in mapping.items()})

    return ds.map_batches(proj, batch_format="pyarrow")


_BEST_COLS = ("comp", "w", "u", "v", "cu", "cv")


def _best_partial(batch: pa.Table):
    """Each cross edge bids for both endpoint components; keep the
    per-batch argmin by the total order (w, u, v)."""
    if batch.num_rows == 0:
        return
    df = batch.to_pandas()
    both = pd.concat(
        [
            df.rename(columns={"cu": "comp"}).assign(cu=df["cu"], cv=df["cv"])[
                ["comp", "w", "u", "v", "cu", "cv"]
            ],
            df.rename(columns={"cv": "comp"}).assign(cu=df["cu"], cv=df["cv"])[
                ["comp", "w", "u", "v", "cu", "cv"]
            ],
        ]
    )
    best = both.sort_values(["w", "u", "v"], kind="mergesort").groupby(
        "comp", as_index=False
    ).first()
    yield pa.Table.from_pandas(best[list(_BEST_COLS)], preserve_index=False)


def minimum_spanning_forest(
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 64,
    num_partitions: int = 4,
) -> tuple[ray.data.Dataset, int]:
    """Borůvka MSF of the weighted undirected simple graph induced by
    ``edges`` (src, dst, weight). Returns ``(forest, rounds)``: forest
    has one (u, v, w) row per MSF edge (u < v), the unique MSF under
    the total order (w, u, v)."""
    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.datapipe.pairs import cluster_pairs

    ue = _canonical_weighted(edges).materialize()
    _EMPTY = pa.table(
        {
            "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "w": pa.array([], pa.float64()),
        }
    )
    if ue.count() == 0:  # self-loop-only / empty input: no forest
        return ray.data.from_arrow(_EMPTY), 0

    # initial labels: every endpoint is its own component
    def verts(batch: pa.Table) -> pa.Table:
        uni = np.unique(
            np.concatenate(
                [
                    batch["u"].to_numpy(zero_copy_only=False),
                    batch["v"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"vid": pa.array(uni, pa.int64())})

    def vbucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["vid"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def vred(g: pa.Table) -> pa.Table:
        v = np.unique(g["vid"].to_numpy(zero_copy_only=False))
        return pa.table({"vid": pa.array(v, pa.int64()), "comp": pa.array(v, pa.int64())})

    lab = bucketed_reduce(
        ue.map_batches(verts, batch_format="pyarrow"), vbucket, vred
    ).materialize()

    forest_parts: list[ray.data.Dataset] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        e2 = hash_join(
            ue, _rename(lab, {"vid": "u", "comp": "cu"}), on="u", right_cols=["cu"]
        )
        e2 = hash_join(
            e2, _rename(lab, {"vid": "v", "comp": "cv"}), on="v", right_cols=["cv"]
        )

        def cross_only(batch: pa.Table) -> pa.Table:
            m = (
                batch["cu"].to_numpy(zero_copy_only=False)
                != batch["cv"].to_numpy(zero_copy_only=False)
            )
            return batch.filter(pa.array(m))

        e2 = settle(e2.map_batches(cross_only, batch_format="pyarrow"))
        if e2.count() == 0:
            rounds -= 1
            break
        ue = settle(e2.select_columns(["u", "v", "w"]))

        def comp_bucket(batch: pa.Table) -> np.ndarray:
            return mix64(batch["comp"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

        def best_final(g: pa.Table) -> pa.Table:
            df = g.to_pandas().sort_values(["w", "u", "v"], kind="mergesort").groupby(
                "comp", as_index=False
            ).first()
            return pa.Table.from_pandas(df[list(_BEST_COLS)], preserve_index=False)

        best = settle(
            bucketed_reduce(
                e2.map_batches(_best_partial, batch_format="pyarrow"), comp_bucket, best_final
            )
        )

        # both endpoint components may pick the same edge → dedup by pair
        def pick_bucket(batch: pa.Table) -> np.ndarray:
            return mix64_pair(
                batch["u"].to_numpy(zero_copy_only=False),
                batch["v"].to_numpy(zero_copy_only=False),
            )

        def pick_dedup(g: pa.Table) -> pa.Table:
            df = g.to_pandas().drop_duplicates(["u", "v"])
            return pa.Table.from_pandas(
                df[["u", "v", "w", "cu", "cv"]], preserve_index=False
            )

        picked = settle(bucketed_reduce(best, pick_bucket, pick_dedup))
        forest_parts.append(picked.select_columns(["u", "v", "w"]))

        # contract the picked component graph (small, shrinks ≥ 2× per
        # round) via the distributed min-label WCC
        mapping = cluster_pairs(
            _rename(picked, {"cu": "a", "cv": "b"}), num_partitions=num_partitions
        )
        lab = hash_join(
            lab,
            _rename(mapping, {"doc_id": "comp", "cluster_id": "newc"}),
            on="comp",
            right_cols=["newc"],
            how="left",
        )

        def relabel(batch: pa.Table) -> pa.Table:
            comp = batch["comp"].to_numpy(zero_copy_only=False).astype(np.float64)
            newc = batch["newc"].to_numpy(zero_copy_only=False).astype(np.float64)
            out = np.where(np.isnan(newc), comp, newc).astype(np.int64)
            return pa.table(
                {"vid": batch["vid"], "comp": pa.array(out, pa.int64())}
            )

        lab = settle(lab.map_batches(relabel, batch_format="pyarrow"))

    if not forest_parts:
        return ray.data.from_arrow(_EMPTY), rounds
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.union(p)
    return out, rounds


def msf_serial(src, dst, weight) -> pd.DataFrame:
    """Kruskal under the identical total order (w, u, v) — the unique
    MSF the distributed Borůvka must reproduce exactly."""
    s = np.asarray(src, np.int64)
    d = np.asarray(dst, np.int64)
    w = np.asarray(weight, np.float64)
    u = np.minimum(s, d)
    v = np.maximum(s, d)
    keep = u != v
    df = (
        pd.DataFrame({"u": u[keep], "v": v[keep], "w": w[keep]})
        .groupby(["u", "v"], as_index=False)["w"]
        .min()
        .sort_values(["w", "u", "v"], kind="mergesort")
    )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    rows = []
    for uu, vv, ww in df.itertuples(index=False):
        ru, rv = find(int(uu)), find(int(vv))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            rows.append((int(uu), int(vv), float(ww)))
    return pd.DataFrame(rows, columns=["u", "v", "w"]).sort_values(
        ["u", "v"]
    ).reset_index(drop=True)
