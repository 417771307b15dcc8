"""SimRank (Jeh & Widom, KDD 2002) for a small seed set, two exact
iterations — the recursive generalization of the co-citation /
bibliographic-coupling pair (queries rel_cocitation / rel_coupling):

  s0 = identity
  s1(i,j) = C · cocit(i,j) / (indeg(i)·indeg(j))     (i ≠ j)
  s2(a,b) = C/(indeg(a)·indeg(b)) · Σ_{i∈I(a), j∈I(b)} s1(i,j)

Distributed shape (the "query-side small" contract of knn/ppr):
the seed in-neighborhoods I(a) are tiny (Σ|I(a)| rows) and broadcast;
the HEAVY part — cocit(i,j) for every pair that can appear in some
I(a)×I(b) — streams through the cluster: edges into S = ∪I(a) are
selected by one broadcast-filter pass, wedge pairs within S are emitted
per src with a per-batch combiner, and the pair counts reduce through
sum_by_key_pair (the rel_cocitation machinery, restricted by the
broadcast semi-join instead of materializing the full quadratic
cocitation table). Driver memory is O(|S|² sparse pairs), bounded by
the seed contract, never O(V) or O(E).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import mix64, sum_by_key, sum_by_key_pair
from everythinggraph_ray.stages.edges import dedup_edges


def simrank2(
    edges: ray.data.Dataset,
    seeds: list[int],
    *,
    c: float = 0.8,
    round_to: int = 7,
) -> pd.DataFrame:
    """(seed_a, seed_b, simrank) for every seed pair a < b, two exact
    SimRank iterations over the distinct-edge graph. Seeds without
    in-edges score 0 against everything (the 1/(da·db) prefactor is
    vacuous); rounded to ``round_to`` decimals (the pagerank10 float
    device)."""
    sset = sorted(int(s) for s in seeds)
    e = dedup_edges(edges.select_columns(["src", "dst"]))

    # --- small side: seed in-neighborhoods (query-side small) ----------
    seed_arr = np.array(sset, dtype=np.int64)

    def into_seeds(batch: pa.Table) -> pa.Table:
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(np.isin(d, seed_arr)))

    ins = e.map_batches(into_seeds, batch_format="pyarrow").to_pandas()
    I = {s: np.unique(ins[ins["dst"] == s]["src"].to_numpy(np.int64)) for s in sset}
    S = np.unique(ins["src"].to_numpy(np.int64))
    if not len(S):
        return pd.DataFrame({"seed_a": [], "seed_b": [], "simrank": []}).astype(
            {"seed_a": "int64", "seed_b": "int64", "simrank": "float64"}
        )
    s_ref = ray.put(S)

    # --- in-degrees for S (the s1 denominators) ------------------------
    def indeg_partial(batch: pa.Table) -> pa.Table:
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = d[np.isin(d, ray.get(s_ref))]
        u, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"vid": pa.array(u, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    ind = sum_by_key(
        e.map_batches(indeg_partial, batch_format="pyarrow"), "vid", ["n"],
        out_names=["indeg"],
    ).to_pandas()
    indeg = (
        dict(zip(ind["vid"].astype(np.int64), ind["indeg"].astype(np.int64)))
        if len(ind)  # empty datasets lose their schema
        else {}
    )

    # --- heavy side: cocit(i,j) for i<j within S via wedge pairs -------
    def wedges(batch: pa.Table) -> pa.Table:
        sv = ray.get(s_ref)
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(d, sv)
        s, d = s[keep], d[keep]
        # group by src within the batch, emit ordered pairs of dsts in S
        o = np.argsort(s, kind="stable")
        s, d = s[o], d[o]
        st = np.flatnonzero(np.r_[True, s[1:] != s[:-1]]) if len(s) else np.empty(0, np.int64)
        en = np.r_[st[1:], len(s)]
        ii, jj = [], []
        for a, b in zip(st, en):
            nb = np.unique(d[a:b])
            if len(nb) > 1:
                iu, ju = np.triu_indices(len(nb), k=1)
                ii.append(nb[iu])
                jj.append(nb[ju])
        if not ii:
            return pa.table(
                {"i": pa.array([], pa.int64()), "j": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        i = np.concatenate(ii)
        j = np.concatenate(jj)
        # per-batch combiner: collapse repeated (i, j) before the shuffle
        key = i * (2**32) + j  # vids < 2^31 by the engine-wide contract
        u, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {"i": pa.array((u // 2**32).astype(np.int64), pa.int64()),
             "j": pa.array((u % 2**32).astype(np.int64), pa.int64()),
             "n": pa.array(cnt, pa.int64())}
        )

    # NOTE: one src's edges may span batches — the per-batch wedge pairs
    # undercount cross-batch wedges. Route through a src-grouped pass:
    # bucket the S-filtered edges by src hash, group, THEN emit pairs.
    from everythinggraph_ray.stages.agg import bucketed_reduce

    def filt(batch: pa.Table) -> pa.Table:
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(np.isin(d, ray.get(s_ref))))

    es = e.map_batches(filt, batch_format="pyarrow")

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["src"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    cocit_parts = bucketed_reduce(es, bucket_of, wedges)
    cocit = sum_by_key_pair(cocit_parts, "i", "j", ["n"]).to_pandas()
    cc = (
        {
            (int(i), int(j)): int(n)
            for i, j, n in zip(cocit["i"], cocit["j"], cocit["n"])
        }
        if len(cocit)  # empty datasets lose their schema
        else {}
    )

    # --- driver assembly over seed pairs (O(Σ|I(a)|·|I(b)|) floats) ----
    def s1(i: int, j: int) -> float:
        if i == j:
            return 1.0
        a, b = (i, j) if i < j else (j, i)
        n = cc.get((a, b), 0)
        if not n:
            return 0.0
        return c * n / (indeg[a] * indeg[b])

    rows = []
    for x in range(len(sset)):
        for y in range(x + 1, len(sset)):
            a, b = sset[x], sset[y]
            Ia, Ib = I[a], I[b]
            if not len(Ia) or not len(Ib):
                continue  # no in-edges on one side: pair undefined (SQL drops it too)
            tot = float(np.sum([s1(int(i), int(j)) for i in Ia for j in Ib]))
            rows.append((a, b, round(c * tot / (len(Ia) * len(Ib)), round_to)))
    return pd.DataFrame(rows, columns=["seed_a", "seed_b", "simrank"]).astype(
        {"seed_a": "int64", "seed_b": "int64", "simrank": "float64"}
    )
