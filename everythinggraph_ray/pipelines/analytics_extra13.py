"""Analytics batch (session 11, first wave): 1-WL color refinement,
weighted median, and the bipartite (Robins-Alexander) clustering
coefficient.

Distributed shapes:
- ``rel_wl_colors``: 1-dimensional Weisfeiler-Leman color refinement
  (3 rounds) over the undirected simple rel graph. Canonical colors are
  MIN-VID representatives: round signature = old color + ',' -joined
  sorted neighbor-color multiset (a string both numpy and DuckDB build
  identically), new color = min vid over the signature class. Per
  round: ONE hash_join (neighbor colors onto edges), ONE bucketed
  co-group by vertex (signature build), ONE bucketed co-group by
  signature hash (min-vid relabel). The V-sized color table is
  materialized between rounds (bounded per-vertex state, the same
  footprint the graph engine pins in actors) so round k+1's lineage
  does not recompute rounds 1..k repeatedly; the E-sized undirected
  edge table is materialized ONCE and reused by all rounds.
- ``lineitem_weighted_median``: exact weighted (lower) median of
  l_quantity per returnflag, weight = extendedprice cents. The
  distributed part is the value-histogram fold (per-batch
  (flag, qty) -> weight partials; qty cardinality is bounded at 50 by
  TPC-H, so the fold output is tiny no matter the input scale); the
  cumulative-gate selection runs on the driver's <=150-row histogram.
- ``supplier_part_cc``: the Robins-Alexander global bipartite
  clustering coefficient 4*C4/L3 over the DISTINCT supplier-part
  incidence graph. L3 (3-paths) folds as sum((deg_s-1)*(deg_p-1)) over
  edges - each 3-path is counted exactly once at its unique middle
  edge - via two degree hash_joins. C4 (butterflies) groups on the
  LOW-degree side (parts, ~26 suppliers each, vs ~520 parts per
  supplier), emitting supplier co-pair counts from a part-bucketed
  co-group with a per-bucket combiner before the packed-pair shuffle;
  butterflies = sum C(codeg, 2). All surfaced values are int64
  (cc in exact ppm), so the driver hash is order-proof.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import (
    bucketed_reduce,
    mix64,
    sum_by_key,
    sum_by_key_pair,
)

ANALYTICS13_QUERIES: dict = {}
ANALYTICS13_ORACLES: dict = {}

WL_ROUNDS = 3


# ----------------------------------------------------------------------
# 1-WL color refinement (min-vid canonical colors, 3 rounds)
# ----------------------------------------------------------------------
def q_rel_wl_colors(sf_dir):
    """1-WL (color refinement) over the undirected simple rel graph:
    c0 = 0 everywhere; each round, sig(v) = c(v) || '|' || sorted
    neighbor-color list, c'(v) = min vid of v's signature class. After
    3 rounds vertices with different colors are distinguishable by any
    message-passing GNN of depth 3 (the WL hierarchy). Vertex universe
    includes self-loop-only vertices (loops dropped from adjacency)."""
    from everythinggraph_ray.pipelines.queries import REL_V, _typed_collect, rel_edges
    from everythinggraph_ray.stages.edges import dedup_edges, undirect_edges

    raw = rel_edges(sf_dir)

    def nonloop(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(s != d))

    # E-sized, reused by every round: materialize ONCE (same rationale
    # as the graph build's partition spill)
    ue = dedup_edges(
        undirect_edges(raw.map_batches(nonloop, batch_format="pyarrow"))
    ).materialize()

    def vids(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"vid": pa.array(u, pa.int64()), "one": pa.array(np.ones(len(u), np.int64))})

    verts = sum_by_key(raw.map_batches(vids, batch_format="pyarrow"), "vid", ["one"])

    def init_c(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": t["vid"], "c": pa.array(np.zeros(t.num_rows, np.int64), pa.int64())}
        )

    # V-sized per-round state: materialized between rounds (bounded,
    # per-vertex - the actor-resident-state analogue), else round k's
    # lineage re-executes all earlier rounds on every reuse
    colors = verts.map_batches(init_c, batch_format="pyarrow").materialize()

    def vid_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["src"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def build_sigs(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        own = df[df["own"] == 1].set_index("src")["c"].astype(str)
        nbr = df[df["own"] == 0].sort_values(["src", "c"], kind="stable")
        agg = nbr.groupby("src", sort=False)["c"].agg(lambda s: ",".join(map(str, s)))
        sig = own + "|" + agg.reindex(own.index).fillna("")
        return pa.table(
            {
                "vid": pa.array(sig.index.to_numpy(np.int64), pa.int64()),
                "sig": pa.array(sig.to_numpy(object), pa.string()),
            }
        )

    def sig_bucket(t: pa.Table) -> np.ndarray:
        from pandas.util import hash_pandas_object

        h = hash_pandas_object(t["sig"].to_pandas(), index=False).to_numpy(np.uint64)
        return (h & np.uint64(0x7FFFFFFF)).astype(np.int64)

    def relabel(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        c = df.groupby("sig", sort=False)["vid"].transform("min")
        return pa.table(
            {
                "vid": pa.array(df["vid"].to_numpy(np.int64), pa.int64()),
                "c": pa.array(c.to_numpy(np.int64), pa.int64()),
            }
        )

    for _ in range(WL_ROUNDS):
        nbr = hash_join(ue, colors, on="dst", right_on="vid", right_cols=["c"])

        def tag_nbr(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": t["src"],
                    "c": t["c"],
                    "own": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                }
            )

        def tag_own(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": t["vid"],
                    "c": t["c"],
                    "own": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                }
            )

        tagged = nbr.map_batches(tag_nbr, batch_format="pyarrow").union(
            colors.map_batches(tag_own, batch_format="pyarrow")
        )
        sigs = bucketed_reduce(tagged, vid_bucket, build_sigs)
        colors = bucketed_reduce(sigs, sig_bucket, relabel).materialize()

    def final(t: pa.Table) -> pa.Table:
        return pa.table({"vid": t["vid"], "color": t["c"]})

    out = colors.map_batches(final, batch_format="pyarrow")
    assert REL_V < (1 << 31)
    return _typed_collect(out, {"vid": "int64", "color": "int64"})


ANALYTICS13_QUERIES["rel_wl_colors"] = q_rel_wl_colors


def _wl_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    parts = [
        f"WITH e0 AS ({SQL_REL_EDGES}), ",
        "verts AS (SELECT DISTINCT src AS v FROM e0 UNION SELECT DISTINCT dst FROM e0), ",
        "ue AS (SELECT DISTINCT u, w FROM ("
        "SELECT src AS u, dst AS w FROM e0 WHERE src <> dst "
        "UNION ALL SELECT dst AS u, src AS w FROM e0 WHERE src <> dst)), ",
        "c0 AS (SELECT v, CAST(0 AS BIGINT) AS c FROM verts), ",
    ]
    for r in range(1, WL_ROUNDS + 1):
        parts.append(
            f"s{r} AS (SELECT c.v AS v, CAST(c.c AS VARCHAR) || '|' || "
            "COALESCE(string_agg(CAST(n.c AS VARCHAR), ',' ORDER BY n.c), '') AS sig "
            f"FROM c{r - 1} c LEFT JOIN ue ON ue.u = c.v "
            f"LEFT JOIN c{r - 1} n ON n.v = ue.w GROUP BY c.v, c.c), "
        )
        parts.append(f"c{r} AS (SELECT v, MIN(v) OVER (PARTITION BY sig) AS c FROM s{r}), ")
    sql = "".join(parts).rstrip(", ")
    return sql + f" SELECT v AS vid, CAST(c AS BIGINT) AS color FROM c{WL_ROUNDS}"


ANALYTICS13_ORACLES["rel_wl_colors"] = _wl_sql()


# ----------------------------------------------------------------------
# weighted median (per-group, exact over a bounded value histogram)
# ----------------------------------------------------------------------
def q_lineitem_weighted_median(sf_dir):
    """Weighted LOWER median of l_quantity per returnflag, weighted by
    extendedprice cents: smallest q with 2*cumweight(q) >= totalweight.
    Distributed: per-batch (flag, qty) weight partials (qty cardinality
    is 50, so partials stay tiny at any scale); the gate runs on the
    driver's bounded histogram."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "q": np.floor(
                    t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
                ).astype(np.int64),
                "wt": np.floor(
                    t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
                ).astype(np.int64),
            }
        )
        g = df.groupby(["l_returnflag", "q"], as_index=False)["wt"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        li.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["l_returnflag", "q"], as_index=False)["wt"]
        .sum()
        .sort_values(["l_returnflag", "q"])
        .reset_index(drop=True)
    )
    cum = hist.groupby("l_returnflag")["wt"].cumsum()
    tot = hist.groupby("l_returnflag")["wt"].transform("sum")
    sel = (
        hist[2 * cum >= tot]
        .groupby("l_returnflag", as_index=False)
        .agg(wmedian_qty=("q", "min"))
    )
    wtot = (
        hist.groupby("l_returnflag", as_index=False)["wt"]
        .sum()
        .rename(columns={"wt": "weight_cents"})
    )
    out = sel.merge(wtot, on="l_returnflag").astype(
        {"wmedian_qty": "int64", "weight_cents": "int64"}
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


ANALYTICS13_QUERIES["lineitem_weighted_median"] = q_lineitem_weighted_median
ANALYTICS13_ORACLES["lineitem_weighted_median"] = (
    "WITH w AS (SELECT l_returnflag, "
    "CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q, "
    "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS wt "
    "FROM lineitem GROUP BY 1, 2), "
    "c AS (SELECT l_returnflag, q, wt, "
    "SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY q) AS cum, "
    "SUM(wt) OVER (PARTITION BY l_returnflag) AS tot FROM w) "
    "SELECT l_returnflag, CAST(MIN(q) AS BIGINT) AS wmedian_qty, "
    "CAST(MAX(tot) AS BIGINT) AS weight_cents "
    "FROM c WHERE 2 * cum >= tot GROUP BY 1"
)


# ----------------------------------------------------------------------
# bipartite clustering coefficient (Robins-Alexander 4*C4/L3)
# ----------------------------------------------------------------------
def q_supplier_part_cc(sf_dir):
    """Global bipartite clustering of the distinct supplier-part
    incidence graph: cc = 4 * butterflies / paths3 in exact ppm.
    Butterflies group on the low-degree side (parts) with a per-bucket
    pair combiner; 3-paths fold at their unique middle edge.
    Precondition: suppkey < 2^31 (packed supplier pairs)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_suppkey", "l_partkey"]
    )

    def tag(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "s": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "p": t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        ).drop_duplicates()
        if len(df) and df["s"].max() >= (1 << 31):
            raise ValueError("supplier_part_cc packs suppkeys into 31 bits")
        df["one"] = np.int64(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    # global distinct incidence edges (cnt collapses multiplicity)
    edges = sum_by_key_pair(li.map_batches(tag, batch_format="pyarrow"), "s", "p", ["one"])

    def renorm(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s": t["s"], "p": t["p"], "one": pa.array(np.ones(t.num_rows, np.int64))}
        )

    edges = edges.map_batches(renorm, batch_format="pyarrow").materialize()
    deg_s = sum_by_key(edges, "s", ["one"], out_names=["d_s"])
    deg_p = sum_by_key(edges, "p", ["one"], out_names=["d_p"])

    with_deg = hash_join(
        hash_join(edges, deg_s, on="s", right_cols=["d_s"]),
        deg_p,
        on="p",
        right_cols=["d_p"],
    )

    def l3_partial(t: pa.Table) -> pa.Table:
        ds_ = t["d_s"].to_numpy(zero_copy_only=False)
        dp_ = t["d_p"].to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array([int(((ds_ - 1) * (dp_ - 1)).sum())], pa.int64())})

    paths3 = int(with_deg.map_batches(l3_partial, batch_format="pyarrow").sum("x") or 0)

    def part_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["p"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def emit_pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas()[["s", "p"]]
        m = df.merge(df, on="p", suffixes=("_x", "_y"))
        m = m[m["s_x"] < m["s_y"]]
        pk = (m["s_x"].to_numpy(np.int64) << np.int64(31)) | m["s_y"].to_numpy(np.int64)
        u, cnt = np.unique(pk, return_counts=True)  # per-bucket combiner
        return pa.table(
            {"pk": pa.array(u, pa.int64()), "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    co = sum_by_key(bucketed_reduce(edges, part_bucket, emit_pairs), "pk", ["c"])

    def bf_partial(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array([int((c * (c - 1) // 2).sum())], pa.int64())})

    butterflies = int(co.map_batches(bf_partial, batch_format="pyarrow").sum("x") or 0)
    cc_ppm = (4_000_000 * butterflies) // paths3 if paths3 > 0 else 0
    out = pd.DataFrame(
        {
            "butterflies": [butterflies],
            "paths3": [paths3],
            "cc_ppm": [cc_ppm],
        }
    ).astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {"butterflies": "int64", "paths3": "int64", "cc_ppm": "int64"},
    )


ANALYTICS13_QUERIES["supplier_part_cc"] = q_supplier_part_cc
ANALYTICS13_ORACLES["supplier_part_cc"] = (
    "WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem), "
    "dsdeg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1), "
    "dpdeg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1), "
    "l3 AS (SELECT CAST(COALESCE(SUM((dsdeg.d - 1) * (dpdeg.d - 1)), 0) AS BIGINT) AS paths3 "
    "FROM e JOIN dsdeg USING (s) JOIN dpdeg USING (p)), "
    "co AS (SELECT e1.s AS s1, e2.s AS s2, CAST(COUNT(*) AS BIGINT) AS c "
    "FROM e e1 JOIN e e2 ON e1.p = e2.p AND e1.s < e2.s GROUP BY 1, 2), "
    "bf AS (SELECT CAST(COALESCE(SUM((c * (c - 1)) // 2), 0) AS BIGINT) AS butterflies FROM co) "
    "SELECT bf.butterflies AS butterflies, l3.paths3 AS paths3, "
    "CAST(CASE WHEN l3.paths3 > 0 THEN (4000000 * bf.butterflies) // l3.paths3 "
    "ELSE 0 END AS BIGINT) AS cc_ppm FROM bf, l3"
)
