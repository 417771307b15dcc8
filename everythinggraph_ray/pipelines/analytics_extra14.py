"""Analytics batch (session 11, second wave): shortest-path counting
(the sigma semiring as a first-class engine kernel), bond-percolation
component sweep, and exact per-group trimmed means.

Distributed shapes:
- ``rel_sp_counts``: single-source shortest-path COUNTS via
  ``PathCountBFSKernel`` — the engine's first SUM-combine FRONTIER
  kernel (synchronous BFS delivers every sigma contribution to a layer
  in one round, so the sum-combined message total IS sigma). Runs over
  the DEDUPED simple digraph (sigma is defined on distinct edges;
  multiplicity would double-count paths).
- ``rel_percolation``: bond percolation over the synthesized edge
  weights (src%10 + dst%10 in 0..18) — WCC at three weight thresholds,
  each a filtered build + the distributed WCCKernel; vertices whose
  edges all fall below a threshold are singleton components, counted
  via the one full-universe distinct-vid count (never re-seeded into
  the engine). The classic percolation read: components merge as the
  threshold drops.
- ``lineitem_trimmed_mean``: exact 10%-trimmed mean of l_quantity per
  returnflag over the bounded value histogram (same fold as the
  weighted median; qty cardinality is 50) — k = n//10 rows clipped off
  each tail by cumulative-count window arithmetic, mean in exact
  integer milli (all-positive, so trunc == floor on both grids).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.graph.build import build_graph
from everythinggraph_ray.graph.kernels import PathCountBFSKernel, WCCKernel

ANALYTICS14_QUERIES: dict = {}
ANALYTICS14_ORACLES: dict = {}

SP_LEVELS = 12  # sigma unroll cap, asserted against the engine's max level
PERC_THRESHOLDS = (5, 9, 13)


# ----------------------------------------------------------------------
# shortest-path counting (sigma) kernel
# ----------------------------------------------------------------------
def q_rel_sp_counts(sf_dir):
    """(vid, dist, nsp): hop distance from the min-vid root (rel_bfs
    conventions — root 1, unreached 0) and the number of distinct
    shortest paths from the root, over the deduped simple digraph."""
    from everythinggraph_ray.pipelines.queries import (
        _rel_root,
        _run_engine,
        rel_edges,
    )
    from everythinggraph_ray.pipelines.flagship import build_dir_for
    from everythinggraph_ray.stages.edges import dedup_edges

    bdir = build_dir_for(f"relsp|{sf_dir}", 8)
    build_graph(dedup_edges(rel_edges(sf_dir)), bdir, num_partitions=8, hub_threshold=10**9)
    df = _run_engine(bdir, PathCountBFSKernel(_rel_root(sf_dir)))
    dist, nsp = PathCountBFSKernel.decode(df["sp_counts"].to_numpy())
    if len(dist) and int(dist.max()) > SP_LEVELS:
        raise ValueError(
            f"sp_counts reached level {int(dist.max())} > SP_LEVELS={SP_LEVELS}; "
            "bump the oracle unroll"
        )
    return pd.DataFrame(
        {"vid": df["vid"].astype("int64"), "dist": dist, "nsp": nsp}
    ).astype("int64")


ANALYTICS14_QUERIES["rel_sp_counts"] = q_rel_sp_counts


def _sp_counts_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    ctes = [
        f"e AS ({SQL_REL_EDGES})",
        "de AS MATERIALIZED (SELECT DISTINCT src, dst FROM e WHERE src <> dst)",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM "
        "(SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "root AS (SELECT min(vid) AS rv FROM verts)",
        "r(vid, d) AS (SELECT rv, CAST(1 AS BIGINT) FROM root UNION "
        "SELECT de.dst, r.d + 1 FROM r JOIN de ON de.src = r.vid WHERE r.d < 64)",
        "m AS MATERIALIZED (SELECT vid, min(d) AS d FROM r GROUP BY vid)",
        "s1 AS MATERIALIZED (SELECT rv AS vid, CAST(1 AS BIGINT) AS sig FROM root)",
    ]
    for lvl in range(2, SP_LEVELS + 1):
        ctes.append(
            f"s{lvl} AS MATERIALIZED (SELECT m.vid, CAST(SUM(s{lvl - 1}.sig) AS BIGINT) AS sig "
            f"FROM s{lvl - 1} JOIN de ON de.src = s{lvl - 1}.vid "
            f"JOIN m ON m.vid = de.dst AND m.d = {lvl} GROUP BY m.vid)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, SP_LEVELS + 1))
    return (
        "WITH RECURSIVE "
        + ", ".join(ctes)
        + f", allsig AS ({union}) "
        "SELECT v.vid, COALESCE(m.d, 0) AS dist, COALESCE(a.sig, 0) AS nsp "
        "FROM verts v LEFT JOIN m ON m.vid = v.vid "
        "LEFT JOIN allsig a ON a.vid = v.vid"
    )


ANALYTICS14_ORACLES["rel_sp_counts"] = _sp_counts_sql()


# ----------------------------------------------------------------------
# bond percolation sweep
# ----------------------------------------------------------------------
def q_rel_percolation(sf_dir):
    """(threshold, n_components, max_size) of the undirected rel graph
    restricted to edges with synthesized weight src%10 + dst%10 >=
    threshold; the vertex universe stays the FULL graph's, so vertices
    stranded by the filter count as singletons."""
    from ray.data.aggregate import Count

    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.pipelines.queries import _typed_collect, rel_edges
    from everythinggraph_ray.pipelines.flagship import build_dir_for
    from everythinggraph_ray.stages.edges import undirect_edges

    from everythinggraph_ray.stages.agg import sum_by_key

    def nvids(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table(
            {"vid": pa.array(u, pa.int64()), "one": pa.array(np.ones(len(u), np.int64))}
        )

    # full-universe distinct-vid COUNT, no O(V) driver pull: per-batch
    # unique partials -> bucketed distinct -> count()
    v_total = int(
        sum_by_key(
            rel_edges(sf_dir).map_batches(nvids, batch_format="pyarrow"), "vid", ["one"]
        ).count()
    )

    rows = []
    for t in PERC_THRESHOLDS:

        def keep(tab: pa.Table, thr=t) -> pa.Table:
            s = tab["src"].to_numpy(zero_copy_only=False)
            d = tab["dst"].to_numpy(zero_copy_only=False)
            return tab.filter(pa.array(((s % 10 + d % 10) >= thr) & (s != d)))

        filtered = rel_edges(sf_dir).map_batches(keep, batch_format="pyarrow")
        bdir = build_dir_for(f"relperc{t}|{sf_dir}", 8)
        build_graph(undirect_edges(filtered), bdir, num_partitions=8, hub_threshold=10**9)
        eng = GraphEngine(bdir)
        try:
            ds = eng.run(WCCKernel())["dataset"]
            sizes = ds.groupby("wcc").aggregate(Count(alias_name="sz")).materialize()
            n_comp = sizes.count()
            max_sz = int(sizes.max("sz")) if n_comp else 0
            v_build = int(sizes.sum("sz")) if n_comp else 0
        finally:
            eng.shutdown()
        singles = v_total - v_build
        rows.append((t, n_comp + singles, max(max_sz, 1) if singles else max_sz))

    out = pd.DataFrame(rows, columns=["threshold", "n_components", "max_size"]).astype(
        "int64"
    )
    return _typed_collect(
        ray.data.from_pandas(out),
        {"threshold": "int64", "n_components": "int64", "max_size": "int64"},
    )


ANALYTICS14_QUERIES["rel_percolation"] = q_rel_percolation


def _percolation_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    ctes = [
        f"e AS ({SQL_REL_EDGES})",
        "verts AS (SELECT DISTINCT vid FROM "
        "(SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
    ]
    selects = []
    for t in PERC_THRESHOLDS:
        ctes.append(
            f"und{t} AS (SELECT src AS u, dst AS v FROM e "
            f"WHERE src <> dst AND (src % 10 + dst % 10) >= {t} "
            f"UNION SELECT dst AS u, src AS v FROM e "
            f"WHERE src <> dst AND (src % 10 + dst % 10) >= {t})"
        )
        ctes.append(
            f"r{t}(vid, lab) AS (SELECT vid, vid FROM verts UNION "
            f"SELECT und{t}.v, r{t}.lab FROM r{t} JOIN und{t} ON und{t}.u = r{t}.vid "
            f"WHERE r{t}.lab < und{t}.v)"
        )
        ctes.append(
            f"sz{t} AS (SELECT c, count(*) AS s FROM "
            f"(SELECT vid, min(lab) AS c FROM r{t} GROUP BY vid) GROUP BY c)"
        )
        selects.append(
            f"SELECT CAST({t} AS BIGINT) AS threshold, "
            f"CAST(count(*) AS BIGINT) AS n_components, "
            f"CAST(max(s) AS BIGINT) AS max_size FROM sz{t}"
        )
    return "WITH RECURSIVE " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


ANALYTICS14_ORACLES["rel_percolation"] = _percolation_sql()


# ----------------------------------------------------------------------
# exact trimmed mean over the bounded value histogram
# ----------------------------------------------------------------------
def q_lineitem_trimmed_mean(sf_dir):
    """10%-trimmed mean of l_quantity per returnflag in exact integer
    milli: k = n//10 rows clipped off EACH ordered tail, mean over the
    kept mass. Histogram fold (bounded cardinality) + window arithmetic
    on the driver's tiny table."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity"],
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "q": np.floor(
                    t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
                ).astype(np.int64),
            }
        )
        g = df.groupby(["l_returnflag", "q"], as_index=False).size()
        g = g.rename(columns={"size": "c"})
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        li.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["l_returnflag", "q"], as_index=False)["c"]
        .sum()
        .sort_values(["l_returnflag", "q"])
        .reset_index(drop=True)
    )
    cum = hist.groupby("l_returnflag")["c"].cumsum().to_numpy(np.int64)
    n = hist.groupby("l_returnflag")["c"].transform("sum").to_numpy(np.int64)
    c = hist["c"].to_numpy(np.int64)
    k = n // 10
    kept = np.clip(np.minimum(cum, n - k) - np.maximum(cum - c, k), 0, None)
    hist["kept"] = kept
    hist["kq"] = kept * hist["q"].to_numpy(np.int64)
    g = hist.groupby("l_returnflag", as_index=False).agg(
        n_kept=("kept", "sum"), kq=("kq", "sum")
    )
    g["trimmed_mean_milli"] = (1000 * g["kq"]) // g["n_kept"]
    out = g[["l_returnflag", "trimmed_mean_milli", "n_kept"]].astype(
        {"trimmed_mean_milli": "int64", "n_kept": "int64"}
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


ANALYTICS14_QUERIES["lineitem_trimmed_mean"] = q_lineitem_trimmed_mean
ANALYTICS14_ORACLES["lineitem_trimmed_mean"] = (
    "WITH h AS (SELECT l_returnflag, CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q, "
    "CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1, 2), "
    "w AS (SELECT l_returnflag, q, c, "
    "SUM(c) OVER (PARTITION BY l_returnflag ORDER BY q) AS cum, "
    "SUM(c) OVER (PARTITION BY l_returnflag) AS n FROM h), "
    "k AS (SELECT l_returnflag, q, "
    "GREATEST(LEAST(cum, n - n // 10) - GREATEST(cum - c, n // 10), 0) AS kept FROM w) "
    "SELECT l_returnflag, "
    "CAST((1000 * SUM(kept * q)) // SUM(kept) AS BIGINT) AS trimmed_mean_milli, "
    "CAST(SUM(kept) AS BIGINT) AS n_kept FROM k GROUP BY 1"
)
