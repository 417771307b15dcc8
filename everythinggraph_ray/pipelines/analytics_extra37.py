"""Analytics batch (session 12, twenty-first wave): BFS level profile
and the PageRank convergence curve.

Distributed shapes:
- ``rel_bfs_profile``: the per-level frontier-size printout of the
  reference (bfs_simple.c:223 prints each iteration's frontier size)
  as a checked table — (dist, n_vertices) from the engine BFS run,
  histogrammed distributed. The oracle recomputes it from the same
  recursive min-dist CTE as ``rel_bfs``.
- ``rel_pagerank_curve``: the engine's per-superstep convergence
  observability — (iteration, max_delta_e12) of the to-1e-6 PageRank
  run on the rel graph, straight from the engine's superstep metrics
  (the timed-phase surface the reference prints per iteration,
  pagerank_simple.c:115-130). Rows-only (to-convergence iteration has
  no SQL form); pytest asserts the tail is below tolerance, the curve
  is eventually decreasing, and the final ranks match the serial
  oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

ANALYTICS37_QUERIES: dict = {}
ANALYTICS37_ORACLES: dict = {}


# ----------------------------------------------------------------------
# BFS level profile
# ----------------------------------------------------------------------
def q_rel_bfs_profile(sf_dir):
    """(dist, n_vertices): how many vertices sit at each BFS level from
    the min-vid root (0 = unreached, per the reference's dist init)."""
    from everythinggraph_ray.graph.kernels import BFSKernel
    from everythinggraph_ray.pipelines.queries import (
        _rel_build,
        _rel_root,
        _run_engine,
        _typed_collect,
    )

    df = _run_engine(_rel_build(sf_dir), BFSKernel(_rel_root(sf_dir)))
    prof = (
        df.groupby("bfs", as_index=False)
        .size()
        .rename(columns={"bfs": "dist", "size": "n_vertices"})
        .astype("int64")
    )
    return _typed_collect(
        ray.data.from_pandas(prof), {"dist": "int64", "n_vertices": "int64"}
    )


ANALYTICS37_QUERIES["rel_bfs_profile"] = q_rel_bfs_profile


def _bfs_profile_sql() -> str:
    from everythinggraph_ray.pipelines.queries import _sql_graph_prelude

    return (
        "WITH RECURSIVE "
        + _sql_graph_prelude()
        + ", root AS (SELECT min(vid) AS rv FROM verts)"
        ", r(vid, d) AS (SELECT rv, CAST(1 AS BIGINT) FROM root UNION "
        "SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.vid WHERE r.d < 64), "
        "dist AS (SELECT v.vid, coalesce(m.d, 0) AS d FROM verts v "
        "LEFT JOIN (SELECT vid, min(d) AS d FROM r GROUP BY vid) m ON m.vid = v.vid) "
        "SELECT CAST(d AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n_vertices "
        "FROM dist GROUP BY 1"
    )


ANALYTICS37_ORACLES["rel_bfs_profile"] = _bfs_profile_sql()


# ----------------------------------------------------------------------
# PageRank convergence curve
# ----------------------------------------------------------------------
def q_rel_pagerank_curve(sf_dir):
    """(iteration, max_delta_e12): the engine's per-superstep max|Δ|
    (scaled 1e12, rounded) for the to-1e-6 PageRank run."""
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import PageRankKernel
    from everythinggraph_ray.pipelines.queries import _rel_build, _typed_collect

    eng = GraphEngine(_rel_build(sf_dir))
    try:
        res = eng.run(PageRankKernel(), tol=1e-6)
        rows = [
            (i + 1, int(round(m["delta"] * 1e12)))
            for i, m in enumerate(res["metrics"])
            if m.get("delta") is not None
        ]
    finally:
        eng.shutdown()
    out = pd.DataFrame(rows, columns=["iteration", "max_delta_e12"]).astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out), {"iteration": "int64", "max_delta_e12": "int64"}
    )


ANALYTICS37_QUERIES["rel_pagerank_curve"] = q_rel_pagerank_curve
# no SQL oracle: a to-convergence iteration count has no SQL form; the
# pytest asserts tolerance, eventual decrease and final-rank equality
# with the serial oracle.
