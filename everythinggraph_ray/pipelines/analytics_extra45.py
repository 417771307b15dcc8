"""Analytics batch (session 12, twenty-ninth wave): greedy k-center.

Distributed shape:
- ``rel_kcenter4``: Gonzalez' greedy 2-approximation for k-center
  (k = 4) on the undirected rel graph with hop metric — seed at the
  min vid, then 3 rounds of: ONE engine pass of the new
  ``MultiSeedHopsKernel`` (min hop distance to the nearest current
  center — SSSPHopsKernel generalized to a seed set) and an argmax
  pick (farthest vertex; unreached counts as infinitely far; ties to
  the smallest vid). Output also carries each round's covering radius.
  The facility-location primitive built by composing the engine's
  min-semiring with a driver-side greedy — 4 engine runs total. The
  oracle unrolls 4 recursive BFS CTEs over the growing seed sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

ANALYTICS45_QUERIES: dict = {}
ANALYTICS45_ORACLES: dict = {}

KCENTER_K = 4


def q_rel_kcenter4(sf_dir):
    """(rnd, center_vid, radius_hops): the greedy centers in pick order
    and the covering radius after each pick (−1 while any vertex is
    unreachable from every center)."""
    from everythinggraph_ray.graph.kernels import UNREACHED, MultiSeedHopsKernel
    from everythinggraph_ray.pipelines.queries import (
        _rel_build,
        _rel_root,
        _run_engine,
        _typed_collect,
    )

    bdir = _rel_build(sf_dir, undirect=True)
    centers = [int(_rel_root(sf_dir))]
    rows = []
    for rnd in range(1, KCENTER_K + 1):
        df = _run_engine(bdir, MultiSeedHopsKernel(centers))
        d = df["multiseed_hops"].to_numpy(np.int64)
        vids = df["vid"].to_numpy(np.int64)
        unreached = d == UNREACHED
        radius = -1 if unreached.any() else int(d.max())
        rows.append((rnd, centers[-1], radius))
        if rnd < KCENTER_K:
            # farthest vertex, unreached first, ties to smallest vid
            order = np.lexsort((vids, -d.astype(np.float64), ~unreached))
            centers.append(int(vids[order[0]]))
    out = pd.DataFrame(rows, columns=["rnd", "center_vid", "radius_hops"]).astype(
        "int64"
    )
    return _typed_collect(
        ray.data.from_pandas(out),
        {"rnd": "int64", "center_vid": "int64", "radius_hops": "int64"},
    )


ANALYTICS45_QUERIES["rel_kcenter4"] = q_rel_kcenter4


def _kcenter_sql() -> str:
    from everythinggraph_ray.pipelines.queries import _sql_graph_prelude

    # seeds s1..s4 as CTEs; per round a recursive min-dist over und
    parts = [
        "WITH RECURSIVE "
        + _sql_graph_prelude(undirect=True)
        + ", s1 AS (SELECT min(vid) AS c FROM verts)"
    ]
    picks = ["(SELECT c FROM s1)"]
    for r in range(1, KCENTER_K + 1):
        seeds = " UNION ALL ".join(f"SELECT c FROM s{i}" for i in range(1, r + 1))
        parts.append(
            f", r{r}(vid, d) AS (SELECT c, CAST(0 AS BIGINT) FROM ({seeds}) "
            f"UNION SELECT und.v, r{r}.d + 1 FROM r{r} JOIN und ON und.u = r{r}.vid "
            f"WHERE r{r}.d < 64)"
        )
        parts.append(
            f", m{r} AS (SELECT v.vid, mm.d FROM verts v LEFT JOIN "
            f"(SELECT vid, min(d) AS d FROM r{r} GROUP BY vid) mm ON mm.vid = v.vid)"
        )
        parts.append(
            f", rad{r} AS (SELECT CASE WHEN SUM(CASE WHEN d IS NULL THEN 1 ELSE 0 END) > 0 "
            f"THEN -1 ELSE MAX(d) END AS radius FROM m{r})"
        )
        if r < KCENTER_K:
            parts.append(
                f", s{r + 1} AS (SELECT vid AS c FROM m{r} "
                "ORDER BY CASE WHEN d IS NULL THEN 1 ELSE 0 END DESC, d DESC, vid "
                "LIMIT 1)"
            )
            picks.append(f"(SELECT c FROM s{r + 1})")
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rnd, CAST({picks[r - 1]} AS BIGINT) AS center_vid, "
        f"CAST((SELECT radius FROM rad{r}) AS BIGINT) AS radius_hops"
        for r in range(1, KCENTER_K + 1)
    )
    return "".join(parts) + " " + selects


ANALYTICS45_ORACLES["rel_kcenter4"] = _kcenter_sql()
