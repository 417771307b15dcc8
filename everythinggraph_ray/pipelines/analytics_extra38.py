"""Analytics batch (session 12, twenty-second wave): component-size
and session-length histograms.

Distributed shapes:
- ``rel_wcc_profile``: the component-SIZE distribution (size,
  n_components) of the undirected rel graph — the richer form of the
  reference's WCC destruct printout (wcc.c:168-179 prints only count
  and max size): the engine WCC labels histogram twice (per-label
  sizes via one bucketed sum, then the size histogram on the bounded
  label table).
- ``events_session_length_hist``: (session_len, n_sessions) over
  30-minute-gap sessions — the engagement-depth distribution; per-user
  slab gap detection (the sessions device) + size histogram partials.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, sum_by_key

ANALYTICS38_QUERIES: dict = {}
ANALYTICS38_ORACLES: dict = {}

SESSION_GAP_US = 1_800_000_000  # 30 minutes


# ----------------------------------------------------------------------
# WCC component-size histogram
# ----------------------------------------------------------------------
def q_rel_wcc_profile(sf_dir):
    """(comp_size, n_components): how many weak components have each
    size."""
    from everythinggraph_ray.graph.kernels import WCCKernel
    from everythinggraph_ray.pipelines.queries import (
        _rel_build,
        _run_engine,
        _typed_collect,
    )

    df = _run_engine(_rel_build(sf_dir, undirect=True), WCCKernel())
    sizes = df.groupby("wcc").size()
    prof = (
        sizes.value_counts()
        .rename_axis("comp_size")
        .reset_index(name="n_components")
        .sort_values("comp_size")
        .reset_index(drop=True)
        .astype("int64")
    )
    return _typed_collect(
        ray.data.from_pandas(prof), {"comp_size": "int64", "n_components": "int64"}
    )


ANALYTICS38_QUERIES["rel_wcc_profile"] = q_rel_wcc_profile


def _wcc_profile_sql() -> str:
    from everythinggraph_ray.pipelines.queries import _sql_graph_prelude

    return (
        "WITH RECURSIVE "
        + _sql_graph_prelude(undirect=True)
        + ", r(vid, lab) AS (SELECT vid, vid FROM verts UNION "
        "SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v), "
        "comp AS (SELECT vid, min(lab) AS c FROM r GROUP BY vid), "
        "sz AS (SELECT c, count(*) AS s FROM comp GROUP BY c) "
        "SELECT CAST(s AS BIGINT) AS comp_size, "
        "CAST(count(*) AS BIGINT) AS n_components FROM sz GROUP BY 1"
    )


ANALYTICS38_ORACLES["rel_wcc_profile"] = _wcc_profile_sql()


# ----------------------------------------------------------------------
# session-length histogram
# ----------------------------------------------------------------------
def q_events_session_length_hist(sf_dir):
    """(session_len, n_sessions): distribution of events-per-session
    under the 30-minute gap rule."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pa.array(ts, pa.int64()),
            }
        )

    def user_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def hist(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, ts, u))
        u, ts = u[o], ts[o]
        new = np.r_[True, (u[1:] != u[:-1]) | (np.diff(ts) > SESSION_GAP_US)]
        sid = np.cumsum(new) - 1
        lens = np.bincount(sid)
        sz, cnt = np.unique(lens, return_counts=True)
        return pa.table(
            {
                "session_len": pa.array(sz.astype(np.int64), pa.int64()),
                "n_sessions": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partial = bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"), user_bucket, hist)
    res = sum_by_key(partial, "session_len", ["n_sessions"])
    return _typed_collect(
        res, {"session_len": "int64", "n_sessions": "int64"}
    )


ANALYTICS38_QUERIES["events_session_length_hist"] = q_events_session_length_hist

ANALYTICS38_ORACLES["events_session_length_hist"] = (
    "WITH x AS (SELECT user_id, event_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
    f"OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US} THEN 1 ELSE 0 END AS ns "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "s AS (SELECT user_id, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM x), "
    "sz AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY 1, 2) "
    "SELECT CAST(n AS BIGINT) AS session_len, "
    "CAST(count(*) AS BIGINT) AS n_sessions FROM sz GROUP BY 1"
)
