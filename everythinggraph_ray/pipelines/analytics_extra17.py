"""Analytics batch (session 12, first wave): a CSV source/sink
round-trip and a RANGE-interval window frame.

Distributed shapes:
- ``rel_edges_csv_roundtrip``: edge table -> ``Dataset.write_csv`` (one
  file per block, a fresh /tmp dir) -> ``ray.data.read_csv`` ->
  distributed aggregate (count / sums / dot). Proves the text
  source/sink path end-to-end; the oracle computes the same aggregate
  from the parquet directly, so any loss or corruption in the CSV hop
  breaks the hash. The reference's only I/O is the binary edge list
  (init_all.c:813-832) — CSV is the interchange format it lacks.
- ``events_range_window``: per-event sum/count of the same user's
  value-millis over the trailing 10-minute RANGE frame (equal-ts peers
  included, exactly SQL RANGE semantics). One bucketed co-group by
  user hash; inside a bucket each user's slab is sorted by ts once,
  prefixed (exact int64 cumsum), and both frame edges resolve with
  vectorized ``np.searchsorted`` — no per-row work, no global sort.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

ANALYTICS17_QUERIES: dict = {}
ANALYTICS17_ORACLES: dict = {}

RANGE_WINDOW_US = 10 * 60 * 1_000_000  # 10 minutes in microseconds


# ----------------------------------------------------------------------
# CSV source/sink round-trip
# ----------------------------------------------------------------------
def q_rel_edges_csv_roundtrip(sf_dir):
    """(n_edges, sum_src, sum_dst, sum_prod): the rel edge table written
    to CSV (fresh /tmp dir, one file per block) and read back with
    ``ray.data.read_csv``, then aggregated distributed (per-batch
    partials + a 4-scalar fold). Exactly the parquet-side aggregate iff
    the CSV hop is lossless."""
    from everythinggraph_ray.pipelines.queries import _typed_collect, rel_edges

    out_dir = tempfile.mkdtemp(prefix="egr_csv_", dir="/tmp")
    try:
        rel_edges(sf_dir).write_csv(out_dir)
        back = ray.data.read_csv(out_dir)

        def partial(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "n_edges": pa.array([np.int64(len(s))], pa.int64()),
                    "sum_src": pa.array([s.sum()], pa.int64()),
                    "sum_dst": pa.array([d.sum()], pa.int64()),
                    "sum_prod": pa.array([(s * d).sum()], pa.int64()),
                }
            )

        df = back.map_batches(partial, batch_format="pyarrow").to_pandas()
        out = df.sum().to_frame().T.astype("int64")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return _typed_collect(
        ray.data.from_pandas(out),
        {"n_edges": "int64", "sum_src": "int64", "sum_dst": "int64", "sum_prod": "int64"},
    )


ANALYTICS17_QUERIES["rel_edges_csv_roundtrip"] = q_rel_edges_csv_roundtrip


def _csv_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    return (
        f"SELECT CAST(count(*) AS BIGINT) AS n_edges, "
        "CAST(SUM(src) AS BIGINT) AS sum_src, CAST(SUM(dst) AS BIGINT) AS sum_dst, "
        f"CAST(SUM(src * dst) AS BIGINT) AS sum_prod FROM ({SQL_REL_EDGES})"
    )


ANALYTICS17_ORACLES["rel_edges_csv_roundtrip"] = _csv_sql()


# ----------------------------------------------------------------------
# RANGE-interval window frame (trailing 10 minutes per user)
# ----------------------------------------------------------------------
def q_events_range_window(sf_dir):
    """(event_id, user_id, win_sum_milli, win_cnt): for every event, the
    sum of value-millis and row count over the SAME USER's events with
    ts in [ts - 10min, ts] — SQL's RANGE BETWEEN INTERVAL 10 MINUTES
    PRECEDING AND CURRENT ROW, equal-ts peers included. Bucketed by
    user hash; per-user sorted slab + int64 prefix sums + two
    searchsorted probes resolve every frame vectorized."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def prep(t: pa.Table) -> pa.Table:
        v = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pa.array(ts, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    tagged = ev.map_batches(prep, batch_format="pyarrow")

    def user_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def frames(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((ts, u))
        u, ts, v, eid = u[o], ts[o], v[o], eid[o]
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1, len(u)]
        win_sum = np.empty(len(u), np.int64)
        win_cnt = np.empty(len(u), np.int64)
        for i in range(len(starts) - 1):
            lo, hi = starts[i], starts[i + 1]
            seg_ts = ts[lo:hi]
            pref = np.r_[np.int64(0), np.cumsum(v[lo:hi])]
            end = np.searchsorted(seg_ts, seg_ts, side="right")
            beg = np.searchsorted(seg_ts, seg_ts - RANGE_WINDOW_US, side="left")
            win_sum[lo:hi] = pref[end] - pref[beg]
            win_cnt[lo:hi] = end - beg
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "win_sum_milli": pa.array(win_sum, pa.int64()),
                "win_cnt": pa.array(win_cnt, pa.int64()),
            }
        )

    res = bucketed_reduce(tagged, user_bucket, frames)
    return _typed_collect(
        res,
        {
            "event_id": "int64",
            "user_id": "int64",
            "win_sum_milli": "int64",
            "win_cnt": "int64",
        },
    )


ANALYTICS17_QUERIES["events_range_window"] = q_events_range_window

ANALYTICS17_ORACLES["events_range_window"] = (
    "SELECT event_id, user_id, "
    "CAST(SUM(v) OVER w AS BIGINT) AS win_sum_milli, "
    "CAST(COUNT(*) OVER w AS BIGINT) AS win_cnt "
    "FROM (SELECT event_id, user_id, ts, "
    "CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v FROM events) "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts "
    "RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)"
)
