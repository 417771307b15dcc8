"""Analytics batch (session 10, fourth wave): the INTERVAL family —
the three classic time-interval operators the engine lacked, each a
distributed shape with no SQL-window counterpart in the Dataset API:

- ``events_session_overlap``: the INTERVAL OVERLAP JOIN (a range join
  on [start, end] — the task-spec "range join" custom operator). Each
  session interval is replicated into every fixed-width time bucket it
  touches; inside one bucket every globally-overlapping partner is
  provably present, and each overlapping pair is attributed to exactly
  ONE bucket (the one holding max(st_a, st_b)), so partial counts sum
  with no dedup shuffle. Per-bucket counting is two searchsorted
  lookups per session — never a pairwise matrix.
- ``events_max_concurrency``: the SWEEP LINE — global maximum number
  of simultaneously-open sessions and the first instant it is
  attained. (+1 at start, −1 at end+1) deltas are pre-summed per
  distinct time point (sum_by_key), then the exact distributed PREFIX
  SCAN (stages/agg.py running_sum) produces the running concurrency;
  the max and its argmin reduce from per-batch partials.
- ``events_type_coverage``: INTERVAL UNION length — per event type,
  the total microseconds covered by the union of [ts, ts+5min)
  activity windows. Windows are CLIPPED to the time buckets they
  span, which makes buckets independent (union length is additive
  over a partition of the line), then each (type, bucket) cell does
  the sort + running-max island fold vectorized.

Every surfaced value is int64 epoch-microseconds / counts, so the
driver's value hash is summation-order-proof. Sessionization is the
30-minute-gap rule shared with q_events_sessions (queries.py:3060);
per-user events co-locate via one user-hash bucket co-group, and a
user's sessions are provably disjoint (next start > prev end + gap),
which is what lets the overlap join skip same-user exclusion.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, running_sum, sum_by_key

ANALYTICS11_QUERIES: dict = {}
ANALYTICS11_ORACLES: dict = {}

GAP_US = 1_800_000_000  # 30-min sessionization gap
BUCKET_US = 3_600_000_000  # 1-hour interval-join / coverage buckets
COVER_WIN_US = 300_000_000  # 5-min activity window per event

# Shared sessionization SQL prefix (gaps-and-islands), epoch-us grid.
_SESSIONS_SQL = (
    "WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events), "
    "o AS (SELECT user_id, t, CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL "
    f"OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > {GAP_US} THEN 1 ELSE 0 END AS ns FROM e), "
    "s0 AS (SELECT user_id, t, SUM(ns) OVER (PARTITION BY user_id ORDER BY t) AS sid FROM o), "
    "s AS (SELECT user_id, sid, min(t) AS st_us, max(t) AS en_us FROM s0 GROUP BY 1, 2)"
)


def _sessions(sf_dir) -> ray.data.Dataset:
    """(user_id, st_us, en_us) session intervals — the 30-min-gap
    gaps-and-islands fold, one user-hash bucket co-group (a user's
    whole history co-locates; the fold is a vectorized diff/cumsum)."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def bucket_user(t: pa.Table) -> np.ndarray:
        return mix64(t["user_id"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        ) & 0x7FFFFFFF

    def sess(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["user_id", "ts"], kind="stable")
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        u = df["user_id"].to_numpy(np.int64)
        new = np.ones(len(df), bool)
        if len(df) > 1:
            new[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > GAP_US)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(t)) - 1
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "st_us": pa.array(t[starts], pa.int64()),
                "en_us": pa.array(t[ends], pa.int64()),
            }
        )

    return bucketed_reduce(ev, bucket_user, sess)


def _replicate_to_buckets(
    t: pa.Table, st: np.ndarray, en_bucket_inclusive: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Row index + bucket id for each (row, touched-bucket) replica.
    ``en_bucket_inclusive`` is the last bucket the interval touches."""
    b0 = st // BUCKET_US
    reps = (en_bucket_inclusive - b0 + 1).astype(np.int64)
    idx = np.repeat(np.arange(len(st), dtype=np.int64), reps)
    base = np.concatenate([[0], np.cumsum(reps)[:-1]])
    off = np.arange(idx.size, dtype=np.int64) - np.repeat(base, reps)
    return idx, b0[idx] + off


# ----------------------------------------------------------------------
# Interval overlap join: per-session concurrency degree
# ----------------------------------------------------------------------
def q_events_session_overlap(sf_dir):
    """For every session, the number of OTHER sessions (necessarily
    other users') whose [st, en] interval overlaps it. Bucket-replicated
    range join: within a time bucket k, a session's overlap partners
    split into (a) partners starting at or after it — start lies in
    [max(st_i, kW), min(en_i, kW+W-1)], all provably replicated into k,
    counted by two searchsorted probes on the bucket's sorted starts,
    attributed to k = the bucket of the LATER start; and (b) partners
    straddling st_i from before — counted only in i's OWN start bucket
    as #{st_j < st_i} − #{en_j < st_i}. Each overlapping pair lands in
    exactly one bucket, so per-replica partials sum exactly."""
    from everythinggraph_ray.datapipe.joins import _key_hash
    from everythinggraph_ray.pipelines.queries import _typed_collect

    sess = _sessions(sf_dir)
    W = BUCKET_US

    def replicate(t: pa.Table) -> pa.Table:
        st = t["st_us"].to_numpy(zero_copy_only=False)
        en = t["en_us"].to_numpy(zero_copy_only=False)
        idx, tb = _replicate_to_buckets(t, st, en // W)
        return pa.table(
            {
                "user_id": t["user_id"].take(idx),
                "st_us": pa.array(st[idx], pa.int64()),
                "en_us": pa.array(en[idx], pa.int64()),
                "tb": pa.array(tb, pa.int64()),
            }
        )

    def bucket_tb(t: pa.Table) -> np.ndarray:
        return mix64(t["tb"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def count_cell(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        outs = []
        for tb, grp in df.groupby("tb", sort=False):
            st = grp["st_us"].to_numpy(np.int64)
            en = grp["en_us"].to_numpy(np.int64)
            sst = np.sort(st)
            sen = np.sort(en)
            lo = np.maximum(st, tb * W)
            hi = np.minimum(en, tb * W + W - 1)
            c1 = np.maximum(
                np.searchsorted(sst, hi, "right") - np.searchsorted(sst, lo, "left"), 0
            )
            own = (st // W) == tb
            c2 = np.where(
                own,
                np.searchsorted(sst, st, "left") - np.searchsorted(sen, st, "left"),
                0,
            )
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": grp["user_id"].to_numpy(np.int64),
                        "st_us": st,
                        "en_us": en,
                        "n_overlap": (c1 + c2 - own.astype(np.int64)).astype(np.int64),
                    }
                )
            )
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True), preserve_index=False)

    partials = bucketed_reduce(
        sess.map_batches(replicate, batch_format="pyarrow"), bucket_tb, count_cell
    )

    # sum per-session partials: (user_id, st_us) identifies a session
    # (a user's sessions are disjoint, so starts are distinct)
    def bucket_sess(t: pa.Table) -> np.ndarray:
        return _key_hash(t, ["user_id", "st_us"])

    def merge_sess(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["user_id", "st_us"], as_index=False).agg(
            en_us=("en_us", "first"), n_overlap=("n_overlap", "sum")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = bucketed_reduce(partials, bucket_sess, merge_sess)
    return _typed_collect(
        out,
        {"user_id": "int64", "st_us": "int64", "en_us": "int64", "n_overlap": "int64"},
    )


ANALYTICS11_QUERIES["events_session_overlap"] = q_events_session_overlap
ANALYTICS11_ORACLES["events_session_overlap"] = (
    _SESSIONS_SQL
    + " SELECT a.user_id, a.st_us, a.en_us, CAST(count(b.user_id) AS BIGINT) AS n_overlap "
    "FROM s a LEFT JOIN s b ON b.user_id <> a.user_id "
    "AND b.st_us <= a.en_us AND b.en_us >= a.st_us "
    "GROUP BY 1, 2, 3"
)


# ----------------------------------------------------------------------
# Sweep line: max concurrent sessions + first instant attained
# ----------------------------------------------------------------------
def q_events_max_concurrency(sf_dir):
    """Global maximum number of simultaneously-open sessions (inclusive
    [st, en]) and the earliest microsecond it is reached. Sweep line as
    a dataflow: (t, ±1) deltas packed to one ordered int key (2t for
    +1s, 2t+1 for −1s — opens sort first), pre-summed per key
    (sum_by_key), scanned by the exact distributed prefix scan
    (running_sum), then a per-batch (max, argmin-t) partial reduce.
    The max is only ever attained on an open step, so at_us = key//2."""
    sess = _sessions(sf_dir)

    def points(t: pa.Table) -> pa.Table:
        st = t["st_us"].to_numpy(zero_copy_only=False)
        en = t["en_us"].to_numpy(zero_copy_only=False)
        pk = np.concatenate([2 * st, 2 * (en + 1) + 1])
        d = np.concatenate(
            [np.ones(len(st), np.int64), -np.ones(len(en), np.int64)]
        )
        return pa.table({"pk": pa.array(pk, pa.int64()), "d": pa.array(d, pa.int64())})

    deltas = sum_by_key(
        sess.map_batches(points, batch_format="pyarrow"), "pk", ["d"]
    )
    scanned = running_sum(deltas, "pk", "pk", "d", out_col="run")

    def partial(t: pa.Table) -> pa.Table:
        run = t["run"].to_numpy(zero_copy_only=False)
        pk = t["pk"].to_numpy(zero_copy_only=False)
        if len(run) == 0:
            return pa.table(
                {"mx": pa.array([], pa.int64()), "at": pa.array([], pa.int64())}
            )
        mx = run.max()
        at = pk[run == mx].min()
        return pa.table(
            {"mx": pa.array([mx], pa.int64()), "at": pa.array([at], pa.int64())}
        )

    parts = scanned.map_batches(partial, batch_format="pyarrow").to_pandas()
    mx = int(parts["mx"].max())
    at = int(parts.loc[parts["mx"] == mx, "at"].min())
    return pd.DataFrame({"max_concurrency": [mx], "at_us": [at // 2]}).astype("int64")


ANALYTICS11_QUERIES["events_max_concurrency"] = q_events_max_concurrency
ANALYTICS11_ORACLES["events_max_concurrency"] = (
    _SESSIONS_SQL
    + ", pts AS (SELECT st_us AS t, 1 AS d FROM s UNION ALL SELECT en_us + 1, -1 FROM s), "
    "ag AS (SELECT t, d, CAST(SUM(d) AS BIGINT) AS dd FROM pts GROUP BY 1, 2), "
    "r AS (SELECT t, SUM(dd) OVER (ORDER BY t, d DESC) AS run FROM ag), "
    "m AS (SELECT CAST(max(run) AS BIGINT) AS mx FROM r) "
    "SELECT m.mx AS max_concurrency, CAST(min(r.t) AS BIGINT) AS at_us "
    "FROM r, m WHERE r.run = m.mx GROUP BY 1"
)


# ----------------------------------------------------------------------
# Interval union length: per-type covered time
# ----------------------------------------------------------------------
def q_events_type_coverage(sf_dir):
    """Per event type, the total microseconds covered by the union of
    half-open [ts, ts+5min) windows. Windows are clipped to the 1-hour
    buckets they span — union length is ADDITIVE over a partition of
    the timeline, so per-(type, bucket) cells are independent; each
    cell runs the classic sorted running-max island fold (vectorized),
    and per-type partials sum by one string-hash co-group."""
    from everythinggraph_ray.datapipe.joins import _key_hash
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )
    W = BUCKET_US

    def clip(t: pa.Table) -> pa.Table:
        st = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        en = st + COVER_WIN_US  # half-open
        idx, tb = _replicate_to_buckets(t, st, (en - 1) // W)
        return pa.table(
            {
                "event_type": t["event_type"].take(idx),
                "cst": pa.array(np.maximum(st[idx], tb * W), pa.int64()),
                "cen": pa.array(np.minimum(en[idx], (tb + 1) * W), pa.int64()),
                "tb": pa.array(tb, pa.int64()),
            }
        )

    def bucket_cell(t: pa.Table) -> np.ndarray:
        return _key_hash(t, ["event_type", "tb"])

    def cover_cell(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        rows = []
        for (et, _tb), grp in df.groupby(["event_type", "tb"], sort=False):
            st = grp["cst"].to_numpy(np.int64)
            en = grp["cen"].to_numpy(np.int64)
            order = np.argsort(st, kind="stable")
            st, en = st[order], en[order]
            cm = np.maximum.accumulate(en)
            new = np.ones(len(st), bool)
            if len(st) > 1:
                new[1:] = st[1:] > cm[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(st)) - 1
            rows.append((et, int((cm[ends] - st[starts]).sum())))
        return pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["event_type", "covered_us"]),
            preserve_index=False,
        )

    cells = bucketed_reduce(
        ev.map_batches(clip, batch_format="pyarrow"), bucket_cell, cover_cell
    )

    def bucket_type(t: pa.Table) -> np.ndarray:
        return _key_hash(t, ["event_type"])

    def merge_type(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("event_type", as_index=False)["covered_us"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    out = bucketed_reduce(cells, bucket_type, merge_type, num_buckets=4)
    return _typed_collect(out, {"event_type": "object", "covered_us": "int64"})


ANALYTICS11_QUERIES["events_type_coverage"] = q_events_type_coverage
ANALYTICS11_ORACLES["events_type_coverage"] = (
    "WITH w AS (SELECT event_type, epoch_us(ts) AS st, "
    f"epoch_us(ts) + {COVER_WIN_US} AS en FROM events), "
    "x AS (SELECT event_type, st, en, max(en) OVER (PARTITION BY event_type "
    "ORDER BY st, en ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM w), "
    "y AS (SELECT event_type, st, en, CASE WHEN pmax IS NULL OR st > pmax "
    "THEN 1 ELSE 0 END AS isl FROM x), "
    "z AS (SELECT event_type, st, en, SUM(isl) OVER (PARTITION BY event_type "
    "ORDER BY st, en) AS g FROM y), "
    "u AS (SELECT event_type, g, min(st) AS s, max(en) AS e FROM z GROUP BY 1, 2) "
    "SELECT event_type, CAST(SUM(e - s) AS BIGINT) AS covered_us FROM u GROUP BY 1"
)
