"""Analytics batch (session 12, sixth wave): watermark late-arrival
flags, hourly OHLC candles, and isotonic regression (PAVA).

Distributed shapes:
- ``events_late_arrivals``: the streaming watermark test — an event is
  LATE when its ts is more than 5 minutes behind the maximum ts of all
  events that ARRIVED before it (arrival order = event_id). The
  exclusive running max is a textbook two-phase scan with NO quantile
  pass: event_id is dense, so range cells are static (id*B//(max+1));
  per-cell local sort + exclusive cummax, per-cell inclusive maxes
  fold to an exclusive carry on the driver (B scalars, ray.put once).
- ``events_ohlc_hourly``: per-hour open/high/low/close value-millis
  (the tumbling candle aggregation of every metrics store). Per-batch
  partials carry (argmin/argmax-by-(ts, event_id) open/close + min/max
  + the extremal keys); a bucketed per-hour reduce combines partials
  by comparing carried keys — streaming-combinable by construction.
- ``events_isotonic``: PAVA (pool adjacent violators) over the per-day
  value-milli totals — monotone-nondecreasing least-squares fit, the
  standard score-calibration op. Day totals fold distributed; the
  inherently serial pooling runs on the driver's bounded day table in
  exact integers, emitting each day's pool (fit_num, fit_den) — the
  fitted mean as an exact fraction, so the result is hashable without
  float division. Rows-only (PAVA has no SQL form); serial replay +
  monotonicity + pooling pytests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

ANALYTICS22_QUERIES: dict = {}
ANALYTICS22_ORACLES: dict = {}

LATENESS_US = 5 * 60 * 1_000_000  # 5 minutes
SCAN_CELLS = 64


# ----------------------------------------------------------------------
# watermark late arrivals (exclusive running max over arrival order)
# ----------------------------------------------------------------------
def q_events_late_arrivals(sf_dir):
    """(event_id, watermark_us, is_late): watermark_us = max ts of all
    earlier-arriving events (event_id order; -1 for the first event),
    is_late = ts < watermark - 5min."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {"event_id": t["event_id"], "ts_us": pa.array(ts, pa.int64())}
        )

    tagged = ev.map_batches(prep, batch_format="pyarrow").materialize()
    max_id = int(tagged.max("event_id"))
    B = SCAN_CELLS

    def cell_of(t: pa.Table) -> np.ndarray:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return (eid * B // (max_id + 1)).astype(np.int64)

    # phase 1: per-cell inclusive max (tiny: B rows)
    def cell_max(t: pa.Table) -> pa.Table:
        c = cell_of(t)
        u, inv = np.unique(c, return_inverse=True)
        m = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(m, inv, t["ts_us"].to_numpy(zero_copy_only=False))
        return pa.table({"c": pa.array(u, pa.int64()), "m": pa.array(m, pa.int64())})

    cm = (
        tagged.map_batches(cell_max, batch_format="pyarrow")
        .to_pandas()
        .groupby("c")["m"]
        .max()
        .reindex(range(B))
        .fillna(np.iinfo(np.int64).min)
        .astype(np.int64)
        .to_numpy()
    )
    # exclusive carry per cell
    carry = np.empty(B, np.int64)
    carry[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(cm[:-1], out=cm[:-1])
    carry[1:] = cm[:-1]
    carry_ref = ray.put(carry)

    def cell_bucket(t: pa.Table) -> np.ndarray:
        return mix64(cell_of(t)).astype(np.int64) & 0x7FFFFFFF

    def finish(g: pa.Table) -> pa.Table:
        car = ray.get(carry_ref)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        c = (eid * B // (max_id + 1)).astype(np.int64)
        o = np.lexsort((eid, c))
        eid, ts, c = eid[o], ts[o], c[o]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1, len(c)]
        wm = np.empty(len(c), np.int64)
        for i in range(len(starts) - 1):
            lo, hi = starts[i], starts[i + 1]
            ex = np.empty(hi - lo, np.int64)
            ex[0] = car[c[lo]]
            if hi - lo > 1:
                np.maximum.accumulate(
                    np.maximum(ts[lo : hi - 1], car[c[lo]]), out=ex[1:]
                )
            wm[lo:hi] = ex
        has_wm = wm != np.iinfo(np.int64).min
        is_late = (has_wm & (ts < wm - LATENESS_US)).astype(np.int64)
        wm_out = np.where(has_wm, wm, -1)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "watermark_us": pa.array(wm_out, pa.int64()),
                "is_late": pa.array(is_late, pa.int64()),
            }
        )

    res = bucketed_reduce(tagged, cell_bucket, finish)
    return _typed_collect(
        res, {"event_id": "int64", "watermark_us": "int64", "is_late": "int64"}
    )


ANALYTICS22_QUERIES["events_late_arrivals"] = q_events_late_arrivals

ANALYTICS22_ORACLES["events_late_arrivals"] = (
    "WITH t AS (SELECT event_id, "
    "CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events), "
    "w AS (SELECT event_id, ts_us, "
    "MAX(ts_us) OVER (ORDER BY event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm FROM t) "
    "SELECT event_id, CAST(COALESCE(wm, -1) AS BIGINT) AS watermark_us, "
    f"CAST(CASE WHEN wm IS NOT NULL AND ts_us < wm - {LATENESS_US} "
    "THEN 1 ELSE 0 END AS BIGINT) AS is_late FROM w"
)


# ----------------------------------------------------------------------
# hourly OHLC candles
# ----------------------------------------------------------------------
def q_events_ohlc_hourly(sf_dir):
    """(hour_us, open_milli, high_milli, low_milli, close_milli): the
    tumbling-hour candle of value-millis; open/close tie-break by
    (ts, event_id) — combinable partials carry their extremal keys."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts", "value"]
    )
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        v = np.floor(t["value"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5).astype(
            np.int64
        )
        h = (ts // HOUR) * HOUR
        o = np.lexsort((eid, ts, h))
        h, ts, eid, v = h[o], ts[o], eid[o], v[o]
        starts = np.r_[0, np.flatnonzero(h[1:] != h[:-1]) + 1]
        ends = np.r_[starts[1:], len(h)] - 1
        lows = np.minimum.reduceat(v, starts)
        highs = np.maximum.reduceat(v, starts)
        return pa.table(
            {
                "hour_us": pa.array(h[starts], pa.int64()),
                "o_ts": pa.array(ts[starts], pa.int64()),
                "o_eid": pa.array(eid[starts], pa.int64()),
                "open_milli": pa.array(v[starts], pa.int64()),
                "c_ts": pa.array(ts[ends], pa.int64()),
                "c_eid": pa.array(eid[ends], pa.int64()),
                "close_milli": pa.array(v[ends], pa.int64()),
                "low_milli": pa.array(lows, pa.int64()),
                "high_milli": pa.array(highs, pa.int64()),
            }
        )

    def h_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["hour_us"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def combine(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        outs = []
        for h, grp in df.groupby("hour_us", sort=False):
            oo = grp.sort_values(["o_ts", "o_eid"]).iloc[0]
            cc = grp.sort_values(["c_ts", "c_eid"]).iloc[-1]
            outs.append(
                (
                    int(h),
                    int(oo["open_milli"]),
                    int(grp["high_milli"].max()),
                    int(grp["low_milli"].min()),
                    int(cc["close_milli"]),
                )
            )
        out = pd.DataFrame(
            outs,
            columns=["hour_us", "open_milli", "high_milli", "low_milli", "close_milli"],
        )
        return pa.Table.from_pandas(out.astype("int64"), preserve_index=False)

    res = bucketed_reduce(ev.map_batches(partial, batch_format="pyarrow"), h_bucket, combine)
    return _typed_collect(
        res,
        {
            "hour_us": "int64",
            "open_milli": "int64",
            "high_milli": "int64",
            "low_milli": "int64",
            "close_milli": "int64",
        },
    )


ANALYTICS22_QUERIES["events_ohlc_hourly"] = q_events_ohlc_hourly

ANALYTICS22_ORACLES["events_ohlc_hourly"] = (
    "WITH t AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
    "CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v FROM events), "
    "k AS (SELECT *, (ts_us // 3600000000) * 3600000000 AS hour_us FROM t) "
    "SELECT DISTINCT hour_us, "
    "first_value(v) OVER w AS open_milli, "
    "MAX(v) OVER w AS high_milli, MIN(v) OVER w AS low_milli, "
    "last_value(v) OVER w AS close_milli FROM k "
    "WINDOW w AS (PARTITION BY hour_us ORDER BY ts_us, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
)


# ----------------------------------------------------------------------
# isotonic regression (PAVA) over day totals
# ----------------------------------------------------------------------
def q_events_isotonic(sf_dir):
    """(day, v, fit_num, fit_den): PAVA monotone-nondecreasing fit to
    the per-day value-milli totals; each day's fitted value is the
    exact fraction pool_sum/pool_size of its final pool."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        v = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "v": pa.array(np.bincount(inv, weights=v).astype(np.int64), pa.int64()),
            }
        )

    days = (
        ev.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("day", as_index=False)["v"]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    fits = pava_pools(days["v"].to_numpy(np.int64))
    days["fit_num"] = fits[:, 0]
    days["fit_den"] = fits[:, 1]
    return _typed_collect(
        ray.data.from_pandas(days.astype("int64")),
        {"day": "int64", "v": "int64", "fit_num": "int64", "fit_den": "int64"},
    )


def pava_pools(v: np.ndarray) -> np.ndarray:
    """Classic PAVA with a pool stack: returns per-element
    (pool_sum, pool_size). Violation test a/b > c/d compares by cross
    multiplication — exact integers throughout."""
    pools: list[list[int]] = []  # [sum, size]
    for x in v:
        pools.append([int(x), 1])
        while (
            len(pools) > 1
            and pools[-2][0] * pools[-1][1] > pools[-1][0] * pools[-2][1]
        ):
            s2, n2 = pools.pop()
            pools[-1][0] += s2
            pools[-1][1] += n2
    out = np.empty((len(v), 2), np.int64)
    i = 0
    for s, n in pools:
        out[i : i + n, 0] = s
        out[i : i + n, 1] = n
        i += n
    return out


ANALYTICS22_QUERIES["events_isotonic"] = q_events_isotonic
# no SQL oracle: PAVA's pool recursion has no SQL form; serial replay,
# monotonicity and pooled-mean invariant pytests cover exactness.
