"""Analytics batch (session 12, twenty-sixth wave): alarm debouncing.

Distributed shape:
- ``events_debounce``: throttling/debouncing — per (user, event_type)
  stream, keep an event only if at least 10 minutes have passed since
  the last KEPT event of that stream (the alert-suppression rule of
  every monitoring pipeline). The kept-chain is greedily sequential
  WITHIN a stream (not prefix-decomposable — each decision depends on
  the previous kept event), so each stream's slab resolves with a
  bounded scan inside one pair-key bucketed co-group; streams
  themselves are fully parallel. Rows-only (the kept-chain recursion
  has no tractable SQL form); serial replay + crafted flap pytests.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64_pair

ANALYTICS42_QUERIES: dict = {}
ANALYTICS42_ORACLES: dict = {}

DEBOUNCE_US = 10 * 60 * 1_000_000  # 10-minute cooldown


def q_events_debounce(sf_dir):
    """(event_id, user_id, kept): the debounced stream — kept=1 iff the
    event starts or extends-past-cooldown its (user, type) chain."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        ty = np.asarray(t["event_type"].to_pylist(), object)
        tk = np.array(
            [
                int.from_bytes(hashlib.md5(x.encode()).digest()[8:16], "little")
                & 0x7FFFFFFFFFFFFFFF
                for x in ty
            ],
            np.int64,
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "tkey": pa.array(tk, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
            }
        )

    def stream_bucket(t: pa.Table) -> np.ndarray:
        return mix64_pair(
            t["user_id"].to_numpy(zero_copy_only=False),
            t["tkey"].to_numpy(zero_copy_only=False),
        ).astype(np.int64) & 0x7FFFFFFF

    def debounce(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        tk = g["tkey"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, ts, tk, u))
        u, tk, ts, eid = u[o], tk[o], ts[o], eid[o]
        new = np.r_[True, (u[1:] != u[:-1]) | (tk[1:] != tk[:-1])]
        kept = np.zeros(len(u), np.int64)
        last = 0
        for i in range(len(u)):
            if new[i] or ts[i] - last >= DEBOUNCE_US:
                kept[i] = 1
                last = ts[i]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "kept": pa.array(kept, pa.int64()),
            }
        )

    res = bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"), stream_bucket, debounce)
    return _typed_collect(
        res, {"event_id": "int64", "user_id": "int64", "kept": "int64"}
    )


ANALYTICS42_QUERIES["events_debounce"] = q_events_debounce
# kept-chain as a recursive CTE (round-4 VERDICT item 9): the anchor
# (last kept ts) carries through the recursion one row_number step at a
# time — exactly the serial chain semantics, fixture-scale tractable.
ANALYTICS42_ORACLES["events_debounce"] = (
    "WITH RECURSIVE e AS ("
    "SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, "
    "CAST(row_number() OVER (PARTITION BY user_id, event_type "
    "ORDER BY ts, event_id) AS BIGINT) AS rn FROM events), "
    "r(user_id, event_type, rn, event_id, kept, anchor) AS ("
    "SELECT user_id, event_type, rn, event_id, 1, ts_us FROM e WHERE rn = 1 "
    "UNION ALL "
    "SELECT e.user_id, e.event_type, e.rn, e.event_id, "
    f"CASE WHEN e.ts_us - r.anchor >= {DEBOUNCE_US} THEN 1 ELSE 0 END, "
    f"CASE WHEN e.ts_us - r.anchor >= {DEBOUNCE_US} THEN e.ts_us ELSE r.anchor END "
    "FROM r JOIN e ON e.user_id = r.user_id AND e.event_type = r.event_type "
    "AND e.rn = r.rn + 1) "
    "SELECT CAST(event_id AS BIGINT) AS event_id, "
    "CAST(user_id AS BIGINT) AS user_id, CAST(kept AS BIGINT) AS kept FROM r"
)
