"""Analytics batch (session 12, eighteenth wave): three-way join
checksum and exactly-once event dedup.

Distributed shapes:
- ``threeway_join_checksum``: customer ⋈ orders ⋈ lineitem chained
  through TWO bucketed hash joins, reduced to an order-insensitive
  certificate (row count, bit_xor and modular sum of a 63-bit md5 row
  key over the three join keys) — the end-to-end join-pipeline
  integrity probe: any dropped, duplicated or mis-keyed row anywhere
  in the two-join chain breaks the hash against the oracle's
  single-statement 3-way join.
- ``events_exactly_once``: at-least-once delivery compaction — events
  deduplicated on (user_id, event_type, ts) keeping the SMALLEST
  event_id (the deterministic exactly-once winner), reporting
  (n_kept, n_dropped, sum_kept_event_id). One pair-key bucketed
  reduce over a packed (type, ts) key; the winner rule makes the
  result shuffle-order-proof.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import bucketed_reduce, mix64_pair

ANALYTICS34_QUERIES: dict = {}
ANALYTICS34_ORACLES: dict = {}

MASK63 = 0x7FFFFFFFFFFFFFFF
JOIN_MOD = (1 << 61) - 1


# ----------------------------------------------------------------------
# three-way join checksum
# ----------------------------------------------------------------------
def q_threeway_join_checksum(sf_dir):
    """(n_rows, xor_sig, sum_mod) over md5('cust:order:line') keys of
    customer ⋈ orders ⋈ lineitem."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).map_batches(
        lambda t: pa.table({"cust": t["c_custkey"]}), batch_format="pyarrow"
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: pa.table({"ok": t["o_orderkey"], "cust": t["o_custkey"]}),
        batch_format="pyarrow",
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber"],
    ).map_batches(
        lambda t: pa.table({"ok": t["l_orderkey"], "ln": t["l_linenumber"]}),
        batch_format="pyarrow",
    )

    co = hash_join(orders, cust, on="cust", how="semi")
    col = hash_join(li, co, on="ok", right_cols=["cust"])

    def partial(t: pa.Table) -> pa.Table:
        ks = [
            int.from_bytes(
                hashlib.md5(f"{c}:{o}:{l}".encode()).digest()[8:16], "little"
            )
            & MASK63
            for c, o, l in zip(
                t["cust"].to_pylist(), t["ok"].to_pylist(), t["ln"].to_pylist()
            )
        ]
        arr = np.array(ks, np.int64) if ks else np.empty(0, np.int64)
        return pa.table(
            {
                "n_rows": pa.array([np.int64(len(arr))], pa.int64()),
                "xor_sig": pa.array(
                    [np.bitwise_xor.reduce(arr) if len(arr) else np.int64(0)],
                    pa.int64(),
                ),
                "sum_mod": pa.array(
                    [np.int64(sum(int(k) for k in ks) % JOIN_MOD)], pa.int64()
                ),
            }
        )

    df = col.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = pd.DataFrame(
        {
            "n_rows": [int(df["n_rows"].sum())],
            "xor_sig": [int(np.bitwise_xor.reduce(df["xor_sig"].to_numpy(np.int64)))],
            "sum_mod": [int(df["sum_mod"].astype(object).sum() % JOIN_MOD)],
        }
    ).astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {"n_rows": "int64", "xor_sig": "int64", "sum_mod": "int64"},
    )


ANALYTICS34_QUERIES["threeway_join_checksum"] = q_threeway_join_checksum

ANALYTICS34_ORACLES["threeway_join_checksum"] = (
    "WITH j AS (SELECT CAST(md5_number_lower("
    "CAST(o_custkey AS VARCHAR) || ':' || CAST(l_orderkey AS VARCHAR) "
    "|| ':' || CAST(l_linenumber AS VARCHAR)) "
    f"& {MASK63} AS BIGINT) AS k "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey) "
    "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
    "CAST(bit_xor(k) AS BIGINT) AS xor_sig, "
    f"CAST(SUM(CAST(k AS HUGEINT)) % {JOIN_MOD} AS BIGINT) AS sum_mod FROM j"
)


# ----------------------------------------------------------------------
# exactly-once event dedup
# ----------------------------------------------------------------------
def q_events_exactly_once(sf_dir):
    """One row (n_kept, n_dropped, sum_kept_event_id): dedup on
    (user_id, event_type, ts) keeping the smallest event_id."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        ty = np.asarray(t["event_type"].to_pylist(), object)
        tcode = np.array(
            [
                int.from_bytes(hashlib.md5(x.encode()).digest()[8:16], "little")
                & MASK63
                for x in ty
            ],
            np.int64,
        )
        # pack (type-hash, ts) pair key alongside user
        return pa.table(
            {
                "user_id": t["user_id"],
                "k2": pa.array(tcode ^ (ts * np.int64(1_000_003)), pa.int64()),
                "event_id": t["event_id"],
            }
        )

    def pair_bucket(t: pa.Table) -> np.ndarray:
        return mix64_pair(
            t["user_id"].to_numpy(zero_copy_only=False),
            t["k2"].to_numpy(zero_copy_only=False),
        ).astype(np.int64) & 0x7FFFFFFF

    def keep_min(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        k = g["k2"].to_numpy(zero_copy_only=False)
        e = g["event_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((e, k, u))
        u, k, e = u[o], k[o], e[o]
        new = np.r_[True, (u[1:] != u[:-1]) | (k[1:] != k[:-1])]
        kept = e[new]
        return pa.table(
            {
                "n_kept": pa.array([np.int64(new.sum())], pa.int64()),
                "n_dropped": pa.array([np.int64(len(e) - new.sum())], pa.int64()),
                "sum_kept_event_id": pa.array([kept.sum()], pa.int64()),
            }
        )

    df = bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"), pair_bucket, keep_min
    ).to_pandas()
    out = df.sum().to_frame().T.astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {"n_kept": "int64", "n_dropped": "int64", "sum_kept_event_id": "int64"},
    )


ANALYTICS34_QUERIES["events_exactly_once"] = q_events_exactly_once

ANALYTICS34_ORACLES["events_exactly_once"] = (
    "WITH k AS (SELECT user_id, event_type, ts, MIN(event_id) AS keeper, "
    "count(*) AS c FROM events GROUP BY 1, 2, 3) "
    "SELECT CAST(count(*) AS BIGINT) AS n_kept, "
    "CAST(SUM(c - 1) AS BIGINT) AS n_dropped, "
    "CAST(SUM(keeper) AS BIGINT) AS sum_kept_event_id FROM k"
)
