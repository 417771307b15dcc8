"""Analytics batch (session 12, fourth wave): binary edge-file
round-trip, an order-insensitive dataset checksum, and per-event
trailing-window distinct users.

Distributed shapes:
- ``rel_edges_bin_roundtrip``: the rel edge table written to the
  REFERENCE'S native packed [src:u32][dst:u32] binary format
  (sources/binary_edges.py; init_all.c:813-832 mmaps exactly this) and
  read back with the distributed binary reader, then aggregated — the
  native-format hop is lossless iff the hash matches the parquet-side
  oracle.
- ``docs_dataset_checksum``: order-insensitive corpus fingerprint
  (n_rows, bit_xor, modular sum of a 63-bit md5 row key) — the cheap
  dataset-equality certificate a resumable 100 TB pipeline uses to
  compare two materializations without moving either. Per-batch
  partials commute, so the fold is shuffle-order-proof by
  construction.
- ``events_window_uniques``: for every event, the count of DISTINCT
  users with >= 1 event in the trailing hour — distinct-in-window,
  which no prefix sum gives directly. Shape: per-user event times
  merge into coverage intervals [ts, ts+1h] (one bucketed co-group,
  vectorized merge); intervals bucket-replicate into the hour cells
  they touch (the interval family's replication device,
  analytics_extra11.py); within a cell every event resolves with TWO
  searchsorted probes (#starts <= t minus #ends < t) — never a
  per-pair join. Replication cost is bounded by coverage length /
  bucket width.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

ANALYTICS20_QUERIES: dict = {}
ANALYTICS20_ORACLES: dict = {}

MASK63 = 0x7FFFFFFFFFFFFFFF
CHECKSUM_MOD = (1 << 61) - 1  # Mersenne prime keeps the modular sum exact
UNIQ_WINDOW_US = 3_600_000_000  # 1 hour
UNIQ_BUCKET_US = 3_600_000_000


# ----------------------------------------------------------------------
# binary edge-file round-trip (the reference's native format)
# ----------------------------------------------------------------------
def q_rel_edges_bin_roundtrip(sf_dir):
    """(n_edges, sum_src, sum_dst, sum_prod): rel edges through the
    packed-u32 binary format (write → distributed read → aggregate)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect, rel_edges
    from everythinggraph_ray.sources.binary_edges import (
        read_binary_edges,
        write_binary_edges,
    )

    out_dir = tempfile.mkdtemp(prefix="egr_bin_", dir="/tmp")
    try:
        path = os.path.join(out_dir, "edges.bin")
        write_binary_edges(rel_edges(sf_dir), path)
        back = read_binary_edges(path)

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


ANALYTICS20_QUERIES["rel_edges_bin_roundtrip"] = q_rel_edges_bin_roundtrip


def _bin_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    return (
        "SELECT CAST(count(*) AS BIGINT) AS n_edges, "
        "CAST(SUM(src) AS BIGINT) AS sum_src, CAST(SUM(dst) AS BIGINT) AS sum_dst, "
        f"CAST(SUM(src * dst) AS BIGINT) AS sum_prod FROM ({SQL_REL_EDGES})"
    )


ANALYTICS20_ORACLES["rel_edges_bin_roundtrip"] = _bin_sql()


# ----------------------------------------------------------------------
# order-insensitive dataset checksum
# ----------------------------------------------------------------------
def q_docs_dataset_checksum(sf_dir):
    """(n_rows, xor_sig, sum_mod): commutative fingerprint of the
    documents table over the 63-bit md5 key of 'doc_id:text'."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ks = [
            int.from_bytes(
                hashlib.md5(f"{did}:{txt}".encode()).digest()[8:16], "little"
            )
            & MASK63
            for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
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
                    [np.int64(sum(int(k) for k in ks) % CHECKSUM_MOD)], pa.int64()
                ),
            }
        )

    df = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = pd.DataFrame(
        {
            "n_rows": [int(df["n_rows"].sum())],
            "xor_sig": [int(np.bitwise_xor.reduce(df["xor_sig"].to_numpy(np.int64)))],
            "sum_mod": [int(df["sum_mod"].astype(object).sum() % CHECKSUM_MOD)],
        }
    ).astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {"n_rows": "int64", "xor_sig": "int64", "sum_mod": "int64"},
    )


ANALYTICS20_QUERIES["docs_dataset_checksum"] = q_docs_dataset_checksum

ANALYTICS20_ORACLES["docs_dataset_checksum"] = (
    "WITH k AS (SELECT CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || ':' || text) "
    f"& {MASK63} AS BIGINT) AS k FROM documents) "
    "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
    "CAST(bit_xor(k) AS BIGINT) AS xor_sig, "
    f"CAST(SUM(CAST(k AS HUGEINT)) % {CHECKSUM_MOD} AS BIGINT) AS sum_mod FROM k"
)


# ----------------------------------------------------------------------
# trailing-window distinct users per event
# ----------------------------------------------------------------------
def q_events_window_uniques(sf_dir):
    """(event_id, uniq_users): distinct users with an event in
    [t - 1h, t] for every event at time t. Per-user interval merge +
    hour-cell replication + two searchsorted stabs per event."""
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

    tagged = ev.map_batches(prep, batch_format="pyarrow")

    def user_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def merge_intervals(g: pa.Table) -> pa.Table:
        """Per user: union of [ts, ts+1h] into disjoint merged intervals."""
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        o = np.lexsort((ts, u))
        u, ts = u[o], ts[o]
        en = ts + UNIQ_WINDOW_US
        # a new interval starts at a user change or a gap (closed ends:
        # ts_next <= prev_en still merges)
        new = np.r_[True, (u[1:] != u[:-1]) | (ts[1:] > en[:-1])]
        # running max of en within merged runs is just en (ts sorted,
        # equal window length => en sorted within a user)
        st_ix = np.flatnonzero(new)
        end_ix = np.r_[st_ix[1:], len(u)] - 1 if len(st_ix) else st_ix
        return pa.table(
            {
                "st": pa.array(ts[st_ix], pa.int64()),
                "en": pa.array(en[end_ix], pa.int64()),
            }
        )

    intervals = bucketed_reduce(tagged, user_bucket, merge_intervals)

    W = UNIQ_BUCKET_US

    def replicate(t: pa.Table) -> pa.Table:
        st = t["st"].to_numpy(zero_copy_only=False)
        en = t["en"].to_numpy(zero_copy_only=False)
        b0 = st // W
        reps = (en // W - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(st), dtype=np.int64), reps)
        base = np.concatenate([[0], np.cumsum(reps)[:-1]]) if len(st) else np.empty(0, np.int64)
        off = np.arange(idx.size, dtype=np.int64) - np.repeat(base, reps)
        return pa.table(
            {
                "tb": pa.array(b0[idx] + off, pa.int64()),
                "st": pa.array(st[idx], pa.int64()),
                "en": pa.array(en[idx], pa.int64()),
                "event_id": pa.array(np.full(idx.size, -1, np.int64), pa.int64()),
            }
        )

    def tag_events(t: pa.Table) -> pa.Table:
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tb": pa.array(ts // W, pa.int64()),
                "st": pa.array(ts, pa.int64()),  # query point rides in st
                "en": pa.array(np.full(len(ts), -1, np.int64), pa.int64()),
                "event_id": t["event_id"],
            }
        )

    unioned = intervals.map_batches(replicate, batch_format="pyarrow").union(
        tagged.map_batches(tag_events, batch_format="pyarrow")
    )

    def tb_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["tb"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def stab(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        outs = []
        for _, grp in df.groupby("tb", sort=False):
            isq = grp["event_id"].to_numpy(np.int64) >= 0
            ivs = grp[~isq]
            q = grp[isq]
            if not len(q):
                continue
            sst = np.sort(ivs["st"].to_numpy(np.int64))
            sen = np.sort(ivs["en"].to_numpy(np.int64))
            t = q["st"].to_numpy(np.int64)
            cnt = np.searchsorted(sst, t, "right") - np.searchsorted(sen, t, "left")
            outs.append(
                pd.DataFrame(
                    {
                        "event_id": q["event_id"].to_numpy(np.int64),
                        "uniq_users": cnt.astype(np.int64),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "uniq_users": pa.array([], pa.int64()),
                }
            )
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True), preserve_index=False)

    res = bucketed_reduce(unioned, tb_bucket, stab)
    return _typed_collect(res, {"event_id": "int64", "uniq_users": "int64"})


ANALYTICS20_QUERIES["events_window_uniques"] = q_events_window_uniques

ANALYTICS20_ORACLES["events_window_uniques"] = (
    "SELECT e.event_id, "
    "(SELECT CAST(count(DISTINCT e2.user_id) AS BIGINT) FROM events e2 "
    "WHERE e2.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts) AS uniq_users "
    "FROM events e"
)
