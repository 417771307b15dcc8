"""Analytics batch (session 12, twentieth wave): Arrow IPC round-trip
and partitioned write + pruned read.

Distributed shapes:
- ``rel_edges_ipc_roundtrip``: the edge table through ARROW IPC files
  (one .arrow file per batch via a map_batches sink, read back with
  ``read_binary_files`` + ``pa.ipc.open_file`` — zero-copy columnar
  interchange, the Arrow-native sibling of the CSV/JSON/binary
  round-trips) → distributed 4-scalar aggregate.
- ``events_partitioned_write_prune``: ``write_parquet(partition_cols=
  ['event_type'])`` then a read of ONLY the purchase partition
  directory — write-side partitioning + read-side pruning, the
  resumable-output layout this repo's builds use (one dir per key,
  failed runs skip finished partitions) exercised on the driver
  surface. Oracle = the unpruned filter; the hash matches iff the
  pruned read returns exactly the partition's rows.
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

ANALYTICS36_QUERIES: dict = {}
ANALYTICS36_ORACLES: dict = {}

PRUNE_TYPE = "purchase"


# ----------------------------------------------------------------------
# Arrow IPC round-trip
# ----------------------------------------------------------------------
def q_rel_edges_ipc_roundtrip(sf_dir):
    """(n_edges, sum_src, sum_dst, sum_prod): rel edges through Arrow
    IPC files (write per batch, distributed read-back)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect, rel_edges

    out_dir = tempfile.mkdtemp(prefix="egr_ipc_", dir="/tmp")
    try:
        def write_ipc(t: pa.Table) -> pa.Table:
            import uuid

            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.arrow")
            with pa.OSFile(path, "wb") as f, pa.ipc.new_file(f, t.schema) as w:
                w.write_table(t)
            return pa.table({"written": pa.array([t.num_rows], pa.int64())})

        n_written = int(
            rel_edges(sf_dir)
            .map_batches(write_ipc, batch_format="pyarrow")
            .sum("written")
        )

        def read_ipc(t: pa.Table) -> pa.Table:
            outs = []
            for blob in t["bytes"].to_pylist():
                with pa.ipc.open_file(pa.BufferReader(blob)) as r:
                    outs.append(r.read_all())
            tb = pa.concat_tables(outs) if outs else pa.table({"src": [], "dst": []})
            s = tb["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = tb["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "n_edges": pa.array([np.int64(len(s))], pa.int64()),
                    "sum_src": pa.array([s.sum()], pa.int64()),
                    "sum_dst": pa.array([d.sum()], pa.int64()),
                    "sum_prod": pa.array([(s * d).sum()], pa.int64()),
                }
            )

        df = (
            ray.data.read_binary_files(out_dir)
            .map_batches(read_ipc, batch_format="pyarrow")
            .to_pandas()
        )
        out = df.sum().to_frame().T.astype("int64")
        assert int(out["n_edges"].iloc[0]) == n_written
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return _typed_collect(
        ray.data.from_pandas(out),
        {"n_edges": "int64", "sum_src": "int64", "sum_dst": "int64", "sum_prod": "int64"},
    )


ANALYTICS36_QUERIES["rel_edges_ipc_roundtrip"] = q_rel_edges_ipc_roundtrip


def _ipc_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    return (
        "SELECT CAST(count(*) AS BIGINT) AS n_edges, "
        "CAST(SUM(src) AS BIGINT) AS sum_src, CAST(SUM(dst) AS BIGINT) AS sum_dst, "
        f"CAST(SUM(src * dst) AS BIGINT) AS sum_prod FROM ({SQL_REL_EDGES})"
    )


ANALYTICS36_ORACLES["rel_edges_ipc_roundtrip"] = _ipc_sql()


# ----------------------------------------------------------------------
# partitioned write + pruned read
# ----------------------------------------------------------------------
def q_events_partitioned_write_prune(sf_dir):
    """(n_rows, n_users, sum_event_id): the purchase partition read
    back ALONE from a hive-partitioned write — partition pruning as a
    correctness property."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    out_dir = tempfile.mkdtemp(prefix="egr_hive_", dir="/tmp")
    try:
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "event_type"],
        ).write_parquet(out_dir, partition_cols=["event_type"])

        pruned = ray.data.read_parquet(
            os.path.join(out_dir, f"event_type={PRUNE_TYPE}")
        )

        def partial(t: pa.Table) -> pa.Table:
            e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "n_rows": pa.array([np.int64(len(e))], pa.int64()),
                    "sum_event_id": pa.array([e.sum()], pa.int64()),
                    "users": pa.array([np.unique(u)], pa.list_(pa.int64())),
                }
            )

        df = pruned.map_batches(partial, batch_format="pyarrow").to_pandas()
        n_users = len(set().union(*[set(x) for x in df["users"]])) if len(df) else 0
        out = pd.DataFrame(
            {
                "n_rows": [int(df["n_rows"].sum())],
                "n_users": [n_users],
                "sum_event_id": [int(df["sum_event_id"].sum())],
            }
        ).astype("int64")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return _typed_collect(
        ray.data.from_pandas(out),
        {"n_rows": "int64", "n_users": "int64", "sum_event_id": "int64"},
    )


ANALYTICS36_QUERIES["events_partitioned_write_prune"] = q_events_partitioned_write_prune

ANALYTICS36_ORACLES["events_partitioned_write_prune"] = (
    "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
    "CAST(SUM(event_id) AS BIGINT) AS sum_event_id "
    f"FROM events WHERE event_type = '{PRUNE_TYPE}'"
)
