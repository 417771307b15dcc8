"""Analytics batch (session 12, nineteenth wave): materialized
hierarchy paths and gap-filled time series.

Distributed shapes:
- ``part_path_enum``: the MATERIALIZED PATH encoding of the implicit
  parent(n)=n//2 hierarchy — per part the root→node path as a
  '/'-joined string of 1-based node ids (the adjacency-list ↔
  path-enumeration conversion every hierarchy warehouse does). Pure
  per-batch vectorized halving (path depth ≤ 11), no shuffle.
- ``events_hourly_dense``: GAP FILLING — event counts per hour
  INCLUDING empty hours between the corpus min and max hour: a
  generator source (``ray.data.range`` → hour spine) LEFT-joined
  against the bucketed hourly counts, absent hours densified to 0.
  The calendar-densification step every dashboard/forecast pipeline
  needs before windowing.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import sum_by_key

ANALYTICS35_QUERIES: dict = {}
ANALYTICS35_ORACLES: dict = {}

HOUR_US = 3_600_000_000


# ----------------------------------------------------------------------
# materialized hierarchy paths
# ----------------------------------------------------------------------
def q_part_path_enum(sf_dir):
    """(partkey, path, depth): root→node path '1/2/5/...' over 1-based
    heap ids (node = partkey + 1)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"]
    )

    def paths(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = k + 1
        # collect ancestor chains leaf->root, then reverse-join
        chains: list[np.ndarray] = []
        cur = node.copy()
        while (cur >= 1).any():
            chains.append(np.where(cur >= 1, cur, -1))
            cur = cur // 2
        mat = np.stack(chains, axis=1)  # n x depth, -1 padded, leaf first
        out_paths, depths = [], []
        for row in mat:
            ids = [int(x) for x in row if x >= 1][::-1]  # root first
            out_paths.append("/".join(str(x) for x in ids))
            depths.append(len(ids))
        return pa.table(
            {
                "partkey": pa.array(k, pa.int64()),
                "path": pa.array(out_paths, pa.string()),
                "depth": pa.array(np.asarray(depths, np.int64), pa.int64()),
            }
        )

    return _typed_collect(
        part.map_batches(paths, batch_format="pyarrow"),
        {"partkey": "int64", "path": "object", "depth": "int64"},
    )


ANALYTICS35_QUERIES["part_path_enum"] = q_part_path_enum

ANALYTICS35_ORACLES["part_path_enum"] = (
    "WITH RECURSIVE c AS ("
    "SELECT p_partkey AS partkey, p_partkey + 1 AS node, "
    "CAST(p_partkey + 1 AS VARCHAR) AS path, 1 AS depth FROM part "
    "UNION ALL SELECT partkey, node // 2, "
    "CAST(node // 2 AS VARCHAR) || '/' || path, depth + 1 FROM c WHERE node > 1) "
    "SELECT partkey, path, CAST(depth AS BIGINT) AS depth FROM c WHERE node = 1"
)


# ----------------------------------------------------------------------
# gap-filled hourly counts
# ----------------------------------------------------------------------
def q_events_hourly_dense(sf_dir):
    """(hour_us, n): event counts per hour over the FULL [min, max]
    hour range — absent hours present with n = 0."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"]
    ).map_batches(
        lambda t: pa.table(
            {
                "hour_us": pa.array(
                    (
                        t["ts"].to_numpy(zero_copy_only=False)
                        .astype("datetime64[us]")
                        .astype(np.int64)
                        // HOUR_US
                    )
                    * HOUR_US,
                    pa.int64(),
                ),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    counts = sum_by_key(ev, "hour_us", ["n"]).materialize()
    lo = int(counts.min("hour_us"))
    hi = int(counts.max("hour_us"))
    n_hours = (hi - lo) // HOUR_US + 1

    spine = ray.data.range(n_hours).map_batches(
        lambda t: pa.table(
            {
                "hour_us": pa.array(
                    lo + t["id"].to_numpy(zero_copy_only=False) * HOUR_US, pa.int64()
                )
            }
        ),
        batch_format="pyarrow",
    )
    dense = hash_join(spine, counts, on="hour_us", right_cols=["n"], how="left")

    def fill(t: pa.Table) -> pa.Table:
        n = np.nan_to_num(
            t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        return pa.table({"hour_us": t["hour_us"], "n": pa.array(n, pa.int64())})

    return _typed_collect(
        dense.map_batches(fill, batch_format="pyarrow"),
        {"hour_us": "int64", "n": "int64"},
    )


ANALYTICS35_QUERIES["events_hourly_dense"] = q_events_hourly_dense

ANALYTICS35_ORACLES["events_hourly_dense"] = (
    "WITH h AS (SELECT (CAST(epoch_us(ts) AS BIGINT) // 3600000000) * 3600000000 "
    "AS hour_us, count(*) AS n FROM events GROUP BY 1), "
    "b AS (SELECT MIN(hour_us) AS lo, MAX(hour_us) AS hi FROM h), "
    "s AS (SELECT lo + 3600000000 * unnest(range(0, "
    "CAST((hi - lo) // 3600000000 + 1 AS BIGINT))) AS hour_us FROM b) "
    "SELECT s.hour_us, CAST(COALESCE(h.n, 0) AS BIGINT) AS n "
    "FROM s LEFT JOIN h ON h.hour_us = s.hour_us"
)
