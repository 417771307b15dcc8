"""Analytics batch (session 12, twenty-seventh wave): embedding drift
detection.

Distributed shape:
- ``emb_mean_shift``: the MLOps drift monitor — per-dimension exact
  mean-shift pieces between two cohorts (vec_id parity split): (dim,
  n_a, sum_a_e6, n_b, sum_b_e6) with components accumulated as
  FLOOR(v·1e6 + 0.5) integers so distributed summation order cannot
  perturb the result; the shift itself is a caller-side division of
  exact pieces. One map_batches of per-batch 64-dim partial sums —
  shuffle volume is 2×64 integers per batch regardless of corpus
  size.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

ANALYTICS43_QUERIES: dict = {}
ANALYTICS43_ORACLES: dict = {}

EMB_DIMS = 64


def q_emb_mean_shift(sf_dir):
    """(dim, n_a, sum_a_e6, n_b, sum_b_e6): per-dim integer-micro sums
    for the even (a) and odd (b) vec_id cohorts."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
        Q = np.floor(M * 1_000_000.0 + 0.5).astype(np.int64)
        even = ids % 2 == 0
        return pa.table(
            {
                "dim": pa.array(np.arange(1, EMB_DIMS + 1, dtype=np.int64), pa.int64()),
                "n_a": pa.array(
                    np.full(EMB_DIMS, int(even.sum()), np.int64), pa.int64()
                ),
                "sum_a_e6": pa.array(Q[even].sum(axis=0).astype(np.int64), pa.int64()),
                "n_b": pa.array(
                    np.full(EMB_DIMS, int((~even).sum()), np.int64), pa.int64()
                ),
                "sum_b_e6": pa.array(Q[~even].sum(axis=0).astype(np.int64), pa.int64()),
            }
        )

    df = (
        emb.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("dim", as_index=False)[["n_a", "sum_a_e6", "n_b", "sum_b_e6"]]
        .sum()
        .sort_values("dim")
        .reset_index(drop=True)
        .astype("int64")
    )
    return _typed_collect(
        ray.data.from_pandas(df),
        {
            "dim": "int64",
            "n_a": "int64",
            "sum_a_e6": "int64",
            "n_b": "int64",
            "sum_b_e6": "int64",
        },
    )


ANALYTICS43_QUERIES["emb_mean_shift"] = q_emb_mean_shift

ANALYTICS43_ORACLES["emb_mean_shift"] = (
    f"WITH dims AS (SELECT unnest(range(1, {EMB_DIMS + 1})) AS d), "
    "q AS (SELECT d, vec_id % 2 = 0 AS a, "
    "CAST(FLOOR(CAST(list_extract(embedding, CAST(d AS INTEGER)) AS DOUBLE) * 1000000 + 0.5) "
    "AS BIGINT) AS v FROM embeddings, dims) "
    "SELECT CAST(d AS BIGINT) AS dim, "
    "CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a, "
    "CAST(SUM(CASE WHEN a THEN v ELSE 0 END) AS BIGINT) AS sum_a_e6, "
    "CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b, "
    "CAST(SUM(CASE WHEN a THEN 0 ELSE v END) AS BIGINT) AS sum_b_e6 "
    "FROM q GROUP BY 1"
)
