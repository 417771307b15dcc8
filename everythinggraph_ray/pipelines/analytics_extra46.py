"""Analytics batch (session 12, thirtieth wave): exact binary-payload
dedup.

Distributed shape:
- ``multimodal_exact_dedup``: the first curation step of every
  image/audio corpus — exact dedup of the OPAQUE BINARY column by
  content hash, no codec required: per-batch md5 of each payload
  (63-bit key), one bucketed distinct-count reduce, and a 4-scalar
  certificate (n_items, n_unique, n_dup_items, max_group). Runs over
  the web corpus's html payloads (the repo's stand-in binary
  modality). Rows-only (the corpus is generated); pytest plants
  byte-identical duplicates and verifies the counts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

ANALYTICS46_QUERIES: dict = {}
ANALYTICS46_ORACLES: dict = {}

MASK63 = 0x7FFFFFFFFFFFFFFF


def binary_dedup_stats(ds: ray.data.Dataset, col: str) -> pd.DataFrame:
    """One-row (n_items, n_unique, n_dup_items, max_group) over the
    md5-content groups of a binary column."""

    def keys(t: pa.Table) -> pa.Table:
        ks = [
            int.from_bytes(hashlib.md5(b).digest()[8:16], "little") & MASK63
            for b in t[col].to_pylist()
        ]
        return pa.table({"k": pa.array(np.asarray(ks, np.int64), pa.int64())})

    keyed = ds.map_batches(keys, batch_format="pyarrow")

    def k_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["k"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def group_stats(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        _, cnt = np.unique(k, return_counts=True)
        return pa.table(
            {
                "n_items": pa.array([np.int64(len(k))], pa.int64()),
                "n_unique": pa.array([np.int64(len(cnt))], pa.int64()),
                "n_dup_items": pa.array(
                    [np.int64((cnt[cnt > 1]).sum())], pa.int64()
                ),
                "max_group": pa.array(
                    [np.int64(cnt.max() if len(cnt) else 0)], pa.int64()
                ),
            }
        )

    df = bucketed_reduce(keyed, k_bucket, group_stats).to_pandas()
    return pd.DataFrame(
        {
            "n_items": [int(df["n_items"].sum())],
            "n_unique": [int(df["n_unique"].sum())],
            "n_dup_items": [int(df["n_dup_items"].sum())],
            "max_group": [int(df["max_group"].max()) if len(df) else 0],
        }
    ).astype("int64")


def q_multimodal_exact_dedup(sf_dir):
    """Binary-content dedup certificate over the corpus html payloads."""
    from everythinggraph_ray.pipelines.queries import _corpus_for, _typed_collect

    pages = ray.data.read_parquet(_corpus_for(sf_dir), columns=["html"])
    out = binary_dedup_stats(pages, "html")
    return _typed_collect(
        ray.data.from_pandas(out),
        {
            "n_items": "int64",
            "n_unique": "int64",
            "n_dup_items": "int64",
            "max_group": "int64",
        },
    )


ANALYTICS46_QUERIES["multimodal_exact_dedup"] = q_multimodal_exact_dedup
# rows-only (the page corpus is generated outside the SQL views);
# planted-duplicate pytest carries exactness.
