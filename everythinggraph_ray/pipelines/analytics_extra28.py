"""Analytics batch (session 12, twelfth wave): Misra–Gries exact heavy
hitters and a knapsack DP folded by max-plus convolution.

Distributed shapes:
- ``events_heavy_users_mg``: users with > n/150 of all events, with
  EXACT counts, found by the classic two-pass scheme: pass 1 runs a
  Misra–Gries(k) summary per batch and MERGES summaries associatively
  (counter union + subtract the (k+1)-th largest — the mergeable-
  summaries result of Agarwal et al.), which provably retains every
  item with frequency > n/k; pass 2 exact-counts the surviving
  candidates with one bucketed semi-join sum and applies the
  threshold. The deterministic counterpart of the count-min sketch
  path (``docs_cms_heavy``).
- ``part_knapsack``: 0/1 knapsack over the 100 smallest parts (weight
  = p_size, value = retailprice millis, capacity 100) — the DP looks
  sequential, but a DP vector over capacities is an ASSOCIATIVE
  monoid under max-plus convolution, so per-batch partial DP vectors
  fold in any order: each batch DPs its items locally (vectorized
  shifted-max over the capacity axis), the driver convolves the
  bounded per-batch vectors. Rows-only (DP has no SQL form); serial
  DP replay + monotonicity pytests.
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

ANALYTICS28_QUERIES: dict = {}
ANALYTICS28_ORACLES: dict = {}

MG_K = 150  # heavy = frequency > n / MG_K
KNAP_CAP = 100
KNAP_ITEMS = 100


# ----------------------------------------------------------------------
# Misra–Gries two-pass exact heavy hitters
# ----------------------------------------------------------------------
def _mg_merge(counts: dict[int, int], k: int) -> dict[int, int]:
    """Trim a counter map to at most k entries by subtracting the
    (k+1)-th largest count from all (drop non-positives)."""
    if len(counts) <= k:
        return counts
    vals = sorted(counts.values(), reverse=True)
    sub = vals[k]
    return {u: c - sub for u, c in counts.items() if c - sub > 0}


def q_events_heavy_users_mg(sf_dir):
    """(user_id, n): users with more than total/150 events — exact,
    via merged Misra-Gries candidates + one exact verify pass."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )

    def mg_partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        uu, cc = np.unique(u, return_counts=True)
        m = _mg_merge(dict(zip(uu.tolist(), cc.tolist())), MG_K)
        # sentinel row (user -1) carries the batch row count even when
        # the trim empties the summary (all-equal counts can)
        ids = [-1] + list(m.keys())
        cs = [0] + list(m.values())
        rows = [len(u)] + [0] * len(m)
        return pa.table(
            {
                "user_id": pa.array(ids, pa.int64()),
                "c": pa.array(cs, pa.int64()),
                "rows": pa.array(rows, pa.int64()),
            }
        )

    part = ev.map_batches(mg_partial, batch_format="pyarrow").to_pandas()
    total = int(part["rows"].sum())
    merged: dict[int, int] = {}
    for uid, c in zip(part["user_id"], part["c"]):
        if int(uid) != -1:
            merged[int(uid)] = merged.get(int(uid), 0) + int(c)
    merged = _mg_merge(merged, MG_K)

    cand = ray.data.from_pandas(
        pd.DataFrame({"user_id": np.array(sorted(merged), np.int64)})
    )

    def ones(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    exact = sum_by_key(
        hash_join(
            ev.map_batches(ones, batch_format="pyarrow"), cand, on="user_id", how="semi"
        ),
        "user_id",
        ["n"],
    ).to_pandas()
    out = (
        exact[exact["n"] * MG_K > total]
        .sort_values("user_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    return _typed_collect(
        ray.data.from_pandas(out), {"user_id": "int64", "n": "int64"}
    )


ANALYTICS28_QUERIES["events_heavy_users_mg"] = q_events_heavy_users_mg

ANALYTICS28_ORACLES["events_heavy_users_mg"] = (
    "SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events "
    f"GROUP BY 1 HAVING count(*) * {MG_K} > (SELECT count(*) FROM events)"
)


# ----------------------------------------------------------------------
# knapsack DP via max-plus convolution folding
# ----------------------------------------------------------------------
def _dp_items(weights: np.ndarray, values: np.ndarray, cap: int) -> np.ndarray:
    """Serial 0/1 DP over one item set -> best value per capacity."""
    dp = np.zeros(cap + 1, np.int64)
    for w, v in zip(weights, values):
        w = int(w)
        if w <= cap:
            cand = dp[: cap + 1 - w] + int(v)
            dp[w:] = np.maximum(dp[w:], cand)
    return dp


def _maxplus_convolve(a: np.ndarray, b: np.ndarray, cap: int) -> np.ndarray:
    """(a ⊕ b)[c] = max_{i+j=c} a[i] + b[j] — the associative combine
    of per-partition knapsack DP vectors."""
    out = np.full(cap + 1, np.iinfo(np.int64).min, np.int64)
    for i in range(cap + 1):
        j = cap - i
        out[i:] = np.maximum(out[i:], a[i] + b[: j + 1])
    return out


def q_part_knapsack(sf_dir):
    """(capacity, best_value_milli): 0/1 knapsack over the 100 smallest
    partkeys (weight p_size, value retailprice millis), capacities
    0..100. Per-batch DP vectors fold by max-plus convolution."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_size", "p_retailprice"],
    )

    def batch_dp(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = k <= KNAP_ITEMS  # partkeys are 1..N: the 100 smallest
        w = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        v = np.floor(
            t["p_retailprice"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)[keep]
        dp = _dp_items(w, v, KNAP_CAP)
        return pa.table(
            {
                "cap": pa.array(np.arange(KNAP_CAP + 1, dtype=np.int64), pa.int64()),
                "val": pa.array(dp, pa.int64()),
                "part": pa.array(
                    np.full(KNAP_CAP + 1, -1, np.int64), pa.int64()
                ),  # opaque partial id (unused; keeps schema stable)
            }
        )

    parts = part.map_batches(batch_dp, batch_format="pyarrow").to_pandas()
    # fold the per-batch vectors (grouped by their position order)
    n_vec = len(parts) // (KNAP_CAP + 1)
    acc = np.zeros(KNAP_CAP + 1, np.int64)
    vals = parts["val"].to_numpy(np.int64)
    for i in range(n_vec):
        acc = _maxplus_convolve(acc, vals[i * (KNAP_CAP + 1) : (i + 1) * (KNAP_CAP + 1)], KNAP_CAP)
    out = pd.DataFrame(
        {
            "capacity": np.arange(KNAP_CAP + 1, dtype=np.int64),
            "best_value_milli": acc,
        }
    )
    return _typed_collect(
        ray.data.from_pandas(out), {"capacity": "int64", "best_value_milli": "int64"}
    )


ANALYTICS28_QUERIES["part_knapsack"] = q_part_knapsack
# no SQL oracle: DP/max-plus convolution has no SQL form; serial replay
# + monotone-in-capacity pytests.
