"""Session-12 thirtieth wave (binary-payload dedup): planted-duplicate
exactness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra46 import binary_dedup_stats


def test_binary_dedup_stats_counts_planted_dups():
    rng = np.random.default_rng(311)
    uniq = [rng.bytes(200) for _ in range(40)]
    # 40 unique + one payload repeated 5x + one repeated 2x
    payloads = uniq + [uniq[0]] * 4 + [uniq[1]] * 1
    rng.shuffle(payloads)
    ds = ray.data.from_arrow(
        pa.table({"blob": pa.array(payloads, pa.binary())})
    )
    out = binary_dedup_stats(ds, "blob").iloc[0]
    assert out["n_items"] == 45
    assert out["n_unique"] == 40
    assert out["n_dup_items"] == 5 + 2  # both dup groups' full memberships
    assert out["max_group"] == 5


def test_binary_dedup_stats_all_unique():
    payloads = [bytes([i, i + 1, i + 2]) for i in range(30)]
    ds = ray.data.from_arrow(pa.table({"blob": pa.array(payloads, pa.binary())}))
    out = binary_dedup_stats(ds, "blob").iloc[0]
    assert out["n_items"] == 30
    assert out["n_unique"] == 30
    assert out["n_dup_items"] == 0
    assert out["max_group"] == 1
