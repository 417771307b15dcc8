"""Session-12 twentieth wave (Arrow IPC round-trip / partitioned
write + pruned read): serial-replay exactness on adversarial
fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra36 import (
    PRUNE_TYPE,
    q_events_partitioned_write_prune,
    q_rel_edges_ipc_roundtrip,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_ipc_roundtrip_is_lossless(tmp_path):
    rng = np.random.default_rng(231)
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 3000, 2000).astype(np.int64),
            "l_partkey": rng.integers(0, 3000, 2000).astype(np.int64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_rel_edges_ipc_roundtrip(str(tmp_path))).iloc[0]
    s = (li["l_orderkey"] % 1000).to_numpy(np.int64)
    d = (li["l_partkey"] % 1000).to_numpy(np.int64)
    assert got["n_edges"] == len(s)
    assert got["sum_src"] == s.sum()
    assert got["sum_dst"] == d.sum()
    assert got["sum_prod"] == (s * d).sum()


def test_partition_prune_returns_exactly_one_partition(tmp_path):
    rng = np.random.default_rng(232)
    n = 900
    types = np.array(["view", "click", PRUNE_TYPE], object)[
        rng.integers(0, 3, n)
    ]
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 25, n).astype(np.int64),
            "ts": pd.Timestamp("2025-04-01"),
            "event_type": types,
            "value": 0.0,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = _to_df(q_events_partitioned_write_prune(str(tmp_path))).iloc[0]
    m = ev["event_type"] == PRUNE_TYPE
    assert got["n_rows"] == int(m.sum())
    assert got["n_users"] == ev.loc[m, "user_id"].nunique()
    assert got["sum_event_id"] == int(ev.loc[m, "event_id"].sum())
    assert 0 < int(m.sum()) < n  # pruning actually excluded rows
