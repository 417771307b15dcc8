"""Session-12 eighteenth wave (3-way join checksum / exactly-once
dedup) + combine-registry algebra: serial-replay exactness."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra34 import (
    JOIN_MOD,
    MASK63,
    q_events_exactly_once,
    q_threeway_join_checksum,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_threeway_checksum_matches_serial_and_detects_drops(tmp_path):
    rng = np.random.default_rng(221)
    cust = pd.DataFrame({"c_custkey": np.arange(30, dtype=np.int64)})
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(100, dtype=np.int64),
            "o_custkey": rng.integers(0, 40, 100).astype(np.int64),  # some orphans
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 120, 400).astype(np.int64),  # some orphans
            "l_linenumber": rng.integers(1, 8, 400).astype(np.int64),
        }
    )
    cust.to_parquet(tmp_path / "customer.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_threeway_join_checksum(str(tmp_path))).iloc[0]

    o_by_key = dict(zip(orders["o_orderkey"], orders["o_custkey"]))
    custs = set(cust["c_custkey"])
    ks = []
    for ok, ln in zip(li["l_orderkey"], li["l_linenumber"]):
        if ok in o_by_key and o_by_key[ok] in custs:
            c = o_by_key[ok]
            ks.append(
                int.from_bytes(
                    hashlib.md5(f"{c}:{ok}:{ln}".encode()).digest()[8:16], "little"
                )
                & MASK63
            )
    assert got["n_rows"] == len(ks)
    x = 0
    for k in ks:
        x ^= k
    assert got["xor_sig"] == x
    assert got["sum_mod"] == sum(ks) % JOIN_MOD
    assert len(ks) < len(li)  # orphans were actually filtered


def test_exactly_once_counts_duplicates(tmp_path):
    base = pd.Timestamp("2025-02-01")
    rows = [
        (0, 1, base, "click"),
        (1, 1, base, "click"),          # dup of 0 -> dropped
        (2, 1, base, "view"),           # different type -> kept
        (3, 2, base, "click"),          # different user -> kept
        (4, 1, base + pd.Timedelta(seconds=1), "click"),  # different ts
        (5, 1, base, "click"),          # another dup of 0 -> dropped
    ]
    ev = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    ev["value"] = 0.0
    ev.to_parquet(tmp_path / "events.parquet")

    got = _to_df(q_events_exactly_once(str(tmp_path))).iloc[0]
    assert got["n_kept"] == 4
    assert got["n_dropped"] == 2
    assert got["sum_kept_event_id"] == 0 + 2 + 3 + 4


def test_combine_registry_algebra():
    """Every combine in the engine registry is associative + commutative
    with its declared identity — the contract the scatter/apply fusion
    silently relies on for ANY partitioning."""
    from everythinggraph_ray.graph.engine import _COMBINE_UFUNC, _combine_identity

    rng = np.random.default_rng(222)
    for name, uf in _COMBINE_UFUNC.items():
        dtype = np.int64  # bitwise ops need ints; sum/min/max hold too
        a, b, c = (rng.integers(-1000, 1000, 50).astype(dtype) for _ in range(3))
        assert (uf(uf(a, b), c) == uf(a, uf(b, c))).all(), name
        assert (uf(a, b) == uf(b, a)).all(), name
        ident = np.int64(_combine_identity(name, dtype))
        assert (uf(a, ident) == a).all(), f"{name} identity"
