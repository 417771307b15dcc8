"""One-level Louvain (parity-scheduled synchronous greedy modularity)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.graph.community import louvain_one_level, louvain_serial


def _modularity(src, dst, comm: dict[int, int]) -> float:
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    keep = lo != hi
    pairs = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    m = len(pairs)
    deg: dict[int, int] = {}
    for a, b in pairs.tolist():
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    e_in: dict[int, int] = {}
    for a, b in pairs.tolist():
        if comm[a] == comm[b]:
            e_in[comm[a]] = e_in.get(comm[a], 0) + 1
    tot: dict[int, int] = {}
    for v, d in deg.items():
        tot[comm[v]] = tot.get(comm[v], 0) + d
    return sum(
        e_in.get(c, 0) / m - (t / (2 * m)) ** 2 for c, t in tot.items()
    )


def _run_both(sv, dv, n_rounds=3):
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    )
    got = (
        louvain_one_level(ds, n_rounds=n_rounds)
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
        .astype("int64")
    )
    want = louvain_serial(sv, dv, n_rounds=n_rounds)
    return got, want


def test_louvain_matches_serial_on_planted_communities():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 40, 800)
    b = rng.integers(0, 40, 800)
    c = rng.integers(40, 80, 800)
    d = rng.integers(40, 80, 800)
    x = rng.integers(0, 80, 60)
    y = rng.integers(0, 80, 60)
    sv = np.concatenate([a, c, x]).astype(np.int64)
    dv = np.concatenate([b, d, y]).astype(np.int64)
    got, want = _run_both(sv, dv, n_rounds=2)
    pd.testing.assert_frame_equal(got, want)
    # the planted split is (mostly) recovered and modularity improves
    comm = dict(zip(want["vid"], want["community"]))
    q0 = _modularity(sv, dv, {v: v for v in comm})
    q1 = _modularity(sv, dv, comm)
    assert q1 > q0
    assert want["community"].nunique() < 20


def test_louvain_matches_serial_on_sparse_random():
    rng = np.random.default_rng(41)
    sv = rng.integers(0, 150, 450).astype(np.int64)
    dv = rng.integers(0, 150, 450).astype(np.int64)
    got, want = _run_both(sv, dv, n_rounds=2)
    pd.testing.assert_frame_equal(got, want)


def test_louvain_partition_invariant():
    rng = np.random.default_rng(9)
    sv = rng.integers(0, 120, 2000).astype(np.int64)
    dv = rng.integers(0, 120, 2000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    ).repartition(11)
    got = (
        louvain_one_level(ds, n_rounds=2)
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
        .astype("int64")
    )
    want = louvain_serial(sv, dv, n_rounds=2)
    pd.testing.assert_frame_equal(got, want)


def test_community_conductance_matches_serial():
    from everythinggraph_ray.graph.community import (
        community_conductance,
        louvain_one_level,
        louvain_serial,
    )

    rng = np.random.default_rng(17)
    src = rng.integers(0, 40, 500).astype(np.int64)
    dst = rng.integers(0, 40, 500).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(4)
    labels = louvain_one_level(ds, n_rounds=3)
    got = (
        community_conductance(ds, labels)
        .to_pandas()
        .sort_values("community")
        .reset_index(drop=True)
    )
    # serial: same simple undirected graph, same labels
    lab = dict(
        louvain_serial(src, dst, n_rounds=3)[["vid", "community"]].values.tolist()
    )
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    keep = lo != hi
    pairs = set(map(tuple, np.stack([lo[keep], hi[keep]], axis=1).tolist()))
    vol: dict[int, int] = {}
    cut: dict[int, int] = {}
    for a, b in pairs:
        ca, cb = lab[a], lab[b]
        vol[ca] = vol.get(ca, 0) + 1
        vol[cb] = vol.get(cb, 0) + 1
        if ca != cb:
            cut[ca] = cut.get(ca, 0) + 1
            cut[cb] = cut.get(cb, 0) + 1
    want = sorted((c, vol[c], cut.get(c, 0)) for c in vol)
    assert [tuple(r) for r in got[["community", "vol", "cut"]].values.tolist()] == want
