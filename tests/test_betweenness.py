"""Truncated-Brandes betweenness vs the serial oracle.

Covers: multi-path sigma counting (diamond), random-graph parity with
``betweenness_serial``, level-cap truncation, simple-digraph invariance
(duplicate edges / self-loops must not change sigma), and the packed-vid
precondition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from everythinggraph_ray.graph.betweenness import betweenness, betweenness_serial


def _ds(src, dst):
    return ray.data.from_pandas(
        pd.DataFrame({"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)})
    )


def _as_map(df):
    return dict(zip(df["vid"].tolist(), df["bc"].tolist()))


def test_diamond_hand_computed():
    # s→a, s→b, a→t, b→t: two shortest s→t paths, one through each of
    # a and b → delta(a) = delta(b) = sigma·(1+0)/sigma_t·... = 0.5 each,
    # delta(t) = 0 (no successors), bc(s) excluded as the source.
    df = betweenness(_ds([0, 0, 1, 2], [1, 2, 3, 3]), sources=[0])
    got = _as_map(df)
    assert got == {0: 0.0, 1: 0.5, 2: 0.5, 3: 0.0}


def test_matches_serial_oracle_random_graph():
    rng = np.random.default_rng(7)
    n = 120
    src = rng.integers(0, n, 900)
    dst = rng.integers(0, n, 900)
    sources = sorted(np.unique(np.concatenate([src, dst]))[:8].tolist())
    got = betweenness(_ds(src, dst), sources=sources, max_levels=12)
    want = betweenness_serial(src, dst, sources, max_levels=12)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # multi-path structure actually exercised (not a tree)
    assert (got["bc"] > 0).sum() > 10


def test_truncation_cap_respected():
    # path graph 0→1→…→9: with cap 3 only vertices within 3 hops of a
    # source contribute; serial oracle applies the identical cap.
    src = np.arange(9)
    dst = np.arange(1, 10)
    got = betweenness(_ds(src, dst), sources=[0], max_levels=3)
    want = betweenness_serial(src, dst, [0], max_levels=3)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # vertex 1 lies on paths to 2 and 3 only (cap): bc = 2, not 8
    assert _as_map(got)[1] == 2.0


def test_simple_digraph_invariance():
    # duplicate edges and self-loops must not multiply sigma
    src = [0, 0, 0, 0, 1, 2, 1]
    dst = [1, 1, 2, 0, 3, 3, 1]
    base = betweenness(_ds([0, 0, 1, 2], [1, 2, 3, 3]), sources=[0])
    noisy = betweenness(_ds(src, dst), sources=[0])
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), noisy.reset_index(drop=True)
    )


def test_vid_packing_precondition():
    with pytest.raises(ValueError, match="2\\^40"):
        betweenness(_ds([1 << 41], [1]), sources=[1 << 41])
