"""Borůvka MSF vs serial Kruskal under the identical (w, u, v) total
order — the forest is unique, so equality is exact."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from everythinggraph_ray.graph.msf import minimum_spanning_forest, msf_serial


def _ds(src, dst, w):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": np.asarray(src, np.int64),
                "dst": np.asarray(dst, np.int64),
                "weight": np.asarray(w, np.float64),
            }
        )
    )


def _run(src, dst, w, **kw):
    forest, rounds = minimum_spanning_forest(_ds(src, dst, w), **kw)
    got = forest.to_pandas()
    if got.empty:  # Ray drops the schema of a 0-row Dataset in to_pandas
        got = pd.DataFrame({"u": [], "v": [], "w": []})
    got = got.sort_values(["u", "v"]).reset_index(drop=True)
    return got, rounds


def test_matches_kruskal_random_graph():
    rng = np.random.default_rng(23)
    n = 150
    src = rng.integers(0, n, 600)
    dst = rng.integers(0, n, 600)
    w = (src % 10 + dst % 10).astype(np.float64)  # the synthesized rule: ties abound
    got, rounds = _run(src, dst, w)
    want = msf_serial(src, dst, w)
    pd.testing.assert_frame_equal(got, want)
    assert rounds >= 2  # multi-round Borůvka actually exercised
    # forest invariant: |MSF| = |V| - #components
    verts = np.unique(np.concatenate([src, dst]))
    import collections

    adj = collections.defaultdict(list)
    for a, b in zip(src.tolist(), dst.tolist()):
        adj[a].append(b)
        adj[b].append(a)
    seen, ncomp = set(), 0
    for v in verts.tolist():
        if v in seen:
            continue
        ncomp += 1
        stack = [v]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(adj[x])
    assert len(got) == len(verts) - ncomp


def test_disconnected_duplicates_self_loops():
    # two components, duplicate pair with differing weights (min wins),
    # self-loops dropped
    src = [0, 1, 0, 2, 2, 5, 6, 0]
    dst = [1, 0, 1, 0, 2, 6, 7, 0]
    w = [4.0, 2.0, 9.0, 3.0, 1.0, 1.0, 1.0, 8.0]
    got, _ = _run(src, dst, w)
    want = msf_serial(src, dst, w)
    pd.testing.assert_frame_equal(got, want)
    assert {(0, 1, 2.0), (0, 2, 3.0), (5, 6, 1.0), (6, 7, 1.0)} == {
        tuple(r) for r in got.itertuples(index=False)
    }


def test_empty_and_self_loop_only():
    got, rounds = _run([3, 4], [3, 4], [1.0, 1.0])
    assert len(got) == 0 and rounds == 0
    assert list(got.columns) == ["u", "v", "w"]
