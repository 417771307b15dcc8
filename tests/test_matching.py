"""maximal_matching (graph/matching.py) vs the serial greedy oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from everythinggraph_ray.graph.matching import maximal_matching, matching_serial


def _ds(df: pd.DataFrame) -> ray.data.Dataset:
    return ray.data.from_pandas(df.astype({"src": np.int64, "dst": np.int64}))


def _run(df: pd.DataFrame, **kw) -> set[tuple[int, int]]:
    kw.setdefault("num_buckets", 4)
    out, rounds = maximal_matching(_ds(df), **kw)
    pdf = out.to_pandas()
    got = set(zip(pdf["a"], pdf["b"])) if len(pdf) else set()
    return got, rounds


def test_matches_serial_greedy_random():
    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {"src": rng.integers(0, 60, 400), "dst": rng.integers(0, 60, 400)}
    )
    want = matching_serial(df["src"].to_numpy(), df["dst"].to_numpy())
    # fully distributed (tail disabled) and with the serial tail: same set
    got_dist, r_dist = _run(df, tail_threshold=0)
    got_tail, _ = _run(df)
    assert got_dist == want
    assert got_tail == want
    assert r_dist >= 1


def test_matching_is_maximal_and_valid():
    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {"src": rng.integers(0, 50, 300), "dst": rng.integers(0, 50, 300)}
    )
    got, _ = _run(df, tail_threshold=0)
    used = [v for e in got for v in e]
    assert len(used) == len(set(used))  # no vertex matched twice
    simple = {(min(s, d), max(s, d)) for s, d in zip(df["src"], df["dst"]) if s != d}
    assert got <= simple
    free = {v for e in simple for v in e} - set(used)
    # maximality: no remaining edge has both endpoints free
    assert not any(a in free and b in free for a, b in simple)


def test_matching_edge_cases():
    # empty graph
    got, rounds = _run(pd.DataFrame({"src": [], "dst": []}))
    assert got == set() and rounds == 0
    # only self-loops
    got, _ = _run(pd.DataFrame({"src": [3, 5], "dst": [3, 5]}))
    assert got == set()
    # single edge (either direction, duplicated)
    got, _ = _run(pd.DataFrame({"src": [1, 2, 1], "dst": [2, 1, 2]}), tail_threshold=0)
    assert got == {(1, 2)}


def test_partition_invariance():
    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {"src": rng.integers(0, 40, 250), "dst": rng.integers(0, 40, 250)}
    )
    a, _ = _run(df, tail_threshold=0)
    out, _ = maximal_matching(_ds(df).repartition(11), tail_threshold=0, num_buckets=4)
    pdf = out.to_pandas()
    b = set(zip(pdf["a"], pdf["b"])) if len(pdf) else set()
    assert a == b == matching_serial(df["src"].to_numpy(), df["dst"].to_numpy())
