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


def test_weighted_matching_equals_serial_and_beats_unweighted():
    """weighted=True equals the serial greedy in (weight DESC, md5)
    order on a random graph via the DISTRIBUTED rounds (tail disabled),
    and its matched weight is >= the unweighted greedy's (the whole
    point of the weight priority)."""
    import numpy as np

    import ray.data

    from everythinggraph_ray.graph.matching import (
        _ekeys,
        maximal_matching,
        matching_serial,
    )

    rng = np.random.default_rng(21)
    src = rng.integers(0, 60, 400).astype(np.int64)
    dst = rng.integers(0, 60, 400).astype(np.int64)
    edges = ray.data.from_arrow(
        __import__("pyarrow").table({"src": src, "dst": dst})
    ).repartition(5)

    # tail after a few distributed rounds: weight-stratified priorities
    # multiply the round count (~O(levels * log E)), so running to empty
    # distributed takes minutes; the fixpoint is identical wherever the
    # tail kicks in, and rounds >= 2 still proves the distributed path
    got, rounds = maximal_matching(
        edges, weighted=True, tail_threshold=120, num_buckets=4, max_rounds=200
    )
    got_set = {(int(a), int(b)) for a, b in zip(*[got.to_pandas()[c] for c in ("a", "b")])}
    exp = matching_serial(src, dst, weighted=True)
    assert got_set == exp
    assert rounds >= 2  # distributed rounds actually ran

    def wsum(pairs):
        return sum(a % 10 + b % 10 for a, b in pairs)

    unw = matching_serial(src, dst, weighted=False)
    assert wsum(exp) >= wsum(unw)
    # and the weighted key really orders by weight first
    ka = _ekeys([3], [9], weighted=True)[0]  # w=12 -> prefix 87
    kb = _ekeys([1], [2], weighted=True)[0]  # w=3  -> prefix 96
    assert ka < kb
