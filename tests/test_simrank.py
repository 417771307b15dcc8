"""SimRank-2: serial equality on random graphs + hand-checked values."""

from __future__ import annotations

import itertools
from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data

from everythinggraph_ray.graph.simrank import simrank2


def _serial(edges, seeds, c=0.8):
    E = sorted(set(edges))
    I = defaultdict(set)
    for s, d in E:
        I[d].add(s)

    def s1(i, j):
        if i == j:
            return 1.0
        if not I[i] or not I[j]:
            return 0.0
        return c * len(I[i] & I[j]) / (len(I[i]) * len(I[j]))

    out = {}
    for a, b in itertools.combinations(sorted(seeds), 2):
        if not I[a] or not I[b]:
            continue
        tot = sum(s1(i, j) for i in I[a] for j in I[b])
        out[(a, b)] = round(c * tot / (len(I[a]) * len(I[b])), 7)
    return out


def _ds(edges, nparts=4):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(nparts)


def test_simrank_matches_serial_random():
    rng = np.random.default_rng(31)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 30, size=(400, 2))]
    seeds = [0, 1, 2, 3, 4]
    got = simrank2(_ds(edges), seeds)
    want = _serial(edges, seeds)
    assert {(int(r.seed_a), int(r.seed_b)): r.simrank for r in got.itertuples()} == want


def test_simrank_hand_checked():
    # I(10) = {1, 2}, I(11) = {1, 3}; 1,2,3 have no in-edges themselves.
    # s1 diag contributes for the shared parent 1; all other s1 = 0
    # (indeg-0 sides). s2 = 0.8 * 1 / (2*2) = 0.2
    edges = [(1, 10), (2, 10), (1, 11), (3, 11)]
    got = simrank2(_ds(edges, nparts=2), [10, 11])
    assert len(got) == 1
    assert got.iloc[0]["simrank"] == 0.2


def test_simrank_drops_inedgeless_seeds():
    edges = [(1, 10), (1, 11)]
    got = simrank2(_ds(edges, nparts=1), [10, 11, 99])  # 99 has no in-edges
    pairs = {(int(r.seed_a), int(r.seed_b)) for r in got.itertuples()}
    assert pairs == {(10, 11)}
