"""greedy_coloring (graph/coloring.py) vs the serial greedy oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from everythinggraph_ray.graph.coloring import coloring_serial, greedy_coloring


def _ds(df: pd.DataFrame) -> ray.data.Dataset:
    return ray.data.from_pandas(df.astype({"src": np.int64, "dst": np.int64}))


def _run(df: pd.DataFrame, **kw) -> tuple[dict[int, int], int]:
    out, rounds = greedy_coloring(_ds(df), **kw)
    pdf = out.to_pandas()
    got = dict(zip(pdf["vid"], pdf["color"])) if len(pdf) else {}
    return got, rounds


def test_matches_serial_greedy_random():
    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {"src": rng.integers(0, 60, 400), "dst": rng.integers(0, 60, 400)}
    )
    want = coloring_serial(df["src"].to_numpy(), df["dst"].to_numpy())
    # fully distributed (tail disabled) and with the serial tail: same map
    got_dist, r_dist = _run(df, tail_threshold=0)
    got_tail, _ = _run(df)
    # mixed rounds: some distributed, then the tail takes over
    got_mix, _ = _run(df, tail_threshold=20)
    assert got_dist == want
    assert got_tail == want
    assert got_mix == want
    assert r_dist >= 1


def test_coloring_is_proper_and_greedy_tight():
    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {"src": rng.integers(0, 50, 300), "dst": rng.integers(0, 50, 300)}
    )
    got, _ = _run(df, tail_threshold=0)
    adj: dict[int, set[int]] = {v: set() for v in got}
    for a, b in zip(df["src"], df["dst"]):
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    for v, c in got.items():
        nbr_colors = {got[w] for w in adj[v]}
        # proper: no neighbor shares v's color
        assert c not in nbr_colors
        # greedy-tight: every smaller color is used by some neighbor
        assert all(k in nbr_colors for k in range(c))


def test_coloring_edge_cases():
    # empty graph
    got, rounds = _run(pd.DataFrame({"src": [], "dst": []}))
    assert got == {} and rounds == 0
    # only self-loops: vertices exist, zero surviving edges -> all color 0
    got, rounds = _run(pd.DataFrame({"src": [3, 5], "dst": [3, 5]}))
    assert got == {3: 0, 5: 0} and rounds == 0
    # single edge (duplicated, both directions): a 2-coloring
    got, _ = _run(
        pd.DataFrame({"src": [1, 2, 1], "dst": [2, 1, 2]}), tail_threshold=0
    )
    assert sorted(got) == [1, 2] and sorted(got.values()) == [0, 1]
    # isolated vertex via self-loop + a real edge elsewhere
    got, _ = _run(pd.DataFrame({"src": [7, 1], "dst": [7, 2]}), tail_threshold=0)
    assert got[7] == 0 and {got[1], got[2]} == {0, 1}


def test_partition_invariance():
    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {"src": rng.integers(0, 40, 250), "dst": rng.integers(0, 40, 250)}
    )
    a, _ = _run(df, tail_threshold=0)
    out, _ = greedy_coloring(_ds(df).repartition(11), tail_threshold=0)
    pdf = out.to_pandas()
    b = dict(zip(pdf["vid"], pdf["color"]))
    assert a == b == coloring_serial(df["src"].to_numpy(), df["dst"].to_numpy())


def test_star_needs_two_colors_and_clique_needs_n():
    # star K(1,8): exactly 2 colors regardless of key order
    df = pd.DataFrame({"src": [0] * 8, "dst": list(range(1, 9))})
    got, _ = _run(df, tail_threshold=0)
    assert len(set(got.values())) == 2
    # clique K5: exactly 5 colors (greedy on a clique is optimal)
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    df = pd.DataFrame({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    got, _ = _run(df, tail_threshold=0)
    assert sorted(got.values()) == [0, 1, 2, 3, 4]
