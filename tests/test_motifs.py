"""four_clique_count / enumerate_triangles (graph/motifs.py) vs brute force."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

import ray.data

from everythinggraph_ray.graph.motifs import enumerate_triangles, four_clique_count


def _ds(df: pd.DataFrame) -> ray.data.Dataset:
    return ray.data.from_pandas(df.astype({"src": np.int64, "dst": np.int64}))


def _simple(df: pd.DataFrame) -> set[tuple[int, int]]:
    return {(min(s, d), max(s, d)) for s, d in zip(df["src"], df["dst"]) if s != d}


def _brute_k4(es: set[tuple[int, int]]) -> int:
    vs = sorted({v for e in es for v in e})
    return sum(
        1
        for q in itertools.combinations(vs, 4)
        if all((min(x, y), max(x, y)) in es for x, y in itertools.combinations(q, 2))
    )


def test_k4_matches_brute_force_random():
    rng = np.random.default_rng(8)
    df = pd.DataFrame({"src": rng.integers(0, 25, 250), "dst": rng.integers(0, 25, 250)})
    assert four_clique_count(_ds(df)) == _brute_k4(_simple(df))


def test_k4_closed_forms():
    # K5 contains C(5,4)=5 four-cliques; K4 exactly 1; C4 (square) none
    def clique(n):
        es = list(itertools.combinations(range(n), 2))
        return pd.DataFrame({"src": [a for a, _ in es], "dst": [b for _, b in es]})

    assert four_clique_count(_ds(clique(4))) == 1
    assert four_clique_count(_ds(clique(5))) == 5
    square = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0]})
    assert four_clique_count(_ds(square)) == 0
    assert four_clique_count(_ds(pd.DataFrame({"src": [], "dst": []}))) == 0


def test_triangle_enumeration_count_and_orientation():
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"src": rng.integers(0, 30, 300), "dst": rng.integers(0, 30, 300)})
    es = _simple(df)
    tris = enumerate_triangles(_ds(df)).to_pandas()
    # count matches brute force
    vs = sorted({v for e in es for v in e})
    want = sum(
        1
        for q in itertools.combinations(vs, 3)
        if all((min(x, y), max(x, y)) in es for x, y in itertools.combinations(q, 2))
    )
    assert len(tris) == want
    # each row is a genuine triangle, each triangle appears exactly once
    seen = set()
    for a, b, c in zip(tris["t1"], tris["t2"], tris["t3"]):
        key = tuple(sorted((a, b, c)))
        assert key not in seen
        seen.add(key)
        for x, y in itertools.combinations((a, b, c), 2):
            assert (min(x, y), max(x, y)) in es


def test_sampled_triangle_estimate_accuracy(tmp_path):
    """DOULION estimate lands near the exact count on a triangle-rich
    graph (deterministic md5 coin, so the 'sample' is fixed)."""
    import os

    import pyarrow.parquet as pq

    from everythinggraph_ray.pipelines.queries import q_rel_triangles, q_rel_triangles_sampled

    # synthesize a lineitem table whose derived graph is K60-ish: every
    # (orderkey % V, partkey % V) pair among 60 vids
    vids = np.arange(60)
    rows = [(a, b) for a in vids for b in vids if a != b]
    t = pd.DataFrame({"l_orderkey": [a for a, _ in rows], "l_partkey": [b for _, b in rows]})
    d = tmp_path / "sf"
    d.mkdir()
    t.to_parquet(d / "lineitem.parquet")
    res = q_rel_triangles(str(d))
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    exact = int(res.iloc[0, 0])
    est = q_rel_triangles_sampled(str(d)).iloc[0]
    assert exact == 60 * 59 * 58 // 6
    # p=1/2 on a dense graph: estimate within 40% (fixed sample, no flake)
    assert abs(est["estimate"] - exact) / exact < 0.4
    assert est["estimate"] == est["tri_sampled"] * 8


def test_four_cycles_matches_bruteforce():
    """four_cycle_count == O(V^4)-free serial reference (common-neighbor
    matrix identity) on random graphs, including the packed and the
    63-bit (two-column) pair paths."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.graph.triangles import four_cycle_count

    rng = np.random.default_rng(17)
    for n_v, big_vids in ((40, False), (30, True)):
        sv = rng.integers(0, n_v, 500).astype(np.int64)
        dv = rng.integers(0, n_v, 500).astype(np.int64)
        if big_vids:  # force the non-packed path: 63-bit vid offsets
            off = np.int64(1) << np.int64(40)
            sv, dv = sv + off, dv + off
        ds = ray.data.from_arrow(
            pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
        )
        got = four_cycle_count(ds)

        # serial: adjacency matrix A, W = A@A common-neighbor counts
        ids = np.unique(np.concatenate([sv, dv]))
        idx = {int(x): i for i, x in enumerate(ids)}
        A = np.zeros((len(ids), len(ids)), dtype=np.int64)
        for s, d in zip(sv, dv):
            if s != d:
                A[idx[int(s)], idx[int(d)]] = 1
                A[idx[int(d)], idx[int(s)]] = 1
        W = A @ A
        iu = np.triu_indices(len(ids), k=1)
        w = W[iu]
        want = int((w * (w - 1) // 2).sum()) // 2
        assert got == want and want > 0


def test_directed_triads_match_bruteforce():
    """directed_triad_counts == dense boolean-matrix reference, with
    reciprocal edges and both the 31-bit and 63-bit vid paths."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.graph.triangles import directed_triad_counts

    rng = np.random.default_rng(31)
    for n_v, off in ((30, 0), (25, np.int64(1) << np.int64(40))):
        sv = rng.integers(0, n_v, 400).astype(np.int64) + off
        dv = rng.integers(0, n_v, 400).astype(np.int64) + off
        ds = ray.data.from_arrow(
            pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
        )
        got = directed_triad_counts(ds)

        ids = np.unique(np.concatenate([sv, dv]))
        idx = {int(x): i for i, x in enumerate(ids)}
        A = np.zeros((len(ids), len(ids)), dtype=bool)
        for s, d in zip(sv, dv):
            if s != d:
                A[idx[int(s)], idx[int(d)]] = True
        trans = 0
        cyc3 = 0
        Ai = A.astype(np.int64)
        # wedges a->b->c (a != c): W = A@A minus the a==c diagonal walks
        W = Ai @ Ai
        np.fill_diagonal(W, 0)
        trans = int((W * Ai).sum())
        cyc3 = int((W * Ai.T).sum()) // 3
        assert got == (trans, cyc3), (got, (trans, cyc3))
        assert trans > 0 and cyc3 > 0
