"""edge_support / ktruss (graph/truss.py) vs serial brute force."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data

from everythinggraph_ray.graph.truss import edge_support, ktruss


def _simple(df: pd.DataFrame) -> set[tuple[int, int]]:
    out = set()
    for s, d in zip(df["src"], df["dst"]):
        if s != d:
            out.add((min(s, d), max(s, d)))
    return out


def _brute_support(es: set[tuple[int, int]]) -> pd.DataFrame:
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = [(a, b, len(adj[a] & adj[b])) for a, b in sorted(es)]
    return pd.DataFrame(rows, columns=["a", "b", "support"])


def _brute_ktruss(es: set[tuple[int, int]], k: int) -> set[tuple[int, int]]:
    cur = set(es)
    while True:
        sup = _brute_support(cur)
        drop = {(a, b) for a, b, s in sup.itertuples(index=False) if s < k - 2}
        if not drop:
            return cur
        cur -= drop


def _ds(df: pd.DataFrame) -> ray.data.Dataset:
    return ray.data.from_pandas(df.astype({"src": np.int64, "dst": np.int64}))


def _run_support(df: pd.DataFrame) -> pd.DataFrame:
    out = edge_support(_ds(df)).to_pandas()
    if out.empty:
        return out
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def test_support_matches_brute_force_random():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {"src": rng.integers(0, 60, 900), "dst": rng.integers(0, 60, 900)}
    )
    got = _run_support(df)
    want = _brute_support(_simple(df)).astype({c: np.int64 for c in ["a", "b", "support"]})
    pd.testing.assert_frame_equal(got, want)
    # one row per simple edge, support-0 rows included
    assert len(got) == len(_simple(df))


def test_support_closing_pair_not_in_value_order():
    # regression: K4 on vids chosen so the (deg, vid) orientation's closing
    # pair arrives in DESCENDING value order — each edge must still appear
    # exactly once, canonical, with support 2
    vids = [7, 3, 9, 1]
    edges = list(itertools.combinations(vids, 2))
    df = pd.DataFrame({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})
    got = _run_support(df)
    assert len(got) == 6
    assert (got["a"] < got["b"]).all()
    assert (got["support"] == 2).all()


def test_support_empty_and_triangle_free():
    assert len(edge_support(_ds(pd.DataFrame({"src": [], "dst": []}))).to_pandas()) == 0
    path = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4]})
    got = _run_support(path)
    assert (got["support"] == 0).all() and len(got) == 4


def test_ktruss_matches_brute_force():
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"src": rng.integers(0, 40, 700), "dst": rng.integers(0, 40, 700)}
    )
    es = _simple(df)
    for k in (3, 4, 5, 6):
        got, rounds = ktruss(_ds(df), k)
        gdf = got.to_pandas()
        kept = set(zip(gdf["a"], gdf["b"])) if len(gdf) else set()
        assert kept == _brute_ktruss(es, k), f"k={k}"
        assert rounds >= 1
        if len(gdf):
            # surviving supports are the fixpoint supports
            want = _brute_support(kept)
            merged = gdf.sort_values(["a", "b"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(
                merged, want.astype(merged.dtypes.to_dict()), check_like=True
            )
            assert (merged["support"] >= k - 2).all()


def test_ktruss_validates_k():
    with pytest.raises(ValueError):
        ktruss(_ds(pd.DataFrame({"src": [0], "dst": [1]})), 2)


def test_ktruss_max_rounds_guard():
    # two triangles sharing an edge: 4-truss peels everything; with
    # max_rounds=1 the guard returns the once-peeled, not-converged state
    df = pd.DataFrame({"src": [0, 0, 1, 1, 2], "dst": [1, 2, 2, 3, 3]})
    full, rounds = ktruss(_ds(df), 4)
    assert full.count() == 0 and rounds >= 2
    partial, rounds1 = ktruss(_ds(df), 4, max_rounds=1)
    assert rounds1 == 1
    # round 1 drops the 4 support-1 edges; the shared edge (1,2) survives
    # it and dies only in the (skipped) round 2
    pdf = partial.to_pandas()
    assert set(zip(pdf["a"], pdf["b"])) == {(1, 2)}


def test_cocitation_matches_brute_force():
    from collections import Counter

    from everythinggraph_ray.graph.linkpred import cocitation_topk

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"src": rng.integers(0, 30, 600), "dst": rng.integers(0, 50, 600)}
    )
    dist = set(zip(df["src"], df["dst"]))
    cnt = Counter()
    adj: dict[int, list[int]] = {}
    for s, d in dist:
        adj.setdefault(s, []).append(d)
    for s, nbs in adj.items():
        nbs = sorted(nbs)
        for i in range(len(nbs)):
            for j in range(i + 1, len(nbs)):
                cnt[(nbs[i], nbs[j])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = cocitation_topk(_ds(df), k=20).to_pandas()
    assert [((a, b), c) for a, b, c in zip(got["a"], got["b"], got["cnt"])] == want
    # center_cap drops hub centers only (recall trade, never overcounts)
    capped = cocitation_topk(_ds(df), k=20, center_cap=18).to_pandas()
    assert len(capped) > 0  # some centers fall under the cap
    for a, b, c in zip(capped["a"], capped["b"], capped["cnt"]):
        assert c <= cnt[(a, b)]


def test_butterflies_matches_brute_force():
    from everythinggraph_ray.graph.linkpred import butterfly_count

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {"src": rng.integers(0, 25, 400), "dst": rng.integers(100, 140, 400)}
    )
    dist = set(zip(df["src"], df["dst"]))
    # brute force: count K_{2,2} = pairs of srcs x pairs of dsts fully linked
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in dist:
        adj[s].add(d)
    srcs = sorted(adj)
    want = 0
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            c = len(adj[srcs[i]] & adj[srcs[j]])
            want += c * (c - 1) // 2
    got = butterfly_count(_ds(df))
    assert got == want
    # known shape: K_{2,2} has exactly 1 butterfly; K_{2,3} has C(3,2)=3
    k22 = pd.DataFrame({"src": [1, 1, 2, 2], "dst": [10, 11, 10, 11]})
    assert butterfly_count(_ds(k22)) == 1
    k23 = pd.DataFrame({"src": [1, 1, 1, 2, 2, 2], "dst": [10, 11, 12, 10, 11, 12]})
    assert butterfly_count(_ds(k23)) == 3
    assert butterfly_count(_ds(pd.DataFrame({"src": [], "dst": []}))) == 0
