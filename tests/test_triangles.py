"""Triangle counting vs serial oracle."""

from __future__ import annotations

import numpy as np
import ray.data

from everythinggraph_ray.graph import oracle as O
from everythinggraph_ray.graph.triangles import triangle_count


def _edges_ds(sv, dv):
    import pyarrow as pa

    return ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    )


def test_known_triangles():
    # K4 has 4 triangles; add a dangling edge and a self-loop
    sv = np.array([0, 0, 0, 1, 1, 2, 3, 4], dtype=np.int64)
    dv = np.array([1, 2, 3, 2, 3, 3, 4, 4], dtype=np.int64)
    assert O.triangles_oracle(sv, dv) == 4
    assert triangle_count(_edges_ds(sv, dv)) == 4


def test_duplicates_and_direction_ignored():
    sv = np.array([0, 1, 2, 2, 1], dtype=np.int64)
    dv = np.array([1, 2, 0, 0, 0], dtype=np.int64)
    assert O.triangles_oracle(sv, dv) == 1
    assert triangle_count(_edges_ds(sv, dv)) == 1


def test_web_corpus_triangles(small_edges):
    sv, dv = small_edges
    want = O.triangles_oracle(sv, dv)
    got = triangle_count(_edges_ds(sv, dv))
    assert got == want


def _lcc_brute(sv, dv):
    from itertools import combinations

    und = {(min(a, b), max(a, b)) for a, b in zip(sv.tolist(), dv.tolist()) if a != b}
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    want = {}
    for v, ns in nbrs.items():
        t = sum(1 for x, y in combinations(sorted(ns), 2) if (x, y) in und)
        d = len(ns)
        w = d * (d - 1) // 2
        want[int(v)] = (d, t, (t / w if w else 0.0))
    return want


def test_local_clustering_matches_bruteforce():
    from everythinggraph_ray.graph.triangles import local_clustering

    rng = np.random.default_rng(5)
    sv = rng.integers(0, 25, 120)
    dv = rng.integers(0, 25, 120)
    got = {
        int(r["vid"]): (int(r["deg"]), int(r["tri"]), float(r["lcc"]))
        for r in local_clustering(_edges_ds(sv, dv)).take_all()
    }
    assert got == _lcc_brute(sv, dv)


def test_local_clustering_consistent_with_global_count():
    # sum(tri) over vertices == 3 * triangle_count, and the partitioned
    # degree attach (broadcast_threshold=0) agrees with the broadcast path
    from everythinggraph_ray.graph.triangles import local_clustering

    rng = np.random.default_rng(12)
    sv = rng.integers(0, 80, 600)
    dv = rng.integers(0, 80, 600)
    lcc = local_clustering(_edges_ds(sv, dv)).take_all()
    total = sum(r["tri"] for r in lcc)
    assert total == 3 * triangle_count(_edges_ds(sv, dv)) > 0
    part = local_clustering(_edges_ds(sv, dv), broadcast_threshold=0).take_all()
    assert sorted((r["vid"], r["deg"], r["tri"], r["lcc"]) for r in part) == sorted(
        (r["vid"], r["deg"], r["tri"], r["lcc"]) for r in lcc
    )


def test_local_clustering_empty():
    import pyarrow as pa

    from everythinggraph_ray.graph.triangles import local_clustering

    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    assert local_clustering(empty).count() == 0


def test_triangles_63bit_vids_and_partitioned_attach():
    """The general path: 63-bit vids (two-column close match) with the
    partitioned degree attach (broadcast_threshold=0) must count exactly
    the same triangles as the packed small-vid fast path."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.graph.triangles import triangle_count

    rng = np.random.default_rng(7)
    n = 30000
    src = rng.integers(0, 400, n)
    dst = rng.integers(0, 400, n)

    def ds_of(s, d):
        return ray.data.from_arrow(
            pa.table({"src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())})
        )

    small = triangle_count(ds_of(src, dst))
    shift = np.int64(1) << np.int64(40)  # vids >= 2^31 → two-column path
    big = triangle_count(ds_of(src + shift, dst + shift), broadcast_threshold=0)
    assert small == big > 0


def _cn_bruteforce(sv, dv, k):
    """Serial common-neighbor top-k over non-adjacent pairs."""
    import collections

    edges = set()
    adj = collections.defaultdict(set)
    for a, b in zip(sv.tolist(), dv.tolist()):
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        edges.add((lo, hi))
        adj[lo].add(hi)
        adj[hi].add(lo)
    cnt = collections.Counter()
    for u, nb in adj.items():
        ns = sorted(nb)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                if p not in edges:
                    cnt[p] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(a, b, c) for (a, b), c in ranked]


def test_link_predict_matches_bruteforce():
    from everythinggraph_ray.graph.linkpred import common_neighbors_topk

    rng = np.random.default_rng(11)
    sv = rng.integers(0, 60, 400).astype(np.int64)
    dv = rng.integers(0, 60, 400).astype(np.int64)
    got = (
        common_neighbors_topk(_edges_ds(sv, dv), k=15)
        .to_pandas()
        .itertuples(index=False)
    )
    assert [(int(a), int(b), int(c)) for a, b, c in got] == _cn_bruteforce(sv, dv, 15)


def test_link_predict_center_cap_drops_hub_wedges():
    from everythinggraph_ray.graph.linkpred import common_neighbors_topk

    # star around 0 (degree 5) plus one wedge through low-degree center 9
    sv = np.array([0, 0, 0, 0, 0, 9, 9], dtype=np.int64)
    dv = np.array([1, 2, 3, 4, 5, 1, 2], dtype=np.int64)
    full = common_neighbors_topk(_edges_ds(sv, dv), k=50).to_pandas()
    # C(5,2) leaf pairs via center 0, plus (0,9) via centers 1 and 2
    assert len(full) == 11
    assert int(full[(full["a"] == 1) & (full["b"] == 2)]["cnt"].iloc[0]) == 2
    assert int(full[(full["a"] == 0) & (full["b"] == 9)]["cnt"].iloc[0]) == 2
    capped = common_neighbors_topk(_edges_ds(sv, dv), k=50, center_cap=3).to_pandas()
    # hub center 0 (degree 5) skipped; only degree-2 centers 1, 2, 9 emit
    assert [(int(r.a), int(r.b), int(r.cnt)) for r in capped.itertuples()] == [
        (0, 9, 2),
        (1, 2, 1),
    ]


def test_link_predict_empty_graph():
    from everythinggraph_ray.graph.linkpred import common_neighbors_topk

    sv = np.array([3], dtype=np.int64)  # a single self-loop: no simple edges
    dv = np.array([3], dtype=np.int64)
    assert common_neighbors_topk(_edges_ds(sv, dv), k=5).count() == 0


def test_link_predict_jaccard_matches_bruteforce():
    import collections

    from everythinggraph_ray.graph.linkpred import common_neighbors_topk

    rng = np.random.default_rng(13)
    sv = rng.integers(0, 50, 300).astype(np.int64)
    dv = rng.integers(0, 50, 300).astype(np.int64)
    got = common_neighbors_topk(_edges_ds(sv, dv), k=12, score="jaccard").to_pandas()

    edges, adj = set(), collections.defaultdict(set)
    for a, b in zip(sv.tolist(), dv.tolist()):
        if a != b:
            lo, hi = min(a, b), max(a, b)
            edges.add((lo, hi))
            adj[lo].add(hi)
            adj[hi].add(lo)
    scored = []
    for u, nb in adj.items():
        ns = sorted(nb)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                if p not in edges:
                    scored.append(p)
    rows = {}
    for a, b in set(scored):
        c = len(adj[a] & adj[b])
        rows[(a, b)] = (c, c / (len(adj[a]) + len(adj[b]) - c))
    want = sorted(rows.items(), key=lambda kv: (-kv[1][1], kv[0]))[:12]
    got_t = [
        (int(r.a), int(r.b), int(r.cnt), float(r.jaccard)) for r in got.itertuples()
    ]
    assert got_t == [(a, b, c, j) for (a, b), (c, j) in want]
