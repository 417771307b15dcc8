"""Serial NumPy oracles — the reference's kernel semantics, exactly.

These encode what /root/reference computes (NOT textbook variants); the
distributed engine must agree with them (allclose 1e-6 for PageRank, exact
for everything else). Single-process, dense-index, the way the reference
indexes ``nodes[]`` (random.h:107-109). Test-scale only.

Semantics provenance:
- PageRank: pagerank_simple.c:43-58,85-101,115-131 — damping 0.85,
  ``prev`` init 0.15 (NOT 1/N), per superstep
  ``rank[v] = (1-d)/N + d * sum_{u->v} prev[u]/outdeg[u]``; duplicate edges
  count with multiplicity; dangling mass is dropped (a dangling src just
  pushes nothing); reference runs 10 fixed iterations, we also support
  run-to-|delta|<tol per the north rule.
- WCC: wcc.c:211-216,244-249 — labels init to own id, min-label propagated
  SYMMETRICALLY along every edge, to fixpoint.
- BFS: bfs_simple.c:65-74,244 — dist init 0, root dist 1, unreached stays 0,
  level+1 per hop.
- SSSP (hops): sssp_pushpull.c:39-56 — push relaxes with +1 hop, self-loops
  skipped, dist init "infinity".
- SSSP (weighted): sssp_pushpull.c:69-98 — pull adds edge weight; weights
  synthesized ``src%10 + dst%10`` (init_all.c:663-666 CREATE_WEIGHT).
- SpMV: spmv.c:98-106,125-128 — one iteration, ``y[v] += 0.001 * x[u]``
  over in-edges, ``x[i] = i``.
- Triangles: absent in the reference (north-rule addition): exact count on
  the deduped, undirected, loop-free edge set.
"""

from __future__ import annotations

import numpy as np

UNREACHED = np.iinfo(np.int64).max  # "infinity" for SSSP (reference: UINT_MAX)


def vertex_universe(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Sorted unique vertex ids appearing as src or dst."""
    return np.unique(np.concatenate([src, dst]))


def _index(src, dst):
    vids = vertex_universe(src, dst)
    return vids, np.searchsorted(vids, src), np.searchsorted(vids, dst)


def pagerank_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    *,
    damping: float = 0.85,
    tol: float | None = 1e-6,
    max_iters: int = 200,
    n_iters: int | None = None,
):
    """Returns (vids, ranks float64, iterations). ``n_iters`` forces the
    reference's fixed-iteration mode; else iterate until max|Δ| < tol."""
    vids, s, d = _index(src, dst)
    n = len(vids)
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    prev = np.full(n, 0.15, dtype=np.float64)
    const = (1.0 - damping) / n
    it = 0
    limit = n_iters if n_iters is not None else max_iters
    while it < limit:
        contrib = prev[s] / outdeg[s]  # outdeg[s] >= 1 whenever s appears as src
        rank = np.zeros(n, dtype=np.float64)
        np.add.at(rank, d, contrib)
        rank = const + damping * rank
        delta = np.max(np.abs(rank - prev)) if n else 0.0
        prev = rank
        it += 1
        if n_iters is None and delta < tol:
            break
    return vids, prev, it


def pagerank_dangling_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    *,
    damping: float = 0.85,
    tol: float | None = 1e-6,
    max_iters: int = 200,
    n_iters: int | None = None,
):
    """TEXTBOOK PageRank: init 1/N, dangling mass redistributed uniformly
    each superstep (DanglingPageRankKernel semantics). Returns
    (vids, ranks, iterations); Σ rank is conserved at 1."""
    vids, s, d = _index(src, dst)
    n = len(vids)
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    dangling = outdeg == 0
    prev = np.full(n, 1.0 / max(1, n), dtype=np.float64)
    const = (1.0 - damping) / max(1, n)
    it = 0
    limit = n_iters if n_iters is not None else max_iters
    while it < limit:
        dm = float(prev[dangling].sum())
        contrib = prev[s] / outdeg[s]
        rank = np.zeros(n, dtype=np.float64)
        np.add.at(rank, d, contrib)
        rank = const + damping * (rank + dm / max(1, n))
        delta = np.max(np.abs(rank - prev)) if n else 0.0
        prev = rank
        it += 1
        if n_iters is None and delta < tol:
            break
    return vids, prev, it


def ppr_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    seed_mod: int,
    *,
    damping: float = 0.85,
    n_iters: int = 10,
):
    """Personalized PageRank serial oracle: teleport vector is uniform
    over the seed set (vid % seed_mod == 0); r0 = (1-d)*tele. Returns
    (vids, ranks float64)."""
    vids, s, d = _index(src, dst)
    n = len(vids)
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    seeds = vids % seed_mod == 0
    tele = seeds.astype(np.float64) / max(1, int(seeds.sum()))
    prev = (1.0 - damping) * tele
    for _ in range(n_iters):
        contrib = prev[s] / outdeg[s]
        rank = np.zeros(n, dtype=np.float64)
        np.add.at(rank, d, contrib)
        prev = (1.0 - damping) * tele + damping * rank
    return vids, prev


def wpagerank_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    *,
    damping: float = 0.85,
    n_iters: int = 10,
):
    """Weighted PageRank serial oracle: rank splits over out-edges
    proportionally to weight; zero-weight-sum srcs contribute nothing.
    Returns (vids, ranks float64)."""
    vids, s, d = _index(src, dst)
    n = len(vids)
    w = weight.astype(np.float64)
    wdeg = np.zeros(n, dtype=np.float64)
    np.add.at(wdeg, s, w)
    prev = np.full(n, 0.15, dtype=np.float64)
    const = (1.0 - damping) / n
    for _ in range(n_iters):
        msgs = np.divide(prev, wdeg, out=np.zeros_like(prev), where=wdeg > 0)
        rank = np.zeros(n, dtype=np.float64)
        np.add.at(rank, d, msgs[s] * w)
        prev = const + damping * rank
    return vids, prev


def katz_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    *,
    alpha: float = 0.01,
    beta: float = 1.0,
    n_iters: int = 10,
):
    """Katz centrality serial oracle: x0 = beta; x_k = beta + alpha *
    A^T x_{k-1} (no outdegree divide). Returns (vids, x float64)."""
    vids, s, d = _index(src, dst)
    n = len(vids)
    prev = np.full(n, beta, dtype=np.float64)
    for _ in range(n_iters):
        agg = np.zeros(n, dtype=np.float64)
        np.add.at(agg, d, prev[s])
        prev = beta + alpha * agg
    return vids, prev


def eigenvector_oracle(src: np.ndarray, dst: np.ndarray, *, n_iters: int = 10):
    """Eigenvector centrality serial oracle: x0 = 1;
    x_k = (A^T x_{k-1}) / ||x_{k-1}||_1. Returns (vids, x float64)."""
    vids, s, d = _index(src, dst)
    n = len(vids)
    prev = np.ones(n, dtype=np.float64)
    for _ in range(n_iters):
        agg = np.zeros(n, dtype=np.float64)
        np.add.at(agg, d, prev[s])
        prev = agg / (prev.sum() or 1.0)
    return vids, prev


def wcc_oracle(src: np.ndarray, dst: np.ndarray, labels: np.ndarray | None = None):
    """Symmetric min-label propagation to fixpoint. Returns (vids, labels).

    Default labels = the vid itself, so a component's final label is its
    minimum vid (the distributed analogue of wcc.c:131-134 components[i]=i).
    ``labels`` overrides the init (label-propagation mode)."""
    vids, s, d = _index(src, dst)
    lab = vids.copy().astype(np.int64) if labels is None else np.asarray(labels, np.int64).copy()
    while True:
        new = lab.copy()
        np.minimum.at(new, d, lab[s])
        np.minimum.at(new, s, lab[d])
        # propagate repeatedly within this pass until stable pass-to-pass
        if np.array_equal(new, lab):
            break
        lab = new
    return vids, lab


def bfs_oracle(src: np.ndarray, dst: np.ndarray, root: int):
    """Level BFS along OUT edges. dist init 0; dist[root]=1; unreached 0."""
    vids, s, d = _index(src, dst)
    dist = np.zeros(len(vids), dtype=np.int64)
    r = np.searchsorted(vids, root)
    if r >= len(vids) or vids[r] != root:
        return vids, dist
    dist[r] = 1
    frontier = np.array([r])
    while len(frontier):
        in_f = np.isin(s, frontier)
        cand = np.unique(d[in_f])
        new = cand[dist[cand] == 0]
        new = new[new != r]
        if not len(new):
            break
        level = dist[frontier[0]] + 1
        dist[new] = level
        frontier = new
    return vids, dist


def sssp_hops_oracle(src: np.ndarray, dst: np.ndarray, root: int):
    """Push-relax with +1 per hop (sssp_pushpull.c:46), self-loops skipped.
    dist[root]=0, unreached = UNREACHED sentinel."""
    vids, s, d = _index(src, dst)
    keep = s != d
    s, d = s[keep], d[keep]
    dist = np.full(len(vids), UNREACHED, dtype=np.int64)
    r = np.searchsorted(vids, root)
    if r >= len(vids) or vids[r] != root:
        return vids, dist
    dist[r] = 0
    while True:
        ok = dist[s] != UNREACHED
        cand = dist[s[ok]] + 1
        new = dist.copy()
        np.minimum.at(new, d[ok], cand)
        if np.array_equal(new, dist):
            break
        dist = new
    return vids, dist


def synth_weights(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """The reference's CREATE_WEIGHT rule w = src%10 + dst%10
    (init_all.c:663-666), applied to our 63-bit vids."""
    return (src % 10 + dst % 10).astype(np.float64)


def sssp_weighted_oracle(src, dst, root, weight: np.ndarray | None = None):
    """Min-plus relax with edge weights (sssp_pushpull.c:81 pull semantics),
    self-loops skipped; weights default to the synthesized rule."""
    w = synth_weights(src, dst) if weight is None else np.asarray(weight, np.float64)
    vids, s, d = _index(src, dst)
    keep = s != d
    s, d, w = s[keep], d[keep], w[keep]
    INF = np.inf
    dist = np.full(len(vids), INF)
    r = np.searchsorted(vids, root)
    if r >= len(vids) or vids[r] != root:
        return vids, dist
    dist[r] = 0.0
    while True:
        ok = np.isfinite(dist[s])
        cand = dist[s[ok]] + w[ok]
        new = dist.copy()
        np.minimum.at(new, d[ok], cand)
        if np.array_equal(new, dist):
            break
        dist = new
    return vids, dist


def widest_path_oracle(src, dst, root, cap_init: float = 1e18):
    """Max–min relax to fixpoint (widest / bottleneck path), self-loops
    skipped; weights = synthesized src%10 + dst%10. Unreached = -inf."""
    w = synth_weights(src, dst)
    vids, s, d = _index(src, dst)
    keep = s != d
    s, d, w = s[keep], d[keep], w[keep]
    cap = np.full(len(vids), -np.inf)
    r = np.searchsorted(vids, root)
    if r >= len(vids) or vids[r] != root:
        return vids, cap
    cap[r] = cap_init
    while True:
        ok = cap[s] != -np.inf
        cand = np.minimum(cap[s[ok]], w[ok])
        new = cap.copy()
        np.maximum.at(new, d[ok], cand)
        if np.array_equal(new, cap):
            break
        cap = new
    return vids, cap


def spmv_oracle(src: np.ndarray, dst: np.ndarray):
    """One gather step: y[v] = sum_{u->v} 0.001 * x[u], x[u] = u (spmv.c)."""
    vids, s, d = _index(src, dst)
    x = vids.astype(np.float64)
    y = np.zeros(len(vids))
    np.add.at(y, d, 0.001 * x[s])
    return vids, y


def triangles_oracle(src: np.ndarray, dst: np.ndarray) -> int:
    """Exact triangle count on the deduped, undirected, loop-free graph."""
    vids, s, d = _index(src, dst)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    und = np.unique(np.stack([lo, hi], axis=1), axis=0)
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    deg = {v: len(nb) for v, nb in adj.items()}

    def rank_of(v):
        return (deg[v], v)

    count = 0
    for a, b in und:
        a, b = int(a), int(b)
        u, v = (a, b) if rank_of(a) < rank_of(b) else (b, a)
        # count w adjacent to both with rank above both (each triangle once)
        for w in adj[u]:
            if rank_of(w) > rank_of(v) and w in adj[v]:
                count += 1
    return count


def spmv_edgecentric_oracle(src: np.ndarray, dst: np.ndarray):
    """Edge-centric SpMV (spmv.c:130-136): y[u] = sum_{u->v} x[v], x[v]=v,
    NO 0.001 factor — exact int64."""
    vids, s, d = _index(src, dst)
    y = np.zeros(len(vids), dtype=np.int64)
    np.add.at(y, s, vids[d])
    return vids, y
