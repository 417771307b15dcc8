"""Vertex-program kernels for the superstep engine (SURVEY.md §2.j / §2.k).

The reference's extension surface is a 4-function vtable per algorithm
(``struct algo_func`` random.h:64-69). Ours is a picklable Kernel object
with vectorized numpy methods; the engine (engine.py) drives it inside the
partition actors:

  scatter:  per-src message  = ``src_messages(value[src], outdeg[src])``
            per-edge message = ``edge_values(per_src_expanded, weight)``
  combine:  'sum' or 'min' — partial-aggregated per partition, re-aggregated
            at the destination owner (the distributed replacement for the
            reference's atomic write_add / writeMin CAS loops,
            pagerank_simple.c:31-36, wcc.c:21-27)
  apply:    ``apply(old, agg, has_msg, ctx) -> (new, changed_mask, delta)``

Frontier kernels (``frontier=True``) scatter only from vertices changed in
the previous superstep; the driver stops when no vertex changes. Value
kernels stop on ``delta < tol`` (or a fixed iteration count).
"""

from __future__ import annotations

import numpy as np

UNREACHED = np.iinfo(np.int64).max


class Kernel:
    name = "kernel"
    combine = "sum"  # 'sum' | 'min' | 'max' | 'or' | 'and' (engine._COMBINE_UFUNC)
    frontier = False
    needs_weights = False
    skip_self_loops = False
    fixed_iters: int | None = None
    dtype = np.float64
    # min-semiring kernels may RE-SEND a vertex's current value at any time
    # without changing the fixpoint (idempotent, monotone) — this is what
    # lets the engine switch to the dense precomputed scatter when the
    # frontier is large, the analogue of the reference's push<->pull
    # direction switch (bfs_simple.c:191 threshold nb_edges/20)
    resend_safe = False

    def send_mask(self, vals: np.ndarray):
        """For resend-safe kernels: which vertices hold a sendable value
        (None = all). E.g. BFS must not send from unvisited vertices."""
        return None

    # kernels that need a small per-superstep aggregate beyond the
    # engine's (delta, changed, messages) — e.g. MS-BFS per-source level
    # counts — set has_extra_stats and return a fixed-size int vector;
    # the driver sums it across partitions into metrics[i]["extra"]
    has_extra_stats = False

    def extra_stats(self, old: np.ndarray, new: np.ndarray, changed: np.ndarray, ctx: dict):
        return None

    # Pregel-style aggregator: kernels that need ONE global scalar per
    # superstep (dangling rank mass, a global norm) set needs_global and
    # return their partition's contribution from CURRENT values; the
    # driver sums the P floats and the total arrives in the NEXT apply
    # as ctx["global_in"] (seeded from post-init/post-resume values).
    needs_global = False

    def global_partial(self, vals: np.ndarray, outdeg: np.ndarray, ctx: dict) -> float:
        return 0.0

    def init_values(self, vids: np.ndarray, outdeg: np.ndarray, ctx: dict) -> np.ndarray:
        raise NotImplementedError

    def init_active(self, vids: np.ndarray, ctx: dict) -> np.ndarray:
        return np.ones(len(vids), dtype=bool)

    def src_messages(self, vals: np.ndarray, outdeg: np.ndarray) -> np.ndarray:
        return vals

    def src_messages2(self, vals: np.ndarray, outdeg: np.ndarray, vids: np.ndarray) -> np.ndarray:
        """Message hook that also sees the SENDER vids (parent-tracking
        kernels pack them into the message); defaults to src_messages."""
        return self.src_messages(vals, outdeg)

    # set by kernels whose messages divide by the per-src SUM of edge
    # weights (weight-proportional splitting); the engine then supplies
    # the build's global woutdeg via src_messages_w and requires a
    # weighted build
    needs_weighted_outdeg = False

    def src_messages_w(
        self, vals: np.ndarray, outdeg: np.ndarray, woutdeg: np.ndarray
    ) -> np.ndarray:
        return self.src_messages(vals, outdeg)

    def edge_values(self, per_edge: np.ndarray, weights: np.ndarray | None) -> np.ndarray:
        return per_edge

    def apply(self, old, agg, has_msg, ctx):
        raise NotImplementedError


class PageRankKernel(Kernel):
    """Reference PageRank (pagerank_simple.c): prev init 0.15, per superstep
    rank[v] = (1-d)/N + d * sum_{u->v} prev[u]/outdeg[u]; duplicate edges add
    multiplicity; dangling mass dropped. float64 (reference is float32; the
    1e-6 convergence target requires doubles)."""

    name = "pagerank"
    combine = "sum"

    def __init__(self, damping: float = 0.85):
        self.damping = damping

    def init_values(self, vids, outdeg, ctx):
        return np.full(len(vids), 0.15, dtype=np.float64)

    def src_messages(self, vals, outdeg):
        # outdeg >= 1 for every vertex that appears as a src
        return vals / np.maximum(outdeg, 1)

    def apply(self, old, agg, has_msg, ctx):
        new = (1.0 - self.damping) / max(1, ctx["n_vertices"]) + self.damping * agg
        delta = float(np.max(np.abs(new - old))) if len(old) else 0.0
        return new, np.ones(len(old), dtype=bool), delta


class DanglingPageRankKernel(PageRankKernel):
    """TEXTBOOK PageRank (Brin/Page with dangling-mass redistribution) —
    the variant the reference deliberately drops (pagerank_simple.c loses
    dangling contributions; our PageRankKernel replicates that). Init
    1/N; superstep: rank[v] = (1−d)/N + d·(Σ_{u→v} prev[u]/deg[u] +
    D/N) where D = Σ_{dangling u} prev[u] rides the engine's new
    Pregel-style aggregator channel (needs_global): each partition's
    dangling partial is one float to the driver per superstep, the total
    returns in ctx["global_in"]. Rank mass is conserved (Σ rank → 1),
    the property the reference variant lacks."""

    name = "pagerank_dangling"
    needs_global = True

    def init_values(self, vids, outdeg, ctx):
        return np.full(len(vids), 1.0 / max(1, ctx["n_vertices"]), dtype=np.float64)

    def global_partial(self, vals, outdeg, ctx):
        return float(vals[outdeg == 0].sum())

    def apply(self, old, agg, has_msg, ctx):
        n = max(1, ctx["n_vertices"])
        dm = float(ctx.get("global_in", 0.0))
        new = (1.0 - self.damping) / n + self.damping * (agg + dm / n)
        delta = float(np.max(np.abs(new - old))) if len(old) else 0.0
        return new, np.ones(len(old), dtype=bool), delta


def _load_warm_state(state_dir: str, vids, ctx, cold, dtype) -> "np.ndarray":
    """Per-partition warm-start state load (the storage-seam pattern
    shared by WarmStartPageRankKernel and WarmStartWCCKernel): read ONLY
    this partition's ``part-{pid}.parquet`` from a prior
    ``GraphEngine.save_state`` dir — no O(V) broadcast, no driver state.
    Alignment is by sorted-vid searchsorted: vertices new since the
    prior run keep the ``cold`` init, removed vertices are ignored.
    Validates the _SUCCESS marker (marker-less = crashed half-write) and
    the partition count in meta.json."""
    import os

    import pyarrow.parquet as pq

    from everythinggraph_ray.state.fs import fs_exists, read_json

    fs = ctx["fs"]
    if not fs_exists(fs, os.path.join(state_dir, "_SUCCESS")):
        raise ValueError(
            f"warm-start state dir {state_dir!r} has no _SUCCESS "
            "marker (missing or incomplete save_state output)"
        )
    meta_path = os.path.join(state_dir, "meta.json")
    if fs_exists(fs, meta_path):
        meta = read_json(fs, meta_path)
        if int(meta.get("P", ctx["n_partitions"])) != int(ctx["n_partitions"]):
            raise ValueError(
                f"warm-start state has P={meta.get('P')} but this build has "
                f"P={ctx['n_partitions']} — repartition the state first"
            )
    vals = cold
    part = os.path.join(state_dir, f"part-{ctx['pid']:05d}.parquet")
    if fs_exists(fs, part):
        t = pq.read_table(part, filesystem=fs)
        pv = t["vid"].to_numpy(zero_copy_only=False)
        pr = t["value"].to_numpy(zero_copy_only=False).astype(dtype)
        idx = np.searchsorted(pv, vids)
        idx_c = np.minimum(idx, max(len(pv) - 1, 0))
        ok = (idx < len(pv)) & (pv[idx_c] == vids) if len(pv) else np.zeros(len(vids), bool)
        vals[ok] = pr[idx[ok]]
    return vals


class WarmStartPageRankKernel(PageRankKernel):
    """Incremental PageRank: start power iteration from a PREVIOUS run's
    ranks instead of the 0.15 init — the daily-recrawl pattern (graph
    grew by a delta; the old fixpoint is an excellent first guess, so
    convergence takes a fraction of the supersteps). Each partition
    reads ONLY its own ``part-{pid}.parquet`` from the prior
    ``GraphEngine.save_state`` dir via the ctx storage seam — no O(V)
    broadcast, no driver state. Alignment is by sorted-vid searchsorted:
    vertices new since the prior run fall back to the cold 0.15 init,
    removed vertices are ignored. Requires the prior state to be
    partitioned with the same P and vid%P convention (save_state
    guarantees it; meta.json is validated)."""

    name = "pagerank_warm"

    def __init__(self, state_dir: str, damping: float = 0.85):
        super().__init__(damping)
        self.state_dir = state_dir

    def init_values(self, vids, outdeg, ctx):
        # _SUCCESS is written LAST by save_state: a marker-less dir is a
        # crashed half-write — fail loudly rather than silently cold-init
        # (the fixpoint would still be correct, but the operator asked
        # for a warm start and should know it isn't getting one)
        cold = np.full(len(vids), 0.15, dtype=np.float64)
        return _load_warm_state(self.state_dir, vids, ctx, cold, np.float64)


class PersonalizedPageRankKernel(PageRankKernel):
    """Personalized PageRank: teleport mass lands only on a seed set
    instead of uniformly (same scatter/combine as PageRankKernel —
    pagerank_simple.c:31-36 semantics — different apply). Seeds are
    ``vid % seed_mod == 0`` so the rule is reproducible everywhere (SQL
    oracle, resumes, any cluster size) with no shipped seed list;
    ``n_seeds`` is the GLOBAL seed count (counted by the caller — a
    partition only sees its own vids). The per-partition teleport vector
    is stashed in ``init_values`` (each actor deserializes its own kernel
    copy, so per-partition state on self is safe)."""

    name = "ppr"

    def __init__(self, seed_mod: int, n_seeds: int, damping: float = 0.85):
        super().__init__(damping)
        if n_seeds < 1:
            raise ValueError("personalized PageRank needs at least one seed")
        self.seed_mod = int(seed_mod)
        self.n_seeds = int(n_seeds)

    def init_values(self, vids, outdeg, ctx):
        self._tele = (vids % self.seed_mod == 0).astype(np.float64) / self.n_seeds
        # r0 = (1-d)*tele: the rank after zero link-follow steps
        return (1.0 - self.damping) * self._tele

    def apply(self, old, agg, has_msg, ctx):
        new = (1.0 - self.damping) * self._tele + self.damping * agg
        delta = float(np.max(np.abs(new - old))) if len(old) else 0.0
        return new, np.ones(len(old), dtype=bool), delta


class WeightedPageRankKernel(PageRankKernel):
    """Weight-proportional PageRank: a src splits its rank over
    out-edges proportionally to edge weight, rank[v] = (1-d)/N +
    d * Σ_{u→v} prev[u] * w_uv / wdeg[u] where wdeg is the GLOBAL sum of
    u's out-edge weights (carried in the weighted build's verts table —
    a local sum would undercount mirror-split hubs). A src whose weights
    all sum to 0 contributes nothing (message 0, matching the oracle's
    wd > 0 filter). Same apply as PageRankKernel."""

    name = "wpagerank"
    needs_weights = True
    needs_weighted_outdeg = True

    def src_messages_w(self, vals, outdeg, woutdeg):
        return np.divide(
            vals, woutdeg, out=np.zeros_like(vals, dtype=np.float64), where=woutdeg > 0
        )

    def edge_values(self, per_edge, weights):
        return per_edge * weights


class KatzKernel(Kernel):
    """Katz centrality, x[v] = beta + alpha * sum_{u->v} x[u] per
    superstep (same gather-scatter as PageRank — pagerank_simple.c:31-36
    machinery — WITHOUT the outdegree divide, so hub mass amplifies
    through high-degree paths instead of splitting). x0 = beta. Run
    fixed-iteration (the reference's -i mode); alpha must be < 1/lambda_max
    for the open-ended mode to converge."""

    name = "katz"
    combine = "sum"

    def __init__(self, alpha: float = 0.01, beta: float = 1.0):
        self.alpha = float(alpha)
        self.beta = float(beta)

    def init_values(self, vids, outdeg, ctx):
        return np.full(len(vids), self.beta, dtype=np.float64)

    def apply(self, old, agg, has_msg, ctx):
        new = self.beta + self.alpha * agg
        delta = float(np.max(np.abs(new - old))) if len(old) else 0.0
        return new, np.ones(len(old), dtype=bool), delta


class EigenvectorKernel(Kernel):
    """Eigenvector centrality by L1-normalized power iteration:
    x_{t+1}[v] = (Σ_{u→v} x_t[u]) / ‖x_t‖₁. Same gather-scatter as
    PageRank (pagerank_simple.c:31-36 machinery) but the per-superstep
    normalizer is a GLOBAL scalar, so it rides the Pregel-style
    aggregator channel (needs_global): each partition ships one float
    (its Σ x_t partial) to the driver per superstep and the total comes
    back in ctx["global_in"]. Duplicate edges add multiplicity, matching
    the engine's scatter and the SQL oracle's plain edge join. x0 = 1.
    Fixed-iteration mode (the reference's -i flag); convergence mode
    stops on max|Δ| like PageRank."""

    name = "eigenvector"
    combine = "sum"
    needs_global = True

    def init_values(self, vids, outdeg, ctx):
        return np.ones(len(vids), dtype=np.float64)

    def global_partial(self, vals, outdeg, ctx):
        return float(vals.sum())

    def apply(self, old, agg, has_msg, ctx):
        norm = float(ctx.get("global_in", 0.0)) or 1.0
        new = agg / norm
        delta = float(np.max(np.abs(new - old))) if len(old) else 0.0
        return new, np.ones(len(old), dtype=bool), delta


class HittingTimeKernel(Kernel):
    """Truncated hitting time to a seed set (Sarkar & Moore's random-walk
    proximity): h(v) = 0 for seeds (vid % seed_mod == 0, the repo's
    reproducible no-shipped-list seed rule shared with PPR); otherwise
    h(v) = min(T, 1 + Σ_u P(v,u)·h(u)) over v's ORIGINAL out-neighbors,
    with P(v,u) = multiplicity/outdeg(v), iterated T = horizon supersteps
    from h0 = T; a vertex with no out-edges stays at T (the truncation
    value). Because v gathers from its out-neighbors, this kernel runs on
    the REVERSED edge build with per-edge weight 1/outdeg_orig(original
    src) — then the engine's push scatter delivers exactly Σ h(u)/outdeg(v)
    to v (same gather-scatter as PageRank, pagerank_simple.c:31-36
    machinery, reversed orientation). Run with n_iters=horizon."""

    name = "hitting"
    combine = "sum"
    needs_weights = True

    def __init__(self, seed_mod: int, horizon: int):
        if horizon < 1 or seed_mod < 1:
            raise ValueError("hitting time needs horizon >= 1 and seed_mod >= 1")
        self.seed_mod = int(seed_mod)
        self.horizon = float(horizon)

    def init_values(self, vids, outdeg, ctx):
        self._seed = vids % self.seed_mod == 0
        v = np.full(len(vids), self.horizon, dtype=np.float64)
        v[self._seed] = 0.0
        return v

    def edge_values(self, per_edge, weights):
        return per_edge * weights

    def apply(self, old, agg, has_msg, ctx):
        new = np.where(has_msg, np.minimum(self.horizon, 1.0 + agg), self.horizon)
        new[self._seed] = 0.0
        delta = float(np.max(np.abs(new - old))) if len(old) else 0.0
        return new, np.ones(len(old), dtype=bool), delta


class WCCKernel(Kernel):
    """Symmetric min-label propagation (wcc.c:211-216): labels init to own
    vid; run on the UNDIRECTED edge table (build with undirect=True) which is
    equivalent to the reference's both-direction writeMin per edge."""

    name = "wcc"
    combine = "min"
    frontier = True
    dtype = np.int64
    resend_safe = True

    def init_values(self, vids, outdeg, ctx):
        return vids.astype(np.int64).copy()

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        improved = has_msg & (agg < old)
        new[improved] = agg[improved]
        return new, improved, 0.0


class LabelPropKernel(WCCKernel):
    """Label propagation: WCC machinery with arbitrary initial labels
    (min-semiring). ``seeds`` maps vid -> label; unseeded vertices start at
    their own vid (so with no seeds this IS wcc)."""

    name = "labelprop"

    def __init__(self, seeds: dict[int, int] | None = None):
        self.seeds = seeds or {}

    def init_values(self, vids, outdeg, ctx):
        lab = vids.astype(np.int64).copy()
        if self.seeds and len(vids):  # len guard: a partition may own no vertices
            svids = np.fromiter(self.seeds.keys(), dtype=np.int64, count=len(self.seeds))
            slabs = np.fromiter(self.seeds.values(), dtype=np.int64, count=len(self.seeds))
            idx = np.searchsorted(vids, svids)
            ok = (idx < len(vids)) & (vids[np.minimum(idx, len(vids) - 1)] == svids)
            lab[idx[ok]] = slabs[ok]
        return lab


class WarmStartWCCKernel(WCCKernel):
    """Incremental WCC (the daily-recrawl pattern for components): min-
    label propagation warm-started from a PRIOR run's labels read
    partition-local through the storage seam (same layout and
    validation as WarmStartPageRankKernel, via _load_warm_state).
    Exactness, not just a good guess: a prior label L(v) is the min vid
    of v's sub-component over the OLD edge subset, so L(v) <= v and
    L(v) lies in v's component of the grown graph (old edges are a
    subset); the min-semiring fixpoint is min over each full component
    of the initial labels = the component's min vid — bit-identical to
    cold WCC, reached in a fraction of the supersteps because labels
    start pre-propagated. Vertices new since the prior run cold-init to
    their own vid."""

    name = "wcc_warm"

    def __init__(self, state_dir: str):
        self.state_dir = state_dir

    def init_values(self, vids, outdeg, ctx):
        cold = vids.astype(np.int64).copy()
        return _load_warm_state(self.state_dir, vids, ctx, cold, np.int64)


class BFSKernel(Kernel):
    """Level BFS (bfs_simple.c edge-centric semantics): dist init 0, root
    dist 1, unreached stays 0, dist[dst] = dist[src]+1 on first touch."""

    name = "bfs"
    combine = "min"
    frontier = True
    dtype = np.int64
    resend_safe = True

    def send_mask(self, vals):
        return vals != 0  # unvisited vertices (dist 0) hold nothing to send

    def __init__(self, root: int):
        self.root = root

    def init_values(self, vids, outdeg, ctx):
        d = np.zeros(len(vids), dtype=np.int64)
        i = np.searchsorted(vids, self.root)
        if i < len(vids) and vids[i] == self.root:
            d[i] = 1
        return d

    def init_active(self, vids, ctx):
        a = np.zeros(len(vids), dtype=bool)
        i = np.searchsorted(vids, self.root)
        if i < len(vids) and vids[i] == self.root:
            a[i] = True
        return a

    def src_messages(self, vals, outdeg):
        return vals + 1

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        touch = has_msg & (old == 0)
        new[touch] = agg[touch]
        return new, touch, 0.0


class MultiSourceBFSKernel(Kernel):
    """Bit-parallel multi-source BFS (MS-BFS, Then et al. VLDB'14): the
    vertex state is an int64 BITMASK of sources that have reached it, and
    the combine semiring is bitwise OR — idempotent and monotone like
    writeMin, so the engine's dense-resend direction switch applies
    unchanged (bfs_simple.c:191 semantics, 63 BFS frontiers per pass).
    Bit i of the mask belongs to ``sources[i]`` (sorted, <= 63 of them so
    the int64 sign bit stays clear); a bit arrives at vertex v exactly at
    superstep dist(source_i, v) — the per-superstep ``extra_stats``
    vector (newly-reached count per source) therefore gives the full
    per-source level histogram, from which closeness/harmonic centrality
    of the sources follows without per-vertex distance storage."""

    name = "msbfs"
    combine = "or"
    frontier = True
    dtype = np.int64
    resend_safe = True
    has_extra_stats = True

    def __init__(self, sources):
        srcs = sorted({int(s) for s in sources})
        if not 1 <= len(srcs) <= 63:
            raise ValueError(f"msbfs needs 1..63 distinct sources, got {len(srcs)}")
        self.sources = srcs

    def send_mask(self, vals):
        return vals != 0

    def _seed(self, vids: np.ndarray) -> np.ndarray:
        v = np.zeros(len(vids), dtype=np.int64)
        if len(vids):
            svids = np.asarray(self.sources, dtype=np.int64)
            idx = np.searchsorted(vids, svids)
            ok = (idx < len(vids)) & (vids[np.minimum(idx, len(vids) - 1)] == svids)
            bits = np.int64(1) << np.arange(len(svids), dtype=np.int64)
            np.bitwise_or.at(v, idx[ok], bits[ok])
        return v

    def init_values(self, vids, outdeg, ctx):
        return self._seed(vids)

    def init_active(self, vids, ctx):
        return self._seed(vids) != 0

    def apply(self, old, agg, has_msg, ctx):
        new = old | np.where(has_msg, agg, np.int64(0))
        return new, new != old, 0.0

    def extra_stats(self, old, new, changed, ctx):
        """Newly-set bit count per source this superstep (len(sources)
        ints). Loop over the <=63 bits, not a V x 63 matrix — bounded
        transient memory at any partition size."""
        diff = new & ~old
        return np.array(
            [int(np.count_nonzero(diff & (np.int64(1) << np.int64(i)))) for i in range(len(self.sources))],
            dtype=np.int64,
        )


def _lsb0_16_lut() -> np.ndarray:
    """Position of the lowest ZERO bit for every 16-bit value (0..16)."""
    x = np.arange(1 << 16, dtype=np.uint32)
    out = np.full(len(x), 16, dtype=np.int64)
    for p in range(15, -1, -1):  # descending so the lowest position wins
        out[(x >> p) & 1 == 0] = p
    return out


class ANFKernel(Kernel):
    """Approximate Neighborhood Function (ANF, Palmer et al. KDD'02 —
    the HyperANF/WebGraph effective-diameter lineage): each vertex packs
    ``n_trials`` Flajolet–Martin bitmask sketches into its single int64
    (16 bits per trial), initialized deterministically from
    splitmix64(vid ^ trial-salt) — no RNG, resume/cluster-size stable.
    The combine semiring is bitwise OR (idempotent + monotone, the
    MS-BFS machinery), so after superstep h vertex v's sketch is the
    FM-union over every u with dist(u→v) <= h, and Σ_v |ball(v,h)| — the
    aggregate N(h) — is direction-agnostic (in-balls and out-balls count
    the same (u,v) pairs).

    The per-superstep ``extra_stats`` vector is the 64-bin histogram of
    Σ_t lsb0(sketch_t(v)) across owned vertices; the driver recovers
    N(h) = Σ_bins cnt[b] · 2^(b/k) / 0.77351 — per-vertex geometric
    averaging over trials exactly as the ANF paper, with no per-vertex
    state ever leaving the actors.

    Scale note: 16-bit sketches saturate near ball sizes ~2^15/0.77, so
    per-ball estimates cap there (aggregate N(h) then undercounts on
    larger graphs — widen to 2 trials x 32 bits via ``bits=32`` for
    billion-vertex runs; error grows as ~0.78/sqrt(k))."""

    name = "anf"
    combine = "or"
    frontier = True
    dtype = np.int64
    resend_safe = True
    has_extra_stats = True
    PHI = 0.77351

    def __init__(self, n_trials: int = 4, bits: int = 16):
        if n_trials * bits != 64:
            raise ValueError("n_trials * bits must pack exactly into int64")
        if bits not in (16, 32):
            raise ValueError("bits must be 16 or 32")
        self.k = int(n_trials)
        self.bits = int(bits)
        self._lut = None  # built lazily inside each actor, not pickled

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_lut"] = None
        return d

    def send_mask(self, vals):
        return vals != 0

    def _seed_masks(self, vids: np.ndarray) -> np.ndarray:
        from everythinggraph_ray.stages.agg import mix64

        cap = self.bits - 2  # keep headroom: lsb0 fits the lane
        m = np.zeros(len(vids), dtype=np.uint64)
        for t in range(self.k):
            salt = np.uint64((0x9E3779B97F4A7C15 * (t + 1)) & 0xFFFFFFFFFFFFFFFF)
            h = mix64(vids.astype(np.uint64) ^ salt)
            low = h & (~h + np.uint64(1))  # lowest set bit (power of two)
            # exact for powers of two (exactly representable in float64)
            r = np.where(
                low == 0, cap, np.log2(np.maximum(low, 1).astype(np.float64)).astype(np.int64)
            )
            r = np.minimum(r, cap)
            m |= np.uint64(1) << (r + t * self.bits).astype(np.uint64)
        return m.astype(np.int64)

    def init_values(self, vids, outdeg, ctx):
        return self._seed_masks(vids)

    def apply(self, old, agg, has_msg, ctx):
        new = old | np.where(has_msg, agg, np.int64(0))
        return new, new != old, 0.0

    def sum_lsb0(self, masks: np.ndarray) -> np.ndarray:
        """Per vertex: Σ over trials of the lowest-zero-bit position of
        its lane — LUT over 16-bit chunks (no per-row Python)."""
        if self._lut is None:
            self._lut = _lsb0_16_lut()
        u = masks.astype(np.uint64)
        out = np.zeros(len(masks), dtype=np.int64)
        for t in range(self.k):
            lane = (u >> np.uint64(t * self.bits)) & np.uint64((1 << self.bits) - 1)
            lo = self._lut[(lane & np.uint64(0xFFFF)).astype(np.int64)]
            if self.bits == 32:
                hi = self._lut[((lane >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)]
                lo = np.where(lo == 16, 16 + hi, lo)
            out += lo
        return out

    def extra_stats(self, old, new, changed, ctx):
        return np.bincount(self.sum_lsb0(new), minlength=64)[:64].astype(np.int64)

    def estimate(self, hist: np.ndarray | list) -> float:
        """N(h) from one superstep's 64-bin histogram."""
        h = np.asarray(hist, dtype=np.float64)
        b = np.arange(len(h), dtype=np.float64)
        return float((h * np.exp2(b / self.k)).sum() / self.PHI)


class SSSPHopsKernel(Kernel):
    """Reference push SSSP (sssp_pushpull.c:39-56): relax +1 hop, self-loops
    skipped, dist init 'infinity', root 0."""

    name = "sssp_hops"
    combine = "min"
    frontier = True
    skip_self_loops = True
    dtype = np.int64
    resend_safe = True

    def send_mask(self, vals):
        return vals != UNREACHED

    def __init__(self, root: int):
        self.root = root

    def init_values(self, vids, outdeg, ctx):
        d = np.full(len(vids), UNREACHED, dtype=np.int64)
        i = np.searchsorted(vids, self.root)
        if i < len(vids) and vids[i] == self.root:
            d[i] = 0
        return d

    init_active = BFSKernel.init_active

    def src_messages(self, vals, outdeg):
        return vals + 1

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        improved = has_msg & (agg < old)
        new[improved] = agg[improved]
        return new, improved, 0.0


class ParentSSSPHopsKernel(Kernel):
    """Hop SSSP with PARENT tracking (sssp_pushpull.c:57-68 stores the
    relaxing src; bfs_numa.c:19 parent-BFS): state packs ``(dist << 32) |
    parent`` into one int64, so the engine's min-combine yields min dist
    with min-parent tiebreak in a single semiring. Because +1-hop SSSP is
    a BFS wavefront (first touch is final and every vertex sends exactly
    once), the fixpoint parent is exactly ``min{u : dist[u]+1 == dist[v],
    edge u→v}`` — deterministic and SQL-expressible. Requires vid <
    2^31 and dist < 2^31 (a 63-bit-vid corpus needs a two-column state —
    documented limitation). ``resend_safe`` is deliberately OFF: resends
    could refine the parent after first touch, breaking the closed-form
    characterization above."""

    name = "sssp_parent"
    combine = "min"
    frontier = True
    skip_self_loops = True
    dtype = np.int64
    resend_safe = False

    PARENT_MASK = np.int64((1 << 32) - 1)

    def __init__(self, root: int):
        assert 0 <= root < (1 << 31)
        self.root = root

    def init_values(self, vids, outdeg, ctx):
        # enforce the packed-state precondition at runtime (round-2 ADVICE):
        # a vid >= 2^31 would overflow into the dist field and silently
        # corrupt dist AND parent (the CLI exposes this kernel for --pages
        # input whose vids are 63-bit url hashes — those must fail loudly)
        if len(vids) and int(vids.max()) >= (1 << 31):
            raise ValueError(
                "ParentSSSPHopsKernel packs (dist<<32)|vid into int64 and "
                f"requires every vid < 2^31; got max vid {int(vids.max())} "
                "— renumber vertices densely or use SSSPHopsKernel + a "
                "separate parent pass"
            )
        v = np.full(len(vids), UNREACHED, dtype=np.int64)
        i = np.searchsorted(vids, self.root)
        if i < len(vids) and vids[i] == self.root:
            v[i] = np.int64(self.root)  # dist 0, parent = root
        return v

    init_active = BFSKernel.init_active

    def src_messages2(self, vals, outdeg, vids):
        dist = vals >> np.int64(32)
        # unreached senders are masked out by the engine (frontier kernel,
        # no resends); still emit a safe sentinel for their rows
        return np.where(
            vals == UNREACHED, UNREACHED, ((dist + 1) << np.int64(32)) | vids.astype(np.int64)
        )

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        improved = has_msg & (agg < old)
        new[improved] = agg[improved]
        return new, improved, 0.0

    @staticmethod
    def decode(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """packed int64 → (dist, parent); unreached → (int64 max, -1)."""
        unreached = packed == UNREACHED
        dist = np.where(unreached, UNREACHED, packed >> np.int64(32))
        parent = np.where(unreached, np.int64(-1), packed & ParentSSSPHopsKernel.PARENT_MASK)
        return dist.astype(np.int64), parent.astype(np.int64)


class SSSPWeightedKernel(Kernel):
    """Weighted SSSP (sssp_pushpull.c:81 pull semantics: relax dist+weight),
    self-loops skipped; weights from the edge table (synthesize_weights for
    the reference's CREATE_WEIGHT rule). dist float64, init +inf, root 0."""

    name = "sssp_weighted"
    combine = "min"
    frontier = True
    needs_weights = True
    skip_self_loops = True
    dtype = np.float64
    resend_safe = True

    def send_mask(self, vals):
        return np.isfinite(vals)

    def __init__(self, root: int):
        self.root = root

    def init_values(self, vids, outdeg, ctx):
        d = np.full(len(vids), np.inf)
        i = np.searchsorted(vids, self.root)
        if i < len(vids) and vids[i] == self.root:
            d[i] = 0.0
        return d

    init_active = BFSKernel.init_active

    def edge_values(self, per_edge, weights):
        return per_edge + weights

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        improved = has_msg & (agg < old)
        new[improved] = agg[improved]
        return new, improved, 0.0


class EarliestArrivalKernel(Kernel):
    """Temporal earliest-arrival reachability over time-respecting paths
    (the temporal-graph analogue of BFS): each edge carries a timestamp
    in the weight column; a walk may traverse edge (u, v, t) only if
    t >= arrival(u) and then arrives at v at time t (instantaneous
    traversal). arrival(root) = start, arrival(v) = min over usable
    edges, +inf if no time-respecting path exists. A monotone
    min-semiring with an edge-DEPENDENT transfer (gate on the sender's
    value, then emit the edge's own timestamp) — the semiring family
    the reference's writeMin (wcc.c:21-27) covers only with constant
    transfer; rides the identical frontier machinery as weighted SSSP.
    Resend-safe: recomputing a sender's gate is idempotent."""

    name = "arrival"
    combine = "min"
    frontier = True
    needs_weights = True
    dtype = np.float64
    resend_safe = True

    def send_mask(self, vals):
        return np.isfinite(vals)

    def __init__(self, root: int, start: float = 0.0):
        self.root = int(root)
        self.start = float(start)

    def init_values(self, vids, outdeg, ctx):
        d = np.full(len(vids), np.inf)
        i = np.searchsorted(vids, self.root)
        if i < len(vids) and vids[i] == self.root:
            d[i] = self.start
        return d

    init_active = BFSKernel.init_active

    def edge_values(self, per_edge, weights):
        return np.where(weights >= per_edge, weights, np.inf)

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        improved = has_msg & (agg < old)
        new[improved] = agg[improved]
        return new, improved, 0.0


class WidestPathKernel(Kernel):
    """Widest (bottleneck / maximum-capacity) path from a root: cap(v) =
    max over root→v paths of the minimum edge weight along the path —
    the MAX–MIN semiring, the one monotone-idempotent semiring family
    the reference's writeMin/write_add pair doesn't cover (wcc.c:21-27
    writeMin is its dual). Rides the identical scatter/combine machinery
    with combine='max': messages are ``min(cap(u), w)``, resends are
    harmless (idempotent), convergence is frontier-empty. Weights are
    the reference's synthesized ``src%10 + dst%10`` (init_all.c:663-666)
    on a weighted build. Root cap is the finite sentinel ``CAP_INIT``
    (exact in float64 and in the SQL oracle); unreached is −inf
    internally, surfaced as −1 by the query layer."""

    name = "widest_path"
    combine = "max"
    frontier = True
    needs_weights = True
    skip_self_loops = True
    dtype = np.float64
    resend_safe = True

    CAP_INIT = 1e18  # 10^18 = 2^18·5^18, exactly representable in float64

    def send_mask(self, vals):
        return vals != -np.inf

    def __init__(self, root: int):
        self.root = root

    def init_values(self, vids, outdeg, ctx):
        c = np.full(len(vids), -np.inf)
        i = np.searchsorted(vids, self.root)
        if i < len(vids) and vids[i] == self.root:
            c[i] = self.CAP_INIT
        return c

    init_active = BFSKernel.init_active

    def edge_values(self, per_edge, weights):
        return np.minimum(per_edge, weights)

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        improved = has_msg & (agg > old)
        new[improved] = agg[improved]
        return new, improved, 0.0


class DagDepthKernel(Kernel):
    """Longest-path depth on a DAG — the MAX-PLUS semiring (the additive
    dual of SSSP's min-plus, wcc.c:21-27 writeMin machinery inverted):
    depth(v) = max(0, max_{u→v} depth(u) + 1). Every vertex starts
    active at depth 0; improvements propagate frontier-style and
    converge in exactly longest-path-length supersteps. Resends are
    idempotent under max, so the engine's dense-resend direction switch
    applies unchanged. ONLY terminates on DAGs (the degree-orientation
    of an undirected graph, a condensation, a dependency graph) — on a
    cycle the iteration cap trips."""

    name = "dag_depth"
    combine = "max"
    frontier = True
    skip_self_loops = True
    dtype = np.int64
    resend_safe = True

    def init_values(self, vids, outdeg, ctx):
        return np.zeros(len(vids), dtype=np.int64)

    def src_messages(self, vals, outdeg):
        return vals + 1

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        improved = has_msg & (agg > old)
        new[improved] = agg[improved]
        return new, improved, 0.0


class ReachKernel(Kernel):
    """Multi-source reachability: value 1 iff ANY seed reaches the
    vertex along directed edges — the MAX semiring over {0, 1}
    (idempotent + monotone like writeMin, so the dense-resend switch
    applies; the single-bit generalization of MS-BFS's 63-bit OR to an
    unbounded seed SET). Seeds land partition-local via the labelprop
    searchsorted device; converges in eccentricity-of-the-seed-set
    supersteps. Run on the reversed build for reaches-TO semantics."""

    name = "reach"
    combine = "max"
    frontier = True
    skip_self_loops = True
    dtype = np.int64
    resend_safe = True

    def __init__(self, seeds):
        self.seeds = np.sort(np.unique(np.asarray(list(seeds), dtype=np.int64)))

    def init_values(self, vids, outdeg, ctx):
        v = np.zeros(len(vids), dtype=np.int64)
        if len(vids) and len(self.seeds):
            idx = np.searchsorted(vids, self.seeds)
            ok = (idx < len(vids)) & (vids[np.minimum(idx, len(vids) - 1)] == self.seeds)
            v[idx[ok]] = 1
        return v

    def src_messages(self, vals, outdeg):
        return vals

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        improved = has_msg & (agg > old)
        new[improved] = agg[improved]
        return new, improved, 0.0


class BipartiteLevelKernel(Kernel):
    """WCC + BFS-level in ONE packed min-semiring pass: state is
    ``(label << 32) | dist`` and a message adds 1 to the word, so the
    lexicographic fixpoint per vertex is (c, d) where c is the
    component's min vid (wcc.c:211-216 min-label semantics) and d the
    BFS hop distance from that root — the parity ``d & 1`` is the
    2-coloring certificate: an undirected edge whose endpoints share
    parity closes an odd cycle, so the component is bipartite iff no
    such edge exists (self-loops are odd cycles by definition and are
    counted on the edge side, not here). Min over monotone packed path
    words ⇒ idempotent + monotone, hence resend-safe like WCC. Run on
    the UNDIRECTED build. Requires vid < 2^31 (packed-word
    precondition, enforced like ParentSSSPHopsKernel); dist < 2^32
    always holds (bounded by the vertex count)."""

    name = "bipartite"
    combine = "min"
    frontier = True
    skip_self_loops = True
    dtype = np.int64
    resend_safe = True

    def init_values(self, vids, outdeg, ctx):
        if len(vids) and int(vids.max()) >= (1 << 31):
            raise ValueError(
                "BipartiteLevelKernel packs (label<<32)|dist and requires "
                f"every vid < 2^31; got max vid {int(vids.max())} "
                "(use a two-column state for 63-bit-vid corpora)"
            )
        return vids.astype(np.int64) << np.int64(32)

    def src_messages(self, vals, outdeg):
        return vals + 1

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        improved = has_msg & (agg < old)
        new[improved] = agg[improved]
        return new, improved, 0.0


class SpMVKernel(Kernel):
    """One gather-scatter step (spmv.c:98-106): y[v] = sum 0.001*x[u] over
    in-edges, x[u] = u."""

    name = "spmv"
    combine = "sum"
    fixed_iters = 1

    def init_values(self, vids, outdeg, ctx):
        return vids.astype(np.float64)

    def src_messages(self, vals, outdeg):
        return 0.001 * vals

    def apply(self, old, agg, has_msg, ctx):
        return agg, np.ones(len(old), dtype=bool), float("inf")


class SpMVEdgeCentricKernel(Kernel):
    """The reference's edge-centric SpMV asymmetry (spmv.c:130-136): sums
    WITHOUT the 0.001 factor into ``value_out[src]`` — i.e.
    y[u] = sum_{u->v} x[v]. Run it on the REVERSED edge table so the
    engine's dst-directed combine lands on the original src. x[v] = v, so
    the sums are exact int64."""

    name = "spmv_edgecentric"
    combine = "sum"
    fixed_iters = 1
    dtype = np.int64

    def init_values(self, vids, outdeg, ctx):
        return vids.astype(np.int64).copy()

    def apply(self, old, agg, has_msg, ctx):
        return agg, np.ones(len(old), dtype=bool), float("inf")


class LatestDepartureKernel(Kernel):
    """Temporal latest-departure reachability — the time-reversed dual
    of EarliestArrivalKernel: over the REVERSED temporal build (each
    reversed edge u→v carries the ORIGINAL edge's (v, u, t) timestamp),
    departure(v) is the latest time one can leave v and still reach the
    target along a time-respecting (non-decreasing) path.
    departure(target) = CAP (any last-hop time qualifies);
    departure(v) = max over original edges (v, u, t) with
    t <= departure(u) of t; -inf when the target is unreachable. The
    MAX-semiring with the same edge-dependent gate-then-emit transfer
    as arrival (gate on the sender's value, emit the edge's own
    timestamp) — rides the widest-path max machinery unchanged.
    Resend-safe: the gate is idempotent."""

    name = "departure"
    combine = "max"
    frontier = True
    needs_weights = True
    dtype = np.float64
    resend_safe = True

    CAP_INIT = 1e18  # exactly representable; sorts above any timestamp

    def send_mask(self, vals):
        return vals != -np.inf

    def __init__(self, target: int):
        self.target = int(target)

    def init_values(self, vids, outdeg, ctx):
        d = np.full(len(vids), -np.inf)
        i = np.searchsorted(vids, self.target)
        if i < len(vids) and vids[i] == self.target:
            d[i] = self.CAP_INIT
        return d

    def init_active(self, vids, ctx):
        a = np.zeros(len(vids), dtype=bool)
        i = np.searchsorted(vids, self.target)
        if i < len(vids) and vids[i] == self.target:
            a[i] = True
        return a

    def edge_values(self, per_edge, weights):
        return np.where(weights <= per_edge, weights, -np.inf)

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        improved = has_msg & (agg > old)
        new[improved] = agg[improved]
        return new, improved, 0.0


class PathCountBFSKernel(Kernel):
    """Shortest-path COUNTING BFS (the sigma stage of Brandes, surfaced
    as a single-source kernel): state packs ``(dist << 32) | nsp`` where
    dist uses rel_bfs conventions (root 1, unreached 0) and nsp is the
    number of distinct shortest root->v paths.

    This is the engine's first SUM-combine FRONTIER kernel: in
    synchronous BFS the frontier at round k is exactly layer k, so every
    sigma contribution to a layer-(k+1) vertex arrives in one round and
    the sum-combined message total IS sigma(v) — no re-send is ever safe
    (sum is not idempotent), hence resend_safe stays False and the
    engine keeps sparse frontier scatter throughout. The level written
    at discovery time comes from a per-instance superstep counter
    (every partition actor applies exactly once per superstep, so the
    counters stay in lockstep); mid-run checkpoint/resume would desync
    the counter and is not supported for this kernel.

    Precondition: sigma < 2^32 (packed). apply() raises on overflow
    rather than silently corrupting the dist field.
    """

    name = "sp_counts"
    combine = "sum"
    frontier = True
    dtype = np.int64
    skip_self_loops = True

    def __init__(self, root: int):
        self.root = int(root)
        self._lvl = 1  # root's dist; first apply discovers level 2

    def init_values(self, vids, outdeg, ctx):
        v = np.zeros(len(vids), dtype=np.int64)
        i = np.searchsorted(vids, self.root)
        if i < len(vids) and vids[i] == self.root:
            v[i] = (np.int64(1) << np.int64(32)) | np.int64(1)
        return v

    def init_active(self, vids, ctx):
        a = np.zeros(len(vids), dtype=bool)
        i = np.searchsorted(vids, self.root)
        if i < len(vids) and vids[i] == self.root:
            a[i] = True
        return a

    def src_messages(self, vals, outdeg):
        return vals & np.int64(0xFFFFFFFF)  # sigma only; dist implied by round

    def apply(self, old, agg, has_msg, ctx):
        self._lvl += 1
        new = old.copy()
        touch = has_msg & (old == 0)
        if touch.any():
            sig = agg[touch].astype(np.int64)
            if int(sig.max()) >= (1 << 32):
                raise ValueError("sp_counts sigma overflows the 32-bit pack")
            new[touch] = (np.int64(self._lvl) << np.int64(32)) | sig
        return new, touch, 0.0

    @staticmethod
    def decode(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        packed = packed.astype(np.int64)
        return packed >> np.int64(32), packed & np.int64(0xFFFFFFFF)


class LandmarkDominatorKernel(Kernel):
    """Landmark dominators by iterative dataflow over the AND semiring —
    the classic dom(v) = {v} ∪ ⋂_{p∈pred(v)} dom(p) equations (Allen/
    Cocke), restricted to membership of 63 landmark vertices so a
    vertex's dominator SET fits the engine's one-int64-per-vertex state
    (bit i = landmark i dominates v; bit 63 unused so reachable masks
    stay non-negative; the untouched init value -1 = "full set" doubles
    as the unreachable sentinel, and IS the AND identity, so resending
    from unreached vertices is a no-op — fully resend-safe).

    Chaotic-iteration soundness: values only lose bits (monotone meet),
    the old value accumulates every constraint ever received, and every
    changed vertex re-notifies its successors — the same asynchronous-
    dataflow argument as the WCC min-label kernel. Converges to the
    greatest fixpoint = the true dominator sets (restricted to the
    landmark universe). The first 'and'-combine rider of the engine's
    semiring registry (reference extension surface: random.h:64-69
    algo_func vtable, SURVEY §2.j).
    """

    name = "dominators"
    combine = "and"
    frontier = True
    dtype = np.int64
    resend_safe = True

    def __init__(self, root: int, bits: dict[int, int]):
        """``bits``: vid -> bit index (< 63); must include the root."""
        if root not in bits:
            raise ValueError("root must be a landmark (have a bit)")
        if any(b < 0 or b > 62 for b in bits.values()):
            raise ValueError("landmark bits must be in [0, 62]")
        self.root = int(root)
        self.bits = {int(v): int(b) for v, b in bits.items()}

    def _selfbits_for(self, vids: np.ndarray) -> np.ndarray:
        sb = np.zeros(len(vids), np.int64)
        if len(vids) and self.bits:
            lv = np.fromiter(self.bits.keys(), np.int64, count=len(self.bits))
            lb = np.fromiter(self.bits.values(), np.int64, count=len(self.bits))
            idx = np.searchsorted(vids, lv)
            ok = (idx < len(vids)) & (vids[np.minimum(idx, len(vids) - 1)] == lv)
            sb[idx[ok]] = np.int64(1) << lb[ok]
        return sb

    def init_values(self, vids, outdeg, ctx):
        self._selfbit = self._selfbits_for(np.asarray(vids, np.int64))
        vals = np.full(len(vids), -1, np.int64)
        at = np.searchsorted(vids, self.root)
        if at < len(vids) and vids[at] == self.root:
            vals[at] = np.int64(1) << self.bits[self.root]
        return vals

    def init_active(self, vids, ctx):
        return np.asarray(vids, np.int64) == self.root

    def apply(self, old, agg, has_msg, ctx):
        new = old.copy()
        cand = (old[has_msg] & agg[has_msg]) | self._selfbit[has_msg]
        changed_local = cand != old[has_msg]
        new[has_msg] = cand
        changed = np.zeros(len(old), bool)
        changed[np.flatnonzero(has_msg)[changed_local]] = True
        return new, changed, 0.0


class MultiSeedHopsKernel(SSSPHopsKernel):
    """Hop distance to the NEAREST of a seed SET (dist 0 at every seed)
    — the min-dist field greedy k-center / facility-location rounds
    need; plain SSSPHopsKernel generalized to a seed vector."""

    name = "multiseed_hops"

    def __init__(self, seeds: list[int]):
        if not seeds:
            raise ValueError("need at least one seed")
        self.seeds = np.unique(np.asarray(seeds, np.int64))

    def _seed_positions(self, vids):
        if not len(vids):
            return np.empty(0, np.int64)
        idx = np.searchsorted(vids, self.seeds)
        ok = (idx < len(vids)) & (vids[np.minimum(idx, len(vids) - 1)] == self.seeds)
        return idx[ok]

    def init_values(self, vids, outdeg, ctx):
        d = np.full(len(vids), UNREACHED, dtype=np.int64)
        d[self._seed_positions(vids)] = 0
        return d

    def init_active(self, vids, ctx):
        a = np.zeros(len(vids), dtype=bool)
        a[self._seed_positions(vids)] = True
        return a


class ThresholdCascadeKernel(Kernel):
    """Synchronous bootstrap percolation (threshold cascade): a vertex
    activates when ≥ ``threshold`` DISTINCT in-neighbors are active;
    seeds are active at round 0. Build precondition: the graph must be
    the DISTINCT simple digraph (duplicate edges would double-count the
    sum-combined +1 messages; self-loops would let a vertex count
    itself) — build from dedup'd, loop-free edges.

    State packs (accumulated-active-in-neighbor count << 32) |
    (activation_round + 1), 0 low bits = inactive. Each newly active
    vertex sends +1 along its out-edges exactly ONCE (frontier scatter,
    sum combine, resend_safe=False — the PathCountBFS precedent), so the
    accumulated count equals the full recount over all active
    in-neighbors: actives never deactivate. Every round's active-set
    size is recoverable from the final state alone (cumulative count of
    activation rounds ≤ r), so early frontier exhaustion needs no
    padding bookkeeping in the kernel."""

    name = "cascade"
    combine = "sum"
    frontier = True
    dtype = np.int64
    skip_self_loops = True

    def __init__(self, seed_max: int, threshold: int = 2, rounds: int = 10):
        self.seed_max = int(seed_max)
        self.threshold = int(threshold)
        self.fixed_iters = int(rounds)

    def init_values(self, vids, outdeg, ctx):
        v = np.zeros(len(vids), dtype=np.int64)
        v[vids < self.seed_max] = 1  # activation round 0 → low bits 1
        return v

    def init_active(self, vids, ctx):
        return vids < self.seed_max

    def src_messages(self, vals, outdeg):
        return np.ones(len(vals), dtype=np.int64)

    def apply(self, old, agg, has_msg, ctx):
        # per-instance lockstep superstep counter (the PathCountBFS
        # idiom: every partition applies exactly once per superstep)
        self._rnd = getattr(self, "_rnd", 0) + 1
        rnd = self._rnd
        inactive = (old & np.int64(0xFFFFFFFF)) == 0
        cnt = (old >> np.int64(32)) + np.where(has_msg, agg, np.int64(0))
        newly = inactive & (cnt >= self.threshold)
        new = old.copy()
        # inactive vertices persist their accumulated count
        new[inactive] = cnt[inactive] << np.int64(32)
        new[newly] = (cnt[newly] << np.int64(32)) | np.int64(rnd + 1)
        return new, newly, 0.0

    @staticmethod
    def activation_rounds(packed: np.ndarray) -> np.ndarray:
        """activation round per vertex (-1 = never activated)."""
        low = packed.astype(np.int64) & np.int64(0xFFFFFFFF)
        return np.where(low > 0, low - 1, -1)
