"""Query catalog: every operator surfaced as a (ray_fn, oracle_sql) pair.

``QUERIES[name]`` is a callable ``sf_dir -> Dataset | DataFrame | Table``;
``ORACLES[name]`` (when present) is the equivalent DuckDB SQL over the
same parquet tables. Column names and rounding match EXACTLY on both
sides (the driver hash-compares values after sorting columns by name).

Graph queries run over a *derived* integer edge table so the SQL oracle
can reproduce the graph without our blake2b url-hash:

    src = l_orderkey % 1000, dst = l_partkey % 1000   (REL_V = 1000)

Float-summing queries either (a) sum exact integer cents (TPC-H style
aggregates — no float-association flakiness at all) or (b) round to a
precision far coarser than the achievable float error (PageRank 1e-8 vs
~1e-14 error).

Web-graph queries carry SQL oracles since round 4 via two devices: a
SERIAL-extractor side parquet in /tmp (corpus.ensure_web_oracle_*) that
DuckDB reads directly — no Ray code on the oracle side — and dense
renumbering (rank of the 63-bit url-hash vid over sorted distinct vids,
= SQL row_number() OVER (ORDER BY vid)) so vertex ids match across
implementations. Host/domain-level queries key their OUTPUT by the
domain string so SQL derives it from the side parquet's urls. Only the
to-convergence PageRank (data-dependent iteration count) and the
quality-heuristic curation query remain rows-only, by documented design.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from everythinggraph_ray.corpus import ensure_corpus
from everythinggraph_ray.datapipe.dedup import exact_duplicates, minhash_near_duplicates
from everythinggraph_ray.datapipe.knn import knn_bruteforce
from everythinggraph_ray.datapipe.text import (
    doc_stats,
    fingerprint,
    lang_id,
    quality_score,
    top_tokens,
)
from everythinggraph_ray.graph.build import build_graph
from everythinggraph_ray.graph.engine import GraphEngine
from everythinggraph_ray.graph.kernels import (
    BFSKernel,
    PageRankKernel,
    SpMVKernel,
    SSSPHopsKernel,
    WCCKernel,
)
from everythinggraph_ray.graph.triangles import triangle_count
from everythinggraph_ray.pipelines.flagship import build_dir_for
from everythinggraph_ray.stages.agg import string_buckets
from everythinggraph_ray.stages.edges import dedup_edges, out_degrees, undirect_edges
from everythinggraph_ray.stages.extract import pages_to_edges, pages_to_text

REL_V = 1000
# the columns the extract front end consumes: `text` (a wide column the
# extractor re-derives from html) never leaves storage on these paths
PAGE_EXTRACT_COLS = ["url", "warc_ts", "html", "lang"]
KNN_QUERIES = 8
KNN_K = 10

from everythinggraph_ray.datapipe.text import _LANG_PROFILES as _LANGID_PROFILES

# pages-corpus size per test scale (deterministic, cached in /tmp)
_CORPUS_ROWS = {"sf0.001": 800, "sf0.01": 3000, "sf0.1": 20000}


def _corpus_for(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return ensure_corpus(_CORPUS_ROWS.get(tag, 3000), seed=42)


# ----------------------------------------------------------------------
# derived relational edge table (identical in Ray and SQL)
# ----------------------------------------------------------------------
SQL_REL_EDGES = (
    f"SELECT l_orderkey % {REL_V} AS src, l_partkey % {REL_V} AS dst FROM lineitem"
)


def rel_edges(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"]
    )

    def derive(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(o % REL_V, pa.int64()),
                "dst": pa.array(p % REL_V, pa.int64()),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow")


def _rel_build(sf_dir: str, *, undirect: bool = False, P: int = 8) -> str:
    tag = f"rel|{sf_dir}|{'und' if undirect else 'dir'}"
    bdir = build_dir_for(tag, P)
    e = rel_edges(sf_dir)
    if undirect:
        e = undirect_edges(e)
    build_graph(e, bdir, num_partitions=P, hub_threshold=10**9)  # dense ids: no hubs
    return bdir


def _rel_weighted_build(sf_dir: str) -> str:
    """Weighted (src%10+dst%10) src-partitioned build, shared by
    sssp_weighted and wpagerank. Tag 'relw-wd': weighted builds carry
    woutdeg since layout v2 — the bumped tag orphans pre-woutdeg
    caches instead of tripping on them."""
    from everythinggraph_ray.stages.edges import synthesize_weights

    bdir = build_dir_for(f"relw-wd|{sf_dir}", 8)
    build_graph(
        synthesize_weights(rel_edges(sf_dir)),
        bdir,
        num_partitions=8,
        hub_threshold=10**9,
        weighted=True,
    )
    return bdir


def _run_engine(bdir: str, kernel, **kw) -> pd.DataFrame:
    eng = GraphEngine(bdir)
    try:
        res = eng.run(kernel, **kw)
        return res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    finally:
        eng.shutdown()


def _rel_root(sf_dir: str) -> int:
    """Min vid of the universe in ONE pass (per-batch minima combiner —
    two separate ds.min calls would execute the read pipeline twice)."""

    def mins(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table({"m": pa.array([], pa.int64())})
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([min(int(s.min()), int(d.min()))], pa.int64())})

    return int(rel_edges(sf_dir).map_batches(mins, batch_format="pyarrow").min("m"))


def _rel_sources(sf_dir: str, k: int) -> list[int]:
    """The k smallest distinct vids of the universe without an O(V)
    driver pull: each block emits its own k smallest distinct values
    (any globally-smallest value is, in every block containing it, also
    locally among the k smallest, so the partials are a superset), then
    ONE single-block reduce over the tiny partial set is exact."""

    def partial(cols: list[str]):
        def f(batch: pa.Table) -> pa.Table:
            if not batch.num_rows:
                return pa.table({"m": pa.array([], pa.int64())})
            u = np.unique(
                np.concatenate(
                    [batch[c].to_numpy(zero_copy_only=False) for c in cols]
                )
            )
            return pa.table({"m": pa.array(u[:k], pa.int64())})

        return f

    small = rel_edges(sf_dir).map_batches(partial(["src", "dst"]), batch_format="pyarrow")
    rows = small.repartition(1).map_batches(partial(["m"]), batch_format="pyarrow").take(k)
    return [int(r["m"]) for r in rows]


# ----------------------------------------------------------------------
# graph queries
# ----------------------------------------------------------------------
def q_rel_edges(sf_dir):
    return rel_edges(sf_dir)


def q_rel_degree(sf_dir):
    return out_degrees(rel_edges(sf_dir))


def q_rel_distinct_edges(sf_dir):
    return dedup_edges(rel_edges(sf_dir))


def q_rel_top_outdegree(sf_dir):
    return out_degrees(rel_edges(sf_dir)).sort(["outdeg", "vid"], descending=[True, False]).limit(20)


NEIGHBOR_SAMPLE_K = 3


def q_rel_neighbor_sample(sf_dir):
    """GraphSAGE-style deterministic k-neighbor sample over the deduped
    edge table (stages/edges.py:neighbor_sample): md5-order selection is
    reproducible across runs/resumes and exactly expressible in SQL."""
    from everythinggraph_ray.stages.edges import neighbor_sample

    return neighbor_sample(dedup_edges(rel_edges(sf_dir)), NEIGHBOR_SAMPLE_K)


def q_rel_pagerank10(sf_dir):
    df = _run_engine(_rel_build(sf_dir), PageRankKernel(), n_iters=10)
    # round 7: engine-vs-SQL float differences are ~1e-14, so 1e-7 rounding
    # leaves ~7 orders of margin against a boundary-straddling hash mismatch
    df["pagerank"] = np.round(df["pagerank"].to_numpy(), 7)
    return df[["vid", "pagerank"]]


def q_rel_pagerank10_pull(sf_dir):
    """Pull-mode (CSC gather) PageRank cross-variant
    (pagerank_simple.c:72-84) — same rule, dst-partitioned layout, static
    value routing (graph/pull.py). Shares rel_pagerank10's SQL oracle."""
    from everythinggraph_ray.graph.pull import pagerank_pull

    res = pagerank_pull(_rel_pull_build(sf_dir), n_iters=10)
    df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    df["pagerank"] = np.round(df["pagerank"].to_numpy(), 7)
    return df[["vid", "pagerank"]]


def _rel_pull_build(sf_dir: str, *, weighted: bool = False) -> str:
    tag = f"relpull{'w' if weighted else ''}|{sf_dir}"
    bdir = build_dir_for(tag, 8)
    e = rel_edges(sf_dir)
    if weighted:
        from everythinggraph_ray.stages.edges import synthesize_weights

        e = synthesize_weights(e)
    build_graph(
        e, bdir, num_partitions=8, hub_threshold=10**9,
        partition_edges_by="dst", weighted=weighted,
    )
    return bdir


def q_rel_bfs_pull(sf_dir):
    """Pull-mode BFS cross-variant (bfs_simple.c:104-229 pull branch):
    frontier kernel over the dst-partitioned CSC build, adaptive
    sparse/dense relax on the Beamer frontier-size/20 switch driven from
    driver-side counts. Shares rel_bfs's SQL oracle."""
    from everythinggraph_ray.graph.pull import frontier_pull

    res = frontier_pull(_rel_pull_build(sf_dir), _rel_root(sf_dir), kind="bfs")
    df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    return df.rename(columns={"bfs": "dist"})[["vid", "dist"]]


def q_rel_sssp_hops_pull(sf_dir):
    """Pull-mode hop SSSP cross-variant (sssp_pushpull.c:69-98 pull branch
    with the reference's +1 push relax semantics, adaptive direction
    switch). Shares rel_sssp_hops's SQL oracle."""
    from everythinggraph_ray.graph.pull import frontier_pull

    res = frontier_pull(_rel_pull_build(sf_dir), _rel_root(sf_dir), kind="sssp_hops")
    df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    return df.rename(columns={"sssp_hops": "dist"})[["vid", "dist"]]


def q_rel_sssp_weighted_pull(sf_dir):
    """Pull-mode WEIGHTED SSSP — the reference pull asymmetry
    (sssp_pushpull.c:81 adds edge.weight where push adds +1), over a
    weighted dst-partitioned build. Shares rel_sssp_weighted's oracle."""
    from everythinggraph_ray.graph.pull import frontier_pull

    res = frontier_pull(
        _rel_pull_build(sf_dir, weighted=True), _rel_root(sf_dir), kind="sssp_weighted"
    )
    df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    out = df.rename(columns={"sssp_weighted": "dist"})[["vid", "dist"]]
    out["dist"] = np.round(out["dist"].to_numpy(), 6)
    return out


PPR_SEED_MOD = 100  # seeds = vids divisible by this (reproducible, no seed list)


def q_rel_ppr(sf_dir):
    """Personalized PageRank, 10 fixed iterations: teleport mass lands
    only on the seed set (vid % PPR_SEED_MOD == 0) instead of uniformly.
    Seed COUNT is computed distributed (per-batch unique combiner → tiny
    distinct) because init_values needs the global count up front."""
    from everythinggraph_ray.graph.kernels import PersonalizedPageRankKernel
    from everythinggraph_ray.stages.edges import seed_vertex_count

    n_seeds = seed_vertex_count(rel_edges(sf_dir), PPR_SEED_MOD)
    df = _run_engine(
        _rel_build(sf_dir), PersonalizedPageRankKernel(PPR_SEED_MOD, n_seeds), n_iters=10
    )
    df["ppr"] = np.round(df["ppr"].to_numpy(), 9)
    return df[["vid", "ppr"]]


KCORE_K = 10


def q_rel_kcore(sf_dir):
    """k-core of the rel graph (k=10): vertices of the maximal subgraph
    with simple-undirected degree >= 10, with their in-core degree.
    Distributed peel (graph/kcore.py) — degree pass + two bucketed
    semi-joins per round, driver holds only counts."""
    from everythinggraph_ray.graph.kcore import kcore

    core, _rounds = kcore(rel_edges(sf_dir), KCORE_K)
    return core


def q_rel_scc(sf_dir):
    """Strongly connected components of the DIRECTED rel graph: (vid,
    scc) with scc = the component's min vid — the directed counterpart
    of rel_wcc (the web bowtie decomposition). Distributed min-label
    F/B peel (graph/scc.py): trim + forward/backward WCCKernel rounds,
    bucketed semi-joins carry the shrinking edge set."""
    from everythinggraph_ray.graph.scc import scc

    comps, _rounds = scc(rel_edges(sf_dir))
    return comps


def q_rel_scc_condensation(sf_dir):
    """Condensation DAG of the SCC partition — the web bowtie's
    IN→CORE→OUT super-edges: distinct (c_src, c_dst) pairs of DIFFERENT
    component labels over the simple directed edge set. Composes the
    distributed SCC labels with two bucketed hash_joins (labels attach
    endpoint-by-endpoint — only (vid, scc) pairs and the deduped edge
    list shuffle, never a V-sized broadcast) and reuses dedup_edges'
    bucketed distinct for the super-edge set."""
    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.graph.scc import scc
    from everythinggraph_ray.stages.edges import dedup_edges, filter_self_loops

    comps, _rounds = scc(rel_edges(sf_dir))
    edges = dedup_edges(filter_self_loops(rel_edges(sf_dir)))

    def tag_src(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["dst"], "c_src": b["scc"]})

    j1 = hash_join(
        edges, comps, on="src", right_on="vid", right_cols=["scc"]
    ).map_batches(tag_src, batch_format="pyarrow")

    def tag_dst(b: pa.Table) -> pa.Table:
        cs = b["c_src"].to_numpy(zero_copy_only=False)
        cd = b["scc"].to_numpy(zero_copy_only=False)
        keep = cs != cd
        return pa.table(
            {
                "src": pa.array(cs[keep], pa.int64()),
                "dst": pa.array(cd[keep], pa.int64()),
            }
        )

    j2 = hash_join(
        j1, comps, on="dst", right_on="vid", right_cols=["scc"]
    ).map_batches(tag_dst, batch_format="pyarrow")

    def final(b: pa.Table) -> pa.Table:
        return pa.table({"c_src": b["src"], "c_dst": b["dst"]})

    df = dedup_edges(j2).map_batches(final, batch_format="pyarrow").to_pandas()
    if df.empty:  # 0-row Datasets lose their schema in to_pandas (a
        # strongly-connected graph has an edgeless condensation)
        df = pd.DataFrame(
            {
                "c_src": pd.Series([], dtype="int64"),
                "c_dst": pd.Series([], dtype="int64"),
            }
        )
    return df


def q_rel_katz10(sf_dir):
    """Katz centrality, 10 fixed iterations (alpha=0.01, beta=1): the
    PageRank machinery without the outdegree divide — same engine, same
    exchange, different apply (graph/kernels.py KatzKernel)."""
    from everythinggraph_ray.graph.kernels import KatzKernel

    df = _run_engine(_rel_build(sf_dir), KatzKernel(alpha=0.01, beta=1.0), n_iters=10)
    df["katz"] = np.round(df["katz"].to_numpy(), 7)
    return df[["vid", "katz"]]


def q_rel_earliest_arrival(sf_dir):
    """Temporal earliest-arrival reachability from vid 0 (start = epoch):
    edges are (l_orderkey%V → l_partkey%V) stamped with l_shipdate in
    epoch days; a path is time-respecting iff timestamps are
    non-decreasing along it (graph/kernels.py EarliestArrivalKernel —
    gate-then-emit min-semiring over the weighted build). Emits reached
    vertices only: (vid, arrival)."""
    from everythinggraph_ray.graph.kernels import EarliestArrivalKernel

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_shipdate"],
    )

    def derive(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        t = (
            batch["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "src": pa.array(o % REL_V, pa.int64()),
                "dst": pa.array(p % REL_V, pa.int64()),
                "weight": pa.array(t.astype(np.float64), pa.float64()),
            }
        )

    bdir = build_dir_for(f"reltime|{sf_dir}", 8)
    build_graph(
        ds.map_batches(derive, batch_format="pyarrow"),
        bdir,
        num_partitions=8,
        hub_threshold=10**9,
        weighted=True,
    )
    df = _run_engine(bdir, EarliestArrivalKernel(root=0, start=0.0))
    df = df[np.isfinite(df["arrival"].to_numpy())]
    return pd.DataFrame(
        {"vid": df["vid"].to_numpy(np.int64), "arrival": df["arrival"].to_numpy(np.int64)}
    )


def q_rel_percolation(sf_dir):
    """Bond percolation at p=1/2: sample the canonical undirected edge
    set with the DETERMINISTIC md5 coin (the rel_triangles_sampled
    device — the oracle replays the identical sample), run the engine
    WCCKernel on the surviving graph, and report (n_vertices,
    n_components, largest) where unsampled vertices count as
    singletons — the connectivity-robustness probe of network
    reliability analysis."""
    import hashlib

    from ray.data.aggregate import Count

    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.triangles import _canonical_undirected
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64
    from everythinggraph_ray.stages.edges import undirect_edges

    und = _canonical_undirected(rel_edges(sf_dir))

    # n_vertices: distinct endpoints of the FULL canonical edge set —
    # per-batch unique, bucketed nunique partials, driver sums B ints
    def vert_rows(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["src"].to_numpy(zero_copy_only=False),
                    batch["dst"].to_numpy(zero_copy_only=False),
                ]
            ).astype(np.int64)
        )
        return pa.table({"vid": pa.array(u, pa.int64())})

    def nuniq(g: pa.Table) -> pa.Table:
        n = len(np.unique(g["vid"].to_numpy(zero_copy_only=False)))
        return pa.table({"n": pa.array([n], pa.int64())})

    nv = int(
        bucketed_reduce(
            und.map_batches(vert_rows, batch_format="pyarrow"),
            lambda b: mix64(b["vid"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF,
            nuniq,
        )
        .to_pandas()["n"]
        .sum()
    )

    def coin(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (
                int.from_bytes(hashlib.md5(f"{a}:{b}".encode()).digest()[8:16], "little")
                < (1 << 63)
                for a, b in zip(s, d)
            ),
            dtype=bool,
            count=len(s),
        )
        return batch.filter(pa.array(keep, pa.bool_()))

    sampled = und.map_batches(coin, batch_format="pyarrow")
    bdir = build_dir_for(f"relperc|{sf_dir}", 8)
    build_graph(undirect_edges(sampled), bdir, num_partitions=8)
    eng = GraphEngine(bdir)
    try:
        ds = eng.run(WCCKernel())["dataset"]
        in_sampled = ds.count()
        sizes = ds.groupby("wcc").aggregate(Count(alias_name="sz")).materialize()
        n_comp_s = sizes.count()
        largest_s = int(sizes.max("sz")) if n_comp_s else 0
    finally:
        eng.shutdown()
    singletons = nv - in_sampled
    return pa.table(
        {
            "n_vertices": pa.array([nv], pa.int64()),
            "n_components": pa.array([n_comp_s + singletons], pa.int64()),
            "largest": pa.array(
                [max(largest_s, 1 if singletons > 0 else 0)], pa.int64()
            ),
        }
    )


def q_rel_latest_departure(sf_dir):
    """Temporal latest-departure to target vid 0 — the time-reversed
    dual of rel_earliest_arrival (graph/kernels.py
    LatestDepartureKernel): REVERSED temporal edges carry the original
    timestamps, the MAX-semiring propagates the latest feasible leave
    time backwards along time-respecting paths. Emits (vid, departure)
    for non-target vertices that can still reach 0."""
    from everythinggraph_ray.graph.kernels import LatestDepartureKernel

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_shipdate"],
    )

    def derive_rev(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        t = (
            batch["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "src": pa.array(p % REL_V, pa.int64()),  # reversed
                "dst": pa.array(o % REL_V, pa.int64()),
                "weight": pa.array(t.astype(np.float64), pa.float64()),
            }
        )

    bdir = build_dir_for(f"reltimerev|{sf_dir}", 8)
    build_graph(
        ds.map_batches(derive_rev, batch_format="pyarrow"),
        bdir,
        num_partitions=8,
        hub_threshold=10**9,
        weighted=True,
    )
    df = _run_engine(bdir, LatestDepartureKernel(target=0))
    v = df["departure"].to_numpy()
    keep = (v != -np.inf) & (df["vid"].to_numpy(np.int64) != 0)
    df = df[keep]
    return pd.DataFrame(
        {
            "vid": df["vid"].to_numpy(np.int64),
            "departure": df["departure"].to_numpy(np.int64),
        }
    )


HITTING_HORIZON, HITTING_SEED_MOD = 8, 10


def _rel_hitting_build(sf_dir: str) -> str:
    """Reversed weighted build for truncated hitting time: attach
    outdeg(src) to every edge (distributed bucketed co-group — the
    degree table never leaves the cluster), then emit the REVERSED edge
    weighted 1/outdeg(original src), so the engine's push scatter
    delivers Σ h(u)/outdeg(v) to v."""
    from everythinggraph_ray.graph.triangles import _attach_degree
    from everythinggraph_ray.stages.edges import out_degrees

    bdir = build_dir_for(f"relhit|{sf_dir}", 8)
    e = rel_edges(sf_dir)
    deg = out_degrees(e).map_batches(
        lambda b: pa.table({"vid": b["vid"], "deg": b["outdeg"]}),
        batch_format="pyarrow",
    )
    ewd = _attach_degree(e, deg, "src", "srcdeg")

    def rev(batch: pa.Table) -> pa.Table:
        d = batch["srcdeg"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "src": batch["dst"],
                "dst": batch["src"],
                "weight": pa.array(1.0 / d, pa.float64()),
            }
        )

    build_graph(
        ewd.map_batches(rev, batch_format="pyarrow"),
        bdir,
        num_partitions=8,
        hub_threshold=10**9,
        weighted=True,
    )
    return bdir


def q_rel_hitting8(sf_dir):
    """Truncated hitting time to the vid%10==0 seed set, horizon 8
    (graph/kernels.py HittingTimeKernel over the reversed weighted
    build): random-walk proximity — the expected steps for a walk from v
    to first reach a seed, truncated at 8."""
    from everythinggraph_ray.graph.kernels import HittingTimeKernel

    df = _run_engine(
        _rel_hitting_build(sf_dir),
        HittingTimeKernel(seed_mod=HITTING_SEED_MOD, horizon=HITTING_HORIZON),
        n_iters=HITTING_HORIZON,
    )
    df["hitting"] = np.round(df["hitting"].to_numpy(), 7)
    return df[["vid", "hitting"]]


def q_rel_eigen10(sf_dir):
    """Eigenvector centrality, 10 L1-normalized power iterations: the
    Katz gather WITHOUT the additive term, with a per-superstep GLOBAL
    normalizer riding the Pregel-style aggregator channel — one float
    per partition per superstep (graph/kernels.py EigenvectorKernel).
    Rounded to 7 decimals against the unrolled SQL recursion."""
    from everythinggraph_ray.graph.kernels import EigenvectorKernel

    df = _run_engine(_rel_build(sf_dir), EigenvectorKernel(), n_iters=10)
    df["eigenvector"] = np.round(df["eigenvector"].to_numpy(), 7)
    return df[["vid", "eigenvector"]]


def q_rel_wpagerank10(sf_dir):
    """Weighted PageRank, 10 fixed iterations: rank splits over
    out-edges proportionally to the synthesized weight (w = src%10 +
    dst%10), divisor = the build's global per-src weight sum
    (graph/kernels.py WeightedPageRankKernel)."""
    from everythinggraph_ray.graph.kernels import WeightedPageRankKernel

    df = _run_engine(_rel_weighted_build(sf_dir), WeightedPageRankKernel(), n_iters=10)
    df["wpagerank"] = np.round(df["wpagerank"].to_numpy(), 7)
    return df[["vid", "wpagerank"]]


COARSEN_GROUPS = 64


def q_rel_coarsen_wpr10(sf_dir):
    """Composed multilevel pipeline: coarsen the distinct simple edge set
    by the deterministic grouping vid % 64 into a weighted supergraph
    (graph/coarsen.py contract — edge counts become weights, contracted
    self-loops dropped), then weighted PageRank 10 iterations on the
    coarse graph (the page-graph -> domain-graph -> domain-rank shape of
    a web pipeline, hash-checked end to end)."""
    from everythinggraph_ray.graph.coarsen import contract
    from everythinggraph_ray.graph.kernels import WeightedPageRankKernel
    from everythinggraph_ray.stages.edges import filter_self_loops

    sup = contract(
        dedup_edges(filter_self_loops(rel_edges(sf_dir))), COARSEN_GROUPS
    )
    bdir = build_dir_for(f"relcoarse{COARSEN_GROUPS}-wd|{sf_dir}", 4)
    build_graph(sup, bdir, num_partitions=4, hub_threshold=10**9, weighted=True)
    df = _run_engine(bdir, WeightedPageRankKernel(), n_iters=10)
    df["wpagerank"] = np.round(df["wpagerank"].to_numpy(), 7)
    df = df.rename(columns={"vid": "gid"})
    return df[["gid", "wpagerank"]]


def q_rel_hits10(sf_dir):
    """HITS hubs & authorities, 10 L2-normalized iterations over the
    dst-partitioned build (graph/hits.py — auth phase is the pull
    gather, hub phase reverse-routes local partials along the same need
    lists; driver holds only the 2P norm partials)."""
    from everythinggraph_ray.graph.hits import hits

    res = hits(_rel_pull_build(sf_dir), n_iters=10)
    df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    df["auth"] = np.round(df["auth"].to_numpy(), 7)
    df["hub"] = np.round(df["hub"].to_numpy(), 7)
    return df[["vid", "auth", "hub"]]


def q_rel_salsa10(sf_dir):
    """SALSA authorities & hubs (Lempel & Moran WWW'00), 10 L1-normalized
    iterations of the degree-normalized bipartite walk over the
    dst-partitioned build (graph/hits.py salsa — HITS's routing plus a
    one-time out-degree exchange; indeg is local by layout)."""
    from everythinggraph_ray.graph.hits import salsa

    res = salsa(_rel_pull_build(sf_dir), n_iters=10)
    df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    df["salsa_auth"] = np.round(df["salsa_auth"].to_numpy(), 9)
    df["salsa_hub"] = np.round(df["salsa_hub"].to_numpy(), 9)
    return df[["vid", "salsa_auth", "salsa_hub"]]


def q_rel_pagerank(sf_dir):
    """To-convergence PageRank (the north-rule mode), surfaced as an
    integer-grid AGREEMENT WITNESS so the driver can hash-check it
    (round-3 VERDICT item 2): the PUSH engine and the PULL engine both
    run to max|Δ| < 1e-6 and the query returns ONE row
    (n_vertices, n_agree) where agreement is exact equality of
    round(rank·1e9). The oracle asserts n_agree = n_vertices = the SQL
    vertex count — any push/pull divergence beyond 1e-9 hash-fails.
    Per-vertex exactness vs the serial NumPy oracle stays
    pytest-covered; the full rank vectors remain driver-visible via
    rel_pagerank10 / rel_pagerank10_pull.

    The pull engine runs for the PUSH engine's recorded iteration
    count rather than its own tol stop (round-4 ADVICE item 2): a
    near-threshold Δ could stop one engine an iteration earlier on a
    new dataset, failing the 1e-9 grid wholesale with no real bug;
    pinning the count leaves only FP-order divergence to disagree."""
    from everythinggraph_ray.graph.pull import pagerank_pull

    eng = GraphEngine(_rel_build(sf_dir))
    try:
        pres = eng.run(PageRankKernel(), tol=1e-6)
        push = pres["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
        push_iters = int(pres["iterations"])
    finally:
        eng.shutdown()
    res = pagerank_pull(_rel_pull_build(sf_dir), tol=None, n_iters=push_iters)
    pull = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    m = push.merge(pull, on="vid", suffixes=("_push", "_pull"), how="outer")
    g_push = np.round(m["pagerank_push"].to_numpy() * 1e9)
    g_pull = np.round(m["pagerank_pull"].to_numpy() * 1e9)
    agree = int(np.sum(g_push == g_pull))
    return pa.table(
        {
            "n_vertices": pa.array([len(m)], pa.int64()),
            "n_agree": pa.array([agree], pa.int64()),
        }
    )


def q_rel_pagerank10_dangling(sf_dir):
    """Textbook PageRank with dangling-mass redistribution, fixed 10
    iterations (DanglingPageRankKernel over the engine's Pregel-style
    aggregator channel: one dangling-sum float per partition per
    superstep). The reference drops this mass (pagerank_simple.c);
    offering both semantics side by side is the mode-comparison habit
    the reference's paper is built on."""
    from everythinggraph_ray.graph.kernels import DanglingPageRankKernel

    df = _run_engine(_rel_build(sf_dir), DanglingPageRankKernel(), n_iters=10)
    df["pagerank"] = np.round(df["pagerank_dangling"].to_numpy(), 7)
    return df[["vid", "pagerank"]]


def q_rel_pagerank_warm(sf_dir):
    """Incremental PageRank (the daily-recrawl pattern): converge on the
    BASE subgraph (lineitems 2+ — ~85% of edges), persist per-partition
    state via GraphEngine.save_state, then warm-start on the FULL graph
    with WarmStartPageRankKernel — prior ranks read partition-local
    through the storage seam, new vertices cold-init. Returns the same
    fixpoint as q_rel_pagerank (tol-scale agreement, pytest-checked) in
    a fraction of the supersteps. No SQL oracle (to-convergence)."""
    from everythinggraph_ray.graph.kernels import WarmStartPageRankKernel

    base_tag = f"relbase|{sf_dir}"
    base_bdir = build_dir_for(base_tag, 8)
    base_li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_linenumber"],
    )

    def derive_base(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["l_linenumber"], 2)
        b = batch.filter(keep)
        return pa.table(
            {
                "src": pa.array(
                    b["l_orderkey"].to_numpy(zero_copy_only=False) % REL_V, pa.int64()
                ),
                "dst": pa.array(
                    b["l_partkey"].to_numpy(zero_copy_only=False) % REL_V, pa.int64()
                ),
            }
        )

    build_graph(
        base_li.map_batches(derive_base, batch_format="pyarrow"),
        base_bdir,
        num_partitions=8,
        hub_threshold=10**9,
    )
    state_dir = os.path.join(base_bdir, "warm_state")
    eng = GraphEngine(base_bdir)
    try:
        eng.run(PageRankKernel(), tol=1e-6)
        eng.save_state(state_dir)
    finally:
        eng.shutdown()

    df = _run_engine(
        _rel_build(sf_dir), WarmStartPageRankKernel(state_dir), tol=1e-6
    )
    df = df.rename(columns={"pagerank_warm": "pagerank"})
    return df[["vid", "pagerank"]]


def q_rel_wcc(sf_dir):
    df = _run_engine(_rel_build(sf_dir, undirect=True), WCCKernel())
    return df.rename(columns={"wcc": "component"})[["vid", "component"]]


def q_rel_wcc_incremental(sf_dir):
    """Incremental WCC (the daily-recrawl pattern for components):
    converge min-label propagation on the BASE subgraph (lineitems 2+ —
    ~85% of edges, undirected), persist per-partition labels via
    GraphEngine.save_state, then warm-start on the FULL undirected
    graph with WarmStartWCCKernel — prior labels read partition-local
    through the storage seam, new vertices cold-init to their own vid.
    Unlike warm PageRank (tol-scale agreement), the warm WCC fixpoint is
    BIT-IDENTICAL to cold WCC (min-semiring over pre-propagated labels
    — see the kernel docstring), so this query shares rel_wcc's SQL
    oracle; the superstep saving is pytest-checked."""
    from everythinggraph_ray.graph.kernels import WarmStartWCCKernel

    base_bdir = build_dir_for(f"relbaseu|{sf_dir}", 8)
    base_li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_linenumber"],
    )

    def derive_base(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["l_linenumber"], 2)
        b = batch.filter(keep)
        return pa.table(
            {
                "src": pa.array(
                    b["l_orderkey"].to_numpy(zero_copy_only=False) % REL_V, pa.int64()
                ),
                "dst": pa.array(
                    b["l_partkey"].to_numpy(zero_copy_only=False) % REL_V, pa.int64()
                ),
            }
        )

    build_graph(
        undirect_edges(base_li.map_batches(derive_base, batch_format="pyarrow")),
        base_bdir,
        num_partitions=8,
        hub_threshold=10**9,
    )
    state_dir = os.path.join(base_bdir, "wcc_state")
    eng = GraphEngine(base_bdir)
    try:
        eng.run(WCCKernel())
        eng.save_state(state_dir)
    finally:
        eng.shutdown()

    df = _run_engine(_rel_build(sf_dir, undirect=True), WarmStartWCCKernel(state_dir))
    return df.rename(columns={"wcc_warm": "component"})[["vid", "component"]]


def q_rel_labelprop(sf_dir):
    """Label propagation = WCC machinery with arbitrary seed labels (here:
    default own-vid labels → equals wcc by construction, so it shares
    wcc's SQL oracle; exercised with real seeds in tests)."""
    from everythinggraph_ray.graph.kernels import LabelPropKernel

    df = _run_engine(_rel_build(sf_dir, undirect=True), LabelPropKernel())
    return df.rename(columns={"labelprop": "label"})[["vid", "label"]]


def q_rel_wcc_stats(sf_dir):
    """Component statistics — the reference's WCC destruct output
    (wcc.c:168-179: number of components, size of the largest). Computed
    distributed: per-component sizes via Dataset groupby-count, then two
    scalar aggregates."""
    from ray.data.aggregate import Count

    from everythinggraph_ray.graph.engine import GraphEngine

    eng = GraphEngine(_rel_build(sf_dir, undirect=True))
    try:
        ds = eng.run(WCCKernel())["dataset"]
        sizes = ds.groupby("wcc").aggregate(Count(alias_name="sz")).materialize()
    finally:
        eng.shutdown()
    return pa.table(
        {
            "n_components": pa.array([sizes.count()], pa.int64()),
            "max_size": pa.array([int(sizes.max("sz"))], pa.int64()),
        }
    )


def q_rel_sssp_maxdist(sf_dir):
    """Max finite distance + reached count — the reference's SSSP destruct
    print (sssp_pushpull.c:227-233)."""
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import UNREACHED

    eng = GraphEngine(_rel_build(sf_dir))
    try:
        ds = eng.run(SSSPHopsKernel(_rel_root(sf_dir)))["dataset"]
        reached = ds.map_batches(
            lambda t: t.filter(pc.not_equal(t["sssp_hops"], UNREACHED)),
            batch_format="pyarrow",
        ).materialize()
    finally:
        eng.shutdown()
    return pa.table(
        {
            "max_dist": pa.array([int(reached.max("sssp_hops"))], pa.int64()),
            "n_reached": pa.array([reached.count()], pa.int64()),
        }
    )


def q_rel_diameter_est(sf_dir):
    """Diameter lower bound by double-sweep BFS (the standard iFUB
    seed): hop-BFS from the min vid on the UNDIRECTED graph, then a
    second BFS from the farthest reached vertex (ties → min vid); its
    eccentricity is the estimate. Two engine runs; only 3 scalars
    surface."""
    from everythinggraph_ray.graph.kernels import UNREACHED

    bdir = _rel_build(sf_dir, undirect=True)
    root = _rel_root(sf_dir)
    d1 = _run_engine(bdir, SSSPHopsKernel(root))
    reach = d1[d1["sssp_hops"] != UNREACHED]
    far = int(
        reach.sort_values(["sssp_hops", "vid"], ascending=[False, True]).iloc[0]["vid"]
    )
    d2 = _run_engine(bdir, SSSPHopsKernel(far))
    reach2 = d2[d2["sssp_hops"] != UNREACHED]
    return pa.table(
        {
            "start": pa.array([root], pa.int64()),
            "far_vid": pa.array([far], pa.int64()),
            "est_diameter": pa.array([int(reach2["sssp_hops"].max())], pa.int64()),
        }
    )


def q_rel_labelprop_seeded(sf_dir):
    """Label propagation with REAL seeds (vids 0..9 carry negative labels
    -vid, which win every min-combine): exercises the seed-injection path
    end-to-end with a SQL oracle (seed rule is pure SQL)."""
    from everythinggraph_ray.graph.kernels import LabelPropKernel

    seeds = {v: -v for v in range(10)}
    df = _run_engine(_rel_build(sf_dir, undirect=True), LabelPropKernel(seeds))
    return df.rename(columns={"labelprop": "label"})[["vid", "label"]]


def q_rel_bfs(sf_dir):
    df = _run_engine(_rel_build(sf_dir), BFSKernel(_rel_root(sf_dir)))
    return df.rename(columns={"bfs": "dist"})[["vid", "dist"]]


LANDMARKS_N = 4
LANDMARK_SAMPLE_MOD = 37


def q_rel_landmark_dist(sf_dir):
    """Landmark (pivot) distance oracle: estimate pairwise hop distance
    as min over L landmarks of d(u,l)+d(l,w) — the classic
    triangle-inequality upper bound (ADO / landmark labeling). L BFS
    kernel runs over the cached build; each result Dataset is FILTERED
    to the deterministic sample (vid % 37 == 0) before anything reaches
    the driver, so driver state is |sample| x L, never O(V). Pairs no
    landmark reaches on both sides are dropped (mirrored in SQL)."""
    landmarks = _rel_sources(sf_dir, LANDMARKS_N)
    bdir = _rel_build(sf_dir)
    cols = {}
    for l in landmarks:
        eng = GraphEngine(bdir)
        try:
            res = eng.run(BFSKernel(l))
        finally:
            eng.shutdown()

        def pick(batch: pa.Table) -> pa.Table:
            v = batch["vid"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(v % LANDMARK_SAMPLE_MOD == 0, pa.bool_()))

        df = res["dataset"].map_batches(pick, batch_format="pyarrow").to_pandas()
        cols[l] = dict(zip(df["vid"].astype(np.int64), df["bfs"].astype(np.int64)))

    samp = sorted(cols[landmarks[0]])
    rows = []
    for i, u in enumerate(samp):
        for w in samp[i + 1 :]:
            best = None
            for l in landmarks:
                du, dw = cols[l].get(u, 0), cols[l].get(w, 0)
                if du > 0 and dw > 0:  # level semantics: 0 = unreached
                    e = (du - 1) + (dw - 1)
                    best = e if best is None or e < best else best
            if best is not None:
                rows.append((u, w, best))
    return pd.DataFrame(rows, columns=["u", "w", "est_dist"]).astype(np.int64)


MSBFS_SOURCES = 8  # bit i of the mask = i-th smallest source vid


def _msbfs_run(sf_dir):
    from everythinggraph_ray.graph.kernels import MultiSourceBFSKernel

    kernel = MultiSourceBFSKernel(_rel_sources(sf_dir, MSBFS_SOURCES))
    eng = GraphEngine(_rel_build(sf_dir))
    try:
        return kernel, eng.run(kernel)
    finally:
        eng.shutdown()


def q_rel_msbfs(sf_dir):
    """Bit-parallel multi-source BFS (MS-BFS, Then et al. VLDB'14) from
    the 8 smallest vids: ONE frontier pass carries all 8 searches as an
    int64 bitmask per vertex under the bitwise-OR semiring (idempotent +
    monotone like the reference's writeMin, bfs_simple.c:191 semantics,
    so the dense-resend direction switch applies unchanged). Returns
    (vid, mask): bit i set iff the i-th smallest source reaches vid."""
    _, res = _msbfs_run(sf_dir)
    df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    return df.rename(columns={"msbfs": "mask"})[["vid", "mask"]]


def q_rel_msbfs_levels(sf_dir):
    """Per-source BFS level histogram from the SAME single MS-BFS pass:
    superstep t's extra-stats vector counts, per source, the vertices
    whose bit was newly set — i.e. first reached at hop distance t. One
    row (source, level, reached) per non-empty level; the whole
    closeness/harmonic-centrality family of the sources follows from
    this without per-(source, vertex) distance storage."""
    kernel, res = _msbfs_run(sf_dir)
    rows = [
        (kernel.sources[i], m["superstep"], c)
        for m in res["metrics"]
        for i, c in enumerate(m.get("extra", []))
        if c
    ]
    return (
        pd.DataFrame(rows, columns=["source", "level", "reached"])
        .astype("int64")
        .sort_values(["source", "level"])
        .reset_index(drop=True)
    )


def q_rel_closeness(sf_dir):
    """Closeness centrality of the 8 MS-BFS sources, derived from the
    single MS-BFS pass's level histograms: n_reached = Σ reached,
    total_dist = Σ level·reached (both exact int64), closeness =
    n_reached / total_dist — ONE int64÷int64 IEEE division on both
    sides, so the driver hash is exact (same device as rel_lcc)."""
    kernel, res = _msbfs_run(sf_dir)
    n = np.zeros(len(kernel.sources), dtype=np.int64)
    td = np.zeros(len(kernel.sources), dtype=np.int64)
    for m in res["metrics"]:
        ex = np.asarray(m.get("extra", []), dtype=np.int64)
        if len(ex):
            n += ex
            td += ex * m["superstep"]
    return pd.DataFrame(
        {
            "source": np.asarray(kernel.sources, dtype=np.int64),
            "n_reached": n,
            "total_dist": td,
            "closeness": np.where(td > 0, n / np.maximum(td, 1), 0.0),
        }
    ).sort_values("source").reset_index(drop=True)


def q_rel_betweenness(sf_dir):
    """Betweenness centrality from the 8 smallest sources (truncated
    Brandes, 12-hop cap): forward sigma levels and backward delta levels
    as bucketed hash_join + sum_by_key rounds over the simple digraph
    (graph/betweenness.py). Full SQL parity via the unrolled-level
    oracle; bc rounded to 7 decimals (the pagerank10 float device)."""
    from everythinggraph_ray.graph.betweenness import betweenness

    return betweenness(
        rel_edges(sf_dir), _rel_sources(sf_dir, MSBFS_SOURCES), max_levels=BC_LEVELS
    )


HARMONIC_SCALE = 720720  # LCM(1..16): reached * (SCALE // level) is exact


def q_rel_harmonic(sf_dir):
    """Harmonic centrality + eccentricity of the 8 MS-BFS sources, from
    the SAME single MS-BFS pass as closeness. Exact-integer device:
    harmonic_x720720 = Σ_level reached · (720720 // level) — floor
    division on both sides, so the driver hash is exact; the float
    `harmonic` is that integer divided once by 720720 (bit-exact, same
    device as rel_closeness). ecc = max populated level."""
    kernel, res = _msbfs_run(sf_dir)
    nsrc = len(kernel.sources)
    hx = np.zeros(nsrc, dtype=np.int64)
    ecc = np.zeros(nsrc, dtype=np.int64)
    for m in res["metrics"]:
        ex = np.asarray(m.get("extra", []), dtype=np.int64)
        lvl = m["superstep"]
        if len(ex) and lvl > 0:
            hx += ex * (HARMONIC_SCALE // lvl)
            ecc[ex > 0] = lvl  # metrics arrive in superstep order
    return pd.DataFrame(
        {
            "source": np.asarray(kernel.sources, dtype=np.int64),
            "ecc": ecc,
            "harmonic_x720720": hx,
            "harmonic": hx / float(HARMONIC_SCALE),
        }
    ).sort_values("source").reset_index(drop=True)


def q_rel_sssp_hops(sf_dir):
    df = _run_engine(_rel_build(sf_dir), SSSPHopsKernel(_rel_root(sf_dir)))
    return df.rename(columns={"sssp_hops": "dist"})[["vid", "dist"]]


def q_rel_sssp_parent(sf_dir):
    """Parent-tracking hop SSSP (sssp_pushpull.c:57-68): (vid, dist,
    parent); parent = min in-neighbor on a shortest path (deterministic —
    see ParentSSSPHopsKernel), root's parent is itself, unreached is
    (int64max, -1). Validated structurally by the distributed parent
    validator in tests."""
    from everythinggraph_ray.graph.kernels import ParentSSSPHopsKernel

    df = _run_engine(_rel_build(sf_dir), ParentSSSPHopsKernel(_rel_root(sf_dir)))
    dist, parent = ParentSSSPHopsKernel.decode(df["sssp_parent"].to_numpy())
    return pd.DataFrame({"vid": df["vid"].astype("int64"), "dist": dist, "parent": parent})


def q_rel_triangles_sampled(sf_dir):
    """DOULION (Tsourakakis et al. KDD'09) approximate triangle count:
    keep each canonical edge with probability 1/2 via the DETERMINISTIC
    md5 coin (md5_number_lower(u:v) < 2^63 — no RNG, so the oracle
    replays the exact same sample), count triangles on the sample,
    estimate = count · (1/p)³ = count · 8. The sampling path past the
    exact counters' O(T) cost."""
    import hashlib

    from everythinggraph_ray.graph.triangles import (
        _canonical_undirected,
        triangle_count,
    )

    und = _canonical_undirected(rel_edges(sf_dir))

    def coin(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (
                int.from_bytes(hashlib.md5(f"{a}:{b}".encode()).digest()[8:16], "little")
                < (1 << 63)
                for a, b in zip(s, d)
            ),
            dtype=bool,
            count=len(s),
        )
        return batch.filter(pa.array(keep, pa.bool_()))

    tri_s = triangle_count(und.map_batches(coin, batch_format="pyarrow"))
    return pd.DataFrame({"tri_sampled": [tri_s], "estimate": [tri_s * 8]})


def q_rel_4cliques(sf_dir):
    """Exact 4-clique (K4) count via the degree-orientation DAG run one
    level past triangles: enumerate oriented triangles, pair them on
    their shared base edge, close the third-vertex pairs against the
    edge set (graph/motifs.py — O(T) triangle rows, inherent to any
    shared-base route; sampling is the path past that, documented)."""
    from everythinggraph_ray.graph.motifs import four_clique_count

    return pd.DataFrame({"k4": [four_clique_count(rel_edges(sf_dir))]})


def q_rel_reciprocity(sf_dir):
    """Edge reciprocity of the directed simple graph: the count of
    distinct non-loop edges whose reverse also exists, the total, and
    their ratio (one IEEE division). Shape: distinct edges tagged fwd,
    reversed copies tagged rev, ONE pair-bucketed co-group counts the
    matches; only two scalars per bucket reach the driver."""
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64_pair
    from everythinggraph_ray.stages.edges import filter_self_loops

    dist = dedup_edges(filter_self_loops(rel_edges(sf_dir)))

    def tag(role: int):
        def f(batch: pa.Table) -> pa.Table:
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            if role:
                s, d = d, s
            return pa.table(
                {
                    "a": pa.array(s, pa.int64()),
                    "b": pa.array(d, pa.int64()),
                    "r": pa.array(np.full(len(s), role, np.int8), pa.int8()),
                }
            )

        return f

    both = dist.map_batches(tag(0), batch_format="pyarrow").union(
        dist.map_batches(tag(1), batch_format="pyarrow")
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["a"].to_numpy(zero_copy_only=False),
            batch["b"].to_numpy(zero_copy_only=False),
        )

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        fwd = df[df["r"] == 0]
        rev = set(zip(df.loc[df["r"] == 1, "a"], df.loc[df["r"] == 1, "b"]))
        hit = sum((a, b) in rev for a, b in zip(fwd["a"], fwd["b"]))
        return pa.table(
            {
                "n_recip": pa.array([int(hit)], pa.int64()),
                "n_edges": pa.array([len(fwd)], pa.int64()),
            }
        )

    parts = bucketed_reduce(both, bucket_of, red).to_pandas().sum()
    n_recip, n_edges = int(parts["n_recip"]), int(parts["n_edges"])
    return pd.DataFrame(
        {
            "n_recip": [n_recip],
            "n_edges": [n_edges],
            "reciprocity": [n_recip / n_edges if n_edges else 0.0],
        }
    )


def q_rel_transitivity(sf_dir):
    """Global clustering coefficient (transitivity): 3·triangles /
    wedges, wedges = Σ deg·(deg−1)/2 over the simple undirected graph —
    composed from the existing triangle counter and degree table; ONE
    IEEE division (exact int64 inputs, same device as rel_lcc)."""
    from everythinggraph_ray.graph.triangles import (
        _canonical_undirected,
        triangle_count,
    )

    edges = rel_edges(sf_dir)
    tri = triangle_count(edges)
    und = _canonical_undirected(edges)

    def wedge_partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        vid, cnt = np.unique(np.concatenate([s, d]), return_counts=True)
        return pa.table({"vid": pa.array(vid, pa.int64()), "c": pa.array(cnt, pa.int64())})

    from everythinggraph_ray.stages.agg import sum_by_key

    deg = sum_by_key(
        und.map_batches(wedge_partial, batch_format="pyarrow"), "vid", ["c"]
    )

    def wsum(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array([int((c * (c - 1) // 2).sum())], pa.int64())})

    wedges = int(deg.map_batches(wsum, batch_format="pyarrow").sum("w") or 0)
    return pd.DataFrame(
        {
            "triangles": [tri],
            "wedges": [wedges],
            "transitivity": [3.0 * tri / wedges if wedges else 0.0],
        }
    )


RICH_CLUB_K = 100


def q_rel_richclub(sf_dir):
    """Rich-club coefficient at degree threshold k=100: among vertices
    with undirected simple degree > k, phi = 2·E_rich / (n·(n−1)) —
    the density of the hub subgraph (Colizza et al. 2006). Rich set is
    identified distributed (degree table filter), edges among them by
    one co-group membership check; ONE IEEE division."""
    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.graph.triangles import _canonical_undirected
    from everythinggraph_ray.stages.agg import sum_by_key

    und = _canonical_undirected(rel_edges(sf_dir)).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        vid, cnt = np.unique(np.concatenate([s, d]), return_counts=True)
        return pa.table({"vid": pa.array(vid, pa.int64()), "c": pa.array(cnt, pa.int64())})

    deg = sum_by_key(und.map_batches(deg_partial, batch_format="pyarrow"), "vid", ["c"])

    def rich_only(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(c > RICH_CLUB_K, pa.bool_())).select(["vid"])

    rich = deg.map_batches(rich_only, batch_format="pyarrow").materialize()
    n = rich.count()
    e_rich = (
        hash_join(
            hash_join(und, rich, on="src", right_on="vid", how="semi"),
            rich,
            on="dst",
            right_on="vid",
            how="semi",
        ).count()
        if n
        else 0
    )
    return pd.DataFrame(
        {
            "n_rich": [n],
            "e_rich": [e_rich],
            "phi": [2.0 * e_rich / (n * (n - 1)) if n > 1 else 0.0],
        }
    )


def q_rel_assortativity(sf_dir):
    """Directed out–in degree assortativity (Newman 2002): Pearson
    correlation over edges (u,v) of x = outdeg(u), y = indeg(v). The
    moment sums are exact int64 (hash-safe); r is built from them by a
    float expression MIRRORED operation-for-operation in the SQL oracle
    (same IEEE tree ⇒ identical double, the rel_lcc device). Degrees
    attach cost-based (the triangles device): a small degree table rides
    as ONE ray.put broadcast lookup; a huge one goes through two
    bucketed hash_joins — no V-sized driver/single-node state either
    way."""
    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.graph.triangles import BROADCAST_V_THRESHOLD
    from everythinggraph_ray.stages.edges import out_degrees, reverse_edges

    edges = rel_edges(sf_dir)

    def rename(col):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns(["vid", col])

        return f

    od = out_degrees(edges).map_batches(rename("x"), batch_format="pyarrow").materialize()
    ideg = out_degrees(reverse_edges(edges)).map_batches(rename("y"), batch_format="pyarrow")
    if od.count() <= BROADCAST_V_THRESHOLD:
        import ray as _ray

        odf, idf = od.to_pandas(), ideg.to_pandas()
        oo, io = np.argsort(odf["vid"].to_numpy()), np.argsort(idf["vid"].to_numpy())
        ref = _ray.put(
            (
                odf["vid"].to_numpy(np.int64)[oo],
                odf["x"].to_numpy(np.int64)[oo],
                idf["vid"].to_numpy(np.int64)[io],
                idf["y"].to_numpy(np.int64)[io],
            )
        )

        def attach(batch: pa.Table) -> pa.Table:
            ov, ox, iv, iy = _ray.get(ref)
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "x": pa.array(ox[np.searchsorted(ov, s)], pa.int64()),
                    "y": pa.array(iy[np.searchsorted(iv, d)], pa.int64()),
                }
            )

        e3 = edges.map_batches(attach, batch_format="pyarrow")
    else:
        e2 = hash_join(edges, od, on="src", right_on="vid", right_cols=["x"])
        e3 = hash_join(e2, ideg, on="dst", right_on="vid", right_cols=["y"])

    def partial(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        vals = [len(x), x.sum(), y.sum(), (x * y).sum(), (x * x).sum(), (y * y).sum()]
        return pa.table({f"c{i}": pa.array([int(v)], pa.int64()) for i, v in enumerate(vals)})

    p = e3.map_batches(partial, batch_format="pyarrow")
    n, sx, sy, sxy, sx2, sy2 = (int(p.sum(f"c{i}")) for i in range(6))
    num = float(n) * float(sxy) - float(sx) * float(sy)
    vx = float(n) * float(sx2) - float(sx) * float(sx)
    vy = float(n) * float(sy2) - float(sy) * float(sy)
    r = num / (math.sqrt(vx) * math.sqrt(vy)) if vx > 0 and vy > 0 else 0.0
    return pa.table(
        {
            "n_edges": pa.array([n], pa.int64()),
            "sum_x": pa.array([sx], pa.int64()),
            "sum_y": pa.array([sy], pa.int64()),
            "sum_xy": pa.array([sxy], pa.int64()),
            "sum_x2": pa.array([sx2], pa.int64()),
            "sum_y2": pa.array([sy2], pa.int64()),
            "assortativity": pa.array([r], pa.float64()),
        }
    )


def q_rel_spmv(sf_dir):
    df = _run_engine(_rel_build(sf_dir), SpMVKernel())
    df["y"] = np.round(df["spmv"].to_numpy(), 6)
    return df[["vid", "y"]]


KTRUSS_K = 8
KTRUSS_MAX_ROUNDS = 6


def q_rel_matching(sf_dir):
    """Greedy-by-md5-key maximal matching of the simple undirected graph
    (graph/matching.py — deterministic parallel rounds whose fixpoint is
    the sequential greedy matching in key order; the SQL oracle unrolls
    the same rounds, the MIS-oracle device). At driver scale (56k edges
    < tail_threshold) the serial tail answers directly — the same
    rel_mis convention; the distributed rounds are exercised (vs the
    serial oracle, both paths, partition-invariant) in
    tests/test_matching.py."""
    from everythinggraph_ray.graph.matching import maximal_matching

    out, _rounds = maximal_matching(rel_edges(sf_dir))
    return out


def q_rel_edge_support(sf_dir):
    """Per-edge triangle count (truss support) of the simple undirected
    graph — (a, b, support) with a < b, 0-support edges included
    (graph/truss.py edge_support: the triangles.py wedge/close machinery
    with per-EDGE credit)."""
    from everythinggraph_ray.graph.truss import edge_support

    return edge_support(rel_edges(sf_dir))


def q_rel_ktruss(sf_dir):
    """8-truss via simultaneous peeling, capped at 6 rounds so the SQL
    oracle can unroll the exact same computation (the cap is the parity
    contract; at sf0.01 the peel converges in 4). Output = surviving
    edges with their final support (graph/truss.py ktruss)."""
    from everythinggraph_ray.graph.truss import ktruss

    sup, _rounds = ktruss(
        rel_edges(sf_dir), KTRUSS_K, max_rounds=KTRUSS_MAX_ROUNDS
    )
    # anchor the schema: an empty truss (sf0.001) would otherwise lose
    # its columns through to_pandas and fail the driver's schema check
    return _typed_collect(sup, {"a": "int64", "b": "int64", "support": "int64"})


def q_rel_triangles(sf_dir):
    n = triangle_count(rel_edges(sf_dir))
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


def q_rel_two_hop_count(sf_dir):
    """EXACT 2-hop neighborhood size per vertex over the simple
    undirected graph — the exact baseline the ANF sketch estimates at
    h=2 (rel_anf). Midpoint-bucketed wedge emit (Σ deg² work, same
    contract as rel_4cycles) with per-bucket DISTINCT (v, u) partials,
    then one bucketed distinct-count keyed by v."""
    from everythinggraph_ray.graph.triangles import _canonical_undirected
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    und = _canonical_undirected(rel_edges(sf_dir))

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "m": pa.array(np.concatenate([a, b]), pa.int64()),
                "n": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    rows = und.map_batches(sym, batch_format="pyarrow")

    def mid_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["m"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def pairs_1_2hop(g: pa.Table) -> pa.Table:
        m = g["m"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        o = np.lexsort((n, m))
        m, n = m[o], n[o]
        st = np.flatnonzero(np.r_[True, m[1:] != m[:-1]]) if len(m) else np.empty(0, np.int64)
        ends = np.r_[st[1:], len(m)] if len(st) else st
        v_out: list[np.ndarray] = []
        u_out: list[np.ndarray] = []
        for s, e in zip(st, ends):
            nb = n[s:e]  # neighbors of midpoint m[s]
            # 1-hop pairs: (nb_i, m) ride along; 2-hop: (nb_i, nb_j) i≠j
            v_out.append(nb)
            u_out.append(np.full(len(nb), m[s], np.int64))
            if len(nb) >= 2:
                i, j = np.triu_indices(len(nb), k=1)
                v_out.extend([nb[i], nb[j]])
                u_out.extend([nb[j], nb[i]])
        v = np.concatenate(v_out)
        u = np.concatenate(u_out)
        keep = v != u
        df = pd.DataFrame({"v": v[keep], "u": u[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = bucketed_reduce(rows, mid_bucket, pairs_1_2hop)

    def v_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["v"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def count_distinct(g: pa.Table) -> pa.Table:
        d = g.to_pandas().drop_duplicates().groupby("v", as_index=False).size()
        return pa.table(
            {
                "vid": pa.array(d["v"].to_numpy(np.int64), pa.int64()),
                "n_2hop": pa.array(d["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    return bucketed_reduce(cand, v_bucket, count_distinct)


def q_rel_triad_census(sf_dir):
    """Directed triad census: transitive (a→b→c with shortcut a→c) vs
    cyclic (a→b→c→a) triangle counts over the distinct directed edge
    set — the digraph complement of the undirected triangle close
    (graph/triangles.py directed_triad_counts). All-integer."""
    from everythinggraph_ray.graph.triangles import directed_triad_counts

    n_trans, n_cyc = directed_triad_counts(rel_edges(sf_dir))
    return pa.table(
        {
            "n_trans": pa.array([n_trans], pa.int64()),
            "n_cyclic": pa.array([n_cyc], pa.int64()),
        }
    )


def q_rel_4cycles(sf_dir):
    """Exact non-induced 4-cycle count via the diagonal-pair identity
    C4 = (1/2)·Σ_{a<b} C(common_nbrs(a,b), 2) — midpoint-bucketed wedge
    emit with run-length combiner, one bucketed pair sum, all integers
    (graph/triangles.py four_cycle_count)."""
    from everythinggraph_ray.graph.triangles import four_cycle_count

    n = four_cycle_count(rel_edges(sf_dir))
    return pa.table({"c4": pa.array([n], pa.int64())})


def _anf_run(sf_dir):
    from everythinggraph_ray.graph.kernels import ANFKernel

    kernel = ANFKernel()
    eng = GraphEngine(_rel_build(sf_dir))
    try:
        res = eng.run(kernel)
    finally:
        eng.shutdown()
    ests = [kernel.estimate(m["extra"]) for m in res["metrics"]]
    return ests


def q_rel_anf(sf_dir):
    """Approximate neighborhood function (ANF, Palmer et al. KDD'02):
    N(h) = estimated #vertex pairs within distance h, from deterministic
    packed FM sketches OR-propagated by the engine (ANFKernel). Rows-only
    (a sketch estimate has no SQL form); the kernel math is pytest-exact
    vs a serial replay and accuracy-banded vs exact reachability."""
    ests = _anf_run(sf_dir)
    return pa.table(
        {
            "h": pa.array(np.arange(1, len(ests) + 1, dtype=np.int64), pa.int64()),
            "est_pairs": pa.array(np.round(np.asarray(ests), 6), pa.float64()),
        }
    )


def q_rel_effective_diameter(sf_dir):
    """Effective diameter at 90%: smallest h with N(h) >= 0.9 * N(max)
    (the HyperANF/WebGraph headline metric), from the same ANF run."""
    ests = _anf_run(sf_dir)
    final = ests[-1] if ests else 0.0
    eff = next((h + 1 for h, e in enumerate(ests) if e >= 0.9 * final), 0)
    return pa.table(
        {
            "eff_diameter_90": pa.array([eff], pa.int64()),
            "est_pairs_final": pa.array([round(final, 6)], pa.float64()),
        }
    )


WALK_LEN = 5
WALK_SEED_MOD = 50  # walkers start at every vid % 50 == 0


def q_rel_walks(sf_dir):
    """Deterministic DeepWalk-style walks (stages/walk.py): one walker per
    vid % 50 == 0, 5 steps, successor = out-neighbor minimizing
    md5(f"{step}:{u}:{v}") — the repo's no-RNG rule, shared verbatim with
    the DuckDB oracle. Returns (walk, step, vid) path rows."""
    from everythinggraph_ray.stages.agg import sum_by_key
    from everythinggraph_ray.stages.walk import deterministic_walks

    edges = rel_edges(sf_dir)

    def seed_partial(b: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    b["src"].to_numpy(zero_copy_only=False),
                    b["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        u = u[u % WALK_SEED_MOD == 0]
        return pa.table(
            {"vid": pa.array(u, pa.int64()), "one": pa.array(np.ones(len(u), np.int64), pa.int64())}
        )

    seeds = sum_by_key(
        edges.map_batches(seed_partial, batch_format="pyarrow"), "vid", ["one"]
    ).select_columns(["vid"])
    return deterministic_walks(edges, seeds, WALK_LEN).sort(["walk", "step"])


def q_rel_mis(sf_dir):
    """Deterministic maximal independent set (fixed-priority Luby ==
    the greedy MIS in md5-key order — graph/mis.py): (vid, in_mis) per
    vertex of the universe, hash-checked against an unrolled round
    oracle."""
    from everythinggraph_ray.graph.mis import maximal_independent_set

    # tail_threshold pinned SMALL here so the correctness gate exercises
    # the distributed rounds before the serial tail; the library default
    # (1M) is the production driver-memory bound
    res, _rounds = maximal_independent_set(rel_edges(sf_dir), tail_threshold=512)
    return res.sort("vid")


COLORING_MOD = 23  # sparsifier keep-rate: (src + 7*dst) % 23 == 0


def q_rel_coloring(sf_dir):
    """Greedy graph coloring (fixed-priority Jones–Plassmann whose
    fixpoint is the sequential greedy coloring in md5-key order —
    graph/coloring.py) over the deterministically SPARSIFIED rel graph
    ((src + 7*dst) % 23 == 0): the full rel graph's priority DAG is
    ~183 rounds deep at sf0.01 (avg degree ~113), far past any sane SQL
    unroll, while the sparsified one converges in ~15. tail_threshold
    pinned to 512 (the rel_mis convention) so the correctness gate
    exercises the distributed annotate→decide rounds before the serial
    tail; fully-distributed vs serial equality is pytest-checked in
    tests/test_coloring.py."""
    from everythinggraph_ray.graph.coloring import greedy_coloring

    def thin(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = (s + 7 * d) % COLORING_MOD == 0
        return pa.table(
            {"src": pa.array(s[keep], pa.int64()), "dst": pa.array(d[keep], pa.int64())}
        )

    out, _rounds = greedy_coloring(
        rel_edges(sf_dir).map_batches(thin, batch_format="pyarrow"), tail_threshold=512
    )
    return out.sort("vid")


def q_rel_link_predict(sf_dir):
    """Common-neighbor link prediction (Liben-Nowell & Kleinberg '03):
    top-20 NON-adjacent pairs of the simple undirected rel graph by
    |N(a) ∩ N(b)|, ties by (a, b). Wedge-enumeration shuffle (see
    graph/linkpred.py for the hub-cost note vs triangles)."""
    from everythinggraph_ray.graph.linkpred import common_neighbors_topk

    return common_neighbors_topk(rel_edges(sf_dir), k=20)


def q_rel_cocitation(sf_dir):
    """Co-citation projection: top-20 dst pairs by the number of distinct
    srcs linking to both (the bipartite order→part projection; adjacent
    pairs kept, directed out-neighborhoods only —
    graph/linkpred.py cocitation_topk)."""
    from everythinggraph_ray.graph.linkpred import cocitation_topk

    return cocitation_topk(rel_edges(sf_dir), k=20)


def q_rel_coupling(sf_dir):
    """Bibliographic coupling (Kessler '63): top-20 src pairs by the
    number of distinct dsts BOTH link to — the dual of co-citation,
    computed as co-citation of the transposed edge set (same src-bucketed
    pair-emission machinery, graph/linkpred.py cocitation_topk over
    reverse_edges). Output columns (a, b, cnt), a < b."""
    from everythinggraph_ray.graph.linkpred import cocitation_topk
    from everythinggraph_ray.stages.edges import reverse_edges

    return cocitation_topk(reverse_edges(rel_edges(sf_dir)), k=20)


def q_rel_butterflies(sf_dir):
    """Exact butterfly (K_{2,2}) count of the src→dst bipartite incidence:
    Σ over co-cited dst pairs of C(shared srcs, 2)
    (graph/linkpred.py butterfly_count)."""
    from everythinggraph_ray.graph.linkpred import butterfly_count

    return pd.DataFrame({"butterflies": [butterfly_count(rel_edges(sf_dir))]})


def q_rel_link_predict_jaccard(sf_dir):
    """Neighborhood-Jaccard link prediction: top-20 non-adjacent pairs
    by cnt / (deg(a) + deg(b) − cnt) — exact int64 inputs, ONE IEEE
    division (hash-safe), degrees attached by distributed co-groups."""
    from everythinggraph_ray.graph.linkpred import common_neighbors_topk

    return common_neighbors_topk(rel_edges(sf_dir), k=20, score="jaccard")


def q_rel_lcc(sf_dir):
    """Per-vertex triangle counts + local clustering coefficient on the
    simple undirected rel graph: (vid, deg, tri, lcc). Same wedge/close
    shuffle as rel_triangles but wedges keep their center and every
    closed wedge credits all three corners (graph/triangles.py
    local_clustering). lcc = tri / (deg·(deg−1)/2) — ONE int64÷int64
    IEEE division on both sides, so the driver hash is exact."""
    from everythinggraph_ray.graph.triangles import local_clustering

    return local_clustering(rel_edges(sf_dir))


def q_rel_spmv_edgecentric(sf_dir):
    """Reference edge-centric SpMV asymmetry (spmv.c:130-136): y[u] =
    sum_{u->v} x[v] without the 0.001 factor — run on the REVERSED edge
    table so the combine lands on the original src. Exact int64."""
    from everythinggraph_ray.graph.kernels import SpMVEdgeCentricKernel
    from everythinggraph_ray.stages.edges import reverse_edges

    tag = f"relrev|{sf_dir}"
    bdir = build_dir_for(tag, 8)
    build_graph(reverse_edges(rel_edges(sf_dir)), bdir, num_partitions=8, hub_threshold=10**9)
    df = _run_engine(bdir, SpMVEdgeCentricKernel())
    return df.rename(columns={"spmv_edgecentric": "y"})[["vid", "y"]]


def q_rel_sssp_weighted(sf_dir):
    """Weighted SSSP with the reference's synthesized weights
    (init_all.c:663-666: w = src%10 + dst%10); SQL oracle = bounded relax
    enumeration; also exact vs the NumPy oracle in tests."""
    from everythinggraph_ray.graph.kernels import SSSPWeightedKernel

    df = _run_engine(_rel_weighted_build(sf_dir), SSSPWeightedKernel(_rel_root(sf_dir)))
    out = df.rename(columns={"sssp_weighted": "dist"})[["vid", "dist"]]
    out["dist"] = np.round(out["dist"].to_numpy(), 6)
    return out


def q_rel_msf(sf_dir):
    """Minimum spanning forest (Borůvka, graph/msf.py) of the undirected
    simple graph under the synthesized weights, unique by the (w, u, v)
    total order. Rows-only driver check (Kruskal is not SQL-expressible);
    exact Kruskal-equality pytest in tests/test_msf.py."""
    from everythinggraph_ray.graph.msf import minimum_spanning_forest
    from everythinggraph_ray.stages.edges import synthesize_weights

    forest, _rounds = minimum_spanning_forest(synthesize_weights(rel_edges(sf_dir)))
    df = forest.to_pandas()
    if df.empty:  # 0-row Datasets lose their schema in to_pandas
        df = pd.DataFrame({"u": [], "v": [], "w": []})
    return df.sort_values(["u", "v"]).reset_index(drop=True)


def q_rel_widest(sf_dir):
    """Widest (bottleneck) path capacities from the min-vid root over the
    synthesized weights — the max–min semiring on the same engine
    (combine='max'). Every surfaced value is exact in float64 (weights
    0..18, root sentinel 10^18, unreached −1), so the hash needs no
    rounding device."""
    from everythinggraph_ray.graph.kernels import WidestPathKernel

    df = _run_engine(_rel_weighted_build(sf_dir), WidestPathKernel(_rel_root(sf_dir)))
    out = df.rename(columns={"widest_path": "capacity"})[["vid", "capacity"]]
    c = out["capacity"].to_numpy()
    out["capacity"] = np.where(np.isneginf(c), -1.0, c)
    return out


def q_rel_louvain(sf_dir):
    """One-level Louvain community detection (graph/community.py):
    synchronous parity-scheduled greedy modularity moves with
    all-integer gain scores — 3 rounds over the simple undirected
    graph. Rows-only (iterative argmax rewiring has no SQL form);
    serial-rule equality and modularity-improvement are
    pytest-checked."""
    from everythinggraph_ray.graph.community import louvain_one_level

    out = louvain_one_level(rel_edges(sf_dir), n_rounds=3)
    return _typed_collect(out, {"vid": "int64", "community": "int64"})


def q_rel_dag_depth(sf_dir):
    """Longest-path depth over the degree-orientation DAG (triangle
    counting's orientation reused as a first-class DAG source): orient
    every distinct undirected edge from lower to higher (degree, vid),
    then run the MAX-PLUS DagDepthKernel — depth(v) = longest oriented
    path ending at v, the per-vertex degeneracy-ordering depth (a lower
    bound witness for coloring/core structure). Converges in exactly
    max-depth supersteps; acyclicity is guaranteed by the strict total
    order. Shares _oriented_with_degrees' cost-based degree attach
    (broadcast under 5M vertices, bucketed co-group above)."""
    from everythinggraph_ray.graph.kernels import DagDepthKernel
    from everythinggraph_ray.graph.triangles import (
        BROADCAST_V_THRESHOLD,
        _oriented_with_degrees,
    )

    oriented, deg, _ = _oriented_with_degrees(
        rel_edges(sf_dir), BROADCAST_V_THRESHOLD
    )
    if oriented is None:
        return pd.DataFrame(
            {"vid": pd.Series([], dtype="int64"), "depth": pd.Series([], dtype="int64")}
        )
    dag = oriented.map_batches(
        lambda t: pa.table({"src": t["u"], "dst": t["v"]}), batch_format="pyarrow"
    )
    tag = f"dagdepth|{sf_dir}"
    bdir = build_dir_for(tag, 8)
    build_graph(dag, bdir, num_partitions=8, hub_threshold=10**9)
    df = _run_engine(bdir, DagDepthKernel())
    return df.rename(columns={"dag_depth": "depth"})[["vid", "depth"]]


# ----------------------------------------------------------------------
# web-graph queries (url corpus; rows-only checks, pytest-validated)
# ----------------------------------------------------------------------
def q_web_extract_text(sf_dir):
    pages = ray.data.read_parquet(_corpus_for(sf_dir), columns=PAGE_EXTRACT_COLS)
    return pages_to_text(pages)


def _web_dense_edges_dir(sf_dir) -> str:
    """DISTRIBUTED pages → url-hash edges → dense renumber, cached as
    parquet under /tmp keyed by corpus (shared by the four hash-checked
    web flagship queries — round-3 VERDICT item 1). Every stage in the
    cached artifact is the Ray path (extract actors, bucketed keep-latest,
    bucketed distinct + range-partitioned rank, two bucketed joins); the
    DuckDB side re-derives the same table from the SERIAL extractor's
    side parquet (corpus.ensure_web_oracle_edges) + SQL row_number, so
    the driver hash genuinely crosses implementations."""
    return os.path.join(_web_dense_root(sf_dir), "edges")


def _web_dense_vidmap_dir(sf_dir) -> str:
    """(vid, dense) mapping parquet of the dense web build — lets the
    per-domain queries attach url-derived facts to dense vids without
    recomputing the rank."""
    return os.path.join(_web_dense_root(sf_dir), "vidmap")


def _web_dense_root(sf_dir) -> str:
    from everythinggraph_ray.stages.agg import dense_renumber_edges, dense_vid_map

    corpus = _corpus_for(sf_dir)
    d = f"/tmp/egray_dense/{os.path.basename(corpus)}_v2"
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil
        import uuid

        work = f"{d}.building-{uuid.uuid4().hex[:8]}"
        hash_edges = pages_to_edges(
            ray.data.read_parquet(corpus, columns=PAGE_EXTRACT_COLS)
        ).materialize()
        m = dense_vid_map(hash_edges).materialize()
        m.write_parquet(os.path.join(work, "vidmap"))
        dense_renumber_edges(hash_edges, vid_map=m).write_parquet(
            os.path.join(work, "edges")
        )
        with open(os.path.join(work, "_SUCCESS"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(work, d)
        except OSError:
            shutil.rmtree(work, ignore_errors=True)
    return d


def q_web_edges(sf_dir):
    """The flagship edge table with DENSELY renumbered endpoints (rank of
    the 63-bit url-hash vid over sorted distinct vids) — duplicate links
    kept as multiplicity. Hash-checked against the serial-extractor side
    parquet + SQL dense_rank (no Ray code on the oracle side)."""
    return ray.data.read_parquet(_web_dense_edges_dir(sf_dir))


def q_web_pagerank10(sf_dir):
    """Fixed-10-iteration reference PageRank over the dense web graph
    (pagerank_simple.c:43 runs exactly 10 timed iterations) — the web
    flagship's hash-checkable PR witness (the to-convergence variant
    web_pagerank stays rows-only: iteration count is data-dependent)."""
    bdir = build_dir_for(f"webdense|{_corpus_for(sf_dir)}", 8)
    build_graph(
        ray.data.read_parquet(_web_dense_edges_dir(sf_dir)), bdir, num_partitions=8
    )
    df = _run_engine(bdir, PageRankKernel(), n_iters=10)
    df["pagerank"] = np.round(df["pagerank"].to_numpy(), 7)
    return df[["vid", "pagerank"]]


ANCHOR_TOPK = 20


def q_web_anchor_text(sf_dir):
    """Anchor-text aggregation: for every (target url, anchor text)
    pair, the number of in-links carrying that text — the classic
    target-page description signal. Top-20 by (count desc, url, anchor).
    Per-page anchors emit pre-counted per batch → one pair-bucketed sum
    with bucket-local top-k, exact global top-k. Rows-only (HTML parsing
    has no SQL form); byte-level extractor pytest + corpus-consistency
    check in tests."""
    from hashlib import blake2b

    from everythinggraph_ray.html import extract_anchors
    from everythinggraph_ray.stages.agg import bucketed_reduce

    pages = ray.data.read_parquet(_corpus_for(sf_dir), columns=["url", "html"])

    def emit(batch: pa.Table) -> pa.Table:
        cnt: dict[tuple[str, str], int] = {}
        for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            for dst, text in extract_anchors(html, url):
                k = (dst, text)
                cnt[k] = cnt.get(k, 0) + 1
        return pa.table(
            {
                "dst_url": pa.array([k[0] for k in cnt], pa.string()),
                "anchor": pa.array([k[1] for k in cnt], pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return string_buckets(batch["dst_url"], batch["anchor"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["dst_url", "anchor"], as_index=False)["n"].sum()
        df = df.sort_values(["n", "dst_url", "anchor"], ascending=[False, True, True])
        return pa.Table.from_pandas(df.head(ANCHOR_TOPK), preserve_index=False)

    top = bucketed_reduce(pages.map_batches(emit, batch_format="pyarrow"), bucket_of, red)
    return (
        top.sort(["n", "dst_url", "anchor"], descending=[True, False, False])
        .limit(ANCHOR_TOPK)
    )


def q_web_pagerank(sf_dir):
    corpus = _corpus_for(sf_dir)
    bdir = build_dir_for(f"web|{corpus}", 8)
    build_graph(
        pages_to_edges(ray.data.read_parquet(corpus, columns=PAGE_EXTRACT_COLS)),
        bdir,
        num_partitions=8,
    )
    return _run_engine(bdir, PageRankKernel(), tol=1e-6)


def q_web_top10(sf_dir):
    """Top-10 pages by rank — the distributed form of the reference's
    Rank[0..9] print after its 10 fixed iterations (pagerank_simple.c:43,
    159-161). Ranks rounded to 1e-7 BEFORE the sort so the tie-break
    (rank desc, vid) selects identically to the SQL oracle."""
    df = q_web_pagerank10(sf_dir)
    return (
        df.sort_values(["pagerank", "vid"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


def q_web_curation(sf_dir):
    """Composed training-data curation pipeline over the web corpus:
    extract text (latest capture per url) → quality gate → exact dedup →
    corpus counts. ONE streaming pass (round-2 VERDICT fix — no
    materialize()): each row reduces to (text-md5, quality-pass) in the
    gate stage itself, the full text never shuffles, and all three counts
    ride the same bucketed reduce as per-bucket partial sums (pages /
    quality-survivors / distinct surviving texts — the md5 grouping is
    identical to datapipe.dedup.exact_duplicates). Rows-only check
    (pytest asserts the stage-by-stage invariants + determinism)."""
    import hashlib

    from everythinggraph_ray.datapipe.text import quality_values
    from everythinggraph_ray.stages.agg import bucketed_reduce

    pages = ray.data.read_parquet(_corpus_for(sf_dir), columns=PAGE_EXTRACT_COLS)
    ex = pages_to_text(pages)  # (url, text), keep-latest

    def row_stats(batch: pa.Table) -> pa.Table:
        # quality is a pure function of the text: score inline (no driver
        # keep-set); carry only (hash, pass) downstream
        ok = quality_values(batch["text"]) >= 0.2
        h = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"h": pa.array(h, pa.string()), "ok": pa.array(ok, pa.bool_())})

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return string_buckets(batch["h"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        return pa.table(
            {
                "n_pages": pa.array([len(df)], pa.int64()),
                "n_quality": pa.array([int(df["ok"].sum())], pa.int64()),
                "n_unique": pa.array([int(df.loc[df["ok"], "h"].nunique())], pa.int64()),
            }
        )

    parts = bucketed_reduce(
        ex.map_batches(row_stats, batch_format="pyarrow"), bucket_of, red
    ).to_pandas()
    tot = {c: int(parts[c].sum()) if len(parts) else 0 for c in ("n_pages", "n_quality", "n_unique")}
    return pa.table({c: pa.array([tot[c]], pa.int64()) for c in ("n_pages", "n_quality", "n_unique")})


def _web_rank_domain_table(sf_dir):
    """Shared head of the per-domain web queries: fixed-10-iteration
    PageRank over the DENSE web graph joined to (url → domain). Dense
    vids + the reference's timed 10-iteration mode
    (pagerank_simple.c:43) make every consumer SQL-checkable since
    round 4. Returns a Dataset (vid, domain, pagerank rounded 1e-8) —
    crawled pages only (link-target-only urls have no crawled domain
    row, exactly as before)."""
    from urllib.parse import urlsplit

    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.hashing import urls_to_vids
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    corpus = _corpus_for(sf_dir)
    bdir = build_dir_for(f"webdense|{corpus}", 8)
    build_graph(
        ray.data.read_parquet(_web_dense_edges_dir(sf_dir)), bdir, num_partitions=8
    )
    eng = GraphEngine(bdir)
    try:
        ranks = eng.run(PageRankKernel(), n_iters=10)["dataset"].materialize()
    finally:
        eng.shutdown()

    # (hash vid, domain) per distinct crawled url → dense vid via the
    # persisted map; ranks attach by dense vid. Two bucketed joins.
    def url_rows(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        domains = [urlsplit(u).netloc.lower() for u in urls]
        return pa.table(
            {
                "hvid": pa.array(urls_to_vids(batch["url"]), pa.int64()),
                "domain": pa.array(domains, pa.string()),
            }
        )

    def by_hvid(batch: pa.Table) -> np.ndarray:
        return mix64(batch["hvid"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    udom = bucketed_reduce(
        ray.data.read_parquet(corpus, columns=["url"]).map_batches(
            url_rows, batch_format="pyarrow"
        ),
        by_hvid,
        lambda g: pa.Table.from_pandas(
            g.to_pandas().drop_duplicates("hvid"), preserve_index=False
        ),
    )
    vidmap = ray.data.read_parquet(_web_dense_vidmap_dir(sf_dir))
    mapped = hash_join(
        vidmap, udom, on="vid", right_on="hvid", right_cols=["domain"]
    )  # (vid=hash, dense, domain); inner: link-target-only urls drop
    out = hash_join(ranks, mapped, on="vid", right_on="dense", right_cols=["domain"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": t["vid"],
                "domain": t["domain"],
                "pagerank": pa.array(
                    np.round(t["pagerank"].to_numpy(zero_copy_only=False), 8),
                    pa.float64(),
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_web_top_per_domain(sf_dir):
    """Composed: PageRank over the web graph, then the top-3 pages per
    DOMAIN by rank (grouped top-k over a rank⋈url co-group — the corpus
    curation 'best pages per site' shape). Rows-only check; grouped_top_k
    exactness is pytest-covered."""
    from everythinggraph_ray.stages.agg import grouped_top_k

    joined = _web_rank_domain_table(sf_dir)
    return grouped_top_k(
        joined, "domain", [("pagerank", False), ("vid", True)], 3, rank_col="rk"
    )


def q_web_hostrank(sf_dir):
    """HOST-level link graph + weighted PageRank (domain authority) —
    the production link-graph-tier product: page→page links contract to
    (src_host, dst_host, weight = link count), intra-host links drop,
    and WeightedPageRankKernel runs fixed-10 over the weighted build
    (rank splits proportionally to inter-host link multiplicity).
    Host vids are the stable 63-bit hash of the domain string
    internally; the OUTPUT is keyed by the domain itself, so the DuckDB
    oracle re-derives the whole host graph from the serial-extractor
    url side parquet and replays weighted PR10 over host strings —
    hash-checked since round 4 (was rows-only)."""
    from urllib.parse import urlsplit

    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.graph.kernels import WeightedPageRankKernel
    from everythinggraph_ray.hashing import urls_to_vids
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, sum_by_key_pair
    from everythinggraph_ray.stages.extract import dedup_keep_latest, explode_links, extract_pages

    corpus = _corpus_for(sf_dir)
    url_edges = explode_links(
        dedup_keep_latest(
            extract_pages(ray.data.read_parquet(corpus, columns=PAGE_EXTRACT_COLS))
        )
    ).materialize()  # consumed twice: host edges + host names

    def to_host_vids(batch: pa.Table) -> pa.Table:
        sh = [urlsplit(u).netloc.lower() for u in batch["src_url"].to_pylist()]
        dh = [urlsplit(u).netloc.lower() for u in batch["dst_url"].to_pylist()]
        return pa.table(
            {
                "src": pa.array(urls_to_vids(pa.array(sh, pa.string())), pa.int64()),
                "dst": pa.array(urls_to_vids(pa.array(dh, pa.string())), pa.int64()),
                "w": pa.array(np.ones(len(sh), np.int64), pa.int64()),
            }
        )

    hedges = url_edges.map_batches(to_host_vids, batch_format="pyarrow")
    hedges = hedges.map_batches(
        lambda t: t.filter(
            pa.array(
                t["src"].to_numpy(zero_copy_only=False)
                != t["dst"].to_numpy(zero_copy_only=False),
                pa.bool_(),
            )
        ),
        batch_format="pyarrow",
    )
    weighted = sum_by_key_pair(hedges, "src", "dst", ["w"]).map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "weight": pc.cast(t["w"], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )
    tag = f"webhost|{corpus}"
    bdir = build_dir_for(tag, 8)
    build_graph(weighted, bdir, num_partitions=8, weighted=True)
    eng = GraphEngine(bdir)
    try:
        ranks_ds = eng.run(WeightedPageRankKernel(), n_iters=10)["dataset"].map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "hostrank": pc.round(t["wpagerank"], ndigits=8),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    finally:
        eng.shutdown()

    # names for EVERY host in the graph (src or dst side — a linked-to
    # but never-crawled host's name comes from the link url itself):
    # per-batch distinct (host_vid, domain) rows, bucketed-dedup, one
    # hash_join. Stays distributed (hosts scale with the crawl).
    def host_rows(batch: pa.Table) -> pa.Table:
        hosts = sorted(
            {urlsplit(u).netloc.lower() for u in batch["src_url"].to_pylist()}
            | {urlsplit(u).netloc.lower() for u in batch["dst_url"].to_pylist()}
        )
        return pa.table(
            {
                "vid": pa.array(
                    urls_to_vids(pa.array(hosts, pa.string())), pa.int64()
                ),
                "domain": pa.array(hosts, pa.string()),
            }
        )

    def vid_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch["vid"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    names = bucketed_reduce(
        url_edges.map_batches(host_rows, batch_format="pyarrow"),
        vid_bucket,
        lambda g: pa.Table.from_pandas(
            g.to_pandas().drop_duplicates("vid"), preserve_index=False
        ),
    )
    out = hash_join(ranks_ds, names, on="vid", right_cols=["domain"], how="inner")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"domain": t["domain"], "hostrank": t["hostrank"]})

    return _typed_collect(
        out.map_batches(finish, batch_format="pyarrow"),
        {"domain": "object", "hostrank": "float64"},
    )

def q_web_crawl_schedule(sf_dir):
    """Politeness-scheduled recrawl frontier: EVERY page ranked within
    its host by PageRank (desc, vid tiebreak) through the distributed
    window primitive — slot k means "fetch in wave k" (one page per
    host per wave), the crawl-scheduling shape a link-graph tier runs
    daily. Unlike web_top_per_domain's top-3 head, this ranks every row
    of unbounded host groups (grouped_row_number: range-partitioned
    rank, no worker holds a whole host). Rows-only check (url-hash
    vids); the window primitive's exactness is pytest/SQL-covered via
    docs_len_rank."""
    from everythinggraph_ray.stages.agg import grouped_row_number

    joined = _web_rank_domain_table(sf_dir)

    def to_int_order(batch: pa.Table) -> pa.Table:
        pr = batch["pagerank"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch["vid"],
                "domain": batch["domain"],
                # rank on the NEGATED nano-grid so ascending rank = best
                # first (the window primitive's integer-order contract)
                "neg_pr_nano": pa.array(
                    (-np.floor(pr * 1e9)).astype(np.int64), pa.int64()
                ),
            }
        )

    ranked = grouped_row_number(
        joined.map_batches(to_int_order, batch_format="pyarrow"),
        "domain",
        "neg_pr_nano",
        "vid",
        rank_col="slot",
    )
    return ranked.map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "domain": t["domain"], "slot": t["slot"]}
        ),
        batch_format="pyarrow",
    )


def q_web_hits(sf_dir):
    """HITS (10 iterations) over the DENSE web graph — hash-checked
    since round 4 against the unrolled HITS SQL chain over the
    serial-extractor side parquet (was rows-only with url-hash vids)."""
    from everythinggraph_ray.graph.hits import hits

    corpus = _corpus_for(sf_dir)
    bdir = build_dir_for(f"webdensepull|{corpus}", 8)
    build_graph(
        ray.data.read_parquet(_web_dense_edges_dir(sf_dir)),
        bdir,
        num_partitions=8,
        partition_edges_by="dst",
    )
    res = hits(bdir, n_iters=10)
    df = res["dataset"].to_pandas().sort_values("vid").reset_index(drop=True)
    df["auth"] = np.round(df["auth"].to_numpy(), 7)
    df["hub"] = np.round(df["hub"].to_numpy(), 7)
    return df[["vid", "auth", "hub"]]


WEB_KCORE_SQL_ROUNDS = 16  # unrolled peel rounds in the oracle; must
# exceed the data's true peel-round count — the query asserts it


def q_web_kcore(sf_dir):
    """k-core (k=3) of the DENSE web graph: the spam/leaf-tail filter on
    the power-law link graph — hash-checked since round 4 against the
    unrolled-peel SQL over the serial-extractor side parquet. The query
    asserts the distributed peel converged within the oracle's unroll
    budget, so a deeper-than-expected corpus fails loudly instead of
    hash-mismatching."""
    from everythinggraph_ray.graph.kcore import kcore

    core, rounds = kcore(ray.data.read_parquet(_web_dense_edges_dir(sf_dir)), 3)
    if rounds > WEB_KCORE_SQL_ROUNDS:  # not assert: must survive python -O
        raise RuntimeError(
            f"web kcore peel took {rounds} rounds; raise WEB_KCORE_SQL_ROUNDS"
        )
    return core


def q_web_wcc(sf_dir):
    """Weakly-connected components of the dense-renumbered web graph
    (exact min-label fixpoint) — hash-checked against a recursive DuckDB
    min-propagation over the serial-extractor side parquet."""
    corpus = _corpus_for(sf_dir)
    bdir = build_dir_for(f"webdenseund|{corpus}", 8)
    build_graph(
        undirect_edges(ray.data.read_parquet(_web_dense_edges_dir(sf_dir))),
        bdir,
        num_partitions=8,
    )
    df = _run_engine(bdir, WCCKernel())
    return df.rename(columns={"wcc": "component"})


# ----------------------------------------------------------------------
# documents / embeddings / events queries
# ----------------------------------------------------------------------
def _docs(sf_dir, columns: list[str] | None = None):
    """Documents table; pass ``columns`` to prune at the read — callers
    that consume only (doc_id, text) should not ship lang/source/n_chars
    off storage (round-4 VERDICT item 8)."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def q_doc_stats(sf_dir):
    return doc_stats(_docs(sf_dir, columns=["doc_id", "text"]))


def q_docs_exact_dedup(sf_dir):
    return exact_duplicates(_docs(sf_dir, columns=["doc_id", "text"]))


def q_docs_quality(sf_dir):
    return quality_score(_docs(sf_dir, columns=["doc_id", "text"]))


def q_docs_lang_counts(sf_dir):
    from ray.data.aggregate import Count

    return _docs(sf_dir, columns=["lang"]).groupby("lang").aggregate(Count(alias_name="n"))


def q_docs_top_tokens(sf_dir):
    return top_tokens(_docs(sf_dir, columns=["doc_id", "text"]), k=50)


def q_docs_langid(sf_dir):
    return lang_id(_docs(sf_dir, columns=["doc_id", "text"]))


def q_docs_top_tokens_per_lang(sf_dir):
    """Grouped heavy hitters: 10 most frequent words per language
    (datapipe/text.py top_tokens_per_lang — (lang, token)-bucketed exact
    counts, grouped_top_k final)."""
    from everythinggraph_ray.datapipe.text import top_tokens_per_lang

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )
    return top_tokens_per_lang(docs, k=10)


def q_docs_containment(sf_dir):
    """Quote/subset pairs by Broder containment (datapipe/dedup.py
    containment_pairs): rare-shingle blocking + distributed pairwise
    verify with |A∩B|/min(|A|,|B|) — catches a short doc quoted inside
    a long one, which symmetric-Jaccard MinHash structurally misses.
    Rows-only; pytest carries the serial oracle and the quote-scenario
    fixture."""
    from everythinggraph_ray.datapipe.dedup import containment_pairs

    return _typed_collect(
        containment_pairs(_docs(sf_dir, columns=["doc_id", "text"]), threshold_milli=800),
        {"a": "int64", "b": "int64", "cont_milli": "int64"},
    )


def q_docs_snm_pairs(sf_dir):
    """Sorted-neighborhood near-dup pairs (datapipe/dedup.py
    snm_near_duplicates) — the ORDER-blocking complement of MinHash/
    SimHash. Rows-only (quantile boundaries come from a sample);
    exactness vs the serial global-window scan is pytest-checked."""
    from everythinggraph_ray.datapipe.dedup import snm_near_duplicates

    return _typed_collect(
        snm_near_duplicates(_docs(sf_dir, columns=["doc_id", "text"]), window=5, threshold_milli=700),
        {"a": "int64", "b": "int64", "jac_milli": "int64"},
    )


def q_docs_lang_entropy(sf_dir):
    """Unigram Shannon entropy of each language's word distribution —
    the vocabulary-diversity signal (H = ln N − Σ c·ln c / N over exact
    token counts). Machinery: the (lang, token)-bucketed exact counts of
    top_tokens_per_lang, then per-batch (lang, Σn, Σ n·ln n) partials
    reduce to #langs driver rows. round 7 (the pagerank10 float device);
    every ln term is over an exact integer shared with the SQL."""
    from hashlib import blake2b

    from everythinggraph_ray.stages.agg import bucketed_reduce

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )
    import re as _re

    from everythinggraph_ray.datapipe.text import WORD_RE

    def partial(batch: pa.Table) -> pa.Table:
        rx = _re.compile(WORD_RE)
        cnt: dict[tuple[str, str], int] = {}
        for lg, t in zip(
            batch["lang"].to_pylist(), pc.utf8_lower(batch["text"]).to_pylist()
        ):
            for w in rx.findall(t):
                cnt[(lg, w)] = cnt.get((lg, w), 0) + 1
        ks = list(cnt.keys())
        return pa.table(
            {
                "lang": pa.array([a for a, _ in ks], pa.string()),
                "token": pa.array([b for _, b in ks], pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return string_buckets(batch["lang"], batch["token"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["lang", "token"], as_index=False)["c"].sum()
        n = df["c"].to_numpy(np.int64)
        out = pd.DataFrame(
            {"lang": df["lang"], "n": n, "nln": n * np.log(n)}
        ).groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"), bucket_of, red
    ).to_pandas()
    g = parts.groupby("lang", as_index=False).sum()
    N = g["n"].to_numpy(np.int64)
    ent = np.round(np.log(N) - g["nln"].to_numpy() / N, 7)
    return pd.DataFrame(
        {"lang": g["lang"], "n_tokens": N, "entropy": ent}
    ).astype({"lang": "string", "n_tokens": "int64", "entropy": "float64"})


def q_docs_bigram_lm(sf_dir):
    """Corpus-as-its-own-LM quality signal: per-doc bigram logprob with
    add-one smoothing over the observed bigram space (datapipe/lm.py —
    CCNet/Gopher-style perplexity filter without an external model).
    Hash parity via round(Σ ln-terms, 7), each term a ratio of exact
    integer counts shared verbatim with the SQL."""
    from everythinggraph_ray.datapipe.lm import bigram_lm

    return bigram_lm(_docs(sf_dir, columns=["doc_id", "text"]))


def q_docs_fingerprint(sf_dir):
    return fingerprint(_docs(sf_dir, columns=["doc_id", "text"]))


def q_docs_top_quality_per_lang(sf_dir):
    """Grouped top-k: the 5 highest-quality docs per language (quality
    desc, doc_id asc tiebreak) — per-batch partial top-k combiner, then a
    small per-group final (stages/agg.py grouped_top_k)."""
    from everythinggraph_ray.datapipe.text import quality_values
    from everythinggraph_ray.stages.agg import grouped_top_k

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )

    def score(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch["lang"],
                "doc_id": batch["doc_id"],
                "quality": pa.array(quality_values(batch["text"]), pa.float64()),
            }
        )

    return grouped_top_k(
        docs.map_batches(score, batch_format="pyarrow"),
        "lang",
        [("quality", False), ("doc_id", True)],
        5,
        rank_col="rk",
    )


def q_docs_minhash_clusters(sf_dir):
    """Near-dup clusters WITH the starred-bucket loss metric as a
    constant ``starred_milli`` column (round-3 VERDICT item 9): the
    per-mille fraction of candidate pairs proposed via oversized-bucket
    star hubs — recall loss is visible in every run's output."""
    return _typed_collect(
        minhash_near_duplicates(_docs(sf_dir, columns=["doc_id", "text"]), threshold=0.8, with_starred_frac=True),
        {"doc_id": "int64", "cluster_id": "int64", "starred_milli": "int64"},
    )


def q_docs_simhash(sf_dir):
    from everythinggraph_ray.datapipe.dedup import simhash

    return simhash(_docs(sf_dir, columns=["doc_id", "text"]))


def q_docs_simhash_dedup(sf_dir):
    """SimHash banding candidates verified with exact n-gram Jaccard —
    (a, b, jaccard) pairs with jaccard >= 0.5, all stages distributed
    (bucketed co-group verify). Carries the starred-bucket loss metric
    as a constant ``starred_milli`` column (round-3 VERDICT item 9).
    Rows-only check."""
    from everythinggraph_ray.datapipe.dedup import (
        ngram_jaccard_pairs,
        simhash_candidates,
        starred_milli_of,
    )

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    cand = simhash_candidates(docs).materialize()
    sm = starred_milli_of(cand)
    out = ngram_jaccard_pairs(docs, cand.select_columns(["a", "b"]))
    def gate(t: pa.Table, _sm: int = sm) -> pa.Table:
        f = t.filter(pc.greater_equal(t["jaccard"], 0.5))
        return f.append_column(
            "starred_milli", pa.array(np.full(f.num_rows, _sm, np.int64), pa.int64())
        )

    kept = out.map_batches(gate, batch_format="pyarrow")
    return _typed_collect(
        kept, {"a": "int64", "b": "int64", "jaccard": "float64", "starred_milli": "int64"}
    )


def _typed_collect(ds, dtypes: dict[str, str]) -> pd.DataFrame:
    """Collect a (small, final-result) Dataset to pandas with a STABLE
    column set: Ray's to_pandas drops all columns when every block is
    empty, which would break the driver's schema check."""
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    if not len(df):
        return pd.DataFrame({c: pd.array([], dtype=t) for c, t in dtypes.items()})
    return df[list(dtypes)].astype(dtypes)


NEARDUP_ID_OFFSET = 1_000_000_000


def q_emb_near_dup(sf_dir):
    """Embedding-cosine near-duplicate pairs (LSH + distributed co-group
    verify, datapipe/pairs.py). The synthetic embeddings table carries no
    planted near-dups (max pairwise cos ≈ 0.51 at sf0.01), which would
    exercise only the empty path — so the query derives an AUGMENTED
    corpus first: for the ``KNN_QUERIES`` smallest vec_ids it unions a
    deterministically jittered copy (id + 10^9, vector + 1% seeded
    noise, cos ≈ 0.99995), guaranteeing the non-empty verify/dedup path
    runs end-to-end (round-2 VERDICT #10). Rows-only check; exact pair
    recovery (every planted (i, i+10^9)) is asserted in pytest."""
    from everythinggraph_ray.datapipe.knn import embedding_near_duplicates, smallest_ids

    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ids = smallest_ids(emb, "vec_id", KNN_QUERIES)

    def grab(batch: pa.Table) -> pa.Table:
        v = batch["vec_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(v, ids)))

    seed_rows = emb.map_batches(grab, batch_format="pyarrow").to_pandas()
    vecs = np.stack(seed_rows["embedding"].to_numpy()).astype(np.float64)
    vids = seed_rows["vec_id"].to_numpy(np.int64)
    noise = np.stack(
        [np.random.default_rng(int(v)).standard_normal(vecs.shape[1]) for v in vids]
    )
    noise /= np.maximum(np.linalg.norm(noise, axis=1, keepdims=True), 1e-30)
    jittered = vecs + 0.01 * np.linalg.norm(vecs, axis=1, keepdims=True) * noise
    copies = pa.table(
        {
            "vec_id": pa.array(vids + NEARDUP_ID_OFFSET, pa.int64()),
            "embedding": pa.array(
                [r.astype(np.float32) for r in jittered], pa.list_(pa.float32())
            ),
            "label": pa.array(seed_rows["label"].to_numpy(np.int32), pa.int32()),
        }
    )
    aug = emb.union(ray.data.from_arrow(copies))
    return _typed_collect(
        embedding_near_duplicates(aug, threshold=0.9),
        {"a": "int64", "b": "int64", "cos": "float64"},
    )


def q_docs_minhash_md5(sf_dir):
    """MinHash signatures with FULL SQL parity (the minhash family's
    first hash-green oracle): md5-based 64-bit shingle hash (DuckDB
    md5_number_lower), 8 affine permutations mod 2^64, min per (doc,
    seed). Streaming, shuffle-free: each doc's min rides inside its
    batch. 8 rows per doc."""
    from everythinggraph_ray.datapipe.dedup import minhash_signatures_md5

    return _typed_collect(
        minhash_signatures_md5(_docs(sf_dir, columns=["doc_id", "text"])),
        {"doc_id": "int64", "seed": "int64", "minhash": "int64"},
    )


def q_emb_allpairs_sim(sf_dir):
    """EXACT all-pairs cosine >= 0.40 over the embeddings table — the
    brute-force baseline for the LSH near-dup path, and the one
    embedding-similarity query with full DuckDB hash parity
    (list_cosine_similarity over DOUBLE[]). Output (a, b, sim_milli)
    with the similarity on an integer 1e-3 grid so the value hash is
    immune to summation-order ulps. Quadratic by definition — the
    documented baseline path, not the 100 TB path (that is
    emb_near_dup's LSH + co-group verify)."""
    from everythinggraph_ray.datapipe.knn import allpairs_similarity

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return _typed_collect(
        allpairs_similarity(emb, threshold=0.40),
        {"a": "int64", "b": "int64", "sim_milli": "int64"},
    )


def q_emb_dim_recall(sf_dir):
    """Truncated-dimension recall eval (the Matryoshka-embeddings
    question: how much ANN recall survives halving the vector?): for the
    KNN_QUERIES smallest vec_ids, exact top-10 by FULL-dim cosine vs
    top-10 by FIRST-HALF-dim cosine, reported as the per-query overlap
    count. Both sides are the broadcast-matmul brute-force path; the
    truncation is a per-batch arrow slice. Integer overlaps → full hash
    parity."""
    from everythinggraph_ray.datapipe.knn import knn_bruteforce, smallest_ids

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = smallest_ids(emb, "vec_id", KNN_QUERIES)
    full = knn_bruteforce(emb, ids, k=KNN_K)

    def halve(batch: pa.Table) -> pa.Table:
        vecs = [v[: len(v) // 2] for v in batch["embedding"].to_pylist()]
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": pa.array(vecs, batch["embedding"].type),
            }
        )

    half = knn_bruteforce(
        emb.map_batches(halve, batch_format="pyarrow"), ids, k=KNN_K
    )
    m = full.merge(half, on=["query_id", "neighbor_id"], how="left", suffixes=("", "_h"))
    out = (
        m.groupby("query_id", as_index=False)
        .agg(n_overlap=("rank_h", "count"))
        .astype({"query_id": "int64", "n_overlap": "int64"})
    )
    return out[["query_id", "n_overlap"]]


def q_emb_quantize_sq(sf_dir):
    """SQ8 scalar quantization of the embedding corpus (datapipe/
    quantize.py): per-dim global min/max (one streaming pass → 2·d
    driver floats), then vectorized per-batch coding with the range
    broadcast once via ray.put. Surfaced as (vec_id, md5 of the code
    CSV, code sum) — both sides of the oracle evaluate the identical
    float64 expression tree, so the uint8 codes are bit-exact vs
    DuckDB."""
    from everythinggraph_ray.datapipe.quantize import sq8_quantize

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return _typed_collect(
        sq8_quantize(emb),
        {"vec_id": "int64", "code_md5": "object", "code_sum": "int64"},
    )


JACCARD_JOIN_MILLI = 500


def q_docs_jaccard_join(sf_dir):
    """EXACT set-similarity self-join (distinct-word Jaccard >= 0.5)
    via prefix filtering (datapipe/setjoin.py — AllPairs/PPJoin lemma:
    candidates only from shared rarest-df prefix tokens, so the join is
    exact without the |corpus|^2 scan; MinHash's exact complement).
    Integer similarity (1000*inter)//union keeps the threshold test and
    the DuckDB oracle bit-identical."""
    from everythinggraph_ray.datapipe.setjoin import jaccard_join

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return _typed_collect(
        jaccard_join(docs, threshold_milli=JACCARD_JOIN_MILLI),
        {"a": "int64", "b": "int64", "jac_milli": "int64"},
    )


EMB_CLUSTER_THRESHOLD = 0.40


def q_emb_sim_clusters(sf_dir):
    """Embedding similarity CLUSTERS: the cosine-threshold pair table
    (emb_allpairs_sim's exact baseline) fed straight into the
    distributed WCCKernel clustering (datapipe/pairs.py cluster_pairs)
    — the 'group near-duplicate vectors, keep one per cluster' primitive
    of embedding-level corpus dedup, here with FULL DuckDB hash parity:
    pairs via list_cosine_similarity, components via the recursive
    min-label CTE (rel_wcc's oracle shape). Output one row per vector
    that has at least one neighbor: (vec_id, cluster_id = min member).
    At 100 TB the pair generator swaps to the LSH candidate path
    (emb_near_dup) while this clustering tail is unchanged."""
    from everythinggraph_ray.datapipe.knn import allpairs_similarity
    from everythinggraph_ray.datapipe.pairs import cluster_pairs

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    pairs = allpairs_similarity(emb, threshold=EMB_CLUSTER_THRESHOLD)
    out = cluster_pairs(pairs).map_batches(
        lambda t: pa.table({"vec_id": t["doc_id"], "cluster_id": t["cluster_id"]}),
        batch_format="pyarrow",
    )
    return _typed_collect(out, {"vec_id": "int64", "cluster_id": "int64"})


def q_docs_dedup_keep_best(sf_dir):
    """Canonical-document selection — the stage AFTER near-dup
    clustering in a production dedup pipeline: within each MinHash+LSH
    cluster keep the highest-QUALITY member (quality desc, doc_id asc
    tiebreak), emitting (cluster_id, keep_doc_id, quality, n_members).
    Composition: the distributed cluster table ⋈ quality scores via the
    bucketed hash_join, grouped top-1 + member counts per cluster.
    Rows-only (MinHash clusters); the keep rule is asserted exactly in
    pytest against the cluster/quality tables it consumes."""
    from ray.data.aggregate import Count

    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.datapipe.text import quality_score
    from everythinggraph_ray.stages.agg import grouped_top_k

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    clusters = minhash_near_duplicates(docs, threshold=0.8).materialize()
    if clusters.count() == 0:
        return pd.DataFrame(
            {
                "cluster_id": pd.Series([], dtype="int64"),
                "keep_doc_id": pd.Series([], dtype="int64"),
                "quality": pd.Series([], dtype="float64"),
                "n_members": pd.Series([], dtype="int64"),
            }
        )
    q = quality_score(docs)
    withq = hash_join(clusters, q, on="doc_id", right_cols=["quality"]).materialize()
    best = grouped_top_k(
        withq, "cluster_id", [("quality", False), ("doc_id", True)], 1
    )
    sizes = withq.groupby("cluster_id").aggregate(Count(alias_name="n_members"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cluster_id": t["cluster_id"],
                "keep_doc_id": t["doc_id"],
                "quality": pc.round(t["quality"], ndigits=8),
            }
        )

    # stays distributed: one row per cluster never lands on the driver
    out = hash_join(
        best.map_batches(finish, batch_format="pyarrow"),
        sizes,
        on="cluster_id",
        right_cols=["n_members"],
    )
    return _typed_collect(
        out,
        {
            "cluster_id": "int64",
            "keep_doc_id": "int64",
            "quality": "float64",
            "n_members": "int64",
        },
    )


def q_docs_candidate_starred(sf_dir):
    """Candidate-generation loss metric (round-2 VERDICT #9): for the
    minhash band table and the simhash chunk table, the number of
    candidate pairs and how many were proposed by STARRED buckets (groups
    larger than max_bucket emit a hub star instead of the O(n²) clique —
    connectivity preserved, pairwise recall lost). Surfaces the silent-cap
    fraction as a first-class metric. Per-batch partial sums; no oracle
    (hash-derived buckets); the exact counts on an oversized-bucket
    fixture are asserted in pytest."""
    from everythinggraph_ray.datapipe.dedup import MinHashStage, simhash_candidates
    from everythinggraph_ray.datapipe.pairs import group_pairs

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    stage = MinHashStage()
    minhash_cand = group_pairs(
        docs.map_batches(stage, batch_format="pyarrow"), ["band_id", "band_hash"]
    )
    simhash_cand = simhash_candidates(docs)

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["starred"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_pairs": pa.array([len(s)], pa.int64()),
                "n_starred": pa.array([int(s.sum())], pa.int64()),
            }
        )

    rows = []
    for source, cand in (("minhash_bands", minhash_cand), ("simhash_chunks", simhash_cand)):
        df = cand.map_batches(partial, batch_format="pyarrow").to_pandas()
        rows.append(
            (source, int(df["n_pairs"].sum()) if len(df) else 0, int(df["n_starred"].sum()) if len(df) else 0)
        )
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
            "n_starred": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def q_multimodal_features(sf_dir):
    """Multimodal decode over a real binary column: each page's html
    bytes become a deterministic raster payload (PPM / PGM / BMP by
    item id, every 4th left undecodable) and ride the actor-pool decode
    stage — so the STDLIB image-decode rungs (real raster parses, no
    image libs needed) are exercised in the sweep, with the fake rung
    covering the undecodable quarter (round-4 VERDICT item 3).
    Rows-only check; decode exactness asserted in tests."""
    from everythinggraph_ray.datapipe.multimodal import (
        decode_features,
        synth_raster_payload,
    )
    from everythinggraph_ray.hashing import urls_to_vids

    pages = ray.data.read_parquet(_corpus_for(sf_dir), columns=["url", "html"])

    def as_items(batch: pa.Table) -> pa.Table:
        vids = urls_to_vids(batch["url"])
        payloads = [
            synth_raster_payload(h if h is not None else b"", int(v))
            for v, h in zip(vids, batch["html"].to_pylist())
        ]
        return pa.table(
            {
                "item_id": pa.array(vids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    feats = decode_features(
        pages.map_batches(as_items, batch_format="pyarrow"), batch_size=128
    )

    def summarize(batch: pa.Table) -> pa.Table:
        f = batch["features"]
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        m = f.flatten().to_numpy(zero_copy_only=False).reshape(len(f), -1)
        return pa.table(
            {
                "item_id": batch["item_id"],
                "n_bytes": batch["n_bytes"],
                "feat_mean": pa.array(np.round(m.mean(axis=1), 6), pa.float64()),
            }
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


def q_multimodal_frames(sf_dir):
    """Frame-sampling plumbing (video-style explode) over the corpus html
    payloads: (item_id, frame_idx, frame_bytes_len). Rows-only check."""
    from everythinggraph_ray.datapipe.multimodal import frame_sample
    from everythinggraph_ray.hashing import urls_to_vids

    pages = ray.data.read_parquet(_corpus_for(sf_dir), columns=["url", "html"])

    def as_items(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "item_id": pa.array(urls_to_vids(batch["url"]), pa.int64()),
                "payload": batch["html"],
            }
        )

    frames = frame_sample(pages.map_batches(as_items, batch_format="pyarrow"), every_n=4)
    return frames.map_batches(
        lambda t: pa.table(
            {
                "item_id": t["item_id"],
                "frame_idx": t["frame_idx"],
                "frame_len": pc.cast(pc.binary_length(t["frame"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_rel_wcc_dataset(sf_dir):
    """Pure-Dataset WCC cross-variant (dataset_kernels.wcc_dataset) — the
    push-vs-pull style second formulation; same SQL oracle as rel_wcc."""
    from everythinggraph_ray.graph.dataset_kernels import wcc_dataset

    return wcc_dataset(rel_edges(sf_dir))


def q_knn_top10(sf_dir):
    from everythinggraph_ray.datapipe.knn import smallest_ids

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = smallest_ids(emb, "vec_id", KNN_QUERIES)  # bounded min-k, no O(V) pull
    return knn_bruteforce(emb, ids, k=KNN_K)


def q_knn_ivf_top10(sf_dir):
    """IVF ANN over the embeddings table — probing all centroids, so the
    result is EXACT and shares knn_top10's SQL oracle (the assignment +
    grouped-search machinery is what's under test; the recall-vs-probe
    tradeoff is covered in pytest)."""
    from everythinggraph_ray.datapipe.knn import knn_ivf, smallest_ids

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = smallest_ids(emb, "vec_id", KNN_QUERIES)
    return knn_ivf(emb, ids, k=KNN_K, n_centroids=8, n_probe=8)


def q_rel_conductance(sf_dir):
    """Per-community conductance surface (community, vol, cut) for the
    louvain partition (graph/community.py community_conductance) —
    conductance = cut/min(vol, 2m−vol) is reconstructable exactly from
    the integer columns. Rows-only (louvain has no SQL form); the
    composition is pytest-checked against a serial reference."""
    from everythinggraph_ray.graph.community import (
        community_conductance,
        louvain_one_level,
    )

    e = rel_edges(sf_dir)
    labels = louvain_one_level(e, n_rounds=3)
    return _typed_collect(
        community_conductance(e, labels),
        {"community": "int64", "vol": "int64", "cut": "int64"},
    )


def q_rel_partition_cut(sf_dir):
    """Edge-cut cost of the engine's own hash partitioner (src%P vs
    dst%P, P=8 — graph/build.py _add_part_column): the fraction of
    edges whose scatter crosses partitions IS the per-superstep exchange
    volume the BSP engine pays, so the metric that justifies hub
    mirroring rides the driver surface. One streaming aggregate
    (per-batch partial counts, 3 driver ints)."""
    e = rel_edges(sf_dir)
    P = 8

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        cut = int(((s % P) != (d % P)).sum())
        return pa.table(
            {"n_edges": pa.array([len(s)], pa.int64()),
             "n_cut": pa.array([cut], pa.int64())}
        )

    parts = e.map_batches(partial, batch_format="pyarrow").to_pandas()
    n, c = int(parts["n_edges"].sum()), int(parts["n_cut"].sum())
    return pd.DataFrame(
        {"n_edges": [n], "n_cut": [c], "cut_milli": [c * 1000 // n if n else 0]}
    ).astype("int64")


def q_rel_simrank8(sf_dir):
    """Two exact SimRank iterations for seed vertices 0..7
    (graph/simrank.py) — the recursive generalization of
    rel_cocitation/rel_coupling; cocitation restricted by a broadcast
    semi-join to the seed neighborhoods, wedge pairs via a src-grouped
    combiner."""
    from everythinggraph_ray.graph.simrank import simrank2

    return simrank2(rel_edges(sf_dir), list(range(8)))


def q_emb_gram(sf_dir):
    """Distributed normal equations (datapipe/cluster.py gram_matrix):
    XᵀX upper triangle as (i, j, g) rows plus Xᵀy as (i, 0) — the
    closed-form ridge-regression surface (one BLAS partial per batch,
    d² driver floats). The ridge solve itself is pytest-checked."""
    from everythinggraph_ray.datapipe.cluster import gram_matrix

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )
    return gram_matrix(emb)


def q_emb_standardize(sf_dir):
    """Per-dim z-score standardization of the embedding corpus
    (datapipe/quantize.py standardize): two streaming passes (3·d
    driver floats between them), integer surface round(Σ_d z · 1e6)."""
    from everythinggraph_ray.datapipe.quantize import standardize

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return standardize(emb)


def q_rel_featprop2(sf_dir):
    """Two rounds of GNN-style mean-aggregate feature propagation
    (graph/featprop.py): the embeddings table's first 4 dims pushed
    along the distinct rel graph, x[v] ← Σ_{(u,v)} x[u]/outdeg(u) —
    the multi-channel SpMM generalizing rel_spmv."""
    from everythinggraph_ray.graph.featprop import (
        feature_propagation,
        features_from_embeddings,
    )

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    feats = features_from_embeddings(emb, 4)
    out = feature_propagation(rel_edges(sf_dir), feats, n_iters=2, dim=4)
    df = out.to_pandas().sort_values("vid").reset_index(drop=True)
    for c in ("f0", "f1", "f2", "f3"):  # the pagerank10 float device
        df[c] = np.round(df[c].to_numpy(), 7)
    return df


def q_knn_pq_top10(sf_dir):
    """Product-quantization ADC top-k (datapipe/pq.py): ONE fused
    streaming scan over the corpus (encode + LUT scoring + local top-k),
    no shuffle. Approximate by construction (codes, not floats), so
    rows-only on the driver; pytest carries the recall-vs-bruteforce and
    serial-parity oracles (tests/test_pq.py)."""
    from everythinggraph_ray.datapipe.knn import smallest_ids
    from everythinggraph_ray.datapipe.pq import knn_pq

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = smallest_ids(emb, "vec_id", KNN_QUERIES)
    return knn_pq(emb, ids, k=KNN_K, m_sub=4, n_codes=16)


def q_emb_pq_codes(sf_dir):
    """PQ code assignment per embedding, surfaced as md5(code CSV) +
    code sum (the SQ8 surface shape, quantize.py:63). Deterministic
    (seeded k-means, fixed iters) but not SQL-expressible → rows-only;
    pytest pins codes against a serial numpy reference."""
    from everythinggraph_ray.datapipe.pq import pq_encode

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return pq_encode(emb, m_sub=4, n_codes=16).sort("vec_id")


def q_events_hourly(sf_dir):
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    )

    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64_pair

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000
        val_u = np.round(batch["value"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "hour_bucket": hour, "v": val_u})
        g = df.groupby(["user_id", "hour_bucket"], as_index=False).agg(
            n_events=("v", "size"), value_sum_u=("v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_of(batch: pa.Table) -> np.ndarray:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        h = batch["hour_bucket"].to_numpy(zero_copy_only=False)
        return mix64_pair(u, h)

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["user_id", "hour_bucket"], as_index=False).agg(
            n_events=("n_events", "sum"), value_sum_u=("value_sum_u", "sum")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=256 * 1024), bucket_of, red
    )


def q_events_hourly_uniques(sf_dir):
    """Exact COUNT(DISTINCT user) per tumbling hour — the canonical
    two-exchange distinct-count plan (the exact complement of the HLL
    sketch in docs_vocab_hll): (1) per-batch np.unique on (hour, user)
    pairs (the combiner — repeat visitors within a batch collapse before
    anything moves), (2) bucketed GLOBAL distinct on the pair (each
    (hour, user) lands in exactly one mix64 bucket), reduced straight to
    per-hour PARTIAL counts inside the bucket, (3) tiny bucketed sum by
    hour. The corpus never shuffles twice — only (hour, user) pairs,
    then (hour, partial) rows."""
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, mix64_pair

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def local_distinct(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000
        u = np.unique(np.stack([hour, uid], axis=1), axis=0)
        return pa.table(
            {
                "hour_bucket": pa.array(u[:, 0], pa.int64()),
                "user_id": pa.array(u[:, 1], pa.int64()),
            }
        )

    pairs = ev.map_batches(local_distinct, batch_format="pyarrow", batch_size=256 * 1024)

    def pair_bucket(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["hour_bucket"].to_numpy(zero_copy_only=False),
            batch["user_id"].to_numpy(zero_copy_only=False),
        )

    def count_distinct(g: pa.Table) -> pa.Table:
        arr = np.stack(
            [
                g["hour_bucket"].to_numpy(zero_copy_only=False),
                g["user_id"].to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        u = np.unique(arr, axis=0)
        hours, counts = np.unique(u[:, 0], return_counts=True)
        return pa.table(
            {
                "hour_bucket": pa.array(hours, pa.int64()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    partials = bucketed_reduce(pairs, pair_bucket, count_distinct)

    def hour_bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["hour_bucket"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        ) & 0x7FFFFFFF

    def sum_hours(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("hour_bucket", as_index=False)["c"].sum()
        return pa.table(
            {
                "hour_bucket": pa.array(df["hour_bucket"].to_numpy(np.int64), pa.int64()),
                "n_users": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
            }
        )

    return bucketed_reduce(partials, hour_bucket_of, sum_hours)


def q_events_sessions(sf_dir):
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )

    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def sess_bucket(g: pa.Table) -> pa.Table:
        # vectorized over the whole bucket: a session starts where the user
        # changes or the in-user gap exceeds 30 min (sorted user, ts, id)
        df = g.to_pandas().sort_values(["user_id", "ts", "event_id"])
        gap = df["ts"].diff().dt.total_seconds()
        new_user = df["user_id"].ne(df["user_id"].shift())
        df["ns"] = (new_user | gap.isna() | (gap > 1800)).astype(np.int64)
        out = df.groupby("user_id", as_index=False)["ns"].sum()
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(np.int64), pa.int64()),
                "n_sessions": pa.array(out["ns"].to_numpy(np.int64), pa.int64()),
            }
        )

    return bucketed_reduce(ev, bucket_of, sess_bucket)


def q_orders_monthly_growth(sf_dir):
    """Month-over-month revenue: per-month exact cent totals (per-batch
    partials → tiny month table) with the previous month's total and
    the signed delta attached — the lag() window on an AGGREGATED
    series (events_lag_stats does it on raw rows). The month table is
    bounded by the date range, so the window runs on the driver."""
    ords = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
        month = d.astype(np.int64)  # months since 1970-01
        cents = np.round(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        u, inv = np.unique(month, return_inverse=True)
        return pa.table(
            {
                "month": pa.array(u, pa.int64()),
                "rev": pa.array(np.bincount(inv, weights=cents).astype(np.int64), pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            }
        )

    parts = ords.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("month", as_index=False).sum().sort_values("month")
    g["prev_rev"] = g["rev"].shift().fillna(0).astype(np.int64)
    g["delta"] = (g["rev"] - g["prev_rev"]).astype(np.int64)
    return g.rename(columns={"rev": "rev_cents", "n": "n_orders"}).astype("int64")[
        ["month", "n_orders", "rev_cents", "prev_rev", "delta"]
    ]


def q_docs_profile(sf_dir):
    """One-pass table profiling (the engine's ANALYZE): row count, per-
    column null counts, distinct lang/source cardinalities, and text
    length min/max/sum — the data-quality snapshot every ingestion run
    wants. Per-batch partials carry (counts, mins, maxes, small distinct
    sets); langs/sources are low-cardinality by contract so their
    partial sets stay bounded."""
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))

    def partial(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        lens = pc.cast(pc.utf8_length(pc.fill_null(t, "")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        langs = {x for x in batch["lang"].to_pylist() if x is not None}
        srcs = {x for x in batch["source"].to_pylist() if x is not None}
        return pa.table(
            {
                "n_rows": pa.array([batch.num_rows], pa.int64()),
                "null_text": pa.array([int(t.null_count)], pa.int64()),
                "null_lang": pa.array([int(batch["lang"].null_count)], pa.int64()),
                "null_source": pa.array([int(batch["source"].null_count)], pa.int64()),
                "len_min": pa.array([int(lens.min()) if len(lens) else 0], pa.int64()),
                "len_max": pa.array([int(lens.max()) if len(lens) else 0], pa.int64()),
                "len_sum": pa.array([int(lens.sum())], pa.int64()),
                "langs": pa.array([sorted(langs)], pa.list_(pa.string())),
                "sources": pa.array([sorted(srcs)], pa.list_(pa.string())),
            }
        )

    p = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    langs = set().union(*p["langs"]) if len(p) else set()
    srcs = set().union(*p["sources"]) if len(p) else set()
    return pd.DataFrame(
        {
            "n_rows": [int(p["n_rows"].sum())],
            "null_text": [int(p["null_text"].sum())],
            "null_lang": [int(p["null_lang"].sum())],
            "null_source": [int(p["null_source"].sum())],
            "n_langs": [len(langs)],
            "n_sources": [len(srcs)],
            "len_min": [int(p["len_min"].min())],
            "len_max": [int(p["len_max"].max())],
            "len_sum": [int(p["len_sum"].sum())],
        }
    ).astype("int64")


def q_docs_hapax(sf_dir):
    """Hapax-legomena share per language: distinct vocabulary, tokens
    seen exactly once, and total tokens — the Zipf-tail health signal
    complementing docs_lang_entropy. Same (lang, token)-bucketed exact
    counts; the second reduce folds (vocab, hapax, total) per bucket to
    #langs·B driver rows."""
    from hashlib import blake2b

    from everythinggraph_ray.stages.agg import bucketed_reduce

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )
    import re as _re

    from everythinggraph_ray.datapipe.text import WORD_RE

    def partial(batch: pa.Table) -> pa.Table:
        rx = _re.compile(WORD_RE)
        cnt: dict[tuple[str, str], int] = {}
        for lg, t in zip(
            batch["lang"].to_pylist(), pc.utf8_lower(batch["text"]).to_pylist()
        ):
            for w in rx.findall(t):
                cnt[(lg, w)] = cnt.get((lg, w), 0) + 1
        ks = list(cnt.keys())
        return pa.table(
            {
                "lang": pa.array([a for a, _ in ks], pa.string()),
                "token": pa.array([b for _, b in ks], pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return string_buckets(batch["lang"], batch["token"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["lang", "token"], as_index=False)["c"].sum()
        n = df["c"].to_numpy(np.int64)
        out = pd.DataFrame(
            {"lang": df["lang"], "vocab": 1, "hapax": (n == 1).astype(np.int64), "total": n}
        ).groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"), bucket_of, red
    ).to_pandas()
    g = parts.groupby("lang", as_index=False).sum()
    return g.astype(
        {"lang": "string", "vocab": "int64", "hapax": "int64", "total": "int64"}
    )


def q_lineitem_ols(sf_dir):
    """Grouped least-squares building blocks: per returnflag, the exact
    integer sums (n, Σx, Σy, Σx², Σxy) for the regression of
    extendedprice (cents) on quantity — slope/intercept/correlation
    reconstruct losslessly from the surface, so the 'grouped ML
    aggregate' family rides the hash gate. One streaming pass of
    per-batch partials; the 3-group table reduces on the driver."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        f = batch["l_returnflag"].to_pylist()
        x = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame({"f": f, "n": 1, "sx": x, "sy": y, "sxx": x * x, "sxy": x * y})
        g = df.groupby("f", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("f", as_index=False).sum().rename(columns={"f": "l_returnflag"})
    return g.astype(
        {"l_returnflag": "string", "n": "int64", "sx": "int64",
         "sy": "int64", "sxx": "int64", "sxy": "int64"}
    )


def q22_lost_customers(sf_dir):
    """TPC-H Q22-lite (no c_phone in this schema, so the cohort is all
    customers): customers whose balance exceeds the positive-balance
    average and who placed no LARGE order (o_totalprice > 300000 — the
    cust_no_bigorder constant), rolled up per nation. The average gate
    is the integer cross-multiply bal_u * cnt > sum_u (exact, no float
    threshold); the no-big-orders gate is the bucketed ANTI join
    (datapipe/joins.py). Two streaming passes over customer (scalar
    pass + gate pass); orders is pruned to 2 columns at the read and
    filtered before the join shuffle."""
    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.stages.agg import sum_by_key

    def cohort(sf):
        cust = ray.data.read_parquet(
            os.path.join(sf, "customer.parquet"),
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )

        def prep(batch: pa.Table) -> pa.Table:
            bal = np.round(
                batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            return pa.table(
                {
                    "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
                    "c_nationkey": pc.cast(batch["c_nationkey"], pa.int64()),
                    "bal_u": pa.array(bal, pa.int64()),
                }
            )

        return cust.map_batches(prep, batch_format="pyarrow")

    def scalar_partial(batch: pa.Table) -> pa.Table:
        b = batch["bal_u"].to_numpy(zero_copy_only=False)
        pos = b[b > 0]
        return pa.table(
            {"su": pa.array([int(pos.sum())], pa.int64()),
             "cnt": pa.array([len(pos)], pa.int64())}
        )

    sp = cohort(sf_dir).map_batches(scalar_partial, batch_format="pyarrow").to_pandas()
    su, cnt = int(sp["su"].sum()), int(sp["cnt"].sum())

    def gate(batch: pa.Table) -> pa.Table:
        b = batch["bal_u"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(b * cnt > su))

    rich = cohort(sf_dir).map_batches(gate, batch_format="pyarrow")
    ords = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def big_only(batch: pa.Table) -> pa.Table:
        keep = batch["o_totalprice"].to_numpy(zero_copy_only=False) > 300000.0
        return batch.filter(pa.array(keep)).select(["o_custkey"])

    big = ords.map_batches(big_only, batch_format="pyarrow")
    lost = hash_join(rich, big, on="c_custkey", right_on="o_custkey", how="anti")

    def roll(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        b = batch["bal_u"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(nk, return_inverse=True)
        return pa.table(
            {
                "c_nationkey": pa.array(u, pa.int64()),
                "n_cust": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "total_bal_u": pa.array(
                    np.bincount(inv, weights=b).astype(np.int64), pa.int64()
                ),
            }
        )

    partials = lost.map_batches(roll, batch_format="pyarrow")
    out = sum_by_key(partials, "c_nationkey", ["n_cust", "total_bal_u"]).to_pandas()
    if not len(out):  # schema-stable empty result
        out = pd.DataFrame({"c_nationkey": [], "n_cust": [], "total_bal_u": []})
    return out.astype("int64")


def q_events_lag_stats(sf_dir):
    """Per-event lag-difference and running total within each user's
    time-ordered stream — the lag()/ROWS-UNBOUNDED-PRECEDING window
    family. One bucketed co-group by user hash; inside a bucket the
    whole window computation is vectorized pandas (sort + groupby
    shift/cumsum), never a per-row loop. Values ride as round(v*1e6)
    ints so the surface is hash-exact (the events_hourly device)."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "value"],
    )

    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def win(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["user_id", "ts", "event_id"])
        vu = np.round(df["value"].to_numpy() * 1e6).astype(np.int64)
        df["vu"] = vu
        lag = df.groupby("user_id")["vu"].shift()
        delta = (df["vu"] - lag).fillna(0).astype(np.int64)
        runsum = df.groupby("user_id")["vu"].cumsum().astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(np.int64), pa.int64()),
                "user_id": pa.array(df["user_id"].to_numpy(np.int64), pa.int64()),
                "delta_u": pa.array(delta.to_numpy(np.int64), pa.int64()),
                "runsum_u": pa.array(runsum.to_numpy(np.int64), pa.int64()),
            }
        )

    return bucketed_reduce(ev, bucket_of, win)


def q_events_mad(sf_dir):
    """Median absolute deviation per event type — the robust-scale
    companion of events_winsorize: med = exact p50 (distributed value
    histogram), mad = exact p50 of |v − med| in a second pass with the
    tiny per-type median broadcast as a dict. quantile_disc semantics
    on both levels, all-integer surface."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    from everythinggraph_ray.stages.agg import grouped_quantiles

    def to_u(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "vu": pa.array(
                    np.round(
                        batch["value"].to_numpy(zero_copy_only=False) * 1e6
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    uds = ev.map_batches(to_u, batch_format="pyarrow")
    med = grouped_quantiles(uds, "vu", [0.5], group_col="event_type").to_pandas()
    md = {t: int(v) for t, v in zip(med["event_type"], med["p50"])}

    def dev(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        vu = batch["vu"].to_numpy(zero_copy_only=False)
        m = np.array([md[t] for t in et], np.int64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "av": pa.array(np.abs(vu - m), pa.int64()),
            }
        )

    mad = grouped_quantiles(
        uds.map_batches(dev, batch_format="pyarrow"), "av", [0.5],
        group_col="event_type",
    ).to_pandas()
    out = med.merge(mad, on="event_type").rename(
        columns={"p50_x": "med_u", "p50_y": "mad_u"}
    )
    return out.astype({"event_type": "string", "med_u": "int64", "mad_u": "int64"})


def q_events_streaks(sf_dir):
    """Gaps-and-islands: each user's longest streak of CONSECUTIVE days
    with ≥1 event (the retention/engagement streak metric). One
    user-bucketed co-group; inside a bucket the classic day −
    dense-rank islands trick runs vectorized (np.unique + split on
    gaps), never a per-row loop. SQL oracle = the textbook
    row_number() difference grouping."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def streaks(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        day = (
            pc.cast(pa.Array.from_pandas(df["ts"]), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        df = pd.DataFrame({"u": df["user_id"].to_numpy(np.int64), "d": day})
        df = df.drop_duplicates(["u", "d"]).sort_values(["u", "d"])
        u = df["u"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        # island id: increments where the user changes or the day jumps
        brk = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)]
        isl = np.cumsum(brk) - 1
        lens = np.bincount(isl)
        isl_user = u[np.r_[np.flatnonzero(brk)]]
        out = pd.DataFrame({"user_id": isl_user, "s": lens}).groupby(
            "user_id", as_index=False
        )["s"].max()
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(np.int64), pa.int64()),
                "max_streak": pa.array(out["s"].to_numpy(np.int64), pa.int64()),
            }
        )

    return bucketed_reduce(ev, bucket_of, streaks)


def q_events_winsorize(sf_dir):
    """Per-type winsorization audit — clip values to the exact
    [p5, p99] band (quantile_disc semantics via the distributed value
    histogram, stages/agg.py grouped_quantiles) and report per type the
    exact integer (n, clipped_lo, clipped_hi, sum_raw_u, sum_wins_u).
    Two streaming passes: the quantile pass moves distinct (type,
    value) pairs; the tiny per-type band broadcasts into the clip pass
    as a plain dict."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    from everythinggraph_ray.stages.agg import grouped_quantiles

    def to_u(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "vu": pa.array(
                    np.round(
                        batch["value"].to_numpy(zero_copy_only=False) * 1e6
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    uds = ev.map_batches(to_u, batch_format="pyarrow")
    qd = grouped_quantiles(uds, "vu", [0.05, 0.99], group_col="event_type").to_pandas()
    band = {t: (int(lo), int(hi)) for t, lo, hi in zip(qd["event_type"], qd["p5"], qd["p99"])}

    def clip_partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        vu = batch["vu"].to_numpy(zero_copy_only=False)
        lo = np.array([band[t][0] for t in et], np.int64)
        hi = np.array([band[t][1] for t in et], np.int64)
        w = np.clip(vu, lo, hi)
        df = pd.DataFrame(
            {
                "event_type": et,
                "n": 1,
                "clipped_lo": (vu < lo).astype(np.int64),
                "clipped_hi": (vu > hi).astype(np.int64),
                "sum_raw_u": vu,
                "sum_wins_u": w,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False).sum(), preserve_index=False
        )

    parts = uds.map_batches(clip_partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("event_type", as_index=False).sum()
    return g.astype(
        {"event_type": "string", "n": "int64", "clipped_lo": "int64",
         "clipped_hi": "int64", "sum_raw_u": "int64", "sum_wins_u": "int64"}
    )


def q_events_xcorr(sf_dir):
    """Integer-exact Pearson building blocks for the cross-correlation
    of the 'click' and 'purchase' HOURLY count series — the time-series
    co-movement statistic of metric monitoring. The hour axis is the
    union of hours where either series has events (missing → 0). All
    six sums are exact int64, so r = (n·sxy − sx·sy) /
    √(n·sxx−sx²)·√(n·syy−sy²) reconstructs losslessly; the surface is
    the sums, hash-exact. One streaming pass: per-batch (hour, g)
    partial counts → hour-bucketed exact sums → the bounded hour table
    reduces to 6 driver ints."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    from everythinggraph_ray.stages.agg import mix64, sum_by_key_pair

    G1, G2 = "click", "purchase"

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000
        g = np.array([1 if t == G1 else (2 if t == G2 else 0) for t in et], np.int8)
        keep = g > 0
        h, g = hour[keep], g[keep]
        key = h * 2 + (g - 1)
        u, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {"hour": pa.array((u // 2).astype(np.int64), pa.int64()),
             "g": pa.array((u % 2).astype(np.int64), pa.int64()),
             "n": pa.array(cnt, pa.int64())}
        )

    agg = sum_by_key_pair(
        ev.map_batches(partial, batch_format="pyarrow"), "hour", "g", ["n"]
    )

    def fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        piv = df.pivot_table(index="hour", columns="g", values="n", fill_value=0)
        x = piv[0].to_numpy(np.int64) if 0 in piv.columns else np.zeros(len(piv), np.int64)
        y = piv[1].to_numpy(np.int64) if 1 in piv.columns else np.zeros(len(piv), np.int64)
        return pa.table(
            {
                "n_hours": pa.array([len(piv)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    # hour-bucketed: each hour's (g=0, g=1) pair lands in ONE fold batch
    from everythinggraph_ray.stages.agg import bucketed_reduce

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["hour"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    parts = bucketed_reduce(agg, bucket_of, fold).to_pandas()
    cols = ["n_hours", "sx", "sy", "sxx", "syy", "sxy"]
    if not len(parts):
        return pd.DataFrame({c: [0] for c in cols}).astype("int64")
    return pd.DataFrame({c: [int(parts[c].sum())] for c in cols}).astype("int64")


def q_events_ks(sf_dir):
    """Exact two-sample Kolmogorov–Smirnov statistic between the value
    distributions of 'click' and 'purchase' events — the distribution-
    drift detector of data-quality monitoring. All-integer: KS =
    max|s1·n2 − s2·n1| / (n1·n2) over the pooled distinct values, so
    the surface is the (numerator, denominator) pair, hash-exact.

    Distributed shape — the events_records prefix-scan transplanted to
    the VALUE axis: pass 1 ranges values into B buckets by value and
    folds per-bucket (distinct-value, c1, c2) partials; the driver
    prefix-sums only the 2·B bucket totals; pass 2 re-groups each value
    range, cumsums within it seeded by the bucket prefix, and emits one
    max-deviation row per bucket. Driver state is O(B), never
    O(distinct values)."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    from everythinggraph_ray.stages.agg import bucketed_reduce

    G1, G2 = "click", "purchase"

    def vu_of(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        et = batch["event_type"].to_pylist()
        vu = np.round(batch["value"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        g = np.array([1 if t == G1 else (2 if t == G2 else 0) for t in et], np.int8)
        keep = g > 0
        return vu[keep], g[keep]

    # pass 0+1 fused: min/max AND totals ride one partial pass
    def scan_partial(batch: pa.Table) -> pa.Table:
        vu, g = vu_of(batch)
        if not len(vu):
            return pa.table(
                {"mn": pa.array([], pa.int64()), "mx": pa.array([], pa.int64()),
                 "n1": pa.array([], pa.int64()), "n2": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "mn": pa.array([int(vu.min())], pa.int64()),
                "mx": pa.array([int(vu.max())], pa.int64()),
                "n1": pa.array([int((g == 1).sum())], pa.int64()),
                "n2": pa.array([int((g == 2).sum())], pa.int64()),
            }
        )

    sp = ev.map_batches(scan_partial, batch_format="pyarrow").to_pandas()
    if not len(sp):
        return pd.DataFrame({"ks_num": [], "ks_den": []}).astype("int64")
    mn, mx = int(sp["mn"].min()), int(sp["mx"].max())
    n1, n2 = int(sp["n1"].sum()), int(sp["n2"].sum())
    B = 64
    span = mx - mn + 1

    def bucket_arr(vu: np.ndarray) -> np.ndarray:
        return (vu - mn) * B // span

    # per-bucket group totals (for the prefix seeds): tiny second scan of
    # the same partial shape, 2·B rows to the driver
    def tot_partial(batch: pa.Table) -> pa.Table:
        vu, g = vu_of(batch)
        b = bucket_arr(vu)
        key = b * 2 + (g - 1)
        u, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {"b": pa.array((u // 2).astype(np.int64), pa.int64()),
             "g": pa.array((u % 2).astype(np.int64), pa.int64()),
             "n": pa.array(cnt, pa.int64())}
        )

    tp = ev.map_batches(tot_partial, batch_format="pyarrow").to_pandas()
    tp = tp.groupby(["b", "g"])["n"].sum()
    seed1 = np.zeros(B, np.int64)
    seed2 = np.zeros(B, np.int64)
    for (b, g), n in tp.items():
        (seed1 if g == 0 else seed2)[int(b)] = n
    pre1 = np.r_[0, np.cumsum(seed1)[:-1]]  # counts strictly before bucket b
    pre2 = np.r_[0, np.cumsum(seed2)[:-1]]
    pref_ref = ray.put((pre1, pre2, n1, n2))

    def row_bucket(batch: pa.Table) -> np.ndarray:
        vu = np.round(batch["value"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        et = batch["event_type"].to_pylist()
        g = np.array([1 if t == G1 else (2 if t == G2 else 0) for t in et], np.int8)
        b = bucket_arr(vu)
        # other event types ride along (-1 % B folds them into bucket
        # B-1) and are dropped by vu_of inside the reducer — real buckets
        # never collide since bucket_arr is already in [0, B)
        b[g == 0] = -1
        return b

    def dev_max(g: pa.Table) -> pa.Table:
        p1, p2, N1, N2 = ray.get(pref_ref)
        vu, gg = vu_of(g)
        if not len(vu):
            return pa.table({"dev": pa.array([], pa.int64())})
        b = int(bucket_arr(vu[:1])[0])
        order = np.argsort(vu, kind="stable")
        vu, gg = vu[order], gg[order]
        st = np.flatnonzero(np.r_[True, vu[1:] != vu[:-1]])
        c1 = np.bincount(
            np.searchsorted(vu[st], vu[gg == 1]), minlength=len(st)
        ).astype(np.int64)
        c2 = np.bincount(
            np.searchsorted(vu[st], vu[gg == 2]), minlength=len(st)
        ).astype(np.int64)
        s1 = p1[b] + np.cumsum(c1)
        s2 = p2[b] + np.cumsum(c2)
        dev = np.abs(s1 * N2 - s2 * N1)
        return pa.table({"dev": pa.array([int(dev.max())], pa.int64())})

    devs = bucketed_reduce(ev, row_bucket, dev_max, num_buckets=B).to_pandas()
    ks_num = int(devs["dev"].max()) if len(devs) else 0
    return pd.DataFrame({"ks_num": [ks_num], "ks_den": [n1 * n2]}).astype("int64")


def q_events_records(sf_dir):
    """Running-record detection over the GLOBAL arrival order: events
    whose value strictly exceeds every earlier event's value (event_id
    order) — the sequential-looking scan made distributed with a
    two-phase prefix-max (the pack_sequences prefix-scan shape,
    datapipe/pack.py): phase 1 computes per-range partial maxima
    (B driver ints), the driver prefix-folds them, phase 2 re-scans each
    contiguous event_id range with its prefix seed and a vectorized
    np.maximum.accumulate. ~ln N records expected on exchangeable
    values; ties lose (strict >), matching the SQL window oracle."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "value"],
    )
    n = ev.count()  # metadata-served; event_id is dense 0..N-1
    B = 64

    from everythinggraph_ray.stages.agg import bucketed_reduce

    def rng_of(batch: pa.Table) -> np.ndarray:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(eid) and eid.max() >= n:
            raise ValueError("event_id not dense in [0, N)")
        return eid * B // n

    def part_max(batch: pa.Table) -> pa.Table:
        b = rng_of(batch)
        vu = np.round(batch["value"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        u, inv = np.unique(b, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, vu)
        return pa.table({"b": pa.array(u, pa.int64()), "mx": pa.array(mx, pa.int64())})

    parts = ev.map_batches(part_max, batch_format="pyarrow").to_pandas()
    gmax = parts.groupby("b")["mx"].max()
    seed = np.full(B, np.iinfo(np.int64).min, np.int64)
    for b, m in gmax.items():
        seed[int(b)] = m
    prefix = np.empty(B, np.int64)  # max over all buckets STRICTLY before b
    run = np.iinfo(np.int64).min
    for i in range(B):
        prefix[i] = run
        run = max(run, seed[i])
    pref_ref = ray.put(prefix)

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return rng_of(batch)

    def records(g: pa.Table) -> pa.Table:
        pref = ray.get(pref_ref)
        df = g.to_pandas().sort_values("event_id")
        vu = np.round(df["value"].to_numpy() * 1e6).astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        before = np.empty(len(vu), np.int64)
        before[0] = pref[int(eid[0] * B // n)]
        if len(vu) > 1:
            before[1:] = np.maximum(
                np.maximum.accumulate(vu[:-1]), before[0]
            )
        keep = vu > before
        return pa.table(
            {
                "event_id": pa.array(eid[keep], pa.int64()),
                "user_id": pa.array(df["user_id"].to_numpy(np.int64)[keep], pa.int64()),
                "value_u": pa.array(vu[keep], pa.int64()),
            }
        )

    return bucketed_reduce(ev, bucket_of, records, num_buckets=B)


def q_events_props_sum(sf_dir):
    """Semi-structured extraction: pull the integer ``k`` field out of
    the JSON ``props`` string with ONE RE2 kernel
    (pyarrow.compute.extract_regex — zero-copy Arrow, no json.loads row
    loop), then per-event-type sum/count. The regex is shared verbatim
    with the DuckDB oracle (the repo's RE2-parity convention)."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
    )

    from hashlib import blake2b

    from everythinggraph_ray.stages.agg import bucketed_reduce

    def partial(batch: pa.Table) -> pa.Table:
        k = pc.struct_field(
            pc.extract_regex(batch["props"], pattern=r'"k": (?P<k>\d+)'), "k"
        )
        kv = pc.cast(k, pa.int64())
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "k": kv.to_pandas().fillna(0).astype(np.int64),
                "hit": pc.is_valid(kv).to_pandas().astype(np.int64),
            }
        )
        g = df.groupby("event_type", as_index=False).agg(
            k_sum=("k", "sum"), n_hits=("hit", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return string_buckets(batch["event_type"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(
            df.astype({"k_sum": np.int64, "n_hits": np.int64}), preserve_index=False
        )

    return bucketed_reduce(ev.map_batches(partial, batch_format="pyarrow"), bucket_of, red)


def q_events_outliers(sf_dir):
    """Robust (median/MAD) outlier detection per event type: flag events
    with |v − median| > 3·MAD, all in exact integer cents
    (floor(value·100+0.5)). Three streaming passes — median histogram,
    deviation-median histogram (MAD), outlier count — each a bucketed
    reduce; the per-type medians (≤ #types rows) broadcast via ray.put.
    quantile semantics = SQL quantile_disc (stages/agg.py
    grouped_quantiles, parity proven by docs_len_quantiles)."""
    import ray as _ray

    from everythinggraph_ray.stages.agg import bucketed_reduce, grouped_quantiles

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "vc": pa.array(np.floor(v * 100 + 0.5).astype(np.int64), pa.int64()),
            }
        )

    vc = ev.map_batches(cents, batch_format="pyarrow")
    med = grouped_quantiles(vc, "vc", [0.5], group_col="event_type").to_pandas()
    med_ref = _ray.put(dict(zip(med["event_type"], med["p50"].astype(np.int64))))

    def dev(batch: pa.Table) -> pa.Table:
        m = _ray.get(med_ref)
        t = batch["event_type"].to_pylist()
        v = batch["vc"].to_numpy(zero_copy_only=False)
        mv = np.fromiter((m[x] for x in t), dtype=np.int64, count=len(t))
        return pa.table(
            {"event_type": batch["event_type"], "d": pa.array(np.abs(v - mv), pa.int64())}
        )

    mad = grouped_quantiles(
        vc.map_batches(dev, batch_format="pyarrow"), "d", [0.5], group_col="event_type"
    ).to_pandas()
    mad_ref = _ray.put(dict(zip(mad["event_type"], mad["p50"].astype(np.int64))))

    from hashlib import blake2b

    def partial(batch: pa.Table) -> pa.Table:
        m = _ray.get(med_ref)
        s = _ray.get(mad_ref)
        t = batch["event_type"].to_pylist()
        v = batch["vc"].to_numpy(zero_copy_only=False)
        mv = np.fromiter((m[x] for x in t), dtype=np.int64, count=len(t))
        sv = np.fromiter((s[x] for x in t), dtype=np.int64, count=len(t))
        out = np.abs(v - mv) > 3 * sv
        df = pd.DataFrame({"event_type": t, "o": out.astype(np.int64)})
        g = df.groupby("event_type", as_index=False).agg(
            n_outliers=("o", "sum"), n_events=("o", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return string_buckets(batch["event_type"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("event_type", as_index=False).sum()
        m = _ray.get(med_ref)
        s = _ray.get(mad_ref)
        df["med_c"] = df["event_type"].map(m).astype(np.int64)
        df["mad_c"] = df["event_type"].map(s).astype(np.int64)
        return pa.Table.from_pandas(
            df[["event_type", "med_c", "mad_c", "n_outliers", "n_events"]].astype(
                {"n_outliers": np.int64, "n_events": np.int64}
            ),
            preserve_index=False,
        )

    return bucketed_reduce(vc.map_batches(partial, batch_format="pyarrow"), bucket_of, red)


def q_events_retention(sf_dir):
    """Cohort retention matrix: users cohorted by their FIRST-seen day;
    cell (cohort_day, day_offset) counts cohort users active again
    day_offset days later (offset 0 = the cohort day itself). The
    product-analytics staple.

    Shape: users co-locate by hash bucket; each bucket reduces its users
    to distinct (cohort_day, offset, partial count) rows (first-seen =
    per-user min, offsets = per-user distinct active days minus it);
    partials sum in one bucketed reduce keyed by the packed
    (cohort_day, offset) pair. Only the matrix leaves the buckets."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, sum_by_key

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def cohort_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df["day"] = df["ts"].values.astype("datetime64[D]").astype(np.int64)
        ud = df[["user_id", "day"]].drop_duplicates()
        first = ud.groupby("user_id", as_index=False)["day"].min().rename(
            columns={"day": "cohort"}
        )
        m = ud.merge(first, on="user_id")
        m["offset"] = m["day"] - m["cohort"]
        out = m.groupby(["cohort", "offset"], as_index=False).size()
        # pack the pair into one int64 key for the cross-bucket sum
        key = out["cohort"].to_numpy(np.int64) * np.int64(1 << 20) + out["offset"].to_numpy(
            np.int64
        )
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "n_users": pa.array(out["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    summed = sum_by_key(bucketed_reduce(ev, bucket_of, cohort_bucket), "key", ["n_users"])

    def unpack(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_day": pa.array(key >> np.int64(20), pa.int64()),
                "day_offset": pa.array(key % np.int64(1 << 20), pa.int64()),
                "n_users": batch["n_users"],
            }
        )

    return summed.map_batches(unpack, batch_format="pyarrow")


FUNNEL_STAGES = ("view", "click", "purchase")


def q_events_funnel(sf_dir):
    """Ordered funnel analysis: per user, stage k is reached when its
    event occurs AT OR AFTER the user's earliest completion of stage k-1
    (min-ts chaining with >= comparisons — ties count). Output: one row
    of per-stage user counts (n_view, n_click, n_purchase) plus n_users.

    Shape: users co-locate by hash bucket; each bucket resolves every
    user's stage chain with three vectorized filter+groupby-min passes
    and emits ONE partial-count row; a trivial final sum. Shuffle weight
    is the event rows once, nothing user-keyed leaves the bucket."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_type"]
    )

    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def funnel_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        t_prev = None
        counts = [int(df["user_id"].nunique())]
        for stage in FUNNEL_STAGES:
            sub = df[df["event_type"] == stage]
            if t_prev is not None:
                sub = sub.merge(t_prev, on="user_id")
                sub = sub[sub["ts"] >= sub["t_prev"]]
            cur = sub.groupby("user_id", as_index=False)["ts"].min()
            counts.append(len(cur))
            t_prev = cur.rename(columns={"ts": "t_prev"})
        return pa.table(
            {
                "n_users": pa.array([counts[0]], pa.int64()),
                "n_view": pa.array([counts[1]], pa.int64()),
                "n_click": pa.array([counts[2]], pa.int64()),
                "n_purchase": pa.array([counts[3]], pa.int64()),
            }
        )

    partials = bucketed_reduce(ev, bucket_of, funnel_bucket)
    # <= num_buckets one-row partials: the driver-side sum is O(buckets)
    out = partials.to_pandas().sum().to_frame().T.astype(np.int64)
    return out.reset_index(drop=True)


def q_events_sliding(sf_dir):
    """2-hour sliding windows, 1-hour hop, per user: each event at hour h
    belongs to the windows starting at h-1 and h — emitted twice in the
    partial combiner, then one bucketed exact sum (same shape as
    events_hourly; the window fan-out happens batch-side, never a
    shuffle-side self-join)."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    )

    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64_pair

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000
        val_u = np.round(batch["value"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        df = pd.DataFrame(
            {
                "user_id": np.tile(uid, 2),
                "win_start": np.concatenate([hour - 1, hour]),
                "v": np.tile(val_u, 2),
            }
        )
        g = df.groupby(["user_id", "win_start"], as_index=False).agg(
            n_events=("v", "size"), value_sum_u=("v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_of(batch: pa.Table) -> np.ndarray:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        h = batch["win_start"].to_numpy(zero_copy_only=False)
        return mix64_pair(u, h)

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["user_id", "win_start"], as_index=False).agg(
            n_events=("n_events", "sum"), value_sum_u=("value_sum_u", "sum")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=256 * 1024), bucket_of, red
    )


def q_events_asof_prev(sf_dir):
    """As-of join (datapipe/joins.py — the temporal join Ray Data lacks):
    every event enriched with the latest STRICTLY-earlier event value of
    the same user. Self-join form so the SQL oracle is a window lag
    (events have unique (user_id, ts), making lag ≡ strict as-of);
    two-table behavior is pytest-checked against pandas merge_asof."""
    from everythinggraph_ray.datapipe.joins import asof_join

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts", "user_id", "value"]
    )
    left = ev.select_columns(["event_id", "ts", "user_id"])

    def rv(batch: pa.Table) -> pa.Table:
        v = np.round(batch["value"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "prev_value_u": pa.array(v, pa.int64()),
            }
        )

    out = asof_join(
        left,
        ev.map_batches(rv, batch_format="pyarrow"),
        by="user_id",
        on="ts",
        value_cols=["prev_value_u"],
        strict=True,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "prev_value_u": pc.fill_null(t["prev_value_u"], -1),
            }
        ),
        batch_format="pyarrow",
    )


def q_rel_degree_hist(sf_dir):
    """Out-degree histogram (the reference prints degree stats during
    load): degree table → groupby(outdeg) count. Distinct degrees are few,
    so the plain Dataset groupby is the right tool here."""
    from ray.data.aggregate import Count

    return (
        out_degrees(rel_edges(sf_dir))
        .groupby("outdeg")
        .aggregate(Count(alias_name="n_vertices"))
    )


def q_docs_token_count_bpe(sf_dir):
    """BPE-ish token counting: letter runs / digit runs / single
    non-alnum-non-space marks (the standard pre-tokenizer split, RE2-safe
    so DuckDB's regexp_extract_all counts identically)."""
    BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(batch["text"], BPE_RE), pa.int64()
                ),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def q_docs_cdc_chunks(sf_dir):
    """Content-defined chunking (rolling Rabin hash, datapipe/chunk.py):
    per-doc chunk table (idx, start, len, md5) — the sub-document dedup
    primitive. No SQL oracle (the splitting is not SQL-expressible);
    edit-locality + determinism + bounds are pytest-asserted."""
    from everythinggraph_ray.datapipe.chunk import cdc_chunks

    return cdc_chunks(_docs(sf_dir, columns=["doc_id", "text"]))


def q_docs_pack_sequences(sf_dir):
    """Sequence packing into 2000-token bins — the distributed prefix
    scan (datapipe/pack.py; the reference's sequence::scan made
    cluster-scale). SQL oracle = window cumsum ordered by doc_id."""
    from everythinggraph_ray.datapipe.pack import pack_sequences

    return pack_sequences(_docs(sf_dir, columns=["doc_id", "text"]), bin_tokens=2000)


def _augment_pii(batch: pa.Table) -> pa.Table:
    """Deterministic PII augmentation: every 13th doc gets a synthetic
    email + phone derived from its doc_id (the corpus has none natively —
    same derived-fixture pattern as the planted embedding near-dups).
    Reproduced verbatim by the SQL oracle's CASE/concat."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    out = [
        (
            t + f" contact user{i}@example.com call 555-{i % 900 + 100}-{i % 9000 + 1000}"
            if i % 13 == 0
            else t
        )
        for i, t in zip(ids, batch["text"].to_pylist())
    ]
    return pa.table({"doc_id": batch["doc_id"], "text": pa.array(out, pa.string())})


def q_docs_pii_redact(sf_dir):
    """PII redaction (emails then phones, RE2 both sides) over the
    PII-augmented corpus; result carries match counts + md5 of the
    redacted text so the oracle hash-compares exactly."""
    from everythinggraph_ray.datapipe.curate import pii_redact

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return pii_redact(docs.map_batches(_augment_pii, batch_format="pyarrow"))


SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.125}
SAMPLE_DEFAULT_RATE = 0.0625


def q_docs_sample_stratified(sf_dir):
    """Deterministic stratified sampling: per-language md5-threshold
    rates (en 1/2, de 1/4, fr 1/8, others 1/16) — no RNG, so the DuckDB
    oracle keeps the identical rows."""
    from everythinggraph_ray.datapipe.curate import stratified_sample

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    return stratified_sample(docs, SAMPLE_RATES, default_rate=SAMPLE_DEFAULT_RATE)


def q_docs_repetition(sf_dir):
    """Gopher-style within-doc repetition stats (all-integer signals)."""
    from everythinggraph_ray.datapipe.curate import repetition_stats

    return repetition_stats(_docs(sf_dir, columns=["doc_id", "text"]))


def q_docs_decontaminate(sf_dir):
    """Benchmark decontamination: benchmark = every 7th doc; reports each
    remaining doc's count of distinct word-5-grams shared with the
    benchmark (distributed gram co-group, datapipe/curate.py)."""
    from everythinggraph_ray.datapipe.curate import decontaminate

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def bench_part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 7 == 0, pa.bool_()))

    def corpus_part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 7 != 0, pa.bool_()))

    bench = docs.map_batches(bench_part, batch_format="pyarrow")
    corpus = docs.map_batches(corpus_part, batch_format="pyarrow")
    return decontaminate(corpus, bench, ngram=5)


DUP_SPAN_N = 8


def q_emb_pca_top(sf_dir):
    """Top principal component of the embedding corpus via distributed
    power iteration (datapipe/cluster.py emb_power_iteration — every
    step one streaming pass to d driver floats; no RNG). Rows-only
    driver check (iterative linear algebra has no SQL form); numpy
    eigendecomposition equality in tests."""
    from everythinggraph_ray.datapipe.cluster import emb_power_iteration

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    res = emb_power_iteration(emb)
    comp = np.asarray(res["component"])
    # sign convention so the result is orientation-stable: first
    # largest-magnitude coordinate positive
    if comp[np.argmax(np.abs(comp))] < 0:
        comp = -comp
    return pd.DataFrame(
        {
            "dim": np.arange(len(comp), dtype=np.int64),
            "component": np.round(comp, 9),
            "eigenvalue": np.round(res["eigenvalue"], 9),
            "explained_ratio": np.round(res["explained_ratio"], 9),
        }
    )


PMI_WINDOW = 3
PMI_TOPK = 20


def q_emb_logreg(sf_dir):
    """One-vs-rest logistic regression (label==0) by deterministic
    full-batch GD over the embedding corpus (datapipe/cluster.py
    emb_logreg — each step ONE streaming pass to d+2 driver floats).
    Rows-only driver check; convergence/accuracy/serial-equality
    pytests."""
    from everythinggraph_ray.datapipe.cluster import emb_logreg

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding", "label"]
    )
    res = emb_logreg(emb)
    w = np.asarray(res["weights"])
    return pd.DataFrame(
        {
            "dim": np.arange(len(w), dtype=np.int64),
            "weight": np.round(w, 9),
            "bias": np.round(res["bias"], 9),
            "loss": np.round(res["loss"], 9),
            "accuracy": np.round(res["accuracy"], 9),
        }
    )


def q_docs_pmi_pairs(sf_dir):
    """Word co-occurrence with integer PMI-lift: count unordered token
    pairs within a 3-position window (the word2vec/SGNS statistic), rank
    the top 20 by count, and attach the exact integer lift
    lift_u = n·N_tok²·10⁶ // (N_pairs·c_a·c_b) (arbitrary-precision int
    on the Python side, HUGEINT in the oracle — no float, no log).

    Shape: per-doc window pairs emit pre-combined per batch → one
    bucketed sum by pair; N_pairs rides as a one-scalar pass over the
    pair table; per-bucket top-k keeps the global sort tiny; the two
    token counts needed per surviving pair are filtered (40 tokens),
    never the vocabulary."""
    import re
    from hashlib import blake2b

    from everythinggraph_ray.stages.agg import bucketed_reduce

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    rx = re.compile(r"[a-z0-9]+")
    W = PMI_WINDOW

    def emit(batch: pa.Table) -> pa.Table:
        cnt: dict[tuple[str, str], int] = {}
        for t in pc.utf8_lower(batch["text"]).to_pylist():
            ws = rx.findall(t or "")
            for off in range(1, W + 1):
                for x, y in zip(ws, ws[off:]):
                    if x == y:
                        continue
                    k = (x, y) if x < y else (y, x)
                    cnt[k] = cnt.get(k, 0) + 1
        return pa.table(
            {
                "a": pa.array([k[0] for k in cnt], pa.string()),
                "b": pa.array([k[1] for k in cnt], pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return string_buckets(batch["a"], batch["b"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["a", "b"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = bucketed_reduce(
        docs.map_batches(emit, batch_format="pyarrow"), bucket_of, red
    ).materialize()
    n_pairs = int(pairs.sum("n") or 0)
    top = (
        pairs.sort(["n", "a", "b"], descending=[True, False, False])
        .limit(PMI_TOPK)
        .to_pandas()
    )

    # exact counts for ONLY the tokens appearing in the top pairs
    need = set(top["a"]) | set(top["b"])

    def tok_partial(batch: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        tot = 0
        for t in pc.utf8_lower(batch["text"]).to_pylist():
            for w in rx.findall(t or ""):
                tot += 1
                if w in need:
                    cnt[w] = cnt.get(w, 0) + 1
        cnt["\x00total"] = tot
        return pa.table(
            {
                "token": pa.array(list(cnt.keys()), pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    tc = (
        docs.map_batches(tok_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("token")["c"]
        .sum()
    )
    n_tok = int(tc.pop("\x00total"))
    lift = [
        int(n) * n_tok * n_tok * 1_000_000 // (n_pairs * int(tc[a]) * int(tc[b]))
        for a, b, n in zip(top["a"], top["b"], top["n"])
    ]
    top = top.reset_index(drop=True)
    top["lift_u"] = pd.Series(lift, dtype=np.int64)
    return top[["a", "b", "n", "lift_u"]]


def q_docs_dup_spans(sf_dir):
    """Substring-level (span) dedup stats: per doc, how many 8-token
    windows occur in >=2 distinct documents and how many token positions
    they cover (datapipe/substr.py — two bucketed shuffles, md5-parity
    gram hashes shared verbatim with the SQL oracle)."""
    from everythinggraph_ray.datapipe.substr import duplicate_spans

    return duplicate_spans(_docs(sf_dir, columns=["doc_id", "text"]), n=DUP_SPAN_N)


WINNOW_K, WINNOW_W = 5, 4


def q_docs_winnow(sf_dir):
    """Winnowing fingerprints (MOSS local fingerprinting): the minimum
    md5 k-gram hash of every w-window, rightmost on ties — guarantees any
    shared >= k+w-1-token substring shares a fingerprint
    (datapipe/text.py winnow_fingerprints; one map_batches, no shuffle)."""
    from everythinggraph_ray.datapipe.text import winnow_fingerprints

    return winnow_fingerprints(_docs(sf_dir, columns=["doc_id", "text"]), k=WINNOW_K, w=WINNOW_W)


CMS_WIDTH, CMS_DEPTH, CMS_THRESHOLD = 1024, 4, 900


def q_docs_cms_heavy(sf_dir):
    """Count-min-sketch heavy hitters: tokens whose CMS point-query
    estimate reaches 900 occurrences (datapipe/sketch.py — md5-parity
    affine hashes, grid built by a bucketed slot sum and broadcast once,
    candidates stream through a bucketed distinct)."""
    from everythinggraph_ray.datapipe.sketch import cms_heavy_hitters

    return cms_heavy_hitters(
        _docs(sf_dir, columns=["doc_id", "text"]), CMS_THRESHOLD, width=CMS_WIDTH, depth=CMS_DEPTH
    )


BLOOM_M, BLOOM_K = 1 << 16, 4


def q_docs_bloom_decontaminate(sf_dir):
    """Bloom-filter benchmark decontamination (the at-scale variant of
    docs_decontaminate): benchmark word-5-grams build a 64 Kbit filter
    (bucketed OR of per-batch word partials, broadcast once); corpus
    docs count their distinct grams the filter flags. Upper bound on the
    exact counts (no false negatives); md5-affine positions shared
    verbatim with the oracle, so even the false positives hash-match."""
    import re

    from everythinggraph_ray.datapipe.sketch import bloom_build, bloom_probe_counts
    from everythinggraph_ray.datapipe.text import WORD_RE

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    rx = re.compile(WORD_RE)

    def grams_of(text: str) -> list[str]:
        ws = rx.findall((text or "").lower())
        return sorted({" ".join(ws[j : j + 5]) for j in range(len(ws) - 4)})

    def bench_part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 7 == 0, pa.bool_()))

    def corpus_part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 7 != 0, pa.bool_()))

    def bench_values(batch: pa.Table) -> list[str]:
        out: list[str] = []
        for t in batch["text"].to_pylist():
            out.extend(grams_of(t))
        return out

    words = bloom_build(
        docs.map_batches(bench_part, batch_format="pyarrow"),
        bench_values,
        m_bits=BLOOM_M,
        k=BLOOM_K,
    )

    def per_doc(batch: pa.Table):
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            yield did, grams_of(t)

    return bloom_probe_counts(
        docs.map_batches(corpus_part, batch_format="pyarrow"),
        words,
        per_doc,
        m_bits=BLOOM_M,
        k=BLOOM_K,
    )


def q_docs_mixture_sample(sf_dir):
    """Composed mixing pipeline: compute per-(lang, source) uniform
    mixing weights (mix_weights — a #groups-row table), then
    deterministically sample each group at weight_u/1e6 via the md5
    threshold rule. All-integer threshold arithmetic
    (weight_u * 16^8 // 1e6) so the SQL window oracle keeps the
    identical rows. Result: the token-balanced corpus a uniform-mixture
    training run would read."""
    from everythinggraph_ray.datapipe.curate import mix_weights

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "text"],
    )
    w = mix_weights(docs)  # #groups rows on the driver by design
    thresholds = {
        (l, s): format(int(wu) * 16**8 // 10**6, "08x")
        for l, s, wu in zip(w["lang"], w["source"], w["weight_u"])
    }

    def samp(batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch["doc_id"].to_pylist()
        keys = zip(batch["lang"].to_pylist(), batch["source"].to_pylist())
        keep = [
            hashlib.md5(str(i).encode("utf-8")).hexdigest() < thresholds[k]
            for i, k in zip(ids, keys)
        ]
        return batch.select(["doc_id", "lang", "source"]).filter(pa.array(keep, pa.bool_()))

    return docs.map_batches(samp, batch_format="pyarrow")


def q_docs_weighted_sample(sf_dir):
    """Weighted sampling without replacement, P(doc) ∝ length
    (Efraimidis-Spirakis keys over deterministic md5 uniforms,
    datapipe/curate.py weighted_sample): per-block top-k candidates in
    one streaming pass, #blocks x k rows to the final merge."""
    from everythinggraph_ray.datapipe.curate import weighted_sample

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return weighted_sample(docs, 100)


def q_docs_gopher_filter(sf_dir):
    """Composed Gopher-style quality gate over the repetition signals:
    keep docs with >= 30 words, top-word share <= 10%, and vocabulary
    >= 40% of length — all integer comparisons (n*10 <= m forms) so the
    SQL oracle is bit-exact. The gate is an inline numpy mask fused onto
    repetition_stats' output (no second pass over text)."""
    from everythinggraph_ray.datapipe.curate import repetition_stats

    stats = repetition_stats(_docs(sf_dir, columns=["doc_id", "text"]))

    def gate(batch: pa.Table) -> pa.Table:
        nw = batch["n_words"].to_numpy(zero_copy_only=False)
        nu = batch["n_unique_words"].to_numpy(zero_copy_only=False)
        tw = batch["top_word_n"].to_numpy(zero_copy_only=False)
        keep = (nw >= 30) & (tw * 10 <= nw) & (nu * 5 >= nw * 2)
        return batch.filter(pa.array(keep, pa.bool_()))

    return stats.map_batches(gate, batch_format="pyarrow")


def q_docs_mix_weights(sf_dir):
    """Per-(lang, source) corpus stats + uniform-mixing weight
    (integer floor division — bit-exact vs the SQL window oracle)."""
    from everythinggraph_ray.datapipe.curate import mix_weights

    return mix_weights(_docs(sf_dir, columns=["doc_id", "text", "lang", "source"]))


def q_events_purchase_window(sf_dir):
    """Range join: every event of the same user inside [p.ts, p.ts+1h]
    of each purchase p (both bounds inclusive — the purchase itself
    counts), aggregated per window. datapipe/joins.py range_join: 1h
    time-tiled interval replication + bucketed co-group, then a bucketed
    sum per window."""
    from everythinggraph_ray.datapipe.joins import range_join
    from everythinggraph_ray.stages.agg import sum_by_key

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    left = ev.select_columns(["user_id", "ts", "value"])

    def purchases(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["event_type"], "purchase"))
        ts = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_id": t["event_id"],
                "w_start": ts,
                "w_end": pc.add(ts, pa.scalar(3_600_000_000, pa.int64())),
            }
        )

    j = range_join(
        left,
        ev.map_batches(purchases, batch_format="pyarrow"),
        by="user_id",
        left_on="ts",
        right_start="w_start",
        right_end="w_end",
        right_cols=["window_id"],
        closed="both",
        bucket_width_us=3_600_000_000,
    )

    def partial(batch: pa.Table) -> pa.Table:
        w = batch["window_id"].to_numpy(zero_copy_only=False)
        v = np.round(batch["value"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        g = pd.DataFrame({"window_id": w, "v": v}).groupby("window_id", as_index=False).agg(
            n_events=("v", "size"), value_sum_u=("v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return sum_by_key(
        j.map_batches(partial, batch_format="pyarrow"),
        "window_id",
        ["n_events", "value_sum_u"],
    )


def q_docs_inverted_index(sf_dir):
    """Inverted index over the corpus (datapipe/text.py
    inverted_index): (token, df, comma-joined sorted postings),
    min_df=2."""
    from everythinggraph_ray.datapipe.text import inverted_index

    return inverted_index(_docs(sf_dir, columns=["doc_id", "text"]), min_df=2)


def q_docs_tfidf(sf_dir):
    """Top-3 tf-idf terms per document (datapipe/text.py
    tfidf_top_terms): token-bucketed df reduce + bucketed token join +
    grouped top-k — no vocabulary broadcast."""
    from everythinggraph_ray.datapipe.text import tfidf_top_terms

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return tfidf_top_terms(docs, docs.count(), k=3)


def q_docs_above_median_len(sf_dir):
    """Composed percentile-gate pipeline: per-language median length via
    the distributed value-histogram quantile, then a broadcast-threshold
    filter + per-lang count — the 'drop the short tail per language'
    curation gate. The per-lang threshold table is #langs rows on the
    driver (the mix_weights contract)."""
    from everythinggraph_ray.stages.agg import grouped_quantiles, sum_by_key

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def with_len(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch["lang"],
                "len": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            }
        )

    lens = docs.map_batches(with_len, batch_format="pyarrow")
    med = grouped_quantiles(lens, "len", [0.5], group_col="lang").to_pandas()
    thr = dict(zip(med["lang"], med["p50"]))  # #langs rows by design

    def count_above(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        ln = batch["len"].to_numpy(zero_copy_only=False)
        t = np.fromiter((thr[x] for x in langs), dtype=np.int64, count=len(langs))
        keep = ln >= t
        if not keep.any():
            return pa.table({"lang": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        import pandas as _pd

        g = _pd.Series(1, index=_pd.Index([l for l, k in zip(langs, keep) if k])).groupby(level=0).sum()
        return pa.table(
            {"lang": pa.array(g.index.astype(str), pa.string()), "c": pa.array(g.to_numpy(np.int64), pa.int64())}
        )

    from everythinggraph_ray.stages.agg import bucketed_reduce

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return string_buckets(batch["lang"])

    def red(g: pa.Table) -> pa.Table:
        d = g.to_pandas().groupby("lang", as_index=False)["c"].sum()
        return pa.table(
            {
                "lang": pa.array(d["lang"], pa.string()),
                "n_above": pa.array(d["c"].to_numpy(np.int64), pa.int64()),
            }
        )

    counts = bucketed_reduce(
        lens.map_batches(count_above, batch_format="pyarrow"), bucket_of, red
    ).to_pandas()
    out = med.rename(columns={"p50": "median_len"}).merge(counts, on="lang")
    return out.sort_values("lang").reset_index(drop=True)[["lang", "median_len", "n_above"]]


def q_emb_kmeans(sf_dir):
    """Full-corpus spherical k-means over the embeddings table
    (datapipe/cluster.py): each Lloyd step is one streaming pass whose
    partials reduce to k×(d+1) driver floats. Rows-only (hash-seeded
    init isn't SQL-expressible); exact-vs-serial in pytest."""
    from everythinggraph_ray.datapipe.cluster import emb_kmeans

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    res = emb_kmeans(emb, n_clusters=8, n_iters=6)
    return res["assignments"].to_pandas().sort_values("vec_id").reset_index(drop=True)


def q_docs_vocab_hll(sf_dir):
    """Approximate distinct-token count (HyperLogLog p=12,
    datapipe/sketch.py): the vocabulary-sizing planning estimate. No SQL
    oracle (blake2b register sketch isn't SQL-expressible); estimate is
    deterministic and accuracy/merge-invariance are pytest-checked."""
    from everythinggraph_ray.datapipe.sketch import hll_distinct_tokens

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    r = hll_distinct_tokens(docs)
    return pa.table(
        {
            "estimate": pa.array([round(float(r["estimate"]), 3)], pa.float64()),
            "registers": pa.array([int(r["registers"])], pa.int64()),
            "p": pa.array([int(r["p"])], pa.int64()),
        }
    )


def q_docs_shard_assign(sf_dir):
    """Deterministic global shuffle + output sharding: md5-hash shard +
    within-shard hash-order position (datapipe/curate.py shard_assign) —
    the no-RNG training-data shuffle whose shards regenerate
    independently."""
    from everythinggraph_ray.datapipe.curate import shard_assign

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return shard_assign(docs, num_shards=16)


def q_docs_len_quantiles(sf_dir):
    """Exact per-language length quantiles (p25/p50/p90/p99) via the
    distributed value-histogram aggregate (stages/agg.py
    grouped_quantiles) — shuffle volume is distinct (lang, length)
    pairs, never a global sort."""
    from everythinggraph_ray.stages.agg import grouped_quantiles

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def with_len(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch["lang"],
                "len": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            }
        )

    return grouped_quantiles(
        docs.map_batches(with_len, batch_format="pyarrow"),
        "len",
        [0.25, 0.5, 0.9, 0.99],
        group_col="lang",
    )


def q_orders_customer_join(sf_dir):
    """Distributed hash INNER join (both sides shuffled, no broadcast —
    the big-side complement of the ray.put join in mktsegment_revenue):
    attach each order's customer market segment."""
    from everythinggraph_ray.datapipe.joins import hash_join

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    return hash_join(
        orders,
        cust,
        on="o_custkey",
        right_on="c_custkey",
        right_cols=["c_mktsegment"],
        how="inner",
    )


def q_cust_no_bigorder(sf_dir):
    """Distributed ANTI join (blocklist-filter shape): customers with no
    order above 300k total price."""
    from everythinggraph_ray.datapipe.joins import hash_join

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def big(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["o_totalprice"], 300_000.0))
        return t.select(["o_custkey"])

    return hash_join(
        cust,
        orders.map_batches(big, batch_format="pyarrow"),
        on="c_custkey",
        right_on="o_custkey",
        how="anti",
    )


def q_q1_returnflag(sf_dir):
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["qty_c"] = np.round(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        df["price_c"] = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        df["disc_price_c2"] = df["price_c"] * (100 - disc_c)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_c=("qty_c", "sum"),
            sum_base_c=("price_c", "sum"),
            sum_disc_c2=("disc_price_c2", "sum"),
            n_rows=("qty_c", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_c", alias_name="sum_qty_c"),
            Sum("sum_base_c", alias_name="sum_base_c"),
            Sum("sum_disc_c2", alias_name="sum_disc_c2"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )


Q5_REGION = "ASIA"


def q_q5_region_revenue(sf_dir):
    """TPC-H Q5-lite: revenue per nation for customers in one region —
    a FOUR-table join chain exercising both join shapes: region⋈nation
    (25 rows) rides as a ray.put broadcast map; customer⋈orders and
    orders⋈lineitem go through the distributed bucketed hash_join.
    Revenue is exact integer cents (round(extendedprice·(1−discount)·100),
    expression shared verbatim with the oracle)."""
    import ray as _ray

    from everythinggraph_ray.datapipe.joins import hash_join

    region = ray.data.read_parquet(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    ).to_pandas()
    nation = ray.data.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey", "n_name"],
    ).to_pandas()
    rk = region.loc[region["r_name"] == Q5_REGION, "r_regionkey"]
    nmap = nation[nation["n_regionkey"].isin(rk)]
    name_of = _ray.put(
        dict(zip(nmap["n_nationkey"].astype(np.int64), nmap["n_name"]))
    )

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )

    def attach_nation(batch: pa.Table) -> pa.Table:
        m = _ray.get(name_of)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        names = pd.Series(nk).map(m)
        keep = names.notna().to_numpy()
        return pa.table(
            {
                "c_custkey": pa.array(
                    batch["c_custkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "n_name": pa.array(names[keep].astype(str), pa.string()),
            }
        )

    cust_asia = cust.map_batches(attach_nation, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    ord_nat = hash_join(
        orders, cust_asia, on="o_custkey", right_on="c_custkey", right_cols=["n_name"]
    )

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                # floor(x+0.5), not np.round: numpy rounds half-EVEN while
                # DuckDB rounds half away from zero — real .5 ties occur here
                "rev_c": pa.array(
                    np.floor(p * (1.0 - d) * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    li_nat = hash_join(
        li.map_batches(rev, batch_format="pyarrow"),
        ord_nat,
        on="l_orderkey",
        right_on="o_orderkey",
        right_cols=["n_name"],
    )

    from ray.data.aggregate import Count, Sum

    return (
        li_nat.groupby("n_name")
        .aggregate(Sum("rev_c", alias_name="revenue_c"), Count(alias_name="n_items"))
    )


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = np.datetime64("1998-06-01")


def q_supplier_nation_revenue(sf_dir):
    """Revenue attributed per SUPPLIER nation (the last untouched
    input table): nation names ride as a 25-row ray.put broadcast onto
    suppliers, lineitem ⋈ supplier goes through the distributed
    bucketed hash_join, integer-cent revenue folds per nation. The
    supplier-side complement of q5's customer-side chain."""
    import ray as _ray

    from ray.data.aggregate import Count, Sum

    from everythinggraph_ray.datapipe.joins import hash_join

    nation = ray.data.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = _ray.put(
        dict(zip(nation["n_nationkey"].astype(np.int64), nation["n_name"]))
    )

    supp = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )

    def attach_nation(batch: pa.Table) -> pa.Table:
        m = _ray.get(nmap)
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = pd.Series(nk).map(m)
        return pa.table(
            {
                "s_suppkey": batch["s_suppkey"],
                "n_name": pa.array(names.astype(str), pa.string()),
            }
        )

    supp_n = supp.map_batches(attach_nation, batch_format="pyarrow")

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_suppkey": batch["l_suppkey"],
                # floor(x+0.5): the q5 half-away convention
                "rev_c": pa.array(
                    np.floor(p * (1.0 - d) * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    j = hash_join(
        li.map_batches(rev, batch_format="pyarrow"),
        supp_n,
        on="l_suppkey",
        right_on="s_suppkey",
        right_cols=["n_name"],
    )
    return (
        j.groupby("n_name")
        .aggregate(Sum("rev_c", alias_name="revenue_c"), Count(alias_name="n_items"))
    )


def q_part_brand_revenue(sf_dir):
    """Revenue per part BRAND: lineitem ⋈ part on partkey through the
    distributed bucketed hash_join (the part dimension scales with SF —
    big side at 100 TB, so no broadcast), integer-cent revenue + item
    counts per brand. Completes per-table coverage: every driver table
    now has a hash-checked consumer."""
    from ray.data.aggregate import Count, Sum

    from everythinggraph_ray.datapipe.joins import hash_join

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def rev(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "rev_c": pa.array(
                    np.floor(p * (1.0 - d) * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    j = hash_join(
        li.map_batches(rev, batch_format="pyarrow"),
        part,
        on="l_partkey",
        right_on="p_partkey",
        right_cols=["p_brand"],
    )
    return (
        j.groupby("p_brand")
        .aggregate(Sum("rev_c", alias_name="revenue_c"), Count(alias_name="n_items"))
    )


def q_orders_rfm(sf_dir):
    """RFM customer segmentation (recency / frequency / monetary): one
    groupby folds orders to per-customer (last order µs, order count,
    integer-cent spend), then the distributed window primitive assigns
    NTILE(5) scores per measure (desc, custkey tiebreak) — three
    range-partitioned rank passes over the customer table, the
    classic CRM scoring pipeline. All integers → full hash parity."""
    from ray.data.aggregate import Count, Max, Sum

    from everythinggraph_ray.stages.agg import grouped_row_number

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def pare(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype(np.int64)
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": batch["o_custkey"],
                "last_us": pa.array(od, pa.int64()),
                # floor(x+0.5): DuckDB rounds half away from zero (q5 note)
                "cents": pa.array(
                    np.floor(tp * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    per_cust = (
        orders.map_batches(pare, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(
            Max("last_us", alias_name="last_us"),
            Count(alias_name="n_orders"),
            Sum("cents", alias_name="total_c"),
        )
    )
    scored = per_cust
    for measure, col in (("last_us", "r_score"), ("n_orders", "f_score"), ("total_c", "m_score")):
        scored = grouped_row_number(
            scored,
            None,
            measure,
            "c_custkey",
            ascending=False,
            ntile=5,
            ntile_col=col,
            rank_col=f"__rn_{col}",
        )
    return scored.map_batches(
        lambda t: t.select(["c_custkey", "r_score", "f_score", "m_score"]),
        batch_format="pyarrow",
    )


def q_q3_shipping_priority(sf_dir):
    """TPC-H Q3-lite (shipping priority): top-10 unshipped orders of one
    market segment by revenue. Predicates push to the reads (segment,
    both date cuts as per-batch arrow masks), the segment's customers
    SEMI-filter orders through the distributed hash_join (no broadcast —
    1/5 of all customers is big-side at scale), lineitem revenue joins
    the surviving orders, and the final per-order sums are a groupby on
    the functionally-dependent (orderkey, date, priority) triple so one
    exchange finishes it. Revenue is exact integer cents (floor(x+0.5),
    the q5 convention shared verbatim with the oracle); the top-10 sort
    is over the small aggregated table."""
    from ray.data.aggregate import Sum

    from everythinggraph_ray.datapipe.joins import hash_join

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )

    def seg_keys(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["c_mktsegment"], Q3_SEGMENT)
        return batch.filter(keep).select(["c_custkey"])

    building = cust.map_batches(seg_keys, batch_format="pyarrow")

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def before_cut(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(od < Q3_CUTOFF, pa.bool_()))

    open_orders = hash_join(
        orders.map_batches(before_cut, batch_format="pyarrow"),
        building,
        on="o_custkey",
        right_on="c_custkey",
        how="semi",
    )

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def rev_after_cut(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship > Q3_CUTOFF
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        d = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "l_orderkey": pa.array(
                    batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                # floor(x+0.5): DuckDB rounds half away from zero (q5 note)
                "rev_c": pa.array(
                    np.floor(p * (1.0 - d) * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    j = hash_join(
        li.map_batches(rev_after_cut, batch_format="pyarrow"),
        open_orders,
        on="l_orderkey",
        right_on="o_orderkey",
        right_cols=["o_orderdate", "o_orderpriority"],
    )
    agg = j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"]).aggregate(
        Sum("rev_c", alias_name="revenue_c")
    )
    # distributed top-10: sort + limit stay on the cluster (the aggregated
    # table is one row per open order — never pulled to the driver)
    df = (
        agg.sort(
            ["revenue_c", "o_orderdate", "l_orderkey"],
            descending=[True, False, False],
        )
        .limit(10)
        .to_pandas()
    )
    df = df.rename(columns={"l_orderkey": "o_orderkey"})
    return df[["o_orderkey", "revenue_c", "o_orderdate", "o_orderpriority"]]


def q_q4_late_orders(sf_dir):
    """TPC-H Q4-lite: per order priority, the number of DISTINCT orders
    with at least one lineitem shipped more than 60 days after the order
    date. The big⋈big date-predicate join: order dates attach to
    lineitems via the distributed hash_join, late lineitems reduce to
    per-(priority, orderkey) distinct rows per batch, and the distinct
    count rides one bucketed reduce keyed by orderkey (an order's rows
    co-locate, so the final count is exact)."""
    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_shipdate"]
    )
    joined = hash_join(
        li,
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        right_cols=["o_orderdate", "o_orderpriority"],
    )

    def late_pairs(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        odate = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = (ship - odate) > np.timedelta64(60, "D")
        df = (
            pd.DataFrame(
                {
                    "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                    "o_orderpriority": np.asarray(
                        batch["o_orderpriority"].to_pylist(), dtype=object
                    )[keep],
                }
            )
            .drop_duplicates()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = joined.map_batches(late_pairs, batch_format="pyarrow")

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(
            batch["o_orderkey"].to_numpy(zero_copy_only=False)
        ).astype(np.int64) & 0x7FFFFFFF

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates()
        out = df.groupby("o_orderpriority", as_index=False).size()
        out["n_late"] = out.pop("size").astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = bucketed_reduce(pairs, bucket_of, red)

    def b2(batch: pa.Table) -> np.ndarray:
        return string_buckets(batch["o_orderpriority"])

    def fin(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("o_orderpriority", as_index=False)["n_late"].sum()
        return pa.Table.from_pandas(
            df.astype({"n_late": np.int64}), preserve_index=False
        )

    return bucketed_reduce(partials, b2, fin)


def q_mktsegment_revenue(sf_dir):
    """Broadcast hash join: customer (small side) shipped once via
    ray.put, orders stream through map_batches — no shuffle."""
    import ray as _ray

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_of = _ray.put(dict(zip(cust["c_custkey"].astype(np.int64), cust["c_mktsegment"])))
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        m = _ray.get(seg_of)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        seg = pd.Series(ck).map(m).fillna("NONE").to_numpy(dtype=object)
        price_c = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        df = pd.DataFrame({"c_mktsegment": seg, "p": price_c})
        g = df.groupby("c_mktsegment", as_index=False).agg(
            revenue_c=("p", "sum"), n_orders=("p", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"), Sum("n_orders", alias_name="n_orders"))
    )


def q_q6_revenue(sf_dir):
    """TPC-H Q6-lite: the prune-at-the-read query. The shipdate range,
    discount band and quantity cap are pushed into ``read_parquet`` as a
    pyarrow dataset filter, so at scale only matching row groups leave
    storage (a year of a multi-year table) and only 3 of 11 columns are
    read. Revenue is summed as exact 1e-4-unit integers; the rounding
    expression (floor(x*10000 + 0.5)) is mirrored token-for-token in the
    SQL oracle so both sides build the identical IEEE double before the
    floor."""
    import pyarrow.dataset as pds

    lo = pa.scalar(pd.Timestamp("1995-01-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-01-01"), type=pa.timestamp("us"))
    flt = (
        (pds.field("l_shipdate") >= lo)
        & (pds.field("l_shipdate") < hi)
        & (pds.field("l_discount") >= 0.05)
        & (pds.field("l_discount") <= 0.07)
        & (pds.field("l_quantity") < 24.0)
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=flt,
    )

    def partial(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        di = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(ep * di * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "revenue_c4": pa.array([int(rev.sum())], pa.int64()),
                "n_items": pa.array([len(rev)], pa.int64()),
            }
        )

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table(
        {
            "revenue_c4": pa.array([int(parts["revenue_c4"].sum())], pa.int64()),
            "n_items": pa.array([int(parts["n_items"].sum())], pa.int64()),
        }
    )


Q18_QTY_THRESHOLD = 150  # total lineitem quantity per order (TPC-H Q18's 300 scaled)


def q_q18_big_orders(sf_dir):
    """TPC-H Q18-lite (large-volume orders): groupby-HAVING then join
    back. Per-order quantity totals ride the batch-partial + bucketed-sum
    combiner (never a per-key Ray aggregate); the small qualifying set
    then attaches order fields via the distributed hash_join and customer
    names via one ray.put broadcast (customer is the classic small
    side)."""
    import ray as _ray

    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.stages.agg import sum_by_key

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_quantity"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, np.round(q).astype(np.int64))
        return pa.table(
            {"vid": pa.array(u, pa.int64()), "qty_partial": pa.array(s, pa.int64())}
        )

    totals = sum_by_key(
        li.map_batches(partial, batch_format="pyarrow"),
        "vid",
        ["qty_partial"],
        out_names=["total_qty"],
    )
    big = totals.map_batches(
        lambda t: t.filter(pc.greater(t["total_qty"], Q18_QTY_THRESHOLD)).rename_columns(
            ["o_orderkey", "total_qty"]
        ),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    joined = hash_join(
        big, orders, on="o_orderkey", right_cols=["o_custkey", "o_totalprice"]
    )
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    ).to_pandas()
    name_of = _ray.put(dict(zip(cust["c_custkey"].astype(np.int64), cust["c_name"])))

    def attach(batch: pa.Table) -> pa.Table:
        m = _ray.get(name_of)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        price_c = np.round(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "total_qty": batch["total_qty"],
                "c_name": pa.array(pd.Series(ck).map(m).to_numpy(dtype=object), pa.string()),
                "o_totalprice_c": pa.array(price_c, pa.int64()),
            }
        )

    return joined.map_batches(attach, batch_format="pyarrow")


COPURCHASE_MINSUP = 2


def q_part_copurchase(sf_dir):
    """Frequent co-purchased part pairs (market-basket pair mining over
    lineitem — the 'customers who bought X also bought Y' primitive).
    Orders co-locate by orderkey hash in ONE bucketed reduce; pair
    emission inside each bucket is a vectorized self-merge on orderkey
    (TPC-H shape bounds an order at 7 lineitems, so the per-order pair
    blowup is <= 21 — document the partitioning assumption: a pathological
    mega-basket would need a per-order pair cap). Per-bucket pre-counts
    are the combiner; the global count is the two-key bucketed sum; the
    support filter (>= COPURCHASE_MINSUP) prunes the 1-count long tail
    (97% of pairs at sf0.01) before anything else sees it."""
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, sum_by_key_pair

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"]
    )

    def bucket_of(b: pa.Table) -> np.ndarray:
        return mix64(b["l_orderkey"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        ) & 0x7FFFFFFF

    def emit_pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates()
        m = df.merge(df, on="l_orderkey", suffixes=("_x", "_y"))
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        # per-bucket pre-count (combiner): same pair across this bucket's
        # orders collapses to one row before the pair shuffle
        c = m.groupby(["l_partkey_x", "l_partkey_y"], sort=False).size().reset_index()
        return pa.table(
            {
                "a": pa.array(c["l_partkey_x"].to_numpy(np.int64), pa.int64()),
                "b": pa.array(c["l_partkey_y"].to_numpy(np.int64), pa.int64()),
                "cnt": pa.array(c[0].to_numpy(np.int64), pa.int64()),
            }
        )

    pairs = bucketed_reduce(li, bucket_of, emit_pairs)
    counts = sum_by_key_pair(pairs, "a", "b", ["cnt"])
    return counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], COPURCHASE_MINSUP)),
        batch_format="pyarrow",
    )


def q_orders_skyline(sf_dir):
    """2-D skyline (Pareto frontier) of orders on (min o_totalprice, min
    o_orderdate) — 'no other order is both cheaper-or-equal and
    earlier-or-equal with one strict'. Dominance is a strict partial
    order, so skyline(union of per-batch skylines) == global skyline
    (any dominator eliminated locally is itself dominated transitively
    by a local survivor); the per-batch pass is the combiner — each
    batch forwards only its O(log n)-expected frontier — and the final
    pass reduces the tiny union on one partition. Both passes share one
    vectorized lexsort+prefix-min kernel; equal (price, date) twins
    don't dominate each other and all survive, matching the SQL
    NOT-EXISTS oracle exactly."""

    def local_skyline(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((d, p))
        p_s, d_s = p[order], d[order]
        first = np.r_[True, p_s[1:] != p_s[:-1]]
        grp_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
        # sorted by date within a price group: the group's first row IS its min
        groupmin = d_s[grp_start]
        prefmin = np.minimum.accumulate(d_s)
        prev = grp_start - 1
        cheaper_min = np.where(prev >= 0, prefmin[np.maximum(prev, 0)], np.iinfo(np.int64).max)
        keep = (d_s == groupmin) & (d_s < cheaper_min)
        return batch.take(pa.array(np.sort(order[keep])))

    o = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )
    return (
        o.map_batches(local_skyline, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None: the single repartitioned block IS one batch —
        # the final pass must see the whole (tiny) union at once
        .map_batches(local_skyline, batch_format="pyarrow", batch_size=None)
    )


def q_rel_avg_nbr_degree(sf_dir):
    """Average-neighbour-degree building blocks (Barrat/Newman `knn(v)`):
    for every src vertex, the SUM of its out-neighbours' out-degrees and
    its out-edge count, as exact int64 (the float mean is a trivial
    client-side division; keeping integers keeps the hash exact). The
    degree table attaches to edges through the distributed hash_join
    (edges big ⋈ degrees small-ish — no driver state), then per-src sums
    ride the batch-partial + bucketed-sum combiner. Raw edge multiplicity
    counts, matching the SQL LEFT-JOIN-free formulation (out_degrees
    covers the full vertex universe with zeros)."""
    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.stages.agg import sum_by_key

    edges = rel_edges(sf_dir)
    od = out_degrees(edges)  # (vid, outdeg), dst-only vertices included at 0
    attached = hash_join(
        edges, od, on="dst", right_on="vid", right_cols=["outdeg"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        dg = batch["outdeg"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(s, return_inverse=True)
        dsum = np.zeros(len(u), np.int64)
        np.add.at(dsum, inv, dg.astype(np.int64))
        nout = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                "vid": pa.array(u, pa.int64()),
                "ds_p": pa.array(dsum, pa.int64()),
                "no_p": pa.array(nout, pa.int64()),
            }
        )

    return sum_by_key(
        attached.map_batches(partial, batch_format="pyarrow"),
        "vid",
        ["ds_p", "no_p"],
        out_names=["nbr_outdeg_sum", "n_out"],
    )


def q_rel_modularity(sf_dir):
    """Newman modularity of the connected-component partition over the
    simple undirected graph (distinct pairs, self-loops dropped) — the
    disconnected-graph modularity ceiling. Exact integer form: with
    m2 = 2m directed-pair rows and r_c = rows whose endpoint lies in
    component c (so r_c = both 2·e_c and ΣD_c), Q = num/den with
    num = Σ_c (m2·r_c − r_c²), den = m2². Labels come from the
    distributed WCCKernel; r_c is a hash_join + bucketed sum; num is a
    per-batch partial folded into one Dataset sum — nothing
    per-component ever reaches the driver."""
    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.stages.agg import sum_by_key
    from everythinggraph_ray.stages.edges import filter_self_loops

    und = dedup_edges(undirect_edges(filter_self_loops(rel_edges(sf_dir))))
    eng = GraphEngine(_rel_build(sf_dir, undirect=True))
    try:
        labels = eng.run(WCCKernel())["dataset"]
    finally:
        eng.shutdown()

    lab_e = hash_join(und, labels, on="src", right_on="vid", right_cols=["wcc"])

    def partial(batch: pa.Table) -> pa.Table:
        c = batch["wcc"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table(
            {"vid": pa.array(u, pa.int64()), "r_p": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    rc = sum_by_key(
        lab_e.map_batches(partial, batch_format="pyarrow"), "vid", ["r_p"], out_names=["r"]
    )
    m2 = int(rc.sum("r"))

    def num_partial(batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"np": pa.array([int((m2 * r - r * r).sum())], pa.int64())})

    num = int(rc.map_batches(num_partial, batch_format="pyarrow").sum("np"))
    return pa.table(
        {
            "mod_num": pa.array([num], pa.int64()),
            "mod_den": pa.array([m2 * m2], pa.int64()),
        }
    )


def q_docs_len_rank(sf_dir):
    """SQL window functions, distributed: ROW_NUMBER and NTILE(4) of
    every document within its language, ordered by length desc (doc_id
    tiebreak) — the full-group ranking grouped_top_k can't do. Rides
    `stages/agg.py grouped_row_number`: per-group range splitters from
    the exact quantile histogram, searchsorted range-bucketing (equal
    lengths co-locate), offset table of O(langs × 16) as the only
    broadcast state, one bucketed co-group for the local sort+rank — a
    language bigger than any worker still ranks, cell by cell."""
    from everythinggraph_ray.stages.agg import grouped_row_number

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "n_chars"]
    )
    return grouped_row_number(
        docs,
        "lang",
        "n_chars",
        "doc_id",
        ascending=False,
        rank_col="rn",
        ntile=4,
        ntile_col="tile",
    )


PIVOT_SOURCES = [f"src{i}" for i in range(20)]  # generator-fixed source set


def _lang_source_counts(sf_dir):
    """Distributed (lang, source) counts — the heavy pass shared by the
    pivot and rollup reshapes (per-batch pair-count combiner, tiny final
    groupby; |langs|×|sources| ≤ 100 rows ever leave the cluster)."""
    from ray.data.aggregate import Sum

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "source"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": batch["lang"].to_pandas(), "source": batch["source"].to_pandas()}
        )
        g = df.groupby(["lang", "source"], as_index=False).size()
        g["n"] = g.pop("size").astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )


def q_docs_lang_source_pivot(sf_dir):
    """Crosstab reshape: languages × the 20 fixed sources as a WIDE
    table (one n_srcK column per source). The count is fully
    distributed; the reshape runs on the ≤ langs×sources aggregate —
    the standard pivot plan (never pivot raw rows)."""
    counts = _lang_source_counts(sf_dir)
    wide = counts.pivot_table(
        index="lang", columns="source", values="n", fill_value=0, aggfunc="sum"
    )
    out = {"lang": pa.array(wide.index.to_numpy(object), pa.string())}
    for s in PIVOT_SOURCES:
        col = wide[s].to_numpy(np.int64) if s in wide.columns else np.zeros(len(wide), np.int64)
        out[f"n_{s}"] = pa.array(col, pa.int64())
    return pa.table(out)


def q_docs_lang_source_rollup(sf_dir):
    """GROUP BY ROLLUP(lang, source): counts at all three levels —
    (lang, source), per-lang subtotal, grand total — derived from ONE
    distributed finest-level aggregation (the classic rollup plan);
    rolled levels carry the '(all)' sentinel so the SQL mirror
    (COALESCE over ROLLUP) hash-matches exactly."""
    counts = _lang_source_counts(sf_dir)
    per_lang = counts.groupby("lang", as_index=False)["n"].sum()
    per_lang["source"] = "(all)"
    total = pd.DataFrame({"lang": ["(all)"], "source": ["(all)"], "n": [counts["n"].sum()]})
    allrows = pd.concat([counts, per_lang, total], ignore_index=True)
    return pa.table(
        {
            "lang": pa.array(allrows["lang"].to_numpy(object), pa.string()),
            "source": pa.array(allrows["source"].to_numpy(object), pa.string()),
            "n": pa.array(allrows["n"].to_numpy(np.int64), pa.int64()),
        }
    )


def q_events_value_quantiles(sf_dir):
    """Per-event-type p50/p95/p99 of the CONTINUOUS ``value`` column via
    the DDSketch-style relative-error sketch (datapipe/sketch.py) —
    grouped_quantiles' documented unbounded-float complement: geometric
    buckets, plain-sum mergeable histograms, ≤0.5% relative error,
    deterministic on any partitioning. Rows-only (the sketch's libm
    bucket boundaries aren't SQL-reproducible bit-for-bit); exactness
    vs a serial run of the same sketch and the error bound vs the true
    quantile are pytest-checked."""
    from everythinggraph_ray.datapipe.sketch import ddsketch_quantiles

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    return ddsketch_quantiles(
        ev, "value", [0.5, 0.95, 0.99], alpha=0.005, group_col="event_type"
    )


BPE_MERGES = 8


def q_docs_bpe_merges(sf_dir):
    """BPE tokenizer TRAINING (datapipe/bpe.py): learn the first 8
    merges over the corpus — corpus read once into a word-frequency
    vocabulary, then each merge step is one bucketed pair sum + a
    distributed argmax (two strings to the driver) + a vocabulary
    rewrite. Rows-only (iterative rewriting has no SQL form); exactness
    vs the serial dict reference is pytest-checked."""
    from everythinggraph_ray.datapipe.bpe import bpe_train

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    df = bpe_train(docs, n_merges=BPE_MERGES)
    return df.astype(
        {"rank": "int64", "left": "object", "right": "object", "pair_count": "int64"}
    )


def q_docs_bpe_tokens(sf_dir):
    """The apply side of BPE (train on the corpus, tokenize the corpus):
    per-doc token counts under the learned 8-merge table, via the
    stateful actor stage (merges load once per actor, per-actor word
    cache — datapipe/bpe.py BPEApplyStage). Rows-only; word-level
    serial equality is pytest-checked."""
    from everythinggraph_ray.datapipe.bpe import bpe_apply, bpe_train

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    merges = bpe_train(docs, n_merges=BPE_MERGES)
    return _typed_collect(
        bpe_apply(docs, merges),
        {"doc_id": "int64", "n_bpe_tokens": "int64", "n_words": "int64"},
    )


def q_events_conversion_quantiles(sf_dir):
    """Conversion-latency percentiles: per user, the first 'view' and the
    first 'purchase' at-or-after it; p50/p90/p99 of the exact integer
    microsecond delta across converting users. One user-bucketed
    co-group computes the per-user funnel delta vectorized (two
    groupby-mins + one merge per bucket), then the distributed
    value-histogram quantile aggregate finishes — never a global sort,
    never per-user driver state."""
    from everythinggraph_ray.stages.agg import bucketed_reduce, grouped_quantiles, mix64

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )

    def pare(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        keep = pc.or_(pc.equal(et, "view"), pc.equal(et, "purchase"))
        t = batch.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "is_p": pc.cast(pc.equal(t["event_type"], "purchase"), pa.int8()),
            }
        )

    rows = ev.map_batches(pare, batch_format="pyarrow")

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(
            batch["user_id"].to_numpy(zero_copy_only=False)
        ).astype(np.int64) & 0x7FFFFFFF

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        views = df[df["is_p"] == 0].groupby("user_id")["ts"].min().rename("vts")
        purch = df[df["is_p"] == 1].merge(
            views, left_on="user_id", right_index=True
        )
        purch = purch[purch["ts"] >= purch["vts"]]
        if not len(purch):
            return pa.table({"delta_us": pa.array([], pa.int64())})
        fp = purch.groupby("user_id").agg(pts=("ts", "min"), vts=("vts", "first"))
        delta = (fp["pts"] - fp["vts"]).to_numpy().astype("timedelta64[us]")
        return pa.table(
            {"delta_us": pa.array(delta.astype(np.int64), pa.int64())}
        )

    deltas = bucketed_reduce(rows, bucket_of, red)
    return grouped_quantiles(deltas, "delta_us", [0.5, 0.9, 0.99])


RATE_WINDOW_US = 60_000_000  # 60 s
RATE_FLAG_MIN = 2  # events per window that flags a user (the synthetic
# streams are sparse: max observed burst is 2, so 2 splits the population)


def q_events_rate_flags(sf_dir):
    """Burst-rate abuse flags: per user, the MAX number of events in any
    trailing 60 s window (peers at the boundary included — SQL RANGE
    semantics), flagged when >= 2. One user-bucketed co-group; inside a
    bucket each user's window counts are two vectorized searchsorted
    passes over the ts array (never a per-event loop). All integers."""
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(
            batch["user_id"].to_numpy(zero_copy_only=False)
        ).astype(np.int64) & 0x7FFFFFFF

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df["ts_us"] = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        users_out: list[int] = []
        maxes: list[int] = []
        for uid, grp in df.groupby("user_id", sort=False):
            ts = grp["ts_us"].to_numpy()
            hi = np.searchsorted(ts, ts, side="right")
            lo = np.searchsorted(ts, ts - RATE_WINDOW_US, side="left")
            users_out.append(int(uid))
            maxes.append(int((hi - lo).max()))
        return pa.table(
            {
                "user_id": pa.array(users_out, pa.int64()),
                "max_per_min": pa.array(maxes, pa.int64()),
            }
        )

    out = bucketed_reduce(ev, bucket_of, red)

    def flag(t: pa.Table) -> pa.Table:
        m = t["max_per_min"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "max_per_min": t["max_per_min"],
                "flagged": pa.array(
                    (m >= RATE_FLAG_MIN).astype(np.int64), pa.int64()
                ),
            }
        )

    return out.map_batches(flag, batch_format="pyarrow")


def q_events_audience_overlap(sf_dir):
    """Audience-overlap matrix: exact Jaccard between the user sets of
    every event-type pair — the 'do clickers also purchase' audience
    analysis. One user-bucketed co-group turns each user's distinct
    type set into per-pair co-occurrence partials (vectorized bitmask
    dot inside the bucket), tiny |types|² sums finish. All integers →
    full hash parity."""
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )
    types = sorted(
        ev.groupby("event_type").count().to_pandas()["event_type"].tolist()
    )
    t_idx = {t: i for i, t in enumerate(types)}
    K = len(types)

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(
            batch["user_id"].to_numpy(zero_copy_only=False)
        ).astype(np.int64) & 0x7FFFFFFF

    def pair_partials(g: pa.Table, _idx=t_idx, _k=K) -> pa.Table:
        df = g.to_pandas().drop_duplicates()
        df["ti"] = df["event_type"].map(_idx)
        # per-user indicator matrix (users × types) → co-occurrence M^T M
        piv = (
            df.assign(one=1)
            .pivot_table(index="user_id", columns="ti", values="one", fill_value=0)
            .reindex(columns=range(_k), fill_value=0)
            .to_numpy(dtype=np.int64)
        )
        co = piv.T @ piv  # diag = per-type user counts, off-diag = overlaps
        i, j = np.triu_indices(_k, k=1)
        return pa.table(
            {
                "ti": pa.array(np.r_[i, np.arange(_k)], pa.int64()),
                "tj": pa.array(np.r_[j, np.arange(_k)], pa.int64()),
                "c": pa.array(np.r_[co[i, j], np.diag(co)], pa.int64()),
            }
        )

    partials = bucketed_reduce(ev, bucket_of, pair_partials).to_pandas()
    co = partials.groupby(["ti", "tj"], as_index=False)["c"].sum()
    tot = {int(r.ti): int(r.c) for r in co[co["ti"] == co["tj"]].itertuples()}
    off = co[co["ti"] != co["tj"]]
    rows = []
    for r in off.itertuples(index=False):
        inter = int(r.c)
        union = tot[int(r.ti)] + tot[int(r.tj)] - inter
        rows.append(
            (
                types[int(r.ti)],
                types[int(r.tj)],
                inter,
                union,
                (1000 * inter) // union if union else 0,
            )
        )
    return pd.DataFrame(
        rows, columns=["type_a", "type_b", "n_common", "n_union", "jac_milli"]
    ).astype(
        {
            "type_a": "object",
            "type_b": "object",
            "n_common": "int64",
            "n_union": "int64",
            "jac_milli": "int64",
        }
    )


MARKOV_ITERS = 10


def q_events_markov_stationary(sf_dir):
    """Stationary distribution of the per-user event-type Markov chain:
    the transitions query's count table row-normalizes into P (|types|²
    driver floats — the one bounded-size object here), then x ← xP for
    10 iterations from uniform. The heavy lift is the distributed
    transition count (user-bucketed lag pairs); the |types|-dim
    iteration is driver math by design. Rounded to 7 decimals against
    the unrolled SQL recursion."""
    counts = q_events_transitions(sf_dir).to_pandas()
    types = sorted(set(counts["prev_type"]) | set(counts["next_type"]))
    idx = {t: i for i, t in enumerate(types)}
    P = np.zeros((len(types), len(types)), dtype=np.float64)
    for p_, n_, c in counts.itertuples(index=False):
        P[idx[p_], idx[n_]] = float(c)
    P = P / P.sum(axis=1, keepdims=True)  # every type has out-transitions here
    x = np.full(len(types), 1.0 / len(types), dtype=np.float64)
    for _ in range(MARKOV_ITERS):
        x = x @ P
    return pd.DataFrame(
        {"event_type": types, "stationary": np.round(x, 7)}
    ).astype({"event_type": "object", "stationary": "float64"})


def q_docs_rank_corr(sf_dir):
    """Per-language Spearman rank agreement between document LENGTH and
    QUALITY, as exact integers: both signals rank through the distributed
    window primitive (grouped_row_number, chained — the second ranking
    runs over the first's output, proving the primitive composes), then
    Σd² and n fold per language (Spearman ρ = 1 − 6Σd²/(n(n²−1)) is one
    client-side division). Quality quantizes via floor(q·1e8 + 0.5) —
    mirrored token-for-token in SQL on the same 8-decimal-rounded score
    docs_quality already hash-proves."""
    from ray.data.aggregate import Sum

    from everythinggraph_ray.datapipe.text import quality_values
    from everythinggraph_ray.stages.agg import grouped_row_number

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars", "text"],
    )

    def add_qint(batch: pa.Table) -> pa.Table:
        q = np.asarray(quality_values(batch["text"], rounded=False), dtype=np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "n_chars": batch["n_chars"],
                "qint": pa.array(np.floor(q * 1e8 + 0.5).astype(np.int64), pa.int64()),
            }
        )

    scored = docs.map_batches(add_qint, batch_format="pyarrow")
    r1 = grouped_row_number(
        scored, "lang", "n_chars", "doc_id", ascending=False, rank_col="rn1"
    )
    r2 = grouped_row_number(
        r1, "lang", "qint", "doc_id", ascending=False, rank_col="rn2"
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = (
            batch["rn1"].to_numpy(zero_copy_only=False)
            - batch["rn2"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        df = pd.DataFrame({"lang": batch["lang"].to_pandas(), "d2": d * d, "one": 1})
        g = df.groupby("lang", as_index=False).agg(sum_d2=("d2", "sum"), n=("one", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        r2.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("sum_d2", alias_name="sum_d2"), Sum("n", alias_name="n"))
    )


def q_events_transitions(sf_dir):
    """Per-user event-type Markov transitions: count consecutive
    (prev_type → next_type) pairs in each user's ts-ordered stream
    (event_id tiebreak). Users co-locate via the bucketed reduce (one
    vectorized pandas pass per hash bucket — the per-user window never
    shuffles whole streams to one node), partial pair counts then fold
    through a tiny groupby since |types|² is bounded."""
    from ray.data.aggregate import Sum

    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        ) & 0x7FFFFFFF

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = df.groupby("user_id", sort=False)["event_type"].shift(1)
        keep = prev.notna()
        pairs = pd.DataFrame(
            {"prev_type": prev[keep].to_numpy(), "next_type": df["event_type"][keep].to_numpy()}
        )
        out = pairs.groupby(["prev_type", "next_type"], as_index=False).size()
        out["n"] = out.pop("size").astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = bucketed_reduce(ev, bucket_of, red)
    return (
        partials.groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


# ----------------------------------------------------------------------
# SQL oracles
# ----------------------------------------------------------------------
def _sql_graph_prelude(*, undirect: bool = False, no_self: bool = False) -> str:
    parts = [f"e AS ({SQL_REL_EDGES})"]
    if no_self:
        parts.append("e2 AS (SELECT src, dst FROM e WHERE src <> dst)")
    if undirect:
        parts.append(
            "und AS (SELECT src AS u, dst AS v FROM e WHERE src <> dst "
            "UNION SELECT dst AS u, src AS v FROM e WHERE src <> dst)"
        )
    parts.append(
        "verts AS (SELECT DISTINCT vid FROM "
        "(SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))"
    )
    return ", ".join(parts)


BC_LEVELS = 12  # truncated-Brandes hop cap, shared verbatim with graph/betweenness.py


def _betweenness_sql(T: int = BC_LEVELS) -> str:
    """Unrolled truncated-Brandes oracle (8 smallest sources, simple
    digraph, hop metric, cap T): a recursive CTE pins min hop distances
    m(i, vid), then per-level sigma CTEs (sum of predecessor sigmas over
    DAG edges) and reverse delta CTEs (sigma · Σ (1+delta)/sigma over
    successors) mirror graph/betweenness.py stage for stage. sigma is
    DOUBLE on both sides; bc = round(Σ levels ≥ 1 delta, 7) — the
    repo-wide float-parity device."""
    # every unrolled CTE is MATERIALIZED: DuckDB otherwise inlines them,
    # re-evaluating the whole sig/delta chain per reference (exponential)
    ctes = [
        f"e AS ({SQL_REL_EDGES})",
        "de AS MATERIALIZED (SELECT DISTINCT src, dst FROM e WHERE src <> dst)",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM "
        "(SELECT src AS vid FROM de UNION ALL SELECT dst AS vid FROM de))",
        "srcs AS MATERIALIZED (SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS i "
        "FROM (SELECT vid FROM verts ORDER BY vid LIMIT 8))",
        f"r(i, vid, d) AS (SELECT i, vid, CAST(0 AS BIGINT) FROM srcs UNION "
        f"SELECT r.i, de.dst, r.d + 1 FROM r JOIN de ON de.src = r.vid WHERE r.d < {T})",
        "m AS MATERIALIZED (SELECT i, vid, min(d) AS d FROM r GROUP BY i, vid)",
        "sig0 AS MATERIALIZED (SELECT i, vid, CAST(1 AS DOUBLE) AS sigma FROM srcs)",
    ]
    for t in range(1, T + 1):
        ctes.append(
            f"sig{t} AS MATERIALIZED (SELECT p.i, de.dst AS vid, sum(p.sigma) AS sigma "
            f"FROM sig{t-1} p JOIN de ON de.src = p.vid "
            f"JOIN m mv ON mv.i = p.i AND mv.vid = de.dst "
            f"WHERE mv.d = {t} GROUP BY p.i, de.dst)"
        )
    ctes.append(
        f"d{T} AS MATERIALIZED (SELECT i, vid, sigma, CAST(0 AS DOUBLE) AS delta FROM sig{T})"
    )
    for t in range(T - 1, -1, -1):
        ctes.append(
            f"d{t} AS MATERIALIZED (SELECT l.i, l.vid, l.sigma, "
            f"l.sigma * coalesce(s.acc, 0) AS delta "
            f"FROM sig{t} l LEFT JOIN ("
            f"SELECT d.i, de.src AS vid, sum((1 + d.delta) / d.sigma) AS acc "
            f"FROM d{t+1} d JOIN de ON de.dst = d.vid GROUP BY d.i, de.src) s "
            f"ON s.i = l.i AND s.vid = l.vid)"
        )
    union = " UNION ALL ".join(
        f"SELECT vid, delta FROM d{t}" for t in range(1, T + 1)
    )
    return (
        "WITH RECURSIVE "
        + ", ".join(ctes)
        + f", contrib AS MATERIALIZED ({union}) "
        "SELECT v.vid, round(coalesce(b.s, 0), 7) AS bc FROM verts v "
        "LEFT JOIN (SELECT vid, sum(delta) AS s FROM contrib GROUP BY vid) b "
        "ON b.vid = v.vid"
    )


def _walks_sql(length: int = WALK_LEN) -> str:
    """Unrolled deterministic-walk oracle: per step t a successor CTE
    (row_number over md5(f'{t}:{src}:{dst}'), ties by dst — the exact
    rule of stages/walk.py), then a chain of frontier joins."""
    parts = [
        _sql_graph_prelude(),
        "ed AS (SELECT DISTINCT src, dst FROM e)",
        f"s0 AS (SELECT vid AS walk, CAST(0 AS BIGINT) AS step, vid "
        f"FROM verts WHERE vid % {WALK_SEED_MOD} = 0)",
    ]
    for t in range(length):
        parts.append(
            f"n{t} AS (SELECT src, dst AS nxt FROM ("
            f"SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY "
            f"md5('{t}:' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), dst) AS rn "
            f"FROM ed) WHERE rn = 1)"
        )
        parts.append(
            f"s{t + 1} AS (SELECT s{t}.walk, CAST({t + 1} AS BIGINT) AS step, n{t}.nxt AS vid "
            f"FROM s{t} JOIN n{t} ON n{t}.src = s{t}.vid)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM s{t}" for t in range(length + 1))
    return "WITH " + ", ".join(parts) + f" SELECT walk, step, vid FROM ({union})"


def _pagerank10_sql(
    edges_prelude: str | None = None, tail: str | None = None
) -> str:
    """Reference-semantics 10-iteration PageRank as an unrolled CTE chain
    (init prev=0.15, dangling mass dropped — pagerank_simple.c:43-55,94-98).
    ``edges_prelude`` overrides the leading CTEs ending in an ``e(src,
    dst)`` table (default: the derived relational edge table); ``tail``
    overrides the final SELECT (web_top10 reuses the chain with a
    LIMIT)."""
    ctes = [
        edges_prelude or f"e AS ({SQL_REL_EDGES})",
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "deg AS (SELECT src AS vid, count(*) AS d FROM e GROUP BY src)",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "r0 AS (SELECT vid, CAST(0.15 AS DOUBLE) AS r FROM verts)",
    ]
    for k in range(1, 11):
        ctes.append(
            f"r{k} AS (SELECT v.vid, (SELECT 0.15/n FROM nv) + 0.85 * coalesce(s.contrib, 0) AS r "
            f"FROM verts v LEFT JOIN (SELECT e.dst AS vid, sum(p.r / deg.d) AS contrib "
            f"FROM e JOIN r{k-1} p ON p.vid = e.src JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) s ON s.vid = v.vid)"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + (tail or " SELECT vid, round(r, 7) AS pagerank FROM r10")
    )


def _pagerank10_dangling_sql() -> str:
    """Textbook PageRank, 10 iterations: per level the dangling mass is
    one scalar subquery (verts with no out-edges), redistributed /n
    inside the damped term — op order mirrors DanglingPageRankKernel."""
    # every unrolled level is MATERIALIZED: each r{k} references r{k-1}
    # twice (contrib join + dangling scalar), so inlining re-expands the
    # tree ~2^10-fold and never finishes
    ctes = [
        f"e AS MATERIALIZED ({SQL_REL_EDGES})",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS d FROM e GROUP BY src)",
        "nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "r0 AS MATERIALIZED (SELECT vid, (SELECT 1.0/n FROM nv) AS r FROM verts)",
    ]
    for k in range(1, 11):
        dm = (
            f"(SELECT coalesce(sum(p.r), 0)/(SELECT n FROM nv) FROM r{k-1} p "
            f"LEFT JOIN deg ON deg.vid = p.vid WHERE deg.d IS NULL)"
        )
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT v.vid, (SELECT 0.15/n FROM nv) + 0.85 * "
            f"(coalesce(s.contrib, 0) + {dm}) AS r "
            f"FROM verts v LEFT JOIN (SELECT e.dst AS vid, sum(p.r / deg.d) AS contrib "
            f"FROM e JOIN r{k-1} p ON p.vid = e.src JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) s ON s.vid = v.vid)"
        )
    return "WITH " + ", ".join(ctes) + " SELECT vid, round(r, 7) AS pagerank FROM r10"


def _wpagerank10_sql() -> str:
    """Weighted PageRank, 10 iterations: contribution per edge is
    (prev / wdeg_src) * w — op order matches the kernel exactly; srcs
    with wdeg = 0 are filtered (the kernel emits 0 for them)."""
    ctes = [
        f"e AS ({SQL_REL_EDGES})",
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "ew AS (SELECT src, dst, CAST(src % 10 + dst % 10 AS DOUBLE) AS w FROM e)",
        "wd AS (SELECT src AS vid, sum(w) AS wd FROM ew GROUP BY src)",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "r0 AS (SELECT vid, CAST(0.15 AS DOUBLE) AS r FROM verts)",
    ]
    for k in range(1, 11):
        ctes.append(
            f"r{k} AS (SELECT v.vid, (SELECT 0.15/n FROM nv) + 0.85 * coalesce(s.contrib, 0) AS r "
            f"FROM verts v LEFT JOIN (SELECT ew.dst AS vid, sum((p.r / wd.wd) * ew.w) AS contrib "
            f"FROM ew JOIN r{k-1} p ON p.vid = ew.src JOIN wd ON wd.vid = ew.src "
            f"WHERE wd.wd > 0 GROUP BY ew.dst) s ON s.vid = v.vid)"
        )
    return "WITH " + ", ".join(ctes) + " SELECT vid, round(r, 7) AS wpagerank FROM r10"


def _matching_sql(rounds: int = 20) -> str:
    """Unrolled deterministic parallel matching (the _mis_sql device on
    EDGES): round r matches every active edge whose md5 key is minimal at
    BOTH endpoints; matched endpoints retire their edges. ``rounds`` must
    exceed the data's true round count (converges well within 20 at
    sf0.01; extra rounds run on empty sets). Leftover active edges are
    deliberately NOT matched, so an insufficient unroll mismatches loudly."""

    def key(a: str, b: str) -> str:
        return (
            f"md5(CAST({a} AS VARCHAR) || ':' || CAST({b} AS VARCHAR)) || "
            f"lpad(CAST({a} AS VARCHAR), 20, '0') || lpad(CAST({b} AS VARCHAR), 20, '0')"
        )

    ctes = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        f"FROM ({SQL_REL_EDGES}) WHERE src <> dst)"
    ]
    for r in range(rounds):
        ctes.append(
            f"vm{r} AS MATERIALIZED (SELECT x AS v, min(k) AS mk FROM "
            f"(SELECT a AS x, {key('a', 'b')} AS k FROM e{r} "
            f"UNION ALL SELECT b AS x, {key('a', 'b')} AS k FROM e{r}) GROUP BY x)"
        )
        ctes.append(
            f"w{r} AS MATERIALIZED (SELECT e.a, e.b FROM e{r} e "
            f"JOIN vm{r} va ON va.v = e.a JOIN vm{r} vb ON vb.v = e.b "
            f"WHERE {key('e.a', 'e.b')} = va.mk AND {key('e.a', 'e.b')} = vb.mk)"
        )
        ctes.append(
            f"sat{r} AS MATERIALIZED (SELECT a AS vid FROM w{r} UNION SELECT b AS vid FROM w{r})"
        )
        ctes.append(
            f"e{r+1} AS MATERIALIZED (SELECT a, b FROM e{r} "
            f"WHERE a NOT IN (SELECT vid FROM sat{r}) AND b NOT IN (SELECT vid FROM sat{r}))"
        )
    union = " UNION ALL ".join(f"SELECT a, b FROM w{r}" for r in range(rounds))
    return "WITH " + ", ".join(ctes) + f" SELECT a, b FROM ({union})"


def _truss_sql() -> tuple[str, str]:
    """(edge_support oracle, ktruss oracle): support = common-neighbor
    count per canonical undirected edge; ktruss = KTRUSS_MAX_ROUNDS
    unrolled simultaneous peels at threshold KTRUSS_K - 2, final support
    recomputed over the surviving set — op-for-op the Ray semantics."""
    need = KTRUSS_K - 2
    base = (
        f"e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        f"FROM ({SQL_REL_EDGES}) WHERE src <> dst)"
    )

    # MATERIALIZED throughout: DuckDB inlines plain CTEs at every use
    # site, so an unrolled peel would re-expand (and re-open the parquet)
    # exponentially — same trick as the betweenness oracle
    def support_ctes(i: int) -> list[str]:
        return [
            f"adj{i} AS MATERIALIZED (SELECT a AS x, b AS y FROM e{i} UNION ALL SELECT b AS x, a AS y FROM e{i})",
            f"s{i} AS MATERIALIZED (SELECT c.a, c.b, count(n2.x) AS support FROM e{i} c "
            f"LEFT JOIN adj{i} n1 ON n1.x = c.a "
            f"LEFT JOIN adj{i} n2 ON n2.x = c.b AND n2.y = n1.y "
            f"GROUP BY c.a, c.b)",
        ]
    ctes = [base] + support_ctes(0)
    support_sql = (
        "WITH " + ", ".join(ctes) + " SELECT a, b, CAST(support AS BIGINT) AS support FROM s0"
    )
    for i in range(1, KTRUSS_MAX_ROUNDS + 1):
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT a, b FROM s{i-1} WHERE support >= {need})"
        )
        ctes.extend(support_ctes(i))
    truss_sql = (
        "WITH " + ", ".join(ctes)
        + f" SELECT a, b, CAST(support AS BIGINT) AS support FROM s{KTRUSS_MAX_ROUNDS}"
    )
    return support_sql, truss_sql


def _coarsen_wpr10_sql() -> str:
    """Coarsen-then-weighted-PageRank: supergraph = distinct simple edges
    grouped by (src%64, dst%64) with contracted self-loops dropped, edge
    count as weight; then the exact _wpagerank10_sql iteration over it."""
    g = COARSEN_GROUPS
    ctes = [
        f"e AS ({SQL_REL_EDGES})",
        "d AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst)",
        f"ew AS (SELECT src % {g} AS src, dst % {g} AS dst, CAST(count(*) AS DOUBLE) AS w "
        f"FROM d WHERE src % {g} <> dst % {g} GROUP BY src % {g}, dst % {g})",
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM ew UNION ALL SELECT dst AS vid FROM ew))",
        "wd AS (SELECT src AS vid, sum(w) AS wd FROM ew GROUP BY src)",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "r0 AS (SELECT vid, CAST(0.15 AS DOUBLE) AS r FROM verts)",
    ]
    for k in range(1, 11):
        ctes.append(
            f"r{k} AS (SELECT v.vid, (SELECT 0.15/n FROM nv) + 0.85 * coalesce(s.contrib, 0) AS r "
            f"FROM verts v LEFT JOIN (SELECT ew.dst AS vid, sum((p.r / wd.wd) * ew.w) AS contrib "
            f"FROM ew JOIN r{k-1} p ON p.vid = ew.src JOIN wd ON wd.vid = ew.src "
            f"WHERE wd.wd > 0 GROUP BY ew.dst) s ON s.vid = v.vid)"
        )
    return "WITH " + ", ".join(ctes) + " SELECT vid AS gid, round(r, 7) AS wpagerank FROM r10"


def _hits10_sql(edges_prelude: str | None = None) -> str:
    """HITS, 10 iterations: auth_raw = sum of in-neighbor hub, L2
    normalize, hub_raw = sum of out-neighbor (scaled) auth, L2
    normalize. MATERIALIZED (each level is referenced twice — once by
    the next raw step, once by its own norm scalar)."""
    ctes = [
        edges_prelude or f"e AS ({SQL_REL_EDGES})",
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "h0 AS (SELECT vid, CAST(1.0 AS DOUBLE) AS x FROM verts)",
    ]
    for k in range(1, 11):
        ctes.append(
            f"ar{k} AS MATERIALIZED (SELECT v.vid, coalesce(s.x, 0) AS x FROM verts v "
            f"LEFT JOIN (SELECT e.dst AS vid, sum(h.x) AS x FROM e "
            f"JOIN h{k-1} h ON h.vid = e.src GROUP BY e.dst) s ON s.vid = v.vid)"
        )
        ctes.append(f"na{k} AS (SELECT sqrt(sum(x*x)) AS n FROM ar{k})")
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT vid, x / (SELECT n FROM na{k}) AS x FROM ar{k})"
        )
        ctes.append(
            f"hr{k} AS MATERIALIZED (SELECT v.vid, coalesce(s.x, 0) AS x FROM verts v "
            f"LEFT JOIN (SELECT e.src AS vid, sum(a.x) AS x FROM e "
            f"JOIN a{k} a ON a.vid = e.dst GROUP BY e.src) s ON s.vid = v.vid)"
        )
        ctes.append(f"nh{k} AS (SELECT sqrt(sum(x*x)) AS n FROM hr{k})")
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT vid, x / (SELECT n FROM nh{k}) AS x FROM hr{k})"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + " SELECT a10.vid, round(a10.x, 7) AS auth, round(h10.x, 7) AS hub "
        "FROM a10 JOIN h10 ON h10.vid = a10.vid"
    )


def _salsa10_sql() -> str:
    """SALSA, 10 iterations: auth_raw = Σ in-neighbor hub/outdeg, L1
    normalize, hub_raw = Σ out-neighbor auth/indeg, L1 normalize. Same
    unrolled-CTE shape as _hits10_sql, edge multiset semantics (degrees
    count multi-edges, matching the engine)."""
    ctes = [
        f"e AS ({SQL_REL_EDGES})",
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "od AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src)",
        "idg AS (SELECT dst AS vid, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY dst)",
        "h0 AS (SELECT vid, CAST(1.0 AS DOUBLE) AS x FROM verts)",
    ]
    for k in range(1, 11):
        ctes.append(
            f"ar{k} AS MATERIALIZED (SELECT v.vid, coalesce(s.x, 0) AS x FROM verts v "
            f"LEFT JOIN (SELECT e.dst AS vid, sum(h.x / od.d) AS x FROM e "
            f"JOIN h{k-1} h ON h.vid = e.src JOIN od ON od.vid = e.src GROUP BY e.dst) s "
            "ON s.vid = v.vid)"
        )
        ctes.append(f"na{k} AS (SELECT sum(x) AS n FROM ar{k})")
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT vid, x / (SELECT n FROM na{k}) AS x FROM ar{k})"
        )
        ctes.append(
            f"hr{k} AS MATERIALIZED (SELECT v.vid, coalesce(s.x, 0) AS x FROM verts v "
            f"LEFT JOIN (SELECT e.src AS vid, sum(a.x / idg.d) AS x FROM e "
            f"JOIN a{k} a ON a.vid = e.dst JOIN idg ON idg.vid = e.dst GROUP BY e.src) s "
            "ON s.vid = v.vid)"
        )
        ctes.append(f"nh{k} AS (SELECT sum(x) AS n FROM hr{k})")
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT vid, x / (SELECT n FROM nh{k}) AS x FROM hr{k})"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + " SELECT a10.vid, round(a10.x, 9) AS salsa_auth, round(h10.x, 9) AS salsa_hub "
        "FROM a10 JOIN h10 ON h10.vid = a10.vid"
    )


def _mis_key_sql(col: str) -> str:
    return f"md5(CAST({col} AS VARCHAR)) || lpad(CAST({col} AS VARCHAR), 20, '0')"


def _mis_sql(rounds: int = 12) -> str:
    """Unrolled deterministic-Luby MIS: round r's winners are active
    vertices whose md5 key beats every active neighbor's (or with no
    active neighbor); winners' neighbors drop out. ``rounds`` must exceed
    the data's true round count (measured 4 at sf0.01; extra rounds run
    on empty sets). Leftover actives after the unroll are deliberately
    NOT included, so an insufficient unroll mismatches loudly instead of
    silently accepting undecided vertices."""
    ctes = [
        f"e AS ({SQL_REL_EDGES})",
        "verts AS (SELECT DISTINCT vid FROM "
        "(SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "u0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM e WHERE src <> dst "
        "UNION SELECT dst AS u, src AS v FROM e WHERE src <> dst)",
        "a0 AS MATERIALIZED (SELECT vid FROM verts)",
    ]
    for r in range(rounds):
        ctes.append(
            f"nm{r} AS MATERIALIZED (SELECT u, min({_mis_key_sql('v')}) AS mk "
            f"FROM u{r} GROUP BY u)"
        )
        ctes.append(
            f"w{r} AS MATERIALIZED (SELECT a.vid FROM a{r} a LEFT JOIN nm{r} n ON n.u = a.vid "
            f"WHERE n.mk IS NULL OR {_mis_key_sql('a.vid')} < n.mk)"
        )
        ctes.append(
            f"x{r} AS MATERIALIZED (SELECT DISTINCT uu.v AS vid FROM u{r} uu "
            f"JOIN w{r} w ON uu.u = w.vid)"
        )
        ctes.append(
            f"a{r + 1} AS MATERIALIZED (SELECT vid FROM a{r} WHERE "
            f"vid NOT IN (SELECT vid FROM w{r}) AND vid NOT IN (SELECT vid FROM x{r}))"
        )
        ctes.append(
            f"u{r + 1} AS MATERIALIZED (SELECT u, v FROM u{r} "
            f"WHERE u IN (SELECT vid FROM a{r + 1}) AND v IN (SELECT vid FROM a{r + 1}))"
        )
    mis_union = " UNION ".join(f"SELECT vid FROM w{r}" for r in range(rounds))
    return (
        "WITH "
        + ", ".join(ctes)
        + f", mis AS ({mis_union}) "
        "SELECT v.vid, CAST(CASE WHEN m.vid IS NULL THEN 0 ELSE 1 END AS TINYINT) AS in_mis "
        "FROM verts v LEFT JOIN mis m ON m.vid = v.vid"
    )


def _coloring_sql(rounds: int = 22, max_colors: int = 64) -> str:
    """Unrolled deterministic Jones–Plassmann coloring over the
    sparsified rel graph (the _mis_sql device + a mex step): round r
    colors every uncolored vertex whose md5 key is minimal among its
    uncolored neighbors, with the smallest color its colored neighbors
    don't use (an anti-joined candidate cross-product — ``max_colors``
    must exceed the true chromatic usage, measured 6 at sf0.01).
    ``rounds`` must exceed the true round count (measured 15 at sf0.01;
    extra rounds run on empty sets). Leftover uncolored vertices after
    the unroll are deliberately omitted, so an insufficient unroll
    mismatches loudly."""
    key = _mis_key_sql
    ctes = [
        f"e AS (SELECT * FROM ({SQL_REL_EDGES}) WHERE (src + 7 * dst) % {COLORING_MOD} = 0)",
        "verts AS (SELECT DISTINCT vid FROM "
        "(SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "adj AS MATERIALIZED (SELECT src AS x, dst AS y FROM e WHERE src <> dst "
        "UNION SELECT dst AS x, src AS y FROM e WHERE src <> dst)",
        # isolated vertices (self-loops only) take color 0 up front
        "c0 AS MATERIALIZED (SELECT vid, CAST(0 AS BIGINT) AS color FROM verts "
        "WHERE vid NOT IN (SELECT x FROM adj))",
    ]
    for r in range(rounds):
        ctes.append(
            f"a{r} AS MATERIALIZED (SELECT vid FROM verts "
            f"WHERE vid NOT IN (SELECT vid FROM c{r}))"
        )
        ctes.append(
            f"nm{r} AS MATERIALIZED (SELECT adj.x AS vid, min({key('adj.y')}) AS mk FROM adj "
            f"WHERE adj.y NOT IN (SELECT vid FROM c{r}) GROUP BY adj.x)"
        )
        ctes.append(
            f"w{r} AS MATERIALIZED (SELECT a.vid FROM a{r} a LEFT JOIN nm{r} n ON n.vid = a.vid "
            f"WHERE n.mk IS NULL OR {key('a.vid')} < n.mk)"
        )
        ctes.append(
            f"used{r} AS MATERIALIZED (SELECT w.vid, c.color FROM w{r} w "
            f"JOIN adj ON adj.x = w.vid JOIN c{r} c ON c.vid = adj.y)"
        )
        ctes.append(
            f"mex{r} AS MATERIALIZED (SELECT w.vid, CAST(min(t.c) AS BIGINT) AS color "
            f"FROM w{r} w CROSS JOIN range(0, {max_colors}) t(c) "
            f"WHERE NOT EXISTS (SELECT 1 FROM used{r} uu WHERE uu.vid = w.vid AND uu.color = t.c) "
            f"GROUP BY w.vid)"
        )
        ctes.append(
            f"c{r + 1} AS MATERIALIZED (SELECT vid, color FROM c{r} "
            f"UNION ALL SELECT vid, color FROM mex{r})"
        )
    return "WITH " + ", ".join(ctes) + f" SELECT vid, color FROM c{rounds}"


def _kcore_sql(k: int = KCORE_K, rounds: int = 8, edges_prelude: str | None = None) -> str:
    """Unrolled peel: round r keeps vertices whose degree in the
    surviving simple undirected edge set is >= k. ``rounds`` must exceed
    the data's true peel-round count (measured 3 at sf0.001, 1 at
    sf0.01; extra rounds are no-ops at the fixpoint)."""
    # AS MATERIALIZED: DuckDB inlines plain CTEs, and every round
    # references the previous one three times (direct + two IN
    # subqueries) — inlined, the unrolled chain re-expands the base scan
    # 3^rounds times
    ctes = [
        edges_prelude or f"e AS ({SQL_REL_EDGES})",
        "u0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM e WHERE src <> dst "
        "UNION SELECT dst AS u, src AS v FROM e WHERE src <> dst)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"k{r} AS MATERIALIZED (SELECT u AS vid FROM u{r-1} GROUP BY u HAVING count(*) >= {k})"
        )
        ctes.append(
            f"u{r} AS MATERIALIZED (SELECT u, v FROM u{r-1} "
            f"WHERE u IN (SELECT vid FROM k{r}) AND v IN (SELECT vid FROM k{r}))"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT u AS vid, CAST(count(*) AS BIGINT) AS deg FROM u{rounds} GROUP BY u"
    )


def _katz10_sql() -> str:
    """Katz, 10 iterations: the PageRank recursion without the degree
    divide. x0 = beta = 1; x_k = 1 + 0.01 * sum_{u->v} x_{k-1}[u]."""
    ctes = [
        f"e AS ({SQL_REL_EDGES})",
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "r0 AS (SELECT vid, CAST(1.0 AS DOUBLE) AS r FROM verts)",
    ]
    for k in range(1, 11):
        ctes.append(
            f"r{k} AS (SELECT v.vid, 1.0 + 0.01 * coalesce(s.contrib, 0) AS r "
            f"FROM verts v LEFT JOIN (SELECT e.dst AS vid, sum(p.r) AS contrib "
            f"FROM e JOIN r{k-1} p ON p.vid = e.src "
            f"GROUP BY e.dst) s ON s.vid = v.vid)"
        )
    return "WITH " + ", ".join(ctes) + " SELECT vid, round(r, 7) AS katz FROM r10"


def _hitting8_sql() -> str:
    """Truncated hitting time, horizon 8, seeds vid%10==0:
    h0 = 0 for seeds else 8; h_k(v) = 0 for seeds, 8 if v has no
    out-edges, else least(8, 1 + avg over edge rows of h_{k-1}(dst)) —
    avg over rows = Σ mult·h / outdeg, the multigraph walk. Levels
    materialized (each is referenced by the next's join + NULL check)."""
    ctes = [
        f"e AS MATERIALIZED ({SQL_REL_EDGES})",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM "
        "(SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        f"h0 AS MATERIALIZED (SELECT vid, CASE WHEN vid % {HITTING_SEED_MOD} = 0 "
        f"THEN CAST(0.0 AS DOUBLE) ELSE CAST({HITTING_HORIZON}.0 AS DOUBLE) END AS h FROM verts)",
    ]
    for k in range(1, HITTING_HORIZON + 1):
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT v.vid, CASE "
            f"WHEN v.vid % {HITTING_SEED_MOD} = 0 THEN 0.0 "
            f"WHEN s.m IS NULL THEN {HITTING_HORIZON}.0 "
            f"ELSE least({HITTING_HORIZON}.0, 1.0 + s.m) END AS h "
            f"FROM verts v LEFT JOIN (SELECT e.src AS vid, avg(p.h) AS m "
            f"FROM e JOIN h{k-1} p ON p.vid = e.dst GROUP BY e.src) s "
            f"ON s.vid = v.vid)"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT vid, round(h, 7) AS hitting FROM h{HITTING_HORIZON}"
    )


def _eigen10_sql() -> str:
    """Eigenvector centrality, 10 L1-normalized power iterations:
    x_k[v] = (Σ_{u→v} x_{k-1}[u]) / (Σ x_{k-1}). Each level references
    r{k-1} twice (the contrib join + the norm scalar), so levels are
    MATERIALIZED to stop DuckDB re-expanding the tree 2^10-fold."""
    ctes = [
        f"e AS MATERIALIZED ({SQL_REL_EDGES})",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "r0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS r FROM verts)",
    ]
    for k in range(1, 11):
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT v.vid, "
            f"coalesce(s.contrib, 0) / (SELECT sum(p.r) FROM r{k-1} p) AS r "
            f"FROM verts v LEFT JOIN (SELECT e.dst AS vid, sum(p.r) AS contrib "
            f"FROM e JOIN r{k-1} p ON p.vid = e.src "
            f"GROUP BY e.dst) s ON s.vid = v.vid)"
        )
    return (
        "WITH " + ", ".join(ctes) + " SELECT vid, round(r, 7) AS eigenvector FROM r10"
    )


def _ppr10_sql() -> str:
    """Personalized PageRank, 10 iterations: identical recursion to
    _pagerank10_sql but teleport mass lands on the seed set
    (vid % PPR_SEED_MOD == 0) weighted 1/n_seeds instead of uniformly."""
    m = PPR_SEED_MOD
    ctes = [
        f"e AS ({SQL_REL_EDGES})",
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))",
        "deg AS (SELECT src AS vid, count(*) AS d FROM e GROUP BY src)",
        f"ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts WHERE vid % {m} = 0)",
        f"tele AS (SELECT vid, CASE WHEN vid % {m} = 0 THEN 1.0 / (SELECT n FROM ns) "
        "ELSE CAST(0 AS DOUBLE) END AS t FROM verts)",
        "r0 AS (SELECT vid, 0.15 * t AS r FROM tele)",
    ]
    for k in range(1, 11):
        ctes.append(
            f"r{k} AS (SELECT tele.vid, 0.15 * tele.t + 0.85 * coalesce(s.contrib, 0) AS r "
            f"FROM tele LEFT JOIN (SELECT e.dst AS vid, sum(p.r / deg.d) AS contrib "
            f"FROM e JOIN r{k-1} p ON p.vid = e.src JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) s ON s.vid = tele.vid)"
        )
    return "WITH " + ", ".join(ctes) + " SELECT vid, round(r, 9) AS ppr FROM r10"


# --- snapshot delta (daily recrawl diff) ------------------------------------
# Two deterministic snapshots derived from `documents`: "yesterday" (A) omits
# doc_id % SNAP_ADD_MOD == 3 (those appear today → added), "today" (B) omits
# doc_id % SNAP_DEL_MOD == 2 (→ removed) and revises the text of
# doc_id % SNAP_CHG_MOD == 1 (→ changed).
SNAP_ADD_MOD = 11
SNAP_DEL_MOD = 7
SNAP_CHG_MOD = 5
SNAP_REV_SUFFIX = " (rev2)"


def q_docs_snapshot_delta(sf_dir):
    """Daily-recrawl snapshot diff — the incremental-corpus companion to
    warm-start PageRank (`rel_pagerank_warm`) and incremental WCC: classify
    every url of two crawl snapshots as added / removed / changed /
    unchanged.

    Scale shape: document texts NEVER shuffle. Each side is reduced to
    (doc_id, md5(text), side) inside one map_batches pass (the 16-byte
    digest is the comparison key — the CDC/fingerprint convention; the
    per-doc md5 loop is inherent to hashing text, as in exact dedup), the
    tagged union is hash-bucketed by doc_id, and ONE vectorized pandas
    outer-merge per bucket classifies all of that bucket's ids. At 100 TB
    the exchange moves ~25 bytes/doc regardless of document size."""
    import hashlib

    from everythinggraph_ray.stages.agg import bucketed_reduce

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def sides(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        in_a = (ids % SNAP_ADD_MOD) != 3
        in_b = (ids % SNAP_DEL_MOD) != 2
        chg = (ids % SNAP_CHG_MOD) == 1
        h0 = [hashlib.md5((t or "").encode()).digest() for t in texts]
        hb = [
            hashlib.md5(((t or "") + SNAP_REV_SUFFIX).encode()).digest() if c else h
            for t, c, h in zip(texts, chg, h0)
        ]
        a_idx = np.flatnonzero(in_a)
        b_idx = np.flatnonzero(in_b)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([ids[a_idx], ids[b_idx]]), pa.int64()),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(len(a_idx), np.int8), np.ones(len(b_idx), np.int8)]
                    ),
                    pa.int8(),
                ),
                "h": pa.array(
                    [h0[i] for i in a_idx] + [hb[i] for i in b_idx], pa.binary()
                ),
            }
        )

    tagged = docs.map_batches(sides, batch_format="pyarrow")

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        a = df[df["side"] == 0][["doc_id", "h"]]
        b = df[df["side"] == 1][["doc_id", "h"]]
        m = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"))
        status = np.where(
            m["h_a"].isna(),
            "added",
            np.where(
                m["h_b"].isna(),
                "removed",
                np.where(m["h_a"] != m["h_b"], "changed", "unchanged"),
            ),
        )
        return pa.table(
            {
                "doc_id": pa.array(m["doc_id"].to_numpy(np.int64), pa.int64()),
                "status": pa.array(status.astype(object), pa.string()),
            }
        )

    return bucketed_reduce(tagged, bucket_of, red)


SQL_SNAPSHOT_DELTA = f"""
WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % {SNAP_ADD_MOD} <> 3),
     b AS (SELECT doc_id,
                  CASE WHEN doc_id % {SNAP_CHG_MOD} = 1 THEN text || '{SNAP_REV_SUFFIX}'
                       ELSE text END AS text
           FROM documents WHERE doc_id % {SNAP_DEL_MOD} <> 2)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN a.text <> b.text THEN 'changed'
            ELSE 'unchanged' END AS status
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
"""


ORACLES: dict[str, str] = {
    "rel_edges": SQL_REL_EDGES,
    "rel_degree": (
        f"WITH e AS ({SQL_REL_EDGES}) SELECT vid, CAST(sum(c) AS BIGINT) AS outdeg FROM "
        "(SELECT src AS vid, 1 AS c FROM e UNION ALL SELECT DISTINCT dst AS vid, 0 AS c FROM e) t "
        "GROUP BY vid"
    ),
    "rel_distinct_edges": f"WITH e AS ({SQL_REL_EDGES}) SELECT DISTINCT src, dst FROM e",
    "rel_top_outdegree": (
        f"WITH e AS ({SQL_REL_EDGES}), d AS (SELECT vid, CAST(sum(c) AS BIGINT) AS outdeg FROM "
        "(SELECT src AS vid, 1 AS c FROM e UNION ALL SELECT DISTINCT dst AS vid, 0 AS c FROM e) t "
        "GROUP BY vid) SELECT vid, outdeg FROM d ORDER BY outdeg DESC, vid LIMIT 20"
    ),
    "rel_pagerank10": _pagerank10_sql(),
    # pull cross-variant: same rule, same fixed-10 schedule, same rounding
    "rel_pagerank10_pull": _pagerank10_sql(),
    "rel_pagerank10_dangling": _pagerank10_dangling_sql(),
    "rel_ppr": _ppr10_sql(),
    "rel_katz10": _katz10_sql(),
    "rel_hitting8": _hitting8_sql(),
    "rel_percolation": (
        f"WITH RECURSIVE e AS ({SQL_REL_EDGES}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e "
        "WHERE src <> dst), "
        # non-recursive CTEs inside WITH RECURSIVE must avoid top-level
        # UNION (DuckDB gives it recursive-union semantics): DISTINCT
        # over UNION ALL in a subquery instead
        "verts AS (SELECT DISTINCT vid FROM "
        "(SELECT u AS vid FROM und UNION ALL SELECT v FROM und)), "
        "s AS (SELECT u, v FROM und WHERE "
        "CAST(md5_number_lower(CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)) AS HUGEINT) "
        "< 9223372036854775808), "
        "sund AS (SELECT DISTINCT u, v FROM "
        "(SELECT u, v FROM s UNION ALL SELECT v AS u, u AS v FROM s)), "
        "sverts AS (SELECT DISTINCT u AS vid FROM sund), "
        "r(vid, lab) AS (SELECT vid, vid FROM sverts UNION "
        "SELECT sund.v, r.lab FROM r JOIN sund ON sund.u = r.vid WHERE r.lab < sund.v), "
        "m AS (SELECT vid, min(lab) AS c FROM r GROUP BY vid), "
        "cs AS (SELECT c, count(*) AS n FROM m GROUP BY c) "
        "SELECT CAST((SELECT count(*) FROM verts) AS BIGINT) AS n_vertices, "
        "CAST((SELECT count(*) FROM cs) + (SELECT count(*) FROM verts) "
        "- (SELECT count(*) FROM m) AS BIGINT) AS n_components, "
        "CAST(greatest(coalesce((SELECT max(n) FROM cs), 0), "
        "CASE WHEN (SELECT count(*) FROM verts) > (SELECT count(*) FROM m) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS largest"
    ),
    "rel_latest_departure": (
        # time-reversed dual of rel_earliest_arrival: states (vid, dep)
        # are feasible leave times of temporal walks INTO the target;
        # the sentinel 10^15 plays the kernel's CAP at the target, max
        # per vid outside the recursion, target excluded from output.
        "WITH RECURSIVE e AS (SELECT l_orderkey % 1000 AS src, l_partkey % 1000 AS dst, "
        "CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS t "
        "FROM lineitem), "
        "r(vid, dep) AS (SELECT CAST(0 AS BIGINT), CAST(1000000000000000 AS BIGINT) UNION "
        "SELECT e.src, e.t FROM r JOIN e ON e.dst = r.vid AND e.t <= r.dep) "
        "SELECT vid, max(dep) AS departure FROM r WHERE vid <> 0 GROUP BY vid"
    ),
    "rel_earliest_arrival": (
        # time-respecting path enumeration: states (vid, arr) are the
        # arrival times of temporal walks; UNION dedups per round, the
        # state space is bounded by the distinct (dst, t) pairs of the
        # edge table, min per vid outside the recursion.
        "WITH RECURSIVE e AS (SELECT l_orderkey % 1000 AS src, l_partkey % 1000 AS dst, "
        "CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS t "
        "FROM lineitem), "
        "r(vid, arr) AS (SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT) UNION "
        "SELECT e.dst, e.t FROM r JOIN e ON e.src = r.vid AND e.t >= r.arr) "
        "SELECT vid, min(arr) AS arrival FROM r GROUP BY vid"
    ),

    "rel_eigen10": _eigen10_sql(),
    "rel_kcore": _kcore_sql(),
    "rel_hits10": _hits10_sql(),
    "rel_salsa10": _salsa10_sql(),
    "rel_wpagerank10": _wpagerank10_sql(),
    "rel_coarsen_wpr10": _coarsen_wpr10_sql(),
    "rel_matching": _matching_sql(),
    "rel_edge_support": _truss_sql()[0],
    "rel_ktruss": _truss_sql()[1],
    "rel_neighbor_sample": (
        f"WITH e AS ({SQL_REL_EDGES}), de AS (SELECT DISTINCT src, dst FROM e), "
        "h AS (SELECT src, dst, md5(CAST(src AS VARCHAR) || '_' || CAST(dst AS VARCHAR)) AS hh FROM de), "
        "r AS (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY hh, dst) AS rnk FROM h) "
        f"SELECT src, dst, rnk FROM r WHERE rnk <= {NEIGHBOR_SAMPLE_K}"
    ),
    # pull frontier cross-variants share the push oracles verbatim (same
    # fixpoint by construction; cross-checked mode-by-mode in pytest) —
    # filled in below after the push entries are defined
    "rel_wcc": (
        "WITH RECURSIVE "
        + _sql_graph_prelude(undirect=True)
        + ", r(vid, lab) AS (SELECT vid, vid FROM verts UNION "
        "SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v) "
        "SELECT v.vid, m.c AS component FROM verts v "
        "JOIN (SELECT vid, min(lab) AS c FROM r GROUP BY vid) m ON m.vid = v.vid"
    ),
    # directed mutual reachability: scc(v) = min vid u with paths v->u
    # and u->v (self included). Closure both ways over the deduped,
    # self-loop-free edge set; the vertex universe keeps every endpoint.
    "rel_scc": (
        "WITH RECURSIVE "
        + _sql_graph_prelude(no_self=True)
        + ", e3 AS (SELECT DISTINCT src, dst FROM e2)"
        ", r(s, d) AS (SELECT src, dst FROM e3 UNION "
        "SELECT r.s, e3.dst FROM r JOIN e3 ON e3.src = r.d)"
        ", m AS (SELECT r1.s AS v, r1.d AS u FROM r r1 "
        "JOIN r r2 ON r2.s = r1.d AND r2.d = r1.s) "
        "SELECT v.vid, CAST(least(v.vid, coalesce(min(m.u), v.vid)) AS BIGINT) AS scc "
        "FROM verts v LEFT JOIN m ON m.v = v.vid GROUP BY v.vid"
    ),
    "rel_wcc_stats": (
        "WITH RECURSIVE "
        + _sql_graph_prelude(undirect=True)
        + ", r(vid, lab) AS (SELECT vid, vid FROM verts UNION "
        "SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v)"
        ", comp AS (SELECT vid, min(lab) AS c FROM r GROUP BY vid)"
        ", sz AS (SELECT c, count(*) AS s FROM comp GROUP BY c) "
        "SELECT CAST(count(*) AS BIGINT) AS n_components, "
        "CAST(max(s) AS BIGINT) AS max_size FROM sz"
    ),
    "rel_sssp_maxdist": (
        "WITH RECURSIVE "
        + _sql_graph_prelude(no_self=True)
        + ", root AS (SELECT min(vid) AS rv FROM verts)"
        ", r(vid, d) AS (SELECT rv, CAST(0 AS BIGINT) FROM root UNION "
        "SELECT e2.dst, r.d + 1 FROM r JOIN e2 ON e2.src = r.vid WHERE r.d < 64)"
        ", m AS (SELECT vid, min(d) AS d FROM r GROUP BY vid) "
        "SELECT CAST(max(d) AS BIGINT) AS max_dist, "
        "CAST(count(*) AS BIGINT) AS n_reached FROM m"
    ),
    "rel_diameter_est": (
        "WITH RECURSIVE "
        + _sql_graph_prelude(undirect=True)
        + ", root AS (SELECT min(vid) AS rv FROM verts)"
        ", r1(vid, d) AS (SELECT rv, CAST(0 AS BIGINT) FROM root UNION "
        "SELECT und.v, r1.d + 1 FROM r1 JOIN und ON und.u = r1.vid WHERE r1.d < 64)"
        ", m1 AS (SELECT vid, min(d) AS d FROM r1 GROUP BY vid)"
        ", far AS (SELECT vid AS fv FROM m1 ORDER BY d DESC, vid LIMIT 1)"
        ", r2(vid, d) AS (SELECT fv, CAST(0 AS BIGINT) FROM far UNION "
        "SELECT und.v, r2.d + 1 FROM r2 JOIN und ON und.u = r2.vid WHERE r2.d < 64)"
        ", m2 AS (SELECT vid, min(d) AS d FROM r2 GROUP BY vid) "
        "SELECT (SELECT rv FROM root) AS start, (SELECT fv FROM far) AS far_vid, "
        "CAST(max(d) AS BIGINT) AS est_diameter FROM m2"
    ),
    "rel_landmark_dist": (
        "WITH RECURSIVE "
        + _sql_graph_prelude()
        + f", src{LANDMARKS_N} AS (SELECT vid FROM verts ORDER BY vid LIMIT {LANDMARKS_N})"
        ", r(s, vid, d) AS ("
        f"SELECT vid, vid, CAST(1 AS BIGINT) FROM src{LANDMARKS_N} UNION "
        "SELECT r.s, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.vid WHERE r.d < 64), "
        "m AS (SELECT s, vid, min(d) AS d FROM r GROUP BY s, vid), "
        f"samp AS (SELECT vid FROM verts WHERE vid % {LANDMARK_SAMPLE_MOD} = 0), "
        "pairs AS (SELECT a.vid AS u, b.vid AS w FROM samp a JOIN samp b ON a.vid < b.vid) "
        "SELECT p.u, p.w, CAST(min(ma.d - 1 + mb.d - 1) AS BIGINT) AS est_dist "
        "FROM pairs p JOIN m ma ON ma.vid = p.u JOIN m mb ON mb.vid = p.w AND mb.s = ma.s "
        "GROUP BY p.u, p.w"
    ),
    "rel_bfs": (
        "WITH RECURSIVE "
        + _sql_graph_prelude()
        + ", root AS (SELECT min(vid) AS rv FROM verts)"
        ", r(vid, d) AS (SELECT rv, CAST(1 AS BIGINT) FROM root UNION "
        "SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.vid WHERE r.d < 64) "
        "SELECT v.vid, coalesce(m.d, 0) AS dist FROM verts v "
        "LEFT JOIN (SELECT vid, min(d) AS d FROM r GROUP BY vid) m ON m.vid = v.vid"
    ),
    # MS-BFS reachability mask: seed (i, vid) per source, saturate the
    # distinct (i, vid) reach set, sum 2^i per vid (each i once: UNION
    # is distinct). No depth cap needed — reachability, not distance.
    "rel_msbfs": (
        "WITH RECURSIVE "
        + _sql_graph_prelude()
        + ", srcs AS (SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS i "
        "FROM (SELECT vid FROM verts ORDER BY vid LIMIT 8))"
        ", r(i, vid) AS (SELECT i, vid FROM srcs UNION "
        "SELECT r.i, e.dst FROM r JOIN e ON e.src = r.vid) "
        "SELECT v.vid, coalesce(m.mask, 0) AS mask FROM verts v LEFT JOIN "
        "(SELECT vid, CAST(sum(CAST(1 AS BIGINT) << i) AS BIGINT) AS mask "
        "FROM r GROUP BY vid) m ON m.vid = v.vid"
    ),
    # per-source BFS level histogram (levels > 0; level = hop distance,
    # same 64-hop safety cap as rel_bfs)
    "rel_msbfs_levels": (
        "WITH RECURSIVE "
        + _sql_graph_prelude()
        + ", srcs AS (SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS i "
        "FROM (SELECT vid FROM verts ORDER BY vid LIMIT 8))"
        ", r(i, vid, d) AS (SELECT i, vid, CAST(0 AS BIGINT) FROM srcs UNION "
        "SELECT r.i, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.vid WHERE r.d < 64)"
        ", m AS (SELECT i, vid, min(d) AS d FROM r GROUP BY i, vid) "
        "SELECT s.vid AS source, m.d AS level, CAST(count(*) AS BIGINT) AS reached "
        "FROM m JOIN srcs s ON s.i = m.i WHERE m.d > 0 GROUP BY s.vid, m.d"
    ),
    # closeness of the MS-BFS sources from the same level histogram;
    # closeness = n_reached / total_dist is ONE int64/int64 division
    "rel_closeness": (
        "WITH RECURSIVE "
        + _sql_graph_prelude()
        + ", srcs AS (SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS i "
        "FROM (SELECT vid FROM verts ORDER BY vid LIMIT 8))"
        ", r(i, vid, d) AS (SELECT i, vid, CAST(0 AS BIGINT) FROM srcs UNION "
        "SELECT r.i, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.vid WHERE r.d < 64)"
        ", m AS (SELECT i, vid, min(d) AS d FROM r GROUP BY i, vid) "
        "SELECT s.vid AS source, "
        "CAST(coalesce(sum(CASE WHEN m.d > 0 THEN 1 END), 0) AS BIGINT) AS n_reached, "
        "CAST(coalesce(sum(m.d), 0) AS BIGINT) AS total_dist, "
        "CASE WHEN coalesce(sum(m.d), 0) > 0 THEN "
        "CAST(coalesce(sum(CASE WHEN m.d > 0 THEN 1 END), 0) AS DOUBLE) / CAST(sum(m.d) AS DOUBLE) "
        "ELSE 0.0 END AS closeness "
        "FROM srcs s LEFT JOIN m ON m.i = s.i GROUP BY s.vid ORDER BY s.vid"
    ),
    # truncated Brandes betweenness, unrolled sigma/delta levels
    "rel_betweenness": _betweenness_sql(),
    # harmonic centrality + eccentricity of the MS-BFS sources; the
    # integer-scaled harmonic (floor div by level) is exact on both sides
    "rel_harmonic": (
        "WITH RECURSIVE "
        + _sql_graph_prelude()
        + ", srcs AS (SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS i "
        "FROM (SELECT vid FROM verts ORDER BY vid LIMIT 8))"
        ", r(i, vid, d) AS (SELECT i, vid, CAST(0 AS BIGINT) FROM srcs UNION "
        "SELECT r.i, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.vid WHERE r.d < 64)"
        ", m AS (SELECT i, vid, min(d) AS d FROM r GROUP BY i, vid) "
        "SELECT s.vid AS source, "
        "CAST(coalesce(max(m.d), 0) AS BIGINT) AS ecc, "
        "CAST(coalesce(sum(CASE WHEN m.d > 0 THEN 720720 // m.d END), 0) AS BIGINT) "
        "AS harmonic_x720720, "
        "CAST(coalesce(sum(CASE WHEN m.d > 0 THEN 720720 // m.d END), 0) AS DOUBLE) "
        "/ 720720.0 AS harmonic "
        "FROM srcs s LEFT JOIN m ON m.i = s.i GROUP BY s.vid ORDER BY s.vid"
    ),
    "rel_sssp_hops": (
        "WITH RECURSIVE "
        + _sql_graph_prelude(no_self=True)
        + ", root AS (SELECT min(vid) AS rv FROM verts)"
        ", r(vid, d) AS (SELECT rv, CAST(0 AS BIGINT) FROM root UNION "
        "SELECT e2.dst, r.d + 1 FROM r JOIN e2 ON e2.src = r.vid WHERE r.d < 64) "
        "SELECT v.vid, coalesce(m.d, 9223372036854775807) AS dist FROM verts v "
        "LEFT JOIN (SELECT vid, min(d) AS d FROM r GROUP BY vid) m ON m.vid = v.vid"
    ),
    # parent = min{u : dist[u]+1 == dist[v], edge u→v} (BFS-wavefront
    # closed form, see ParentSSSPHopsKernel); root's parent is itself
    "rel_sssp_parent": (
        "WITH RECURSIVE "
        + _sql_graph_prelude(no_self=True)
        + ", root AS (SELECT min(vid) AS rv FROM verts)"
        ", r(vid, d) AS (SELECT rv, CAST(0 AS BIGINT) FROM root UNION "
        "SELECT e2.dst, r.d + 1 FROM r JOIN e2 ON e2.src = r.vid WHERE r.d < 64)"
        ", m AS (SELECT vid, min(d) AS d FROM r GROUP BY vid)"
        ", par AS (SELECT e2.dst AS vid, CAST(min(e2.src) AS BIGINT) AS parent "
        "FROM e2 JOIN m mu ON mu.vid = e2.src JOIN m mv ON mv.vid = e2.dst "
        "WHERE mv.d = mu.d + 1 GROUP BY e2.dst) "
        "SELECT v.vid, coalesce(m.d, 9223372036854775807) AS dist, "
        "CASE WHEN v.vid = (SELECT rv FROM root) THEN v.vid "
        "WHEN m.d IS NULL THEN -1 ELSE p.parent END AS parent "
        "FROM verts v LEFT JOIN m ON m.vid = v.vid LEFT JOIN par p ON p.vid = v.vid"
    ),
    # deterministic-Luby MIS, unrolled rounds (md5-key rule shared
    # verbatim with graph/mis.py)
    "rel_mis": _mis_sql(),
    "rel_coloring": _coloring_sql(),
    # deterministic walks: unrolled per-step successor CTEs sharing the
    # md5(f"{step}:{u}:{v}") rule verbatim with stages/walk.py
    "rel_walks": _walks_sql(),
    # common neighbors over the distinct undirected adjacency; the
    # NOT EXISTS is linkpred's in-bucket anti-join
    "rel_butterflies": (
        f"WITH d AS (SELECT DISTINCT src, dst FROM ({SQL_REL_EDGES})), "
        "cc AS (SELECT e1.dst AS a, e2.dst AS b, count(*) AS cnt "
        "FROM d e1 JOIN d e2 ON e1.src = e2.src AND e1.dst < e2.dst GROUP BY e1.dst, e2.dst) "
        "SELECT CAST(coalesce(sum(cnt * (cnt - 1) // 2), 0) AS BIGINT) AS butterflies FROM cc"
    ),
    "rel_cocitation": (
        f"WITH d AS (SELECT DISTINCT src, dst FROM ({SQL_REL_EDGES})) "
        "SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS cnt "
        "FROM d e1 JOIN d e2 ON e1.src = e2.src AND e1.dst < e2.dst "
        "GROUP BY e1.dst, e2.dst ORDER BY cnt DESC, a, b LIMIT 20"
    ),
    "rel_coupling": (
        f"WITH d AS (SELECT DISTINCT src, dst FROM ({SQL_REL_EDGES})) "
        "SELECT e1.src AS a, e2.src AS b, CAST(count(*) AS BIGINT) AS cnt "
        "FROM d e1 JOIN d e2 ON e1.dst = e2.dst AND e1.src < e2.src "
        "GROUP BY e1.src, e2.src ORDER BY cnt DESC, a, b LIMIT 20"
    ),
    "rel_link_predict": (
        "WITH "
        + _sql_graph_prelude(undirect=True)
        + ", cedge AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM e WHERE src <> dst)"
        ", w AS (SELECT n1.v AS a, n2.v AS b, CAST(count(*) AS BIGINT) AS cnt "
        "FROM und n1 JOIN und n2 ON n1.u = n2.u AND n1.v < n2.v GROUP BY n1.v, n2.v) "
        "SELECT a, b, cnt FROM w WHERE NOT EXISTS "
        "(SELECT 1 FROM cedge WHERE cedge.a = w.a AND cedge.b = w.b) "
        "ORDER BY cnt DESC, a, b LIMIT 20"
    ),
    "rel_link_predict_jaccard": (
        "WITH "
        + _sql_graph_prelude(undirect=True)
        + ", cedge AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM e WHERE src <> dst)"
        ", degt AS (SELECT u AS vid, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY u)"
        ", w AS (SELECT n1.v AS a, n2.v AS b, CAST(count(*) AS BIGINT) AS cnt "
        "FROM und n1 JOIN und n2 ON n1.u = n2.u AND n1.v < n2.v GROUP BY n1.v, n2.v)"
        ", j AS (SELECT w.a, w.b, w.cnt, "
        "CAST(w.cnt AS DOUBLE) / CAST(da.deg + db.deg - w.cnt AS DOUBLE) AS jaccard "
        "FROM w JOIN degt da ON da.vid = w.a JOIN degt db ON db.vid = w.b "
        "WHERE NOT EXISTS (SELECT 1 FROM cedge WHERE cedge.a = w.a AND cedge.b = w.b)) "
        "SELECT a, b, cnt, jaccard FROM j ORDER BY jaccard DESC, a, b LIMIT 20"
    ),
    # float expression mirrors q_rel_assortativity op-for-op (same IEEE
    # tree): n*sxy - sx*sy over sqrt(n*sx2 - sx^2)*sqrt(n*sy2 - sy^2)
    "rel_assortativity": (
        "WITH "
        + _sql_graph_prelude()
        + ", od AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src)"
        ", ideg AS (SELECT dst AS vid, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY dst)"
        ", j AS (SELECT o.d AS x, i.d AS y FROM e "
        "JOIN od o ON o.vid = e.src JOIN ideg i ON i.vid = e.dst)"
        ", s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, "
        "CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy, "
        "CAST(sum(x*x) AS BIGINT) AS sx2, CAST(sum(y*y) AS BIGINT) AS sy2 FROM j) "
        "SELECT n AS n_edges, sx AS sum_x, sy AS sum_y, sxy AS sum_xy, "
        "sx2 AS sum_x2, sy2 AS sum_y2, "
        "CASE WHEN (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0 "
        "AND (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0 "
        "THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "(sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * "
        "sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) "
        "ELSE 0.0 END AS assortativity FROM s"
    ),
    "rel_spmv": (
        "WITH "
        + _sql_graph_prelude()
        + ", s AS (SELECT dst AS vid, sum(0.001 * src) AS y FROM e GROUP BY dst) "
        "SELECT v.vid, round(coalesce(s.y, 0.0), 6) AS y FROM verts v "
        "LEFT JOIN s ON s.vid = v.vid"
    ),
    "rel_wcc_dataset": (
        "WITH RECURSIVE "
        + _sql_graph_prelude(undirect=True)
        + ", r(vid, lab) AS (SELECT vid, vid FROM verts UNION "
        "SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v) "
        "SELECT v.vid, m.c AS component FROM verts v "
        "JOIN (SELECT vid, min(lab) AS c FROM r GROUP BY vid) m ON m.vid = v.vid"
    ),
    # labelprop with default (empty) seeds is IDENTICAL to wcc by
    # construction (LabelPropKernel inits labels to own vid) — so it shares
    # wcc's recursive-CTE oracle, aliased to its own column name
    "rel_labelprop": (
        "WITH RECURSIVE "
        + _sql_graph_prelude(undirect=True)
        + ", r(vid, lab) AS (SELECT vid, vid FROM verts UNION "
        "SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v) "
        "SELECT v.vid, m.c AS label FROM verts v "
        "JOIN (SELECT vid, min(lab) AS c FROM r GROUP BY vid) m ON m.vid = v.vid"
    ),
    # seeded labelprop: init labels -vid for vid<10 (the seeds), own vid
    # otherwise; min-propagation over the undirected graph
    "rel_labelprop_seeded": (
        "WITH RECURSIVE "
        + _sql_graph_prelude(undirect=True)
        + ", r(vid, lab) AS (SELECT vid, CASE WHEN vid < 10 THEN -vid ELSE vid END "
        "FROM verts UNION SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid "
        "WHERE r.lab < CASE WHEN und.v < 10 THEN -und.v ELSE und.v END) "
        "SELECT v.vid, m.c AS label FROM verts v "
        "JOIN (SELECT vid, min(lab) AS c FROM r GROUP BY vid) m ON m.vid = v.vid"
    ),
    # weighted SSSP: weights are the reference's synthesized
    # src%10 + dst%10 (init_all.c:663-666) — pure SQL. Bounded relax
    # enumeration: every path with total weight <= 1152 is enumerated
    # ((vid, d) states dedup via UNION; zero-weight cycles repeat a state
    # and stop). 1152 = 18 (max weight) x 64 (the hop-dist cap proven safe
    # by rel_sssp_hops) bounds the optimum INCLUSIVELY, so the predicate
    # must be <=, not < (a shortest path of weight exactly 1152 would
    # otherwise be excluded — round-2 ADVICE boundary fix).
    "rel_sssp_weighted": (
        "WITH RECURSIVE "
        + _sql_graph_prelude()
        + ", ew AS (SELECT src, dst, CAST(src % 10 + dst % 10 AS DOUBLE) AS w "
        "FROM e WHERE src <> dst)"
        ", root AS (SELECT min(vid) AS rv FROM verts)"
        ", r(vid, d) AS (SELECT rv, CAST(0 AS DOUBLE) FROM root UNION "
        "SELECT ew.dst, r.d + ew.w FROM r JOIN ew ON ew.src = r.vid "
        "WHERE r.d + ew.w <= 1152) "
        "SELECT v.vid, round(coalesce(m.d, CAST('infinity' AS DOUBLE)), 6) AS dist "
        "FROM verts v LEFT JOIN (SELECT vid, min(d) AS d FROM r GROUP BY vid) m "
        "ON m.vid = v.vid"
    ),
    # widest (bottleneck) path: max–min semiring. The recursion's state
    # space (vid, c) is FINITE — c ∈ {10^18} ∪ {0..18} — so UNION dedup
    # terminates without a path-weight bound (capacities only shrink
    # along a path, so cycles repeat states and stop). All values exact
    # in DOUBLE; unreached surfaces as −1 on both sides.
    "rel_widest": (
        "WITH RECURSIVE "
        + _sql_graph_prelude()
        + ", ew AS (SELECT src, dst, CAST(src % 10 + dst % 10 AS DOUBLE) AS w "
        "FROM e WHERE src <> dst)"
        ", root AS (SELECT min(vid) AS rv FROM verts)"
        ", r(vid, c) AS (SELECT rv, CAST(1000000000000000000 AS DOUBLE) FROM root "
        "UNION SELECT ew.dst, least(r.c, ew.w) FROM r JOIN ew ON ew.src = r.vid) "
        "SELECT v.vid, coalesce(m.c, CAST(-1 AS DOUBLE)) AS capacity "
        "FROM verts v LEFT JOIN (SELECT vid, max(c) AS c FROM r GROUP BY vid) m "
        "ON m.vid = v.vid"
    ),
    # longest-path depth on the degree-orientation DAG: the recursion
    # enumerates (vid, depth) pairs — bounded by V × (max depth + 1)
    # because UNION dedups and the orientation is acyclic by the strict
    # (degree, vid) total order. Tie order matches the engine: a < b
    # always, so u = a exactly when deg(a) <= deg(b).
    "rel_dag_depth": (
        f"WITH RECURSIVE e AS ({SQL_REL_EDGES}), "
        "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM e WHERE src <> dst), "
        "deg AS (SELECT vid, count(*) AS d FROM "
        "(SELECT a AS vid FROM und UNION ALL SELECT b AS vid FROM und) GROUP BY vid), "
        "dag AS (SELECT CASE WHEN da.d <= db.d THEN u.a ELSE u.b END AS u, "
        "CASE WHEN da.d <= db.d THEN u.b ELSE u.a END AS v "
        "FROM und u JOIN deg da ON da.vid = u.a JOIN deg db ON db.vid = u.b), "
        "r(vid, dpt) AS (SELECT vid, 0 FROM deg "
        "UNION SELECT dag.v, r.dpt + 1 FROM r JOIN dag ON dag.u = r.vid) "
        "SELECT vid, CAST(max(dpt) AS BIGINT) AS depth FROM r GROUP BY vid"
    ),
    "rel_spmv_edgecentric": (
        "WITH "
        + _sql_graph_prelude()
        + ", s AS (SELECT src AS vid, CAST(sum(dst) AS BIGINT) AS y FROM e GROUP BY src) "
        "SELECT v.vid, coalesce(s.y, 0) AS y FROM verts v LEFT JOIN s ON s.vid = v.vid"
    ),
    "rel_triangles_sampled": (
        f"WITH e AS ({SQL_REL_EDGES}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e "
        "WHERE src <> dst), "
        "s AS (SELECT u, v FROM und WHERE "
        "CAST(md5_number_lower(CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)) AS HUGEINT) "
        "< 9223372036854775808), "
        "t AS (SELECT count(*) AS n FROM s a "
        "JOIN s b ON b.u = a.v JOIN s c ON c.u = a.u AND c.v = b.v) "
        "SELECT CAST(n AS BIGINT) AS tri_sampled, CAST(n * 8 AS BIGINT) AS estimate FROM t"
    ),
    "rel_4cliques": (
        f"WITH e AS ({SQL_REL_EDGES}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e "
        "WHERE src <> dst) "
        "SELECT count(*) AS k4 FROM und ab "
        "JOIN und ac ON ac.u = ab.u AND ac.v > ab.v "
        "JOIN und ad ON ad.u = ab.u AND ad.v > ac.v "
        "JOIN und bc ON bc.u = ab.v AND bc.v = ac.v "
        "JOIN und bd ON bd.u = ab.v AND bd.v = ad.v "
        "JOIN und cd ON cd.u = ac.v AND cd.v = ad.v"
    ),
    "rel_reciprocity": (
        f"WITH d AS (SELECT DISTINCT src, dst FROM ({SQL_REL_EDGES}) WHERE src <> dst) "
        "SELECT CAST((SELECT count(*) FROM d a JOIN d b ON b.src = a.dst AND b.dst = a.src) AS BIGINT) AS n_recip, "
        "CAST((SELECT count(*) FROM d) AS BIGINT) AS n_edges, "
        "CAST((SELECT count(*) FROM d a JOIN d b ON b.src = a.dst AND b.dst = a.src) AS DOUBLE) "
        "/ (SELECT count(*) FROM d) AS reciprocity"
    ),
    "rel_transitivity": (
        f"WITH e AS ({SQL_REL_EDGES}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e "
        "WHERE src <> dst), "
        "tri AS (SELECT count(*) AS t FROM und a "
        "JOIN und b ON b.u = a.v JOIN und c ON c.u = a.u AND c.v = b.v), "
        "deg AS (SELECT vid, count(*) AS c FROM "
        "(SELECT u AS vid FROM und UNION ALL SELECT v AS vid FROM und) GROUP BY vid), "
        "w AS (SELECT sum(c * (c - 1) // 2) AS wedges FROM deg) "
        "SELECT CAST(tri.t AS BIGINT) AS triangles, CAST(w.wedges AS BIGINT) AS wedges, "
        "3.0 * tri.t / w.wedges AS transitivity FROM tri, w"
    ),
    "rel_richclub": (
        f"WITH e AS ({SQL_REL_EDGES}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e "
        "WHERE src <> dst), "
        "deg AS (SELECT vid, count(*) AS c FROM "
        "(SELECT u AS vid FROM und UNION ALL SELECT v AS vid FROM und) GROUP BY vid), "
        f"rich AS (SELECT vid FROM deg WHERE c > {RICH_CLUB_K}), "
        "nr AS (SELECT count(*) AS n FROM rich), "
        "er AS (SELECT count(*) AS e FROM und WHERE u IN (SELECT vid FROM rich) "
        "AND v IN (SELECT vid FROM rich)) "
        "SELECT CAST(nr.n AS BIGINT) AS n_rich, CAST(er.e AS BIGINT) AS e_rich, "
        "CASE WHEN nr.n > 1 THEN 2.0 * er.e / (nr.n * (nr.n - 1)) ELSE 0.0 END AS phi "
        "FROM nr, er"
    ),
    "rel_triangles": (
        f"WITH e AS ({SQL_REL_EDGES}), "
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e "
        "WHERE src <> dst) "
        "SELECT count(*) AS n_triangles FROM und a "
        "JOIN und b ON b.u = a.v JOIN und c ON c.u = a.u AND c.v = b.v"
    ),
    # exact 2-hop neighborhood size (ANF's h=2 exact baseline)
    "rel_two_hop_count": (
        f"WITH e AS ({SQL_REL_EDGES}), "
        "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM e WHERE src <> dst), "
        "sym AS (SELECT a AS m, b AS n FROM und UNION ALL SELECT b AS m, a AS n FROM und), "
        "r AS (SELECT m AS v, n AS u FROM sym "
        "UNION SELECT s1.n AS v, s2.n AS u FROM sym s1 "
        "JOIN sym s2 ON s2.m = s1.m WHERE s2.n <> s1.n) "
        "SELECT v AS vid, CAST(count(*) AS BIGINT) AS n_2hop FROM r GROUP BY v"
    ),
    # directed triads: transitive tuples are uniquely labeled; cyclic
    # closed walks count each triangle 3x (rotations), hence // 3
    "rel_triad_census": (
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({SQL_REL_EDGES}) WHERE src <> dst), "
        "w AS (SELECT e1.src AS a, e2.dst AS c FROM e e1 "
        "JOIN e e2 ON e2.src = e1.dst WHERE e1.src <> e2.dst) "
        "SELECT CAST((SELECT count(*) FROM w JOIN e ON e.src = w.a AND e.dst = w.c) AS BIGINT) AS n_trans, "
        "CAST((SELECT count(*) FROM w JOIN e ON e.src = w.c AND e.dst = w.a) AS BIGINT) // 3 AS n_cyclic"
    ),
    # 4-cycles: the diagonal-pair identity — every cycle a–x–b–y is
    # counted by both its diagonals, hence the integer halve
    "rel_4cycles": (
        f"WITH e AS ({SQL_REL_EDGES}), "
        "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e "
        "WHERE src <> dst), "
        "sym AS (SELECT a AS m, b AS n FROM und UNION ALL SELECT b AS m, a AS n FROM und), "
        "w AS (SELECT x.n AS a, y.n AS b, count(*) AS w FROM sym x "
        "JOIN sym y ON x.m = y.m AND x.n < y.n GROUP BY x.n, y.n) "
        "SELECT CAST(sum(w * (w - 1) // 2) // 2 AS BIGINT) AS c4 FROM w"
    ),
    # per-vertex triangles: each x<y<z triangle credits its 3 corners;
    # lcc = tri / (deg*(deg-1)//2) is one int/int IEEE division (exact
    # on both sides — no rounding needed)
    "rel_lcc": (
        f"WITH e AS ({SQL_REL_EDGES}), "
        "ed AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e "
        "WHERE src <> dst), "
        "deg AS (SELECT v AS vid, CAST(count(*) AS BIGINT) AS deg FROM "
        "(SELECT a AS v FROM ed UNION ALL SELECT b FROM ed) GROUP BY v), "
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM ed e1 "
        "JOIN ed e2 ON e2.a = e1.b JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b), "
        "cr AS (SELECT x AS vid FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri), "
        "tc AS (SELECT vid, CAST(count(*) AS BIGINT) AS tri FROM cr GROUP BY vid) "
        "SELECT d.vid, d.deg, coalesce(t.tri, 0) AS tri, "
        "CASE WHEN d.deg > 1 THEN CAST(coalesce(t.tri, 0) AS DOUBLE) / (d.deg * (d.deg - 1) // 2) "
        "ELSE 0.0 END AS lcc "
        "FROM deg d LEFT JOIN tc t ON t.vid = d.vid"
    ),
    "doc_stats": (
        r"SELECT doc_id, length(text) AS n_chars_calc, "
        r"CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens, "
        r"CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct, "
        r"CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|a|to|in|is)\b')) AS BIGINT) AS n_stop "
        r"FROM documents"
    ),
    "docs_exact_dedup": (
        "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, count(*) AS n_copies "
        "FROM documents GROUP BY text"
    ),
    "docs_quality": (
        r"WITH s AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS nc, "
        r"CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS nt0, "
        r"CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS np_, "
        r"CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|a|to|in|is)\b')) AS DOUBLE) AS ns "
        r"FROM documents) "
        r"SELECT doc_id, round(0.4 * least(nc / 1000.0, 1.0) "
        r"+ 0.3 * greatest(least(1.0 - abs(np_ / greatest(nt0, 1.0) - 0.1) * 2.0, 1.0), 0.0) "
        r"+ 0.3 * least(ns / greatest(nt0, 1.0) * 4.0, 1.0), 8) AS quality FROM s"
    ),
    "docs_lang_counts": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
    "docs_top_quality_per_lang": (
        r"WITH s AS (SELECT doc_id, lang, CAST(length(text) AS DOUBLE) AS nc, "
        r"CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS nt0, "
        r"CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS np_, "
        r"CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|a|to|in|is)\b')) AS DOUBLE) AS ns "
        r"FROM documents), "
        r"q AS (SELECT lang, doc_id, round(0.4 * least(nc / 1000.0, 1.0) "
        r"+ 0.3 * greatest(least(1.0 - abs(np_ / greatest(nt0, 1.0) - 0.1) * 2.0, 1.0), 0.0) "
        r"+ 0.3 * least(ns / greatest(nt0, 1.0) * 4.0, 1.0), 8) AS quality FROM s) "
        r"SELECT lang, doc_id, quality, CAST(row_number() OVER "
        r"(PARTITION BY lang ORDER BY quality DESC, doc_id) AS BIGINT) AS rk "
        r"FROM q QUALIFY rk <= 5"
    ),
    # fingerprint = md5 of the whitespace-normalized text: both sides RE2
    # + md5, so the hex strings hash-compare exactly
    "docs_fingerprint": (
        r"SELECT doc_id, md5(array_to_string(regexp_extract_all(text, '\S+'), ' ')) "
        r"AS fingerprint FROM documents"
    ),
    # language-ID: per-language stopword-profile hit counts (RE2 both
    # sides), argmax with alphabetical tiebreak (numpy argmax picks the
    # first of the sorted lang list), 'und' when no profile hits or the
    # doc has < 3 tokens — the exact LangIdStage rule
    "docs_langid": (
        "WITH s AS (SELECT doc_id, lower(text) AS lt, "
        r"CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS nt FROM documents), "
        "c AS (SELECT doc_id, nt, "
        + ", ".join(
            f"CAST(len(regexp_extract_all(lt, '{_LANGID_PROFILES[lg]}')) AS BIGINT) AS {lg}"
            for lg in sorted(_LANGID_PROFILES)
        )
        + " FROM s), "
        "u AS (SELECT doc_id, nt, lang, cnt FROM c UNPIVOT (cnt FOR lang IN ("
        + ", ".join(sorted(_LANGID_PROFILES))
        + "))), "
        "r AS (SELECT doc_id, nt, lang, cnt, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY cnt DESC, lang) AS rk FROM u) "
        "SELECT doc_id, CASE WHEN nt < 3 OR cnt = 0 THEN 'und' ELSE lang END AS lang_pred "
        "FROM r WHERE rk = 1"
    ),
    # bigram LM scoring: cb/cu/B are exact integer counts; the per-doc
    # sum of ln-terms carries the repo-wide round(·, 7) parity device
    "docs_bigram_lm": (
        "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts "
        "FROM documents), "
        "bi AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2 FROM "
        "(SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks)), "
        "cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2), "
        "cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM cb GROUP BY w1), "
        "bsz AS (SELECT count(*) AS b FROM cb), "
        "sc AS (SELECT bi.doc_id, count(*) AS n, "
        "sum(ln(cb.cb + 1.0) - ln(cu.cu + bsz.b)) AS lp "
        "FROM bi JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN bsz "
        "GROUP BY bi.doc_id) "
        "SELECT d.doc_id, CAST(coalesce(sc.n, 0) AS BIGINT) AS n_bigrams, "
        "round(coalesce(sc.lp, 0), 7) AS logprob "
        "FROM documents d LEFT JOIN sc USING (doc_id)"
    ),
    "docs_lang_entropy": (
        r"WITH tok AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents), "
        r"cnt AS (SELECT lang, t, count(*) AS n FROM tok GROUP BY lang, t), "
        r"s AS (SELECT lang, sum(n) AS N, sum(n * ln(n)) AS snln FROM cnt GROUP BY lang) "
        r"SELECT lang, CAST(N AS BIGINT) AS n_tokens, round(ln(N) - snln / N, 7) AS entropy FROM s"
    ),
    "docs_top_tokens_per_lang": (
        r"WITH tok AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents), "
        r"cnt AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY lang, t) "
        r"SELECT lang, t AS token, n, "
        r"CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, t) AS BIGINT) AS rank "
        r"FROM cnt QUALIFY rank <= 10"
    ),
    "docs_top_tokens": (
        r"SELECT t AS token, count(*) AS n FROM "
        r"(SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents) "
        r"GROUP BY t ORDER BY n DESC, token LIMIT 50"
    ),
    # IVF probing all centroids is exact → shares the brute-force oracle
    "knn_ivf_top10": (
        f"WITH q AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {KNN_QUERIES}) "
        "SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, "
        "e.vec_id) AS BIGINT) AS rank "
        "FROM q, embeddings e WHERE e.vec_id <> q.vec_id "
        "QUALIFY rank <= " + str(KNN_K)
    ),
    "knn_top10": (
        f"WITH q AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {KNN_QUERIES}) "
        "SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, "
        "e.vec_id) AS BIGINT) AS rank "
        "FROM q, embeddings e WHERE e.vec_id <> q.vec_id "
        "QUALIFY rank <= " + str(KNN_K)
    ),
    "orders_monthly_growth": (
        "WITH m AS (SELECT CAST(datediff('month', DATE '1970-01-01', "
        "CAST(o_orderdate AS DATE)) AS BIGINT) AS month, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), "
        "g AS (SELECT month, CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(cents) AS BIGINT) AS rev_cents FROM m GROUP BY month) "
        "SELECT month, n_orders, rev_cents, "
        "CAST(COALESCE(lag(rev_cents) OVER (ORDER BY month), 0) AS BIGINT) AS prev_rev, "
        "CAST(rev_cents - COALESCE(lag(rev_cents) OVER (ORDER BY month), 0) AS BIGINT) AS delta "
        "FROM g"
    ),
    "docs_profile": (
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(*) FILTER (text IS NULL) AS BIGINT) AS null_text, "
        "CAST(count(*) FILTER (lang IS NULL) AS BIGINT) AS null_lang, "
        "CAST(count(*) FILTER (source IS NULL) AS BIGINT) AS null_source, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, "
        "CAST(count(DISTINCT source) AS BIGINT) AS n_sources, "
        "CAST(min(length(coalesce(text, ''))) AS BIGINT) AS len_min, "
        "CAST(max(length(coalesce(text, ''))) AS BIGINT) AS len_max, "
        "CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS len_sum "
        "FROM documents"
    ),
    "docs_hapax": (
        r"WITH tok AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents), "
        r"cnt AS (SELECT lang, t, count(*) AS n FROM tok GROUP BY lang, t) "
        r"SELECT lang, CAST(count(*) AS BIGINT) AS vocab, "
        r"CAST(count(*) FILTER (n = 1) AS BIGINT) AS hapax, "
        r"CAST(sum(n) AS BIGINT) AS total FROM cnt GROUP BY lang"
    ),
    "lineitem_ols": (
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy, "
        "CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx, "
        "CAST(sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "q22_lost_customers": (
        "WITH c AS (SELECT c_custkey, c_nationkey, "
        "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_u FROM customer), "
        "s AS (SELECT sum(bal_u) AS su, count(*) AS cnt FROM c WHERE bal_u > 0), "
        "k AS (SELECT c.* FROM c, s WHERE c.bal_u * s.cnt > s.su AND NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)) "
        "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust, "
        "CAST(sum(bal_u) AS BIGINT) AS total_bal_u FROM k GROUP BY c_nationkey"
    ),
    "events_mad": (
        "WITH v AS (SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS vu FROM events), "
        "m AS (SELECT event_type, CAST(quantile_disc(vu, 0.5) AS BIGINT) AS med_u FROM v GROUP BY event_type) "
        "SELECT v.event_type, CAST(any_value(med_u) AS BIGINT) AS med_u, "
        "CAST(quantile_disc(abs(vu - med_u), 0.5) AS BIGINT) AS mad_u "
        "FROM v JOIN m ON m.event_type = v.event_type GROUP BY v.event_type"
    ),
    "events_streaks": (
        "WITH d AS (SELECT DISTINCT user_id, "
        "epoch_us(ts) // 86400000000 AS day FROM events), "
        "i AS (SELECT user_id, day, day - row_number() OVER "
        "(PARTITION BY user_id ORDER BY day) AS isl FROM d), "
        "s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS streak "
        "FROM i GROUP BY user_id, isl) "
        "SELECT user_id, CAST(max(streak) AS BIGINT) AS max_streak "
        "FROM s GROUP BY user_id"
    ),
    "events_winsorize": (
        "WITH v AS (SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS vu FROM events), "
        "b AS (SELECT event_type, CAST(quantile_disc(vu, 0.05) AS BIGINT) AS lo, "
        "CAST(quantile_disc(vu, 0.99) AS BIGINT) AS hi FROM v GROUP BY event_type) "
        "SELECT v.event_type, CAST(count(*) AS BIGINT) AS n, "
        "CAST(count(*) FILTER (vu < lo) AS BIGINT) AS clipped_lo, "
        "CAST(count(*) FILTER (vu > hi) AS BIGINT) AS clipped_hi, "
        "CAST(sum(vu) AS BIGINT) AS sum_raw_u, "
        "CAST(sum(CASE WHEN vu < lo THEN lo WHEN vu > hi THEN hi ELSE vu END) AS BIGINT) AS sum_wins_u "
        "FROM v JOIN b ON b.event_type = v.event_type GROUP BY v.event_type"
    ),
    "events_xcorr": (
        "WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour, "
        "count(*) FILTER (event_type = 'click') AS x, "
        "count(*) FILTER (event_type = 'purchase') AS y "
        "FROM events WHERE event_type IN ('click', 'purchase') GROUP BY hour) "
        "SELECT CAST(count(*) AS BIGINT) AS n_hours, "
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
        "CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy, "
        "CAST(sum(x * y) AS BIGINT) AS sxy FROM h"
    ),
    "events_ks": (
        "WITH v AS (SELECT CAST(round(value * 1e6) AS BIGINT) AS vu, event_type "
        "FROM events WHERE event_type IN ('click', 'purchase')), "
        "d AS (SELECT vu, count(*) FILTER (event_type = 'click') AS c1, "
        "count(*) FILTER (event_type = 'purchase') AS c2 FROM v GROUP BY vu), "
        "c AS (SELECT vu, sum(c1) OVER (ORDER BY vu) AS s1, "
        "sum(c2) OVER (ORDER BY vu) AS s2 FROM d), "
        "t AS (SELECT count(*) FILTER (event_type = 'click') AS n1, "
        "count(*) FILTER (event_type = 'purchase') AS n2 FROM v) "
        "SELECT CAST(max(abs(s1 * n2 - s2 * n1)) AS BIGINT) AS ks_num, "
        "CAST(n1 * n2 AS BIGINT) AS ks_den FROM c, t GROUP BY n1, n2"
    ),
    "events_records": (
        "WITH v AS (SELECT event_id, user_id, "
        "CAST(round(value * 1e6) AS BIGINT) AS vu FROM events), "
        "w AS (SELECT event_id, user_id, vu, max(vu) OVER "
        "(ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx FROM v) "
        "SELECT event_id, user_id, vu AS value_u FROM w WHERE mx IS NULL OR vu > mx"
    ),
    "events_lag_stats": (
        "WITH v AS (SELECT event_id, user_id, ts, "
        "CAST(round(value * 1e6) AS BIGINT) AS vu FROM events) "
        "SELECT event_id, user_id, "
        "CAST(COALESCE(vu - lag(vu) OVER w, 0) AS BIGINT) AS delta_u, "
        "CAST(sum(vu) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS runsum_u "
        "FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ),
    "events_props_sum": (
        "SELECT event_type, "
        "CAST(sum(CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum, "
        "CAST(count(*) FILTER (regexp_extract(props, '\"k\": (\\d+)', 1) <> '') AS BIGINT) AS n_hits "
        "FROM events GROUP BY event_type"
    ),
    "events_outliers": (
        "WITH v AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events), "
        "med AS (SELECT event_type, CAST(quantile_disc(vc, 0.5) AS BIGINT) AS med_c FROM v GROUP BY event_type), "
        "dev AS (SELECT v.event_type, v.vc, abs(v.vc - m.med_c) AS d, m.med_c FROM v "
        "JOIN med m ON m.event_type = v.event_type), "
        "mad AS (SELECT event_type, CAST(quantile_disc(d, 0.5) AS BIGINT) AS mad_c FROM dev GROUP BY event_type) "
        "SELECT dev.event_type, dev.med_c, s.mad_c, "
        "CAST(count(*) FILTER (dev.d > 3 * s.mad_c) AS BIGINT) AS n_outliers, "
        "CAST(count(*) AS BIGINT) AS n_events "
        "FROM dev JOIN mad s ON s.event_type = dev.event_type "
        "GROUP BY dev.event_type, dev.med_c, s.mad_c"
    ),
    "events_retention": (
        "WITH ud AS (SELECT DISTINCT user_id, "
        "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day FROM events), "
        "f AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY user_id) "
        "SELECT f.cohort AS cohort_day, ud.day - f.cohort AS day_offset, "
        "CAST(count(*) AS BIGINT) AS n_users "
        "FROM ud JOIN f ON f.user_id = ud.user_id GROUP BY 1, 2"
    ),
    "events_funnel": (
        "WITH u1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' "
        "GROUP BY user_id), "
        "u2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN u1 ON u1.user_id = e.user_id "
        "WHERE e.event_type = 'click' AND e.ts >= u1.t1 GROUP BY e.user_id), "
        "u3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN u2 ON u2.user_id = e.user_id "
        "WHERE e.event_type = 'purchase' AND e.ts >= u2.t2 GROUP BY e.user_id) "
        "SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users, "
        "(SELECT count(*) FROM u1) AS n_view, "
        "(SELECT count(*) FROM u2) AS n_click, "
        "(SELECT count(*) FROM u3) AS n_purchase"
    ),
    "events_hourly": (
        "SELECT user_id, epoch_us(ts) // 3600000000 AS hour_bucket, count(*) AS n_events, "
        "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS value_sum_u "
        "FROM events GROUP BY user_id, hour_bucket"
    ),
    "events_hourly_uniques": (
        "SELECT epoch_us(ts) // 3600000000 AS hour_bucket, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM events GROUP BY hour_bucket"
    ),
    "events_sessions": (
        "WITH x AS (SELECT user_id, CASE WHEN lag(ts) OVER w IS NULL "
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS ns "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions FROM x GROUP BY user_id"
    ),
    "events_sliding": (
        "SELECT user_id, epoch_us(ts) // 3600000000 - x.i AS win_start, "
        "count(*) AS n_events, "
        "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS value_sum_u "
        "FROM events, (VALUES (0), (1)) x(i) GROUP BY user_id, win_start"
    ),
    # strict as-of == lag because (user_id, ts) is unique in events
    "events_asof_prev": (
        "SELECT event_id, user_id, coalesce(lag(CAST(round(value * 1000000) AS BIGINT)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id), -1) AS prev_value_u FROM events"
    ),
    "rel_degree_hist": (
        f"WITH e AS ({SQL_REL_EDGES}), d AS (SELECT vid, CAST(sum(c) AS BIGINT) AS outdeg FROM "
        "(SELECT src AS vid, 1 AS c FROM e UNION ALL SELECT DISTINCT dst AS vid, 0 AS c FROM e) t "
        "GROUP BY vid) SELECT outdeg, count(*) AS n_vertices FROM d GROUP BY outdeg"
    ),
    "docs_token_count_bpe": (
        r"SELECT doc_id, CAST(len(regexp_extract_all(text, "
        r"'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens FROM documents"
    ),
    # sequence packing = window cumsum in doc_id order; bin of the doc's
    # FIRST token (integer division of the exclusive running total)
    "docs_pack_sequences": (
        r"WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all(text, "
        r"'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_tokens FROM documents), "
        r"c AS (SELECT doc_id, n_tokens, sum(n_tokens) OVER "
        r"(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t) "
        r"SELECT doc_id, n_tokens, (cum - n_tokens) // 2000 AS bin_id FROM c"
    ),
    "q1_returnflag": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
        "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_c2, "
        "count(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "supplier_nation_revenue": (
        "SELECT n.n_name, "
        "CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS revenue_c, CAST(count(*) AS BIGINT) AS n_items "
        "FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey "
        "JOIN lineitem l ON l.l_suppkey = s.s_suppkey "
        "GROUP BY n.n_name"
    ),
    "part_brand_revenue": (
        "SELECT p.p_brand, "
        "CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS revenue_c, CAST(count(*) AS BIGINT) AS n_items "
        "FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey "
        "GROUP BY p.p_brand"
    ),
    "orders_rfm": (
        "WITH c AS (SELECT o_custkey AS c_custkey, "
        "CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', max(o_orderdate)) AS BIGINT) AS last_us, "
        "count(*) AS n_orders, "
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c "
        "FROM orders GROUP BY o_custkey) "
        "SELECT c_custkey, "
        "CAST(NTILE(5) OVER (ORDER BY last_us DESC, c_custkey) AS BIGINT) AS r_score, "
        "CAST(NTILE(5) OVER (ORDER BY n_orders DESC, c_custkey) AS BIGINT) AS f_score, "
        "CAST(NTILE(5) OVER (ORDER BY total_c DESC, c_custkey) AS BIGINT) AS m_score "
        "FROM c"
    ),
    "q3_shipping_priority": (
        "SELECT l.l_orderkey AS o_orderkey, "
        "CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS revenue_c, o.o_orderdate, o.o_orderpriority "
        "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        f"WHERE c.c_mktsegment = '{Q3_SEGMENT}' "
        "AND o.o_orderdate < TIMESTAMP '1998-06-01' "
        "AND l.l_shipdate > TIMESTAMP '1998-06-01' "
        "GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority "
        "ORDER BY revenue_c DESC, o.o_orderdate, o_orderkey LIMIT 10"
    ),
    "q4_late_orders": (
        "SELECT o.o_orderpriority, "
        "CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_late "
        "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY "
        "GROUP BY o.o_orderpriority"
    ),
    "q5_region_revenue": (
        "SELECT n.n_name, "
        "CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS revenue_c, CAST(count(*) AS BIGINT) AS n_items "
        "FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey "
        "JOIN customer c ON c.c_nationkey = n.n_nationkey "
        "JOIN orders o ON o.o_custkey = c.c_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        f"WHERE r.r_name = '{Q5_REGION}' GROUP BY n.n_name"
    ),
    "mktsegment_revenue": (
        "SELECT c.c_mktsegment, "
        "CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c, "
        "count(*) AS n_orders FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
        "GROUP BY c.c_mktsegment"
    ),
}

ORACLES["rel_bfs_pull"] = ORACLES["rel_bfs"]
# warm-start WCC's fixpoint is bit-identical to cold WCC (min-semiring
# over pre-propagated labels — WarmStartWCCKernel docstring)
ORACLES["rel_wcc_incremental"] = ORACLES["rel_wcc"]
ORACLES["rel_sssp_hops_pull"] = ORACLES["rel_sssp_hops"]
ORACLES["rel_sssp_weighted_pull"] = ORACLES["rel_sssp_weighted"]


def _curation_oracles() -> dict[str, str]:
    """Oracles for the curation family — built from the same regex /
    threshold constants the operators use, so the two sides cannot
    drift."""
    from everythinggraph_ray.datapipe.curate import (
        EMAIL_RE,
        PHONE_RE,
        _rate_threshold,
    )

    aug = (
        "aug AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' contact user' "
        "|| CAST(doc_id AS VARCHAR) || '@example.com call 555-' "
        "|| CAST(doc_id % 900 + 100 AS VARCHAR) || '-' "
        "|| CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE text END AS t FROM documents)"
    )
    sample_case = (
        "CASE lang "
        + " ".join(f"WHEN '{lg}' THEN '{_rate_threshold(r)}'" for lg, r in SAMPLE_RATES.items())
        + f" ELSE '{_rate_threshold(SAMPLE_DEFAULT_RATE)}' END"
    )
    return {
        "docs_pii_redact": (
            f"WITH {aug}, "
            f"r1 AS (SELECT doc_id, t, regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1 FROM aug) "
            f"SELECT doc_id, CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails, "
            f"CAST(len(regexp_extract_all(t1, '{PHONE_RE}')) AS BIGINT) AS n_phones, "
            f"md5(regexp_replace(t1, '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5 FROM r1"
        ),
        "docs_sample_stratified": (
            "SELECT doc_id, lang FROM documents "
            f"WHERE md5(CAST(doc_id AS VARCHAR)) < {sample_case}"
        ),
        "docs_repetition": (
            r"WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents), "
            r"wc AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, "
            r"CAST(len(list_distinct(w)) AS BIGINT) AS n_unique_words FROM t), "
            r"u AS (SELECT doc_id, unnest(w) AS word FROM t), "
            r"tw AS (SELECT doc_id, max(c) AS m FROM "
            r"(SELECT doc_id, word, count(*) AS c FROM u GROUP BY doc_id, word) GROUP BY doc_id), "
            r"bg AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS b FROM t "
            r"CROSS JOIN unnest(range(1, len(w))) AS r(i) WHERE len(w) >= 2), "
            r"tb AS (SELECT doc_id, max(c) AS m FROM "
            r"(SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b) GROUP BY doc_id) "
            r"SELECT wc.doc_id, n_words, n_unique_words, "
            r"CAST(coalesce(tw.m, 0) AS BIGINT) AS top_word_n, "
            r"CAST(coalesce(tb.m, 0) AS BIGINT) AS top_bigram_n "
            r"FROM wc LEFT JOIN tw ON tw.doc_id = wc.doc_id LEFT JOIN tb ON tb.doc_id = wc.doc_id"
        ),
        "docs_mixture_sample": (
            r"WITH s AS (SELECT lang, source, "
            r"CAST(sum(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) AS BIGINT) AS n_tokens "
            r"FROM documents GROUP BY lang, source), "
            r"w AS (SELECT lang, source, "
            r"(1000000 * (min(n_tokens) OVER ())) // n_tokens AS weight_u FROM s), "
            r"th AS (SELECT lang, source, "
            r"printf('%08x', weight_u * 4294967296 // 1000000) AS hx FROM w) "
            r"SELECT d.doc_id, d.lang, d.source FROM documents d "
            r"JOIN th ON th.lang = d.lang AND th.source = d.source "
            r"WHERE md5(CAST(d.doc_id AS VARCHAR)) < th.hx"
        ),
        "docs_gopher_filter": (
            r"WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents), "
            r"wc AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, "
            r"CAST(len(list_distinct(w)) AS BIGINT) AS n_unique_words FROM t), "
            r"u AS (SELECT doc_id, unnest(w) AS word FROM t), "
            r"tw AS (SELECT doc_id, max(c) AS m FROM "
            r"(SELECT doc_id, word, count(*) AS c FROM u GROUP BY doc_id, word) GROUP BY doc_id), "
            r"bg AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS b FROM t "
            r"CROSS JOIN unnest(range(1, len(w))) AS r(i) WHERE len(w) >= 2), "
            r"tb AS (SELECT doc_id, max(c) AS m FROM "
            r"(SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b) GROUP BY doc_id), "
            r"s AS (SELECT wc.doc_id, n_words, n_unique_words, "
            r"CAST(coalesce(tw.m, 0) AS BIGINT) AS top_word_n, "
            r"CAST(coalesce(tb.m, 0) AS BIGINT) AS top_bigram_n "
            r"FROM wc LEFT JOIN tw ON tw.doc_id = wc.doc_id LEFT JOIN tb ON tb.doc_id = wc.doc_id) "
            r"SELECT * FROM s WHERE n_words >= 30 AND top_word_n * 10 <= n_words "
            r"AND n_unique_words * 5 >= n_words * 2"
        ),
        "docs_decontaminate": (
            r"WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents), "
            r"g AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram FROM toks "
            r"CROSS JOIN unnest(range(1, len(w)-3)) AS u(i) WHERE len(w) >= 5), "
            r"bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0) "
            r"SELECT g.doc_id, count(*) AS n_contaminated FROM g JOIN bench USING (gram) "
            r"WHERE g.doc_id % 7 <> 0 GROUP BY g.doc_id"
        ),
        "docs_pmi_pairs": (
            r"WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t "
            r"FROM documents), "
            r"pos AS (SELECT doc_id, i, t[i] AS w FROM toks, "
            r"LATERAL unnest(generate_series(1, len(t))) AS u(i)), "
            r"co AS (SELECT least(p1.w, p2.w) AS a, greatest(p1.w, p2.w) AS b, "
            r"CAST(count(*) AS BIGINT) AS n "
            r"FROM pos p1 JOIN pos p2 ON p2.doc_id = p1.doc_id "
            f"AND p2.i > p1.i AND p2.i <= p1.i + {PMI_WINDOW} AND p1.w <> p2.w "
            r"GROUP BY 1, 2), "
            r"np AS (SELECT sum(n) AS np FROM co), "
            r"nt AS (SELECT CAST(sum(len(t)) AS HUGEINT) AS nt FROM toks), "
            r"tc AS (SELECT w AS token, CAST(count(*) AS HUGEINT) AS c FROM pos GROUP BY w), "
            f"top AS (SELECT a, b, n FROM co ORDER BY n DESC, a, b LIMIT {PMI_TOPK}) "
            r"SELECT top.a, top.b, top.n, "
            r"CAST((CAST(top.n AS HUGEINT) * nt.nt * nt.nt * 1000000) "
            r"// (CAST(np.np AS HUGEINT) * ca.c * cb.c) AS BIGINT) AS lift_u "
            r"FROM top, np, nt "
            r"JOIN tc ca ON ca.token = top.a JOIN tc cb ON cb.token = top.b"
        ),
        "docs_dup_spans": (
            r"WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t "
            r"FROM documents), "
            r"wins AS (SELECT doc_id, i, CAST(CAST(md5_number_lower(array_to_string(t[i:i+7], '_')) "
            r"AS HUGEINT) // 8 AS BIGINT) AS h, len(t) AS nt "
            r"FROM toks, LATERAL unnest(generate_series(1, len(t) - 7)) AS u(i) WHERE len(t) >= 8), "
            r"duph AS (SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2), "
            r"dup AS (SELECT w.doc_id, w.i FROM wins w JOIN duph USING (h)), "
            r"cov AS (SELECT d.doc_id, count(DISTINCT j) AS covered FROM dup d, "
            r"LATERAL unnest(generate_series(d.i, d.i + 7)) AS g(j) GROUP BY d.doc_id), "
            r"dw AS (SELECT doc_id, count(*) AS dup_windows FROM dup GROUP BY doc_id), "
            r"base AS (SELECT doc_id, max(nt) AS n_tokens, count(*) AS n_windows FROM wins GROUP BY doc_id) "
            r"SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens, "
            r"CAST(b.n_windows AS BIGINT) AS n_windows, "
            r"CAST(coalesce(dw.dup_windows, 0) AS BIGINT) AS dup_windows, "
            r"CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens, "
            r"CAST(coalesce(cov.covered, 0) AS DOUBLE) / b.n_tokens AS dup_frac "
            r"FROM base b LEFT JOIN dw ON dw.doc_id = b.doc_id "
            r"LEFT JOIN cov ON cov.doc_id = b.doc_id"
        ),
        "docs_winnow": (
            # winnowing: per window of WINNOW_W consecutive k-gram hashes,
            # select the min (rightmost on ties) = max pos among grams
            # achieving the window min. Gram hash = md5_number_lower of
            # the '_'-joined k-gram, identical to the Python side.
            r"WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t "
            r"FROM documents), "
            f"grams AS (SELECT doc_id, i, CAST(md5_number_lower(array_to_string(t[i:i+{WINNOW_K - 1}], '_')) AS HUGEINT) AS h, "
            f"len(t) - {WINNOW_K - 1} AS m "
            f"FROM toks, LATERAL unnest(generate_series(1, len(t) - {WINNOW_K - 1})) AS u(i) "
            f"WHERE len(t) >= {WINNOW_K}), "
            f"wmin AS (SELECT g1.doc_id, g1.i AS ws, min(g2.h) AS mh FROM grams g1 "
            r"JOIN grams g2 ON g2.doc_id = g1.doc_id AND g2.i BETWEEN g1.i AND g1.i + "
            f"{WINNOW_W - 1} WHERE g1.i <= g1.m - {WINNOW_W - 1} GROUP BY 1, 2), "
            r"sel AS (SELECT w.doc_id, max(g.i) AS pos FROM wmin w JOIN grams g "
            r"ON g.doc_id = w.doc_id AND g.i BETWEEN w.ws AND w.ws + "
            f"{WINNOW_W - 1} AND g.h = w.mh GROUP BY w.doc_id, w.ws) "
            r"SELECT DISTINCT s.doc_id, CAST(s.pos AS BIGINT) AS pos, "
            r"CAST(g.h // 8 AS BIGINT) AS h "
            r"FROM sel s JOIN grams g ON g.doc_id = s.doc_id AND g.i = s.pos"
        ),
        "docs_mix_weights": (
            r"WITH s AS (SELECT lang, source, count(*) AS n_docs, "
            r"CAST(sum(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) AS BIGINT) AS n_tokens "
            r"FROM documents GROUP BY lang, source) "
            r"SELECT lang, source, n_docs, n_tokens, "
            r"(1000000 * (min(n_tokens) OVER ())) // n_tokens AS weight_u FROM s"
        ),
        "events_purchase_window": (
            "SELECT p.event_id AS window_id, count(*) AS n_events, "
            "CAST(sum(CAST(round(e.value * 1000000) AS BIGINT)) AS BIGINT) AS value_sum_u "
            "FROM events p JOIN events e ON e.user_id = p.user_id "
            "AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR "
            "WHERE p.event_type = 'purchase' GROUP BY p.event_id"
        ),
    }


ORACLES.update(_curation_oracles())


# ----------------------------------------------------------------------
# web flagship oracles (round-3 VERDICT item 1): DuckDB re-derives the
# dense web graph from the SERIAL extractor's side parquet
# (corpus.ensure_web_oracle_edges — no Ray code touches it), renumbers
# vids with row_number() OVER (ORDER BY vid), and replays the kernels in
# SQL. __ray_entry__.oracle_sql() materializes the side parquet lazily
# before returning these strings.
# ----------------------------------------------------------------------
def _corpus_glob(n_pages: int) -> str:
    from everythinggraph_ray.corpus import corpus_path

    return os.path.join(corpus_path(n_pages), "*.parquet")


def _web_sql_prelude(n_pages: int = 3000, *, undirect: bool = False) -> str:
    from everythinggraph_ray.corpus import web_oracle_edges_path

    p = web_oracle_edges_path(n_pages)
    parts = [
        f"we AS (SELECT * FROM read_parquet('{p}'))",  # v2: src_url, dst_url, src, dst
        "wm AS (SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS id "
        "FROM (SELECT DISTINCT vid FROM (SELECT src AS vid FROM we UNION ALL SELECT dst AS vid FROM we)))",
        "e AS (SELECT ms.id AS src, md.id AS dst FROM we "
        "JOIN wm ms ON ms.vid = we.src JOIN wm md ON md.vid = we.dst)",
    ]
    if undirect:
        parts.append(
            "und AS (SELECT src AS u, dst AS v FROM e WHERE src <> dst "
            "UNION SELECT dst AS u, src AS v FROM e WHERE src <> dst)"
        )
    return ", ".join(parts)


def _web_oracle_sqls(n_pages: int = 3000) -> dict[str, str]:
    """The hash-checkable web oracles for an (n_pages, seed=42) corpus.
    The driver's correctness pass runs at sf0.01 → the 3000-page corpus
    (_CORPUS_ROWS); pytest exercises the same builders at the 800-page
    fixture scale. Graph kernels derive from the serial EDGE side
    parquet; web_extract_text reads the serial (url, text) table — the
    north rule's per-row byte-identity invariant as a driver hash check;
    web_anchor_text re-aggregates the serial per-occurrence anchor rows."""
    from everythinggraph_ray.corpus import (
        web_oracle_anchors_path,
        web_oracle_edges_path,
        web_oracle_text_path,
    )

    pre = _web_sql_prelude(n_pages)
    host = "lower(regexp_extract({col}, '^https?://([^/]+)', 1))"
    # crawled-url → (dense vid, domain) attachment: edge-endpoint urls,
    # restricted to crawled pages (the text side parquet's url set),
    # domain from the url string, dense id through wm
    vd_ctes = (
        ", urls AS (SELECT DISTINCT src_url AS url, src AS hvid FROM we "
        "UNION SELECT DISTINCT dst_url AS url, dst AS hvid FROM we)"
        f", crawled AS (SELECT url FROM read_parquet('{web_oracle_text_path(n_pages)}'))"
        ", udom AS (SELECT u.hvid, "
        + host.format(col="u.url")
        + " AS domain FROM urls u JOIN crawled c ON c.url = u.url)"
        ", vd AS (SELECT wm.id AS vid, udom.domain FROM udom JOIN wm ON wm.vid = udom.hvid)"
    )
    hostrank_ctes = [
        f"we AS (SELECT src_url, dst_url FROM read_parquet('{web_oracle_edges_path(n_pages)}'))",
        "he AS (SELECT "
        + host.format(col="src_url")
        + " AS src, "
        + host.format(col="dst_url")
        + " AS dst FROM we)",
        "hew AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM he "
        "WHERE src <> dst GROUP BY src, dst)",
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM hew UNION ALL SELECT dst AS vid FROM hew))",
        "wd AS (SELECT src AS vid, sum(w) AS wd FROM hew GROUP BY src)",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "r0 AS (SELECT vid, CAST(0.15 AS DOUBLE) AS r FROM verts)",
    ]
    for k in range(1, 11):
        hostrank_ctes.append(
            f"r{k} AS (SELECT v.vid, (SELECT 0.15/n FROM nv) + 0.85 * coalesce(s.contrib, 0) AS r "
            f"FROM verts v LEFT JOIN (SELECT hew.dst AS vid, sum((p.r / wd.wd) * hew.w) AS contrib "
            f"FROM hew JOIN r{k-1} p ON p.vid = hew.src JOIN wd ON wd.vid = hew.src "
            f"WHERE wd.wd > 0 GROUP BY hew.dst) s ON s.vid = v.vid)"
        )
    return {
        "web_extract_text": (
            f"SELECT url, text FROM read_parquet('{web_oracle_text_path(n_pages)}')"
        ),
        "web_hostrank": (
            "WITH "
            + ", ".join(hostrank_ctes)
            + " SELECT vid AS domain, round(r, 8) AS hostrank FROM r10"
        ),
        "web_top_per_domain": _pagerank10_sql(
            edges_prelude=pre + vd_ctes,
            tail=(
                " SELECT vid, domain, pagerank, rk FROM ("
                "SELECT vd.vid, vd.domain, round(r10.r, 8) AS pagerank, "
                "CAST(row_number() OVER (PARTITION BY vd.domain "
                "ORDER BY round(r10.r, 8) DESC, vd.vid) AS BIGINT) AS rk "
                "FROM vd JOIN r10 ON r10.vid = vd.vid) WHERE rk <= 3"
            ),
        ),
        "web_crawl_schedule": _pagerank10_sql(
            edges_prelude=pre + vd_ctes,
            tail=(
                " SELECT vd.vid, vd.domain, "
                "CAST(row_number() OVER (PARTITION BY vd.domain "
                "ORDER BY CAST(floor(round(r10.r, 8) * 1e9) AS BIGINT) DESC, vd.vid) "
                "AS BIGINT) AS slot "
                "FROM vd JOIN r10 ON r10.vid = vd.vid"
            ),
        ),
        "web_anchor_text": (
            f"SELECT dst_url, anchor, CAST(count(*) AS BIGINT) AS n "
            f"FROM read_parquet('{web_oracle_anchors_path(n_pages)}') "
            f"GROUP BY dst_url, anchor "
            f"ORDER BY n DESC, dst_url, anchor LIMIT {ANCHOR_TOPK}"
        ),
        "web_hits": _hits10_sql(edges_prelude=pre),
        "web_kcore": _kcore_sql(3, WEB_KCORE_SQL_ROUNDS, edges_prelude=pre),
        "web_edges": f"WITH {pre} SELECT src, dst FROM e",
        "web_pagerank10": _pagerank10_sql(edges_prelude=pre),
        "web_top10": _pagerank10_sql(
            edges_prelude=pre,
            tail=(
                " SELECT vid, round(r, 7) AS pagerank FROM r10 "
                "ORDER BY pagerank DESC, vid LIMIT 10"
            ),
        ),
        # binary-content dedup certificate: GROUP BY the raw html BLOB
        # (bit-exact content equality; the Ray side's md5 keys equal it
        # modulo md5 collisions) over the same cached corpus parquet
        "multimodal_exact_dedup": (
            "WITH g AS (SELECT count(*) AS c FROM "
            f"read_parquet('{_corpus_glob(n_pages)}') GROUP BY html) "
            "SELECT CAST(sum(c) AS BIGINT) AS n_items, "
            "CAST(count(*) AS BIGINT) AS n_unique, "
            "CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS n_dup_items, "
            "CAST(max(c) AS BIGINT) AS max_group FROM g"
        ),
        "web_wcc": (
            "WITH RECURSIVE "
            + _web_sql_prelude(n_pages, undirect=True)
            + ", verts AS (SELECT DISTINCT vid FROM "
            "(SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e))"
            ", r(vid, lab) AS (SELECT vid, vid FROM verts UNION "
            "SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v) "
            "SELECT v.vid, m.c AS component FROM verts v "
            "JOIN (SELECT vid, min(lab) AS c FROM r GROUP BY vid) m ON m.vid = v.vid"
        ),
    }


def register_web_oracles(n_pages: int = 3000, *, ensure: bool = False) -> None:
    """(Re-)register the web_* oracle SQL for an (n_pages, seed=42) corpus.

    The web_* Ray queries read ``_corpus_for(sf_dir)`` — a corpus whose
    size varies with sf (``_CORPUS_ROWS``) — while the oracle SQL reads
    serial side parquets pinned to one n_pages. The two must agree:
    ``__ray_entry__.oracle_sql(sf_dir=...)`` calls this with the n_pages
    resolved from the SAME sf mapping, so a correctness pass at any sf
    compares against the matching corpus (round-4 ADVICE item 1).
    ``ensure=True`` also materializes the serial side parquets (cached).
    """
    if ensure:
        from everythinggraph_ray.corpus import (
            ensure_web_oracle_anchors,
            ensure_web_oracle_edges,
            ensure_web_oracle_text,
        )

        ensure_web_oracle_edges(n_pages, seed=42)
        ensure_web_oracle_text(n_pages, seed=42)
        ensure_web_oracle_anchors(n_pages, seed=42)
    ORACLES.update(_web_oracle_sqls(n_pages))


def web_oracle_pages_for(sf_dir: str) -> int:
    """Corpus size (n_pages) for an sf dir — the single source of truth
    shared by the Ray-side ``_corpus_for`` and the oracle registration."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    return _CORPUS_ROWS.get(tag, 3000)


# import-time default: the driver's correctness scale (sf0.01 → 3000)
register_web_oracles(3000)

# rel_pagerank's agreement-witness oracle (round-3 VERDICT item 2): the
# vertex count is real SQL; n_agree = n_vertices is the CLAIM the Ray
# side must earn by converging push and pull to the same 1e-9 grid.
ORACLES["rel_pagerank"] = (
    f"WITH e AS ({SQL_REL_EDGES}), verts AS (SELECT DISTINCT vid FROM "
    "(SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e)) "
    "SELECT CAST(count(*) AS BIGINT) AS n_vertices, "
    "CAST(count(*) AS BIGINT) AS n_agree FROM verts"
)

ORACLES["docs_inverted_index"] = (
    r"WITH t AS (SELECT doc_id, "
    r"unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS token "
    r"FROM documents) "
    r"SELECT token, CAST(count(*) AS BIGINT) AS df, "
    r"string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings "
    r"FROM t GROUP BY token HAVING count(*) >= 2"
)
ORACLES["docs_above_median_len"] = (
    "WITH l AS (SELECT lang, length(text) AS len FROM documents), "
    "m AS (SELECT lang, CAST(quantile_disc(len, 0.5) AS BIGINT) AS median_len "
    "FROM l GROUP BY lang) "
    "SELECT m.lang, m.median_len, "
    "CAST(count(*) FILTER (WHERE l.len >= m.median_len) AS BIGINT) AS n_above "
    "FROM m JOIN l ON l.lang = m.lang GROUP BY m.lang, m.median_len"
)
ORACLES["docs_tfidf"] = (
    r"WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
    r"FROM documents), "
    r"tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token), "
    r"df AS (SELECT token, count(*) AS df FROM tf GROUP BY token), "
    r"n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM documents), "
    r"s AS (SELECT tf.doc_id, tf.token, tf.tf * ln((SELECT nn FROM n) / df.df) AS score "
    r"FROM tf JOIN df ON tf.token = df.token), "
    r"r AS (SELECT doc_id, token, score, CAST(row_number() OVER "
    r"(PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rnk FROM s) "
    r"SELECT doc_id, token, round(score, 6) AS score, rnk FROM r WHERE rnk <= 3"
)
ORACLES["docs_shard_assign"] = (
    "WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents), "
    "s AS (SELECT doc_id, hx, "
    "CAST(CAST(concat('0x', substr(hx, 1, 8)) AS UBIGINT) % 16 AS BIGINT) AS shard FROM h) "
    "SELECT doc_id, shard, "
    "CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) - 1 AS BIGINT) AS pos "
    "FROM s"
)
ORACLES["rel_partition_cut"] = (
    f"WITH e AS ({SQL_REL_EDGES}) "
    "SELECT CAST(count(*) AS BIGINT) AS n_edges, "
    "CAST(count(*) FILTER (src % 8 <> dst % 8) AS BIGINT) AS n_cut, "
    "CAST(count(*) FILTER (src % 8 <> dst % 8) * 1000 // count(*) AS BIGINT) AS cut_milli "
    "FROM e"
)
ORACLES["rel_simrank8"] = (
    f"WITH e AS (SELECT DISTINCT src, dst FROM ({SQL_REL_EDGES})), "
    "seeds(v) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7)), "
    "i AS (SELECT dst AS seed, src AS nb FROM e WHERE dst IN (SELECT v FROM seeds)), "
    "ind AS (SELECT dst AS vid, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY dst), "
    "cc AS (SELECT e1.dst AS i, e2.dst AS j, CAST(count(*) AS DOUBLE) AS n "
    "FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst GROUP BY e1.dst, e2.dst), "
    "p AS (SELECT a.seed AS sa, b.seed AS sb, a.nb AS i, b.nb AS j "
    "FROM i a JOIN i b ON a.seed < b.seed), "
    "contrib AS (SELECT p.sa, p.sb, "
    "CASE WHEN p.i = p.j THEN 1.0 "  # s1(i,i)=1 even at indeg 0
    "WHEN di.d IS NULL OR dj.d IS NULL THEN 0.0 "  # indeg-0 side: no common in-nbrs
    "ELSE 0.8 * COALESCE(cc.n, 0) / (di.d * dj.d) END AS s1 "
    "FROM p "
    "LEFT JOIN cc ON cc.i = LEAST(p.i, p.j) AND cc.j = GREATEST(p.i, p.j) "
    "LEFT JOIN ind di ON di.vid = p.i LEFT JOIN ind dj ON dj.vid = p.j), "
    "counts AS (SELECT seed, CAST(count(*) AS DOUBLE) AS cnt FROM i GROUP BY seed) "
    "SELECT sa AS seed_a, sb AS seed_b, "
    "round(0.8 * sum(s1) / (ca.cnt * cb.cnt), 7) AS simrank "
    "FROM contrib JOIN counts ca ON ca.seed = sa JOIN counts cb ON cb.seed = sb "
    "GROUP BY sa, sb, ca.cnt, cb.cnt"
)
ORACLES["emb_gram"] = (
    "WITH u AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x, "
    "generate_subscripts(embedding, 1) AS d FROM embeddings) "
    "SELECT a.d AS i, b.d AS j, round(sum(a.x * b.x), 7) AS g "
    "FROM u a JOIN u b USING (vec_id) WHERE a.d <= b.d GROUP BY a.d, b.d "
    "UNION ALL "
    "SELECT u.d AS i, CAST(0 AS BIGINT) AS j, "
    "round(sum(u.x * CAST(e.label AS DOUBLE)), 7) AS g "
    "FROM u JOIN embeddings e USING (vec_id) GROUP BY u.d"
)
ORACLES["emb_standardize"] = (
    "WITH u AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x, "
    "generate_subscripts(embedding, 1) AS d FROM embeddings), "
    "st AS (SELECT d, sum(x) / count(*) AS mu, "
    "sqrt(sum(x * x) / count(*) - (sum(x) / count(*)) ^ 2) AS sigma "
    "FROM u GROUP BY d), "
    "z AS (SELECT vec_id, sum((x - mu) / (CASE WHEN sigma = 0 THEN 1 ELSE sigma END)) AS zs "
    "FROM u JOIN st USING (d) GROUP BY vec_id) "
    "SELECT vec_id, CAST(round(zs * 1e6) AS BIGINT) AS z_sum_u FROM z"
)
ORACLES["rel_featprop2"] = (
    f"WITH e AS (SELECT DISTINCT src, dst FROM ({SQL_REL_EDGES})), "
    "od AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src), "
    "x0 AS (SELECT vec_id AS vid, CAST(embedding[1] AS DOUBLE) AS f0, "
    "CAST(embedding[2] AS DOUBLE) AS f1, CAST(embedding[3] AS DOUBLE) AS f2, "
    "CAST(embedding[4] AS DOUBLE) AS f3 FROM embeddings), "
    "x1 AS (SELECT e.dst AS vid, sum(x.f0 / od.d) AS f0, sum(x.f1 / od.d) AS f1, "
    "sum(x.f2 / od.d) AS f2, sum(x.f3 / od.d) AS f3 "
    "FROM e JOIN x0 x ON e.src = x.vid JOIN od ON od.src = e.src GROUP BY e.dst), "
    "x2 AS (SELECT e.dst AS vid, sum(x.f0 / od.d) AS f0, sum(x.f1 / od.d) AS f1, "
    "sum(x.f2 / od.d) AS f2, sum(x.f3 / od.d) AS f3 "
    "FROM e JOIN x1 x ON e.src = x.vid JOIN od ON od.src = e.src GROUP BY e.dst) "
    "SELECT vid, round(f0, 7) AS f0, round(f1, 7) AS f1, "
    "round(f2, 7) AS f2, round(f3, 7) AS f3 FROM x2"
)
ORACLES["docs_weighted_sample"] = (
    "WITH h AS (SELECT doc_id, length(text) + 1 AS w, "
    "(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 0.5) "
    "/ 4294967296.0 AS u FROM documents) "
    "SELECT doc_id, CAST(w AS BIGINT) AS weight, "
    "CAST(row_number() OVER (ORDER BY ln(u) / w DESC, doc_id) AS BIGINT) AS rank "
    "FROM h QUALIFY rank <= 100"
)
ORACLES["docs_len_quantiles"] = (
    "SELECT lang, "
    "CAST(quantile_disc(length(text), 0.25) AS BIGINT) AS p25, "
    "CAST(quantile_disc(length(text), 0.50) AS BIGINT) AS p50, "
    "CAST(quantile_disc(length(text), 0.90) AS BIGINT) AS p90, "
    "CAST(quantile_disc(length(text), 0.99) AS BIGINT) AS p99 "
    "FROM documents GROUP BY lang"
)
ORACLES["orders_customer_join"] = (
    "SELECT o_orderkey, o_custkey, c_mktsegment "
    "FROM orders JOIN customer ON o_custkey = c_custkey"
)
ORACLES["cust_no_bigorder"] = (
    "SELECT c_custkey, c_mktsegment FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)"
)
def _bloom_decontaminate_oracle() -> str:
    from everythinggraph_ray.datapipe.dedup import MD5_MINHASH_SEEDS

    seeds = ", ".join(
        f"({r}, {a}, {b})" for r, (a, b) in enumerate(MD5_MINHASH_SEEDS[:BLOOM_K])
    )
    return (
        r"WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w "
        r"FROM documents), "
        r"g AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram FROM toks "
        r"CROSS JOIN unnest(range(1, len(w)-3)) AS u(i) WHERE len(w) >= 5), "
        f"seeds(r, a, b) AS (VALUES {seeds}), "
        r"hv AS (SELECT doc_id, gram, CAST(md5_number_lower(gram) AS HUGEINT) AS h FROM g), "
        f"bpos AS (SELECT DISTINCT ((a * h + b) % 18446744073709551616) % {BLOOM_M} AS pos "
        r"FROM hv CROSS JOIN seeds WHERE doc_id % 7 = 0), "
        f"cp AS (SELECT doc_id, gram, ((a * h + b) % 18446744073709551616) % {BLOOM_M} AS pos "
        r"FROM hv CROSS JOIN seeds WHERE doc_id % 7 <> 0), "
        f"flagged AS (SELECT doc_id, gram FROM cp GROUP BY doc_id, gram "
        f"HAVING count(*) FILTER (pos IN (SELECT pos FROM bpos)) = {BLOOM_K}) "
        r"SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged FROM flagged GROUP BY doc_id"
    )


def _cms_heavy_oracle() -> str:
    from everythinggraph_ray.datapipe.dedup import MD5_MINHASH_SEEDS

    seeds = ", ".join(
        f"({r}, {a}, {b})" for r, (a, b) in enumerate(MD5_MINHASH_SEEDS[:CMS_DEPTH])
    )
    return (
        "WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
        "FROM documents), "
        "tc AS (SELECT token, count(*) AS c FROM toks GROUP BY token), "
        "h AS (SELECT token, c, CAST(md5_number_lower(token) AS HUGEINT) AS hh FROM tc), "
        f"seeds(r, a, b) AS (VALUES {seeds}), "
        f"sl AS (SELECT r, ((a * hh + b) % 18446744073709551616) % {CMS_WIDTH} AS s, token, c "
        "FROM h CROSS JOIN seeds), "
        "cms AS (SELECT r, s, sum(c) AS cnt FROM sl GROUP BY r, s), "
        "est AS (SELECT sl.token, min(cms.cnt) AS est FROM sl "
        "JOIN cms ON cms.r = sl.r AND cms.s = sl.s GROUP BY sl.token) "
        f"SELECT token, CAST(est AS BIGINT) AS est FROM est WHERE est >= {CMS_THRESHOLD}"
    )


def _minhash_md5_oracle() -> str:
    from everythinggraph_ray.datapipe.dedup import MD5_MINHASH_SEEDS

    seeds = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(MD5_MINHASH_SEEDS))
    return (
        "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t "
        "FROM documents), "
        "sh AS (SELECT doc_id, unnest(list_transform(range(1, len(t)-1), "
        "i -> t[i] || '_' || t[i+1] || '_' || t[i+2])) AS s "
        "FROM toks WHERE len(t) >= 3), "
        "hv AS (SELECT doc_id, CAST(md5_number_lower(s) AS HUGEINT) AS h FROM sh), "
        f"seeds(seed, a, b) AS (VALUES {seeds}) "
        "SELECT doc_id, CAST(seed AS BIGINT) AS seed, "
        "CAST(min(((a * h + b) % 18446744073709551616) // 8) AS BIGINT) AS minhash "
        "FROM hv, seeds GROUP BY doc_id, seed"
    )


ORACLES["docs_minhash_md5"] = _minhash_md5_oracle()
ORACLES["docs_cms_heavy"] = _cms_heavy_oracle()
ORACLES["docs_bloom_decontaminate"] = _bloom_decontaminate_oracle()
ORACLES["emb_allpairs_sim"] = (
    "SELECT a.vec_id AS a, b.vec_id AS b, "
    "CAST(FLOOR(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) "
    "* 1000) AS BIGINT) AS sim_milli "
    "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
    "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.40"
)

# conversion latency: exact integer microsecond deltas; quantile_disc
# == grouped_quantiles' ceil(q*n)-1 pick
ORACLES["events_conversion_quantiles"] = (
    "WITH fv AS (SELECT user_id, min(ts) AS vts FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "fp AS (SELECT e.user_id, min(e.ts) AS pts FROM events e "
    "JOIN fv ON fv.user_id = e.user_id AND e.ts >= fv.vts "
    "WHERE e.event_type = 'purchase' GROUP BY e.user_id), "
    "d AS (SELECT CAST(date_diff('microsecond', fv.vts, fp.pts) AS BIGINT) AS delta_us "
    "FROM fv JOIN fp ON fp.user_id = fv.user_id) "
    "SELECT CAST(quantile_disc(delta_us, 0.5) AS BIGINT) AS p50, "
    "CAST(quantile_disc(delta_us, 0.9) AS BIGINT) AS p90, "
    "CAST(quantile_disc(delta_us, 0.99) AS BIGINT) AS p99 FROM d"
)

# burst rate: SQL RANGE window (peers included) == the two-searchsorted
# trailing-window count
ORACLES["events_rate_flags"] = (
    "WITH w AS (SELECT user_id, count(*) OVER (PARTITION BY user_id ORDER BY ts "
    "RANGE BETWEEN INTERVAL 60 SECONDS PRECEDING AND CURRENT ROW) AS cnt FROM events) "
    "SELECT user_id, CAST(max(cnt) AS BIGINT) AS max_per_min, "
    f"CAST(max(cnt) >= {RATE_FLAG_MIN} AS BIGINT) AS flagged "
    "FROM w GROUP BY user_id"
)

# audience overlap: distinct (user, type) pairs, exact pair Jaccard
ORACLES["events_audience_overlap"] = (
    "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events), "
    "tot AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type), "
    "p AS (SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS c "
    "FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type "
    "GROUP BY a.event_type, b.event_type) "
    "SELECT ta AS type_a, tb AS type_b, CAST(c AS BIGINT) AS n_common, "
    "CAST(na.n + nb.n - c AS BIGINT) AS n_union, "
    "(1000 * c) // (na.n + nb.n - c) AS jac_milli "
    "FROM p JOIN tot na ON na.event_type = ta JOIN tot nb ON nb.event_type = tb"
)

# Markov stationary: P from the transitions oracle, 10 unrolled xP
# levels (each xK referenced once; p/types MATERIALIZED — referenced by
# every level)
def _markov_stationary_sql() -> str:
    ctes = [
        "s AS (SELECT event_type, LAG(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events)",
        "cnt AS (SELECT prev AS a, event_type AS b, count(*) AS c FROM s "
        "WHERE prev IS NOT NULL GROUP BY prev, event_type)",
        "rt AS (SELECT a, sum(c) AS tot FROM cnt GROUP BY a)",
        "p AS MATERIALIZED (SELECT cnt.a, cnt.b, cnt.c / rt.tot AS prob "
        "FROM cnt JOIN rt ON rt.a = cnt.a)",
        "types AS MATERIALIZED (SELECT DISTINCT a AS t FROM cnt "
        "UNION SELECT DISTINCT b AS t FROM cnt)",
        "nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM types)",
        "x0 AS (SELECT t, (SELECT 1.0/n FROM nt) AS val FROM types)",
    ]
    for k in range(1, MARKOV_ITERS + 1):
        ctes.append(
            f"x{k} AS (SELECT p.b AS t, sum(x.val * p.prob) AS val "
            f"FROM x{k-1} x JOIN p ON p.a = x.t GROUP BY p.b)"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT t AS event_type, round(val, 7) AS stationary FROM x{MARKOV_ITERS}"
    )


ORACLES["events_markov_stationary"] = _markov_stationary_sql()

# truncated-dim recall: the two rank tables share knn_top10's idiom;
# half-dim = list slice [1:len//2]; overlap = LEFT-join count per query
ORACLES["emb_dim_recall"] = (
    "WITH q AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id "
    f"LIMIT {KNN_QUERIES}), "
    "full_r AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
    "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
    "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, "
    f"e.vec_id) AS rank FROM q, embeddings e WHERE e.vec_id <> q.vec_id QUALIFY rank <= {KNN_K}), "
    "half_r AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
    "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
    "list_cosine_similarity(CAST(q.embedding[1:len(q.embedding)//2] AS DOUBLE[]), "
    "CAST(e.embedding[1:len(e.embedding)//2] AS DOUBLE[])) DESC, "
    f"e.vec_id) AS rank FROM q, embeddings e WHERE e.vec_id <> q.vec_id QUALIFY rank <= {KNN_K}) "
    "SELECT f.query_id, CAST(count(h.neighbor_id) AS BIGINT) AS n_overlap "
    "FROM full_r f LEFT JOIN half_r h ON h.query_id = f.query_id "
    "AND h.neighbor_id = f.neighbor_id GROUP BY f.query_id"
)

# SQ8: identical float64 expression tree on both sides → bit-exact codes
ORACLES["emb_quantize_sq"] = (
    "WITH v AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS val, "
    "generate_subscripts(embedding, 1) AS dim FROM embeddings), "
    "mm AS (SELECT dim, min(val) AS mn, max(val) AS mx FROM v GROUP BY dim), "
    "codes AS (SELECT vec_id, v.dim, CASE WHEN mx = mn THEN 0 "
    "ELSE CAST(least(greatest(floor((val - mn) * 255 / (mx - mn)), 0), 255) AS BIGINT) "
    "END AS code FROM v JOIN mm ON mm.dim = v.dim) "
    "SELECT vec_id, md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY dim)) AS code_md5, "
    "CAST(sum(code) AS BIGINT) AS code_sum FROM codes GROUP BY vec_id"
)

# exact Jaccard self-join: the quadratic spec of the prefix-filtered
# distributed join — all integers, so the threshold and similarity agree
# bit-for-bit with the Ray side
ORACLES["docs_jaccard_join"] = (
    "WITH tok AS (SELECT DISTINCT doc_id, "
    "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents), "
    "sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id), "
    "inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i "
    "FROM tok x JOIN tok y ON x.t = y.t AND x.doc_id < y.doc_id "
    "GROUP BY x.doc_id, y.doc_id), "
    "j AS (SELECT a, b, i, sa.n + sb.n - i AS u FROM inter "
    "JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b) "
    f"SELECT a, b, (1000 * i) // u AS jac_milli FROM j WHERE 1000 * i >= {JACCARD_JOIN_MILLI} * u"
)

# similarity clustering = the allpairs threshold graph + rel_wcc's
# recursive min-label CTE; only vectors with >= 1 neighbor appear
ORACLES["emb_sim_clusters"] = (
    "WITH RECURSIVE p AS (SELECT a.vec_id AS a, b.vec_id AS b "
    "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
    "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) "
    f">= {EMB_CLUSTER_THRESHOLD}), "
    "und AS (SELECT a AS u, b AS v FROM p UNION SELECT b AS u, a AS v FROM p), "
    "verts AS (SELECT DISTINCT u AS vid FROM und), "
    "r(vid, lab) AS (SELECT vid, vid FROM verts "
    "UNION SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v) "
    "SELECT vid AS vec_id, min(lab) AS cluster_id FROM r GROUP BY vid"
)

# Q6-lite: same double expression tree (ep * disc * 10000 + 0.5, then
# floor) as the Ray partial — identical IEEE result before the cast.
ORACLES["q6_revenue"] = (
    "SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * "
    "CAST(10000 AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c4, "
    "COUNT(*) AS n_items FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
    "AND l_shipdate < TIMESTAMP '1996-01-01' "
    "AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE) "
    "AND l_quantity < CAST(24 AS DOUBLE)"
)

ORACLES["q18_big_orders"] = (
    "WITH big AS (SELECT l_orderkey, CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) "
    "AS BIGINT) AS total_qty FROM lineitem GROUP BY l_orderkey "
    f"HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > {Q18_QTY_THRESHOLD}) "
    "SELECT big.l_orderkey AS o_orderkey, big.total_qty, c.c_name, "
    "CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS o_totalprice_c "
    "FROM big JOIN orders o ON o.o_orderkey = big.l_orderkey "
    "JOIN customer c ON c.c_custkey = o.o_custkey"
)
ORACLES["part_copurchase"] = (
    "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "p AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b, count(*) AS cnt "
    "FROM d l1 JOIN d l2 ON l1.l_orderkey = l2.l_orderkey "
    "AND l1.l_partkey < l2.l_partkey GROUP BY 1, 2) "
    f"SELECT a, b, cnt FROM p WHERE cnt >= {COPURCHASE_MINSUP}"
)
ORACLES["orders_skyline"] = (
    "SELECT s.o_orderkey, s.o_totalprice, s.o_orderdate FROM orders s "
    "WHERE NOT EXISTS (SELECT 1 FROM orders t "
    "WHERE t.o_totalprice <= s.o_totalprice AND t.o_orderdate <= s.o_orderdate "
    "AND (t.o_totalprice < s.o_totalprice OR t.o_orderdate < s.o_orderdate))"
)

ORACLES["rel_avg_nbr_degree"] = (
    "WITH "
    + _sql_graph_prelude()
    + ", od AS (SELECT v.vid, COUNT(e.src) AS outdeg FROM verts v "
    "LEFT JOIN e ON e.src = v.vid GROUP BY v.vid) "
    "SELECT e.src AS vid, CAST(SUM(od.outdeg) AS BIGINT) AS nbr_outdeg_sum, "
    "COUNT(*) AS n_out FROM e JOIN od ON od.vid = e.dst GROUP BY e.src"
)

# modularity of the WCC partition: r_c counts und rows by the u-side
# component (r_c = 2·e_c = ΣD_c since every und edge is intra-component);
# num = Σ(m2·r − r²), den = m2² with m2 = |und| = 2m. Integer-exact.
# und2: under WITH RECURSIVE DuckDB relaxes the dedup of und's UNION
# (harmless for the join-only oracles, wrong for COUNT) — re-dedup
# explicitly before counting.
ORACLES["rel_modularity"] = (
    "WITH RECURSIVE "
    + _sql_graph_prelude(undirect=True)
    + ", r(vid, lab) AS (SELECT vid, vid FROM verts UNION "
    "SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v), "
    "lab AS (SELECT vid, min(lab) AS c FROM r GROUP BY vid), "
    "und2 AS (SELECT DISTINCT u, v FROM und), "
    "rc AS (SELECT l.c, COUNT(*) AS r FROM und2 JOIN lab l ON l.vid = und2.u GROUP BY l.c), "
    "mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM und2) "
    "SELECT CAST(SUM(mm.m2 * rc.r - rc.r * rc.r) AS BIGINT) AS mod_num, "
    "CAST(ANY_VALUE(mm.m2) * ANY_VALUE(mm.m2) AS BIGINT) AS mod_den "
    "FROM rc CROSS JOIN mm"
)

ORACLES["docs_lang_source_pivot"] = (
    "SELECT lang, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN source = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{s}"
        for s in [f"src{i}" for i in range(20)]
    )
    + " FROM documents GROUP BY lang"
)

ORACLES["docs_lang_source_rollup"] = (
    "SELECT COALESCE(lang, '(all)') AS lang, COALESCE(source, '(all)') AS source, "
    "COUNT(*) AS n FROM documents GROUP BY ROLLUP(lang, source)"
)

# Spearman building blocks: the quality expression tree is mirrored
# token-for-token on the UNROUNDED score (quality_values rounded=False),
# so floor(q*1e8 + 0.5) lands the identical int64 on both sides.
ORACLES["docs_rank_corr"] = (
    r"WITH s0 AS (SELECT doc_id, lang, n_chars, "
    r"CAST(length(text) AS DOUBLE) AS nc, "
    r"CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS nt0, "
    r"CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS np_, "
    r"CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|a|to|in|is)\b')) AS DOUBLE) AS ns "
    r"FROM documents), "
    r"s AS (SELECT doc_id, lang, n_chars, "
    r"CAST(FLOOR((0.4 * least(nc / 1000.0, 1.0) "
    r"+ 0.3 * greatest(least(1.0 - abs(np_ / greatest(nt0, 1.0) - 0.1) * 2.0, 1.0), 0.0) "
    r"+ 0.3 * least(ns / greatest(nt0, 1.0) * 4.0, 1.0)) * 100000000.0 + 0.5) AS BIGINT) AS qint "
    r"FROM s0), "
    r"r AS (SELECT lang, "
    r"ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn1, "
    r"ROW_NUMBER() OVER (PARTITION BY lang ORDER BY qint DESC, doc_id) AS rn2 FROM s) "
    r"SELECT lang, CAST(SUM((rn1 - rn2) * (rn1 - rn2)) AS BIGINT) AS sum_d2, "
    r"COUNT(*) AS n FROM r GROUP BY lang"
)

ORACLES["docs_len_rank"] = (
    "SELECT doc_id, lang, n_chars, "
    "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn, "
    "NTILE(4) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS tile "
    "FROM documents"
)

ORACLES["events_transitions"] = (
    "WITH s AS (SELECT event_type, LAG(event_type) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events) "
    "SELECT prev AS prev_type, event_type AS next_type, COUNT(*) AS n "
    "FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type"
)

ORACLES["docs_snapshot_delta"] = SQL_SNAPSHOT_DELTA

ORACLES["rel_scc_condensation"] = (
    "WITH RECURSIVE "
    + _sql_graph_prelude(no_self=True)
    + ", e3 AS (SELECT DISTINCT src, dst FROM e2)"
    ", r(s, d) AS (SELECT src, dst FROM e3 UNION "
    "SELECT r.s, e3.dst FROM r JOIN e3 ON e3.src = r.d)"
    ", m AS (SELECT r1.s AS v, r1.d AS u FROM r r1 "
    "JOIN r r2 ON r2.s = r1.d AND r2.d = r1.s)"
    ", comp AS (SELECT v.vid AS vid, "
    "CAST(least(v.vid, coalesce(min(m.u), v.vid)) AS BIGINT) AS scc "
    "FROM verts v LEFT JOIN m ON m.v = v.vid GROUP BY v.vid) "
    "SELECT DISTINCT cs.scc AS c_src, cd.scc AS c_dst "
    "FROM e3 JOIN comp cs ON cs.vid = e3.src JOIN comp cd ON cd.vid = e3.dst "
    "WHERE cs.scc <> cd.scc"
)

QUERIES = {
    "rel_edges": q_rel_edges,
    "rel_degree": q_rel_degree,
    "rel_distinct_edges": q_rel_distinct_edges,
    "rel_top_outdegree": q_rel_top_outdegree,
    "rel_pagerank10": q_rel_pagerank10,
    "rel_pagerank10_pull": q_rel_pagerank10_pull,
    "rel_ppr": q_rel_ppr,
    "rel_katz10": q_rel_katz10,
    "rel_hitting8": q_rel_hitting8,
    "rel_earliest_arrival": q_rel_earliest_arrival,
    "rel_latest_departure": q_rel_latest_departure,
    "rel_percolation": q_rel_percolation,
    "rel_eigen10": q_rel_eigen10,
    "rel_kcore": q_rel_kcore,
    "rel_hits10": q_rel_hits10,
    "rel_salsa10": q_rel_salsa10,
    "rel_wpagerank10": q_rel_wpagerank10,
    "rel_coarsen_wpr10": q_rel_coarsen_wpr10,
    "rel_edge_support": q_rel_edge_support,
    "rel_cocitation": q_rel_cocitation,
    "rel_coupling": q_rel_coupling,
    "rel_matching": q_rel_matching,
    "rel_butterflies": q_rel_butterflies,
    "rel_landmark_dist": q_rel_landmark_dist,
    "rel_reciprocity": q_rel_reciprocity,
    "rel_transitivity": q_rel_transitivity,
    "rel_richclub": q_rel_richclub,
    "rel_4cliques": q_rel_4cliques,
    "rel_triangles_sampled": q_rel_triangles_sampled,
    "rel_ktruss": q_rel_ktruss,
    "rel_neighbor_sample": q_rel_neighbor_sample,
    "rel_pagerank": q_rel_pagerank,
    "rel_wcc": q_rel_wcc,
    "rel_wcc_incremental": q_rel_wcc_incremental,
    "rel_scc": q_rel_scc,
    "rel_wcc_stats": q_rel_wcc_stats,
    "rel_sssp_maxdist": q_rel_sssp_maxdist,
    "rel_diameter_est": q_rel_diameter_est,
    "rel_labelprop": q_rel_labelprop,
    "rel_labelprop_seeded": q_rel_labelprop_seeded,
    "rel_bfs": q_rel_bfs,
    "rel_bfs_pull": q_rel_bfs_pull,
    "rel_msbfs": q_rel_msbfs,
    "rel_msbfs_levels": q_rel_msbfs_levels,
    "rel_closeness": q_rel_closeness,
    "rel_harmonic": q_rel_harmonic,
    "rel_betweenness": q_rel_betweenness,
    "rel_assortativity": q_rel_assortativity,
    "rel_link_predict": q_rel_link_predict,
    "rel_link_predict_jaccard": q_rel_link_predict_jaccard,
    "rel_walks": q_rel_walks,
    "rel_anf": q_rel_anf,
    "rel_effective_diameter": q_rel_effective_diameter,
    "rel_mis": q_rel_mis,
    "rel_coloring": q_rel_coloring,
    "rel_sssp_hops": q_rel_sssp_hops,
    "rel_sssp_hops_pull": q_rel_sssp_hops_pull,
    "rel_sssp_weighted_pull": q_rel_sssp_weighted_pull,
    "rel_sssp_parent": q_rel_sssp_parent,
    "rel_spmv": q_rel_spmv,
    "rel_spmv_edgecentric": q_rel_spmv_edgecentric,
    "rel_sssp_weighted": q_rel_sssp_weighted,
    "rel_widest": q_rel_widest,
    "rel_dag_depth": q_rel_dag_depth,
    "rel_louvain": q_rel_louvain,
    "rel_msf": q_rel_msf,
    "rel_triangles": q_rel_triangles,
    "rel_4cycles": q_rel_4cycles,
    "rel_triad_census": q_rel_triad_census,
    "rel_two_hop_count": q_rel_two_hop_count,
    "rel_lcc": q_rel_lcc,
    "web_extract_text": q_web_extract_text,
    "web_edges": q_web_edges,
    "web_anchor_text": q_web_anchor_text,
    "web_pagerank": q_web_pagerank,
    "web_pagerank10": q_web_pagerank10,
    "web_top10": q_web_top10,
    "web_wcc": q_web_wcc,
    "web_hits": q_web_hits,
    "web_kcore": q_web_kcore,
    "web_top_per_domain": q_web_top_per_domain,
    "web_crawl_schedule": q_web_crawl_schedule,
    "web_hostrank": q_web_hostrank,
    "web_curation": q_web_curation,
    "doc_stats": q_doc_stats,
    "docs_exact_dedup": q_docs_exact_dedup,
    "docs_quality": q_docs_quality,
    "docs_lang_counts": q_docs_lang_counts,
    "docs_top_quality_per_lang": q_docs_top_quality_per_lang,
    "docs_top_tokens": q_docs_top_tokens,
    "docs_top_tokens_per_lang": q_docs_top_tokens_per_lang,
    "docs_lang_entropy": q_docs_lang_entropy,
    "docs_snm_pairs": q_docs_snm_pairs,
    "docs_containment": q_docs_containment,
    "docs_bigram_lm": q_docs_bigram_lm,
    "docs_langid": q_docs_langid,
    "docs_fingerprint": q_docs_fingerprint,
    "docs_minhash_clusters": q_docs_minhash_clusters,
    "docs_simhash": q_docs_simhash,
    "docs_simhash_dedup": q_docs_simhash_dedup,
    "emb_near_dup": q_emb_near_dup,
    "emb_allpairs_sim": q_emb_allpairs_sim,
    "emb_sim_clusters": q_emb_sim_clusters,
    "docs_jaccard_join": q_docs_jaccard_join,
    "docs_dedup_keep_best": q_docs_dedup_keep_best,
    "emb_quantize_sq": q_emb_quantize_sq,
    "emb_dim_recall": q_emb_dim_recall,
    "docs_minhash_md5": q_docs_minhash_md5,
    "docs_candidate_starred": q_docs_candidate_starred,
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
    "rel_wcc_dataset": q_rel_wcc_dataset,
    "knn_top10": q_knn_top10,
    "knn_ivf_top10": q_knn_ivf_top10,
    "knn_pq_top10": q_knn_pq_top10,
    "emb_pq_codes": q_emb_pq_codes,
    "rel_featprop2": q_rel_featprop2,
    "emb_standardize": q_emb_standardize,
    "emb_gram": q_emb_gram,
    "rel_simrank8": q_rel_simrank8,
    "rel_partition_cut": q_rel_partition_cut,
    "rel_conductance": q_rel_conductance,
    "events_funnel": q_events_funnel,
    "events_lag_stats": q_events_lag_stats,
    "events_records": q_events_records,
    "events_ks": q_events_ks,
    "events_xcorr": q_events_xcorr,
    "events_winsorize": q_events_winsorize,
    "events_streaks": q_events_streaks,
    "events_mad": q_events_mad,
    "q22_lost_customers": q22_lost_customers,
    "lineitem_ols": q_lineitem_ols,
    "orders_monthly_growth": q_orders_monthly_growth,
    "docs_hapax": q_docs_hapax,
    "docs_profile": q_docs_profile,
    "events_props_sum": q_events_props_sum,
    "events_retention": q_events_retention,
    "events_outliers": q_events_outliers,
    "events_hourly": q_events_hourly,
    "events_hourly_uniques": q_events_hourly_uniques,
    "events_sessions": q_events_sessions,
    "events_sliding": q_events_sliding,
    "events_asof_prev": q_events_asof_prev,
    "rel_degree_hist": q_rel_degree_hist,
    "docs_token_count_bpe": q_docs_token_count_bpe,
    "docs_pack_sequences": q_docs_pack_sequences,
    "docs_cdc_chunks": q_docs_cdc_chunks,
    "docs_pii_redact": q_docs_pii_redact,
    "docs_sample_stratified": q_docs_sample_stratified,
    "docs_weighted_sample": q_docs_weighted_sample,
    "docs_repetition": q_docs_repetition,
    "docs_decontaminate": q_docs_decontaminate,
    "docs_dup_spans": q_docs_dup_spans,
    "docs_winnow": q_docs_winnow,
    "emb_pca_top": q_emb_pca_top,
    "docs_pmi_pairs": q_docs_pmi_pairs,
    "emb_logreg": q_emb_logreg,
    "docs_cms_heavy": q_docs_cms_heavy,
    "docs_bloom_decontaminate": q_docs_bloom_decontaminate,
    "docs_mixture_sample": q_docs_mixture_sample,
    "docs_gopher_filter": q_docs_gopher_filter,
    "docs_mix_weights": q_docs_mix_weights,
    "events_purchase_window": q_events_purchase_window,
    "docs_inverted_index": q_docs_inverted_index,
    "docs_tfidf": q_docs_tfidf,
    "docs_vocab_hll": q_docs_vocab_hll,
    "docs_above_median_len": q_docs_above_median_len,
    "emb_kmeans": q_emb_kmeans,
    "docs_shard_assign": q_docs_shard_assign,
    "docs_len_quantiles": q_docs_len_quantiles,
    "orders_customer_join": q_orders_customer_join,
    "cust_no_bigorder": q_cust_no_bigorder,
    "q1_returnflag": q_q1_returnflag,
    "mktsegment_revenue": q_mktsegment_revenue,
    "q5_region_revenue": q_q5_region_revenue,
    "q3_shipping_priority": q_q3_shipping_priority,
    "orders_rfm": q_orders_rfm,
    "supplier_nation_revenue": q_supplier_nation_revenue,
    "part_brand_revenue": q_part_brand_revenue,
    "q4_late_orders": q_q4_late_orders,
    "q6_revenue": q_q6_revenue,
    "q18_big_orders": q_q18_big_orders,
    "part_copurchase": q_part_copurchase,
    "orders_skyline": q_orders_skyline,
    "rel_avg_nbr_degree": q_rel_avg_nbr_degree,
    "rel_modularity": q_rel_modularity,
    "events_transitions": q_events_transitions,
    "events_conversion_quantiles": q_events_conversion_quantiles,
    "events_markov_stationary": q_events_markov_stationary,
    "events_audience_overlap": q_events_audience_overlap,
    "events_rate_flags": q_events_rate_flags,
    "docs_bpe_merges": q_docs_bpe_merges,
    "docs_bpe_tokens": q_docs_bpe_tokens,
    "docs_len_rank": q_docs_len_rank,
    "rel_pagerank_warm": q_rel_pagerank_warm,
    "docs_rank_corr": q_docs_rank_corr,
    "events_value_quantiles": q_events_value_quantiles,
    "docs_lang_source_pivot": q_docs_lang_source_pivot,
    "docs_lang_source_rollup": q_docs_lang_source_rollup,
    "rel_pagerank10_dangling": q_rel_pagerank10_dangling,
    "docs_snapshot_delta": q_docs_snapshot_delta,
    "rel_scc_condensation": q_rel_scc_condensation,
}

# ----------------------------------------------------------------------
# TPC-H-lite batch 2 (Q7/Q10/Q13/Q14/Q15/Q17/Q19) lives in its own module
# ----------------------------------------------------------------------
from everythinggraph_ray.pipelines.tpch_extra import (  # noqa: E402
    TPCH_EXTRA_ORACLES,
    TPCH_EXTRA_QUERIES,
)

QUERIES.update(TPCH_EXTRA_QUERIES)
ORACLES.update(TPCH_EXTRA_ORACLES)

# analytics batch (CUSUM / inter-arrival / deciles / label centroids)
from everythinggraph_ray.pipelines.analytics_extra import (  # noqa: E402
    ANALYTICS_EXTRA_ORACLES,
    ANALYTICS_EXTRA_QUERIES,
)

QUERIES.update(ANALYTICS_EXTRA_QUERIES)
ORACLES.update(ANALYTICS_EXTRA_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra2 import (  # noqa: E402
    ANALYTICS2_ORACLES,
    ANALYTICS2_QUERIES,
)

QUERIES.update(ANALYTICS2_QUERIES)
ORACLES.update(ANALYTICS2_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra3 import (  # noqa: E402
    ANALYTICS3_ORACLES,
    ANALYTICS3_QUERIES,
)

QUERIES.update(ANALYTICS3_QUERIES)
ORACLES.update(ANALYTICS3_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra4 import (  # noqa: E402
    ANALYTICS4_ORACLES,
    ANALYTICS4_QUERIES,
)

QUERIES.update(ANALYTICS4_QUERIES)
ORACLES.update(ANALYTICS4_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra5 import (  # noqa: E402
    ANALYTICS5_ORACLES,
    ANALYTICS5_QUERIES,
)

QUERIES.update(ANALYTICS5_QUERIES)
ORACLES.update(ANALYTICS5_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra6 import (  # noqa: E402
    ANALYTICS6_ORACLES,
    ANALYTICS6_QUERIES,
)

QUERIES.update(ANALYTICS6_QUERIES)
ORACLES.update(ANALYTICS6_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra7 import (  # noqa: E402
    ANALYTICS7_ORACLES,
    ANALYTICS7_QUERIES,
)

QUERIES.update(ANALYTICS7_QUERIES)
ORACLES.update(ANALYTICS7_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra8 import (  # noqa: E402
    ANALYTICS8_ORACLES,
    ANALYTICS8_QUERIES,
)
from everythinggraph_ray.pipelines.analytics_extra8 import (  # noqa: E402
    register_late as _a8_register_late,
)

QUERIES.update(ANALYTICS8_QUERIES)
ORACLES.update(ANALYTICS8_ORACLES)
_a8_register_late(ORACLES)

from everythinggraph_ray.pipelines.analytics_extra9 import (  # noqa: E402
    ANALYTICS9_ORACLES,
    ANALYTICS9_QUERIES,
)

QUERIES.update(ANALYTICS9_QUERIES)
ORACLES.update(ANALYTICS9_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra10 import (  # noqa: E402
    ANALYTICS10_ORACLES,
    ANALYTICS10_QUERIES,
)
from everythinggraph_ray.pipelines.analytics_extra10 import (  # noqa: E402
    register_late as _a10_register_late,
)

QUERIES.update(ANALYTICS10_QUERIES)
ORACLES.update(ANALYTICS10_ORACLES)
_a10_register_late(ORACLES)

from everythinggraph_ray.pipelines.analytics_extra11 import (  # noqa: E402
    ANALYTICS11_ORACLES,
    ANALYTICS11_QUERIES,
)

QUERIES.update(ANALYTICS11_QUERIES)
ORACLES.update(ANALYTICS11_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra12 import (  # noqa: E402
    ANALYTICS12_ORACLES,
    ANALYTICS12_QUERIES,
)

QUERIES.update(ANALYTICS12_QUERIES)
ORACLES.update(ANALYTICS12_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra13 import (  # noqa: E402
    ANALYTICS13_ORACLES,
    ANALYTICS13_QUERIES,
)

QUERIES.update(ANALYTICS13_QUERIES)
ORACLES.update(ANALYTICS13_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra14 import (  # noqa: E402
    ANALYTICS14_ORACLES,
    ANALYTICS14_QUERIES,
)

QUERIES.update(ANALYTICS14_QUERIES)
ORACLES.update(ANALYTICS14_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra15 import (  # noqa: E402
    ANALYTICS15_ORACLES,
    ANALYTICS15_QUERIES,
)

QUERIES.update(ANALYTICS15_QUERIES)
ORACLES.update(ANALYTICS15_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra16 import (  # noqa: E402
    ANALYTICS16_ORACLES,
    ANALYTICS16_QUERIES,
)

QUERIES.update(ANALYTICS16_QUERIES)
ORACLES.update(ANALYTICS16_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra17 import (  # noqa: E402
    ANALYTICS17_ORACLES,
    ANALYTICS17_QUERIES,
)

QUERIES.update(ANALYTICS17_QUERIES)
ORACLES.update(ANALYTICS17_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra18 import (  # noqa: E402
    ANALYTICS18_ORACLES,
    ANALYTICS18_QUERIES,
)

QUERIES.update(ANALYTICS18_QUERIES)
ORACLES.update(ANALYTICS18_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra19 import (  # noqa: E402
    ANALYTICS19_ORACLES,
    ANALYTICS19_QUERIES,
)

QUERIES.update(ANALYTICS19_QUERIES)
ORACLES.update(ANALYTICS19_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra20 import (  # noqa: E402
    ANALYTICS20_ORACLES,
    ANALYTICS20_QUERIES,
)

QUERIES.update(ANALYTICS20_QUERIES)
ORACLES.update(ANALYTICS20_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra21 import (  # noqa: E402
    ANALYTICS21_ORACLES,
    ANALYTICS21_QUERIES,
)

QUERIES.update(ANALYTICS21_QUERIES)
ORACLES.update(ANALYTICS21_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra22 import (  # noqa: E402
    ANALYTICS22_ORACLES,
    ANALYTICS22_QUERIES,
)

QUERIES.update(ANALYTICS22_QUERIES)
ORACLES.update(ANALYTICS22_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra23 import (  # noqa: E402
    ANALYTICS23_ORACLES,
    ANALYTICS23_QUERIES,
)

QUERIES.update(ANALYTICS23_QUERIES)
ORACLES.update(ANALYTICS23_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra24 import (  # noqa: E402
    ANALYTICS24_ORACLES,
    ANALYTICS24_QUERIES,
)

QUERIES.update(ANALYTICS24_QUERIES)
ORACLES.update(ANALYTICS24_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra25 import (  # noqa: E402
    ANALYTICS25_ORACLES,
    ANALYTICS25_QUERIES,
)

QUERIES.update(ANALYTICS25_QUERIES)
ORACLES.update(ANALYTICS25_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra26 import (  # noqa: E402
    ANALYTICS26_ORACLES,
    ANALYTICS26_QUERIES,
)

QUERIES.update(ANALYTICS26_QUERIES)
ORACLES.update(ANALYTICS26_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra27 import (  # noqa: E402
    ANALYTICS27_ORACLES,
    ANALYTICS27_QUERIES,
)

QUERIES.update(ANALYTICS27_QUERIES)
ORACLES.update(ANALYTICS27_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra28 import (  # noqa: E402
    ANALYTICS28_ORACLES,
    ANALYTICS28_QUERIES,
)

QUERIES.update(ANALYTICS28_QUERIES)
ORACLES.update(ANALYTICS28_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra29 import (  # noqa: E402
    ANALYTICS29_ORACLES,
    ANALYTICS29_QUERIES,
)

QUERIES.update(ANALYTICS29_QUERIES)
ORACLES.update(ANALYTICS29_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra30 import (  # noqa: E402
    ANALYTICS30_ORACLES,
    ANALYTICS30_QUERIES,
)

QUERIES.update(ANALYTICS30_QUERIES)
ORACLES.update(ANALYTICS30_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra31 import (  # noqa: E402
    ANALYTICS31_ORACLES,
    ANALYTICS31_QUERIES,
)

QUERIES.update(ANALYTICS31_QUERIES)
ORACLES.update(ANALYTICS31_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra32 import (  # noqa: E402
    ANALYTICS32_ORACLES,
    ANALYTICS32_QUERIES,
)

QUERIES.update(ANALYTICS32_QUERIES)
ORACLES.update(ANALYTICS32_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra33 import (  # noqa: E402
    ANALYTICS33_ORACLES,
    ANALYTICS33_QUERIES,
)

QUERIES.update(ANALYTICS33_QUERIES)
ORACLES.update(ANALYTICS33_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra34 import (  # noqa: E402
    ANALYTICS34_ORACLES,
    ANALYTICS34_QUERIES,
)

QUERIES.update(ANALYTICS34_QUERIES)
ORACLES.update(ANALYTICS34_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra35 import (  # noqa: E402
    ANALYTICS35_ORACLES,
    ANALYTICS35_QUERIES,
)

QUERIES.update(ANALYTICS35_QUERIES)
ORACLES.update(ANALYTICS35_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra36 import (  # noqa: E402
    ANALYTICS36_ORACLES,
    ANALYTICS36_QUERIES,
)

QUERIES.update(ANALYTICS36_QUERIES)
ORACLES.update(ANALYTICS36_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra37 import (  # noqa: E402
    ANALYTICS37_ORACLES,
    ANALYTICS37_QUERIES,
)

QUERIES.update(ANALYTICS37_QUERIES)
ORACLES.update(ANALYTICS37_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra38 import (  # noqa: E402
    ANALYTICS38_ORACLES,
    ANALYTICS38_QUERIES,
)

QUERIES.update(ANALYTICS38_QUERIES)
ORACLES.update(ANALYTICS38_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra39 import (  # noqa: E402
    ANALYTICS39_ORACLES,
    ANALYTICS39_QUERIES,
)

QUERIES.update(ANALYTICS39_QUERIES)
ORACLES.update(ANALYTICS39_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra40 import (  # noqa: E402
    ANALYTICS40_ORACLES,
    ANALYTICS40_QUERIES,
)

QUERIES.update(ANALYTICS40_QUERIES)
ORACLES.update(ANALYTICS40_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra41 import (  # noqa: E402
    ANALYTICS41_ORACLES,
    ANALYTICS41_QUERIES,
)

QUERIES.update(ANALYTICS41_QUERIES)
ORACLES.update(ANALYTICS41_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra42 import (  # noqa: E402
    ANALYTICS42_ORACLES,
    ANALYTICS42_QUERIES,
)

QUERIES.update(ANALYTICS42_QUERIES)
ORACLES.update(ANALYTICS42_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra43 import (  # noqa: E402
    ANALYTICS43_ORACLES,
    ANALYTICS43_QUERIES,
)

QUERIES.update(ANALYTICS43_QUERIES)
ORACLES.update(ANALYTICS43_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra44 import (  # noqa: E402
    ANALYTICS44_ORACLES,
    ANALYTICS44_QUERIES,
)

QUERIES.update(ANALYTICS44_QUERIES)
ORACLES.update(ANALYTICS44_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra45 import (  # noqa: E402
    ANALYTICS45_ORACLES,
    ANALYTICS45_QUERIES,
)

QUERIES.update(ANALYTICS45_QUERIES)
ORACLES.update(ANALYTICS45_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra46 import (  # noqa: E402
    ANALYTICS46_ORACLES,
    ANALYTICS46_QUERIES,
)

QUERIES.update(ANALYTICS46_QUERIES)
ORACLES.update(ANALYTICS46_ORACLES)

from everythinggraph_ray.pipelines.analytics_extra47 import (  # noqa: E402
    ANALYTICS47_ORACLES,
    ANALYTICS47_QUERIES,
)

QUERIES.update(ANALYTICS47_QUERIES)
ORACLES.update(ANALYTICS47_ORACLES)

# ----------------------------------------------------------------------
# Driver correctness-window ordering (round-4 VERDICT next-round item 1).
#
# The driver's CORRECTNESS_r{N}.json hashes the FIRST ~50 ``queries()``
# entries; previously those were 50 rel_* graph kernels, so the web
# flagship family and the LLM-pipeline headliners never appeared in a
# driver artifact even though they are oracle-green. Reorder QUERIES so
# the window is a representative cross-section: 25 graph kernels
# (push+pull PageRank/BFS/SSSP, WCC/labelprop, SpMV, triangles, k-core,
# HITS), the 11 hash-oracle web entries (incl. the north rule's
# byte-identity web_extract_text), and 14 LLM-pipeline / TPC-H
# headliners (dedup, jaccard join, minhash, kNN, as-of join, TPC-H).
# Pure reordering — same keys, same callables; every windowed name is
# asserted to exist AND to carry a DuckDB hash oracle.
# ----------------------------------------------------------------------
DRIVER_WINDOW = [
    # graph kernels (25)
    "rel_edges", "rel_degree", "rel_distinct_edges", "rel_top_outdegree",
    "rel_pagerank10", "rel_pagerank10_pull", "rel_pagerank", "rel_ppr",
    "rel_wpagerank10", "rel_pagerank10_dangling", "rel_bfs", "rel_bfs_pull",
    "rel_msbfs", "rel_wcc", "rel_wcc_incremental", "rel_labelprop",
    "rel_labelprop_seeded", "rel_sssp_maxdist", "rel_sssp_weighted",
    "rel_spmv", "rel_spmv_edgecentric", "rel_triangles", "rel_edge_support",
    "rel_kcore", "rel_hits10",
    # web flagship family (11, all hash-oracle)
    "web_extract_text", "web_edges", "web_anchor_text", "web_pagerank10",
    "web_top10", "web_wcc", "web_hits", "web_kcore", "web_top_per_domain",
    "web_crawl_schedule", "web_hostrank",
    # LLM-pipeline / TPC-H headliners (14, all hash-oracle)
    "docs_exact_dedup", "docs_jaccard_join", "docs_minhash_md5",
    "emb_allpairs_sim", "docs_dup_spans", "docs_quality", "docs_tfidf",
    "knn_top10", "knn_ivf_top10", "events_asof_prev",
    "orders_customer_join", "q1_returnflag", "q6_revenue", "events_sessions",
]

_missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
_no_oracle = [n for n in DRIVER_WINDOW if n not in ORACLES]
if _missing or _no_oracle:  # fail loudly at import, not in the driver
    raise RuntimeError(
        f"DRIVER_WINDOW misconfigured: missing={_missing} no_oracle={_no_oracle}"
    )

QUERIES = {
    **{k: QUERIES[k] for k in DRIVER_WINDOW},
    **{k: v for k, v in QUERIES.items() if k not in DRIVER_WINDOW},
}
