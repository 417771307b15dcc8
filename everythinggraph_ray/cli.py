"""CLI entry point — the ``ray job submit`` surface of the engine.

    python -m everythinggraph_ray.cli pagerank \
        --pages /data/pages --out /data/out --partitions 64 \
        --checkpoint-dir /data/ckpt --checkpoint-every 5 [--resume]

    python -m everythinggraph_ray.cli wcc --edges /data/edges.parquet ...
    python -m everythinggraph_ray.cli bfs --edges ... --root 42 ...

On a real cluster: ``ray job submit --working-dir . -- python -m
everythinggraph_ray.cli ...`` — the module only calls ``ray.init`` when no
session exists (address from the environment), per the driver contract.

This replaces the reference's per-binary ``main`` + getopt driver
(random.c:50-116: -f file, -n nodes, -m mode, -u undirect, -p root ...).
"""

from __future__ import annotations

import argparse
import json
import sys


def _get_kernel(args):
    from everythinggraph_ray.graph import kernels as K

    table = {
        "pagerank": lambda: (
            K.WarmStartPageRankKernel(args.warm_state, damping=args.damping)
            if args.warm_state
            else K.PageRankKernel(damping=args.damping)
        ),
        "pagerank-dangling": lambda: K.DanglingPageRankKernel(damping=args.damping),
        "ppr": lambda: K.PersonalizedPageRankKernel(
            args.ppr_seed_mod, args.ppr_n_seeds, damping=args.damping
        ),
        "wpagerank": lambda: K.WeightedPageRankKernel(damping=args.damping),
        "katz": lambda: K.KatzKernel(alpha=args.katz_alpha, beta=args.katz_beta),
        "eigenvector": lambda: K.EigenvectorKernel(),
        # caller contract: the input edge table must be a DAG
        "dag-depth": lambda: K.DagDepthKernel(),
        "wcc": lambda: K.WCCKernel(),
        "labelprop": lambda: K.LabelPropKernel(),
        "bfs": lambda: K.BFSKernel(args.root),
        "msbfs": lambda: K.MultiSourceBFSKernel(
            [int(s) for s in args.sources.split(",")] if args.sources else [args.root]
        ),
        # per-superstep N(h) histograms land in metrics.json ("extra")
        "anf": lambda: K.ANFKernel(),
        "sssp": lambda: K.SSSPHopsKernel(args.root),
        "sssp-parent": lambda: K.ParentSSSPHopsKernel(args.root),
        "sssp-weighted": lambda: K.SSSPWeightedKernel(args.root),
        "widest": lambda: K.WidestPathKernel(args.root),
        # edge weights are TIMESTAMPS for the two temporal kernels
        "earliest-arrival": lambda: K.EarliestArrivalKernel(args.root),
        "latest-departure": lambda: K.LatestDepartureKernel(args.root),
        "spmv": lambda: K.SpMVKernel(),
        # landmarks/root are derived from the edge universe pre-build
        # (main() stashes them on args)
        "dominators": lambda: K.LandmarkDominatorKernel(
            args._dom_root, args._dom_bits
        ),
    }
    return table[args.kernel]()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="everythinggraph_ray")
    p.add_argument(
        "kernel",
        choices=[
            "pagerank",
            "pagerank-pull",
            "pagerank-dangling",
            "ppr",
            "wpagerank",
            "katz",
            "eigenvector",
            "dag-depth",
            "wcc",
            "labelprop",
            "anf",
            "bfs",
            "bfs-pull",
            "msbfs",
            "sssp",
            "sssp-pull",
            "sssp-parent",
            "sssp-weighted",
            "sssp-weighted-pull",
            "widest",
            "earliest-arrival",
            "latest-departure",
            "spmv",
            "triangles",
            "kcore",
            "coreness",
            "scc",
            "msf",
            "matching",
            "mis",
            "coloring",
            "truss",
            "coarsen",
            "louvain",
            "c4",
            "hits",
            "bipartite",
            "densest",
            "local-bridges",
            "jdm",
            "dominators",
        ],
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages parquet dir (url,warc_ts,html,text,lang)")
    src.add_argument("--edges", help="edge parquet dir/file (src,dst[,weight])")
    src.add_argument("--edges-bin", help="reference-format binary edge file [src:u32][dst:u32]")
    src.add_argument("--edges-txt", help="text edge list (SNAP-style 'src dst [w]' lines; # and %% comments)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--build-dir", default=None, help="graph build dir (default: <out>/build)")
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument(
        "--dst-blocks",
        type=int,
        default=1,
        help="two-level grid exchange: receivers group into B blocks and "
        "each sender ships one message object per block (multi-node "
        "traffic cap at high P; must divide --partitions; 1 = flat)",
    )
    p.add_argument("--undirect", action="store_true", help="append reversed edges (the reference's -u)")
    p.add_argument("--weighted", action="store_true")
    p.add_argument("--synthesize-weights", action="store_true", help="w = src%%10 + dst%%10 (CREATE_WEIGHT)")
    p.add_argument("--root", type=int, default=0, help="bfs/sssp root vid (the reference's -p)")
    p.add_argument(
        "--sources",
        default=None,
        help="msbfs: comma-separated source vids (<= 63; default: --root alone)",
    )
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--k", type=int, default=10, help="kcore/truss: k parameter")
    p.add_argument("--groups", type=int, default=64, help="coarsen: number of vertex groups")
    p.add_argument("--rounds", type=int, default=3, help="louvain: parity move rounds")
    p.add_argument("--katz-alpha", type=float, default=0.01)
    p.add_argument("--katz-beta", type=float, default=1.0)
    p.add_argument(
        "--ppr-seed-mod",
        type=int,
        default=100,
        help="ppr seed rule: seeds are vertices with vid %% mod == 0",
    )
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--n-iters", type=int, default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--save-state",
        default=None,
        help="after the run, persist per-partition (vid, value) state here "
        "for later --warm-state runs (incremental recompute)",
    )
    p.add_argument(
        "--warm-state",
        default=None,
        help="pagerank only: warm-start from a prior --save-state dir "
        "(same partition count; new vertices cold-init)",
    )
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.triangles import triangle_count
    from everythinggraph_ray.pipelines.flagship import save_results
    from everythinggraph_ray.sources.binary_edges import read_binary_edges
    from everythinggraph_ray.stages import edges as E
    from everythinggraph_ray.stages.extract import pages_to_edges

    if args.pages:
        edges = pages_to_edges(
            ray.data.read_parquet(
                args.pages, columns=["url", "warc_ts", "html", "lang"]
            )
        )
    elif args.edges_bin:
        edges = read_binary_edges(args.edges_bin, weighted=args.weighted)
    elif args.edges_txt:
        from everythinggraph_ray.sources.text_edges import read_text_edges

        edges = read_text_edges(args.edges_txt, weighted=args.weighted)
    else:
        edges = ray.data.read_parquet(args.edges)

    if args.kernel == "triangles":
        n = triangle_count(edges)
        print(json.dumps({"n_triangles": n}))
        return 0

    if args.kernel == "coreness":
        import os

        from everythinggraph_ray.graph.kcore import coreness

        core, rounds = coreness(edges)
        core.write_parquet(os.path.join(args.out, "data"))
        print(json.dumps({"kernel": "coreness", "rounds": rounds, "out": args.out}))
        return 0

    if args.kernel == "bipartite":
        import os

        from everythinggraph_ray.pipelines.analytics_extra3 import bipartite_census

        bdir = args.build_dir or os.path.join(args.out, "build")
        df = bipartite_census(edges, bdir)
        ray.data.from_pandas(df).write_parquet(os.path.join(args.out, "data"))
        print(
            json.dumps(
                {
                    "kernel": "bipartite",
                    "n_components": len(df),
                    "n_bipartite": int(df["bipartite"].sum()),
                    "out": args.out,
                }
            )
        )
        return 0

    if args.kernel == "densest":
        from everythinggraph_ray.graph.triangles import _canonical_undirected
        from everythinggraph_ray.pipelines.analytics_extra4 import _densest_peel_stats

        stats = _densest_peel_stats(_canonical_undirected(edges))
        r, v, e, dppm = max(stats, key=lambda t: (t[3], t[1], -t[0]))
        print(
            json.dumps(
                {
                    "kernel": "densest",
                    "rounds": len(stats),
                    "best_round": r,
                    "n_vertices": v,
                    "n_edges": e,
                    "density_ppm": dppm,
                }
            )
        )
        return 0

    if args.kernel == "local-bridges":
        from everythinggraph_ray.pipelines.analytics_extra5 import local_bridge_census

        df = local_bridge_census(edges)
        print(
            json.dumps(
                {
                    "kernel": "local-bridges",
                    "n_edges": int(df.loc[0, "n_edges"]),
                    "n_local_bridges": int(df.loc[0, "n_local_bridges"]),
                    "bridge_ppm": int(df.loc[0, "bridge_ppm"]),
                }
            )
        )
        return 0

    if args.kernel == "jdm":
        import os

        from everythinggraph_ray.pipelines.analytics_extra7 import jdm_classes

        df = jdm_classes(edges)
        ray.data.from_pandas(df).write_parquet(os.path.join(args.out, "data"))
        print(json.dumps({"kernel": "jdm", "n_classes": len(df), "out": args.out}))
        return 0

    if args.kernel == "kcore":
        import os

        from everythinggraph_ray.graph.kcore import kcore

        core, rounds = kcore(edges, args.k)
        core.write_parquet(os.path.join(args.out, "data"))
        print(json.dumps({"kernel": "kcore", "k": args.k, "rounds": rounds, "out": args.out}))
        return 0

    if args.kernel == "scc":
        import os

        from everythinggraph_ray.graph.scc import scc

        comps, rounds = scc(edges, num_partitions=args.partitions)
        comps.write_parquet(os.path.join(args.out, "data"))
        print(json.dumps({"kernel": "scc", "rounds": rounds, "out": args.out}))
        return 0

    if args.kernel == "msf":
        import os

        from everythinggraph_ray.graph.msf import minimum_spanning_forest

        if not args.weighted and not args.synthesize_weights:
            edges = E.synthesize_weights(edges)
        forest, rounds = minimum_spanning_forest(edges)
        forest.write_parquet(os.path.join(args.out, "data"))
        print(json.dumps({"kernel": "msf", "rounds": rounds, "out": args.out}))
        return 0

    if args.kernel == "matching":
        import os

        from everythinggraph_ray.graph.matching import maximal_matching

        m, rounds = maximal_matching(edges)
        m.write_parquet(os.path.join(args.out, "data"))
        print(json.dumps({"kernel": "matching", "rounds": rounds, "out": args.out}))
        return 0

    if args.kernel == "mis":
        import os

        from everythinggraph_ray.graph.mis import maximal_independent_set

        m, rounds = maximal_independent_set(edges)
        m.write_parquet(os.path.join(args.out, "data"))
        print(json.dumps({"kernel": "mis", "rounds": rounds, "out": args.out}))
        return 0

    if args.kernel == "coloring":
        import os

        from everythinggraph_ray.graph.coloring import greedy_coloring

        c, rounds = greedy_coloring(edges)
        c.write_parquet(os.path.join(args.out, "data"))
        print(json.dumps({"kernel": "coloring", "rounds": rounds, "out": args.out}))
        return 0

    if args.kernel == "truss":
        import os

        from everythinggraph_ray.graph.truss import ktruss

        sup, rounds = ktruss(edges, max(args.k, 3))
        sup.write_parquet(os.path.join(args.out, "data"))
        print(
            json.dumps(
                {"kernel": "truss", "k": max(args.k, 3), "rounds": rounds, "out": args.out}
            )
        )
        return 0

    if args.kernel == "louvain":
        import os

        from everythinggraph_ray.graph.community import louvain_one_level

        comm = louvain_one_level(edges, n_rounds=args.rounds)
        comm.write_parquet(os.path.join(args.out, "data"))
        print(json.dumps({"kernel": "louvain", "rounds": args.rounds, "out": args.out}))
        return 0

    if args.kernel == "c4":
        from everythinggraph_ray.graph.triangles import four_cycle_count

        n = four_cycle_count(edges)
        print(json.dumps({"kernel": "c4", "n_4cycles": n, "out": args.out}))
        return 0

    if args.kernel == "coarsen":
        import os

        from everythinggraph_ray.graph.coarsen import contract

        sup = contract(E.dedup_edges(E.filter_self_loops(edges)), args.groups)
        sup.write_parquet(os.path.join(args.out, "data"))
        print(json.dumps({"kernel": "coarsen", "groups": args.groups, "out": args.out}))
        return 0

    auto_undirect = args.kernel in ("wcc", "labelprop") and not args.undirect
    if args.undirect or auto_undirect:
        edges = E.undirect_edges(edges)
    weighted = args.weighted
    if args.synthesize_weights:
        edges = E.synthesize_weights(edges)
        weighted = True
    if args.kernel in (
        "sssp-weighted", "sssp-weighted-pull", "wpagerank", "widest",
        "earliest-arrival", "latest-departure",
    ) and not weighted:
        edges = E.synthesize_weights(edges)
        weighted = True
    if args.kernel == "latest-departure":
        # the temporal dual runs over the REVERSED graph: original edge
        # (u, v, t) becomes (v, u, t) and the MAX-semiring propagates
        # the latest feasible leave time backwards from --root (target)
        edges = E.reverse_edges(edges)

    import os

    if args.build_dir:
        bdir = args.build_dir  # explicit dir: the user owns cache semantics
    else:
        # default build dir is keyed on the SOURCE (path + content
        # fingerprint) and every transform that changes the edge table —
        # otherwise `wcc` (auto-undirected) followed by `pagerank` on the
        # same --out would silently reuse the undirected build
        from hashlib import blake2b

        from everythinggraph_ray.pipelines.flagship import _path_fingerprint

        src_path = args.pages or args.edges or args.edges_bin or args.edges_txt
        sig = "|".join(
            [
                str(src_path),
                _path_fingerprint(str(src_path)),
                f"und={int(bool(args.undirect or auto_undirect))}",
                f"w={int(bool(weighted))}",
                f"rev={int(args.kernel == 'latest-departure')}",
                f"P={args.partitions}",
                f"by={'dst' if args.kernel.endswith('-pull') else 'src'}",
            ]
        )
        bdir = os.path.join(
            args.out, f"build-{blake2b(sig.encode(), digest_size=6).hexdigest()}"
        )

    if args.kernel == "pagerank-pull":
        from everythinggraph_ray.graph.pull import pagerank_pull

        if args.checkpoint_dir or args.checkpoint_every or args.resume:
            p.error(
                "pagerank-pull is the checkpoint-free cross-variant; "
                "use 'pagerank' for checkpointed/resumable runs"
            )
        build_graph(
            edges, bdir, num_partitions=args.partitions, partition_edges_by="dst"
        )
        res = pagerank_pull(
            bdir, damping=args.damping, tol=args.tol, n_iters=args.n_iters
        )
        save_results(res, args.out)
        print(
            json.dumps(
                {
                    "kernel": "pagerank-pull",
                    "iterations": res["iterations"],
                    "n_vertices": res["n_vertices"],
                    "n_edges": res["n_edges"],
                    "out": args.out,
                }
            )
        )
        return 0

    if args.kernel == "hits":
        from everythinggraph_ray.graph.hits import hits

        if args.checkpoint_dir or args.checkpoint_every or args.resume:
            p.error("hits is checkpoint-free; rerun fixed iterations instead")
        build_graph(edges, bdir, num_partitions=args.partitions, partition_edges_by="dst")
        res = hits(bdir, n_iters=args.n_iters or 10)
        save_results(res, args.out)
        print(
            json.dumps(
                {
                    "kernel": "hits",
                    "iterations": res["iterations"],
                    "n_vertices": res["n_vertices"],
                    "n_edges": res["n_edges"],
                    "out": args.out,
                }
            )
        )
        return 0

    if args.kernel in ("bfs-pull", "sssp-pull", "sssp-weighted-pull"):
        from everythinggraph_ray.graph.pull import frontier_pull

        if args.checkpoint_dir or args.checkpoint_every or args.resume:
            p.error(
                "pull frontier kernels are the checkpoint-free cross-variants; "
                "use the push form for checkpointed/resumable runs"
            )
        kind = {
            "bfs-pull": "bfs",
            "sssp-pull": "sssp_hops",
            "sssp-weighted-pull": "sssp_weighted",
        }[args.kernel]
        build_graph(
            edges, bdir, num_partitions=args.partitions,
            partition_edges_by="dst", weighted=weighted,
        )
        res = frontier_pull(bdir, args.root, kind=kind)
        save_results(res, args.out)
        print(
            json.dumps(
                {
                    "kernel": args.kernel,
                    "iterations": res["iterations"],
                    "modes": res["modes"],
                    "n_vertices": res["n_vertices"],
                    "n_edges": res["n_edges"],
                    "out": args.out,
                }
            )
        )
        return 0

    if args.kernel == "ppr":
        # the kernel needs the GLOBAL seed count up front (a partition
        # only sees its own vids); counted distributed before the build
        args.ppr_n_seeds = E.seed_vertex_count(edges, args.ppr_seed_mod)

    if args.kernel == "dominators":
        # landmark bits = the 63 smallest universe vids (distributed
        # fold); root = --root if it is a landmark, else the smallest
        import numpy as _np
        import pyarrow as _pa

        def _mins(t):
            vs = _np.unique(
                _np.r_[
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )[:63]
            return _pa.table({"v": _pa.array(vs, _pa.int64())})

        cand = edges.map_batches(_mins, batch_format="pyarrow").to_pandas()
        land = _np.unique(cand["v"].to_numpy(_np.int64))[:63]
        args._dom_bits = {int(v): i for i, v in enumerate(land)}
        args._dom_root = (
            int(args.root) if int(args.root) in args._dom_bits else int(land[0])
        )

    if args.warm_state and args.kernel != "pagerank":
        p.error("--warm-state is a pagerank-only flag")
    build_graph(
        edges,
        bdir,
        num_partitions=args.partitions,
        weighted=weighted,
        dst_blocks=args.dst_blocks,
    )
    eng = GraphEngine(bdir)
    try:
        res = eng.run(
            _get_kernel(args),
            tol=args.tol,
            n_iters=args.n_iters,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            resume=args.resume,
        )
        if args.save_state:
            eng.save_state(args.save_state)
        save_results(res, args.out)
    finally:
        eng.shutdown()
    print(
        json.dumps(
            {
                "kernel": args.kernel,
                "iterations": res["iterations"],
                "n_vertices": res["n_vertices"],
                "n_edges": res["n_edges"],
                "out": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
