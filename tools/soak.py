"""Order-of-magnitude soak (round-4 VERDICT item 4): the core engine at
10x the bench scale (default 320M edges vs bench's 32M) plus the web
extract flagship at 10x the sf0.1 corpus (200k pages vs 20k), with peak
memory and object-store spill recorded — direct evidence the streaming /
backpressure claims hold an order of magnitude above the per-round bench.

    python tools/soak.py [--edges 320000000] [--vertices 2000000]
                         [--pages 200000] [--cpus 32]

Prints one JSON line; intended to be summarized into BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mem_used_gib() -> float:
    """System used memory (GiB) via /proc/meminfo — covers the driver,
    every Ray worker, and the plasma store without per-pid bookkeeping."""
    info = {}
    with open("/proc/meminfo") as fh:
        for ln in fh:
            k, v = ln.split(":", 1)
            info[k] = int(v.split()[0])  # kB
    return (info["MemTotal"] - info["MemAvailable"]) / (1024 * 1024)


def _spill_bytes() -> int:
    total = 0
    for pat in ("/tmp/ray/session_*/ray_spilled_objects*/*", "/tmp/ray/spill*/*"):
        for f in glob.glob(pat):
            try:
                total += os.path.getsize(f)
            except OSError:
                pass
    return total


class MemWatch(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.base = _mem_used_gib()
        self.peak = self.base
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _mem_used_gib())
            self._stop.wait(0.5)

    def stop(self) -> float:
        self._stop.set()
        self.peak = max(self.peak, _mem_used_gib())
        return self.peak


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=320_000_000)
    ap.add_argument("--vertices", type=int, default=2_000_000)
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--parts", type=int, default=32)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from everythinggraph_ray.benchgraph import ensure_bench_edges
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import PageRankKernel, WCCKernel
    from everythinggraph_ray.pipelines.flagship import build_dir_for

    out: dict = {"edges": args.edges, "vertices": args.vertices,
                 "pages": args.pages, "num_cpus": args.cpus, "parts": args.parts}
    watch = MemWatch()
    watch.start()

    # --- phase 1: synthesize the 10x edge table (cached) -----------------
    t0 = time.perf_counter()
    edir = ensure_bench_edges(args.vertices, args.edges)
    out["synth_sec"] = round(time.perf_counter() - t0, 1)

    # --- phase 2: partitioned build --------------------------------------
    bdir = build_dir_for(f"soak|{edir}", args.parts)
    t0 = time.perf_counter()
    meta = build_graph(ray.data.read_parquet(edir), bdir, num_partitions=args.parts)
    out["build_sec"] = round(time.perf_counter() - t0, 1)
    out["n_edges"] = meta["n_edges"]
    out["hubs"] = len(meta["hub_vids"])

    # --- phase 3: PageRank to 1e-6 ---------------------------------------
    eng = GraphEngine(bdir)
    try:
        t0 = time.perf_counter()
        res = eng.run(PageRankKernel(), tol=1e-6)
        out["pagerank_sec"] = round(time.perf_counter() - t0, 1)
        out["pagerank_iters"] = res["iterations"]
        walls = sorted(m["wall_sec"] for m in res["metrics"])
        med = walls[len(walls) // 2]
        out["median_superstep_sec"] = round(med, 3)
        out["edges_per_sec_superstep"] = round(meta["n_edges"] / med, 0)

        # --- phase 4: WCC to fixpoint on the same pinned layout ----------
        t0 = time.perf_counter()
        wres = eng.run(WCCKernel())
        out["wcc_sec"] = round(time.perf_counter() - t0, 1)
        out["wcc_iters"] = wres["iterations"]
    finally:
        eng.shutdown()

    # --- phase 5: web extract flagship at 10x corpus ---------------------
    from everythinggraph_ray.corpus import ensure_corpus
    from everythinggraph_ray.stages.edges import dedup_edges
    from everythinggraph_ray.stages.extract import pages_to_edges

    t0 = time.perf_counter()
    corpus = ensure_corpus(args.pages, seed=42)
    out["corpus_sec"] = round(time.perf_counter() - t0, 1)
    pages = ray.data.read_parquet(corpus, columns=["url", "warc_ts", "html", "lang"])
    t0 = time.perf_counter()
    n_edges_web = dedup_edges(pages_to_edges(pages)).count()
    out["extract_dedup_sec"] = round(time.perf_counter() - t0, 1)
    out["web_edges"] = int(n_edges_web)

    out["peak_mem_gib"] = round(watch.stop(), 1)
    out["base_mem_gib"] = round(watch.base, 1)
    out["spill_bytes"] = _spill_bytes()
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
