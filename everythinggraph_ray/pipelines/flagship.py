"""Flagship pipeline: Common-Crawl-style pages → link graph → PageRank.

The end-to-end path the north rule describes: read pages parquet →
extract (map_batches actor pool, html dropped immediately) →
keep-latest-per-url → explode links → stable vids → partitioned graph
build (hash-partition + hub split) → superstep PageRank to 1e-6 →
(vid, pagerank) Dataset. Checkpointing optional via ``checkpoint_dir``.
"""

from __future__ import annotations

import hashlib
import os

import ray.data

from everythinggraph_ray.corpus import ensure_corpus
from everythinggraph_ray.graph.build import build_graph
from everythinggraph_ray.graph.engine import GraphEngine
from everythinggraph_ray.graph.kernels import PageRankKernel
from everythinggraph_ray.stages.extract import pages_to_edges

BUILD_VERSION = "v1"  # bump when the on-disk build layout changes


def _path_fingerprint(path: str) -> str:
    """Cheap content fingerprint of a data file/dir: (name, size, mtime_ns)
    of every file, hashed. Keys the build cache to the INPUT DATA, not just
    its path — regenerating a fixture in place must invalidate the cached
    graph, or rows-only queries would silently run on the previous
    dataset's build."""
    h = hashlib.blake2b(digest_size=8)
    if os.path.isdir(path):
        for root_, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                st = os.stat(os.path.join(root_, f))
                h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        h.update(f"{os.path.basename(path)}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()


def build_dir_for(tag: str, P: int, root: str = "/tmp/egray_builds") -> str:
    # any tag segment that names an existing path contributes its data
    # fingerprint, so edits/regeneration at the same path get a fresh dir
    fps = "|".join(
        _path_fingerprint(seg) for seg in tag.split("|") if seg and os.path.exists(seg)
    )
    h = hashlib.blake2b(f"{tag}|{fps}|{P}|{BUILD_VERSION}".encode(), digest_size=8).hexdigest()
    return os.path.join(root, f"{tag.split('/')[-1][:40]}_{h}")


def web_pagerank(
    pages_dir: str,
    *,
    num_partitions: int = 8,
    tol: float = 1e-6,
    n_iters: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    keep_engine: bool = False,
):
    """pages parquet dir → PageRank result. Returns (result dict, engine or
    None); the result's 'dataset' is a Ray Dataset (vid, pagerank)."""
    # `text` is re-derived from html by the extractor: never read it here
    pages = ray.data.read_parquet(
        pages_dir, columns=["url", "warc_ts", "html", "lang"]
    )
    edges = pages_to_edges(pages)
    bdir = build_dir_for(f"web|{pages_dir}", num_partitions)
    build_graph(edges, bdir, num_partitions=num_partitions)
    eng = GraphEngine(bdir)
    res = eng.run(
        PageRankKernel(),
        tol=tol,
        n_iters=n_iters,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
    if keep_engine:
        return res, eng
    res["dataset"] = res["dataset"].materialize()
    eng.shutdown()
    return res, None


def flagship_small() -> ray.data.Dataset:
    """The driver's smoke entry: tiny corpus → full pipeline → ranks."""
    corpus = ensure_corpus(800, seed=42)
    res, _ = web_pagerank(corpus, num_partitions=4)
    return res["dataset"]


def save_results(result: dict, out_dir: str, *, partitions: int | None = None) -> str:
    """Result sink (the reference only prints, SURVEY.md §2.a S3): write the
    (vid, value) Dataset as a directory of parquet part files plus a
    metrics.json (iterations + per-superstep metrics) — the resumable,
    inspectable output layout."""
    import json
    import os

    ds = result["dataset"]
    if partitions:
        ds = ds.repartition(partitions)
    data_dir = os.path.join(out_dir, "data")
    ds.write_parquet(data_dir)
    with open(os.path.join(out_dir, "metrics.json"), "w") as fh:
        json.dump(
            {
                "iterations": result["iterations"],
                "n_vertices": result["n_vertices"],
                "n_edges": result["n_edges"],
                "metrics": result["metrics"],
            },
            fh,
        )
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as fh:
        fh.write("ok")
    return out_dir
