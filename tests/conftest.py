"""Session-scoped Ray fixture: one ray.init per pytest session."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    """Deterministic ~200-page corpus (FIXTURES.md 'tiny')."""
    from everythinggraph_ray.corpus import ensure_corpus

    return ensure_corpus(200, seed=42)


@pytest.fixture(scope="session")
def small_corpus():
    """Deterministic ~800-page corpus for kernel correctness."""
    from everythinggraph_ray.corpus import ensure_corpus

    return ensure_corpus(800, seed=42)


@pytest.fixture(scope="session")
def small_edges(small_corpus):
    """(src, dst) numpy arrays from the serial (oracle) extraction path."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from everythinggraph_ray.hashing import urls_to_vids
    from everythinggraph_ray.html import extract_links

    t = pq.read_table(small_corpus)
    df = pd.DataFrame(
        {
            "url": t["url"].to_pylist(),
            "ts": t["warc_ts"].to_pandas(),
            "html": t["html"].to_pylist(),
        }
    )
    df = df.sort_values("ts").groupby("url", as_index=False).tail(1)
    src, dst = [], []
    for u, h in zip(df["url"], df["html"]):
        for l in extract_links(h, u):
            src.append(u)
            dst.append(l)
    return urls_to_vids(src), urls_to_vids(dst)


@pytest.fixture(scope="session")
def small_build(small_corpus, tmp_path_factory):
    """Partitioned graph build of the small corpus (directed)."""
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.stages.extract import pages_to_edges

    bdir = str(tmp_path_factory.mktemp("build") / "small")
    edges = pages_to_edges(ray.data.read_parquet(small_corpus))
    build_graph(edges, bdir, num_partitions=4, hub_threshold=8)
    return bdir


@pytest.fixture(scope="session")
def small_build_undirected(small_corpus, tmp_path_factory):
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.stages.edges import undirect_edges
    from everythinggraph_ray.stages.extract import pages_to_edges

    bdir = str(tmp_path_factory.mktemp("build") / "small_und")
    edges = undirect_edges(pages_to_edges(ray.data.read_parquet(small_corpus)))
    build_graph(edges, bdir, num_partitions=4, hub_threshold=8)
    return bdir
