"""Binary edge-file reader/writer (S1) and the results sink (S3)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray.data

from everythinggraph_ray.graph import oracle as O
from everythinggraph_ray.graph.engine import GraphEngine
from everythinggraph_ray.graph.kernels import PageRankKernel, SpMVEdgeCentricKernel
from everythinggraph_ray.pipelines.flagship import save_results
from everythinggraph_ray.sources.binary_edges import read_binary_edges, write_binary_edges


def _ds(sv, dv, w=None):
    cols = {"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())}
    if w is not None:
        cols["weight"] = pa.array(w, pa.float64())
    return ray.data.from_arrow(pa.table(cols))


def test_binary_roundtrip_unweighted(tmp_path):
    rng = np.random.default_rng(1)
    sv = rng.integers(0, 1000, 500).astype(np.int64)
    dv = rng.integers(0, 1000, 500).astype(np.int64)
    f = str(tmp_path / "edges.bin")
    n = write_binary_edges(_ds(sv, dv), f)
    assert n == 500
    assert os.path.getsize(f) == 500 * 8  # item_size unweighted, init_all.c:43-49
    back = read_binary_edges(f).to_pandas()
    assert np.array_equal(np.sort(back["src"]), np.sort(sv))
    # row-level equality (order within file preserved per batch)
    got = set(zip(back["src"], back["dst"]))
    assert got == set(zip(sv, dv))


def test_binary_roundtrip_weighted(tmp_path):
    sv = np.array([1, 2, 3], dtype=np.int64)
    dv = np.array([4, 5, 6], dtype=np.int64)
    w = np.array([0.5, 1.25, 3.0])
    f = str(tmp_path / "edges_w.bin")
    write_binary_edges(_ds(sv, dv, w), f, weighted=True)
    assert os.path.getsize(f) == 3 * 12
    back = read_binary_edges(f, weighted=True).to_pandas().sort_values("src")
    assert back["weight"].tolist() == [0.5, 1.25, 3.0]


def test_spmv_edgecentric_matches_oracle(small_edges, tmp_path):
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.stages.edges import reverse_edges

    sv, dv = small_edges
    bdir = str(tmp_path / "rev")
    build_graph(reverse_edges(_ds(sv, dv)), bdir, num_partitions=4, hub_threshold=10**9)
    eng = GraphEngine(bdir)
    try:
        res = eng.run(SpMVEdgeCentricKernel())
        df = res["dataset"].to_pandas().sort_values("vid")
    finally:
        eng.shutdown()
    ovids, oy = O.spmv_edgecentric_oracle(sv, dv)
    assert np.array_equal(df["vid"].to_numpy(), ovids)
    assert np.array_equal(df["spmv_edgecentric"].to_numpy(), oy)


def test_save_results_sink(small_build, tmp_path):
    eng = GraphEngine(small_build)
    try:
        res = eng.run(PageRankKernel(), n_iters=3)
        out = save_results(res, str(tmp_path / "out"))
    finally:
        eng.shutdown()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    m = json.load(open(os.path.join(out, "metrics.json")))
    assert m["iterations"] == 3 and len(m["metrics"]) == 3
    back = ray.data.read_parquet(os.path.join(out, "data")).to_pandas()
    assert len(back) == res["n_vertices"]
    assert set(back.columns) == {"vid", "pagerank"}


def test_read_text_edges_snap_and_csv(tmp_path):
    """SNAP-style whitespace edge lists (# / % comments, mixed tabs) and
    weighted CSV both parse vectorized into the engine's edge schema."""
    from everythinggraph_ray.sources.text_edges import read_text_edges

    p = tmp_path / "g.txt"
    p.write_text("# comment\n% header\n0 1\n1\t2\n\n2   3\n")
    df = read_text_edges(str(p)).to_pandas()
    assert df["src"].tolist() == [0, 1, 2] and df["dst"].tolist() == [1, 2, 3]

    c = tmp_path / "g.csv"
    c.write_text("5,6,1.5\n6,7,2.25\n")
    dfw = read_text_edges(str(c), weighted=True, delimiter=",").to_pandas()
    assert dfw["weight"].tolist() == [1.5, 2.25]

    bad = tmp_path / "bad.txt"
    bad.write_text("1 2\n3\n")
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_text_edges(str(bad)).to_pandas()
