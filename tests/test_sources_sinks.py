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


def test_upsert_sharded_merge_and_convergence(tmp_path):
    import numpy as np
    import pandas as pd

    import ray.data

    from everythinggraph_ray.datapipe.sink import read_sharded, upsert_sharded, write_sharded

    d = str(tmp_path / "store")
    base = pd.DataFrame(
        {"doc_id": np.arange(20), "ts": np.zeros(20, np.int64), "val": ["old"] * 20}
    )
    write_sharded(ray.data.from_pandas(base), d, num_shards=4)

    # upsert: update ids 0..4 with newer ts, insert new ids 100..102,
    # deliver a STALE duplicate for id 5 (older ts must lose)
    up = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 100, 101, 102, 5],
            "ts": [5, 5, 5, 5, 5, 1, 1, 1, -1],
            "val": ["new"] * 5 + ["ins"] * 3 + ["stale"],
        }
    )
    touched = upsert_sharded(ray.data.from_pandas(up), d, num_shards=4)
    assert touched  # some shards rewritten
    got = read_sharded(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 23
    assert (got.loc[got.doc_id < 5, "val"] == "new").all()
    assert got.loc[got.doc_id == 5, "val"].iloc[0] == "old"  # stale lost
    assert (got.loc[got.doc_id >= 100, "val"] == "ins").all()
    assert (got.loc[(got.doc_id >= 6) & (got.doc_id < 100), "val"] == "old").all()

    # redelivery converges: same upsert again -> identical state
    upsert_sharded(ray.data.from_pandas(up), d, num_shards=4)
    again = read_sharded(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again)

    # equal-ts tie resolves deterministically by row md5 (same both orders)
    t1 = pd.DataFrame({"doc_id": [7, 7], "ts": [9, 9], "val": ["a", "b"]})
    e1 = str(tmp_path / "t1")
    upsert_sharded(ray.data.from_pandas(t1), e1, num_shards=2)
    t2 = pd.DataFrame({"doc_id": [7, 7], "ts": [9, 9], "val": ["b", "a"]})
    e2 = str(tmp_path / "t2")
    upsert_sharded(ray.data.from_pandas(t2), e2, num_shards=2)
    v1 = read_sharded(e1).to_pandas()["val"].iloc[0]
    v2 = read_sharded(e2).to_pandas()["val"].iloc[0]
    assert v1 == v2


def test_upsert_sharded_untouched_shards_not_rewritten(tmp_path):
    import numpy as np
    import pandas as pd

    import ray.data

    from everythinggraph_ray.datapipe.sink import completed_shards, upsert_sharded, write_sharded
    from everythinggraph_ray.datapipe.sink import _shard_of

    d = str(tmp_path / "store")
    base = pd.DataFrame({"doc_id": np.arange(40), "ts": np.zeros(40, np.int64), "val": ["x"] * 40})
    write_sharded(ray.data.from_pandas(base), d, num_shards=8)
    before = {
        s: sorted(p.name for p in (tmp_path / "store" / f"shard={s}").glob("part-*"))
        for s in completed_shards(d)
    }
    one_id = 3
    target = int(_shard_of([one_id], 8)[0])
    up = pd.DataFrame({"doc_id": [one_id], "ts": [9], "val": ["y"]})
    touched = upsert_sharded(ray.data.from_pandas(up), d, num_shards=8)
    assert set(touched) == {target}
    for s, files in before.items():
        now = sorted(p.name for p in (tmp_path / "store" / f"shard={s}").glob("part-*"))
        if s == target:
            assert now != files  # new generation
        else:
            assert now == files  # untouched
