"""Checkpoint/resume equivalence (FIXTURES.md F4 / north rule)."""

from __future__ import annotations

import json
import os

import numpy as np

from everythinggraph_ray.graph.engine import GraphEngine, _latest_checkpoint
from everythinggraph_ray.graph.kernels import PageRankKernel


def test_resume_mid_pagerank_is_bitwise_identical(small_build, tmp_path):
    ckpt = str(tmp_path / "ckpt")

    # uninterrupted run
    eng = GraphEngine(small_build)
    try:
        full = eng.run(PageRankKernel(), tol=1e-6)
        full_df = full["dataset"].to_pandas().sort_values("vid")
    finally:
        eng.shutdown()

    # interrupted: run only 7 supersteps, checkpointing every 3
    eng1 = GraphEngine(small_build)
    try:
        eng1.run(
            PageRankKernel(), n_iters=7, checkpoint_dir=ckpt, checkpoint_every=3
        )
    finally:
        eng1.shutdown()
    latest = _latest_checkpoint(ckpt)
    assert latest == 6  # supersteps 3 and 6 snapshotted
    lineage = json.load(open(os.path.join(ckpt, "lineage.json")))
    assert lineage["superstep"] == 6
    assert lineage["metrics"][-1]["superstep"] == 6
    assert lineage["input"]["n_edges"] > 0

    # fresh engine resumes from superstep 6 and finishes
    eng2 = GraphEngine(small_build)
    try:
        resumed = eng2.run(
            PageRankKernel(), tol=1e-6, checkpoint_dir=ckpt, resume=True
        )
        res_df = resumed["dataset"].to_pandas().sort_values("vid")
    finally:
        eng2.shutdown()

    assert resumed["iterations"] == full["iterations"]
    # bitwise identical: same float ops in the same order per partition
    assert np.array_equal(
        full_df["pagerank"].to_numpy(), res_df["pagerank"].to_numpy()
    )
    # metrics cover the full history (pre-resume + post-resume)
    assert [m["superstep"] for m in resumed["metrics"]] == list(
        range(1, resumed["iterations"] + 1)
    )
