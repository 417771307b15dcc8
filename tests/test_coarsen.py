"""contract (graph/coarsen.py) vs a pandas brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from everythinggraph_ray.graph.coarsen import contract


def _brute(df: pd.DataFrame, g: int, drop_self: bool = True) -> pd.DataFrame:
    d = df.copy()
    d["src"], d["dst"] = d["src"] % g, d["dst"] % g
    if drop_self:
        d = d[d["src"] != d["dst"]]
    out = d.groupby(["src", "dst"], as_index=False).size()
    out["weight"] = out.pop("size").astype(float)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def _run(df: pd.DataFrame, g: int, **kw) -> pd.DataFrame:
    out = contract(ray.data.from_pandas(df), g, **kw).to_pandas()
    if out.empty:
        return out
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def test_matches_brute_force():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 500, 4000).astype(np.int64),
            "dst": rng.integers(0, 500, 4000).astype(np.int64),
        }
    ).drop_duplicates()
    for g in (4, 16, 100):
        pd.testing.assert_frame_equal(_run(df, g), _brute(df, g))


def test_self_loop_handling():
    df = pd.DataFrame({"src": [0, 1, 2, 10], "dst": [10, 11, 3, 0]})
    # g=10: 0->10 and 10->0 contract to 0<->0 (self), 1->11 to 1->1 (self)
    out = _run(df, 10)
    pd.testing.assert_frame_equal(out, _brute(df, 10))
    assert (out["src"] != out["dst"]).all()
    kept = _run(df, 10, drop_self_loops=False)
    pd.testing.assert_frame_equal(kept, _brute(df, 10, drop_self=False))
    assert kept["weight"].sum() == len(df)


def test_custom_grouping_and_partition_invariance():
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 300, 2500).astype(np.int64),
            "dst": rng.integers(0, 300, 2500).astype(np.int64),
        }
    )
    g = 8
    grp = lambda v: (v // 40) % g  # noqa: E731
    a = contract(ray.data.from_pandas(df), g, group_of=grp).to_pandas()
    b = contract(ray.data.from_pandas(df).repartition(9), g, group_of=grp).to_pandas()
    a = a.sort_values(["src", "dst"]).reset_index(drop=True)
    b = b.sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    d = df.copy()
    d["src"], d["dst"] = grp(d["src"].to_numpy()), grp(d["dst"].to_numpy())
    d = d[d["src"] != d["dst"]]
    want = d.groupby(["src", "dst"], as_index=False).size()
    want["weight"] = want.pop("size").astype(float)
    pd.testing.assert_frame_equal(a, want.sort_values(["src", "dst"]).reset_index(drop=True))
