"""Triangle counting vs serial oracle."""

from __future__ import annotations

import numpy as np
import ray.data

from everythinggraph_ray.graph import oracle as O
from everythinggraph_ray.graph.triangles import triangle_count


def _edges_ds(sv, dv):
    import pyarrow as pa

    return ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    )


def test_known_triangles():
    # K4 has 4 triangles; add a dangling edge and a self-loop
    sv = np.array([0, 0, 0, 1, 1, 2, 3, 4], dtype=np.int64)
    dv = np.array([1, 2, 3, 2, 3, 3, 4, 4], dtype=np.int64)
    assert O.triangles_oracle(sv, dv) == 4
    assert triangle_count(_edges_ds(sv, dv)) == 4


def test_duplicates_and_direction_ignored():
    sv = np.array([0, 1, 2, 2, 1], dtype=np.int64)
    dv = np.array([1, 2, 0, 0, 0], dtype=np.int64)
    assert O.triangles_oracle(sv, dv) == 1
    assert triangle_count(_edges_ds(sv, dv)) == 1


def test_web_corpus_triangles(small_edges):
    sv, dv = small_edges
    want = O.triangles_oracle(sv, dv)
    got = triangle_count(_edges_ds(sv, dv))
    assert got == want
