"""Feature propagation (multi-channel SpMM): serial parity + semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from everythinggraph_ray.graph.featprop import (
    feature_propagation,
    features_from_embeddings,
)


def _serial(edges, feats, n_iters, dim, n_vids):
    # feats: dict vid -> np.array(dim)
    e = sorted(set(edges))
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    x = {v: feats.get(v, None) for v in range(n_vids)}
    for _ in range(n_iters):
        nxt = {}
        for u, v in e:
            if x.get(u) is None:
                continue
            c = x[u] / outdeg[u]
            nxt[v] = nxt.get(v, np.zeros(dim)) + c
        x = nxt
    return x


def test_featprop_matches_serial():
    rng = np.random.default_rng(9)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 40, size=(300, 2))]
    eds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(5)
    dim = 3
    fmat = rng.standard_normal((25, dim))
    feats = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(25), pa.int64()),
                **{f"f{i}": pa.array(fmat[:, i], pa.float64()) for i in range(dim)},
            }
        )
    )
    got = (
        feature_propagation(eds, feats, n_iters=2, dim=dim)
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    want = _serial(edges, {i: fmat[i] for i in range(25)}, 2, dim, 40)
    want = {v: a for v, a in want.items() if a is not None}
    assert set(got["vid"]) == set(want)
    for _, row in got.iterrows():
        np.testing.assert_allclose(
            [row[f"f{i}"] for i in range(dim)], want[int(row["vid"])], rtol=1e-9
        )


def test_features_from_embeddings_slices():
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([3, 7], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0]],
                    pa.list_(pa.float32(), 4),
                ),
            }
        )
    )
    df = features_from_embeddings(emb, 2).to_pandas().sort_values("vid")
    assert list(df.columns) == ["vid", "f0", "f1"]
    assert df["f0"].tolist() == [1.0, 5.0]
    assert df["f1"].tolist() == [2.0, 6.0]
