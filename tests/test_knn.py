"""Similarity search: brute-force exactness + LSH recall."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from everythinggraph_ray.datapipe.knn import knn_bruteforce, knn_lsh


def _emb_ds(n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return (
        ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n), pa.int64()),
                    "embedding": pa.array(m.tolist(), pa.list_(pa.float32(), dim)),
                }
            )
        ),
        m,
    )


def _numpy_topk(m, q_idx, k):
    m64 = m.astype(np.float64)
    m64 = m64 / np.linalg.norm(m64, axis=1, keepdims=True)
    sims = m64 @ m64[q_idx]
    sims[q_idx] = -np.inf
    order = np.lexsort((np.arange(len(m)), -sims))
    return order[:k]


def test_bruteforce_matches_numpy():
    ds, m = _emb_ds()
    out = knn_bruteforce(ds, [0, 5], k=10)
    for q in (0, 5):
        got = out[out["query_id"] == q].sort_values("rank")["neighbor_id"].to_numpy()
        want = _numpy_topk(m, q, 10)
        assert np.array_equal(got, want)


def test_bruteforce_multiple_batches():
    ds, m = _emb_ds(n=500)
    ds = ds.repartition(8)  # force several batches → exercises the combiner
    out = knn_bruteforce(ds, [7], k=5)
    got = out.sort_values("rank")["neighbor_id"].to_numpy()
    assert np.array_equal(got, _numpy_topk(m, 7, 5))


def test_lsh_recall():
    ds, m = _emb_ds(n=400)
    brute = knn_bruteforce(ds, [3], k=10)
    approx = knn_lsh(ds, [3], k=10, n_planes=6, multiprobe=1)
    b = set(brute["neighbor_id"])
    a = set(approx["neighbor_id"])
    recall = len(a & b) / len(b)
    assert recall >= 0.5  # approximate, but must find a decent fraction


def test_embedding_near_duplicates():
    from everythinggraph_ray.datapipe.knn import embedding_near_duplicates

    rng = np.random.default_rng(9)
    base = rng.standard_normal((50, 16)).astype(np.float32)
    # rows 50..54 are near-copies of rows 0..4 (tiny noise)
    near = base[:5] + 0.01 * rng.standard_normal((5, 16)).astype(np.float32)
    m = np.vstack([base, near])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(m)), pa.int64()),
                "embedding": pa.array(m.tolist(), pa.list_(pa.float32(), 16)),
            }
        )
    )
    out = embedding_near_duplicates(ds, threshold=0.98).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    for i in range(5):
        assert (i, 50 + i) in pairs, f"missing near-dup pair {(i, 50+i)}"
    # unrelated random vectors in 16-d rarely reach cos 0.98
    assert len(pairs) < 15


def test_ivf_recall():
    """IVF on clustered data: decent recall vs brute force, and probing
    ALL centroids recovers the exact answer."""
    from everythinggraph_ray.datapipe.knn import knn_ivf

    rng = np.random.default_rng(21)
    centers = rng.standard_normal((6, 16)) * 4
    m = np.vstack([c + rng.standard_normal((80, 16)) for c in centers]).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(m)), pa.int64()),
                "embedding": pa.array(m.tolist(), pa.list_(pa.float32(), 16)),
            }
        )
    )
    brute = knn_bruteforce(ds, [3, 200], k=10)
    approx = knn_ivf(ds, [3, 200], k=10, n_centroids=8, n_probe=3, sample_cap=480)
    for q in (3, 200):
        b = set(brute[brute.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        assert len(a & b) / len(b) >= 0.5, f"query {q} recall too low"
    # probing every centroid == exact brute force
    exact = knn_ivf(ds, [3], k=10, n_centroids=8, n_probe=8, sample_cap=480)
    got = exact.sort_values("rank")["neighbor_id"].to_numpy()
    want = brute[brute.query_id == 3].sort_values("rank")["neighbor_id"].to_numpy()
    assert np.array_equal(got, want)


def test_emb_near_dup_query_recovers_planted_pairs():
    """q_emb_near_dup plants jittered copies (id + 10^9) so the non-empty
    verify path runs against the driver fixture — every planted pair must
    be recovered with cos close to 1."""
    from everythinggraph_ray.pipelines.queries import (
        KNN_QUERIES,
        NEARDUP_ID_OFFSET,
        q_emb_near_dup,
    )
    from everythinggraph_ray.datapipe.knn import smallest_ids

    sf = "/root/testdata/sf0.001"
    out = q_emb_near_dup(sf)
    emb = ray.data.read_parquet(sf + "/embeddings.parquet")
    ids = smallest_ids(emb, "vec_id", KNN_QUERIES)
    pairs = set(zip(out["a"], out["b"]))
    for i in ids:
        assert (i, i + NEARDUP_ID_OFFSET) in pairs
    assert (out["cos"] > 0.99).all()


def test_emb_kmeans_matches_serial():
    import pandas as pd
    import pyarrow as pa

    from everythinggraph_ray.datapipe.cluster import emb_kmeans, kmeans_serial
    from everythinggraph_ray.stages.agg import mix64

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 16)) * 5  # well-separated blobs
    X = np.concatenate([c + rng.normal(size=(200, 16)) * 0.2 for c in centers])
    ids = np.arange(len(X), dtype=np.int64)
    perm = rng.permutation(len(X))
    X, ids = X[perm], ids[perm]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float64())),
            }
        )
    ).repartition(6)
    res = emb_kmeans(ds, n_clusters=4, n_iters=6, sample_cap=100)
    got = res["assignments"].to_pandas().sort_values("vec_id").reset_index(drop=True)
    mod = max(1, len(X) // 100)
    mask = mix64(ids) % np.uint64(mod) == 0
    exp_a, exp_c = kmeans_serial(
        X, ids, n_clusters=4, n_iters=6, seed=17, sample_mask=mask
    )
    exp = (
        pd.DataFrame({"vec_id": ids, "cluster": exp_a})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (got["cluster"].to_numpy() == exp["cluster"].to_numpy()).all()
    np.testing.assert_allclose(res["centroids"], exp_c, rtol=0, atol=1e-9)
    assert int(res["sizes"].sum()) == len(X)
    # empty input keeps a stable schema
    empty = ray.data.from_arrow(
        pa.table({"vec_id": pa.array([], pa.int64()), "embedding": pa.array([], pa.list_(pa.float64()))})
    )
    r0 = emb_kmeans(empty, n_clusters=4)
    assert r0["assignments"].count() == 0


def test_power_iteration_matches_numpy_eig():
    import numpy as np
    import pandas as pd

    import ray.data

    from everythinggraph_ray.datapipe.cluster import emb_power_iteration

    rng = np.random.default_rng(3)
    # anisotropic cloud: a dominant direction plus noise
    base = rng.normal(size=(300, 6))
    base[:, 0] *= 5.0
    base[:, 1] *= 2.0
    df = pd.DataFrame(
        {"vec_id": np.arange(300), "embedding": [r.astype(np.float32) for r in base]}
    )
    res = emb_power_iteration(ray.data.from_pandas(df), n_iters=60)
    X = np.stack(df["embedding"]).astype(np.float64)
    Xc = X - X.mean(axis=0)
    C = Xc.T @ Xc / len(X)
    w, V = np.linalg.eigh(C)
    top = V[:, -1]
    got = np.asarray(res["component"])
    # eigenvector up to sign
    assert min(np.abs(got - top).max(), np.abs(got + top).max()) < 1e-6
    assert abs(res["eigenvalue"] - w[-1]) < 1e-8
    assert abs(res["explained_ratio"] - w[-1] / np.trace(C)) < 1e-9
    # partition invariance (allclose, not bit-equal — float reassociation)
    res7 = emb_power_iteration(ray.data.from_pandas(df).repartition(7), n_iters=60)
    assert np.allclose(res7["component"], got, atol=1e-10)


def test_logreg_matches_serial_and_learns():
    import numpy as np
    import pandas as pd

    import ray.data

    from everythinggraph_ray.datapipe.cluster import emb_logreg

    rng = np.random.default_rng(5)
    # separable-ish: class 0 shifted along a direction
    X = rng.normal(size=(400, 8))
    y = (rng.random(400) < 0.5).astype(int)
    X[y == 0] += 1.5
    df = pd.DataFrame(
        {"embedding": [r.astype(np.float32) for r in X], "label": y}
    )
    res = emb_logreg(ray.data.from_pandas(df), n_iters=40)
    assert res["accuracy"] > 0.85
    assert res["n"] == 400

    # serial replica: identical full-batch GD must match to float tolerance
    Xd = np.stack(df["embedding"]).astype(np.float64)
    yd = (df["label"].to_numpy() == 0).astype(np.float64)
    w = np.zeros(8)
    b = 0.0
    for _ in range(40):
        p = 1.0 / (1.0 + np.exp(-(Xd @ w + b)))
        r = p - yd
        w = w * (1.0 - 0.5 * 1e-4) - 0.5 * (Xd.T @ r / len(yd))
        b -= 0.5 * r.mean()
    assert np.allclose(res["weights"], w, atol=1e-9)
    assert abs(res["bias"] - b) < 1e-9

    # partition invariance (float reassociation tolerance)
    res7 = emb_logreg(ray.data.from_pandas(df).repartition(7), n_iters=40)
    assert np.allclose(res7["weights"], res["weights"], atol=1e-9)
