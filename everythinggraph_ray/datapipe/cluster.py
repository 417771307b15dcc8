"""Embedding clustering: distributed spherical k-means (full Lloyd).

knn.py's IVF trains on a bounded SAMPLE (enough for routing); this is
the full-corpus refinement for when the clusters themselves are the
product (topic buckets, dedup prefilters, curriculum tiers):

    init:    deterministic sample k-means (the IVF recipe — vec_id-hash
             subsample, seeded choice) on the driver;
    iterate: each Lloyd step is ONE streaming pass — per batch, assign
             rows to the nearest centroid (broadcast k×d matrix) and
             emit <= k partial rows (cluster, count, sum-vector); the
             driver reduces k×d floats, never rows;
    output:  one final assignment pass → (vec_id, cluster) Dataset,
             plus the centroid matrix.

Driver state per iteration is k×(d+1) floats — the broadcast-side
contract, independent of corpus size. Partial sums are reduced in
arrival order, so centroid bits can differ across runs at ~1e-16; the
ASSIGNMENT is stable whenever clusters are separated by more than that
(tests use separated fixtures; ties were already init-dependent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.knn import _normalize


def emb_kmeans(
    embeddings: ray.data.Dataset,
    *,
    n_clusters: int = 8,
    n_iters: int = 10,
    sample_cap: int = 4096,
    seed: int = 17,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> dict:
    """Returns {"assignments": Dataset(vec_id, cluster), "centroids":
    ndarray[k, d], "sizes": ndarray[k]}."""
    from everythinggraph_ray.stages.agg import mix64

    total = embeddings.count()
    if total == 0:
        return {
            "assignments": ray.data.from_arrow(
                pa.table({id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())})
            ),
            "centroids": np.zeros((0, 0)),
            "sizes": np.zeros(0, np.int64),
        }
    mod = max(1, total // sample_cap)

    def grab_sample(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(mix64(ids) % np.uint64(mod) == 0))

    # sort by id: Ray block order is scheduling-dependent (preserve_order
    # defaults off), and the seeded init must see ONE canonical sample
    # order to be deterministic across runs and cluster sizes
    sm = (
        embeddings.map_batches(grab_sample, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col)
    )
    X = _normalize(np.stack(sm[emb_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)].copy()
    for _ in range(4):  # short sample warm-start
        a = np.argmax(X @ cents.T, axis=1)
        for c in range(len(cents)):
            m = a == c
            if m.any():
                v = X[m].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-30)

    k, d = cents.shape

    def partials_fn(cref):
        def partials(batch: pa.Table) -> pa.Table:
            C = ray.get(cref)  # zero-copy from plasma, shared per node
            V = _normalize(
                np.stack(batch[emb_col].to_numpy(zero_copy_only=False)).astype(np.float64)
            )
            a = np.argmax(V @ C.T, axis=1).astype(np.int64)
            rows_c, rows_n, rows_s = [], [], []
            for c in np.unique(a):
                m = a == c
                rows_c.append(int(c))
                rows_n.append(int(m.sum()))
                rows_s.append(V[m].sum(axis=0))
            return pa.table(
                {
                    "cluster": pa.array(rows_c, pa.int64()),
                    "n": pa.array(rows_n, pa.int64()),
                    "s": pa.array([x.tolist() for x in rows_s], pa.list_(pa.float64())),
                }
            )

        return partials

    sizes = np.zeros(k, np.int64)
    for _ in range(n_iters):
        cref = ray.put(cents)
        part = embeddings.map_batches(partials_fn(cref), batch_format="pyarrow").to_pandas()
        sums = np.zeros((k, d), np.float64)
        sizes = np.zeros(k, np.int64)
        for c, n, s in zip(part["cluster"], part["n"], part["s"]):
            sums[c] += np.asarray(s)
            sizes[c] += n
        nz = sizes > 0
        newc = cents.copy()
        newc[nz] = sums[nz] / np.maximum(
            np.linalg.norm(sums[nz], axis=1, keepdims=True), 1e-30
        )
        cents = newc

    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        V = _normalize(
            np.stack(batch[emb_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(np.argmax(V @ C.T, axis=1).astype(np.int64), pa.int64()),
            }
        )

    return {
        "assignments": embeddings.map_batches(assign, batch_format="pyarrow"),
        "centroids": cents,
        "sizes": sizes,
    }


def kmeans_serial(X: np.ndarray, ids: np.ndarray, *, n_clusters: int, n_iters: int, seed: int, sample_mask: np.ndarray):
    """Serial oracle mirroring emb_kmeans: same sample warm-start, full
    Lloyd steps. Returns (assignment per row of X, centroids)."""
    Xn = _normalize(X.astype(np.float64))
    o = np.argsort(ids[sample_mask])  # canonical id-sorted sample order
    S = Xn[sample_mask][o]
    rng = np.random.default_rng(seed)
    cents = S[rng.choice(len(S), size=min(n_clusters, len(S)), replace=False)].copy()
    for _ in range(4):
        a = np.argmax(S @ cents.T, axis=1)
        for c in range(len(cents)):
            m = a == c
            if m.any():
                v = S[m].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-30)
    for _ in range(n_iters):
        a = np.argmax(Xn @ cents.T, axis=1)
        newc = cents.copy()
        for c in range(len(cents)):
            m = a == c
            if m.any():
                v = Xn[m].sum(axis=0)
                newc[c] = v / max(np.linalg.norm(v), 1e-30)
        cents = newc
    return np.argmax(Xn @ cents.T, axis=1), cents


def emb_power_iteration(
    emb: ray.data.Dataset,
    *,
    n_iters: int = 30,
    center: bool = True,
    vec_col: str = "embedding",
) -> dict:
    """Top principal component of the embedding matrix by distributed
    power iteration — the PCA/whitening primitive of embedding pipelines.

    Every step is ONE streaming pass: a batch of B rows reduces to the
    d-vector partial Xc^T (Xc v) (plus a scalar), so the driver holds
    d+O(1) floats per iteration and nothing ever materializes.  The mean
    (for centering) and total variance come from one prior pass of
    (d+1)-float partials.  v0 = ones/sqrt(d) — deterministic, no RNG.

    Returns {"component": (d,) unit vector, "eigenvalue": population
    variance along it, "explained_ratio": eigenvalue / total variance,
    "n": rows, "iters": n_iters}.  float64 partial sums: results are
    reproducible to ~1e-12 across partitionings (allclose-tested vs
    numpy), not bit-identical — inherent to reassociated float addition."""

    def stats_partial(batch: pa.Table) -> pa.Table:
        X = np.stack(batch[vec_col].to_pylist()).astype(np.float64)
        row = np.concatenate([[X.shape[0]], X.sum(axis=0), [(X * X).sum()]])
        return pa.table({"s": pa.array([row.tobytes()], pa.binary())})

    def fold(ds: ray.data.Dataset) -> np.ndarray:
        rows = [np.frombuffer(b, dtype=np.float64) for b in ds.to_pandas()["s"]]
        return np.sum(rows, axis=0)

    s = fold(emb.map_batches(stats_partial, batch_format="pyarrow"))
    n, mu_sum, sq = s[0], s[1:-1], s[-1]
    if n == 0:
        raise ValueError("empty embedding dataset")
    d = len(mu_sum)
    mu = (mu_sum / n) if center else np.zeros(d)
    total_var = sq / n - float(mu @ mu)

    v = np.ones(d) / np.sqrt(d)
    eig = 0.0
    for _ in range(n_iters):
        vref = ray.put(v)
        muref = ray.put(mu)

        def step(batch: pa.Table) -> pa.Table:
            X = np.stack(batch[vec_col].to_pylist()).astype(np.float64) - ray.get(muref)
            y = X @ ray.get(vref)
            return pa.table(
                {"s": pa.array([np.concatenate([X.T @ y, [0.0]]).tobytes()], pa.binary())}
            )

        w = fold(emb.map_batches(step, batch_format="pyarrow"))[:-1] / n
        eig = float(np.linalg.norm(w))
        if eig == 0.0:
            break
        v = w / eig
    return {
        "component": v,
        "eigenvalue": eig,
        "explained_ratio": eig / total_var if total_var > 0 else 0.0,
        "n": int(n),
        "iters": n_iters,
    }


def emb_logreg(
    emb: ray.data.Dataset,
    *,
    positive_label: int = 0,
    n_iters: int = 50,
    lr: float = 0.5,
    l2: float = 1e-4,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> dict:
    """Binary (one-vs-rest) logistic regression by deterministic
    FULL-BATCH gradient descent — the distributed model-fitting shape: a
    training step is ONE streaming pass whose batches each reduce to a
    (d+2)-float partial (gradient, loss, count); the driver holds only
    the weight vector.  No RNG anywhere: w0 = 0, full-batch gradients,
    fixed step size.  Mirrors a quality-classifier training pass over
    corpus features at 100 TB (where the pass shape, not the model,
    is the point).

    Returns {"weights": (d,), "bias": float, "loss": final mean NLL,
    "accuracy": training accuracy, "n": rows}."""

    def pass_fn(w, b, mode):
        wref = ray.put(np.asarray(w, dtype=np.float64))

        def f(batch: pa.Table) -> pa.Table:
            X = np.stack(batch[vec_col].to_pylist()).astype(np.float64)
            y = (
                batch[label_col].to_numpy(zero_copy_only=False) == positive_label
            ).astype(np.float64)
            z = X @ ray.get(wref) + b
            p = 1.0 / (1.0 + np.exp(-z))
            if mode == "grad":
                r = p - y
                out = np.concatenate([X.T @ r, [r.sum()], [len(y)]])
            else:
                eps = 1e-12
                nll = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
                acc = ((p >= 0.5) == (y > 0.5)).sum()
                out = np.array([nll, acc, len(y)], dtype=np.float64)
            return pa.table({"s": pa.array([out.tobytes()], pa.binary())})

        rows = [
            np.frombuffer(x, dtype=np.float64)
            for x in emb.map_batches(f, batch_format="pyarrow").to_pandas()["s"]
        ]
        return np.sum(rows, axis=0)

    # probe dimension from one batch
    d = len(emb.take_batch(1, batch_format="pyarrow")[vec_col][0].as_py())
    w = np.zeros(d)
    b = 0.0
    n = None
    for _ in range(n_iters):
        g = pass_fn(w, b, "grad")
        n = g[-1]
        gw, gb = g[:d] / n, g[d] / n
        w = w * (1.0 - lr * l2) - lr * gw
        b -= lr * gb
    m = pass_fn(w, b, "eval")
    return {
        "weights": w,
        "bias": float(b),
        "loss": float(m[0] / m[2]),
        "accuracy": float(m[1] / m[2]),
        "n": int(m[2]),
    }


def gram_matrix(
    embeddings: ray.data.Dataset,
    *,
    label_col: str = "label",
    emb_col: str = "embedding",
    round_to: int = 7,
) -> pd.DataFrame:
    """Distributed normal equations: the upper-triangle Gram matrix
    XᵀX as (i, j, g) rows (1-based dims, i ≤ j) plus Xᵀy as (i, 0)
    rows — the closed-form side of ridge regression (w solves
    (XᵀX + λI) w = Xᵀy, a d×d driver solve). One streaming pass:
    per-batch (d, d) partials (a single BLAS m.T@m per batch) reduce to
    d² driver floats. round_to = the pagerank10 float device, so the
    surface is hash-comparable against the SQL pairwise-unnest oracle."""

    def partial(batch: pa.Table) -> pa.Table:
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch[emb_col].to_pylist()]
        )
        y = batch[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
        g = m.T @ m
        xy = m.T @ y
        return pa.table(
            {
                "g": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
                "xy": pa.array([xy.tolist()], pa.list_(pa.float64())),
            }
        )

    parts = embeddings.map_batches(partial, batch_format="pyarrow").to_pandas()
    G = np.sum(np.stack([np.asarray(v) for v in parts["g"]]), axis=0)
    xy = np.sum(np.stack([np.asarray(v) for v in parts["xy"]]), axis=0)
    d = len(xy)
    G = G.reshape(d, d)
    iu, ju = np.triu_indices(d)
    rows = {
        "i": np.r_[iu + 1, np.arange(1, d + 1)],
        "j": np.r_[ju + 1, np.zeros(d, np.int64)],
        "g": np.r_[np.round(G[iu, ju], round_to), np.round(xy, round_to)],
    }
    return pd.DataFrame(rows).astype({"i": "int64", "j": "int64", "g": "float64"})


def ridge_solve(gram: pd.DataFrame, lam: float = 1.0) -> np.ndarray:
    """w = (XᵀX + λI)⁻¹ Xᵀy from gram_matrix's row surface — the tiny
    driver-side closed form (d×d)."""
    d = int(gram["i"].max())
    G = np.zeros((d, d))
    xy = np.zeros(d)
    for i, j, g in gram[["i", "j", "g"]].itertuples(index=False):
        if j == 0:
            xy[int(i) - 1] = g
        else:
            G[int(i) - 1, int(j) - 1] = g
            G[int(j) - 1, int(i) - 1] = g
    return np.linalg.solve(G + lam * np.eye(d), xy)
