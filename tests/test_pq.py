"""Product quantization: serial code parity, ADC recall, determinism."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from everythinggraph_ray.datapipe.knn import knn_bruteforce
from everythinggraph_ray.datapipe.pq import (
    _encode,
    knn_pq,
    pq_encode,
    train_pq_codebooks,
)
from everythinggraph_ray.stages.agg import mix64


def _emb_ds(n=300, dim=16, seed=7):
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


def _serial_codes(m, *, m_sub, n_codes, sample_cap=4096, seed=23):
    """Pure-numpy reference for pq_encode: the same mix64 sample rule,
    the same training, the same encode."""
    X = m.astype(np.float64)
    X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-30, None)
    ids = np.arange(len(m), dtype=np.int64)
    mod = max(1, len(m) // sample_cap)
    sample = X[mix64(ids) % np.uint64(mod) == 0]
    books = train_pq_codebooks(sample, m_sub=m_sub, n_codes=n_codes, seed=seed)
    return _encode(X, books)


def test_pq_encode_matches_serial():
    ds, m = _emb_ds()
    ds = ds.repartition(6)  # several batches: books must broadcast, not refit
    out = pq_encode(ds, m_sub=4, n_codes=16).to_pandas().sort_values("vec_id")
    codes = _serial_codes(m, m_sub=4, n_codes=16)
    want_md5 = [
        hashlib.md5(",".join(str(int(c)) for c in row).encode()).hexdigest()
        for row in codes
    ]
    assert list(out["code_md5"]) == want_md5
    assert np.array_equal(
        out["code_sum"].to_numpy(), codes.sum(axis=1, dtype=np.int64)
    )


def test_pq_encode_deterministic():
    ds, _ = _emb_ds(n=150)
    a = pq_encode(ds, m_sub=4, n_codes=8).to_pandas().sort_values("vec_id")
    b = pq_encode(ds, m_sub=4, n_codes=8).to_pandas().sort_values("vec_id")
    assert list(a["code_md5"]) == list(b["code_md5"])


def test_pq_dim_not_divisible_raises():
    rng = np.random.default_rng(0)
    sample = rng.standard_normal((50, 10))
    try:
        train_pq_codebooks(sample, m_sub=4, n_codes=8)
    except ValueError:
        return
    raise AssertionError("expected ValueError for 10 % 4 != 0")


def test_knn_pq_recall():
    # Clustered data (what PQ is for): codes separate the clusters, so
    # ADC recall@10 vs brute force should be high.
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16)) * 4.0
    pts = np.concatenate(
        [c + rng.standard_normal((50, 16)) * 0.3 for c in centers]
    ).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(pts)), pa.int64()),
                "embedding": pa.array(pts.tolist(), pa.list_(pa.float32(), 16)),
            }
        )
    )
    qids = [0, 57, 213]
    brute = knn_bruteforce(ds, qids, k=10)
    # ADC + exact refine: with a pool covering the 50-point code cell
    # (refine 8 -> pool 81) recall should be near-perfect; within a cell
    # ADC ties everything, so the pool must exceed the cell population
    approx = knn_pq(ds, qids, k=10, m_sub=4, n_codes=16, refine_factor=8)
    recalls = []
    for q in qids:
        b = set(brute[brute["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.9, recalls
    # pure ADC (refine_factor=0) cannot rank within a code cell, but it
    # must land neighbors in the query's CLUSTER (codes separate clusters)
    adc = knn_pq(ds, qids, k=10, m_sub=4, n_codes=16, refine_factor=0)
    for q in qids:
        n = adc[adc["query_id"] == q]["neighbor_id"].to_numpy()
        same_cluster = (n // 50) == (q // 50)
        assert same_cluster.mean() >= 0.8, (q, n)


def test_knn_pq_shape_and_ranks():
    ds, _ = _emb_ds(n=120)
    out = knn_pq(ds, [1, 2], k=5, m_sub=4, n_codes=8)
    assert set(out.columns) == {"query_id", "neighbor_id", "rank"}
    for q in (1, 2):
        r = out[out["query_id"] == q]["rank"].to_numpy()
        assert np.array_equal(np.sort(r), np.arange(1, len(r) + 1))
        assert q not in set(out[out["query_id"] == q]["neighbor_id"])
