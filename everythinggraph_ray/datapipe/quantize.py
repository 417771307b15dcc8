"""Scalar quantization (SQ8) of an embedding column — the vector-
compression step in front of large-scale ANN (IVF-SQ / DiskANN-style
pipelines quantize before the index so 100 TB of float32 vectors become
25 TB of uint8 codes).

Two streaming passes, no driver-side vectors:
  1. per-dimension global min/max — per-batch partials reduce to 2·d
     driver floats (the same shape as emb_power_iteration's reducers).
  2. codes — the (mn, mx) pair broadcasts once via ray.put and each
     batch quantizes vectorized: code = clip(floor((x−mn)·255/(mx−mn)),
     0, 255), a constant dimension coding to 0.

Both sides of the oracle evaluate the IDENTICAL float64 expression tree
((x − mn) * 255 / (mx − mn), floor, clip), so the integer codes are
bit-exact vs DuckDB and the query surfaces them as md5(code CSV) +
code sum per vector.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    return np.stack(
        [np.asarray(v, dtype=np.float64) for v in batch[emb_col].to_pylist()]
    )


def sq8_minmax(
    embeddings: ray.data.Dataset, *, emb_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) over the corpus — one streaming pass,
    2·d floats on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, emb_col)
        return pa.table(
            {
                "mn": pa.array([m.min(axis=0).tolist()], pa.list_(pa.float64())),
                "mx": pa.array([m.max(axis=0).tolist()], pa.list_(pa.float64())),
            }
        )

    parts = embeddings.map_batches(partial, batch_format="pyarrow").to_pandas()
    mn = np.min(np.stack(parts["mn"].to_numpy()), axis=0)
    mx = np.max(np.stack(parts["mx"].to_numpy()), axis=0)
    return mn, mx


def sq8_quantize(
    embeddings: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """(vec_id, code_md5, code_sum): the SQ8 code vector per embedding,
    surfaced as md5 of its comma-joined decimal codes (order = dim) plus
    the integer code sum — hash-comparable without a list column."""
    mn, mx = sq8_minmax(embeddings, emb_col=emb_col)
    rng_ref = ray.put((mn, mx))

    def quant(batch: pa.Table) -> pa.Table:
        lo, hi = ray.get(rng_ref)
        m = _batch_matrix(batch, emb_col)
        span = hi - lo
        with np.errstate(divide="ignore", invalid="ignore"):
            codes = np.floor((m - lo) * 255.0 / span)
        codes = np.where(span == 0.0, 0.0, codes)
        codes = np.clip(codes, 0.0, 255.0).astype(np.int64)
        md5s = [
            hashlib.md5(",".join(str(c) for c in row).encode()).hexdigest()
            for row in codes
        ]
        return pa.table(
            {
                id_col: batch[id_col],
                "code_md5": pa.array(md5s, pa.string()),
                "code_sum": pa.array(codes.sum(axis=1), pa.int64()),
            }
        )

    return embeddings.map_batches(quant, batch_format="pyarrow")


def standardize(
    embeddings: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Per-dimension z-score standardization (feature scaling ahead of
    clustering/ANN): two streaming passes like SQ8 above —

      1. per-dim (Σx, Σx², n) partials reduce to 3·d driver floats;
         μ = Σx/n, σ = sqrt(Σx²/n − μ²) (population, the same explicit
         expression the SQL oracle evaluates — NOT a numerically
         restyled stddev_samp, so both sides share the float path);
      2. broadcast (μ, σ) once, z = (x − μ)/σ vectorized per batch.

    Surface: (vec_id, z_sum_u) with z_sum_u = round(Σ_d z_d · 1e6) —
    integer-exact under the ~1e-15 reassociation noise of the
    distributed Σx partials (6 orders of margin)."""

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, emb_col)
        return pa.table(
            {
                "s": pa.array([m.sum(axis=0).tolist()], pa.list_(pa.float64())),
                "s2": pa.array([(m * m).sum(axis=0).tolist()], pa.list_(pa.float64())),
                "n": pa.array([len(m)], pa.int64()),
            }
        )

    parts = embeddings.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = float(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    s2 = np.sum(np.stack(parts["s2"].to_numpy()), axis=0)
    mu = s / n
    sigma = np.sqrt(s2 / n - mu * mu)
    stats_ref = ray.put((mu, np.where(sigma == 0.0, 1.0, sigma)))

    def zed(batch: pa.Table) -> pa.Table:
        m_, sd = ray.get(stats_ref)
        m = _batch_matrix(batch, emb_col)
        zs = ((m - m_) / sd).sum(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "z_sum_u": pa.array(np.round(zs * 1e6).astype(np.int64), pa.int64()),
            }
        )

    return embeddings.map_batches(zed, batch_format="pyarrow")
