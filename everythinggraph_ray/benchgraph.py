"""Deterministic synthetic power-law edge tables for benchmarking.

The reference benchmarks RMAT graphs at fixed scales (random.c:37-40,
rmat20..rmat27). This is our analogue: a seeded numpy generator producing
a skewed (Zipf-ish in- and out-degree) edge table directly as parquet,
sized so PageRank supersteps measure compute + shuffle, not setup.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def synth_edges(n_vertices: int, n_edges: int, seed: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Power-law edge table: src ~ mild skew, dst ~ heavier skew (web-like
    in-degree hubs). Deterministic in (n_vertices, n_edges, seed)."""
    rng = np.random.default_rng(seed)
    src = (n_vertices * rng.random(n_edges) ** 1.5).astype(np.int64)
    dst = (n_vertices * rng.random(n_edges) ** 2.5).astype(np.int64)
    np.clip(src, 0, n_vertices - 1, out=src)
    np.clip(dst, 0, n_vertices - 1, out=dst)
    return src, dst


def ensure_bench_edges(
    n_vertices: int, n_edges: int, seed: int = 5, root: str = "/tmp/egray_bench"
) -> str:
    """Write (once) a multi-file parquet edge table; returns its dir."""
    d = os.path.join(root, f"edges_v{n_vertices}_e{n_edges}_s{seed}")
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    # scratch dir + atomic rename: concurrent callers (scaling subprocesses)
    # must never see a half-written table
    import shutil
    import uuid

    work = f"{d}.building-{uuid.uuid4().hex[:8]}"
    os.makedirs(work, exist_ok=True)
    src, dst = synth_edges(n_vertices, n_edges, seed)
    n_files = 16
    per = (n_edges + n_files - 1) // n_files
    for f in range(n_files):
        s = src[f * per : (f + 1) * per]
        t = dst[f * per : (f + 1) * per]
        if len(s):
            pq.write_table(
                pa.table({"src": pa.array(s, pa.int64()), "dst": pa.array(t, pa.int64())}),
                os.path.join(work, f"part-{f:04d}.parquet"),
            )
    with open(os.path.join(work, "_SUCCESS"), "w") as fh:
        fh.write("ok")
    try:
        os.rename(work, d)
    except OSError:  # concurrent caller won: use theirs
        shutil.rmtree(work, ignore_errors=True)
    return d
