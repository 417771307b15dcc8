"""Content-defined chunking (CDC): rolling-hash document splitting — the
sub-document dedup primitive of large-corpus pipelines (dedup at the
chunk level survives insertions/deletions that shift byte offsets, which
fixed-size blocking does not).

A polynomial Rabin fingerprint of a ``window``-byte sliding window is
computed VECTORIZED over each document's utf-8 bytes (uint64 arithmetic
wraps mod 2^64 — ``window`` shifted adds, no per-byte Python); a chunk
boundary falls wherever ``hash % divisor == divisor - 1``, subject to
min/max chunk lengths. The edit-locality property (an edit only changes
the chunks it touches) is asserted in tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

_P = np.uint64(1000003)  # polynomial base


def _cut_points(data: bytes, window: int, divisor: int, min_len: int, max_len: int) -> list[int]:
    """Chunk end positions for one document (end-exclusive, last == len)."""
    n = len(data)
    if n == 0:
        return [0]
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if n <= window:
        return [n]
    # rolling hash of every window: h[i] = sum_j b[i+j] * P^(w-1-j), i.e. a
    # sliding polynomial — w vectorized shifted adds over the byte array
    m = n - window + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(window):
        h = h * _P + b[j : j + m]
    # boundary AFTER byte i+window-1 when the window hash hits the magic
    is_cut = (h % np.uint64(divisor)) == np.uint64(divisor - 1)
    cand = np.flatnonzero(is_cut) + window  # end-exclusive positions
    cuts: list[int] = []
    start = 0
    ci = 0
    while start < n:
        hard_end = min(start + max_len, n)
        # first candidate ≥ start + min_len and ≤ hard_end
        while ci < len(cand) and cand[ci] < start + min_len:
            ci += 1
        if ci < len(cand) and cand[ci] <= hard_end:
            end = int(cand[ci])
            ci += 1
        else:
            end = hard_end
        cuts.append(end)
        start = end
    return cuts


def cdc_chunks(
    docs: ray.data.Dataset,
    *,
    window: int = 16,
    divisor: int = 256,  # expected chunk ~256 bytes + min_len
    min_len: int = 64,
    max_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, chunk_idx, chunk_start, chunk_len, chunk_hash): rolling-
    hash content-defined chunks per document; chunk_hash is the md5 hex of
    the chunk bytes, the key a downstream exact-dedup groups on."""

    def split(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id, out_idx, out_start, out_len, out_h = [], [], [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            data = t.encode("utf-8")
            cuts = _cut_points(data, window, divisor, min_len, max_len)
            start = 0
            for ci, end in enumerate(cuts):
                out_id.append(ids[i])
                out_idx.append(ci)
                out_start.append(start)
                out_len.append(end - start)
                out_h.append(hashlib.md5(data[start:end]).hexdigest())
                start = end
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "chunk_start": pa.array(out_start, pa.int64()),
                "chunk_len": pa.array(out_len, pa.int64()),
                "chunk_hash": pa.array(out_h, pa.string()),
            }
        )

    return docs.map_batches(split, batch_format="pyarrow")
