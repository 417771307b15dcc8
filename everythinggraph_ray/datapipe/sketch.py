"""Cardinality sketches: HyperLogLog distinct counting.

At 100 TB, "how many distinct tokens / urls / ngrams are there" is a
planning query (vocabulary sizing, dedup-rate estimation, shard
budgeting) where the exact answer needs a full shuffle of every distinct
value, but a ±1-2% estimate needs only 2^p bytes per WORKER: HLL
registers are mergeable by element-wise max, so the whole corpus reduces
to one 4096-byte vector regardless of input size.

Determinism: values are hashed with blake2b (no process-seeded hashing),
so the estimate is bit-reproducible across runs, resumes and cluster
sizes — the same property every sampling/sharding op in this repo keeps.

Shape: each batch folds to AT MOST 2^p (register, rank) rows (usually
far fewer), the bucketed reduce maxes per register, and the driver sees
only the final register vector. No per-row Python in the hot path: the
hash loop is the only per-value work (inherent to hashing, like
fingerprinting), and rank extraction is vectorized bit math.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pyarrow as pa

import ray.data

# Flajolet et al. bias constants: alpha_m for m >= 128
def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def _hash64(values: list) -> np.ndarray:
    """Deterministic 64-bit hashes of arbitrary scalars (via str)."""
    return np.fromiter(
        (
            int.from_bytes(blake2b(str(v).encode("utf-8"), digest_size=8).digest(), "little")
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def _registers_of(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register, rank) per hash: register = top p bits; rank = leading
    zeros of the remaining (64-p) bits + 1, vectorized."""
    m_bits = np.uint64(64 - p)
    reg = (h >> m_bits).astype(np.int64)
    rest = h & ((np.uint64(1) << m_bits) - np.uint64(1))
    # position of highest set bit in `rest` within (64-p) bits; rest==0 →
    # rank = (64-p)+1 (all zeros)
    nz = rest != 0
    high = np.zeros(len(h), dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):  # O(log bits) vectorized bit-scan
        mask = r >= (np.uint64(1) << np.uint64(shift))
        high[mask] += shift
        r[mask] >>= np.uint64(shift)
    rank = np.where(nz, int(m_bits) - high, int(m_bits) + 1).astype(np.int64)
    return reg, rank


def _batch_partial(reg: np.ndarray, rank: np.ndarray) -> pa.Table:
    """Fold a batch's (register, rank) pairs to max-per-register rows."""
    if not len(reg):
        return pa.table(
            {"reg": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())}
        )
    o = np.lexsort((rank, reg))
    rs, ks = reg[o], rank[o]
    st = np.flatnonzero(np.r_[True, rs[1:] != rs[:-1]])
    ends = np.r_[st[1:], len(rs)] - 1
    return pa.table(
        {"reg": pa.array(rs[st], pa.int64()), "rank": pa.array(ks[ends], pa.int64())}
    )


def _estimate(regs: np.ndarray, p: int) -> float:
    """Bias-corrected HLL estimate from the dense register vector."""
    m = 1 << p
    e = _alpha(m) * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.sum(regs == 0))
    if e <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))  # linear counting, small range
    return e


def hll_distinct(
    ds: ray.data.Dataset,
    col: str,
    *,
    p: int = 12,
    values_of=None,
) -> dict:
    """Approximate COUNT(DISTINCT col). ``values_of(batch) -> list`` may
    override value extraction (e.g. tokenize a text column — the
    distinct-token estimator passes a tokenizer here). Returns
    {"estimate": float, "registers": int, "p": int}."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    from everythinggraph_ray.stages.agg import bucketed_reduce

    get = values_of if values_of is not None else (
        lambda batch: batch[col].to_pylist()
    )

    def partial(batch: pa.Table) -> pa.Table:
        vals = [v for v in get(batch) if v is not None]
        reg, rank = _registers_of(_hash64(vals), p)
        return _batch_partial(reg, rank)

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return batch["reg"].to_numpy(zero_copy_only=False)

    def red(g: pa.Table) -> pa.Table:
        r = g["reg"].to_numpy(zero_copy_only=False)
        k = g["rank"].to_numpy(zero_copy_only=False)
        return _batch_partial(r, k)

    merged = bucketed_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), bucket_of, red
    ).to_pandas()  # <= 2^p rows by construction
    regs = np.zeros(1 << p, dtype=np.int64)
    if len(merged):
        regs[merged["reg"].to_numpy()] = merged["rank"].to_numpy()
    return {"estimate": _estimate(regs, p), "registers": int((regs > 0).sum()), "p": p}


def hll_distinct_tokens(
    docs: ray.data.Dataset, *, text_col: str = "text", p: int = 12
) -> dict:
    """Approximate number of DISTINCT word tokens in the corpus — the
    vocabulary-size planning estimate. Each batch's token stream folds
    to <= 2^p rows before anything moves."""
    import re

    import pyarrow.compute as pc

    from everythinggraph_ray.datapipe.text import WORD_RE

    rx = re.compile(WORD_RE)

    def values_of(batch: pa.Table) -> list:
        out: list[str] = []
        for t in pc.utf8_lower(batch[text_col]).to_pylist():
            out.extend(rx.findall(t))
        return out

    return hll_distinct(docs, text_col, p=p, values_of=values_of)
