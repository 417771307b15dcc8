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


# ---------------------------------------------------------------------------
# Count-min sketch: frequency estimation / heavy hitters
# ---------------------------------------------------------------------------
# The point-query counterpart of HLL: a depth x width int64 grid, updated
# cnt-at-hash-slot per row of each hash, queried by min over the depth
# rows (Cormode & Muthukrishnan 2005).  Mergeable by element-wise SUM, so
# each batch folds to at most depth*width (slot, cnt) rows and the corpus
# reduces to one small grid regardless of input size — the same shape as
# the HLL registers above.  Hashes are the md5_number_lower affine family
# shared with dedup.py:minhash_signatures_md5, so the whole sketch (build
# AND query) is expressible bit-for-bit in the DuckDB oracle.


def _cms_seeds(depth: int) -> tuple[np.ndarray, np.ndarray]:
    from everythinggraph_ray.datapipe.dedup import MD5_MINHASH_SEEDS

    if depth > len(MD5_MINHASH_SEEDS):
        raise ValueError(f"depth must be <= {len(MD5_MINHASH_SEEDS)}")
    A = np.array([a for a, _ in MD5_MINHASH_SEEDS[:depth]], dtype=np.uint64)
    B = np.array([b for _, b in MD5_MINHASH_SEEDS[:depth]], dtype=np.uint64)
    return A, B


def _cms_slots(tokens: list[str], width: int, depth: int) -> np.ndarray:
    """(depth, n) global slot ids: r*width + ((a_r*h + b_r) mod 2^64) % width
    with h = md5_number_lower(token)."""
    from hashlib import md5

    A, B = _cms_seeds(depth)
    h = np.fromiter(
        (int.from_bytes(md5(t.encode()).digest()[8:16], "little") for t in tokens),
        dtype=np.uint64,
        count=len(tokens),
    )
    slots = (A[:, None] * h[None, :] + B[:, None]) % np.uint64(width)  # uint64 wrap == mod 2^64
    return (np.arange(depth, dtype=np.uint64)[:, None] * np.uint64(width) + slots).astype(
        np.int64
    )


def cms_token_counts(
    docs: ray.data.Dataset,
    *,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
) -> ray.data.Dataset:
    """The corpus token-frequency CMS as its nonzero (slot, cnt) rows,
    slot in [0, depth*width).  Each batch contributes at most depth*width
    rows; the bucketed sum merges them — nothing driver-resident."""
    import re

    import pyarrow.compute as pc

    from everythinggraph_ray.datapipe.text import WORD_RE
    from everythinggraph_ray.stages.agg import sum_by_key

    rx = re.compile(WORD_RE)
    size = depth * width

    def partial(batch: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for t in pc.utf8_lower(batch[text_col]).to_pylist():
            for w in rx.findall(t):
                cnt[w] = cnt.get(w, 0) + 1
        if not cnt:
            return pa.table(
                {"slot": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        gslots = _cms_slots(list(cnt.keys()), width, depth)
        c = np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
        local = np.bincount(
            gslots.ravel(), weights=np.broadcast_to(c, gslots.shape).ravel(), minlength=size
        ).astype(np.int64)
        nz = np.flatnonzero(local)
        return pa.table(
            {"slot": pa.array(nz, pa.int64()), "cnt": pa.array(local[nz], pa.int64())}
        )

    return sum_by_key(docs.map_batches(partial, batch_format="pyarrow"), "slot", ["cnt"])


def cms_heavy_hitters(
    docs: ray.data.Dataset,
    threshold: int,
    *,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
) -> ray.data.Dataset:
    """(token, est) for every distinct token whose CMS point-query
    estimate (min over the depth rows) reaches ``threshold``.  est
    over-counts under collisions, never under-counts — the CMS guarantee.

    Two streaming passes: the sketch build above (grid <= depth*width
    int64s — collected once and ray.put-broadcast, the textbook
    small-side pattern), then a distinct-token pass that looks each
    candidate up in the broadcast grid.  The vocabulary never
    concentrates anywhere: distinct tokens stream through a bucketed
    dedup and leave as (token, est) rows."""
    import re

    import ray as _ray
    import pyarrow.compute as pc

    from everythinggraph_ray.datapipe.text import WORD_RE
    from everythinggraph_ray.stages.agg import bucketed_reduce

    size = depth * width
    grid_rows = cms_token_counts(
        docs, width=width, depth=depth, text_col=text_col
    ).to_pandas()  # <= depth*width rows by construction
    grid = np.zeros(size, dtype=np.int64)
    if len(grid_rows):
        grid[grid_rows["slot"].to_numpy()] = grid_rows["cnt"].to_numpy()
    grid_ref = _ray.put(grid)

    rx = re.compile(WORD_RE)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for t in pc.utf8_lower(batch[text_col]).to_pylist():
            seen.update(rx.findall(t))
        return pa.table({"token": pa.array(sorted(seen), pa.string())})

    def bucket_of(batch: pa.Table) -> np.ndarray:
        from everythinggraph_ray.stages.agg import string_buckets

        return string_buckets(batch["token"])

    def estimate(g: pa.Table) -> pa.Table:
        toks = sorted(set(g["token"].to_pylist()))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "est": pa.array([], pa.int64())}
            )
        gr = _ray.get(grid_ref)
        est = gr[_cms_slots(toks, width, depth)].min(axis=0)
        keep = est >= threshold
        return pa.table(
            {
                "token": pa.array([t for t, k in zip(toks, keep) if k], pa.string()),
                "est": pa.array(est[keep], pa.int64()),
            }
        )

    return bucketed_reduce(
        docs.map_batches(distinct_partial, batch_format="pyarrow"), bucket_of, estimate
    )


# ---------------------------------------------------------------------------
# Bloom filter: set membership (decontamination at scale)
# ---------------------------------------------------------------------------
# The third sketch of the family (HLL cardinality, CMS frequency, Bloom
# membership). Bit positions come from the same md5_number_lower affine
# hash family, so the whole structure — build AND probe — has exact SQL
# parity: a gram is flagged iff ALL k of its positions land in the union
# of the reference set's positions, which is precisely what the DuckDB
# oracle replays. False positives are inherent (never false negatives);
# the flagged counts are an UPPER bound on the exact decontamination
# counts (asserted in tests).


def _bloom_positions(grams: list[str], m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions per gram."""
    from hashlib import md5

    A, B = _cms_seeds(k)
    h = np.fromiter(
        (int.from_bytes(md5(g.encode()).digest()[8:16], "little") for g in grams),
        dtype=np.uint64,
        count=len(grams),
    )
    return ((A[:, None] * h[None, :] + B[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_build(
    ds: ray.data.Dataset,
    values_of,
    *,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> np.ndarray:
    """Build the filter over ``values_of(batch) -> list[str]``: per-batch
    set-bit WORD partials (at most m/64 rows leave a batch), bucketed OR,
    final <= m/64-row collect into one uint64 array (m_bits/8 bytes — the
    broadcastable small side by construction)."""
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    n_words = (m_bits + 63) // 64

    def partial(batch: pa.Table) -> pa.Table:
        vals = values_of(batch)
        if not vals:
            return pa.table(
                {"w": pa.array([], pa.int64()), "bits": pa.array([], pa.int64())}
            )
        pos = _bloom_positions(vals, m_bits, k).ravel()
        words = np.zeros(n_words, dtype=np.uint64)
        np.bitwise_or.at(words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))
        nz = np.flatnonzero(words)
        return pa.table(
            {
                "w": pa.array(nz, pa.int64()),
                "bits": pa.array(words[nz].view(np.int64), pa.int64()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["w"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        o = df.groupby("w")["bits"].apply(lambda s: np.bitwise_or.reduce(s.to_numpy()))
        return pa.table(
            {
                "w": pa.array(np.asarray(o.index, np.int64), pa.int64()),
                "bits": pa.array(o.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    rows = bucketed_reduce(ds.map_batches(partial, batch_format="pyarrow"), bucket_of, red).to_pandas()
    words = np.zeros(n_words, dtype=np.uint64)
    if len(rows):
        words[rows["w"].to_numpy()] = rows["bits"].to_numpy().view(np.uint64)
    return words


def bloom_probe_counts(
    ds: ray.data.Dataset,
    words: np.ndarray,
    per_doc_values,
    *,
    m_bits: int = 1 << 16,
    k: int = 4,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, n_flagged) — per doc, how many of its DISTINCT values the
    filter claims are members (>= the exact count; upper bound by the
    no-false-negative guarantee). The filter broadcasts once via ray.put."""
    import ray as _ray

    from everythinggraph_ray.stages.agg import sum_by_key

    wref = _ray.put(words)

    def probe(batch: pa.Table) -> pa.Table:
        w = _ray.get(wref)
        ids_out: list[int] = []
        cnt_out: list[int] = []
        for did, vals in per_doc_values(batch):
            if not vals:
                continue
            pos = _bloom_positions(vals, m_bits, k)
            hit = (
                (w[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
            ).all(axis=0)
            n = int(hit.sum())
            if n:
                ids_out.append(did)
                cnt_out.append(n)
        return pa.table(
            {
                id_col: pa.array(ids_out, pa.int64()),
                "n_flagged": pa.array(cnt_out, pa.int64()),
            }
        )

    return sum_by_key(ds.map_batches(probe, batch_format="pyarrow"), id_col, ["n_flagged"])


# ----------------------------------------------------------------------
# DDSketch-style relative-error quantiles for CONTINUOUS values
# (Masson/Rim/Lee, VLDB'19 public algorithm). grouped_quantiles
# (stages/agg.py) is exact but requires a bounded INTEGER value domain
# (shuffle volume = distinct values); this sketch covers the
# unbounded/float case its docstring defers: buckets are geometric
# (gamma = (1+alpha)/(1-alpha)), every estimate is within relative error
# alpha of the true order statistic, and bucket histograms merge by
# plain count addition — the whole corpus reduces to O(log-range / alpha)
# rows per group regardless of input size.
# ----------------------------------------------------------------------
_DD_NEG_OFFSET = np.int64(1) << np.int64(40)  # negative-store key offset
_DD_ZERO_KEY = -(np.int64(1) << np.int64(39))  # zeros sit between neg and pos


def _dd_keys(x: np.ndarray, gamma: float) -> np.ndarray:
    """Sign-aware geometric bucket keys, TOTALLY ORDERED like the values:
    negative store (most negative first) < zero key < positive store."""
    k = np.empty(len(x), np.int64)
    lg = np.log(gamma)
    pos, neg = x > 0, x < 0
    k[pos] = np.ceil(np.log(x[pos]) / lg).astype(np.int64)
    k[neg] = -np.ceil(np.log(-x[neg]) / lg).astype(np.int64) - _DD_NEG_OFFSET
    k[~(pos | neg)] = _DD_ZERO_KEY
    return k


def _dd_value(key: int, gamma: float) -> float:
    """Bucket key -> representative value (midpoint in log space)."""
    if key == _DD_ZERO_KEY:
        return 0.0
    if key > _DD_ZERO_KEY:
        return 2.0 * gamma**key / (gamma + 1.0)
    b = -(key + int(_DD_NEG_OFFSET))
    return -2.0 * gamma**b / (gamma + 1.0)


def ddsketch_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    qs: list[float],
    *,
    alpha: float = 0.01,
    group_col: str | None = None,
) -> ray.data.Dataset:
    """Relative-error quantiles of a float column, optionally per group.

    Shape mirrors grouped_quantiles: per-batch (group, key, count)
    partials (a batch folds to its DISTINCT buckets — bounded by
    O(log-range / alpha), not rows), one group-bucketed co-group sums
    histograms and picks each q at 0-based rank ceil(q*n)-1 (the
    quantile_disc convention). Deterministic: same input -> same
    estimate on any cluster size / partitioning (pure log-bucket math,
    no sampling). Output: group_col + one float column per q (p50,
    p99, ...), each within relative error ``alpha`` of the exact
    order statistic ((gamma-1)/(gamma+1) == alpha by construction)."""
    if not qs or any(not (0 < q <= 1) for q in qs):
        raise ValueError(f"qs must be in (0, 1], got {qs}")
    if not 0 < alpha < 0.5:
        raise ValueError(f"alpha must be in (0, 0.5), got {alpha}")
    import pandas as pd

    from everythinggraph_ray.datapipe.joins import _key_hash
    from everythinggraph_ray.stages.agg import bucketed_reduce

    gamma = (1.0 + alpha) / (1.0 - alpha)
    gcols = [group_col] if group_col else []
    out_names = [f"p{q * 100:g}".replace(".", "_") for q in qs]

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(x)
        df = pd.DataFrame(
            {c: batch[c].to_pandas()[ok] for c in gcols}
            | {"__k": _dd_keys(x[ok], gamma)}
        )
        g = df.groupby(gcols + ["__k"], as_index=False, dropna=False).size()
        cols = {c: pa.Array.from_pandas(g[c]) for c in gcols}
        cols["__k"] = pa.array(g["__k"].to_numpy(np.int64), pa.int64())
        cols["__n"] = pa.array(g["size"].to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    def bucket_of(batch: pa.Table) -> np.ndarray:
        if not gcols:
            return np.zeros(batch.num_rows, np.int64)
        return _key_hash(batch, gcols)

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        rows: dict[str, list] = {c: [] for c in gcols}
        for on in out_names:
            rows[on] = []
        for key, grp in df.groupby(gcols, dropna=False) if gcols else [((), df)]:
            h = grp.groupby("__k")["__n"].sum().sort_index()
            keys = h.index.to_numpy(np.int64)
            cum = h.to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            for c, kv in zip(gcols, key if isinstance(key, tuple) else (key,)):
                rows[c].append(kv)
            for q, on in zip(qs, out_names):
                idx = max(int(np.ceil(q * n)), 1) - 1
                rows[on].append(_dd_value(int(keys[np.searchsorted(cum, idx + 1)]), gamma))
        cols = {c: pa.Array.from_pandas(pd.Series(rows[c])) for c in gcols}
        for on in out_names:
            cols[on] = pa.array(rows[on], pa.float64())
        return pa.table(cols)

    return bucketed_reduce(ds.map_batches(partial, batch_format="pyarrow"), bucket_of, red)
