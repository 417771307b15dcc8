"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference engine assumes clean input (SURVEY.md §2.g: duplicate edges
just add multiplicity); a 100 TB web corpus does not. These are the
standard near-dup pipelines, Ray-Data-first:

- exact: content-hash per batch (vectorized md5) → ``groupby(hash)`` →
  keep min doc_id. The hash column keeps the shuffle narrow (no text
  moves to the groupby).
- MinHash+LSH: shingle → 64-perm minhash signature (vectorized universal
  hashing) → band rows → ``groupby(band)`` emits candidate pairs →
  exact-Jaccard verify on the (small) candidate set → min-label
  clustering. Only doc_id+signature rows shuffle, never text.
- SimHash: 64-bit signature; near-dup candidates = equal 16-bit chunk
  (banding for hamming distance ≤ 3).

All deterministic (fixed hash seeds); every step a pure function of the
input table.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_SHINGLE_RE = re.compile(r"[a-z0-9]+")
_MERSENNE = np.uint64((1 << 61) - 1)


def _token_shingles(text: str, k: int = 3) -> np.ndarray:
    """k-token shingles → stable 64-bit hashes (blake2b over the joined
    shingle), deduped."""
    toks = _SHINGLE_RE.findall(text.lower())
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = {
        int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
        for s in joined
    }
    return np.fromiter(out, dtype=np.uint64, count=len(out))


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x + b) mod 2^61-1 — vectorized."""
    if not len(shingles):
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # uint64 multiply wraps mod 2^64 before the Mersenne mod — not textbook
    # universal hashing, but a deterministic, well-mixed family, which is
    # all MinHash needs (and it keeps the kernel fully vectorized).
    x = shingles[None, :]
    h = (a[:, None] * x + b[:, None]) % _MERSENNE
    return h.min(axis=1)


class MinHashStage:
    """Actor-pool stage: text → (doc_id, band_id, band_hash) rows.

    Permutation parameters generated once per actor in __init__."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        return minhash_signature(_token_shingles(text, self.k), self.a, self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        doc_out, band_out, hash_out = [], [], []
        for i, t in enumerate(texts):
            sig = self.signature(t)
            for bnd in range(self.bands):
                chunk = sig[bnd * self.rows_per_band : (bnd + 1) * self.rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                doc_out.append(ids[i])
                band_out.append(bnd)
                hash_out.append(int.from_bytes(bh, "little") & 0x7FFF_FFFF_FFFF_FFFF)
        return pa.table(
            {
                "doc_id": pa.array(doc_out, pa.int64()),
                "band_id": pa.array(band_out, pa.int64()),
                "band_hash": pa.array(hash_out, pa.int64()),
            }
        )


def exact_duplicates(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_copies): one row per distinct text — doc_id is the
    minimum id of the group, n_copies its multiplicity. Matches
    ``SELECT min(doc_id), count(*) ... GROUP BY text``."""

    from everythinggraph_ray.stages.agg import bucketed_reduce

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [hashlib.md5(t.encode()).hexdigest() for t in batch[text_col].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "h": pa.array(h, pa.string())})

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return np.fromiter(
            (int(x[:8], 16) for x in batch["h"].to_pylist()), dtype=np.int64, count=batch.num_rows
        )

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("h", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "n_copies": pa.array(df["n_copies"], pa.int64()),
            }
        )

    return bucketed_reduce(
        docs.map_batches(add_hash, batch_format="pyarrow"), bucket_of, red
    )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def minhash_near_duplicates(
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> pd.DataFrame:
    """Near-duplicate clusters: returns (doc_id, cluster_id) for every doc
    that belongs to a near-dup cluster (cluster_id = min doc_id).

    Candidate pairs come from LSH banding; each is verified with exact
    shingle Jaccard (recomputed only for candidate docs — a broadcast of
    the candidate id set, not a second full pass). Clustering is
    driver-side union-find over the verified pairs — sound because the
    pair set is ≤ |near-dups|, small by construction for a dedup
    workload; at extreme scale the same pairs feed the WCC kernel instead
    (engine.py) — same semantics, fully distributed.
    """
    stage = MinHashStage(num_perm, bands, shingle_k)
    bands_ds = docs.map_batches(stage, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy(np.int64))
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.array([], dtype="int64"), "b": pd.array([], dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[a], "b": ids[b]})

    cand = (
        bands_ds.groupby(["band_id", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if not len(cand):
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"), "cluster_id": pd.array([], dtype="int64")})

    # verify with exact jaccard: fetch texts of candidate docs only
    import ray as _ray

    need = np.unique(np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()]))
    need_ref = _ray.put(set(int(x) for x in need))

    def filter_docs(batch: pa.Table) -> pa.Table:
        wanted = _ray.get(need_ref)
        mask = [int(x) in wanted for x in batch["doc_id"].to_pylist()]
        return batch.filter(pa.array(mask))

    sub = docs.map_batches(filter_docs, batch_format="pyarrow").select_columns(
        ["doc_id", "text"]
    ).to_pandas()
    sh = {
        int(r.doc_id): np.sort(_token_shingles(r.text, shingle_k)) for r in sub.itertuples()
    }
    keep = [
        (int(r.a), int(r.b))
        for r in cand.itertuples()
        if jaccard(sh[int(r.a)], sh[int(r.b)]) >= threshold
    ]

    # union-find
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in keep:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    rows = sorted((d, find(d)) for d in parent)
    return pd.DataFrame(
        {
            "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
            "cluster_id": pd.array([r[1] for r in rows], dtype="int64"),
        }
    )


class SimHashStage:
    """64-bit SimHash over word hashes (deterministic, seedless)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.empty(batch.num_rows, dtype=np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = _SHINGLE_RE.findall(t.lower())
            if not toks:
                out[i] = 0
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
                    for w in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            v = (2 * bits - 1).sum(axis=0)
            sh = np.uint64(0)
            for j in np.flatnonzero(v > 0):
                sh |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(sh & np.uint64(0x7FFF_FFFF_FFFF_FFFF))
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())})


def simhash(docs: ray.data.Dataset, *, concurrency: int = 4) -> ray.data.Dataset:
    """(doc_id, simhash): 63-bit signatures."""
    return docs.map_batches(SimHashStage, batch_format="pyarrow", concurrency=concurrency)


def simhash_candidates(docs: ray.data.Dataset, chunks: int = 4) -> pd.DataFrame:
    """Near-dup candidate pairs by equal 16-bit simhash chunk (hamming ≤
    chunks-1 guaranteed recall). Returns distinct (a, b) pairs."""
    sh = simhash(docs)

    def explode(batch: pa.Table) -> pa.Table:
        v = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        rows_id, rows_c, rows_h = [], [], []
        for c in range(chunks):
            chunk_val = (v >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            rows_id.append(ids)
            rows_c.append(np.full(len(ids), c, dtype=np.int64))
            rows_h.append(chunk_val.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(rows_id), pa.int64()),
                "chunk": pa.array(np.concatenate(rows_c), pa.int64()),
                "chunk_hash": pa.array(np.concatenate(rows_h), pa.int64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy(np.int64))
        if len(ids) < 2 or len(ids) > 2000:  # degenerate bucket guard
            return pd.DataFrame({"a": pd.array([], dtype="int64"), "b": pd.array([], dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[a], "b": ids[b]})

    return (
        sh.map_batches(explode, batch_format="pyarrow")
        .groupby(["chunk", "chunk_hash"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )


def ngram_jaccard_pairs(
    docs: ray.data.Dataset, pairs_df: pd.DataFrame, *, shingle_k: int = 3
) -> pd.DataFrame:
    """Exact n-gram Jaccard for given candidate (a,b) pairs — the verify
    half of any near-dup pipeline, reusable across MinHash/SimHash."""
    import ray as _ray

    if not len(pairs_df):
        return pairs_df.assign(jaccard=pd.array([], dtype="float64"))
    need = np.unique(np.concatenate([pairs_df["a"].to_numpy(), pairs_df["b"].to_numpy()]))
    need_ref = _ray.put(set(int(x) for x in need))

    def filter_docs(batch: pa.Table) -> pa.Table:
        wanted = _ray.get(need_ref)
        mask = [int(x) in wanted for x in batch["doc_id"].to_pylist()]
        return batch.filter(pa.array(mask))

    sub = docs.map_batches(filter_docs, batch_format="pyarrow").select_columns(
        ["doc_id", "text"]
    ).to_pandas()
    sh = {int(r.doc_id): np.sort(_token_shingles(r.text, shingle_k)) for r in sub.itertuples()}
    j = [jaccard(sh[int(r.a)], sh[int(r.b)]) for r in pairs_df.itertuples()]
    out = pairs_df.copy()
    out["jaccard"] = np.round(j, 8)
    return out
