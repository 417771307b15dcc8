"""Product quantization (PQ) for the embedding column — the vector-
compression scale path beyond SQ8 (quantize.py): d float32 dims become
``m_sub`` uint8 codes (e.g. 32 dims -> 4 bytes, a 32x reduction), and
approximate search runs over the CODES with per-query lookup tables
(ADC — asymmetric distance computation, Jégou et al., TPAMI 2011),
so a 100 TB float corpus becomes ~3 TB of codes that stream through
one map_batches scan with NO shuffle and NO materialization.

Design (shares the IVF machinery's shape, datapipe/knn.py:194):

1. **train** — deterministic ``mix64``-hash subsample (bounded by
   ``sample_cap``, never the corpus) collected in ONE pass together
   with the query rows; per-subspace k-means (m_sub codebooks of
   n_codes x d/m_sub) runs on the driver over that tiny sample.
   Codebook size: m_sub * n_codes * d/m_sub = n_codes * d floats —
   broadcast once via ray.put.
2. **encode** — one map_batches pass: split each (normalized) vector
   into m_sub contiguous sub-vectors, argmin L2 to the sub-codebook,
   emit uint8 codes. Fully vectorized ((B, K) distance matrices per
   subspace via the |x-c|^2 = |x|^2 - 2x.c + |c|^2 expansion).
3. **search (ADC)** — each query builds an (m_sub, n_codes) table of
   sub-inner-products q_sub . c; the approximate cosine similarity of
   a coded vector is the sum of m_sub table lookups. The corpus scan
   fuses encode + ADC + per-batch local top-k (the knn_bruteforce
   combiner shape, knn.py:54) — the driver only ever sees
   |queries| x (k+1) candidate rows per batch.

Determinism: seeded init, fixed iteration count, float64 training
math — codes are bit-reproducible, so tests pin them against a serial
numpy reference (no SQL oracle: k-means is not SQL-expressible; the
driver records rows-only and pytest carries the exactness + recall
oracles, the same convention as knn_lsh/minhash).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.knn import _batch_matrix, _local_topk_idx, _normalize


def train_pq_codebooks(
    sample: np.ndarray, *, m_sub: int, n_codes: int, iters: int = 10, seed: int = 23
) -> np.ndarray:
    """(m_sub, n_codes, d/m_sub) codebooks via seeded per-subspace
    k-means (L2) over a normalized sample. Pure numpy, driver-side,
    input is the BOUNDED sample only."""
    n, d = sample.shape
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    ds = d // m_sub
    rng = np.random.default_rng(seed)
    books = np.empty((m_sub, n_codes, ds), dtype=np.float64)
    for s in range(m_sub):
        X = sample[:, s * ds : (s + 1) * ds]
        k = min(n_codes, n)
        cents = X[rng.choice(n, size=k, replace=False)]
        for _ in range(iters):
            # |x-c|^2 argmin == argmax(2x.c - |c|^2); stable under ties
            d2 = -2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                m = assign == c
                if m.any():
                    cents[c] = X[m].mean(axis=0)
        if k < n_codes:  # degenerate tiny sample: pad by repeating
            cents = np.vstack([cents, np.repeat(cents[:1], n_codes - k, axis=0)])
        books[s] = cents
    return books


def _encode(m: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(B, d) normalized vectors -> (B, m_sub) uint8 codes, vectorized
    per subspace."""
    msub, n_codes, ds = books.shape
    codes = np.empty((len(m), msub), dtype=np.uint8)
    for s in range(msub):
        X = m[:, s * ds : (s + 1) * ds]
        C = books[s]
        d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def _collect_small_sides(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    *,
    sample_cap: int,
    id_col: str,
    emb_col: str,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """One streaming pass over the corpus returning (training sample,
    query rows) — the knn_ivf fused small-side grab (knn.py:228)."""
    from everythinggraph_ray.stages.agg import mix64

    total = embeddings.count()  # metadata-served for parquet sources
    mod = max(1, total // sample_cap)
    qset = sorted(int(q) for q in query_ids)

    def grab(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        is_s = mix64(ids) % np.uint64(mod) == 0
        is_q = np.isin(ids, qset)
        t = batch.filter(pa.array(is_s | is_q))
        tids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__is_sample", pa.array(mix64(tids) % np.uint64(mod) == 0, pa.bool_())
        )

    small = embeddings.map_batches(grab, batch_format="pyarrow").to_pandas()
    # id-sort both small sides: block arrival order is nondeterministic and
    # k-means init indexes into the sample, so training must see a stable
    # row order for bit-reproducible codebooks
    return (
        small[small["__is_sample"]].sort_values(id_col).reset_index(drop=True),
        small[small[id_col].isin(qset)].sort_values(id_col).reset_index(drop=True),
    )


def pq_encode(
    embeddings: ray.data.Dataset,
    *,
    m_sub: int = 4,
    n_codes: int = 16,
    sample_cap: int = 4096,
    seed: int = 23,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """(vec_id, code_md5, code_sum): the PQ code vector per embedding,
    surfaced like SQ8 (quantize.py:63) as md5 of the comma-joined codes
    plus their integer sum — hash-comparable without a list column."""
    sm, _ = _collect_small_sides(
        embeddings, [], sample_cap=sample_cap, id_col=id_col, emb_col=emb_col
    )
    if not len(sm):
        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.int64()),
                 "code_md5": pa.array([], pa.string()),
                 "code_sum": pa.array([], pa.int64())}
            )
        )
    X = _normalize(np.stack(sm[emb_col].to_numpy()).astype(np.float64))
    books = train_pq_codebooks(X, m_sub=m_sub, n_codes=n_codes, seed=seed)
    bref = ray.put(books)

    def enc(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        m = _normalize(_batch_matrix(batch, emb_col))
        codes = _encode(m, b)
        md5s = [
            hashlib.md5(",".join(str(int(c)) for c in row).encode()).hexdigest()
            for row in codes
        ]
        return pa.table(
            {
                id_col: batch[id_col],
                "code_md5": pa.array(md5s, pa.string()),
                "code_sum": pa.array(codes.sum(axis=1, dtype=np.int64), pa.int64()),
            }
        )

    return embeddings.map_batches(enc, batch_format="pyarrow")


def knn_pq(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 10,
    m_sub: int = 4,
    n_codes: int = 16,
    refine_factor: int = 4,
    sample_cap: int = 4096,
    seed: int = 23,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate top-k by ADC over PQ codes: ONE fused streaming scan
    (encode + table-lookup scoring + per-batch local top-k), no shuffle,
    no corpus materialization. Returns (query_id, neighbor_id, rank).

    ``refine_factor`` > 0 adds the ADC+R re-rank (Jégou et al., TPAMI
    2011 §V): ADC selects ``refine_factor * k`` candidates per batch and
    exact cosine re-ranks ONLY those rows — within a code cell ADC ties
    every vector (same codeword), so pure table-lookup ranking cannot
    order close neighbors; the refine step restores that at the cost of
    refine_factor*k exact dot products per (batch, query). At 100 TB the
    candidates' float vectors are point lookups against the vector
    store, not a second scan. ``refine_factor=0`` is pure ADC."""
    sm, qdf = _collect_small_sides(
        embeddings, query_ids, sample_cap=sample_cap, id_col=id_col, emb_col=emb_col
    )
    empty = pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": []}).astype("int64")
    if not len(sm) or not len(qdf):
        return empty
    X = _normalize(np.stack(sm[emb_col].to_numpy()).astype(np.float64))
    books = train_pq_codebooks(X, m_sub=m_sub, n_codes=n_codes, seed=seed)
    qids = qdf[id_col].to_numpy(np.int64)
    qmat = _normalize(np.stack(qdf[emb_col].to_numpy()).astype(np.float64))
    # per-query ADC tables: (Q, m_sub, n_codes) of q_sub . codeword —
    # approximate cosine = sum over subspaces of table[s, code[s]]
    msub, ncod, ds = books.shape
    luts = np.einsum(
        "qsd,skd->qsk", qmat.reshape(len(qmat), msub, ds), books
    )  # (Q, m_sub, n_codes)
    side_ref = ray.put((books, qids, luts, qmat))

    def scan(batch: pa.Table) -> pa.Table:
        b, qv, lt, qm = ray.get(side_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_batch_matrix(batch, emb_col))
        codes = _encode(m, b)  # (B, m_sub)
        # gather: sims[i, q] = sum_s lt[q, s, codes[i, s]]
        sims = np.zeros((len(ids), len(qv)), dtype=np.float64)
        for s in range(b.shape[0]):
            sims += lt[:, s, codes[:, s]].T  # (B, Q)
        pool = (refine_factor * k + 1) if refine_factor else (k + 1)
        kk = min(pool, len(ids))
        out_q, out_n, out_s = [], [], []
        for j in range(len(qv)):
            sj = sims[:, j]
            top = _local_topk_idx(sj, ids, kk)
            if refine_factor:  # exact re-rank of the ADC candidate pool
                exact = m[top] @ qm[j]
                keep = _local_topk_idx(exact, ids[top], min(k + 1, len(top)))
                top, sj = top[keep], None
                out_s.append(exact[keep])
            else:
                out_s.append(sj[top])
            out_q.append(np.full(len(top), qv[j], dtype=np.int64))
            out_n.append(ids[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    cand = embeddings.map_batches(scan, batch_format="pyarrow").to_pandas()
    if not len(cand):
        return empty
    cand = cand[cand["query_id"] != cand["neighbor_id"]]
    cand = cand.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    top = cand.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].astype("int64")
