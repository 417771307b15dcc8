"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: exact cosine top-k — the query matrix is broadcast
  once (``ray.put``), each batch does one float32 matmul against it and
  emits only its LOCAL top-k per query (the combiner), so the final
  groupby touches ≤ k·n_batches rows per query, never the full corpus.
  float64 accumulation matches DuckDB's ``list_cosine_similarity`` over
  ``CAST(embedding AS DOUBLE[])`` for the oracle comparison.
- ``knn_lsh``: the scale path — random-hyperplane LSH buckets; each query
  searches only its bucket (plus optional multiprobe by flipping one
  bit). Approximate; recall vs brute force is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def knn_bruteforce(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k neighbors for the given query ids (queries are
    rows of the same table; self excluded). Returns (query_id,
    neighbor_id, rank) with rank 1..k ordered by (sim desc, neighbor_id)."""
    qset = sorted(int(q) for q in query_ids)

    def grab(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, qset)
        return batch.filter(pa.array(mask))

    qdf = embeddings.map_batches(grab, batch_format="pyarrow").to_pandas()
    qdf = qdf.sort_values(id_col)
    qids = qdf[id_col].to_numpy(np.int64)
    qmat = _normalize(np.stack(qdf[emb_col].to_numpy()).astype(np.float64))
    qref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(qref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_batch_matrix(batch, emb_col))
        sims = m @ qm.T  # (batch, Q) float64
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, len(ids))  # +1: self may be in this batch
        for j in range(len(qi)):
            s = sims[:, j]
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.append(np.full(len(top), qi[j], dtype=np.int64))
            out_n.append(ids[top])
            out_s.append(s[top].astype(np.float64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    cand = embeddings.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand[cand["query_id"] != cand["neighbor_id"]]
    cand = cand.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    top = cand.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].astype("int64")


def knn_lsh(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 11,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane buckets, search only the
    query's bucket (± ``multiprobe`` single-bit probes). The bucket
    assignment is one map_batches pass; per-bucket search reuses the
    brute-force kernel on the bucket subset."""
    # sample dimensionality from one row
    first = embeddings.take(1)[0]
    dim = len(first[emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
    pref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        m = _batch_matrix(batch, emb_col)
        bits = (m @ pl) > 0
        code = bits @ (1 << np.arange(n_planes)).astype(np.int64)
        return batch.append_column("bucket", pa.array(code.astype(np.int64), pa.int64()))

    bucketed = embeddings.map_batches(bucketize, batch_format="pyarrow").materialize()
    qset = sorted(int(q) for q in query_ids)

    def grab(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, qset)))

    qdf = bucketed.map_batches(grab, batch_format="pyarrow").to_pandas()
    out = []
    for _, qrow in qdf.iterrows():
        buckets = {int(qrow["bucket"])}
        if multiprobe:  # 1-bit multiprobe: also search each neighboring bucket
            for b in range(n_planes):
                buckets.add(int(qrow["bucket"]) ^ (1 << b))

        bl = tuple(sorted(buckets))
        sub = bucketed.map_batches(
            lambda t, _bl=bl: t.filter(
                pa.array(np.isin(t["bucket"].to_numpy(zero_copy_only=False), _bl))
            ),
            batch_format="pyarrow",
        )
        res = knn_bruteforce(sub, [int(qrow[id_col])], k=k, id_col=id_col, emb_col=emb_col)
        out.append(res)
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": []}).astype("int64")
    )


def embedding_near_duplicates(
    embeddings: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 13,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH buckets (plus
    1-bit neighbor probes) propose candidates, exact cosine verifies.
    Returns (a, b, cos) with a < b and cos >= threshold, deduped.

    Same bucketed shape as MinHash-LSH: only (id, bucket) rows shuffle; the
    exact verification touches candidate vectors only."""
    first = embeddings.take(1)[0]
    dim = len(first[emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float64)
    pref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        m = _normalize(_batch_matrix(batch, emb_col))
        bits = (m @ pl) > 0
        code = bits @ (1 << np.arange(n_planes)).astype(np.int64)
        rows_id, rows_b = [], []
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        rows_id.append(ids)
        rows_b.append(code.astype(np.int64))
        for b in range(n_planes):  # 1-bit probe: near-boundary pairs meet
            rows_id.append(ids)
            rows_b.append((code ^ (1 << b)).astype(np.int64))
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(rows_id), pa.int64()),
                "bucket": pa.array(np.concatenate(rows_b), pa.int64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(np.unique(g["vec_id"].to_numpy(np.int64)))
        if len(ids) < 2 or len(ids) > 4000:  # degenerate bucket guard
            return pd.DataFrame({"a": pd.array([], dtype="int64"), "b": pd.array([], dtype="int64")})
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[i], "b": ids[j]})

    cand = (
        embeddings.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if not len(cand):
        return pd.DataFrame(
            {"a": pd.array([], dtype="int64"), "b": pd.array([], dtype="int64"), "cos": pd.array([], dtype="float64")}
        )

    need = np.unique(np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()]))
    need_ref = ray.put(set(int(x) for x in need))

    def grab(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        mask = [int(x) in wanted for x in batch[id_col].to_pylist()]
        return batch.filter(pa.array(mask))

    sub = embeddings.map_batches(grab, batch_format="pyarrow").to_pandas()
    vecs = {
        int(r[id_col]): np.asarray(r[emb_col], dtype=np.float64) for _, r in sub.iterrows()
    }
    for k in vecs:
        n = np.linalg.norm(vecs[k])
        vecs[k] = vecs[k] / max(n, 1e-30)
    cos = np.array([float(vecs[int(r.a)] @ vecs[int(r.b)]) for r in cand.itertuples()])
    out = cand.copy()
    out["cos"] = np.round(cos, 8)
    out = out[out["cos"] >= threshold].reset_index(drop=True)
    return out.astype({"a": "int64", "b": "int64"})
