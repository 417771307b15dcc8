"""Analytics batch (session 12, tenth wave): Lindley queue waits, a
Unicode codepoint-class census, and MMR diversified retrieval.

Distributed shapes:
- ``events_queue_wait``: per-user FCFS single-server waiting times
  (fixed 15-min service). The Lindley recursion
  W_{i+1} = max(0, W_i + S − interarrival_i) looks sequential but has
  the exact prefix identity W_n = C_{n−1} − min(C_0..C_{n−1}) over the
  cumulative net-load series — so each user's slab resolves with ONE
  cumsum + ONE running min (np.minimum.accumulate), no recursion. The
  SQL oracle is the same identity in window form (lag + cumsum +
  running MIN) — queueing theory as a scan.
- ``docs_codepoint_census``: per-doc counts of ASCII-letter, digit,
  CJK (U+4E00–U+9FFF) and other-non-space codepoints — the script
  census language-ID and tokenizer-health checks start from. One
  vectorized pass (np.frombuffer over UTF-32) per batch, no shuffle.
- ``emb_mmr_top10``: Maximal Marginal Relevance — the diversified
  top-k of retrieval stacks (greedy argmax of
  λ·rel − (1−λ)·max-sim-to-selected). Candidate pool = top-32 by
  cosine to the query (per-batch partial top-k carrying the vectors,
  driver merge); the bounded greedy runs on the driver. Rows-only
  (greedy argmax chains have no SQL); serial replay + diversity
  pytests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

ANALYTICS26_QUERIES: dict = {}
ANALYTICS26_ORACLES: dict = {}

SERVICE_US = 15 * 60 * 1_000_000  # fixed service time: 15 minutes
MMR_POOL = 32
MMR_K = 10
MMR_LAMBDA = 0.5


# ----------------------------------------------------------------------
# Lindley waiting times
# ----------------------------------------------------------------------
def q_events_queue_wait(sf_dir):
    """(event_id, user_id, wait_us): FCFS waiting time per event with a
    fixed 15-min service, per user in (ts, event_id) order."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pa.array(ts, pa.int64()),
            }
        )

    def user_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def waits(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, ts, u))
        u, ts, eid = u[o], ts[o], eid[o]
        new = np.r_[True, u[1:] != u[:-1]]
        # net load X_i = S - interarrival (0 at each user's first row)
        x = np.where(new, 0, SERVICE_US - (ts - np.r_[ts[:1], ts[:-1]]))
        starts = np.flatnonzero(new)
        w = np.empty(len(u), np.int64)
        ends = np.r_[starts[1:], len(u)]
        for lo, hi in zip(starts, ends):
            c = np.cumsum(x[lo:hi])
            w[lo:hi] = c - np.minimum.accumulate(c)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "wait_us": pa.array(w, pa.int64()),
            }
        )

    res = bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"), user_bucket, waits)
    return _typed_collect(
        res, {"event_id": "int64", "user_id": "int64", "wait_us": "int64"}
    )


ANALYTICS26_QUERIES["events_queue_wait"] = q_events_queue_wait

ANALYTICS26_ORACLES["events_queue_wait"] = (
    "WITH t AS (SELECT event_id, user_id, "
    "CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events), "
    "x AS (SELECT event_id, user_id, ts_us, "
    "CASE WHEN lag(ts_us) OVER w IS NULL THEN 0 "
    f"ELSE {SERVICE_US} - (ts_us - lag(ts_us) OVER w) END AS xv FROM t "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), "
    "c1 AS (SELECT event_id, user_id, ts_us, SUM(xv) OVER "
    "(PARTITION BY user_id ORDER BY ts_us, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM x), "
    "c2 AS (SELECT event_id, user_id, cum, MIN(cum) OVER "
    "(PARTITION BY user_id ORDER BY ts_us, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn FROM c1) "
    "SELECT event_id, user_id, CAST(cum - mn AS BIGINT) AS wait_us FROM c2"
)


# ----------------------------------------------------------------------
# Unicode codepoint-class census
# ----------------------------------------------------------------------
def q_docs_codepoint_census(sf_dir):
    """(doc_id, n_alpha, n_digit, n_cjk, n_other): codepoint classes
    per doc (other = non-space, non-alpha, non-digit, non-CJK)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def census(t: pa.Table) -> pa.Table:
        ids, na, nd, nc, no = [], [], [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            cp = np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32)
            alpha = ((cp >= 65) & (cp <= 90)) | ((cp >= 97) & (cp <= 122))
            digit = (cp >= 48) & (cp <= 57)
            cjk = (cp >= 0x4E00) & (cp <= 0x9FFF)
            space = (cp == 32) | (cp == 9) | (cp == 10) | (cp == 13)
            other = ~(alpha | digit | cjk | space)
            ids.append(did)
            na.append(int(alpha.sum()))
            nd.append(int(digit.sum()))
            nc.append(int(cjk.sum()))
            no.append(int(other.sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_alpha": pa.array(na, pa.int64()),
                "n_digit": pa.array(nd, pa.int64()),
                "n_cjk": pa.array(nc, pa.int64()),
                "n_other": pa.array(no, pa.int64()),
            }
        )

    return _typed_collect(
        docs.map_batches(census, batch_format="pyarrow"),
        {
            "doc_id": "int64",
            "n_alpha": "int64",
            "n_digit": "int64",
            "n_cjk": "int64",
            "n_other": "int64",
        },
    )


ANALYTICS26_QUERIES["docs_codepoint_census"] = q_docs_codepoint_census

ANALYTICS26_ORACLES["docs_codepoint_census"] = (
    "SELECT doc_id, "
    "CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha, "
    "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit, "
    "CAST(length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS BIGINT) AS n_cjk, "
    "CAST(length(regexp_replace(text, "
    "'[a-zA-Z0-9一-鿿 \\t\\n\\r]', '', 'g')) AS BIGINT) AS n_other "
    "FROM documents"
)


# ----------------------------------------------------------------------
# MMR diversified retrieval
# ----------------------------------------------------------------------
def q_emb_mmr_top10(sf_dir):
    """(rank, vec_id): 10 vectors picked by Maximal Marginal Relevance
    (λ=1/2) against the query (= min vec_id's embedding) from the
    top-32 cosine candidate pool."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    qid = int(emb.min("vec_id"))
    qrow = emb.filter(lambda r: r["vec_id"] == qid).take(1)[0]
    qv = np.asarray(qrow["embedding"], np.float64)
    qv = qv / np.linalg.norm(qv)
    q_ref = ray.put(qv)

    def partial_top(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = np.stack(
            [np.asarray(v, np.float64) for v in t["embedding"].to_pylist()]
        )
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        rel = M @ q
        keep = ids != qid
        ids, M, rel = ids[keep], M[keep], rel[keep]
        order = np.lexsort((ids, -rel))[:MMR_POOL]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "rel": pa.array(rel[order], pa.float64()),
                "vec": pa.array(
                    [row.tolist() for row in M[order]], pa.list_(pa.float64())
                ),
            }
        )

    pool = (
        emb.map_batches(partial_top, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["rel", "vec_id"], ascending=[False, True])
        .head(MMR_POOL)
        .reset_index(drop=True)
    )
    ids = pool["vec_id"].to_numpy(np.int64)
    rel = pool["rel"].to_numpy(np.float64)
    V = np.stack([np.asarray(v, np.float64) for v in pool["vec"]])

    picked: list[int] = []
    chosen_mask = np.zeros(len(ids), bool)
    max_sim = np.full(len(ids), -np.inf)
    for _ in range(min(MMR_K, len(ids))):
        # penalty clamped at 0 (also covers the -inf pre-pick sentinel):
        # raw MMR rewards ANTI-correlated junk at lambda=1/2; clamping is
        # the standard fix (negative similarity is not diversity credit)
        penalty = np.maximum(max_sim, 0.0)
        score = np.where(
            chosen_mask, -np.inf, MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * penalty
        )
        # tie-break by vec_id asc: argmax over (-score, id) lexsort
        best = int(np.lexsort((ids, -score))[0])
        picked.append(best)
        chosen_mask[best] = True
        sims = V @ V[best]
        max_sim = np.maximum(max_sim, sims)
    out = pd.DataFrame(
        {
            "rank": np.arange(1, len(picked) + 1, dtype=np.int64),
            "vec_id": ids[picked].astype(np.int64),
        }
    )
    return _typed_collect(
        ray.data.from_pandas(out), {"rank": "int64", "vec_id": "int64"}
    )


ANALYTICS26_QUERIES["emb_mmr_top10"] = q_emb_mmr_top10
# no SQL oracle: the greedy argmax chain has no SQL form; serial replay
# + diversity pytests.
