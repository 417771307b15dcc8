"""Analytics batch (session 7): CUSUM changepoint, inter-arrival
histogram, big-table decile report, per-label embedding centroids.

Each is a (ray_fn, oracle_sql) pair continuing queries.py's exactness
discipline — integer surfaces wherever a float could reassociate, and
any shared expression tree written token-for-token on both sides.

Distributed shapes:
- ``events_cusum``: the hourly count series folds distributed (batch
  partials + bucketed sum); the O(#hours) CUSUM recursion runs on the
  driver over that SMALL aggregate (the orders_monthly_growth
  precedent — the series scales with time, not data volume), using the
  closed form S_t = P_t − min(0, min_{j≤t} P_j) so the SQL oracle is a
  window expression, not a recursion.
- ``events_interarrival``: one user-bucketed co-group (the
  events_lag_stats device); gap bit-width histogram folds as per-bucket
  partials, ≤ |types|·64 rows ever reach the driver.
- ``lineitem_deciles``: NTILE(10) over the BIGGEST table via the
  distributed window primitive (``grouped_row_number`` ungrouped mode —
  no worker holds the whole order). (l_orderkey, l_linenumber) is NOT
  unique in this data, so ROW ranks are tie-arbitrary — but the
  per-decile aggregate is tie-INVARIANT (rows with equal composite sort
  key carry equal price_c, so each tile's count and sum are fixed),
  which is exactly what both sides surface.
- ``emb_label_centroid``: per-(label, dim) integer-quantized element
  sums — per-batch k×d partials, one bucketed pair-sum; quantization
  floor(x*1e6 + 0.5) per ELEMENT before any addition, so the sums are
  exact int64 on both sides.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import (
    bucketed_reduce,
    grouped_row_number,
    mix64,
    sum_by_key,
    sum_by_key_pair,
)

CUSUM_TYPE = "purchase"
HOUR_US = 3_600_000_000


# ----------------------------------------------------------------------
# CUSUM changepoint over the hourly purchase-count series
# ----------------------------------------------------------------------
def q_events_cusum(sf_dir):
    """One-sided CUSUM drift statistic over hourly purchase counts —
    the classic rate-changepoint monitor. Reference slack k is the
    ceil-mean hourly count (integer, derived from the same series).
    S_t = max(0, S_{t-1} + x_t − k) computed via the prefix closed form
    S_t = P_t − min(0, min_{j≤t} P_j) with P_t = Σ(x_i − k): the engine
    does one numpy cumsum/cummin over the small hourly aggregate, the
    oracle one window expression — no recursion on either side."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )

    def hour_partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), object)
        keep = et == CUSUM_TYPE
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)[keep]
        hr = (us // HOUR_US) * HOUR_US
        u, c = np.unique(hr, return_counts=True)
        return pa.table(
            {"hour_us": pa.array(u, pa.int64()), "x": pa.array(c.astype(np.int64), pa.int64())}
        )

    hourly = sum_by_key(
        ev.map_batches(hour_partial, batch_format="pyarrow"), "hour_us", ["x"]
    ).to_pandas()
    if not len(hourly):
        return pd.DataFrame(
            {"hour": pd.to_datetime([]), "x": pd.array([], dtype="int64"),
             "cusum": pd.array([], dtype="int64")}
        )
    hourly = hourly.sort_values("hour_us").reset_index(drop=True)
    x = hourly["x"].to_numpy(np.int64)
    n, total = len(x), int(x.sum())
    k = (total + n - 1) // n  # ceil-mean reference slack, exact integer
    pre = np.cumsum(x - k)
    floor_ = np.minimum(np.minimum.accumulate(pre), 0)
    return pd.DataFrame(
        {
            "hour": pd.to_datetime(hourly["hour_us"].to_numpy(np.int64), unit="us"),
            "x": pd.array(x, dtype="int64"),
            "cusum": pd.array(pre - floor_, dtype="int64"),
        }
    )


SQL_EVENTS_CUSUM = (
    "WITH h AS (SELECT date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS x "
    f"FROM events WHERE event_type = '{CUSUM_TYPE}' GROUP BY 1), "
    "k AS (SELECT (sum(x) + count(*) - 1) // count(*) AS k FROM h), "
    "p AS (SELECT hour, x, sum(x - (SELECT k FROM k)) OVER (ORDER BY hour) AS pre FROM h) "
    "SELECT hour, x, CAST(pre - least(0, min(pre) OVER "
    "(ORDER BY hour ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS cusum FROM p"
)


# ----------------------------------------------------------------------
# Inter-arrival-time histogram (log2 buckets) per event type
# ----------------------------------------------------------------------
_POW2 = (np.int64(1) << np.arange(63)).astype(np.int64)


def q_events_interarrival(sf_dir):
    """Histogram of per-user inter-arrival gaps, log2-bucketed — the
    traffic-burstiness profile. Gap = floor seconds between consecutive
    events of the SAME user (ordered by ts, event_id), attributed to
    the LATER event's type; bucket = bit width of the gap (0s -> 0,
    else floor(log2)+1 — exactly ``length(printf('%b', g))`` in SQL,
    searchsorted against powers of two here). One user-bucketed
    co-group; ≤ |types|·64 partial rows reach the driver fold."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def hist(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["user_id", "ts", "event_id"])
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df["us"] = us
        prev = df.groupby("user_id")["us"].shift()
        ok = prev.notna().to_numpy()
        gap_s = ((df["us"].to_numpy(np.int64) - prev.fillna(0).to_numpy(np.int64))
                 // 1_000_000)[ok]
        bits = np.searchsorted(_POW2, gap_s, side="right")  # 0 -> 0, else floor(log2)+1
        et = df["event_type"].to_numpy(object)[ok]
        out = (
            pd.DataFrame({"event_type": et, "gap_bits": bits.astype(np.int64)})
            .groupby(["event_type", "gap_bits"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "event_type": pa.array(out["event_type"].astype(str), pa.string()),
                "gap_bits": pa.array(out["gap_bits"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(out["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    parts = bucketed_reduce(ev, bucket_of, hist).to_pandas()
    if not len(parts):
        return pd.DataFrame(
            {"event_type": pd.array([], dtype="string"),
             "gap_bits": pd.array([], dtype="int64"), "n": pd.array([], dtype="int64")}
        )
    out = parts.groupby(["event_type", "gap_bits"], as_index=False)["n"].sum()
    return out.astype({"event_type": "string", "gap_bits": "int64", "n": "int64"})


SQL_EVENTS_INTERARRIVAL = (
    "WITH l AS (SELECT event_type, epoch_us(ts) AS us, "
    "LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev "
    "FROM events), "
    "g AS (SELECT event_type, (us - prev) // 1000000 AS gs FROM l WHERE prev IS NOT NULL) "
    "SELECT event_type, "
    "CAST(CASE WHEN gs <= 0 THEN 0 ELSE length(printf('%b', gs)) END AS BIGINT) AS gap_bits, "
    "CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1, 2"
)


# ----------------------------------------------------------------------
# Decile report over lineitem price (big-table distributed NTILE)
# ----------------------------------------------------------------------
def q_lineitem_deciles(sf_dir):
    """Per-decile count and exact-cent revenue of ALL lineitems ranked
    by extended price — NTILE(10) over the biggest table through the
    distributed window primitive (range-partitioned: no worker holds
    the global order). The sort key is (price_c, l_orderkey*8 +
    l_linenumber); that composite is NOT unique in this data, so row
    ranks are tie-arbitrary — the surfaced per-decile aggregate is
    tie-invariant (equal-key rows carry equal price_c), identically on
    both sides."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )

    def project(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "price_c": pa.array(np.floor(p * 100 + 0.5).astype(np.int64), pa.int64()),
                "tb": pa.array(ok * 8 + ln, pa.int64()),
            }
        )

    ranked = grouped_row_number(
        li.map_batches(project, batch_format="pyarrow"),
        None,
        "price_c",
        "tb",
        ntile=10,
        ntile_col="decile",
    )

    def tile_partial(batch: pa.Table) -> pa.Table:
        t = batch["decile"].to_numpy(zero_copy_only=False).astype(np.int64)
        pc = batch["price_c"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(t, return_inverse=True)
        return pa.table(
            {
                "decile": pa.array(u, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "sum_price_c": pa.array(np.bincount(inv, pc).astype(np.int64), pa.int64()),
            }
        )

    return sum_by_key(
        ranked.map_batches(tile_partial, batch_format="pyarrow"),
        "decile",
        ["n", "sum_price_c"],
    )


SQL_LINEITEM_DECILES = (
    "WITH r AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c, "
    "NTILE(10) OVER (ORDER BY CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT), "
    "l_orderkey * 8 + l_linenumber) AS tile FROM lineitem) "
    "SELECT CAST(tile AS BIGINT) AS decile, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(price_c) AS BIGINT) AS sum_price_c FROM r GROUP BY tile"
)


# ----------------------------------------------------------------------
# Per-label embedding centroids (integer-quantized exact sums)
# ----------------------------------------------------------------------
def q_emb_label_centroid(sf_dir):
    """Per-(label, dim) centroid building blocks: exact int64 sums of
    floor(x*1e6 + 0.5)-quantized elements plus the label's vector
    count — the class-prototype computation of embedding analysis
    (nearest-class-mean classification, clustering drift). Per batch a
    k×d partial matrix folds locally; the shuffle is one bucketed
    (label, dim) pair-sum. Quantizing each ELEMENT before any addition
    makes both sides bit-exact (no float reassociation anywhere)."""
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["label", "embedding"]
    )

    from everythinggraph_ray.datapipe.knn import _batch_matrix

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch)  # (rows, d) float64 — exact float32 widening
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(lab, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(u), d), np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(u, d), pa.int64()),
                "d": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), len(u)), pa.int64()),
                "sum_q": pa.array(sums.ravel(), pa.int64()),
                "n_vecs": pa.array(np.repeat(cnt, d), pa.int64()),
            }
        )

    return sum_by_key_pair(
        emb.map_batches(partial, batch_format="pyarrow"),
        "label",
        "d",
        ["sum_q", "n_vecs"],
    )


SQL_EMB_LABEL_CENTROID = (
    "WITH u AS (SELECT label, "
    "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q, "
    "generate_subscripts(embedding, 1) AS d FROM embeddings) "
    "SELECT CAST(label AS BIGINT) AS label, CAST(d AS BIGINT) AS d, "
    "CAST(sum(q) AS BIGINT) AS sum_q, CAST(count(*) AS BIGINT) AS n_vecs "
    "FROM u GROUP BY label, d"
)


ANALYTICS_EXTRA_QUERIES = {
    "events_cusum": q_events_cusum,
    "events_interarrival": q_events_interarrival,
    "lineitem_deciles": q_lineitem_deciles,
    "emb_label_centroid": q_emb_label_centroid,
}

ANALYTICS_EXTRA_ORACLES = {
    "events_cusum": SQL_EVENTS_CUSUM,
    "events_interarrival": SQL_EVENTS_INTERARRIVAL,
    "lineitem_deciles": SQL_LINEITEM_DECILES,
    "emb_label_centroid": SQL_EMB_LABEL_CENTROID,
}


# ----------------------------------------------------------------------
# BM25 top-k retrieval over the document corpus
# ----------------------------------------------------------------------
BM25_TERMS = ("hash", "join", "stream")
BM25_K = 10


def q_docs_bm25_top10(sf_dir):
    """Okapi BM25 top-10 for a fixed 3-term query — search-engine
    relevance over the corpus, the query-time complement of the
    inverted index. One tokenization pass (narrow int table), T+2
    driver scalars, vectorized scoring with a fixed-order float sum
    (the docs_tfidf ln-parity device); the idf/length-norm expression
    tree is written token-for-token in the oracle."""
    from everythinggraph_ray.datapipe.text import bm25_topk

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return bm25_topk(docs, BM25_TERMS, BM25_K)


def _bm25_sql() -> str:
    t0, t1, t2 = BM25_TERMS

    def term(j: int, t: str) -> str:
        return (
            f"ln((CAST(g.n_docs AS DOUBLE) - g.df{j} + 0.5) / (g.df{j} + 0.5) + 1.0) "
            f"* (f.tf{j} * 2.2) "
            f"/ (f.tf{j} + 1.2 * (1 - 0.75 + 0.75 * (l.len_d / (CAST(g.total_len AS DOUBLE) / g.n_docs))))"
        )

    return (
        "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t "
        "FROM documents), "
        "lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len_d FROM tok GROUP BY doc_id), "
        "f AS (SELECT doc_id, "
        f"CAST(count(*) FILTER (t = '{t0}') AS BIGINT) AS tf0, "
        f"CAST(count(*) FILTER (t = '{t1}') AS BIGINT) AS tf1, "
        f"CAST(count(*) FILTER (t = '{t2}') AS BIGINT) AS tf2 "
        "FROM tok GROUP BY doc_id), "
        "g AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs, "
        "(SELECT CAST(count(*) AS BIGINT) FROM tok) AS total_len, "
        "(SELECT CAST(count(*) AS BIGINT) FROM f WHERE tf0 > 0) AS df0, "
        "(SELECT CAST(count(*) AS BIGINT) FROM f WHERE tf1 > 0) AS df1, "
        "(SELECT CAST(count(*) AS BIGINT) FROM f WHERE tf2 > 0) AS df2), "
        "s AS (SELECT f.doc_id, "
        + term(0, t0) + " + " + term(1, t1) + " + " + term(2, t2) + " AS score "
        "FROM f JOIN lens l USING (doc_id), g "
        "WHERE f.tf0 + f.tf1 + f.tf2 > 0) "
        "SELECT doc_id, round(score, 6) AS score, rnk AS rank FROM "
        "(SELECT doc_id, score, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk FROM s) "
        f"WHERE rnk <= {BM25_K}"
    )


ANALYTICS_EXTRA_QUERIES["docs_bm25_top10"] = q_docs_bm25_top10
ANALYTICS_EXTRA_ORACLES["docs_bm25_top10"] = _bm25_sql()


# ----------------------------------------------------------------------
# Leave-one-out 1-NN label accuracy (embedding-quality eval)
# ----------------------------------------------------------------------
def q_emb_1nn_accuracy(sf_dir):
    """Per-label leave-one-out 1-NN classification accuracy over the
    embedding table — the standard intrinsic eval of an embedding
    space. The normalized corpus matrix broadcasts once via ray.put
    (N×d floats; at 100 TB the same per-batch scan runs against IVF
    cell slices instead — the knn_ivf path), each batch computes its
    sims block vectorized, the nearest OTHER vector resolves with the
    exact (sim desc, id asc) tie rule (duplicate embeddings are real —
    the planted near-dup fixtures), and only per-label (n, n_correct)
    partials leave the workers."""
    import ray as _ray

    from everythinggraph_ray.datapipe.knn import _batch_matrix, _normalize

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )
    full = emb.to_pandas()
    ids = full["vec_id"].to_numpy(np.int64)
    labels = full["label"].to_numpy(np.int64)
    mat = _normalize(np.stack(full["embedding"].to_numpy()).astype(np.float64))
    order = np.argsort(ids, kind="stable")
    ref = _ray.put((ids[order], labels[order], mat[order]))

    def partial(batch: pa.Table) -> pa.Table:
        cids, clabs, cmat = _ray.get(ref)
        q = _normalize(_batch_matrix(batch))
        qid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qlab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = q @ cmat.T
        sims[qid[:, None] == cids[None, :]] = -np.inf  # mask self
        best = sims.max(axis=1)
        # exact (sim desc, id asc) winner under ties
        tie = sims == best[:, None]
        idmat = np.where(tie, cids[None, :], np.iinfo(np.int64).max)
        nn_idx = np.argmin(idmat, axis=1)
        correct = (clabs[nn_idx] == qlab).astype(np.int64)
        u, inv = np.unique(qlab, return_inverse=True)
        return pa.table(
            {
                "label": pa.array(u, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "n_correct": pa.array(np.bincount(inv, correct).astype(np.int64), pa.int64()),
            }
        )

    return sum_by_key(
        emb.map_batches(partial, batch_format="pyarrow"), "label", ["n", "n_correct"]
    )


SQL_EMB_1NN = (
    "WITH nn AS (SELECT a.vec_id, a.label AS la, b.label AS lb, "
    "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
    "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC, "
    "b.vec_id) AS rnk FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id) "
    "SELECT CAST(la AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n, "
    "CAST(count(*) FILTER (lb = la) AS BIGINT) AS n_correct "
    "FROM nn WHERE rnk = 1 GROUP BY la"
)


# ----------------------------------------------------------------------
# Daily user growth (new + cumulative distinct users)
# ----------------------------------------------------------------------
DAY_US = 86_400_000_000


def q_events_user_growth(sf_dir):
    """Daily NEW users and the cumulative distinct-user curve — the
    canonical growth chart, computed without ever holding a seen-set:
    first-seen day per user is a distributed bucketed MIN, the per-day
    new-user counts are a tiny series (days scale with time, not data),
    and the cumulative sum folds on the driver."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    from everythinggraph_ray.stages.agg import bucketed_reduce

    def first_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        day = (us // DAY_US) * DAY_US
        df = pd.DataFrame({"user_id": uid, "day_us": day}).groupby("user_id", as_index=False).min()
        return pa.table(
            {
                "user_id": pa.array(df["user_id"].to_numpy(np.int64), pa.int64()),
                "day_us": pa.array(df["day_us"].to_numpy(np.int64), pa.int64()),
            }
        )

    def bucket_u(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def first_final(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("user_id", as_index=False)["day_us"].min()
        # fold straight to per-day partial counts inside the bucket
        d = df.groupby("day_us", as_index=False).size()
        return pa.table(
            {
                "day_us": pa.array(d["day_us"].to_numpy(np.int64), pa.int64()),
                "new_users": pa.array(d["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    daily = sum_by_key(
        bucketed_reduce(
            ev.map_batches(first_partial, batch_format="pyarrow"), bucket_u, first_final
        ),
        "day_us",
        ["new_users"],
    ).to_pandas()
    daily = daily.sort_values("day_us").reset_index(drop=True)
    return pd.DataFrame(
        {
            "day": pd.to_datetime(daily["day_us"].to_numpy(np.int64), unit="us"),
            "new_users": pd.array(daily["new_users"].to_numpy(np.int64), dtype="int64"),
            "cum_users": pd.array(
                np.cumsum(daily["new_users"].to_numpy(np.int64)), dtype="int64"
            ),
        }
    )


SQL_EVENTS_USER_GROWTH = (
    "WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS day FROM events GROUP BY user_id), "
    "d AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM f GROUP BY day) "
    "SELECT day, new_users, CAST(sum(new_users) OVER "
    "(ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users FROM d"
)


# ----------------------------------------------------------------------
# Deterministic A/B arms + conversion rates
# ----------------------------------------------------------------------
def q_events_ab_arms(sf_dir):
    """Deterministic A/B assignment (the md5 shard device: first 8 hex
    chars of md5(user_id) mod 2 — no RNG, resume/replica-stable) with
    per-arm user counts, converters (>=1 purchase) and the integer
    milli conversion rate. Per-user purchase counts fold distributed;
    the arm hash is recomputed inline from the key (nothing joined to
    fetch it)."""
    import hashlib

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )

    def purchase_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(batch["event_type"].to_pylist(), object)
        df = pd.DataFrame({"user_id": uid, "np_": (et == "purchase").astype(np.int64)})
        g = df.groupby("user_id", as_index=False)["np_"].sum()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(np.int64), pa.int64()),
                "np_": pa.array(g["np_"].to_numpy(np.int64), pa.int64()),
            }
        )

    per_user = sum_by_key(
        ev.map_batches(purchase_partial, batch_format="pyarrow"), "user_id", ["np_"]
    )

    def arm_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        npu = batch["np_"].to_numpy(zero_copy_only=False)
        arm = np.array(
            [int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2 for u in uid.tolist()],
            np.int64,
        )
        out = {"arm": [], "n_users": [], "n_converters": []}
        for a in (0, 1):
            m = arm == a
            out["arm"].append(a)
            out["n_users"].append(int(m.sum()))
            out["n_converters"].append(int((npu[m] > 0).sum()))
        return pa.table(
            {
                "arm": pa.array(out["arm"], pa.int64()),
                "n_users": pa.array(out["n_users"], pa.int64()),
                "n_converters": pa.array(out["n_converters"], pa.int64()),
            }
        )

    arms = sum_by_key(
        per_user.map_batches(arm_partial, batch_format="pyarrow"),
        "arm",
        ["n_users", "n_converters"],
    ).to_pandas()
    arms = arms.sort_values("arm").reset_index(drop=True)
    arms = arms[arms["n_users"] > 0]
    arms["conv_milli"] = (
        arms["n_converters"].to_numpy(np.int64) * 1000 // arms["n_users"].to_numpy(np.int64)
    )
    return arms.astype(
        {"arm": "int64", "n_users": "int64", "n_converters": "int64", "conv_milli": "int64"}
    )


SQL_EVENTS_AB_ARMS = (
    "WITH u AS (SELECT user_id, "
    "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np_ "
    "FROM events GROUP BY user_id), "
    "a AS (SELECT CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 AS BIGINT) AS arm, np_ FROM u) "
    "SELECT arm, CAST(count(*) AS BIGINT) AS n_users, "
    "CAST(count(*) FILTER (np_ > 0) AS BIGINT) AS n_converters, "
    "CAST(count(*) FILTER (np_ > 0) * 1000 // count(*) AS BIGINT) AS conv_milli "
    "FROM a GROUP BY arm"
)


ANALYTICS_EXTRA_QUERIES.update(
    {
        "emb_1nn_accuracy": q_emb_1nn_accuracy,
        "events_user_growth": q_events_user_growth,
        "events_ab_arms": q_events_ab_arms,
    }
)
ANALYTICS_EXTRA_ORACLES.update(
    {
        "emb_1nn_accuracy": SQL_EMB_1NN,
        "events_user_growth": SQL_EVENTS_USER_GROWTH,
        "events_ab_arms": SQL_EVENTS_AB_ARMS,
    }
)


# ----------------------------------------------------------------------
# Greedy maximum-weight matching (weight-DESC priority, md5 tiebreak)
# ----------------------------------------------------------------------
def q_rel_matching_weighted(sf_dir):
    """Greedy MAXIMUM-WEIGHT matching (the classic 1/2-approximation):
    graph/matching.py with weight-DESC priorities — the 2-digit
    ``99 - w`` prefix (w = a%10 + b%10, the reference's synthesized
    weight rule) before the md5 tiebreak. Same parallel rounds, same
    serial-tail convention as rel_matching; output adds the matched
    weight column so the oracle checks the weight objective too."""
    from everythinggraph_ray.graph.matching import maximal_matching
    from everythinggraph_ray.pipelines.queries import rel_edges

    out, _rounds = maximal_matching(rel_edges(sf_dir), weighted=True)

    def add_w(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "w": pa.array(a % 10 + b % 10, pa.int64()),
            }
        )

    return out.map_batches(add_w, batch_format="pyarrow")


def _weighted_matching_sql(rounds: int = 80) -> str:
    """The _matching_sql device with the weighted key: round r matches
    every active edge whose (weight-DESC, md5) key is minimal at BOTH
    endpoints. Weight-stratified keys converge SLOWER than hash-random
    ones (the 19 discrete weight levels serialize: a chain of
    descending-weight edges retires one level at a time, ~O(levels *
    log E) rounds — measured 60 at sf0.01 vs 20 for the unweighted
    kernel), hence the deeper unroll; leftovers are deliberately
    unmatched so an insufficient unroll still mismatches loudly."""
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    def key(a: str, b: str) -> str:
        return (
            f"lpad(CAST(99 - ({a} % 10 + {b} % 10) AS VARCHAR), 2, '0') || "
            f"md5(CAST({a} AS VARCHAR) || ':' || CAST({b} AS VARCHAR)) || "
            f"lpad(CAST({a} AS VARCHAR), 20, '0') || lpad(CAST({b} AS VARCHAR), 20, '0')"
        )

    ctes = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        f"FROM ({SQL_REL_EDGES}) WHERE src <> dst)"
    ]
    for r in range(rounds):
        ctes.append(
            f"vm{r} AS MATERIALIZED (SELECT x AS v, min(k) AS mk FROM "
            f"(SELECT a AS x, {key('a', 'b')} AS k FROM e{r} "
            f"UNION ALL SELECT b AS x, {key('a', 'b')} AS k FROM e{r}) GROUP BY x)"
        )
        ctes.append(
            f"w{r} AS MATERIALIZED (SELECT e.a, e.b FROM e{r} e "
            f"JOIN vm{r} va ON va.v = e.a JOIN vm{r} vb ON vb.v = e.b "
            f"WHERE {key('e.a', 'e.b')} = va.mk AND {key('e.a', 'e.b')} = vb.mk)"
        )
        ctes.append(
            f"sat{r} AS MATERIALIZED (SELECT a AS vid FROM w{r} UNION SELECT b AS vid FROM w{r})"
        )
        ctes.append(
            f"e{r+1} AS MATERIALIZED (SELECT a, b FROM e{r} "
            f"WHERE a NOT IN (SELECT vid FROM sat{r}) AND b NOT IN (SELECT vid FROM sat{r}))"
        )
    union = " UNION ALL ".join(f"SELECT a, b FROM w{r}" for r in range(rounds))
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT a, b, CAST(a % 10 + b % 10 AS BIGINT) AS w FROM ({union})"
    )


ANALYTICS_EXTRA_QUERIES["rel_matching_weighted"] = q_rel_matching_weighted
ANALYTICS_EXTRA_ORACLES["rel_matching_weighted"] = _weighted_matching_sql()


# ----------------------------------------------------------------------
# Adamic–Adar link prediction (integer-quantized center contributions)
# ----------------------------------------------------------------------
def q_rel_adamic_adar(sf_dir):
    """Top-20 non-adjacent pairs by Adamic–Adar score — the
    degree-discounted refinement of common-neighbor link prediction
    (Liben-Nowell–Kleinberg). Each common neighbor c contributes
    floor(1e9 / ln(deg(c))) QUANTIZED to int64 BEFORE summation (a
    variable-size float sum would reassociate across engines; the
    integer sum is exact — the docs_pmi_pairs device), and deg(c) is
    free at wedge time since the center's whole adjacency co-locates
    in its bucket. ln parity with DuckDB is the docs_tfidf precedent."""
    from everythinggraph_ray.graph.linkpred import common_neighbors_topk
    from everythinggraph_ray.pipelines.queries import rel_edges

    out = common_neighbors_topk(rel_edges(sf_dir), 20, score="adamic")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch["a"], "b": batch["b"], "aa_u": batch["cnt"]}
        )

    return out.map_batches(rename, batch_format="pyarrow")


def _adamic_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    return (
        f"WITH e AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        f"FROM ({SQL_REL_EDGES}) WHERE src <> dst), "
        "adj AS MATERIALIZED (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e), "
        "deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u), "
        "w AS (SELECT a1.v AS a, a2.v AS b, "
        "CAST(floor(1000000000 / ln(CAST(dg.d AS DOUBLE))) AS BIGINT) AS s "
        "FROM adj a1 JOIN adj a2 ON a2.u = a1.u AND a1.v < a2.v "
        "JOIN deg dg ON dg.u = a1.u), "
        "agg AS (SELECT a, b, CAST(sum(s) AS BIGINT) AS aa_u FROM w GROUP BY a, b) "
        "SELECT g.a, g.b, g.aa_u FROM agg g "
        "WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = g.a AND e.b = g.b) "
        "ORDER BY g.aa_u DESC, g.a, g.b LIMIT 20"
    )


ANALYTICS_EXTRA_QUERIES["rel_adamic_adar"] = q_rel_adamic_adar
ANALYTICS_EXTRA_ORACLES["rel_adamic_adar"] = _adamic_sql()


# ----------------------------------------------------------------------
# Top event-type trigram paths (per-user ordered 3-step sequences)
# ----------------------------------------------------------------------
def q_events_trigrams(sf_dir):
    """Most common 3-event type sequences within a user's time-ordered
    stream — the path-analysis extension of events_transitions (bigram
    -> trigram, double LAG). One user-bucketed co-group, two vectorized
    shifts per bucket, bounded |types|^3 aggregate."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    from everythinggraph_ray.stages.agg import bucketed_reduce

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def tri(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["user_id", "ts", "event_id"])
        p1 = df.groupby("user_id")["event_type"].shift(1)
        p2 = df.groupby("user_id")["event_type"].shift(2)
        ok = p2.notna().to_numpy()
        out = (
            pd.DataFrame(
                {
                    "t1": p2[ok].to_numpy(object),
                    "t2": p1[ok].to_numpy(object),
                    "t3": df["event_type"].to_numpy(object)[ok],
                }
            )
            .groupby(["t1", "t2", "t3"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "t1": pa.array(out["t1"].astype(str), pa.string()),
                "t2": pa.array(out["t2"].astype(str), pa.string()),
                "t3": pa.array(out["t3"].astype(str), pa.string()),
                "n": pa.array(out["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    parts = bucketed_reduce(ev, bucket_of, tri).to_pandas()
    if not len(parts):
        return pd.DataFrame(
            {"t1": pd.array([], dtype="string"), "t2": pd.array([], dtype="string"),
             "t3": pd.array([], dtype="string"), "n": pd.array([], dtype="int64")}
        )
    out = parts.groupby(["t1", "t2", "t3"], as_index=False)["n"].sum()
    return out.astype({"t1": "string", "t2": "string", "t3": "string", "n": "int64"})


SQL_EVENTS_TRIGRAMS = (
    "WITH s AS (SELECT event_type AS t3, "
    "LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2, "
    "LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1 "
    "FROM events) "
    "SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n "
    "FROM s WHERE t1 IS NOT NULL GROUP BY t1, t2, t3"
)


ANALYTICS_EXTRA_QUERIES["events_trigrams"] = q_events_trigrams
ANALYTICS_EXTRA_ORACLES["events_trigrams"] = SQL_EVENTS_TRIGRAMS


# ----------------------------------------------------------------------
# SQ8 recall eval: how much exact-search recall survives 8-bit codes
# ----------------------------------------------------------------------
SQ8_QUERIES = 8
SQ8_K = 10


def q_emb_sq8_recall(sf_dir):
    """Recall of SQ8-quantized exact search vs full-precision exact
    search (the emb_dim_recall harness pointed at the quantization axis
    instead of the truncation axis): for the 8 smallest vec_ids, top-10
    by cosine over the decoded uint8 CODE vectors vs top-10 over the
    original floats, reported as per-query overlap. The code expression
    tree is emb_quantize_sq's (bit-exact both sides); ranking parity is
    the knn list_cosine_similarity precedent."""
    import ray as _ray

    from everythinggraph_ray.datapipe.knn import knn_bruteforce, smallest_ids
    from everythinggraph_ray.datapipe.quantize import _batch_matrix as _qmat
    from everythinggraph_ray.datapipe.quantize import sq8_minmax

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = smallest_ids(emb, "vec_id", SQ8_QUERIES)
    full = knn_bruteforce(emb, ids, k=SQ8_K)

    mn, mx = sq8_minmax(emb)
    rng_ref = _ray.put((mn, mx))

    def to_codes(batch: pa.Table) -> pa.Table:
        lo, hi = _ray.get(rng_ref)
        m = _qmat(batch, "embedding")
        span = hi - lo
        with np.errstate(divide="ignore", invalid="ignore"):
            codes = np.floor((m - lo) * 255.0 / span)
        codes = np.where(span == 0.0, 0.0, codes)
        codes = np.clip(codes, 0.0, 255.0)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": pa.array(
                    [row.tolist() for row in codes], pa.list_(pa.float64())
                ),
            }
        )

    quant = knn_bruteforce(
        emb.map_batches(to_codes, batch_format="pyarrow"), ids, k=SQ8_K
    )
    m = full.merge(quant, on=["query_id", "neighbor_id"], how="left", suffixes=("", "_q"))
    out = (
        m.groupby("query_id", as_index=False)
        .agg(n_overlap=("rank_q", "count"))
        .astype({"query_id": "int64", "n_overlap": "int64"})
    )
    return out[["query_id", "n_overlap"]]


SQL_EMB_SQ8_RECALL = (
    "WITH v AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS val, "
    "generate_subscripts(embedding, 1) AS dim FROM embeddings), "
    "mm AS (SELECT dim, min(val) AS mn, max(val) AS mx FROM v GROUP BY dim), "
    "codes AS (SELECT vec_id, v.dim, CASE WHEN mx = mn THEN 0.0 "
    "ELSE least(greatest(floor((val - mn) * 255 / (mx - mn)), 0), 255) "
    "END AS code FROM v JOIN mm ON mm.dim = v.dim), "
    "cl AS (SELECT vec_id, list(code ORDER BY dim) AS cv FROM codes GROUP BY vec_id), "
    f"q AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {SQ8_QUERIES}), "
    "full_r AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
    "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
    "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, "
    f"e.vec_id) AS rnk FROM q, embeddings e WHERE e.vec_id <> q.vec_id QUALIFY rnk <= {SQ8_K}), "
    "qc AS (SELECT c.vec_id, c.cv FROM cl c JOIN q ON q.vec_id = c.vec_id), "
    "quant_r AS (SELECT qc.vec_id AS query_id, c.vec_id AS neighbor_id, "
    "row_number() OVER (PARTITION BY qc.vec_id ORDER BY "
    "list_cosine_similarity(qc.cv, c.cv) DESC, c.vec_id) AS rnk "
    f"FROM qc, cl c WHERE c.vec_id <> qc.vec_id QUALIFY rnk <= {SQ8_K}) "
    "SELECT f.query_id, CAST(count(h.neighbor_id) AS BIGINT) AS n_overlap "
    "FROM full_r f LEFT JOIN quant_r h ON h.query_id = f.query_id "
    "AND h.neighbor_id = f.neighbor_id GROUP BY f.query_id"
)


ANALYTICS_EXTRA_QUERIES["emb_sq8_recall"] = q_emb_sq8_recall
ANALYTICS_EXTRA_ORACLES["emb_sq8_recall"] = SQL_EMB_SQ8_RECALL


# ----------------------------------------------------------------------
# Pairwise Pearson correlation profile over lineitem numeric columns
# ----------------------------------------------------------------------
_CORR_COLS = ["qty", "price_d", "disc_pct", "tax_pct"]


def q_lineitem_corr(sf_dir):
    """Pairwise Pearson correlations over lineitem's numeric columns
    (quantity, whole-dollar price, discount %, tax %) — the ANALYZE-
    style correlation profile, the rel_assortativity moment device
    generalized to all 6 column pairs. ONE streaming pass folds all 15
    int64 moments (4 sums, 4 square-sums, 6 cross-sums, n) per batch;
    quantization floor(x·s + 0.5) keeps every moment exact int64
    (price² sums peak ~5e15, six orders inside int64), and each r is
    the identical guarded float expression on both sides."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        cols = {
            "qty": np.floor(batch["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(np.int64),
            "price_d": np.floor(batch["l_extendedprice"].to_numpy(zero_copy_only=False) + 0.5).astype(np.int64),
            "disc_pct": np.floor(batch["l_discount"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64),
            "tax_pct": np.floor(batch["l_tax"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64),
        }
        out = {"n": pa.array([batch.num_rows], pa.int64())}
        for c in _CORR_COLS:
            out[f"s_{c}"] = pa.array([int(cols[c].sum())], pa.int64())
            out[f"s2_{c}"] = pa.array([int((cols[c] * cols[c]).sum())], pa.int64())
        for i, a in enumerate(_CORR_COLS):
            for b in _CORR_COLS[i + 1:]:
                out[f"x_{a}_{b}"] = pa.array([int((cols[a] * cols[b]).sum())], pa.int64())
        return pa.table(out)

    p = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    s = {c: int(p[f"s_{c}"].sum()) for c in _CORR_COLS}
    s2 = {c: int(p[f"s2_{c}"].sum()) for c in _CORR_COLS}
    rows = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            sxy = int(p[f"x_{a}_{b}"].sum())
            num = float(n) * float(sxy) - float(s[a]) * float(s[b])
            vx = float(n) * float(s2[a]) - float(s[a]) * float(s[a])
            vy = float(n) * float(s2[b]) - float(s[b]) * float(s[b])
            r = num / (np.sqrt(vx) * np.sqrt(vy)) if vx > 0 and vy > 0 else 0.0
            rows.append((a, b, n, s[a], s[b], sxy, s2[a], s2[b], float(r)))
    return pd.DataFrame(
        rows,
        columns=["x_name", "y_name", "n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2", "r"],
    ).astype(
        {
            "x_name": "string", "y_name": "string", "n": "int64", "sum_x": "int64",
            "sum_y": "int64", "sum_xy": "int64", "sum_x2": "int64", "sum_y2": "int64",
        }
    )


def _corr_sql() -> str:
    base = (
        "WITH q AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty, "
        "CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS price_d, "
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct, "
        "CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_pct FROM lineitem) "
    )
    arms = []
    cols = _CORR_COLS
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            arms.append(
                f"SELECT '{a}' AS x_name, '{b}' AS y_name, "
                f"CAST(count(*) AS BIGINT) AS n, CAST(sum({a}) AS BIGINT) AS sum_x, "
                f"CAST(sum({b}) AS BIGINT) AS sum_y, CAST(sum({a} * {b}) AS BIGINT) AS sum_xy, "
                f"CAST(sum({a} * {a}) AS BIGINT) AS sum_x2, CAST(sum({b} * {b}) AS BIGINT) AS sum_y2, "
                f"CASE WHEN (CAST(count(*) AS DOUBLE) * CAST(sum({a} * {a}) AS DOUBLE) - CAST(sum({a}) AS DOUBLE) * CAST(sum({a}) AS DOUBLE)) > 0 "
                f"AND (CAST(count(*) AS DOUBLE) * CAST(sum({b} * {b}) AS DOUBLE) - CAST(sum({b}) AS DOUBLE) * CAST(sum({b}) AS DOUBLE)) > 0 "
                f"THEN (CAST(count(*) AS DOUBLE) * CAST(sum({a} * {b}) AS DOUBLE) - CAST(sum({a}) AS DOUBLE) * CAST(sum({b}) AS DOUBLE)) / "
                f"(sqrt(CAST(count(*) AS DOUBLE) * CAST(sum({a} * {a}) AS DOUBLE) - CAST(sum({a}) AS DOUBLE) * CAST(sum({a}) AS DOUBLE)) * "
                f"sqrt(CAST(count(*) AS DOUBLE) * CAST(sum({b} * {b}) AS DOUBLE) - CAST(sum({b}) AS DOUBLE) * CAST(sum({b}) AS DOUBLE))) "
                f"ELSE 0.0 END AS r FROM q"
            )
    return base + " UNION ALL ".join(arms)


ANALYTICS_EXTRA_QUERIES["lineitem_corr"] = q_lineitem_corr
ANALYTICS_EXTRA_ORACLES["lineitem_corr"] = _corr_sql()


# ----------------------------------------------------------------------
# Cosine-normalized co-citation (item-item collaborative filtering)
# ----------------------------------------------------------------------
def q_rel_cocitation_cosine(sf_dir):
    """Top-20 co-cited pairs ranked by the popularity-discounted cosine
    cnt / (sqrt(indeg(a)) * sqrt(indeg(b))) — the item-item
    collaborative-filtering similarity over the order→part incidence
    (graph/linkpred.py cocitation_topk score='cosine': the raw-count
    projection plus two distributed in-degree attaches; the sqrt/
    division expression is shared token-for-token with the oracle)."""
    from everythinggraph_ray.graph.linkpred import cocitation_topk
    from everythinggraph_ray.pipelines.queries import rel_edges

    return cocitation_topk(rel_edges(sf_dir), 20, score="cosine")


def _cocitation_cosine_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    return (
        f"WITH d AS (SELECT DISTINCT src, dst FROM ({SQL_REL_EDGES})), "
        "ind AS (SELECT dst AS vid, CAST(count(*) AS BIGINT) AS deg FROM d GROUP BY dst), "
        "p AS (SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS cnt "
        "FROM d e1 JOIN d e2 ON e1.src = e2.src AND e1.dst < e2.dst "
        "GROUP BY e1.dst, e2.dst) "
        "SELECT p.a, p.b, p.cnt, "
        "CAST(p.cnt AS DOUBLE) / (sqrt(CAST(ia.deg AS DOUBLE)) * sqrt(CAST(ib.deg AS DOUBLE))) AS cosine "
        "FROM p JOIN ind ia ON ia.vid = p.a JOIN ind ib ON ib.vid = p.b "
        "ORDER BY cosine DESC, p.a, p.b LIMIT 20"
    )


ANALYTICS_EXTRA_QUERIES["rel_cocitation_cosine"] = q_rel_cocitation_cosine
ANALYTICS_EXTRA_ORACLES["rel_cocitation_cosine"] = _cocitation_cosine_sql()


# ----------------------------------------------------------------------
# EWMA smoothing of the hourly event-rate series
# ----------------------------------------------------------------------
def q_events_ewma(sf_dir):
    """Exponentially-weighted moving average (alpha = 1/2) of the
    hourly TOTAL event count — the classic streaming smoother behind
    rate forecasting/anomaly baselines. The hourly series folds
    distributed (batch partials + bucketed sum); the inherently
    sequential recurrence s_t = 0.5*s_{t-1} + 0.5*x_t runs on the
    driver over that SMALL series in the exact order the SQL
    recursion replays, so the doubles are bit-equal. Surface is
    integer micro-units via floor(s*1e6 + 0.5): alpha = 1/2 makes
    every s an exact DYADIC rational, so .5 display-rounding ties are
    the common case, not the corner case — round() would split
    half-even (numpy) vs half-away (DuckDB) on a third of the rows."""
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def hour_partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        hr = (us // HOUR_US) * HOUR_US
        u, c = np.unique(hr, return_counts=True)
        return pa.table(
            {"hour_us": pa.array(u, pa.int64()), "x": pa.array(c.astype(np.int64), pa.int64())}
        )

    hourly = sum_by_key(
        ev.map_batches(hour_partial, batch_format="pyarrow"), "hour_us", ["x"]
    ).to_pandas()
    if not len(hourly):
        return pd.DataFrame(
            {"hour": pd.to_datetime([]), "x": pd.array([], dtype="int64"),
             "ewma_u": pd.array([], dtype="int64")}
        )
    hourly = hourly.sort_values("hour_us").reset_index(drop=True)
    x = hourly["x"].to_numpy(np.int64)
    s = float(x[0])
    out = [s]
    for xi in x[1:]:
        s = 0.5 * s + 0.5 * float(xi)
        out.append(s)
    return pd.DataFrame(
        {
            "hour": pd.to_datetime(hourly["hour_us"].to_numpy(np.int64), unit="us"),
            "x": pd.array(x, dtype="int64"),
            "ewma_u": pd.array(
                np.floor(np.array(out, np.float64) * 1e6 + 0.5).astype(np.int64),
                dtype="int64",
            ),
        }
    )


SQL_EVENTS_EWMA = (
    "WITH RECURSIVE h AS (SELECT date_trunc('hour', ts) AS hour, "
    "CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1), "
    "o AS (SELECT hour, x, row_number() OVER (ORDER BY hour) AS i FROM h), "
    "r AS (SELECT hour, x, i, CAST(x AS DOUBLE) AS s FROM o WHERE i = 1 "
    "UNION ALL SELECT o.hour, o.x, o.i, 0.5 * r.s + 0.5 * CAST(o.x AS DOUBLE) "
    "FROM r JOIN o ON o.i = r.i + 1) "
    "SELECT hour, x, CAST(floor(s * 1000000 + 0.5) AS BIGINT) AS ewma_u FROM r"
)


ANALYTICS_EXTRA_QUERIES["events_ewma"] = q_events_ewma
ANALYTICS_EXTRA_ORACLES["events_ewma"] = SQL_EVENTS_EWMA


# ----------------------------------------------------------------------
# Chi-square independence statistic (brand x size band over part)
# ----------------------------------------------------------------------
def q_part_chi2(sf_dir):
    """Independence test between p_brand and the p_size quintile band —
    the chi-square drift/contingency companion of events_ks. Cell,
    row and column counts fold distributed (bounded 25x5 cells); the
    statistic is the integer-exact per-cell fold
    chi2_milli = Σ ((o*n − r*c)² * 1000) // (r*c*n), evaluated in
    arbitrary-precision Python ints on the driver and HUGEINT in SQL
    ((o*n)² exceeds int64 once n > ~55k rows — numpy would wrap
    silently, so the small cell table deliberately leaves numpy)."""
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_brand", "p_size"]
    )

    def cell_partial(batch: pa.Table) -> pa.Table:
        br = np.asarray(batch["p_brand"].to_pylist(), object)
        sz = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        band = (sz - 1) * 5 // 50  # sizes 1..50 -> bands 0..4
        df = (
            pd.DataFrame({"brand": br, "band": band})
            .groupby(["brand", "band"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "brand": pa.array(df["brand"].astype(str), pa.string()),
                "band": pa.array(df["band"].to_numpy(np.int64), pa.int64()),
                "o": pa.array(df["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    cells = (
        part.map_batches(cell_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["brand", "band"], as_index=False)["o"]
        .sum()
    )
    n = int(cells["o"].sum())
    r_tot = cells.groupby("brand")["o"].sum().to_dict()
    c_tot = cells.groupby("band")["o"].sum().to_dict()
    chi = 0
    for brand, bd, o in zip(cells["brand"], cells["band"], cells["o"]):
        o, r, c = int(o), int(r_tot[brand]), int(c_tot[int(bd)])
        chi += ((o * n - r * c) ** 2 * 1000) // (r * c * n)  # python ints: no wrap
    out = cells.copy()
    out["r"] = out["brand"].map(r_tot).astype(np.int64)
    out["c"] = out["band"].map(c_tot).astype(np.int64)
    out["chi2_milli"] = np.int64(chi)
    return out.astype(
        {"brand": "string", "band": "int64", "o": "int64", "r": "int64", "c": "int64",
         "chi2_milli": "int64"}
    )[["brand", "band", "o", "r", "c", "chi2_milli"]]


SQL_PART_CHI2 = (
    "WITH cells AS (SELECT p_brand AS brand, "
    "CAST((p_size - 1) * 5 // 50 AS BIGINT) AS band, CAST(count(*) AS BIGINT) AS o "
    "FROM part GROUP BY 1, 2), "
    "r AS (SELECT brand, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY brand), "
    "c AS (SELECT band, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY band), "
    "n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells), "
    "j AS (SELECT cells.brand, cells.band, cells.o, r.r, c.c, (SELECT n FROM n) AS n "
    "FROM cells JOIN r USING (brand) JOIN c USING (band)), "
    # d*d, not d ** 2: DuckDB's ** is pow() and returns DOUBLE, silently
    # breaking the exact HUGEINT chain
    "d AS (SELECT brand, band, o, r, c, n, "
    "CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c AS dd FROM j), "
    "chi AS (SELECT CAST(sum((dd * dd * 1000) "
    "// (CAST(r AS HUGEINT) * c * n)) AS BIGINT) AS chi2_milli FROM d) "
    "SELECT brand, band, o, r, c, (SELECT chi2_milli FROM chi) AS chi2_milli FROM j"
)


ANALYTICS_EXTRA_QUERIES["part_chi2"] = q_part_chi2
ANALYTICS_EXTRA_ORACLES["part_chi2"] = SQL_PART_CHI2
