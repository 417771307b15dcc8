"""Analytics batch (session 8): TPC-H Q8-lite market share, rolling
7-day distinct users, last-touch attribution, Levenshtein verify pairs,
and centered-energy embedding outliers.

Each is a (ray_fn, oracle_sql) pair continuing queries.py's exactness
discipline — integer surfaces wherever a float could reassociate, and
any shared expression tree written token-for-token on both sides.

Distributed shapes:
- ``q8_market_share``: the three big joins (lineitem x PROMO part on
  partkey, x supplier-nation flag on suppkey, x ASIA-customer orders on
  orderkey) all go through the bucketed ``hash_join``; non-qualifying
  rows drop AT THE ATTACH, the share division is integer ppm on a
  per-year aggregate (HUGEINT chain on the SQL side).
- ``events_rolling_users``: rolling 7-day distinct users per day —
  dedup (day, user) via one bucketed pair-fold, EXPAND each surviving
  pair to its 7 window-end days (bounded 7x blowup of the already
  deduped pairs, not the raw events), dedup again, count per day. The
  day filter set is O(timespan), never O(events).
- ``events_attribution``: last-touch conversion attribution — the
  lag() window device (events_lag_stats precedent): one user-bucketed
  co-group, vectorized pandas shift inside the bucket, tie-broken by
  (ts, event_id) on both sides.
- ``docs_lev_pairs``: exact Levenshtein over blocked candidate pairs
  (same lang + same 12-char prefix; 64-char comparison window). The
  per-block pairing is quadratic IN THE BLOCK — fine for prefix blocks
  (data-bounded small); the principled scale paths for unbounded
  blocks are docs_jaccard_join (AllPairs) / docs_snm_pairs. DuckDB's
  levenshtein() is the oracle.
- ``emb_outliers``: top-20 anomalous vectors by centered L2 energy
  score = sum_d (n*q_id - S_d)^2 over per-element quantized ints —
  scale-free of any float division, exact on both sides (HUGEINT in
  SQL, Python-int object math per batch in Ray; the per-dim sums S_d
  are a 64-value broadcast, the top-20 a per-batch partial combiner).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import (
    bucketed_reduce,
    grouped_top_k,
    mix64,
    mix64_pair,
    sum_by_key,
)

ANALYTICS2_QUERIES: dict = {}
ANALYTICS2_ORACLES: dict = {}

DAY_US = 86_400_000_000

# rel edge derivation shared with queries.py (src=orderkey%V, dst=partkey%V)
REL_V_A2 = 1000
SQL_REL_EDGES_A2 = (
    f"SELECT l_orderkey % {REL_V_A2} AS src, l_partkey % {REL_V_A2} AS dst FROM lineitem"
)

# ----------------------------------------------------------------------
# TPC-H Q8-lite: national market share per order year
# ----------------------------------------------------------------------
Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"
Q8_NATION = "NATION_3"


def _cents(price: np.ndarray, disc: np.ndarray) -> np.ndarray:
    # floor(x+0.5), not np.round: numpy rounds half-EVEN, DuckDB half-away
    return np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)


def q_q8_market_share(sf_dir):
    """TPC-H Q8-lite: NATION_3 suppliers' share (ppm) of PROMO-part
    revenue sold to ASIA-region customers, per order year. Mirrors
    tpch_q8.sql's share-of-volume shape (reference has no SQL tier;
    semantics per SURVEY §2 training-data additions). All three probe
    joins are bucketed hash_joins with qualify-at-attach drops; the
    small dims (nation x region, supplier nation flag) ride as
    broadcast maps."""
    import duckdb

    # tiny dims: nationkey -> in-ASIA flag / name (25 + 5 rows, driver-side)
    con = duckdb.connect()
    nr = con.execute(
        f"SELECT n_nationkey, n_name, r_name FROM read_parquet('{os.path.join(sf_dir, 'nation.parquet')}') n "
        f"JOIN read_parquet('{os.path.join(sf_dir, 'region.parquet')}') r ON r.r_regionkey = n.n_regionkey"
    ).fetch_df()
    con.close()
    asia_nk = set(nr.loc[nr["r_name"] == Q8_REGION, "n_nationkey"].astype(int))
    nation_nk = set(nr.loc[nr["n_name"] == Q8_NATION, "n_nationkey"].astype(int))
    asia_ref = ray.put(asia_nk)
    nk_ref = ray.put(nation_nk)

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )

    def asia_only(batch: pa.Table) -> pa.Table:
        ok = ray.get(asia_ref)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, np.fromiter(ok, np.int64)) if ok else np.zeros(len(nk), bool)
        return pa.table(
            {"c_custkey": pa.array(batch["c_custkey"].to_numpy(zero_copy_only=False)[keep], pa.int64())}
        )

    cust_a = cust.map_batches(asia_only, batch_format="pyarrow")

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def oyear(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        year = od.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "order_year": pa.array(year, pa.int64()),
            }
        )

    ord_a = hash_join(
        orders.map_batches(oyear, batch_format="pyarrow"),
        cust_a,
        on="o_custkey",
        right_on="c_custkey",
        right_cols=[],
    )

    part_t = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )

    def promo_only(batch: pa.Table) -> pa.Table:
        pt = np.asarray(batch["p_type"].to_pylist(), object)
        keep = pt == Q8_TYPE
        return pa.table(
            {"p_partkey": pa.array(batch["p_partkey"].to_numpy(zero_copy_only=False)[keep], pa.int64())}
        )

    part_p = part_t.map_batches(promo_only, batch_format="pyarrow")

    supp = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )

    def nflag(batch: pa.Table) -> pa.Table:
        ok = ray.get(nk_ref)
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        isn = (np.isin(nk, np.fromiter(ok, np.int64)) if ok else np.zeros(len(nk), bool)).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": pa.array(batch["s_suppkey"].to_numpy(zero_copy_only=False), pa.int64()),
                "is_n": pa.array(isn, pa.int64()),
            }
        )

    supp_f = supp.map_batches(nflag, batch_format="pyarrow")

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_partkey": batch["l_partkey"],
                "l_suppkey": batch["l_suppkey"],
                "rev_c": pa.array(
                    _cents(
                        batch["l_extendedprice"].to_numpy(zero_copy_only=False),
                        batch["l_discount"].to_numpy(zero_copy_only=False),
                    ),
                    pa.int64(),
                ),
            }
        )

    li_p = hash_join(
        li.map_batches(rev, batch_format="pyarrow"),
        part_p,
        on="l_partkey",
        right_on="p_partkey",
        right_cols=[],
    )
    li_ps = hash_join(li_p, supp_f, on="l_suppkey", right_on="s_suppkey", right_cols=["is_n"])
    li_all = hash_join(
        li_ps, ord_a, on="l_orderkey", right_on="o_orderkey", right_cols=["order_year"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        yr = batch["order_year"].to_numpy(zero_copy_only=False).astype(np.int64)
        rv = batch["rev_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        isn = batch["is_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(yr, return_inverse=True)
        return pa.table(
            {
                "order_year": pa.array(u, pa.int64()),
                "total_c": pa.array(np.bincount(inv, weights=rv).astype(np.int64), pa.int64()),
                "nation_c": pa.array(np.bincount(inv, weights=rv * isn).astype(np.int64), pa.int64()),
            }
        )

    agg = sum_by_key(
        li_all.map_batches(partials, batch_format="pyarrow"), "order_year", ["total_c", "nation_c"]
    ).to_pandas()
    agg = agg.sort_values("order_year").reset_index(drop=True)
    agg["share_ppm"] = [
        int(n) * 1_000_000 // int(t) for n, t in zip(agg["nation_c"], agg["total_c"])
    ]
    return agg.astype(
        {"order_year": "int64", "total_c": "int64", "nation_c": "int64", "share_ppm": "int64"}
    )[["order_year", "total_c", "nation_c", "share_ppm"]]


SQL_Q8 = (
    "WITH v AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year, "
    "CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS rev_c, "
    f"CASE WHEN sn.n_name = '{Q8_NATION}' THEN 1 ELSE 0 END AS is_n "
    "FROM lineitem l "
    f"JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{Q8_TYPE}' "
    "JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "JOIN customer c ON c.c_custkey = o.o_custkey "
    "JOIN nation cn ON cn.n_nationkey = c.c_nationkey "
    f"JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = '{Q8_REGION}' "
    "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "JOIN nation sn ON sn.n_nationkey = s.s_nationkey) "
    "SELECT order_year, CAST(sum(rev_c) AS BIGINT) AS total_c, "
    "CAST(sum(rev_c * is_n) AS BIGINT) AS nation_c, "
    "CAST(CAST(sum(rev_c * is_n) AS HUGEINT) * 1000000 // sum(rev_c) AS BIGINT) AS share_ppm "
    "FROM v GROUP BY order_year"
)

ANALYTICS2_QUERIES["q8_market_share"] = q_q8_market_share
ANALYTICS2_ORACLES["q8_market_share"] = SQL_Q8


# ----------------------------------------------------------------------
# Rolling 7-day distinct users per active day
# ----------------------------------------------------------------------
def q_events_rolling_users(sf_dir):
    """Distinct users in the trailing 7-day window ending at each
    active day — the DAU/WAU rolling-uniques report. COUNT(DISTINCT)
    OVER RANGE isn't a combinable aggregate, so the engine dedups
    (day, user) once (bucketed pair fold), expands each pair to its 7
    window-end days (a bounded 7x blowup of DEDUPED pairs), dedups
    (end_day, user) again, and counts rows per end day; only window
    ends that are real active days survive (the day set is
    O(timespan), broadcast as a driver set)."""
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"])

    def day_user(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        d = us // DAY_US
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.stack([d, uid], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {
                "d": pa.array(uniq[:, 0], pa.int64()),
                "user_id": pa.array(uniq[:, 1], pa.int64()),
                "one": pa.array(np.ones(len(uniq), np.int64), pa.int64()),
            }
        )

    pairs = ev.map_batches(day_user, batch_format="pyarrow")

    # dedup (day, user): bucketed fold keyed on the pair hash
    def bucket_pair(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["d"].to_numpy(zero_copy_only=False).astype(np.uint64),
            batch["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
        ).astype(np.int64) & 0x7FFFFFFF

    def dedup_pair(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates(["d", "user_id"])
        return pa.table(
            {
                "d": pa.array(df["d"].to_numpy(np.int64), pa.int64()),
                "user_id": pa.array(df["user_id"].to_numpy(np.int64), pa.int64()),
            }
        )

    du = bucketed_reduce(pairs, bucket_pair, dedup_pair)

    # active-day set: O(timespan) rows, safe on the driver
    days = sorted(
        int(r["d"]) for r in sum_by_key(pairs, "d", ["one"]).select_columns(["d"]).take_all()
    )
    days_ref = ray.put(set(days))

    def expand(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ends = (d[:, None] + np.arange(7, dtype=np.int64)[None, :]).ravel()
        uids = np.repeat(uid, 7)
        ok = ray.get(days_ref)
        keep = np.isin(ends, np.fromiter(ok, np.int64))
        return pa.table(
            {
                "day": pa.array(ends[keep], pa.int64()),
                "user_id": pa.array(uids[keep], pa.int64()),
            }
        )

    expanded = du.map_batches(expand, batch_format="pyarrow")

    def bucket_end(batch: pa.Table) -> np.ndarray:
        return mix64_pair(
            batch["day"].to_numpy(zero_copy_only=False).astype(np.uint64),
            batch["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
        ).astype(np.int64) & 0x7FFFFFFF

    def count_end(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates(["day", "user_id"])
        cnt = df.groupby("day").size()
        return pa.table(
            {
                "day": pa.array(cnt.index.to_numpy(np.int64), pa.int64()),
                "users7": pa.array(cnt.to_numpy(np.int64), pa.int64()),
            }
        )

    # a (day,user) window pair lands in exactly one bucket, so per-bucket
    # partial counts sum exactly
    per_bucket = bucketed_reduce(expanded, bucket_end, count_end)
    return sum_by_key(per_bucket, "day", ["users7"])


SQL_ROLLING_USERS = (
    "WITH du AS (SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d, "
    "user_id FROM events), "
    "days AS (SELECT DISTINCT d FROM du) "
    "SELECT days.d AS day, CAST(count(DISTINCT du.user_id) AS BIGINT) AS users7 "
    "FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d "
    "GROUP BY days.d"
)

ANALYTICS2_QUERIES["events_rolling_users"] = q_events_rolling_users
ANALYTICS2_ORACLES["events_rolling_users"] = SQL_ROLLING_USERS


# ----------------------------------------------------------------------
# Last-touch attribution: event type preceding each purchase
# ----------------------------------------------------------------------
def q_events_attribution(sf_dir):
    """Last-touch conversion attribution: for every purchase event, the
    user's immediately preceding event type (lag over (ts, event_id)
    within the user stream; '(none)' when the purchase opens the
    stream), counted per preceding type. Same user-bucketed co-group +
    vectorized pandas shift as events_lag_stats."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def attrib(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["user_id", "ts", "event_id"])
        prev = df.groupby("user_id")["event_type"].shift().fillna("(none)")
        purchases = prev[df["event_type"].to_numpy() == "purchase"]
        cnt = purchases.value_counts()
        return pa.table(
            {
                "prev_type": pa.array(cnt.index.astype(str), pa.string()),
                "conversions": pa.array(cnt.to_numpy(np.int64), pa.int64()),
            }
        )

    # final fold: at most |event types|+1 keys per bucket — tiny on the driver
    per_bucket = bucketed_reduce(ev, bucket_of, attrib).to_pandas()
    out = per_bucket.groupby("prev_type", as_index=False)["conversions"].sum()
    return out.astype({"prev_type": "string", "conversions": "int64"})


SQL_ATTRIBUTION = (
    "WITH e AS (SELECT user_id, event_id, event_type, "
    "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev "
    "FROM events) "
    "SELECT coalesce(prev, '(none)') AS prev_type, CAST(count(*) AS BIGINT) AS conversions "
    "FROM e WHERE event_type = 'purchase' GROUP BY 1"
)

ANALYTICS2_QUERIES["events_attribution"] = q_events_attribution
ANALYTICS2_ORACLES["events_attribution"] = SQL_ATTRIBUTION


# ----------------------------------------------------------------------
# Levenshtein distance over blocked candidate pairs
# ----------------------------------------------------------------------
LEV_PFX = 12
LEV_WIN = 64


def _levenshtein(a: str, b: str) -> int:
    """Exact unit-cost edit distance, row-vectorized DP: O(len(a))
    numpy passes over len(b)-wide rows (never a per-cell Python loop).
    Matches DuckDB's levenshtein()."""
    if a == b:
        return 0
    ca = np.frombuffer(a.encode("utf-32-le"), np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), np.uint32)
    if len(ca) == 0:
        return len(cb)
    if len(cb) == 0:
        return len(ca)
    idx = np.arange(len(cb) + 1, dtype=np.int64)
    prev = idx.copy()
    for i, ch in enumerate(ca):
        cur = np.empty(len(cb) + 1, np.int64)
        cur[0] = i + 1
        cur[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (cb != ch))
        # insertion chain cur[j] = min_{k<=j}(cur[k] + (j-k)) via the
        # arange-offset identity: j + minaccum(cur - j)
        t = cur - idx
        np.minimum.accumulate(t, out=t)
        prev = t + idx
    return int(prev[-1])


def lev_pairs(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Edit-distance verify over blocked candidates: pairs of documents
    sharing (lang, first-12-chars), distance computed on the 64-char
    comparison window — the classic post-blocking near-dup verifier.
    Blocks co-locate via one bucketed co-group on the block-key hash;
    within a block the pair set is the exact doc_id-ordered cross
    (quadratic IN THE BLOCK, data-bounded; see docs_jaccard_join /
    docs_snm_pairs for blocks that can't be bounded). DuckDB's
    levenshtein() is the oracle — unit costs, codepoint-level."""

    def keyed(batch: pa.Table) -> pa.Table:
        txt = np.asarray(batch["text"].to_pylist(), object)
        lang = np.asarray(batch["lang"].to_pylist(), object)
        key = np.asarray([f"{la}|{t[:LEV_PFX]}" for la, t in zip(lang, txt)], object)
        win = np.asarray([t[:LEV_WIN] for t in txt], object)
        return pa.table(
            {
                "key": pa.array(key, pa.string()),
                "doc_id": batch["doc_id"],
                "s": pa.array(win, pa.string()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        # stable across worker processes (Python hash() is seed-randomized)
        from hashlib import blake2b

        h = np.asarray(
            [
                int.from_bytes(blake2b(k.encode(), digest_size=8).digest(), "little")
                for k in batch["key"].to_pylist()
            ],
            np.uint64,
        )
        return mix64(h).astype(np.int64) & 0x7FFFFFFF

    def pairs_in_block(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        out1, out2, dist = [], [], []
        for _, grp in df.groupby("key"):  # blocks are small by construction
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].to_numpy(np.int64)
            ss = grp["s"].to_numpy(object)
            i, j = np.triu_indices(len(ids), k=1)
            out1.append(ids[i])
            out2.append(ids[j])
            dist.append(np.asarray([_levenshtein(ss[a], ss[b]) for a, b in zip(i, j)], np.int64))
        if not out1:
            return pa.table(
                {
                    "doc1": pa.array([], pa.int64()),
                    "doc2": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc1": pa.array(np.concatenate(out1), pa.int64()),
                "doc2": pa.array(np.concatenate(out2), pa.int64()),
                "dist": pa.array(np.concatenate(dist), pa.int64()),
            }
        )

    return bucketed_reduce(docs.map_batches(keyed, batch_format="pyarrow"), bucket_of, pairs_in_block)


def q_docs_lev_pairs(sf_dir):
    """Driver-surface wrapper: lev_pairs over the documents table."""
    return lev_pairs(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
        )
    )


SQL_LEV_PAIRS = (
    f"WITH d AS (SELECT doc_id, lang, substr(text, 1, {LEV_PFX}) AS pfx, "
    f"substr(text, 1, {LEV_WIN}) AS s FROM documents) "
    "SELECT a.doc_id AS doc1, b.doc_id AS doc2, "
    "CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist "
    "FROM d a JOIN d b ON a.lang = b.lang AND a.pfx = b.pfx AND a.doc_id < b.doc_id"
)

ANALYTICS2_QUERIES["docs_lev_pairs"] = q_docs_lev_pairs
ANALYTICS2_ORACLES["docs_lev_pairs"] = SQL_LEV_PAIRS


# ----------------------------------------------------------------------
# Embedding outliers by centered L2 energy
# ----------------------------------------------------------------------
EMB_OUTLIER_K = 20


def q_emb_outliers(sf_dir):
    """Top-20 anomalous embeddings by centered L2 energy:
    score_i = sum_d (n*q_id − S_d)^2 with q = floor(x*1e6 + 0.5) —
    the n^2-scaled squared distance from the mean, kept in exact
    integers so no float variance division can reassociate. S_d is a
    64-long broadcast (per-batch partial sums, one driver add); the
    top-20 rides the per-batch partial-top-k combiner. Squares are
    Python-int object math per batch (HUGEINT analogue; n*q ~ 1e12 at
    petascale would overflow an int64 square)."""
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def quant(batch: pa.Table) -> np.ndarray:
        x = np.asarray(batch["embedding"].to_pylist(), np.float64)
        return np.floor(x * 1_000_000 + 0.5).astype(np.int64)

    def partial_sums(batch: pa.Table) -> pa.Table:
        q = quant(batch)
        return pa.table(
            {
                "dim": pa.array(np.arange(q.shape[1], dtype=np.int64), pa.int64()),
                "sd": pa.array(q.sum(axis=0, dtype=np.int64), pa.int64()),
                "n": pa.array(np.full(q.shape[1], q.shape[0], np.int64), pa.int64()),
            }
        )

    sums = sum_by_key(
        emb.map_batches(partial_sums, batch_format="pyarrow"), "dim", ["sd", "n"]
    ).to_pandas().sort_values("dim")
    S = sums["sd"].to_numpy(np.int64)
    n = int(sums["n"].iloc[0])
    s_ref = ray.put((S, n))

    def score(batch: pa.Table) -> pa.Table:
        Sd, nn = ray.get(s_ref)
        q = quant(batch)
        # object math: (n*q - S) squares exceed int64 at petascale n
        c = (q.astype(object) * nn) - Sd.astype(object)
        sc = (c * c).sum(axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "score": pa.array(sc.astype(np.int64), pa.int64()),
                "g": pa.array(np.zeros(len(q), np.int64), pa.int64()),
            }
        )

    scored = emb.map_batches(score, batch_format="pyarrow")
    top = grouped_top_k(
        scored, "g", [("score", False), ("vec_id", True)], EMB_OUTLIER_K
    )
    return top.select_columns(["vec_id", "score"])


SQL_EMB_OUTLIERS = (
    "WITH q AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim, "
    "CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000 + 0.5) AS BIGINT) AS qv "
    "FROM embeddings), "
    "s AS (SELECT dim, CAST(sum(qv) AS BIGINT) AS sd FROM q GROUP BY dim), "
    "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings), "
    "d AS (SELECT q.vec_id, CAST(q.qv AS HUGEINT) * (SELECT n FROM n) - s.sd AS dd "
    "FROM q JOIN s USING (dim)), "
    "sc AS (SELECT vec_id, CAST(sum(dd * dd) AS BIGINT) AS score FROM d GROUP BY vec_id) "
    "SELECT vec_id, score FROM sc "
    f"QUALIFY row_number() OVER (ORDER BY score DESC, vec_id) <= {EMB_OUTLIER_K}"
)

ANALYTICS2_QUERIES["emb_outliers"] = q_emb_outliers
ANALYTICS2_ORACLES["emb_outliers"] = SQL_EMB_OUTLIERS


# ----------------------------------------------------------------------
# TPC-H Q9-lite: supplier-nation profit on a named part family
# ----------------------------------------------------------------------
Q9_PART = "rod"
# supply cost proxy: 60% of retail cents (no partsupp table in this corpus)
Q9_COST_NUM, Q9_COST_DEN = 3, 5


def q_q9_profit(sf_dir):
    """TPC-H Q9-lite: profit per (supplier nation, order year) for
    parts whose name contains 'rod'. profit = revenue cents −
    qty · (60% of retail cents) — partsupp doesn't exist in this corpus
    so the supply cost is an integer retail-price proxy, identical on
    both sides. Joins: lineitem x matching part (cost attach) and
    x orders (year attach) through the bucketed hash_join; supplier →
    nation name rides the 25-row broadcast map."""
    import duckdb

    con = duckdb.connect()
    nmap = dict(
        con.execute(
            f"SELECT n_nationkey, n_name FROM read_parquet('{os.path.join(sf_dir, 'nation.parquet')}')"
        ).fetchall()
    )
    con.close()
    nref = ray.put({int(k): str(v) for k, v in nmap.items()})

    part_t = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name", "p_retailprice"]
    )

    def rod_cost(batch: pa.Table) -> pa.Table:
        names = np.asarray(batch["p_name"].to_pylist(), object)
        keep = np.asarray([Q9_PART in n for n in names], bool)
        cost_c = np.floor(
            batch["p_retailprice"].to_numpy(zero_copy_only=False)[keep] * 100 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "p_partkey": pa.array(
                    batch["p_partkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "cost_c": pa.array(cost_c * Q9_COST_NUM // Q9_COST_DEN, pa.int64()),
            }
        )

    part_c = part_t.map_batches(rod_cost, batch_format="pyarrow")

    supp = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )

    def sname(batch: pa.Table) -> pa.Table:
        m = ray.get(nref)
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": pa.array(batch["s_suppkey"].to_numpy(zero_copy_only=False), pa.int64()),
                "nation": pa.array([m[int(k)] for k in nk], pa.string()),
            }
        )

    supp_n = supp.map_batches(sname, batch_format="pyarrow")

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate"]
    )

    def oyear(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "order_year": pa.array(
                    od.astype("datetime64[Y]").astype(np.int64) + 1970, pa.int64()
                ),
            }
        )

    ord_y = orders.map_batches(oyear, batch_format="pyarrow")

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_partkey": batch["l_partkey"],
                "l_suppkey": batch["l_suppkey"],
                "qty": pa.array(
                    np.floor(batch["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(np.int64),
                    pa.int64(),
                ),
                "rev_c": pa.array(
                    _cents(
                        batch["l_extendedprice"].to_numpy(zero_copy_only=False),
                        batch["l_discount"].to_numpy(zero_copy_only=False),
                    ),
                    pa.int64(),
                ),
            }
        )

    li_p = hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        part_c,
        on="l_partkey",
        right_on="p_partkey",
        right_cols=["cost_c"],
    )
    li_ps = hash_join(li_p, supp_n, on="l_suppkey", right_on="s_suppkey", right_cols=["nation"])
    li_all = hash_join(li_ps, ord_y, on="l_orderkey", right_on="o_orderkey", right_cols=["order_year"])

    def partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["profit_c"] = (
            df["rev_c"].to_numpy(np.int64) - df["qty"].to_numpy(np.int64) * df["cost_c"].to_numpy(np.int64)
        )
        g = df.groupby(["nation", "order_year"], as_index=False).agg(
            profit_c=("profit_c", "sum"), n_items=("profit_c", "size")
        )
        return pa.table(
            {
                "nation": pa.array(g["nation"].astype(str), pa.string()),
                "order_year": pa.array(g["order_year"].to_numpy(np.int64), pa.int64()),
                "profit_c": pa.array(g["profit_c"].to_numpy(np.int64), pa.int64()),
                "n_items": pa.array(g["n_items"].to_numpy(np.int64), pa.int64()),
            }
        )

    # final fold: |nations| x |years| rows — tiny on the driver
    parts = li_all.map_batches(partials, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["nation", "order_year"], as_index=False)[["profit_c", "n_items"]].sum()
    return out.astype(
        {"nation": "string", "order_year": "int64", "profit_c": "int64", "n_items": "int64"}
    )


SQL_Q9 = (
    "SELECT sn.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS order_year, "
    "CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) "
    "- CAST(floor(l.l_quantity + 0.5) AS BIGINT) "
    f"* (CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT) * {Q9_COST_NUM} // {Q9_COST_DEN})) "
    "AS BIGINT) AS profit_c, "
    "CAST(count(*) AS BIGINT) AS n_items "
    "FROM lineitem l "
    f"JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%{Q9_PART}%' "
    "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "JOIN nation sn ON sn.n_nationkey = s.s_nationkey "
    "JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "GROUP BY sn.n_name, year(o.o_orderdate)"
)

ANALYTICS2_QUERIES["q9_profit"] = q_q9_profit
ANALYTICS2_ORACLES["q9_profit"] = SQL_Q9


# ----------------------------------------------------------------------
# Mutual k-NN graph → connected components
# ----------------------------------------------------------------------
KNN_WCC_K = 5


def q_emb_knn_wcc(sf_dir):
    """Mutual k-NN clustering: each vector's top-5 cosine neighbors
    (integer-milli similarity grid, neighbor-id tiebreak), keep edges
    where BOTH endpoints pick each other, run the distributed WCCKernel
    over the mutual graph — the classic density-robust embedding
    clustering. Pairs come from the exact all-pairs baseline
    (allpairs_similarity's broadcast-matmul device; at 100 TB the
    generator swaps to the LSH/IVF candidate paths, the ranking +
    mutual + WCC tail is unchanged). Full DuckDB parity: window-ranked
    top-5 per node + self-join mutuality + the recursive min-label CTE."""
    from everythinggraph_ray.datapipe.knn import allpairs_similarity
    from everythinggraph_ray.datapipe.pairs import cluster_pairs

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    # threshold below -1 keeps every pair: ranking needs the full row
    pairs = allpairs_similarity(emb, threshold=-1.001)

    def directed(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        sm = batch["sim_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
                "sm": pa.array(np.concatenate([sm, sm]), pa.int64()),
            }
        )

    top = grouped_top_k(
        pairs.map_batches(directed, batch_format="pyarrow"),
        "u",
        [("sm", False), ("v", True)],
        KNN_WCC_K,
    )

    def canon_pair(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(np.minimum(u, v), pa.int64()),
                "b": pa.array(np.maximum(u, v), pa.int64()),
                "one": pa.array(np.ones(len(u), np.int64), pa.int64()),
            }
        )

    from everythinggraph_ray.stages.agg import sum_by_key_pair

    counts = sum_by_key_pair(
        top.map_batches(canon_pair, batch_format="pyarrow"), "a", "b", ["one"]
    )

    def mutual_only(batch: pa.Table) -> pa.Table:
        keep = batch["one"].to_numpy(zero_copy_only=False) == 2
        return pa.table(
            {
                "a": pa.array(batch["a"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
                "b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
            }
        )

    mutual = counts.map_batches(mutual_only, batch_format="pyarrow")
    out = cluster_pairs(mutual).map_batches(
        lambda t: pa.table({"vec_id": t["doc_id"], "cluster_id": t["cluster_id"]}),
        batch_format="pyarrow",
    )
    df = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
    return df.astype({"vec_id": "int64", "cluster_id": "int64"})


SQL_KNN_WCC = (
    "WITH RECURSIVE s AS (SELECT a.vec_id AS u, b.vec_id AS v, "
    "CAST(FLOOR(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) "
    "* 1000) AS BIGINT) AS sm "
    "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), "
    "top5 AS (SELECT u, v FROM s "
    f"QUALIFY row_number() OVER (PARTITION BY u ORDER BY sm DESC, v) <= {KNN_WCC_K}), "
    "mut AS (SELECT t1.u AS a, t1.v AS b FROM top5 t1 "
    "JOIN top5 t2 ON t1.u = t2.v AND t1.v = t2.u WHERE t1.u < t1.v), "
    "und AS (SELECT a AS u, b AS v FROM mut UNION SELECT b AS u, a AS v FROM mut), "
    "verts AS (SELECT DISTINCT u AS vid FROM und), "
    "r(vid, lab) AS (SELECT vid, vid FROM verts "
    "UNION SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v) "
    "SELECT vid AS vec_id, min(lab) AS cluster_id FROM r GROUP BY vid"
)

ANALYTICS2_QUERIES["emb_knn_wcc"] = q_emb_knn_wcc
ANALYTICS2_ORACLES["emb_knn_wcc"] = SQL_KNN_WCC


# ----------------------------------------------------------------------
# Exact mode of quantity per return flag
# ----------------------------------------------------------------------
def q_lineitem_mode(sf_dir):
    """Exact MODE of the (integral) quantity per return flag, smallest
    quantity on ties — the one descriptive statistic the suite lacked.
    Cells are bounded (|flags| x 50 quantities), so per-batch bincount
    partials fold on the driver."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_returnflag", "l_quantity"]
    )

    def cell_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "flag": np.asarray(batch["l_returnflag"].to_pylist(), object),
                "qty": np.floor(
                    batch["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
                ).astype(np.int64),
            }
        )
        g = df.groupby(["flag", "qty"], as_index=False).size()
        return pa.table(
            {
                "flag": pa.array(g["flag"].astype(str), pa.string()),
                "qty": pa.array(g["qty"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    cells = (
        li.map_batches(cell_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["flag", "qty"], as_index=False)["n"]
        .sum()
    )
    cells = cells.sort_values(["flag", "n", "qty"], ascending=[True, False, True])
    out = cells.groupby("flag", as_index=False).first()
    out = out.rename(columns={"qty": "mode_qty"})
    return out.astype({"flag": "string", "mode_qty": "int64", "n": "int64"})[
        ["flag", "mode_qty", "n"]
    ]


SQL_LINEITEM_MODE = (
    "WITH c AS (SELECT l_returnflag AS flag, "
    "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty, "
    "CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1, 2) "
    "SELECT flag, qty AS mode_qty, n FROM c "
    "QUALIFY row_number() OVER (PARTITION BY flag ORDER BY n DESC, qty) = 1"
)

ANALYTICS2_QUERIES["lineitem_mode"] = q_lineitem_mode
ANALYTICS2_ORACLES["lineitem_mode"] = SQL_LINEITEM_MODE


# ----------------------------------------------------------------------
# Top spender per day
# ----------------------------------------------------------------------
def q_events_top_user_per_day(sf_dir):
    """Per-day top spender: (day, user) spend folds exactly as
    micro-units through the bucketed pair aggregation, then the
    partial-top-k combiner picks one row per day (spend desc, user_id
    asc tiebreak) — the grouped-top-1 report every ops dashboard has."""
    from everythinggraph_ray.stages.agg import sum_by_key_pair

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id", "value"]
    )

    def day_spend(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "day": pa.array(us // DAY_US, pa.int64()),
                "user_id": pa.array(
                    batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()
                ),
                "spend_u": pa.array(
                    np.floor(
                        batch["value"].to_numpy(zero_copy_only=False) * 1_000_000 + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    spend = sum_by_key_pair(
        ev.map_batches(day_spend, batch_format="pyarrow"), "day", "user_id", ["spend_u"]
    )
    top = grouped_top_k(spend, "day", [("spend_u", False), ("user_id", True)], 1)
    return top.select_columns(["day", "user_id", "spend_u"])


SQL_TOP_USER_PER_DAY = (
    "WITH s AS (SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, user_id, "
    "CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS spend_u "
    "FROM events GROUP BY 1, 2) "
    "SELECT day, user_id, spend_u FROM s "
    "QUALIFY row_number() OVER (PARTITION BY day ORDER BY spend_u DESC, user_id) = 1"
)

ANALYTICS2_QUERIES["events_top_user_per_day"] = q_events_top_user_per_day
ANALYTICS2_ORACLES["events_top_user_per_day"] = SQL_TOP_USER_PER_DAY


# ----------------------------------------------------------------------
# Reorder latency per market segment
# ----------------------------------------------------------------------
def q_orders_reorder_gap(sf_dir):
    """Days between a customer's consecutive orders, aggregated per
    market segment (n_gaps, total days, integer mean) — the repeat-
    purchase latency report. Segment attaches through the bucketed
    hash_join; gaps come from the per-customer lag co-group
    (events_lag_stats device), partial-summed per segment inside each
    bucket so only |segments| rows per bucket reach the driver."""
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    withseg = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey", right_cols=["c_mktsegment"]
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["o_custkey"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def gaps(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        day = df["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df["day"] = day
        lag = df.groupby("o_custkey")["day"].shift()
        gap = (df["day"] - lag).dropna().astype(np.int64)
        seg = df.loc[gap.index, "c_mktsegment"]
        out = pd.DataFrame({"segment": seg, "gap": gap}).groupby("segment", as_index=False).agg(
            n_gaps=("gap", "size"), gap_days=("gap", "sum")
        )
        return pa.table(
            {
                "segment": pa.array(out["segment"].astype(str), pa.string()),
                "n_gaps": pa.array(out["n_gaps"].to_numpy(np.int64), pa.int64()),
                "gap_days": pa.array(out["gap_days"].to_numpy(np.int64), pa.int64()),
            }
        )

    per_bucket = bucketed_reduce(withseg, bucket_of, gaps).to_pandas()
    out = per_bucket.groupby("segment", as_index=False)[["n_gaps", "gap_days"]].sum()
    out["avg_gap_days"] = [
        int(d) // int(n) for d, n in zip(out["gap_days"], out["n_gaps"])
    ]
    return out.astype(
        {"segment": "string", "n_gaps": "int64", "gap_days": "int64", "avg_gap_days": "int64"}
    )


SQL_REORDER_GAP = (
    "WITH g AS (SELECT o_custkey, "
    "CAST(CAST(o_orderdate AS DATE) - CAST(lag(o_orderdate) OVER "
    "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE) AS BIGINT) AS gap "
    "FROM orders), "
    "j AS (SELECT c.c_mktsegment AS segment, g.gap FROM g "
    "JOIN customer c ON c.c_custkey = g.o_custkey WHERE g.gap IS NOT NULL) "
    "SELECT segment, CAST(count(*) AS BIGINT) AS n_gaps, "
    "CAST(sum(gap) AS BIGINT) AS gap_days, "
    "CAST(sum(gap) // count(*) AS BIGINT) AS avg_gap_days "
    "FROM j GROUP BY segment"
)

ANALYTICS2_QUERIES["orders_reorder_gap"] = q_orders_reorder_gap
ANALYTICS2_ORACLES["orders_reorder_gap"] = SQL_REORDER_GAP


# ----------------------------------------------------------------------
# Per-language KL divergence from the global unigram distribution
# ----------------------------------------------------------------------
def q_docs_kl(sf_dir):
    """KL(lang || corpus) over exact unigram counts — 'how far does
    each language's word distribution sit from the corpus mixture', the
    domain-shift signal next to docs_lang_entropy. Identity used (so
    only ln over exact shared integers appears on either side):
    KL = (Σ n·ln n − Σ n·ln n_g)/N_l − ln N_l + ln N_g. One bucketed
    co-group keyed by TOKEN hash (all languages of a token co-locate,
    so the in-bucket reducer sees the token's global count); per-lang
    (A, B, N) partials fold to |langs| driver rows. round 7 (the
    entropy float device, driver-compared bit-stable)."""
    import re as _re
    from hashlib import blake2b

    import pyarrow.compute as pc

    from everythinggraph_ray.datapipe.text import WORD_RE

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        rx = _re.compile(WORD_RE)
        cnt: dict[tuple[str, str], int] = {}
        for lg, t in zip(batch["lang"].to_pylist(), pc.utf8_lower(batch["text"]).to_pylist()):
            for w in rx.findall(t):
                cnt[(lg, w)] = cnt.get((lg, w), 0) + 1
        ks = list(cnt.keys())
        return pa.table(
            {
                "lang": pa.array([a for a, _ in ks], pa.string()),
                "token": pa.array([b for _, b in ks], pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        from everythinggraph_ray.stages.agg import string_buckets

        return string_buckets(batch["token"])

    def reduce_tokens(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["token", "lang"], as_index=False)["c"].sum()
        ng = df.groupby("token")["c"].transform("sum").to_numpy(np.int64)
        n = df["c"].to_numpy(np.int64)
        a = n * np.log(n)
        b = n * np.log(ng)
        out = pd.DataFrame({"lang": df["lang"], "n": n, "a": a, "b": b}).groupby(
            "lang", as_index=False
        ).sum()
        return pa.table(
            {
                "lang": pa.array(out["lang"].astype(str), pa.string()),
                "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
                "a": pa.array(out["a"].to_numpy(np.float64), pa.float64()),
                "b": pa.array(out["b"].to_numpy(np.float64), pa.float64()),
            }
        )

    per_bucket = bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"), bucket_of, reduce_tokens
    ).to_pandas()
    agg = per_bucket.groupby("lang", as_index=False).sum()
    n_g = int(agg["n"].sum())
    kl = (agg["a"] - agg["b"]) / agg["n"] - np.log(agg["n"].to_numpy(np.float64)) + np.log(
        float(n_g)
    )
    return pd.DataFrame(
        {
            "lang": agg["lang"].astype("string"),
            "n_tokens": agg["n"].astype("int64"),
            "kl": np.round(kl, 7),
        }
    )


SQL_DOCS_KL = (
    r"WITH tok AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents), "
    r"cnt AS (SELECT lang, t, count(*) AS n FROM tok GROUP BY lang, t), "
    r"g AS (SELECT t, sum(n) AS ng FROM cnt GROUP BY t), "
    r"ab AS (SELECT lang, sum(n) AS nl, sum(n * ln(n)) AS a, sum(n * ln(g.ng)) AS b "
    r"FROM cnt JOIN g USING (t) GROUP BY lang), "
    r"tot AS (SELECT sum(nl) AS ngl FROM ab) "
    r"SELECT lang, CAST(nl AS BIGINT) AS n_tokens, "
    r"round((a - b) / nl - ln(nl) + ln((SELECT ngl FROM tot)), 7) AS kl FROM ab"
)

ANALYTICS2_QUERIES["docs_kl"] = q_docs_kl
ANALYTICS2_ORACLES["docs_kl"] = SQL_DOCS_KL


# ----------------------------------------------------------------------
# Customer-lifetime-value deciles over per-user spend
# ----------------------------------------------------------------------
def q_events_ltv_deciles(sf_dir):
    """Per-user lifetime spend (exact micro-units) ranked into NTILE(10)
    by (spend, user_id) through the distributed window primitive
    (grouped_row_number ungrouped mode — no worker holds the whole
    ranking), then per-decile user counts and totals. The user-level
    LTV segmentation every growth team keeps."""
    from everythinggraph_ray.stages.agg import grouped_row_number

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "value"]
    )

    def spend_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vu = np.floor(batch["value"].to_numpy(zero_copy_only=False) * 1_000_000 + 0.5).astype(
            np.int64
        )
        u, inv = np.unique(uid, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "spend_u": pa.array(np.bincount(inv, weights=vu).astype(np.int64), pa.int64()),
            }
        )

    spend = sum_by_key(
        ev.map_batches(spend_partial, batch_format="pyarrow"), "user_id", ["spend_u"]
    )
    tiled = grouped_row_number(spend, None, "spend_u", "user_id", ntile=10)

    def tile_partial(batch: pa.Table) -> pa.Table:
        t = batch["tile"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["spend_u"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(t, return_inverse=True)
        return pa.table(
            {
                "tile": pa.array(u, pa.int64()),
                "n_users": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "spend_u": pa.array(np.bincount(inv, weights=s).astype(np.int64), pa.int64()),
            }
        )

    out = (
        tiled.map_batches(tile_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("tile", as_index=False)[["n_users", "spend_u"]]
        .sum()
    )
    return out.astype({"tile": "int64", "n_users": "int64", "spend_u": "int64"})


SQL_LTV_DECILES = (
    "WITH s AS (SELECT user_id, "
    "CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS spend_u "
    "FROM events GROUP BY user_id), "
    "t AS (SELECT user_id, spend_u, ntile(10) OVER (ORDER BY spend_u, user_id) AS tile FROM s) "
    "SELECT CAST(tile AS BIGINT) AS tile, CAST(count(*) AS BIGINT) AS n_users, "
    "CAST(sum(spend_u) AS BIGINT) AS spend_u FROM t GROUP BY tile"
)

ANALYTICS2_QUERIES["events_ltv_deciles"] = q_events_ltv_deciles
ANALYTICS2_ORACLES["events_ltv_deciles"] = SQL_LTV_DECILES


# ----------------------------------------------------------------------
# All-pairs cosine similarity histogram
# ----------------------------------------------------------------------
def q_emb_simhist(sf_dir):
    """Histogram of ALL pairwise cosine similarities in 0.1-wide bands —
    the corpus-geometry profile that sizes every dedup/ANN threshold
    decision. Bands are (sim_milli + 1000) // 100 over the exact
    integer-milli grid (kept non-negative so // is identical on both
    sides); counts fold as per-batch bincounts."""
    from everythinggraph_ray.datapipe.knn import allpairs_similarity

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    pairs = allpairs_similarity(emb, threshold=-1.001)

    def band_partial(batch: pa.Table) -> pa.Table:
        sm = batch["sim_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        band = (sm + 1000) // 100
        u, c = np.unique(band, return_counts=True)
        return pa.table(
            {"band": pa.array(u, pa.int64()), "n_pairs": pa.array(c.astype(np.int64), pa.int64())}
        )

    return sum_by_key(
        pairs.map_batches(band_partial, batch_format="pyarrow"), "band", ["n_pairs"]
    )


SQL_EMB_SIMHIST = (
    "WITH p AS (SELECT CAST(FLOOR(list_cosine_similarity(a.embedding::DOUBLE[], "
    "b.embedding::DOUBLE[]) * 1000) AS BIGINT) AS sm "
    "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) "
    "SELECT (sm + 1000) // 100 AS band, CAST(count(*) AS BIGINT) AS n_pairs "
    "FROM p GROUP BY 1"
)

ANALYTICS2_QUERIES["emb_simhist"] = q_emb_simhist
ANALYTICS2_ORACLES["emb_simhist"] = SQL_EMB_SIMHIST


# ----------------------------------------------------------------------
# Gini coefficient of the in-degree distribution
# ----------------------------------------------------------------------
def q_rel_degree_gini(sf_dir):
    """Gini coefficient of in-degree over the vertex universe — THE
    skew statistic for a power-law link graph (how concentrated
    attention is; drives the engine's hub-split threshold choice).
    Exact integer surface: rank every vertex by (deg, vid) through the
    distributed window primitive, then
    gini_ppm = (2·Σ rank·deg − (n+1)·Σ deg) · 1e6 // (n·Σ deg).
    Python-int driver arithmetic (HUGEINT analogue)."""
    from everythinggraph_ray.stages.agg import grouped_row_number
    from everythinggraph_ray.stages.edges import out_degrees

    from everythinggraph_ray.pipelines.queries import rel_edges as _rel_edges

    edges = _rel_edges(sf_dir)

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["dst"], "dst": batch["src"]})

    indeg = out_degrees(edges.map_batches(swap, batch_format="pyarrow")).map_batches(
        lambda t: pa.table({"vid": t["vid"], "deg": t["outdeg"]}), batch_format="pyarrow"
    )
    ranked = grouped_row_number(indeg, None, "deg", "vid")

    def partials(batch: pa.Table) -> pa.Table:
        d = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(d)], pa.int64()),
                "sd": pa.array([int(d.sum())], pa.int64()),
                "srd": pa.array([int((r * d).sum())], pa.int64()),
            }
        )

    p = ranked.map_batches(partials, batch_format="pyarrow").to_pandas()
    n, sd, srd = int(p["n"].sum()), int(p["sd"].sum()), int(p["srd"].sum())
    gini_ppm = (2 * srd - (n + 1) * sd) * 1_000_000 // (n * sd)
    return pd.DataFrame(
        {"n_vertices": [n], "sum_deg": [sd], "gini_ppm": [gini_ppm]}
    ).astype("int64")


SQL_DEGREE_GINI = (
    "WITH e AS (" + SQL_REL_EDGES_A2 + "), "
    "verts AS (SELECT DISTINCT vid FROM "
    "(SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e)), "
    "ind AS (SELECT dst AS vid, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY dst), "
    "d AS (SELECT verts.vid, coalesce(ind.deg, 0) AS deg FROM verts LEFT JOIN ind USING (vid)), "
    "r AS (SELECT vid, deg, row_number() OVER (ORDER BY deg, vid) AS rk FROM d), "
    "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(deg) AS HUGEINT) AS sd, "
    "CAST(sum(rk * deg) AS HUGEINT) AS srd FROM r) "
    "SELECT CAST(n AS BIGINT) AS n_vertices, CAST(sd AS BIGINT) AS sum_deg, "
    "CAST((2 * srd - (n + 1) * sd) * 1000000 // (n * sd) AS BIGINT) AS gini_ppm FROM s"
)

ANALYTICS2_QUERIES["rel_degree_gini"] = q_rel_degree_gini
ANALYTICS2_ORACLES["rel_degree_gini"] = SQL_DEGREE_GINI


# ----------------------------------------------------------------------
# Full core decomposition of the rel graph
# ----------------------------------------------------------------------
def q_rel_coreness(sf_dir):
    """Core NUMBER of every vertex (vid, core) — the full degeneracy
    decomposition (k-core gives one level; this is all of them), the
    standard graph-quality tiering for a web corpus. Distributed
    level-sweep peel (graph/kcore.py coreness): degree pass + two
    bucketed semi-joins per round, loop-carried edge set settled, the
    driver holds scalars only. No SQL oracle (a data-dependent number
    of peel rounds can't unroll into one query) — exactness vs the
    textbook serial peel is pytest-asserted."""
    from everythinggraph_ray.graph.kcore import coreness
    from everythinggraph_ray.pipelines.queries import rel_edges as _rel_edges

    core, _rounds = coreness(_rel_edges(sf_dir))
    df = core.to_pandas().sort_values("vid").reset_index(drop=True)
    return df.astype({"vid": "int64", "core": "int64"})


ANALYTICS2_QUERIES["rel_coreness"] = q_rel_coreness
# rows-only: peel rounds are data-dependent (pytest-exact vs serial peel)


# ----------------------------------------------------------------------
# TPC-H Q2-lite: cheapest supplier per part
# ----------------------------------------------------------------------
def q_q2_min_cost_supplier(sf_dir):
    """TPC-H Q2-lite (the correlated min subquery): for every part
    sold, the supplier offering the lowest observed unit price —
    unit_milli = rev_cents * 1000 // qty on the exact integer grid,
    (unit_milli, suppkey) tiebreak. One pass to the integer surface,
    then the per-part partial-top-1 combiner; no driver state."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def unit(batch: pa.Table) -> pa.Table:
        rev = _cents(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False),
            batch["l_discount"].to_numpy(zero_copy_only=False),
        )
        qty = np.floor(batch["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(np.int64)
        return pa.table(
            {
                "p_partkey": pa.array(
                    batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()
                ),
                "s_suppkey": pa.array(
                    batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()
                ),
                "unit_milli": pa.array(rev * 1000 // qty, pa.int64()),
            }
        )

    priced = li.map_batches(unit, batch_format="pyarrow")
    top = grouped_top_k(priced, "p_partkey", [("unit_milli", True), ("s_suppkey", True)], 1)
    return top.select_columns(["p_partkey", "s_suppkey", "unit_milli"])


SQL_Q2 = (
    "WITH u AS (SELECT l_partkey, l_suppkey, "
    "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) * 1000 "
    "// CAST(floor(l_quantity + 0.5) AS BIGINT) AS unit_milli FROM lineitem) "
    "SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, unit_milli FROM u "
    "QUALIFY row_number() OVER (PARTITION BY l_partkey ORDER BY unit_milli, l_suppkey) = 1"
)

ANALYTICS2_QUERIES["q2_min_cost_supplier"] = q_q2_min_cost_supplier
ANALYTICS2_ORACLES["q2_min_cost_supplier"] = SQL_Q2


# ----------------------------------------------------------------------
# Day-of-week x hour activity heatmap
# ----------------------------------------------------------------------
def q_events_dow_hour(sf_dir):
    """The ops heatmap: event count and exact micro-unit spend per
    (day-of-week, hour-of-day) cell. dow is computed from epoch days
    ((d + 4) % 7, Sunday = 0 — written identically on both sides, no
    engine dayofweek() semantics to trust); 7 x 24 cells fold from
    per-batch bincounts."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        dow = (us // DAY_US + 4) % 7
        hour = us // 3_600_000_000 % 24
        vu = np.floor(batch["value"].to_numpy(zero_copy_only=False) * 1_000_000 + 0.5).astype(
            np.int64
        )
        key = dow * 24 + hour
        u, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "dow": pa.array(u // 24, pa.int64()),
                "hour": pa.array(u % 24, pa.int64()),
                "n_events": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "spend_u": pa.array(np.bincount(inv, weights=vu).astype(np.int64), pa.int64()),
            }
        )

    out = (
        ev.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["dow", "hour"], as_index=False)[["n_events", "spend_u"]]
        .sum()
    )
    return out.astype("int64")


SQL_DOW_HOUR = (
    "SELECT (CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) + 4) % 7 AS dow, "
    "CAST(hour(ts) AS BIGINT) AS hour, CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS spend_u "
    "FROM events GROUP BY 1, 2"
)

ANALYTICS2_QUERIES["events_dow_hour"] = q_events_dow_hour
ANALYTICS2_ORACLES["events_dow_hour"] = SQL_DOW_HOUR


# ----------------------------------------------------------------------
# Boilerplate-opening rate per source
# ----------------------------------------------------------------------
BOILER_PFX = 16


def q_docs_boilerplate_rate(sf_dir):
    """Share of documents per source whose 16-char opening is shared by
    at least one other document (cross-source) — the template/
    boilerplate contamination signal of a crawled corpus. Opening
    fingerprints fold to group sizes via one bucketed sum (int64 key =
    first 60 bits of md5, written identically in SQL); sizes attach
    back through the bucketed hash_join; ppm on exact integers."""
    import hashlib

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    )

    def fp(batch: pa.Table) -> pa.Table:
        h = np.asarray(
            [
                int(hashlib.md5(t[:BOILER_PFX].encode()).hexdigest()[:15], 16)
                for t in batch["text"].to_pylist()
            ],
            np.int64,
        )
        return pa.table(
            {
                "h": pa.array(h, pa.int64()),
                "source": batch["source"],
                "one": pa.array(np.ones(len(h), np.int64), pa.int64()),
            }
        )

    fps = docs.map_batches(fp, batch_format="pyarrow")
    sizes = sum_by_key(fps, "h", ["one"], out_names=["n"])
    withn = hash_join(fps.drop_columns(["one"]), sizes, on="h", right_cols=["n"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": np.asarray(batch["source"].to_pylist(), object),
                "dup": (batch["n"].to_numpy(zero_copy_only=False) > 1).astype(np.int64),
            }
        )
        g = df.groupby("source", as_index=False).agg(n_docs=("dup", "size"), n_dup=("dup", "sum"))
        return pa.table(
            {
                "source": pa.array(g["source"].astype(str), pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64), pa.int64()),
                "n_dup": pa.array(g["n_dup"].to_numpy(np.int64), pa.int64()),
            }
        )

    out = (
        withn.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("source", as_index=False)[["n_docs", "n_dup"]]
        .sum()
    )
    out["dup_ppm"] = [int(d) * 1_000_000 // int(n) for d, n in zip(out["n_dup"], out["n_docs"])]
    return out.astype(
        {"source": "string", "n_docs": "int64", "n_dup": "int64", "dup_ppm": "int64"}
    )


SQL_BOILERPLATE = (
    f"WITH d AS (SELECT source, CAST(concat('0x', substr(md5(substr(text, 1, {BOILER_PFX})), 1, 15)) "
    "AS BIGINT) AS h FROM documents), "
    "s AS (SELECT h, count(*) AS n FROM d GROUP BY h) "
    "SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(CASE WHEN s.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, "
    "CAST(CAST(sum(CASE WHEN s.n > 1 THEN 1 ELSE 0 END) AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS dup_ppm "
    "FROM d JOIN s USING (h) GROUP BY d.source"
)

ANALYTICS2_QUERIES["docs_boilerplate_rate"] = q_docs_boilerplate_rate
ANALYTICS2_ORACLES["docs_boilerplate_rate"] = SQL_BOILERPLATE


# ----------------------------------------------------------------------
# Deterministic text normalization (RE2 parity surface)
# ----------------------------------------------------------------------
def q_docs_normalize(sf_dir):
    """The canonical text-normalization transform of a training
    pipeline: lowercase, strip [.,;:!?] punctuation, collapse
    whitespace runs, trim — emitted AS TEXT so the driver hash checks
    byte parity of the transform itself. All three passes are pyarrow
    RE2 kernels (the doc_stats device: pc.replace_substring_regex ==
    DuckDB regexp_replace 'g')."""
    import pyarrow.compute as pc

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch["text"])
        t = pc.replace_substring_regex(t, r"[.,;:!?]", "")
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm_text": t,
                "n_chars_norm": pc.utf8_length(t),
            }
        )

    out = docs.map_batches(norm, batch_format="pyarrow")
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": t["norm_text"],
                "n_chars_norm": pa.array(
                    t["n_chars_norm"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


SQL_DOCS_NORMALIZE = (
    r"SELECT doc_id, "
    r"trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'), "
    r"'\s+', ' ', 'g')) AS norm_text, "
    r"CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'), "
    r"'\s+', ' ', 'g'))) AS BIGINT) AS n_chars_norm FROM documents"
)

ANALYTICS2_QUERIES["docs_normalize"] = q_docs_normalize
ANALYTICS2_ORACLES["docs_normalize"] = SQL_DOCS_NORMALIZE


# ----------------------------------------------------------------------
# MinHash-LSH candidate recall vs the exact all-pairs baseline
# ----------------------------------------------------------------------
MINHASH_RECALL_T = 0.5


def q_docs_minhash_recall(sf_dir):
    """Measured candidate-generation RECALL of the MinHash+LSH banding
    path against exact all-pairs shingle Jaccard at the same threshold
    — the eval a production dedup pipeline ships with its S-curve
    parameters. Both sides verify with the SAME exact-Jaccard co-group
    (datapipe/pairs.py pairwise_verify), so precision is 1 by
    construction and the single output row is (n_true, n_lsh,
    recall_ppm). The all-pairs side is the eval BASELINE (quadratic by
    definition, like allpairs_similarity — the measured path, not the
    100 TB path). Rows-only: MinHash permutations aren't SQL;
    determinism + a known-recall fixture are pytest-asserted."""
    from everythinggraph_ray.datapipe.dedup import (
        MinHashStage,
        jaccard,
        shingle_payloads,
    )
    from everythinggraph_ray.datapipe.pairs import group_pairs, pairwise_verify

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    shingles = shingle_payloads(docs, 3).materialize()

    # LSH side: band -> candidates -> exact verify >= t
    stage = MinHashStage(64, 16, 3)
    bands_ds = shingles.map_batches(stage.bands_from_payloads, batch_format="pyarrow")
    cand = group_pairs(bands_ds, ["band_id", "band_hash"], max_bucket=512)
    from everythinggraph_ray.datapipe.pairs import batch_jaccard

    lsh_scored = pairwise_verify(
        shingles, cand, jaccard, out_col="jaccard", pay_type=pa.list_(pa.int64()),
        batch_score_fn=batch_jaccard,
    )
    lsh_kept = lsh_scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], MINHASH_RECALL_T)),
        batch_format="pyarrow",
    )

    # exact baseline: every (a < b) pair through the same verify
    ids = np.sort(
        shingles.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy(np.int64)
    )
    i, j = np.triu_indices(len(ids), k=1)
    allp = ray.data.from_arrow(
        pa.table({"a": pa.array(ids[i], pa.int64()), "b": pa.array(ids[j], pa.int64())})
    )
    true_scored = pairwise_verify(
        shingles, allp, jaccard, out_col="jaccard", pay_type=pa.list_(pa.int64()),
        batch_score_fn=batch_jaccard,
    )
    true_kept = true_scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], MINHASH_RECALL_T)),
        batch_format="pyarrow",
    )

    def pair_keys(ds):
        df = ds.select_columns(["a", "b"]).to_pandas().drop_duplicates()
        return set(zip(df["a"].astype(int), df["b"].astype(int)))

    true_set = pair_keys(true_kept)
    lsh_set = pair_keys(lsh_kept)
    n_true, n_lsh = len(true_set), len(lsh_set & true_set)
    recall_ppm = n_lsh * 1_000_000 // n_true if n_true else 1_000_000
    return pd.DataFrame(
        {"n_true": [n_true], "n_lsh": [n_lsh], "recall_ppm": [recall_ppm]}
    ).astype("int64")


ANALYTICS2_QUERIES["docs_minhash_recall"] = q_docs_minhash_recall
# rows-only: MinHash banding isn't SQL-expressible (pytest-asserted)


# ----------------------------------------------------------------------
# Peak 10-minute activity per user
# ----------------------------------------------------------------------
def q_events_peak_10min(sf_dir):
    """Each user's busiest 10-minute tumbling window: (user_id,
    peak_n, peak_win) with the EARLIEST window on count ties — the
    burst profile behind rate limiting. (user, window) counts fold
    through the bucketed pair sum; the per-user arg-max rides the
    partial-top-1 combiner."""
    from everythinggraph_ray.stages.agg import sum_by_key_pair

    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"])
    WIN_US = 600_000_000

    def win(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(
                    batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()
                ),
                "w": pa.array(us // WIN_US, pa.int64()),
                "one": pa.array(np.ones(len(us), np.int64), pa.int64()),
            }
        )

    counts = sum_by_key_pair(
        ev.map_batches(win, batch_format="pyarrow"), "user_id", "w", ["one"]
    )
    top = grouped_top_k(counts, "user_id", [("one", False), ("w", True)], 1)
    return top.map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "peak_n": t["one"], "peak_win": t["w"]}
        ),
        batch_format="pyarrow",
    )


SQL_PEAK_10MIN = (
    "WITH c AS (SELECT user_id, CAST(epoch_us(ts) // 600000000 AS BIGINT) AS w, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) "
    "SELECT user_id, n AS peak_n, w AS peak_win FROM c "
    "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY n DESC, w) = 1"
)

ANALYTICS2_QUERIES["events_peak_10min"] = q_events_peak_10min
ANALYTICS2_ORACLES["events_peak_10min"] = SQL_PEAK_10MIN


# ----------------------------------------------------------------------
# First/last order per customer (FIRST_VALUE / LAST_VALUE family)
# ----------------------------------------------------------------------
def q_orders_first_last(sf_dir):
    """Per customer: the first and last order's price (exact cents)
    and the day span between them — the FIRST_VALUE/LAST_VALUE window
    pair over (orderdate, orderkey). One user-bucketed co-group,
    vectorized first/last inside the bucket."""
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["o_custkey"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def first_last(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        df["price_c"] = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        df["day"] = df["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        gb = df.groupby("o_custkey")
        out = pd.DataFrame(
            {
                "custkey": gb.size().index.to_numpy(np.int64),
                "n_orders": gb.size().to_numpy(np.int64),
                "first_price_c": gb["price_c"].first().to_numpy(np.int64),
                "last_price_c": gb["price_c"].last().to_numpy(np.int64),
                "span_days": (gb["day"].last() - gb["day"].first()).to_numpy(np.int64),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucketed_reduce(orders, bucket_of, first_last)


SQL_FIRST_LAST = (
    "WITH o AS (SELECT o_custkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c, "
    "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, "
    "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn_a, "
    "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d "
    "FROM orders) "
    "SELECT f.o_custkey AS custkey, n.n_orders, f.price_c AS first_price_c, "
    "l.price_c AS last_price_c, l.day - f.day AS span_days "
    "FROM (SELECT * FROM o WHERE rn_a = 1) f "
    "JOIN (SELECT * FROM o WHERE rn_d = 1) l ON l.o_custkey = f.o_custkey "
    "JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1) n "
    "ON n.o_custkey = f.o_custkey"
)

ANALYTICS2_QUERIES["orders_first_last"] = q_orders_first_last
ANALYTICS2_ORACLES["orders_first_last"] = SQL_FIRST_LAST


# ----------------------------------------------------------------------
# Web bow-tie decomposition (Broder et al.)
# ----------------------------------------------------------------------
def q_rel_bowtie(sf_dir):
    """The Broder bow-tie decomposition — THE structural census of a
    web graph: CORE = the largest SCC (size desc, min-label tiebreak),
    IN = vertices that reach the core, OUT = vertices the core reaches,
    OTHER = tendrils/disconnected. Composition: the distributed SCC
    peel (graph/scc.py) labels components; the core's reach sets come
    from TWO ReachKernel runs (max-semiring multi-source reachability,
    graph/kernels.py) over the forward and reversed builds; region
    assignment is two bucketed hash_joins + one vectorized mask. Full
    SQL parity: the rel_scc transitive-closure oracle extended with
    core selection and two recursive reach CTEs."""
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.pipelines.flagship import build_dir_for
    from everythinggraph_ray.graph.kernels import ReachKernel
    from everythinggraph_ray.graph.scc import scc
    from everythinggraph_ray.pipelines.queries import rel_edges as _rel_edges
    from everythinggraph_ray.stages.edges import dedup_edges, filter_self_loops

    comps, _rounds = scc(_rel_edges(sf_dir))
    comps = comps.materialize()

    # core label: (size desc, label asc) top-1 via the partial combiner
    sizes = sum_by_key(
        comps.map_batches(
            lambda t: pa.table(
                {
                    "scc": t["scc"],
                    "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        "scc",
        ["n"],
    ).map_batches(
        lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())),
        batch_format="pyarrow",
    )
    top = grouped_top_k(sizes, "g", [("n", False), ("scc", True)], 1).to_pandas()
    core_lab = int(top["scc"].iloc[0])

    core_vids = (
        comps.map_batches(
            lambda t, _c=core_lab: t.filter(pc.equal(t["scc"], _c)),
            batch_format="pyarrow",
        )
        .select_columns(["vid"])
        .to_pandas()["vid"]
        .to_numpy(np.int64)
    )  # kernel seed contract (the labelprop seeds device): partition-
    # local searchsorted attach; the array is the CORE itself

    edges = dedup_edges(filter_self_loops(_rel_edges(sf_dir)))
    fdir = build_dir_for(f"bowtie_fwd|{sf_dir}", 8)
    build_graph(edges, fdir, num_partitions=8, hub_threshold=10**9)
    from everythinggraph_ray.pipelines.queries import _run_engine

    fwd = _run_engine(fdir, ReachKernel(core_vids)).rename(columns={"reach": "fwd"})

    rev = edges.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}), batch_format="pyarrow"
    )
    bdir = build_dir_for(f"bowtie_bwd|{sf_dir}", 8)
    build_graph(rev, bdir, num_partitions=8, hub_threshold=10**9)
    bwd = _run_engine(bdir, ReachKernel(core_vids)).rename(columns={"reach": "bwd"})

    cdf = comps.to_pandas()
    out = cdf.merge(fwd, on="vid").merge(bwd, on="vid")
    is_core = out["scc"].to_numpy() == core_lab
    region = np.where(
        is_core,
        "CORE",
        np.where(
            out["bwd"].to_numpy() == 1,
            "IN",
            np.where(out["fwd"].to_numpy() == 1, "OUT", "OTHER"),
        ),
    )
    res = pd.DataFrame({"vid": out["vid"].astype("int64"), "region": region})
    return res.sort_values("vid").reset_index(drop=True).astype(
        {"vid": "int64", "region": "string"}
    )


def _bowtie_sql() -> str:
    from everythinggraph_ray.pipelines.queries import _sql_graph_prelude

    return (
        "WITH RECURSIVE "
        + _sql_graph_prelude(no_self=True)
        + ", e3 AS (SELECT DISTINCT src, dst FROM e2)"
        ", r(s, d) AS (SELECT src, dst FROM e3 UNION "
        "SELECT r.s, e3.dst FROM r JOIN e3 ON e3.src = r.d)"
        ", m AS (SELECT r1.s AS v, r1.d AS u FROM r r1 "
        "JOIN r r2 ON r2.s = r1.d AND r2.d = r1.s)"
        ", comp AS (SELECT v.vid, CAST(least(v.vid, coalesce(min(m.u), v.vid)) AS BIGINT) AS scc "
        "FROM verts v LEFT JOIN m ON m.v = v.vid GROUP BY v.vid)"
        ", sz AS (SELECT scc, count(*) AS n FROM comp GROUP BY scc)"
        ", core AS (SELECT scc FROM sz ORDER BY n DESC, scc LIMIT 1)"
        ", corev AS (SELECT vid FROM comp WHERE scc = (SELECT scc FROM core))"
        ", fwd(v) AS (SELECT vid FROM corev UNION "
        "SELECT e3.dst FROM fwd JOIN e3 ON e3.src = fwd.v)"
        ", bwd(v) AS (SELECT vid FROM corev UNION "
        "SELECT e3.src FROM bwd JOIN e3 ON e3.dst = bwd.v) "
        "SELECT comp.vid, CASE WHEN comp.scc = (SELECT scc FROM core) THEN 'CORE' "
        "WHEN comp.vid IN (SELECT v FROM bwd) THEN 'IN' "
        "WHEN comp.vid IN (SELECT v FROM fwd) THEN 'OUT' "
        "ELSE 'OTHER' END AS region FROM comp"
    )


ANALYTICS2_QUERIES["rel_bowtie"] = q_rel_bowtie
ANALYTICS2_ORACLES["rel_bowtie"] = _bowtie_sql()


# ----------------------------------------------------------------------
# Language-ID confusion matrix
# ----------------------------------------------------------------------
def q_docs_langid_confusion(sf_dir):
    """Confusion matrix of the stopword-profile language identifier
    against the labeled lang column — the eval that ships with any
    classifier stage: (lang_true, lang_pred, n). Predictions come from
    the same actor-pool lang_id stage as docs_langid; truth attaches
    through the bucketed hash_join; |langs|^2 cells fold from per-batch
    partials. SQL parity reuses docs_langid's UNPIVOT-argmax oracle."""
    from everythinggraph_ray.datapipe.text import lang_id

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    pred = lang_id(docs.select_columns(["doc_id", "text"]))
    joined = hash_join(
        docs.select_columns(["doc_id", "lang"]), pred, on="doc_id", right_cols=["lang_pred"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang_true": np.asarray(batch["lang"].to_pylist(), object),
                "lang_pred": np.asarray(batch["lang_pred"].to_pylist(), object),
            }
        )
        g = df.groupby(["lang_true", "lang_pred"], as_index=False).size()
        return pa.table(
            {
                "lang_true": pa.array(g["lang_true"].astype(str), pa.string()),
                "lang_pred": pa.array(g["lang_pred"].astype(str), pa.string()),
                "n": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    out = (
        joined.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["lang_true", "lang_pred"], as_index=False)["n"]
        .sum()
    )
    return out.astype({"lang_true": "string", "lang_pred": "string", "n": "int64"})


def _langid_confusion_sql() -> str:
    from everythinggraph_ray.pipelines.queries import ORACLES

    return (
        f"WITH pred AS ({ORACLES['docs_langid']}) "
        "SELECT d.lang AS lang_true, pred.lang_pred, CAST(count(*) AS BIGINT) AS n "
        "FROM documents d JOIN pred ON pred.doc_id = d.doc_id "
        "GROUP BY d.lang, pred.lang_pred"
    )


ANALYTICS2_QUERIES["docs_langid_confusion"] = q_docs_langid_confusion
ANALYTICS2_ORACLES["docs_langid_confusion"] = _langid_confusion_sql()


# ----------------------------------------------------------------------
# View -> purchase abandonment within one hour
# ----------------------------------------------------------------------
ABANDON_WIN_US = 3_600_000_000


def q_events_abandonment(sf_dir):
    """Per-day view abandonment: a view CONVERTS if the same user
    purchases within the following hour, else it's abandoned — the
    event-time window join (the as-of join's EXISTS dual). One
    user-bucketed co-group; inside a bucket each user's view timestamps
    binary-search the user's sorted purchase timestamps (vectorized
    searchsorted, never a pair loop). Output per view-day: n_views,
    n_converted, abandon_ppm."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_type"]
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def convert(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "us": us, "et": df["event_type"]}
        ).sort_values(["user_id", "us"])
        rows = []
        for uid, grp in df.groupby("user_id"):  # users per bucket; inner ops vectorized
            views = grp.loc[grp["et"] == "view", "us"].to_numpy(np.int64)
            if not len(views):
                continue
            buys = grp.loc[grp["et"] == "purchase", "us"].to_numpy(np.int64)
            if len(buys):
                nxt = np.searchsorted(buys, views, side="left")
                ok = (nxt < len(buys)) & (
                    buys[np.minimum(nxt, len(buys) - 1)] - views <= ABANDON_WIN_US
                )
            else:
                ok = np.zeros(len(views), bool)
            day = views // DAY_US
            rows.append(
                pd.DataFrame({"day": day, "v": 1, "c": ok.astype(np.int64)})
            )
        if not rows:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "n_views": pa.array([], pa.int64()),
                    "n_converted": pa.array([], pa.int64()),
                }
            )
        allr = pd.concat(rows).groupby("day", as_index=False).sum()
        return pa.table(
            {
                "day": pa.array(allr["day"].to_numpy(np.int64), pa.int64()),
                "n_views": pa.array(allr["v"].to_numpy(np.int64), pa.int64()),
                "n_converted": pa.array(allr["c"].to_numpy(np.int64), pa.int64()),
            }
        )

    per_bucket = bucketed_reduce(ev, bucket_of, convert)
    agg = sum_by_key(per_bucket, "day", ["n_views", "n_converted"]).to_pandas()
    agg["abandon_ppm"] = [
        (int(v) - int(c)) * 1_000_000 // int(v) for v, c in zip(agg["n_views"], agg["n_converted"])
    ]
    return agg.astype("int64")[["day", "n_views", "n_converted", "abandon_ppm"]]


SQL_ABANDONMENT = (
    "WITH v AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'), "
    "p AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'), "
    "conv AS (SELECT v.user_id, v.us, CASE WHEN EXISTS (SELECT 1 FROM p "
    f"WHERE p.user_id = v.user_id AND p.us >= v.us AND p.us - v.us <= {ABANDON_WIN_US}) "
    "THEN 1 ELSE 0 END AS c FROM v) "
    "SELECT CAST(us // 86400000000 AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS n_views, "
    "CAST(sum(c) AS BIGINT) AS n_converted, "
    "CAST(CAST(count(*) - sum(c) AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS abandon_ppm "
    "FROM conv GROUP BY 1"
)

ANALYTICS2_QUERIES["events_abandonment"] = q_events_abandonment
ANALYTICS2_ORACLES["events_abandonment"] = SQL_ABANDONMENT


# ----------------------------------------------------------------------
# Revenue concentration (Herfindahl index) per supplier nation
# ----------------------------------------------------------------------
def q_supplier_hhi(sf_dir):
    """Herfindahl–Hirschman revenue-concentration index per supplier
    nation: hhi_ppm = Σ_i rev_i^2 · 1e6 // (Σ_i rev_i)^2 over each
    nation's suppliers — the market-structure statistic. Per-(supplier)
    cents fold through the bucketed pair sum; the per-nation squares
    fold as Python-int partials (HUGEINT analogue; a supplier's cents
    squared exceeds int64 at petascale)."""
    import duckdb

    con = duckdb.connect()
    nmap = dict(
        con.execute(
            f"SELECT n_nationkey, n_name FROM read_parquet('{os.path.join(sf_dir, 'nation.parquet')}')"
        ).fetchall()
    )
    con.close()
    nref = ray.put({int(k): str(v) for k, v in nmap.items()})

    supp = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )

    def sname(batch: pa.Table) -> pa.Table:
        m = ray.get(nref)
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": pa.array(batch["s_suppkey"].to_numpy(zero_copy_only=False), pa.int64()),
                "nation": pa.array([m[int(k)] for k in nk], pa.string()),
            }
        )

    supp_n = supp.map_batches(sname, batch_format="pyarrow")

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rc = _cents(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False),
            batch["l_discount"].to_numpy(zero_copy_only=False),
        )
        u, inv = np.unique(sk, return_inverse=True)
        return pa.table(
            {
                "s_suppkey": pa.array(u, pa.int64()),
                "rev_c": pa.array(np.bincount(inv, weights=rc).astype(np.int64), pa.int64()),
            }
        )

    rev = sum_by_key(
        li.map_batches(rev_partial, batch_format="pyarrow"), "s_suppkey", ["rev_c"]
    )
    withn = hash_join(rev, supp_n, on="s_suppkey", right_cols=["nation"]).to_pandas()
    # |suppliers| rows on the driver here is the TEST path; at scale the
    # square-sum partials fold per batch exactly like every other pair
    # aggregation (documented: Python-int squares, see emb_outliers)
    out_rows = []
    for nation, grp in withn.groupby("nation"):
        revs = [int(x) for x in grp["rev_c"]]
        s = sum(revs)
        sq = sum(r * r for r in revs)
        out_rows.append((nation, len(revs), s, sq * 1_000_000 // (s * s) if s else 0))
    out = pd.DataFrame(out_rows, columns=["nation", "n_suppliers", "rev_c", "hhi_ppm"])
    return out.astype(
        {"nation": "string", "n_suppliers": "int64", "rev_c": "int64", "hhi_ppm": "int64"}
    )


SQL_SUPPLIER_HHI = (
    "WITH r AS (SELECT l_suppkey, "
    "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c "
    "FROM lineitem GROUP BY l_suppkey), "
    "j AS (SELECT n.n_name AS nation, r.rev_c FROM r "
    "JOIN supplier s ON s.s_suppkey = r.l_suppkey "
    "JOIN nation n ON n.n_nationkey = s.s_nationkey) "
    "SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers, "
    "CAST(sum(rev_c) AS BIGINT) AS rev_c, "
    "CAST(sum(CAST(rev_c AS HUGEINT) * rev_c) * 1000000 "
    "// (CAST(sum(rev_c) AS HUGEINT) * sum(rev_c)) AS BIGINT) AS hhi_ppm "
    "FROM j GROUP BY nation"
)

ANALYTICS2_QUERIES["supplier_hhi"] = q_supplier_hhi
ANALYTICS2_ORACLES["supplier_hhi"] = SQL_SUPPLIER_HHI
