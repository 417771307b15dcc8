"""Analytics batch (session 9, second wave): TPC-H Q12-lite priority
counts, per-user behavioral entropy and burstiness, a Kaplan–Meier
survival curve over user lifetimes, nearest-class-mean assignment over
the embedding table, and the Charikar batch-peel densest subgraph.

Each is a (ray_fn, oracle_sql) pair continuing queries.py's exactness
discipline — integer surfaces wherever a float could reassociate (the
Kaplan–Meier product runs as an integer ppm recursion; the densest peel
compares deg·5·V > 11·E in int64), and any shared float expression
written token-for-token on both sides with the round(·, 7) device.

Distributed shapes:
- ``q12_priority``: shipdate window pruned AT THE READ column set, one
  bucketed ``hash_join`` to attach order priority, per-batch flag
  partials folded driver-side over the 3-row returnflag table.
- ``events_user_entropy``: user-bucketed co-group (the sessionization
  routing), exact per-(user, type) counts inside the bucket, one
  (n, Σ c·ln c) partial per user — the lang-entropy device applied to
  behavior instead of vocabulary.
- ``events_burstiness``: per-user exact integer gap moments (n, Σg,
  Σg²) in whole seconds; the Goh–Barabási coefficient
  (σ−μ)/(σ+μ) = (√(nS2−S1²)−S1)/(√(nS2−S1²)+S1) is ONE closed-form
  double per user from two exact int64 scalars.
- ``events_kaplan_meier``: per-user (first, last) day via the
  user-bucketed fold; the survival recursion S_k = S_{k-1}·(n_k−d_k)
  // n_k runs over the tiny distinct-lifetime series (O(timespan)
  driver rows, recursive CTE on the SQL side — the EWMA precedent).
- ``emb_centroid_assign``: label centroids as FIXED-DENOMINATOR
  integer vectors (s·1000 // n on non-negative shifted sums, so
  DuckDB's truncating // agrees with numpy floor), broadcast once;
  per-batch distance matrix is one int64 einsum per centroid — the
  nearest-class-mean confusion grid with zero float anywhere.
- ``rel_densest``: Charikar 2(1+ε)-approx batch peel (ε=0.1): each
  round drops every vertex with deg·5·V ≤ 11·E — survivors shrink by
  ≥ 1/11 per round so rounds = O(log V); each round is one exploded
  ``sum_by_key`` degree pass + two semi ``hash_join``s over a
  geometrically-shrinking edge set (materialized per round to cut
  lineage, the coreness precedent). The SQL oracle unrolls 12 rounds
  (empirically ≤ 6 at every test scale; the Ray side raises past the
  unroll depth so a divergence is loud, never silent).
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
    mix64,
    sum_by_key,
    sum_by_key_pair,
)

ANALYTICS4_QUERIES: dict = {}
ANALYTICS4_ORACLES: dict = {}

DAY_US = 86_400_000_000


# ----------------------------------------------------------------------
# TPC-H Q12-lite: priority line counts per return flag (1996 window)
# ----------------------------------------------------------------------
def q_q12_priority(sf_dir):
    """Q12's shape on this schema (l_returnflag stands in for shipmode,
    shipdate for receiptdate): lineitems shipped in 1996 joined to
    their order's priority; per flag, how many lines belong to
    URGENT/HIGH orders vs the rest."""
    lo = pa.scalar(pd.Timestamp("1996-01-01").value // 1000, pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01").value // 1000, pa.timestamp("us"))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_returnflag", "l_shipdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)
            )
        ).select(["l_orderkey", "l_returnflag"]),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderpriority"]
    )
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", right_cols=["o_orderpriority"])

    def partial(batch: pa.Table) -> pa.Table:
        fl = batch["l_returnflag"].to_pandas()
        pr = batch["o_orderpriority"].to_pandas()
        high = pr.isin(["1-URGENT", "2-HIGH"]).to_numpy()
        df = pd.DataFrame({"l_returnflag": fl, "h": high.astype(np.int64), "l": (~high).astype(np.int64)})
        out = df.groupby("l_returnflag", as_index=False)[["h", "l"]].sum()
        return pa.table(
            {
                "l_returnflag": pa.array(out["l_returnflag"].astype(str), pa.string()),
                "high_line_count": pa.array(out["h"].to_numpy(np.int64), pa.int64()),
                "low_line_count": pa.array(out["l"].to_numpy(np.int64), pa.int64()),
            }
        )

    parts = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("l_returnflag", as_index=False)[["high_line_count", "low_line_count"]].sum()
    return (
        g.sort_values("l_returnflag")
        .reset_index(drop=True)
        .astype({"l_returnflag": "string", "high_line_count": "int64", "low_line_count": "int64"})
    )


SQL_Q12 = (
    "SELECT l_returnflag, "
    "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) "
    "AS high_line_count, "
    "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) "
    "AS low_line_count "
    "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
    "GROUP BY 1"
)

ANALYTICS4_QUERIES["q12_priority"] = q_q12_priority
ANALYTICS4_ORACLES["q12_priority"] = SQL_Q12


# ----------------------------------------------------------------------
# Per-user behavioral entropy over event types
# ----------------------------------------------------------------------
def q_events_user_entropy(sf_dir):
    """Shannon entropy of each user's event-type mix (H = ln N −
    Σ c·ln c / N over exact per-type counts) — the behavioral-diversity
    signal; a bot that only ever clicks scores 0. User-bucketed
    co-group; every ln term is over an exact integer shared with the
    SQL, rounded once at the end (the lang-entropy device)."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def red(g: pa.Table) -> pa.Table:
        df = (
            g.to_pandas()
            .groupby(["user_id", "event_type"], as_index=False)
            .size()
        )
        n = df["size"].to_numpy(np.int64)
        out = (
            pd.DataFrame({"user_id": df["user_id"], "n": n, "nln": n * np.log(n)})
            .groupby("user_id", as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = bucketed_reduce(ev, bucket_of, red).to_pandas()
    g = parts.groupby("user_id", as_index=False).sum()
    N = g["n"].to_numpy(np.int64)
    ent = np.round(np.log(N) - g["nln"].to_numpy() / N, 7)
    return pd.DataFrame(
        {"user_id": g["user_id"].to_numpy(np.int64), "n_events": N, "entropy": ent}
    ).astype({"user_id": "int64", "n_events": "int64", "entropy": "float64"})


SQL_USER_ENTROPY = (
    "WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2), "
    "s AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events, "
    "sum(n * ln(n)) AS nln FROM c GROUP BY 1) "
    "SELECT user_id, n_events, round(ln(n_events) - nln / n_events, 7) AS entropy FROM s"
)

ANALYTICS4_QUERIES["events_user_entropy"] = q_events_user_entropy
ANALYTICS4_ORACLES["events_user_entropy"] = SQL_USER_ENTROPY


# ----------------------------------------------------------------------
# Per-user burstiness (Goh–Barabási B = (σ−μ)/(σ+μ) of gaps)
# ----------------------------------------------------------------------
def q_events_burstiness(sf_dir):
    """Inter-arrival burstiness per user: gaps in whole seconds between
    consecutive events ((ts, event_id) order), exact integer moments
    (n, S1, S2), then B = (√D − S1)/(√D + S1) with D = n·S2 − S1² —
    one closed-form double from exact int64 scalars (the lineitem_corr
    device). B→−1 for a regular stream, →+1 for an extreme burst; 0/0
    (all gaps zero) reports 0. Users with <2 events are excluded."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["user_id", "ts", "event_id"])
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy()
        same = uid[1:] == uid[:-1] if len(df) > 1 else np.zeros(0, bool)
        gap = (us[1:] - us[:-1]) // 1_000_000  # non-negative: trunc == floor
        gu = uid[1:][same]
        gs = gap[same]
        out = (
            pd.DataFrame({"user_id": gu, "n_gaps": 1, "s1": gs, "s2": gs * gs})
            .groupby("user_id", as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = bucketed_reduce(ev, bucket_of, red).to_pandas()
    if not len(parts):
        return pd.DataFrame(
            {"user_id": [], "n_gaps": [], "s1": [], "s2": [], "burstiness": []}
        ).astype({"user_id": "int64", "n_gaps": "int64", "s1": "int64", "s2": "int64", "burstiness": "float64"})
    g = parts.groupby("user_id", as_index=False).sum()
    n = g["n_gaps"].to_numpy(np.int64)
    s1 = g["s1"].to_numpy(np.int64)
    s2 = g["s2"].to_numpy(np.int64)
    d = n * s2 - s1 * s1  # exact int64, converted ONCE (SQL: same expression)
    r = np.sqrt(d.astype(np.float64))
    den = r + s1.astype(np.float64)
    b = np.where(den > 0, np.round((r - s1) / np.where(den > 0, den, 1.0), 7), 0.0)
    return pd.DataFrame(
        {"user_id": g["user_id"].to_numpy(np.int64), "n_gaps": n, "s1": s1, "s2": s2, "burstiness": b}
    ).astype({"user_id": "int64", "n_gaps": "int64", "s1": "int64", "s2": "int64", "burstiness": "float64"})


SQL_BURSTINESS = (
    "WITH g AS (SELECT user_id, "
    "(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) "
    "// 1000000 AS gap FROM events), "
    "m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps, CAST(sum(gap) AS BIGINT) AS s1, "
    "CAST(sum(gap * gap) AS BIGINT) AS s2 FROM g WHERE gap IS NOT NULL GROUP BY 1) "
    "SELECT user_id, n_gaps, s1, s2, "
    "CASE WHEN sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) + CAST(s1 AS DOUBLE) > 0 "
    "THEN round((sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) - CAST(s1 AS DOUBLE)) / "
    "(sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) + CAST(s1 AS DOUBLE)), 7) ELSE 0.0 END "
    "AS burstiness FROM m"
)

ANALYTICS4_QUERIES["events_burstiness"] = q_events_burstiness
ANALYTICS4_ORACLES["events_burstiness"] = SQL_BURSTINESS


# ----------------------------------------------------------------------
# Kaplan–Meier survival over user lifetimes (integer ppm recursion)
# ----------------------------------------------------------------------
KM_WINDOW = 3  # administrative observation window (days after first event)


def q_events_kaplan_meier(sf_dir):
    """Kaplan–Meier time-to-conversion: a user "dies" when they make
    their first purchase, measured in days after their first event;
    observation is administratively right-CENSORED at KM_WINDOW days
    (a user whose first purchase falls after the window — or never —
    survives it). At each distinct death time t: n_risk = users still
    observed at t, d = conversions at t, and the product-limit
    estimator runs as the integer recursion S_k = S_{k-1}·(n_k − d_k)
    // n_k in ppm — deterministic, no float product anywhere
    (recursive CTE on the SQL side, the EWMA precedent)."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_type"]
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    BIG = np.int64(1 << 40)  # "never purchased" sentinel, > any day number

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df["day"] = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // DAY_US
        df["pday"] = np.where(df["event_type"].to_numpy() == "purchase", df["day"], BIG)
        gb = df.groupby("user_id")
        out = pd.DataFrame(
            {"first_d": gb["day"].min(), "purch_d": gb["pday"].min()}
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = bucketed_reduce(ev, bucket_of, red).to_pandas()
    g = parts.groupby("user_id").agg(first_d=("first_d", "min"), purch_d=("purch_d", "min"))
    gap = g["purch_d"].to_numpy(np.int64) - g["first_d"].to_numpy(np.int64)
    died = gap <= KM_WINDOW
    obs = np.minimum(gap, KM_WINDOW)  # censored users observed through the window
    deaths = np.sort(np.unique(gap[died]))
    rows = []
    s = 1_000_000
    for tk in deaths:
        n_risk = int((obs >= tk).sum())
        d = int((died & (gap == tk)).sum())
        s = s * (n_risk - d) // n_risk
        rows.append({"t": int(tk), "n_risk": n_risk, "d": d, "s_ppm": s})
    return pd.DataFrame(rows, columns=["t", "n_risk", "d", "s_ppm"]).astype("int64")


SQL_KM = (
    "WITH RECURSIVE u AS (SELECT user_id, min(epoch_us(ts) // 86400000000) AS f, "
    "min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) // 86400000000 END) AS p "
    "FROM events GROUP BY 1), "
    f"lt AS (SELECT CASE WHEN p IS NOT NULL AND p - f <= {KM_WINDOW} THEN p - f "
    f"ELSE {KM_WINDOW} END AS t, "
    f"CASE WHEN p IS NOT NULL AND p - f <= {KM_WINDOW} THEN 0 ELSE 1 END AS cens FROM u), "
    "dt AS (SELECT t, CAST(count(*) AS BIGINT) AS d FROM lt WHERE cens = 0 GROUP BY t), "
    "nr AS (SELECT dt.t, dt.d, (SELECT CAST(count(*) AS BIGINT) FROM lt WHERE lt.t >= dt.t) "
    "AS n_risk, row_number() OVER (ORDER BY dt.t) AS rn FROM dt), "
    "s(rn, t, n_risk, d, s_ppm) AS ("
    "SELECT rn, t, n_risk, d, 1000000 * (n_risk - d) // n_risk FROM nr WHERE rn = 1 "
    "UNION ALL SELECT nr.rn, nr.t, nr.n_risk, nr.d, s.s_ppm * (nr.n_risk - nr.d) // nr.n_risk "
    "FROM s JOIN nr ON nr.rn = s.rn + 1) "
    "SELECT CAST(t AS BIGINT) AS t, n_risk, d, CAST(s_ppm AS BIGINT) AS s_ppm FROM s"
)

ANALYTICS4_QUERIES["events_kaplan_meier"] = q_events_kaplan_meier
ANALYTICS4_ORACLES["events_kaplan_meier"] = SQL_KM


# ----------------------------------------------------------------------
# Nearest-class-mean assignment grid (integer centroid geometry)
# ----------------------------------------------------------------------
CA_SCALE = 1000  # element quantization; +1000 shift keeps sums non-negative


def q_emb_centroid_assign(sf_dir):
    """Nearest-class-mean confusion grid: quantize each element to
    q = floor(x·1000 + 0.5) + 1000 (the shift keeps every sum
    non-negative so DuckDB's truncating // and numpy floor-div agree),
    build per-label centroids at the FIXED denominator 1000
    (cq = s·1000 // n), assign each vector to the centroid minimizing
    Σ(q·1000 − cq)² in exact int64 (ties → smaller label), and report
    (label, assigned, n) counts. The centroid table is k×d (tiny),
    broadcast once; per batch the distance matrix is one vectorized
    int64 pass per centroid."""
    from everythinggraph_ray.datapipe.knn import _batch_matrix

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["label", "embedding"]
    )

    def qmat(batch: pa.Table) -> np.ndarray:
        m = _batch_matrix(batch)
        return np.floor(m * CA_SCALE + 0.5).astype(np.int64) + CA_SCALE

    def partial(batch: pa.Table) -> pa.Table:
        q = qmat(batch)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(lab, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(u), d), np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(u, d), pa.int64()),
                "d": pa.array(np.tile(np.arange(d, dtype=np.int64), len(u)), pa.int64()),
                "s": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(cnt, d), pa.int64()),
            }
        )

    cent = (
        sum_by_key_pair(emb.map_batches(partial, batch_format="pyarrow"), "label", "d", ["s", "n"])
        .to_pandas()
        .sort_values(["label", "d"])
    )
    labels = np.sort(cent["label"].unique())
    dims = int(cent["d"].max()) + 1
    cq = np.zeros((len(labels), dims), np.int64)
    for i, k in enumerate(labels):
        sub = cent[cent["label"] == k].sort_values("d")
        cq[i] = (sub["s"].to_numpy(np.int64) * CA_SCALE) // sub["n"].to_numpy(np.int64)
    cq_ref = ray.put((labels, cq))

    def assign(batch: pa.Table) -> pa.Table:
        labs, c = ray.get(cq_ref)
        q = qmat(batch) * CA_SCALE  # (rows, d)
        true = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        best_d = None
        best_k = None
        for i, k in enumerate(labs):
            diff = q - c[i]
            dist = np.einsum("ij,ij->i", diff, diff)
            if best_d is None:
                best_d, best_k = dist, np.full(len(dist), k, np.int64)
            else:
                m = dist < best_d  # strict: earlier (smaller) label wins ties
                best_d = np.where(m, dist, best_d)
                best_k = np.where(m, k, best_k)
        key = true * 1_000_000 + best_k
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "label": pa.array(u // 1_000_000, pa.int64()),
                "assigned": pa.array(u % 1_000_000, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    out = sum_by_key_pair(
        emb.map_batches(assign, batch_format="pyarrow"), "label", "assigned", ["n"]
    ).to_pandas()
    return (
        out.sort_values(["label", "assigned"]).reset_index(drop=True).astype("int64")
    )


SQL_CENTROID_ASSIGN = (
    "WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS label, "
    "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) + 1000 AS q, "
    "generate_subscripts(embedding, 1) AS d FROM embeddings), "
    "c AS (SELECT label AS k, d, (CAST(sum(q) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT) "
    "AS cq FROM q GROUP BY 1, 2), "
    "dist AS (SELECT q.vec_id, q.label, c.k, "
    "sum((q.q * 1000 - c.cq) * (q.q * 1000 - c.cq)) AS dd FROM q JOIN c ON c.d = q.d "
    "GROUP BY 1, 2, 3), "
    "a AS (SELECT vec_id, label, k, row_number() OVER (PARTITION BY vec_id ORDER BY dd, k) "
    "AS rn FROM dist) "
    "SELECT label, CAST(k AS BIGINT) AS assigned, CAST(count(*) AS BIGINT) AS n "
    "FROM a WHERE rn = 1 GROUP BY 1, 2"
)

ANALYTICS4_QUERIES["emb_centroid_assign"] = q_emb_centroid_assign
ANALYTICS4_ORACLES["emb_centroid_assign"] = SQL_CENTROID_ASSIGN


# ----------------------------------------------------------------------
# Densest subgraph: Charikar batch peel (ε = 0.1)
# ----------------------------------------------------------------------
DENSEST_MAX_ROUNDS = 12  # SQL unroll depth; test scales peel in <= 6


DENSEST_SERIAL_TAIL_EDGES = 500_000  # MIS-precedent gated serial tail


def _densest_serial_tail(
    a: np.ndarray, b: np.ndarray, r0: int, stats: list[tuple[int, int, int, int]]
) -> None:
    """Finish the peel on a pulled (a, b) edge array with the IDENTICAL
    integer threshold math — appends per-round stats in place. Only
    entered once the surviving edge set is under
    ``DENSEST_SERIAL_TAIL_EDGES`` (the MIS/coreness gated-tail
    precedent: each distributed round costs ~5 fixed-latency stages,
    while the set shrinks geometrically — the tail is O(E log V) numpy
    on a bounded array)."""
    r = r0
    while len(a):
        if r >= DENSEST_MAX_ROUNDS:
            raise RuntimeError(
                f"densest peel exceeded {DENSEST_MAX_ROUNDS} rounds — raise the "
                "SQL unroll depth in lockstep"
            )
        u, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        V, E = len(u), len(a)
        stats.append((r, V, E, (1_000_000 * E) // V))
        alive = u[cnt * 5 * V > 11 * E]
        if not len(alive):
            break
        keep = np.isin(a, alive) & np.isin(b, alive)
        a, b = a[keep], b[keep]
        r += 1


def _densest_peel_stats(edges: ray.data.Dataset) -> list[tuple[int, int, int, int]]:
    """Run the batch peel over canonical undirected ``edges`` and return
    per-round (round, V, E, density_ppm). Round k drops every vertex
    with deg·5·V ≤ 11·E (deg ≤ 2.2·E/V, all-int64); survivors number
    at most 10V/11, so rounds = O(log V). While the edge set is LARGE
    each round is one exploded degree ``sum_by_key`` + two semi
    ``hash_join``s with the edge set materialized per round (it shrinks
    geometrically — the coreness lineage-cut precedent); once it fits
    ``DENSEST_SERIAL_TAIL_EDGES`` the remaining rounds run serially on
    one pulled array with identical integer math (the gated MIS-tail
    pattern — a distributed round's fixed stage latency dwarfs the
    bounded numpy tail)."""
    stats: list[tuple[int, int, int, int]] = []
    cur = edges.materialize()
    for r in range(DENSEST_MAX_ROUNDS + 1):
        E = cur.count()
        if E == 0:
            break
        if E <= DENSEST_SERIAL_TAIL_EDGES:
            df = cur.to_pandas()
            _densest_serial_tail(
                df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64), r, stats
            )
            break
        if r == DENSEST_MAX_ROUNDS:
            raise RuntimeError(
                f"densest peel exceeded {DENSEST_MAX_ROUNDS} rounds — raise the "
                "SQL unroll depth in lockstep"
            )

        def explode(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            u, cnt = np.unique(np.concatenate([s, d]), return_counts=True)
            return pa.table(
                {"vid": pa.array(u, pa.int64()), "deg": pa.array(cnt.astype(np.int64), pa.int64())}
            )

        deg = sum_by_key(cur.map_batches(explode, batch_format="pyarrow"), "vid", ["deg"]).materialize()
        V = deg.count()
        stats.append((r, V, E, (1_000_000 * E) // V))

        def survives(t: pa.Table, V=V, E=E) -> pa.Table:
            keep = t["deg"].to_numpy(zero_copy_only=False) * 5 * V > 11 * E
            return t.filter(pa.array(keep))

        surv = deg.map_batches(survives, batch_format="pyarrow").select_columns(["vid"]).materialize()
        if surv.count() == 0:
            break  # everyone at/below the threshold: the peel is done
        nxt = hash_join(cur, surv, on="src", right_on="vid", how="semi")
        nxt = hash_join(nxt, surv, on="dst", right_on="vid", how="semi")
        cur = nxt.materialize()
    return stats


def q_rel_densest(sf_dir):
    """Densest-subgraph estimate on the rel graph: the best round of
    the Charikar batch peel by (density_ppm, n_vertices, earliest
    round) — one row (best_round, n_vertices, n_edges, density_ppm)."""
    from everythinggraph_ray.graph.triangles import _canonical_undirected
    from everythinggraph_ray.pipelines.queries import rel_edges

    stats = _densest_peel_stats(_canonical_undirected(rel_edges(sf_dir)))
    r, v, e, dppm = max(stats, key=lambda t: (t[3], t[1], -t[0]))
    return pd.DataFrame(
        {"best_round": [r], "n_vertices": [v], "n_edges": [e], "density_ppm": [dppm]}
    ).astype("int64")


def _densest_sql() -> str:
    """Unrolled batch-peel oracle: e{k} = edges surviving round k,
    st{k} = that round's (r, v, e) stats; final pick mirrors the Ray
    tiebreak (density_ppm DESC, n_vertices DESC, round ASC)."""
    from everythinggraph_ray.pipelines.queries import _sql_graph_prelude

    # every per-round CTE is MATERIALIZED: each round references the
    # previous ~5 times, so default CTE inlining would blow up 5^R
    # (symptom: DuckDB opening the parquet once per inlined copy)
    parts = [
        "WITH "
        + _sql_graph_prelude()
        + ", e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM e WHERE src <> dst)"
    ]
    for k in range(DENSEST_MAX_ROUNDS):
        parts.append(
            f", st{k} AS MATERIALIZED (SELECT {k} AS r, "
            f"(SELECT CAST(count(DISTINCT u) AS BIGINT) FROM "
            f"(SELECT a AS u FROM e{k} UNION ALL SELECT b FROM e{k})) AS v, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM e{k}) AS e)"
        )
        parts.append(
            f", sv{k} AS MATERIALIZED (SELECT u FROM (SELECT u, CAST(count(*) AS BIGINT) AS c FROM "
            f"(SELECT a AS u FROM e{k} UNION ALL SELECT b FROM e{k}) GROUP BY u), st{k} "
            f"WHERE c * 5 * st{k}.v > 11 * st{k}.e)"
        )
        parts.append(
            f", e{k + 1} AS MATERIALIZED (SELECT a, b FROM e{k} WHERE a IN (SELECT u FROM sv{k}) "
            f"AND b IN (SELECT u FROM sv{k}))"
        )
    union = " UNION ALL ".join(f"SELECT r, v, e FROM st{k}" for k in range(DENSEST_MAX_ROUNDS))
    parts.append(
        f", allst AS ({union}) "
        "SELECT CAST(r AS BIGINT) AS best_round, v AS n_vertices, e AS n_edges, "
        "1000000 * e // v AS density_ppm FROM allst WHERE v > 0 "
        "ORDER BY 1000000 * e // v DESC, v DESC, r ASC LIMIT 1"
    )
    return "".join(parts)


ANALYTICS4_QUERIES["rel_densest"] = q_rel_densest
# registration happens when queries.py imports this module at its tail,
# so the prelude import inside _densest_sql resolves (the _bowtie_sql
# circular-import device)
ANALYTICS4_ORACLES["rel_densest"] = _densest_sql()
