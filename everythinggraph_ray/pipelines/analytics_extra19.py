"""Analytics batch (session 12, third wave): multi-keyword substring
counting, a rolling window median, and bootstrap percolation.

Distributed shapes:
- ``docs_keyword_counts``: per-keyword corpus totals for a fixed
  4-keyword list, counted with the vectorized Arrow
  ``pc.count_substring`` kernel per batch (non-overlapping occurrences
  — all keywords chosen non-self-overlapping so Arrow and the oracle's
  replace-length arithmetic agree); per-batch partials fold to one row
  per keyword. The multi-pattern scan every keyword-filter /
  blocklist-tagging curation stage needs.
- ``events_rolling_median``: per event, 2x the exact median of the
  same user's last 10 events' value-millis (ROWS BETWEEN 9 PRECEDING
  AND CURRENT ROW over ts, event_id order — event_id tie-break makes
  the ROWS frame deterministic under duplicate timestamps). Bucketed
  by user hash; each user's slab builds an n x 10 NaN-padded lag
  matrix and one ``np.nanmedian`` resolves every frame — the doubled
  integer form keeps the even-frame midpoint average exact.
- ``rel_threshold_cascade``: bootstrap percolation over the distinct
  self-loop-free rel digraph — seeds vid < 20, a vertex activates
  when >= 2 DISTINCT in-neighbors are active, 10 synchronous rounds,
  reporting the active count per round. Per round: one semi-join of
  edges against the active set + a bucketed per-dst count + threshold
  filter + severed union (monotone growth, order-free). The SQL
  oracle unrolls the 10 rounds as MATERIALIZED CTEs.
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
from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, sever, sum_by_key

ANALYTICS19_QUERIES: dict = {}
ANALYTICS19_ORACLES: dict = {}

KEYWORDS = ("data", "table", "window", "spark")  # none self-overlapping
ROLL_ROWS = 10
CASCADE_SEED_MAX = 20  # seeds: vid < 20
CASCADE_THRESH = 2  # activate at >= 2 active in-neighbors
CASCADE_ROUNDS = 10


# ----------------------------------------------------------------------
# multi-keyword substring counting
# ----------------------------------------------------------------------
def q_docs_keyword_counts(sf_dir):
    """(keyword, n_docs_with, total_occurrences): corpus totals per
    fixed keyword — occurrences via the Arrow count_substring kernel,
    docs-with via a nonzero test, both folded as per-batch partials."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        kws, hits, occs = [], [], []
        for kw in KEYWORDS:
            c = pc.count_substring(t["text"], kw).to_numpy(zero_copy_only=False)
            kws.append(kw)
            hits.append(int((c > 0).sum()))
            occs.append(int(c.sum()))
        return pa.table(
            {
                "keyword": pa.array(kws, pa.string()),
                "n_docs_with": pa.array(hits, pa.int64()),
                "total_occurrences": pa.array(occs, pa.int64()),
            }
        )

    df = (
        docs.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("keyword", as_index=False)[["n_docs_with", "total_occurrences"]]
        .sum()
        .sort_values("keyword")
        .reset_index(drop=True)
    )
    df[["n_docs_with", "total_occurrences"]] = df[
        ["n_docs_with", "total_occurrences"]
    ].astype("int64")
    return _typed_collect(
        ray.data.from_pandas(df),
        {"keyword": "object", "n_docs_with": "int64", "total_occurrences": "int64"},
    )


ANALYTICS19_QUERIES["docs_keyword_counts"] = q_docs_keyword_counts


def _keyword_sql() -> str:
    parts = []
    for kw in KEYWORDS:
        occ = f"(length(text) - length(replace(text, '{kw}', ''))) // {len(kw)}"
        parts.append(
            f"SELECT '{kw}' AS keyword, "
            f"CAST(SUM(CASE WHEN {occ} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with, "
            f"CAST(SUM({occ}) AS BIGINT) AS total_occurrences FROM documents"
        )
    return " UNION ALL ".join(parts)


ANALYTICS19_ORACLES["docs_keyword_counts"] = _keyword_sql()


# ----------------------------------------------------------------------
# rolling window median (last 10 rows per user)
# ----------------------------------------------------------------------
def q_events_rolling_median(sf_dir):
    """(event_id, user_id, roll_median2x): 2x the median of the user's
    trailing 10 value-millis in (ts, event_id) order — the doubled
    integer keeps even-frame interpolation exact."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def prep(t: pa.Table) -> pa.Table:
        v = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pa.array(ts, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    def user_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def frames(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, ts, u))
        u, v, eid = u[o], v[o], eid[o]
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1, len(u)]
        med2 = np.empty(len(u), np.int64)
        for i in range(len(starts) - 1):
            lo, hi = starts[i], starts[i + 1]
            seg = v[lo:hi].astype(np.float64)
            n = len(seg)
            W = np.full((n, ROLL_ROWS), np.nan)
            for j in range(ROLL_ROWS):
                W[j:, j] = seg[: n - j] if j else seg
            med2[lo:hi] = np.round(2.0 * np.nanmedian(W, axis=1)).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "roll_median2x": pa.array(med2, pa.int64()),
            }
        )

    res = bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"), user_bucket, frames)
    return _typed_collect(
        res, {"event_id": "int64", "user_id": "int64", "roll_median2x": "int64"}
    )


ANALYTICS19_QUERIES["events_rolling_median"] = q_events_rolling_median

ANALYTICS19_ORACLES["events_rolling_median"] = (
    "SELECT event_id, user_id, "
    "CAST(ROUND(2 * median(v) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    f"ROWS BETWEEN {ROLL_ROWS - 1} PRECEDING AND CURRENT ROW)) AS BIGINT) "
    "AS roll_median2x "
    "FROM (SELECT event_id, user_id, ts, "
    "CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v FROM events)"
)


# ----------------------------------------------------------------------
# bootstrap percolation (linear-threshold cascade)
# ----------------------------------------------------------------------
def q_rel_threshold_cascade(sf_dir):
    """(rnd, n_active): synchronous bootstrap percolation — seeds
    vid < 20, activation at >= 2 distinct active in-neighbors, 10
    rounds over the distinct self-loop-free rel digraph.

    Round 5: rides the engine's ThresholdCascadeKernel (sum-combine
    frontier kernel over a dedicated distinct-graph build) — one fused
    RPC per round instead of a semi-join + grouped-count + union
    Dataset pipeline per round; every round's active count falls out of
    the final packed state (activation round per vertex)."""
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import ThresholdCascadeKernel
    from everythinggraph_ray.pipelines.flagship import build_dir_for
    from everythinggraph_ray.pipelines.queries import _typed_collect, rel_edges
    from everythinggraph_ray.stages.edges import dedup_edges

    def nonloop(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["src"], t["dst"]))

    bdir = build_dir_for(f"relcascade|{sf_dir}", 8)
    build_graph(
        dedup_edges(rel_edges(sf_dir).map_batches(nonloop, batch_format="pyarrow")),
        bdir,
        num_partitions=8,
        hub_threshold=10**9,  # dense small ids: no hubs
    )
    eng = GraphEngine(bdir)
    try:
        res = eng.run(
            ThresholdCascadeKernel(
                CASCADE_SEED_MAX, threshold=CASCADE_THRESH, rounds=CASCADE_ROUNDS
            )
        )
        vals = res["dataset"].to_pandas()
    finally:
        eng.shutdown()
    act = ThresholdCascadeKernel.activation_rounds(vals["cascade"].to_numpy(np.int64))
    act = act[act >= 0]
    counts = [(r, int((act <= r).sum())) for r in range(CASCADE_ROUNDS + 1)]
    out = pd.DataFrame(counts, columns=["rnd", "n_active"]).astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out), {"rnd": "int64", "n_active": "int64"}
    )


ANALYTICS19_QUERIES["rel_threshold_cascade"] = q_rel_threshold_cascade


def _cascade_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    ctes = [
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({SQL_REL_EDGES}) "
        "WHERE src <> dst)",
        "univ AS MATERIALIZED (SELECT DISTINCT v FROM "
        "(SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e))",
        f"a0 AS MATERIALIZED (SELECT v FROM univ WHERE v < {CASCADE_SEED_MAX})",
    ]
    selects = ["SELECT CAST(0 AS BIGINT) AS rnd, CAST((SELECT count(*) FROM a0) AS BIGINT) AS n_active"]
    for r in range(1, CASCADE_ROUNDS + 1):
        ctes.append(
            f"a{r} AS MATERIALIZED (SELECT v FROM a{r - 1} UNION "
            f"SELECT e.dst AS v FROM e JOIN a{r - 1} s ON e.src = s.v "
            f"GROUP BY e.dst HAVING count(*) >= {CASCADE_THRESH})"
        )
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS rnd, "
            f"CAST((SELECT count(*) FROM a{r}) AS BIGINT) AS n_active"
        )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


ANALYTICS19_ORACLES["rel_threshold_cascade"] = _cascade_sql()
