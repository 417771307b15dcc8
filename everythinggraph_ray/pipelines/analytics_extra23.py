"""Analytics batch (session 12, seventh wave): Benford digit audit, a
regular path query, and the GROUPS window frame.

Distributed shapes:
- ``lineitem_benford``: first-significant-digit distribution of the
  extended price in cents (the classic fraud/data-quality audit).
  Per-batch digit histogram partials (9 rows) fold on the driver.
- ``rel_rpq_even_odd_even``: REGULAR PATH QUERY — vertices reachable
  from starts {src < 10} via exactly a 3-edge path whose synthesized
  weights (src%10 + dst%10) have parities (even, odd, even). The
  automaton-product BFS: each step is one parity-filtered semi-join +
  bucketed distinct, the distributed form of the NFA-product frontier
  expansion every graph-pattern engine runs.
- ``events_groups_frame``: the GROUPS window frame (current + previous
  DISTINCT-ts peer group per user) — the third SQL frame mode beside
  ROWS (`events_rolling_median`) and RANGE (`events_range_window`).
  DuckDB has no GROUPS mode, so the oracle lowers it to
  dense_rank + integer RANGE — the same lowering the distributed side
  uses: per-user slab, group starts via ts-change flags, vectorized
  prefix sums over the group table.
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
from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, sever

ANALYTICS23_QUERIES: dict = {}
ANALYTICS23_ORACLES: dict = {}

RPQ_PATTERN = (0, 1, 0)  # parity of (src%10 + dst%10) per step
RPQ_START_MAX = 10


# ----------------------------------------------------------------------
# Benford first-digit audit
# ----------------------------------------------------------------------
def q_lineitem_benford(sf_dir):
    """(digit, n): first significant digit of l_extendedprice in cents
    (FLOOR(price*100 + 0.5) — always >= 1 in TPC-H data)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        first = pd.Series(cents).astype(str).str[0].astype(np.int64).to_numpy()
        cnt = np.bincount(first, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64), pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    df = (
        li.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("digit", as_index=False)["n"]
        .sum()
        .sort_values("digit")
        .reset_index(drop=True)
        .astype("int64")
    )
    return _typed_collect(ray.data.from_pandas(df), {"digit": "int64", "n": "int64"})


ANALYTICS23_QUERIES["lineitem_benford"] = q_lineitem_benford

ANALYTICS23_ORACLES["lineitem_benford"] = (
    "WITH c AS (SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents "
    "FROM lineitem) "
    "SELECT CAST(LEFT(CAST(cents AS VARCHAR), 1) AS BIGINT) AS digit, "
    "CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1"
)


# ----------------------------------------------------------------------
# regular path query (automaton-product BFS)
# ----------------------------------------------------------------------
def q_rel_rpq_even_odd_even(sf_dir):
    """(v): distinct vertices reachable from {src < 10} by a 3-edge
    path with weight parities even -> odd -> even."""
    from everythinggraph_ray.pipelines.queries import _typed_collect, rel_edges

    def with_parity(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "p": pa.array(((s % 10 + d % 10) % 2).astype(np.int64), pa.int64()),
            }
        )

    edges = rel_edges(sf_dir).map_batches(with_parity, batch_format="pyarrow").materialize()

    def v_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["v"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def uniq_v(g: pa.Table) -> pa.Table:
        return pa.table(
            {"v": pa.array(np.unique(g["v"].to_numpy(zero_copy_only=False)), pa.int64())}
        )

    frontier = sever(
        bucketed_reduce(
            edges.map_batches(
                lambda t: pa.table(
                    {
                        "v": t.filter(pc.less(t["src"], RPQ_START_MAX))["src"],
                    }
                ),
                batch_format="pyarrow",
            ),
            v_bucket,
            uniq_v,
        )
    )

    for parity in RPQ_PATTERN:
        step = hash_join(
            edges.map_batches(
                lambda t, p=parity: t.filter(pc.equal(t["p"], p)),
                batch_format="pyarrow",
            ),
            frontier.map_batches(
                lambda t: pa.table({"src": t["v"]}), batch_format="pyarrow"
            ),
            on="src",
            how="semi",
        ).map_batches(lambda t: pa.table({"v": t["dst"]}), batch_format="pyarrow")
        frontier = sever(bucketed_reduce(step, v_bucket, uniq_v))

    return _typed_collect(frontier, {"v": "int64"})


ANALYTICS23_QUERIES["rel_rpq_even_odd_even"] = q_rel_rpq_even_odd_even


def _rpq_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    steps = []
    prev = "s0"
    for i, p in enumerate(RPQ_PATTERN, start=1):
        steps.append(
            f"s{i} AS MATERIALIZED (SELECT DISTINCT e.dst AS v FROM e "
            f"JOIN {prev} ON e.src = {prev}.v WHERE e.p = {p})"
        )
        prev = f"s{i}"
    return (
        f"WITH e AS MATERIALIZED (SELECT src, dst, (src % 10 + dst % 10) % 2 AS p "
        f"FROM ({SQL_REL_EDGES})), "
        f"s0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM e WHERE src < {RPQ_START_MAX}), "
        + ", ".join(steps)
        + f" SELECT CAST(v AS BIGINT) AS v FROM {prev}"
    )


ANALYTICS23_ORACLES["rel_rpq_even_odd_even"] = _rpq_sql()


# ----------------------------------------------------------------------
# GROUPS window frame (current + previous distinct-ts group)
# ----------------------------------------------------------------------
def q_events_groups_frame(sf_dir):
    """(event_id, user_id, grp_sum_milli, grp_cnt): per event, sum and
    count of the same user's value-millis over the current AND previous
    DISTINCT-ts peer groups (SQL GROUPS BETWEEN 1 PRECEDING AND CURRENT
    ROW ordered by ts)."""
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
        u, ts, v, eid = u[o], ts[o], v[o], eid[o]
        # per-user distinct-ts groups: group id increments at each new
        # (user, ts); per-group sums/counts, then frame = group g-1 + g
        new_user = np.r_[True, u[1:] != u[:-1]]
        new_grp = new_user | np.r_[True, ts[1:] != ts[:-1]]
        gid = np.cumsum(new_grp) - 1
        n_grp = gid[-1] + 1 if len(gid) else 0
        gsum = np.zeros(n_grp, np.int64)
        gcnt = np.zeros(n_grp, np.int64)
        np.add.at(gsum, gid, v)
        np.add.at(gcnt, gid, 1)
        first_grp = np.zeros(n_grp, bool)
        first_grp[gid[np.flatnonzero(new_user)]] = True  # first group of its user
        prev_sum = np.where(first_grp, 0, np.r_[np.int64(0), gsum[:-1]])
        prev_cnt = np.where(first_grp, 0, np.r_[np.int64(0), gcnt[:-1]])
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "grp_sum_milli": pa.array((gsum + prev_sum)[gid], pa.int64()),
                "grp_cnt": pa.array((gcnt + prev_cnt)[gid], pa.int64()),
            }
        )

    res = bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"), user_bucket, frames)
    return _typed_collect(
        res,
        {
            "event_id": "int64",
            "user_id": "int64",
            "grp_sum_milli": "int64",
            "grp_cnt": "int64",
        },
    )


ANALYTICS23_QUERIES["events_groups_frame"] = q_events_groups_frame

# GROUPS lowered to dense_rank + integer RANGE (DuckDB lacks GROUPS)
ANALYTICS23_ORACLES["events_groups_frame"] = (
    "WITH t AS (SELECT event_id, user_id, ts, "
    "CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v, "
    "DENSE_RANK() OVER (PARTITION BY user_id ORDER BY ts) AS dr FROM events) "
    "SELECT event_id, user_id, "
    "CAST(SUM(v) OVER w AS BIGINT) AS grp_sum_milli, "
    "CAST(COUNT(*) OVER w AS BIGINT) AS grp_cnt FROM t "
    "WINDOW w AS (PARTITION BY user_id ORDER BY dr "
    "RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)"
)
