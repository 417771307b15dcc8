"""Analytics batch (session 11, third wave): FULL OUTER hash join,
the PIVOT completion of the OLAP surface, and distributed Gale-Shapley
stable matching.

Distributed shapes:
- ``customer_orders_full``: the new ``hash_join(how='full')`` mode
  (datapipe/joins.py) — unmatched rows of BOTH sides survive with the
  join keys coalesced from whichever side exists; int columns ride
  pandas nullable Int64 through the bucket merge so large values never
  float64-coerce. Left = positive-balance customers, right = urgent
  order counts: both orphan populations are non-empty by construction.
- ``docs_source_lang_pivot``: PIVOT with the STATIC lang column list a
  SQL PIVOT's IN-clause requires (de/en/es/fr/zh — the corpus langid
  contract); per-batch crosstab partials, driver fold over the
  20-source table. Completes CUBE / ROLLUP / UNPIVOT / PIVOT.
- ``cust_supplier_match``: proposer-optimal stable matching (parallel
  Gale-Shapley / McVitie-Wilson: batch proposals converge to the SAME
  unique proposer-optimal matching as the sequential algorithm).
  Preferences are hash-derived on the fly (mix64_pair both ways), so
  no preference lists ever materialize: each round, unmatched
  proposers compute their k-th choice VECTORIZED against the broadcast
  acceptor vector (the bounded side, |A| <= 40), proposals + current
  holds co-locate by acceptor in one bucketed reduce that keeps the
  hash-best proposer, and rejected proposers advance k. State is two
  tiny per-round Datasets (holds, proposer cursors); nothing
  quadratic, no driver-side preference matrix. No SQL oracle
  (iterative fixpoint) -> rows-only + serial-replay and NO-BLOCKING-
  PAIR pytests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import (
    bucketed_reduce,
    mix64,
    mix64_pair,
    sever,
    sum_by_key,
)

ANALYTICS15_QUERIES: dict = {}
ANALYTICS15_ORACLES: dict = {}

PIVOT_LANGS = ("de", "en", "es", "fr", "zh")
MATCH_N_CAP = 16
MATCH_MAX_ROUNDS = 400


# ----------------------------------------------------------------------
# FULL OUTER hash join
# ----------------------------------------------------------------------
def q_customer_orders_full(sf_dir):
    """Positive-balance customers FULL OUTER urgent-order counts:
    left-only rows are quiet positive-balance customers, right-only rows
    are urgent-ordering customers with non-positive balance. Missing
    sides surface as -1 sentinels so every column stays int64."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_acctbal"]
    )

    def left_side(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        keep = bal > 0
        return pa.table(
            {
                "c_custkey": pa.array(
                    t["c_custkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "acctbal_cents": pa.array(
                    np.floor(bal[keep] * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    left = cust.map_batches(left_side, batch_format="pyarrow")

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_orderpriority"]
    )

    def urgent(t: pa.Table) -> pa.Table:
        keep = np.asarray(t["o_orderpriority"].to_pandas() == "1-URGENT")
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)[keep]
        u, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "c_custkey": pa.array(u, pa.int64()),
                "n_urgent": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    right = sum_by_key(
        orders.map_batches(urgent, batch_format="pyarrow"), "c_custkey", ["n_urgent"]
    )

    joined = hash_join(left, right, on="c_custkey", right_cols=["n_urgent"], how="full")

    def sentinel(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        for c in ("acctbal_cents", "n_urgent"):
            df[c] = df[c].fillna(-1).astype(np.int64)
        df["c_custkey"] = df["c_custkey"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return _typed_collect(
        joined.map_batches(sentinel, batch_format="pyarrow"),
        {"c_custkey": "int64", "acctbal_cents": "int64", "n_urgent": "int64"},
    )


ANALYTICS15_QUERIES["customer_orders_full"] = q_customer_orders_full
ANALYTICS15_ORACLES["customer_orders_full"] = (
    "WITH l AS (SELECT c_custkey, CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents "
    "FROM customer WHERE c_acctbal > 0), "
    "r AS (SELECT o_custkey AS c_custkey, CAST(count(*) AS BIGINT) AS n_urgent "
    "FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1) "
    "SELECT COALESCE(l.c_custkey, r.c_custkey) AS c_custkey, "
    "COALESCE(l.acctbal_cents, -1) AS acctbal_cents, "
    "COALESCE(r.n_urgent, -1) AS n_urgent "
    "FROM l FULL OUTER JOIN r ON l.c_custkey = r.c_custkey"
)


# ----------------------------------------------------------------------
# PIVOT (static IN-list, the SQL PIVOT contract)
# ----------------------------------------------------------------------
def q_docs_source_lang_pivot(sf_dir):
    """(source, n_de, n_en, n_es, n_fr, n_zh): document counts pivoted
    by language into the STATIC column list — per-batch crosstab
    partials, tiny driver fold (|sources| rows)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "lang"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"source": t["source"].to_pandas(), "lang": t["lang"].to_pandas()}
        )
        g = df.groupby(["source", "lang"], as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "c"}), preserve_index=False)

    hist = (
        docs.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["source", "lang"], as_index=False)["c"]
        .sum()
    )
    wide = hist.pivot_table(
        index="source", columns="lang", values="c", aggfunc="sum", fill_value=0
    )
    out = pd.DataFrame({"source": wide.index.to_numpy(object)})
    for lg in PIVOT_LANGS:
        out[f"n_{lg}"] = (
            wide[lg].to_numpy(np.int64) if lg in wide.columns else np.int64(0)
        )
    return out.sort_values("source").reset_index(drop=True).astype(
        {f"n_{lg}": "int64" for lg in PIVOT_LANGS}
    )


ANALYTICS15_QUERIES["docs_source_lang_pivot"] = q_docs_source_lang_pivot
ANALYTICS15_ORACLES["docs_source_lang_pivot"] = (
    "SELECT source, "
    + ", ".join(
        f"CAST(count(*) FILTER (WHERE lang = '{lg}') AS BIGINT) AS n_{lg}"
        for lg in PIVOT_LANGS
    )
    + " FROM documents GROUP BY source"
)


# ----------------------------------------------------------------------
# distributed Gale-Shapley stable matching
# ----------------------------------------------------------------------
def _prop_pref(pid: np.ndarray, aid: np.ndarray) -> np.ndarray:
    """Proposer p's score for acceptor a (lower = preferred)."""
    return mix64_pair(pid, aid)


def _acc_pref(aid: np.ndarray, pid: np.ndarray) -> np.ndarray:
    """Acceptor a's score for proposer p (lower = preferred) — a
    DIFFERENT hash stream than the proposer side (salted aid)."""
    return mix64_pair(aid * np.int64(31) + np.int64(7), pid)


def q_cust_supplier_match(sf_dir):
    """Proposer-optimal stable matching of the N smallest custkeys
    (proposers) to the N smallest suppkeys (acceptors),
    N = min(|suppliers|, 40), under hash-derived complete preference
    orders. Returns (suppkey, custkey) — a perfect matching with no
    blocking pair (both asserted in tests)."""
    from everythinggraph_ray.datapipe.knn import smallest_ids

    sup = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey"]
    )
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    n_sup = sup.count()
    N = min(int(n_sup), MATCH_N_CAP)
    acc_ids = np.sort(np.array(smallest_ids(sup, "s_suppkey", N), np.int64))
    prop_ids = np.sort(np.array(smallest_ids(cust, "c_custkey", N), np.int64))
    A = len(acc_ids)

    # proposer cursors (pid, k): k = next preference index to try
    props = ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array(prop_ids, pa.int64()),
                "k": pa.array(np.zeros(A, np.int64), pa.int64()),
            }
        )
    ).materialize()
    holds = ray.data.from_arrow(
        pa.table({"aid": pa.array([], pa.int64()), "pid": pa.array([], pa.int64())})
    ).materialize()

    def proposals_of(t: pa.Table) -> pa.Table:
        """k-th choice of every free cursor with preferences left,
        vectorized against the broadcast acceptor vector; carries k so
        the cursor bump derives from the SAME severed table."""
        pid = t["pid"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        live = k < A
        pid, k = pid[live], k[live]
        if not len(pid):
            return pa.table(
                {
                    "aid": pa.array([], pa.int64()),
                    "pid": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                }
            )
        # hash matrix (n x A), ties broken by acceptor id (lexsort keys)
        H = _prop_pref(np.repeat(pid, A), np.tile(acc_ids, len(pid))).reshape(len(pid), A)
        order = np.lexsort((np.tile(np.arange(A), (len(pid), 1)), H), axis=1)
        target = acc_ids[order[np.arange(len(pid)), k]]
        return pa.table(
            {
                "aid": pa.array(target, pa.int64()),
                "pid": pa.array(pid, pa.int64()),
                "k": pa.array(k, pa.int64()),
            }
        )

    def acc_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["aid"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def decide(g: pa.Table) -> pa.Table:
        aid = g["aid"].to_numpy(zero_copy_only=False)
        pid = g["pid"].to_numpy(zero_copy_only=False)
        score = _acc_pref(aid, pid)
        df = pd.DataFrame({"aid": aid, "pid": pid, "s": score})
        best = df.sort_values(["aid", "s", "pid"], kind="stable").groupby(
            "aid", sort=False, as_index=False
        ).first()
        return pa.table(
            {
                "aid": pa.array(best["aid"].to_numpy(np.int64), pa.int64()),
                "pid": pa.array(best["pid"].to_numpy(np.int64), pa.int64()),
            }
        )

    debug = bool(os.environ.get("EGRAY_MATCH_DEBUG"))
    import time as _time

    _t0 = _time.time()
    for _rnd in range(MATCH_MAX_ROUNDS):
        # unmatched proposers propose to their next choice; sever (not
        # settle): holds and cursors are INTERLOCKED loop variables and
        # materialize alone lets their plan DAGs compound Fibonacci-
        # style (see stages/agg.py sever docstring)
        free = hash_join(props, holds, on="pid", how="anti")
        proposals = sever(free.map_batches(proposals_of, batch_format="pyarrow"))
        n_active = proposals.count()
        if debug:
            print(
                f"[match] round={_rnd} proposals={n_active} t={_time.time() - _t0:.1f}s",
                flush=True,
            )
        if n_active == 0:
            break
        holds = sever(
            bucketed_reduce(
                proposals.select_columns(["aid", "pid"]).union(holds),
                acc_bucket,
                decide,
            )
        )
        # every proposer that proposed advances its cursor
        bump = proposals.map_batches(
            lambda t: pa.table(
                {
                    "pid": t["pid"],
                    "k": pa.array(
                        t["k"].to_numpy(zero_copy_only=False) + 1, pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        props = sever(hash_join(props, bump, on="pid", how="anti").union(bump))
    else:
        raise RuntimeError("stable matching did not converge")

    df = holds.to_pandas().astype("int64")
    return (
        df.rename(columns={"aid": "suppkey", "pid": "custkey"})
        .sort_values("suppkey")
        .reset_index(drop=True)[["suppkey", "custkey"]]
    )


ANALYTICS15_QUERIES["cust_supplier_match"] = q_cust_supplier_match
# no SQL oracle: iterative fixpoint (rows-only; serial-replay +
# no-blocking-pair pytests in tests/test_analytics_extra15.py)
