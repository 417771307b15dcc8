"""Analytics batch (session 10, third wave): the 1-NN similarity join,
market-basket association metrics (confidence / lift), the full SQL
rank-family surface (RANK / DENSE_RANK / PERCENT_RANK) from one value
histogram, and RFM customer segmentation.

Each is a (ray_fn, oracle_sql) pair on queries.py's exactness
discipline — every surfaced number is an int64 (ppm / milli / cents
grids), so the driver's value hash is summation-order-proof.

Distributed shapes:
- ``emb_nn1``: every vector's nearest neighbor (cosine, min-id
  tiebreak ON THE MILLI GRID — raw-float argmax would be ulp-fragile
  between numpy's pairwise-sum dot and DuckDB's sequential one). The
  allpairs_similarity broadcast-matmul shape: corpus normalized once,
  ray.put once, one float64 matmul per batch. Quadratic baseline path
  by definition — at 100 TB the candidate generator swaps to IVF/LSH
  (datapipe/knn.py) and the per-batch argmax is unchanged.
- ``copurchase_lift``: support → confidence → lift in exact ppm over
  the part_copurchase pair counts (order-bucketed pair emission with
  per-bucket combiner) joined against per-part distinct-order counts
  (one order-bucketed dedup + key sum); total-order count is one
  driver scalar. P(b|a), P(a|b) and lift never leave integer math.
- ``lineitem_qty_rank``: RANK = running count before + 1, DENSE_RANK =
  distinct index, PERCENT_RANK = 1e6·(rank−1)//(N−1) — all derived
  from the per-(flag, qty) count histogram, one row per DISTINCT value
  (the join-back-free window surface; a group's distinct values
  co-locate in one bucketed co-group, ≤ 50 per flag).
- ``customer_rfm``: the marketing-standard segmentation on
  deterministic tiles: per-customer (recency, frequency, monetary)
  fold, then three range-partitioned ROW_NUMBER passes
  (stages/agg.py grouped_row_number — custkey tiebreak makes tiles
  deterministic where NTILE's tie handling is not), tile =
  (5·rn + n − 1) // n, one bucketed count per (r,f,m) cell.
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
    grouped_row_number,
    mix64,
    sum_by_key,
)

ANALYTICS10_QUERIES: dict = {}
ANALYTICS10_ORACLES: dict = {}


# ----------------------------------------------------------------------
# 1-NN similarity join (cosine, milli-grid argmax, min-id tiebreak)
# ----------------------------------------------------------------------
def q_emb_nn1(sf_dir):
    """Each vector's single nearest neighbor by cosine similarity —
    argmax on the floor(sim·1000) grid, ties to the smaller neighbor
    id. Output (vec_id, nn_id, sim_milli)."""
    from everythinggraph_ray.datapipe.knn import _batch_matrix, _normalize
    from everythinggraph_ray.pipelines.queries import _typed_collect

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    rows = emb.to_pandas()
    ids = rows["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = _normalize(np.stack(rows["embedding"].to_numpy())[order].astype(np.float64))
    cref = ray.put((ids, mat))

    def nn1(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(cref)
        bids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = _normalize(_batch_matrix(batch, "embedding"))
        sims = bm @ cmat.T  # (batch, corpus) float64
        milli = np.floor(sims * 1000.0).astype(np.int64)
        milli[bids[:, None] == cids[None, :]] = np.iinfo(np.int64).min  # no self
        best = milli.max(axis=1)
        # min id among the milli-grid ties
        nn = np.where(milli == best[:, None], cids[None, :], np.iinfo(np.int64).max).min(
            axis=1
        )
        return pa.table(
            {
                "vec_id": pa.array(bids, pa.int64()),
                "nn_id": pa.array(nn, pa.int64()),
                "sim_milli": pa.array(best, pa.int64()),
            }
        )

    out = emb.map_batches(nn1, batch_format="pyarrow", batch_size=1024)
    return _typed_collect(out, {"vec_id": "int64", "nn_id": "int64", "sim_milli": "int64"})


ANALYTICS10_QUERIES["emb_nn1"] = q_emb_nn1
ANALYTICS10_ORACLES["emb_nn1"] = (
    "WITH s AS (SELECT a.vec_id AS va, b.vec_id AS vb, "
    "CAST(FLOOR(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) "
    "* 1000) AS BIGINT) AS sim_milli "
    "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), "
    "r AS (SELECT va, vb, sim_milli, "
    "ROW_NUMBER() OVER (PARTITION BY va ORDER BY sim_milli DESC, vb) AS rn FROM s) "
    "SELECT va AS vec_id, vb AS nn_id, sim_milli FROM r WHERE rn = 1"
)


# ----------------------------------------------------------------------
# Market-basket association metrics: confidence + lift in exact ppm
# ----------------------------------------------------------------------
def q_copurchase_lift(sf_dir):
    """part_copurchase's frequent pairs annotated with the association
    metrics: n_a / n_b (distinct orders containing each part),
    conf(a→b) = 1e6·cnt // n_a, conf(b→a), and
    lift = 1e6·cnt·n_orders // (n_a·n_b) — all exact integer ppm."""
    from everythinggraph_ray.pipelines.queries import _typed_collect, q_part_copurchase

    pairs = q_part_copurchase(sf_dir)  # (a, b, cnt), cnt >= MINSUP

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"]
    )

    def bucket_ok(b: pa.Table) -> np.ndarray:
        return mix64(b["l_orderkey"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        ) & 0x7FFFFFFF

    # distinct (order, part) per order-bucket → per-part partial counts
    # + per-bucket distinct-order counts (combiner before the key sums)
    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates()
        c = df.groupby("l_partkey", as_index=False).size()
        out = pd.DataFrame(
            {
                "key": c["l_partkey"].to_numpy(np.int64),
                "n": c["size"].to_numpy(np.int64),
                "is_order": np.zeros(len(c), np.int64),
            }
        )
        orders = pd.DataFrame(
            {
                "key": [-1],
                "n": [df["l_orderkey"].nunique()],
                "is_order": [1],
            }
        )
        return pa.Table.from_pandas(
            pd.concat([out, orders], ignore_index=True), preserve_index=False
        )

    partials = bucketed_reduce(li, bucket_ok, per_bucket)
    # same-key partials from different buckets sum up: parts on key >= 0,
    # the total order count on the single key = -1 sentinel
    summed = sum_by_key(
        partials.map_batches(
            lambda t: pa.table(
                {
                    "key": pc.add(
                        pc.multiply(t["key"], pa.scalar(2, pa.int64())),
                        t["is_order"],
                    ),
                    "n": t["n"],
                }
            ),
            batch_format="pyarrow",
        ),
        "key",
        ["n"],
        num_buckets=8,
    )

    def split_parts(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        m = (k % 2 == 0) & (k >= 0)
        return pa.table(
            {
                "pk": pa.array(k[m] // 2, pa.int64()),
                "np": pa.array(n[m], pa.int64()),
            }
        )

    part_counts = summed.map_batches(split_parts, batch_format="pyarrow")
    n_orders = int(
        summed.map_batches(
            lambda t: pa.table(
                {
                    "n": t.filter(pc.equal(t["key"], pa.scalar(-1, pa.int64())))["n"]
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["n"]
        .sum()
    )

    def _ren(ds, old, new):
        return ds.map_batches(
            lambda t, o=old, n=new: t.rename_columns(
                [n if c == o else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )

    j = hash_join(
        pairs, _ren(_ren(part_counts, "pk", "a"), "np", "n_a"), on="a", right_cols=["n_a"]
    )
    j = hash_join(
        j, _ren(_ren(part_counts, "pk", "b"), "np", "n_b"), on="b", right_cols=["n_b"]
    )

    M = 1_000_000

    def metrics(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        na = t["n_a"].to_numpy(zero_copy_only=False)
        nb = t["n_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "cnt": t["cnt"],
                "n_a": t["n_a"],
                "n_b": t["n_b"],
                "conf_ab_ppm": pa.array(M * cnt // na, pa.int64()),
                "conf_ba_ppm": pa.array(M * cnt // nb, pa.int64()),
                "lift_ppm": pa.array(M * cnt * n_orders // (na * nb), pa.int64()),
            }
        )

    return _typed_collect(
        j.map_batches(metrics, batch_format="pyarrow"),
        {
            "a": "int64",
            "b": "int64",
            "cnt": "int64",
            "n_a": "int64",
            "n_b": "int64",
            "conf_ab_ppm": "int64",
            "conf_ba_ppm": "int64",
            "lift_ppm": "int64",
        },
    )


def _copurchase_lift_sql() -> str:
    from everythinggraph_ray.pipelines.queries import COPURCHASE_MINSUP

    return (
        "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
        "t AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM lineitem), "
        "pcnt AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS np FROM d GROUP BY 1), "
        "p AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b, CAST(count(*) AS BIGINT) AS cnt "
        "FROM d l1 JOIN d l2 ON l1.l_orderkey = l2.l_orderkey "
        f"AND l1.l_partkey < l2.l_partkey GROUP BY 1, 2 HAVING count(*) >= {COPURCHASE_MINSUP}) "
        "SELECT p.a, p.b, p.cnt, ca.np AS n_a, cb.np AS n_b, "
        "1000000 * p.cnt // ca.np AS conf_ab_ppm, "
        "1000000 * p.cnt // cb.np AS conf_ba_ppm, "
        "1000000 * p.cnt * t.n // (ca.np * cb.np) AS lift_ppm "
        "FROM p JOIN pcnt ca ON ca.l_partkey = p.a "
        "JOIN pcnt cb ON cb.l_partkey = p.b CROSS JOIN t"
    )


ANALYTICS10_QUERIES["copurchase_lift"] = q_copurchase_lift


# ----------------------------------------------------------------------
# RANK / DENSE_RANK / PERCENT_RANK from the value histogram
# ----------------------------------------------------------------------
def q_lineitem_qty_rank(sf_dir):
    """The SQL rank family over quantity within returnflag, one row per
    DISTINCT (flag, qty): n, RANK (running count before + 1),
    DENSE_RANK (distinct index), PERCENT_RANK in exact ppm — all from
    the per-group count histogram (≤ 50 distinct values per flag
    co-locate; raw rows never shuffle)."""
    from everythinggraph_ray.datapipe.joins import _key_hash
    from everythinggraph_ray.pipelines.queries import _typed_collect

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_returnflag", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas().to_numpy(object),
                "qty": np.round(
                    t["l_quantity"].to_numpy(zero_copy_only=False)
                ).astype(np.int64),
            }
        )
        g = df.groupby(["l_returnflag", "qty"], as_index=False).size()
        g["n"] = g.pop("size").astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_flag(t: pa.Table) -> np.ndarray:
        return _key_hash(t, ["l_returnflag"])

    def rank_group(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["l_returnflag", "qty"], as_index=False)["n"].sum()
        out = []
        for f, grp in df.groupby("l_returnflag"):
            grp = grp.sort_values("qty").reset_index(drop=True)
            ns = grp["n"].to_numpy(np.int64)
            total = int(ns.sum())
            before = np.concatenate([[0], ns.cumsum()[:-1]])
            grp["rank"] = before + 1
            grp["dense_rank"] = np.arange(1, len(grp) + 1, dtype=np.int64)
            grp["percent_rank_ppm"] = (
                1_000_000 * before // max(total - 1, 1)
            ).astype(np.int64)
            out.append(grp)
        return pa.Table.from_pandas(pd.concat(out, ignore_index=True), preserve_index=False)

    out = bucketed_reduce(
        li.map_batches(partial, batch_format="pyarrow"),
        bucket_flag,
        rank_group,
        num_buckets=4,
    )
    return _typed_collect(
        out,
        {
            "l_returnflag": "object",
            "qty": "int64",
            "n": "int64",
            "rank": "int64",
            "dense_rank": "int64",
            "percent_rank_ppm": "int64",
        },
    )


ANALYTICS10_QUERIES["lineitem_qty_rank"] = q_lineitem_qty_rank
ANALYTICS10_ORACLES["lineitem_qty_rank"] = (
    "WITH c AS (SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS qty, "
    "CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1, 2) "
    "SELECT l_returnflag, qty, n, "
    "CAST(SUM(n) OVER (PARTITION BY l_returnflag ORDER BY qty) - n + 1 AS BIGINT) AS rank, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY qty) AS BIGINT) AS dense_rank, "
    "CAST(1000000 * (SUM(n) OVER (PARTITION BY l_returnflag ORDER BY qty) - n) "
    "// GREATEST(SUM(n) OVER (PARTITION BY l_returnflag) - 1, 1) AS BIGINT) AS percent_rank_ppm "
    "FROM c"
)


# ----------------------------------------------------------------------
# RFM segmentation on deterministic quintile tiles
# ----------------------------------------------------------------------
def q_customer_rfm(sf_dir):
    """RFM segmentation: per-customer (recency = latest epoch order
    day, frequency = order count, monetary = exact spend cents), three
    deterministic quintile tiles via the range-partitioned ROW_NUMBER
    (custkey tiebreak — NTILE's tie handling is row-order-dependent,
    this is not), tile = (5·rn + n − 1) // n, then segment counts."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                "day": t["o_orderdate"]
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[D]")
                .astype(np.int64),
                "spend_c": np.floor(
                    t["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
                ).astype(np.int64),
            }
        )
        g = df.groupby("o_custkey", as_index=False).agg(
            recency_day=("day", "max"), freq=("day", "size"), monetary_c=("spend_c", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_ck(t: pa.Table) -> np.ndarray:
        return mix64(t["o_custkey"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        ) & 0x7FFFFFFF

    def merge_ck(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("o_custkey", as_index=False).agg(
            recency_day=("recency_day", "max"),
            freq=("freq", "sum"),
            monetary_c=("monetary_c", "sum"),
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    cust = bucketed_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), bucket_ck, merge_ck
    ).materialize()  # per-customer metric table: three rank passes read it
    n = cust.count()

    ranked = grouped_row_number(
        cust, None, "recency_day", "o_custkey", rank_col="rr", num_range_buckets=4
    )
    ranked = grouped_row_number(
        ranked, None, "freq", "o_custkey", rank_col="rf", num_range_buckets=4
    )
    ranked = grouped_row_number(
        ranked, None, "monetary_c", "o_custkey", rank_col="rm", num_range_buckets=4
    )

    def tiles(t: pa.Table) -> pa.Table:
        def tile(col):
            rn = t[col].to_numpy(zero_copy_only=False)
            return (5 * rn + n - 1) // n

        df = pd.DataFrame(
            {"r_tile": tile("rr"), "f_tile": tile("rf"), "m_tile": tile("rm")}
        )
        g = df.groupby(["r_tile", "f_tile", "m_tile"], as_index=False).size()
        g["n_customers"] = g.pop("size").astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_seg(t: pa.Table) -> np.ndarray:
        packed = (
            t["r_tile"].to_numpy(zero_copy_only=False) * 100
            + t["f_tile"].to_numpy(zero_copy_only=False) * 10
            + t["m_tile"].to_numpy(zero_copy_only=False)
        )
        return mix64(packed).astype(np.int64) & 0x7FFFFFFF

    def merge_seg(g: pa.Table) -> pa.Table:
        df = (
            g.to_pandas()
            .groupby(["r_tile", "f_tile", "m_tile"], as_index=False)["n_customers"]
            .sum()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = bucketed_reduce(
        ranked.map_batches(tiles, batch_format="pyarrow"),
        bucket_seg,
        merge_seg,
        num_buckets=4,
    )
    return _typed_collect(
        out,
        {"r_tile": "int64", "f_tile": "int64", "m_tile": "int64", "n_customers": "int64"},
    )


ANALYTICS10_QUERIES["customer_rfm"] = q_customer_rfm
ANALYTICS10_ORACLES["customer_rfm"] = (
    "WITH m AS (SELECT o_custkey, "
    "CAST(max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS recency_day, "
    "CAST(count(*) AS BIGINT) AS freq, "
    "CAST(sum(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_c "
    "FROM orders GROUP BY 1), "
    "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m), "
    "r AS (SELECT "
    "ROW_NUMBER() OVER (ORDER BY recency_day, o_custkey) AS rr, "
    "ROW_NUMBER() OVER (ORDER BY freq, o_custkey) AS rf, "
    "ROW_NUMBER() OVER (ORDER BY monetary_c, o_custkey) AS rm FROM m) "
    "SELECT (5 * rr + nn.n - 1) // nn.n AS r_tile, "
    "(5 * rf + nn.n - 1) // nn.n AS f_tile, "
    "(5 * rm + nn.n - 1) // nn.n AS m_tile, "
    "CAST(count(*) AS BIGINT) AS n_customers "
    "FROM r CROSS JOIN nn GROUP BY 1, 2, 3"
)


def register_late(oracles: dict) -> None:
    """Oracles needing helpers from queries.py (imported at its tail —
    the _bowtie_sql circular-import device)."""
    oracles["copurchase_lift"] = _copurchase_lift_sql()
