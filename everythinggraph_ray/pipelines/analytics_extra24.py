"""Analytics batch (session 12, eighth wave): largest-remainder
apportionment, Eulerian-path feasibility, and canonical Huffman code
lengths.

Distributed shapes:
- ``mktsegment_seats``: 1000 "seats" apportioned to market segments by
  revenue share with the LARGEST-REMAINDER (Hare quota) method — the
  proportional-allocation arithmetic of shard/budget splitting, exact:
  floor quotas in integers, remainders compared as
  1000·rev − floor·total (never a float), ties to segment name.
  Revenue folds via the repo's broadcast customer join (small side
  ray.put once).
- ``rel_euler_check``: Eulerian-path feasibility of the rel digraph —
  per-vertex out−in imbalances (two bucketed degree sums + full-outer
  join) and weak-connectivity component count (the distributed
  WCCKernel over the undirected build, reused), reduced to the classic
  certificate: one component AND (all balanced OR exactly one +1 and
  one −1, none worse).
- ``docs_huffman_lengths``: canonical Huffman code lengths for the 32
  most frequent corpus tokens — token counts fold distributed (the
  top_tokens combiner), the 32-leaf merge runs on the driver with a
  deterministic (weight, creation-order) tie rule. Rows-only (priority
  queues have no SQL); pytests replay serially and assert the Kraft
  equality Σ2^−len = 1 and count-monotone lengths.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import sum_by_key

ANALYTICS24_QUERIES: dict = {}
ANALYTICS24_ORACLES: dict = {}

SEATS = 1000
HUFF_K = 32


# ----------------------------------------------------------------------
# largest-remainder apportionment
# ----------------------------------------------------------------------
def q_mktsegment_seats(sf_dir):
    """(segment, seats): SEATS apportioned to segments by revenue-milli
    share, Hare quota + largest remainder, remainder ties to name."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_of = ray.put(
        dict(zip(cust["c_custkey"].astype(np.int64), cust["c_mktsegment"]))
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        m = ray.get(seg_of)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        segs = pd.Series(ck).map(m)
        df = pd.DataFrame({"segment": segs, "rev": rev}).groupby(
            "segment", as_index=False
        )["rev"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    r = (
        orders.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("segment", as_index=False)["rev"]
        .sum()
        .sort_values("segment")
        .reset_index(drop=True)
    )
    tot = int(r["rev"].sum())
    rev = r["rev"].to_numpy(np.int64)
    fl = SEATS * rev // tot
    rem = SEATS * rev - fl * tot
    leftover = SEATS - int(fl.sum())
    order = np.lexsort((r["segment"].to_numpy(object), -rem))
    seats = fl.copy()
    seats[order[:leftover]] += 1
    out = pd.DataFrame({"segment": r["segment"], "seats": seats.astype(np.int64)})
    return _typed_collect(
        ray.data.from_pandas(out), {"segment": "object", "seats": "int64"}
    )


ANALYTICS24_QUERIES["mktsegment_seats"] = q_mktsegment_seats

ANALYTICS24_ORACLES["mktsegment_seats"] = (
    "WITH r AS (SELECT c_mktsegment AS seg, "
    "SUM(CAST(FLOOR(o_totalprice * 1000 + 0.5) AS BIGINT)) AS rev "
    "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1), "
    "t AS (SELECT SUM(rev) AS tot FROM r), "
    f"q AS (SELECT seg, rev, ({SEATS} * rev) // tot AS fl, "
    f"{SEATS} * rev - (({SEATS} * rev) // tot) * tot AS rem FROM r, t), "
    f"k AS (SELECT {SEATS} - SUM(fl) AS leftover FROM q), "
    "rk AS (SELECT seg, fl, ROW_NUMBER() OVER (ORDER BY rem DESC, seg) AS rn FROM q) "
    "SELECT seg AS segment, CAST(fl + CASE WHEN rn <= (SELECT leftover FROM k) "
    "THEN 1 ELSE 0 END AS BIGINT) AS seats FROM rk"
)


# ----------------------------------------------------------------------
# Eulerian-path feasibility
# ----------------------------------------------------------------------
def q_rel_euler_check(sf_dir):
    """One row (n_pos, n_neg, n_bad, n_comp, has_euler_path): digraph
    Euler-path certificate — degree imbalances + weak connectivity."""
    from everythinggraph_ray.graph.kernels import WCCKernel
    from everythinggraph_ray.pipelines.queries import (
        _rel_build,
        _run_engine,
        _typed_collect,
        rel_edges,
    )

    e = rel_edges(sf_dir)

    def deg_partial(col: str):
        def f(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            u, cnt = np.unique(v, return_counts=True)
            return pa.table(
                {"v": pa.array(u, pa.int64()), "d": pa.array(cnt.astype(np.int64))}
            )

        return f

    outd = sum_by_key(
        e.map_batches(deg_partial("src"), batch_format="pyarrow"), "v", ["d"],
        out_names=["outd"],
    )
    ind = sum_by_key(
        e.map_batches(deg_partial("dst"), batch_format="pyarrow"), "v", ["d"],
        out_names=["ind"],
    )
    both = hash_join(outd, ind, on="v", right_cols=["ind"], how="full")

    def imbalance(t: pa.Table) -> pa.Table:
        x = np.nan_to_num(
            t["outd"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        y = np.nan_to_num(
            t["ind"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        diff = x - y
        return pa.table(
            {
                "n_pos": pa.array([np.int64((diff == 1).sum())], pa.int64()),
                "n_neg": pa.array([np.int64((diff == -1).sum())], pa.int64()),
                "n_bad": pa.array([np.int64((np.abs(diff) > 1).sum())], pa.int64()),
            }
        )

    imb = both.map_batches(imbalance, batch_format="pyarrow").to_pandas().sum()
    n_pos, n_neg, n_bad = int(imb["n_pos"]), int(imb["n_neg"]), int(imb["n_bad"])

    wcc = _run_engine(_rel_build(sf_dir, undirect=True), WCCKernel())
    n_comp = int(wcc["wcc"].nunique())

    has = int(
        n_comp == 1
        and n_bad == 0
        and ((n_pos == 0 and n_neg == 0) or (n_pos == 1 and n_neg == 1))
    )
    out = pd.DataFrame(
        {
            "n_pos": [n_pos],
            "n_neg": [n_neg],
            "n_bad": [n_bad],
            "n_comp": [n_comp],
            "has_euler_path": [has],
        }
    ).astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {
            "n_pos": "int64",
            "n_neg": "int64",
            "n_bad": "int64",
            "n_comp": "int64",
            "has_euler_path": "int64",
        },
    )


ANALYTICS24_QUERIES["rel_euler_check"] = q_rel_euler_check


def _euler_sql() -> str:
    from everythinggraph_ray.pipelines.queries import _sql_graph_prelude

    return (
        "WITH RECURSIVE "
        + _sql_graph_prelude(undirect=True)
        + ", r(vid, lab) AS (SELECT vid, vid FROM verts UNION "
        "SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v), "
        "comp AS (SELECT count(DISTINCT c) AS n FROM "
        "(SELECT vid, min(lab) AS c FROM r GROUP BY vid)), "
        "o AS (SELECT src AS v, count(*) AS outd FROM e GROUP BY 1), "
        "i AS (SELECT dst AS v, count(*) AS ind FROM e GROUP BY 1), "
        "d AS (SELECT COALESCE(o.outd, 0) - COALESCE(i.ind, 0) AS diff "
        "FROM o FULL OUTER JOIN i USING (v)), "
        "s AS (SELECT CAST(SUM(CASE WHEN diff = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos, "
        "CAST(SUM(CASE WHEN diff = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg, "
        "CAST(SUM(CASE WHEN abs(diff) > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad FROM d) "
        "SELECT s.n_pos, s.n_neg, s.n_bad, CAST(comp.n AS BIGINT) AS n_comp, "
        "CAST(CASE WHEN comp.n = 1 AND s.n_bad = 0 AND "
        "((s.n_pos = 0 AND s.n_neg = 0) OR (s.n_pos = 1 AND s.n_neg = 1)) "
        "THEN 1 ELSE 0 END AS BIGINT) AS has_euler_path FROM s, comp"
    )


ANALYTICS24_ORACLES["rel_euler_check"] = _euler_sql()


# ----------------------------------------------------------------------
# canonical Huffman code lengths (top-K corpus tokens)
# ----------------------------------------------------------------------
def huffman_lengths(pairs: list[tuple[str, int]]) -> dict[str, int]:
    """Code length per symbol; merges take the two smallest
    (weight, seq) nodes, merged nodes get the next seq — deterministic
    for any input order. Single-symbol corpora get length 1."""
    if not pairs:
        return {}
    if len(pairs) == 1:
        return {pairs[0][0]: 1}
    # nodes: (weight, seq, symbols)
    nodes = [(w, i, [s]) for i, (s, w) in enumerate(sorted(pairs))]
    seq = len(nodes)
    depth: dict[str, int] = {s: 0 for s, _ in pairs}
    import heapq

    heap = [(w, i, syms) for w, i, syms in nodes]
    heapq.heapify(heap)
    while len(heap) > 1:
        w1, _, s1 = heapq.heappop(heap)
        w2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (w1 + w2, seq, s1 + s2))
        seq += 1
    return depth


def q_docs_huffman_lengths(sf_dir):
    """(token, cnt, code_len): canonical Huffman lengths for the top-32
    corpus tokens (counts fold distributed; bounded merge on driver)."""
    from everythinggraph_ray.datapipe.text import top_tokens
    from everythinggraph_ray.pipelines.queries import _typed_collect

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    top = top_tokens(docs, k=HUFF_K).to_pandas()
    tok_col = "token" if "token" in top.columns else top.columns[0]
    cnt_col = [c for c in top.columns if c != tok_col][0]
    pairs = list(zip(top[tok_col], top[cnt_col].astype(int)))
    depth = huffman_lengths(pairs)
    out = pd.DataFrame(
        {
            "token": top[tok_col],
            "cnt": top[cnt_col].astype("int64"),
            "code_len": [depth[t] for t in top[tok_col]],
        }
    )
    out["code_len"] = out["code_len"].astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {"token": "object", "cnt": "int64", "code_len": "int64"},
    )


ANALYTICS24_QUERIES["docs_huffman_lengths"] = q_docs_huffman_lengths
# no SQL oracle: Huffman's priority-queue merge has no SQL form; serial
# replay + Kraft equality + count-monotone length pytests.
