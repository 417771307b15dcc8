"""Analytics batch (session 12, second wave): JSON source/sink
round-trip, an exact decision stump, and iterated function composition
by pointer doubling.

Distributed shapes:
- ``docs_json_roundtrip``: documents -> ``Dataset.write_json`` (one
  JSONL file per block, fresh /tmp dir) -> ``ray.data.read_json`` ->
  distributed 5-scalar aggregate including SUM(length(text)) — string
  escaping/unicode fidelity through the JSON hop is part of the hash.
  Together with ``rel_edges_csv_roundtrip`` this closes the text
  interchange formats the reference's binary-only loader lacks.
- ``lineitem_stump``: depth-1 decision tree (the boosting weak
  learner) predicting ``l_returnflag = 'R'`` from ``l_quantity``,
  split chosen by EXACT integer misclassification count: per-batch
  (quantity, pos, neg) partials fold via the bucketed sum (shuffle
  volume = distinct quantities, ~50 rows), the cumsum scan over the
  bounded histogram picks argmin(min(posL,negL) + min(posR,negR)),
  ties to the smallest threshold. All-integer — no impurity floats.
- ``rel_func_iter16``: f(v) = MIN outgoing neighbor over the distinct
  edge set (sinks fix f(v)=v); the query returns f^16 — computed with
  FOUR pointer-doubling rounds (g <- g∘g, each one bucketed hash
  self-join on the current pointer), the log-step iterated-composition
  primitive behind list ranking / tree rooting, vs the oracle's 16
  linear recursive-CTE steps.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import sum_by_key

ANALYTICS18_QUERIES: dict = {}
ANALYTICS18_ORACLES: dict = {}

FUNC_ITER_STEPS = 16  # 2^4: four doubling rounds


# ----------------------------------------------------------------------
# JSON source/sink round-trip
# ----------------------------------------------------------------------
def q_docs_json_roundtrip(sf_dir):
    """(n_docs, sum_doc_id, sum_n_chars, sum_text_len, sum_lang_len):
    the documents table written to JSONL and read back with
    ``ray.data.read_json``, then aggregated distributed. Unicode text
    must survive JSON escaping exactly for the hash to match."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "n_chars"],
    )
    out_dir = tempfile.mkdtemp(prefix="egr_json_", dir="/tmp")
    try:
        docs.write_json(out_dir)
        back = ray.data.read_json(out_dir)

        def partial(t: pa.Table) -> pa.Table:
            did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
            tlen = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
            llen = pc.utf8_length(t["lang"]).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "n_docs": pa.array([np.int64(len(did))], pa.int64()),
                    "sum_doc_id": pa.array([did.sum()], pa.int64()),
                    "sum_n_chars": pa.array([nch.sum()], pa.int64()),
                    "sum_text_len": pa.array([tlen.sum()], pa.int64()),
                    "sum_lang_len": pa.array([llen.sum()], pa.int64()),
                }
            )

        df = back.map_batches(partial, batch_format="pyarrow").to_pandas()
        out = df.sum().to_frame().T.astype("int64")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return _typed_collect(
        ray.data.from_pandas(out),
        {
            "n_docs": "int64",
            "sum_doc_id": "int64",
            "sum_n_chars": "int64",
            "sum_text_len": "int64",
            "sum_lang_len": "int64",
        },
    )


ANALYTICS18_QUERIES["docs_json_roundtrip"] = q_docs_json_roundtrip

ANALYTICS18_ORACLES["docs_json_roundtrip"] = (
    "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id, "
    "CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, "
    "CAST(SUM(length(text)) AS BIGINT) AS sum_text_len, "
    "CAST(SUM(length(lang)) AS BIGINT) AS sum_lang_len FROM documents"
)


# ----------------------------------------------------------------------
# decision stump (exact integer misclassification split)
# ----------------------------------------------------------------------
def q_lineitem_stump(sf_dir):
    """(threshold, misclassified, total): the depth-1 split
    ``l_quantity <= t`` minimizing exact misclassification count for
    the label ``l_returnflag = 'R'`` (each side predicts its majority
    class; ties toward the smallest t). The scan is over the bounded
    (quantity, pos, neg) histogram — the split search never sees rows."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_returnflag"],
    )

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.equal(t["l_returnflag"], "R").to_numpy(zero_copy_only=False)
        u, inv = np.unique(q, return_inverse=True)
        pos = np.bincount(inv, weights=y).astype(np.int64)
        neg = np.bincount(inv, weights=~y).astype(np.int64)
        return pa.table(
            {
                "q": pa.array(u, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "neg": pa.array(neg, pa.int64()),
            }
        )

    hist = (
        sum_by_key(li.map_batches(partial, batch_format="pyarrow"), "q", ["pos", "neg"])
        .to_pandas()
        .sort_values("q")
        .reset_index(drop=True)
    )
    cpos = hist["pos"].cumsum().to_numpy(np.int64)
    cneg = hist["neg"].cumsum().to_numpy(np.int64)
    tpos, tneg = int(cpos[-1]), int(cneg[-1])
    err = np.minimum(cpos, cneg) + np.minimum(tpos - cpos, tneg - cneg)
    best = int(np.argmin(err))  # np.argmin: first minimum = smallest t
    out = pd.DataFrame(
        {
            "threshold": [int(hist["q"].iloc[best])],
            "misclassified": [int(err[best])],
            "total": [tpos + tneg],
        }
    ).astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {"threshold": "int64", "misclassified": "int64", "total": "int64"},
    )


ANALYTICS18_QUERIES["lineitem_stump"] = q_lineitem_stump

ANALYTICS18_ORACLES["lineitem_stump"] = (
    "WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS q, "
    "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos, "
    "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS BIGINT) AS neg "
    "FROM lineitem GROUP BY 1), "
    "c AS (SELECT q, SUM(pos) OVER (ORDER BY q) AS cpos, "
    "SUM(neg) OVER (ORDER BY q) AS cneg, "
    "(SELECT SUM(pos) FROM h) AS tpos, (SELECT SUM(neg) FROM h) AS tneg FROM h) "
    "SELECT CAST(q AS BIGINT) AS threshold, "
    "CAST(LEAST(cpos, cneg) + LEAST(tpos - cpos, tneg - cneg) AS BIGINT) AS misclassified, "
    "CAST(tpos + tneg AS BIGINT) AS total "
    "FROM c ORDER BY misclassified, q LIMIT 1"
)


# ----------------------------------------------------------------------
# iterated function composition (pointer doubling)
# ----------------------------------------------------------------------
def q_rel_func_iter16(sf_dir):
    """(v, f16): the vertex reached from v after 16 steps of
    f(v) = MIN outgoing neighbor (distinct edges; sinks stay put).
    Four pointer-doubling self-joins instead of 16 sequential hops —
    the O(log k) iterated-composition primitive."""
    from everythinggraph_ray.pipelines.queries import _typed_collect, rel_edges

    e = rel_edges(sf_dir)

    def min_dst(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(s, return_inverse=True)
        m = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(m, inv, d)
        return pa.table({"v": pa.array(u, pa.int64()), "fv": pa.array(m, pa.int64())})

    # fold per-batch minima to global f via the keyed min (sum_by_key is
    # sum-only: reuse the same bucketed shape with a min reducer)
    from everythinggraph_ray.stages.agg import bucketed_reduce, mix64

    def v_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["v"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def min_red(g: pa.Table) -> pa.Table:
        v = g["v"].to_numpy(zero_copy_only=False)
        f = g["fv"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(v, return_inverse=True)
        m = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(m, inv, f)
        return pa.table({"v": pa.array(u, pa.int64()), "fv": pa.array(m, pa.int64())})

    f = bucketed_reduce(
        e.map_batches(min_dst, batch_format="pyarrow"), v_bucket, min_red
    )

    # totalize over the vertex universe (sinks: f(v) = v)
    def verts(t: pa.Table) -> pa.Table:
        vs = np.unique(
            np.r_[
                t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False),
            ]
        )
        return pa.table({"v": pa.array(vs, pa.int64())})

    univ = bucketed_reduce(
        e.map_batches(verts, batch_format="pyarrow"),
        v_bucket,
        lambda g: pa.table(
            {"v": pa.array(np.unique(g["v"].to_numpy(zero_copy_only=False)), pa.int64())}
        ),
    )
    g = hash_join(univ, f, on="v", right_cols=["fv"], how="left").map_batches(
        lambda t: pa.table(
            {
                "v": t["v"],
                "cur": pc.coalesce(t["fv"], t["v"]),
            }
        ),
        batch_format="pyarrow",
    )

    # pointer doubling: cur <- g(cur), four times => f^16. g feeds BOTH
    # sides of each join, so without a lineage cut the plan DAG doubles
    # per round (2^4 re-executions of the base) — sever() each round
    from everythinggraph_ray.stages.agg import sever

    g = sever(g)
    for _ in range(4):
        nxt = g.map_batches(
            lambda t: pa.table({"v2": t["v"], "cur2": t["cur"]}), batch_format="pyarrow"
        )
        g = sever(
            hash_join(
                g, nxt, on="cur", right_on="v2", right_cols=["cur2"]
            ).map_batches(
                lambda t: pa.table({"v": t["v"], "cur": t["cur2"]}),
                batch_format="pyarrow",
            )
        )

    out = g.map_batches(
        lambda t: pa.table({"v": t["v"], "f16": t["cur"]}), batch_format="pyarrow"
    )
    return _typed_collect(out, {"v": "int64", "f16": "int64"})


ANALYTICS18_QUERIES["rel_func_iter16"] = q_rel_func_iter16


def _func_iter_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    return (
        f"WITH RECURSIVE e AS (SELECT src, dst FROM ({SQL_REL_EDGES})), "
        "f AS (SELECT src AS v, MIN(dst) AS fv FROM e GROUP BY src), "
        "univ AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e "
        "UNION ALL SELECT dst AS v FROM e)), "
        "tot AS (SELECT u.v, COALESCE(f.fv, u.v) AS fv FROM univ u "
        "LEFT JOIN f ON f.v = u.v), "
        "it AS (SELECT v, v AS cur, 0 AS k FROM tot "
        "UNION ALL "
        f"SELECT i.v, t.fv AS cur, i.k + 1 FROM it i JOIN tot t ON t.v = i.cur "
        f"WHERE i.k < {FUNC_ITER_STEPS}) "
        f"SELECT CAST(v AS BIGINT) AS v, CAST(cur AS BIGINT) AS f16 "
        f"FROM it WHERE k = {FUNC_ITER_STEPS}"
    )


ANALYTICS18_ORACLES["rel_func_iter16"] = _func_iter_sql()
