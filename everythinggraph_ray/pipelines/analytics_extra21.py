"""Analytics batch (session 12, fifth wave): zlib compression-ratio
quality signal, novel-5-gram decontamination stats, and vertex-level
in/out-degree correlation moments.

Distributed shapes:
- ``docs_compression_ratio``: per-doc deflate ratio (zlib level 6,
  raw/compressed in ppm) — the classic Gopher/CCNet repetition-and-
  boilerplate curation signal. Pure per-batch map (zlib is
  deterministic for a fixed level); no shuffle at all. Rows-only
  (SQL has no deflate); serial-replay + monotonicity pytests.
- ``docs_novel_5grams``: per doc, how many of its DISTINCT word
  5-grams first appear in THIS doc (min doc_id owns the gram) — the
  novelty/leakage profile of a corpus in doc_id order. Grams key by
  63-bit md5; per-gram first-doc via a bucketed min, ownership rides
  back on a gram-key hash join, per-doc counts via the bucketed sum.
  Shuffle volume = distinct (doc, gram) pairs.
- ``rel_inout_degree_moments``: the six exact integer moments (n, Σx,
  Σy, Σxy, Σx², Σy²) of (out-degree, in-degree) across the vertex
  universe — the vertex-level complement of edge-level assortativity;
  correlation is a driver-side division the caller does, keeping the
  query all-integer/hashable. Two bucketed degree sums + one join +
  a 6-scalar fold.
"""

from __future__ import annotations

import hashlib
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import (
    bucketed_reduce,
    mix64,
    sum_by_key,
    sum_by_key_pair,
)

ANALYTICS21_QUERIES: dict = {}
ANALYTICS21_ORACLES: dict = {}

MASK63 = 0x7FFFFFFFFFFFFFFF
ZLIB_LEVEL = 6
NGRAM_N = 5


# ----------------------------------------------------------------------
# compression ratio (deflate) quality signal
# ----------------------------------------------------------------------
def q_docs_compression_ratio(sf_dir):
    """(doc_id, raw_len, comp_len, ratio_ppm): utf-8 byte length,
    zlib-level-6 compressed length, and raw*1e6//comp. High ratio =
    repetitive/templated text (the curation filter's cut signal)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def ratios(t: pa.Table) -> pa.Table:
        ids, raw, comp = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            b = txt.encode("utf-8")
            ids.append(did)
            raw.append(len(b))
            comp.append(len(zlib.compress(b, ZLIB_LEVEL)))
        r = np.array(raw, np.int64)
        c = np.array(comp, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "raw_len": pa.array(r, pa.int64()),
                "comp_len": pa.array(c, pa.int64()),
                "ratio_ppm": pa.array(
                    np.where(c > 0, (r * 1_000_000) // np.maximum(c, 1), 0), pa.int64()
                ),
            }
        )

    return _typed_collect(
        docs.map_batches(ratios, batch_format="pyarrow"),
        {"doc_id": "int64", "raw_len": "int64", "comp_len": "int64", "ratio_ppm": "int64"},
    )


ANALYTICS21_QUERIES["docs_compression_ratio"] = q_docs_compression_ratio
# no SQL oracle: DuckDB has no deflate; exactness via serial-replay pytest
# (zlib output is deterministic for a fixed level within one runtime).


# ----------------------------------------------------------------------
# novel 5-grams per doc (first-appearance ownership)
# ----------------------------------------------------------------------
def _gram_keys(text: str) -> np.ndarray:
    """Distinct 63-bit md5 keys of the doc's word 5-grams (words =
    single-space split, mirroring the oracle's string_split)."""
    ws = text.split(" ")
    if len(ws) < NGRAM_N:
        return np.empty(0, np.int64)
    grams = {" ".join(ws[i : i + NGRAM_N]) for i in range(len(ws) - NGRAM_N + 1)}
    return np.array(
        [
            int.from_bytes(hashlib.md5(g.encode()).digest()[8:16], "little") & MASK63
            for g in grams
        ],
        np.int64,
    )


def q_docs_novel_5grams(sf_dir):
    """(doc_id, n_grams, n_novel): distinct word 5-grams per doc and how
    many of them have this doc as their MINIMUM doc_id (first
    appearance in corpus order)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def doc_grams(t: pa.Table) -> pa.Table:
        ids, keys = [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ks = _gram_keys(txt)
            ids.extend([did] * len(ks))
            keys.extend(ks.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "gram": pa.array(keys, pa.int64()),
                "one": pa.array(np.ones(len(ids), np.int64)),
            }
        )

    # distinct (doc, gram) — grams are already distinct within a doc,
    # but the pair reduce also co-locates for the downstream joins
    pairs = sum_by_key_pair(
        docs.map_batches(doc_grams, batch_format="pyarrow"), "gram", "doc_id", ["one"]
    ).map_batches(
        lambda t: pa.table({"gram": t["gram"], "doc_id": t["doc_id"]}),
        batch_format="pyarrow",
    ).materialize()  # reused: min-owner pass AND ownership join

    def g_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["gram"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def min_owner(g: pa.Table) -> pa.Table:
        gr = g["gram"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(gr, return_inverse=True)
        m = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(m, inv, d)
        return pa.table(
            {"gram": pa.array(u, pa.int64()), "first_doc": pa.array(m, pa.int64())}
        )

    owners = bucketed_reduce(pairs, g_bucket, min_owner)

    joined = hash_join(pairs, owners, on="gram", right_cols=["first_doc"])

    def tag(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        f = t["first_doc"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pa.array(np.ones(len(d), np.int64)),
                "n_novel": pa.array((d == f).astype(np.int64), pa.int64()),
            }
        )

    res = sum_by_key(
        joined.map_batches(tag, batch_format="pyarrow"), "doc_id", ["n_grams", "n_novel"]
    )
    return _typed_collect(
        res, {"doc_id": "int64", "n_grams": "int64", "n_novel": "int64"}
    )


ANALYTICS21_QUERIES["docs_novel_5grams"] = q_docs_novel_5grams

ANALYTICS21_ORACLES["docs_novel_5grams"] = (
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "mx AS (SELECT COALESCE(MAX(len(ws)), 0) AS m FROM w), "
    f"g AS (SELECT DISTINCT doc_id, array_to_string(ws[u.i:u.i+{NGRAM_N - 1}], ' ') AS gram "
    "FROM w JOIN (SELECT unnest(range(1, (SELECT m FROM mx) + 1)) AS i) u "
    f"ON u.i <= len(ws) - {NGRAM_N - 1}), "
    "m AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram) "
    "SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
    "CAST(SUM(CASE WHEN m.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel "
    "FROM g JOIN m USING (gram) GROUP BY g.doc_id"
)


# ----------------------------------------------------------------------
# in/out-degree correlation moments (vertex level, all-integer)
# ----------------------------------------------------------------------
def q_rel_inout_degree_moments(sf_dir):
    """One row (n, sum_out, sum_in, sum_prod, sum_out2, sum_in2) over
    the vertex universe of the rel digraph (degrees count multi-edges;
    absent direction = 0). Pearson r is a driver-side division."""
    from everythinggraph_ray.pipelines.queries import _typed_collect, rel_edges

    e = rel_edges(sf_dir)

    def deg_partial(col: str):
        def f(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            u, cnt = np.unique(v, return_counts=True)
            return pa.table(
                {"v": pa.array(u, pa.int64()), "d": pa.array(cnt.astype(np.int64))}
            )

        return f

    outd = sum_by_key(e.map_batches(deg_partial("src"), batch_format="pyarrow"), "v", ["d"], out_names=["outd"])
    ind = sum_by_key(e.map_batches(deg_partial("dst"), batch_format="pyarrow"), "v", ["d"], out_names=["ind"])
    both = hash_join(outd, ind, on="v", right_cols=["ind"], how="full")

    def moments(t: pa.Table) -> pa.Table:
        x = np.nan_to_num(
            t["outd"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        y = np.nan_to_num(
            t["ind"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([np.int64(len(x))], pa.int64()),
                "sum_out": pa.array([x.sum()], pa.int64()),
                "sum_in": pa.array([y.sum()], pa.int64()),
                "sum_prod": pa.array([(x * y).sum()], pa.int64()),
                "sum_out2": pa.array([(x * x).sum()], pa.int64()),
                "sum_in2": pa.array([(y * y).sum()], pa.int64()),
            }
        )

    df = both.map_batches(moments, batch_format="pyarrow").to_pandas()
    out = df.sum().to_frame().T.astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {
            "n": "int64",
            "sum_out": "int64",
            "sum_in": "int64",
            "sum_prod": "int64",
            "sum_out2": "int64",
            "sum_in2": "int64",
        },
    )


ANALYTICS21_QUERIES["rel_inout_degree_moments"] = q_rel_inout_degree_moments


def _moments_sql() -> str:
    from everythinggraph_ray.pipelines.queries import SQL_REL_EDGES

    return (
        f"WITH e AS ({SQL_REL_EDGES}), "
        "o AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS outd FROM e GROUP BY src), "
        "i AS (SELECT dst AS v, CAST(count(*) AS BIGINT) AS ind FROM e GROUP BY dst), "
        "b AS (SELECT COALESCE(o.outd, 0) AS x, COALESCE(i.ind, 0) AS y "
        "FROM o FULL OUTER JOIN i USING (v)) "
        "SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sum_out, "
        "CAST(SUM(y) AS BIGINT) AS sum_in, CAST(SUM(x * y) AS BIGINT) AS sum_prod, "
        "CAST(SUM(x * x) AS BIGINT) AS sum_out2, CAST(SUM(y * y) AS BIGINT) AS sum_in2 "
        "FROM b"
    )


ANALYTICS21_ORACLES["rel_inout_degree_moments"] = _moments_sql()
