"""Analytics batch (session 9, fourth wave): Heaps vocabulary-growth
curve, TPC-H Q20-lite excess suppliers, Simpson lexical diversity,
cross-lingual vocabulary overlap, and the basket-size histogram.

Each is a (ray_fn, oracle_sql) pair on queries.py's exactness
discipline: integer surfaces throughout (the Simpson index is an exact
rational scaled to ppb in arbitrary-precision integers — Python ints on
the Ray side, HUGEINT in DuckDB — before ONE truncating division).

Distributed shapes:
- ``docs_heaps_curve``: per-token FIRST document via a token-bucketed
  min fold; the growth curve is evaluated only at power-of-two doc
  prefixes, so the driver sees O(log D) rows (per-batch bit-length
  bincounts + one cumsum), never the vocabulary.
- ``q20_excess_suppliers``: (part, supplier) quantity sums via the
  pair-keyed reduce, per-part totals attached with the bucketed
  ``hash_join``, the 30%-share gate is the integer cross-multiply
  (10·qty_ps > 3·qty_p), then a supplier count + constant-group top-20.
- ``docs_simpson``: per-(lang, token) exact counts (the lang-entropy
  routing) folded to per-lang (N, Σc(c−1)); Simpson's index is one
  exact integer division per language.
- ``docs_vocab_overlap``: token → language BITMASK (langs are a tiny
  driver-known set) OR-folded per bucket; every language pair's
  intersection/union counts ride per-batch popcount partials — the
  cross-lingual contamination signal, output is |langs|² rows.
- ``orders_basket_hist``: per-order line counts then count-of-counts,
  two chained ``sum_by_key`` passes.
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
    sum_by_key,
    sum_by_key_pair,
)

ANALYTICS6_QUERIES: dict = {}
ANALYTICS6_ORACLES: dict = {}


def _token_bucket(tokens) -> np.ndarray:
    from everythinggraph_ray.stages.agg import string_buckets

    return string_buckets(tokens)


# ----------------------------------------------------------------------
# Heaps' law: vocabulary growth at power-of-two document prefixes
# ----------------------------------------------------------------------
def q_docs_heaps_curve(sf_dir):
    """Vocabulary growth V(T) = distinct tokens seen in the first T
    documents (by doc_id), evaluated at T = 1, 2, 4, … up to the first
    power of two covering the corpus — Heaps' law says V ~ T^β. The
    curve needs only each token's FIRST doc (a bucketed min), and the
    power-of-two evaluation folds to bit-length bincounts, so the
    driver holds O(log D) integers."""
    import re as _re

    from everythinggraph_ray.datapipe.text import WORD_RE

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        rx = _re.compile(WORD_RE)
        first: dict[str, int] = {}
        for did, t in zip(
            batch["doc_id"].to_pylist(), pc.utf8_lower(batch["text"]).to_pylist()
        ):
            for w in rx.findall(t or ""):
                if w not in first or did < first[w]:
                    first[w] = did
        return pa.table(
            {
                "token": pa.array(list(first.keys()), pa.string()),
                "first_doc": pa.array(list(first.values()), pa.int64()),
            }
        )

    def min_fold(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("token", as_index=False)["first_doc"].min()
        return pa.Table.from_pandas(df, preserve_index=False)

    firsts = bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"),
        lambda b: _token_bucket(b["token"]),
        min_fold,
    )

    def bit_hist(t: pa.Table) -> pa.Table:
        fd = t["first_doc"].to_numpy(zero_copy_only=False)
        # j = bit_length(first_doc): token becomes visible at T = 2^j
        j = np.zeros(len(fd), np.int64)
        nz = fd > 0
        j[nz] = np.floor(np.log2(fd[nz])).astype(np.int64) + 1
        u, cnt = np.unique(j, return_counts=True)
        return pa.table(
            {"j": pa.array(u, pa.int64()), "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    hist = (
        sum_by_key(firsts.map_batches(bit_hist, batch_format="pyarrow"), "j", ["c"])
        .to_pandas()
        .sort_values("j")
    )
    # D from the documents table (not the token table: empty docs count)
    dmax = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).max("doc_id")
    D = int(dmax) + 1
    kmax = 0
    while (1 << kmax) < D:
        kmax += 1
    full = np.zeros(kmax + 1, np.int64)
    for j, c in zip(hist["j"], hist["c"]):
        if j <= kmax:
            full[int(j)] += int(c)
    vocab = np.cumsum(full)
    return pd.DataFrame(
        {"t": [1 << k for k in range(kmax + 1)], "vocab": vocab}
    ).astype("int64")


SQL_HEAPS = (
    "WITH f AS (SELECT t, min(doc_id) AS first_doc FROM "
    "(SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t "
    "FROM documents) GROUP BY t), "
    "d AS (SELECT max(doc_id) + 1 AS d FROM documents), "
    "ks AS (SELECT range AS k FROM range(0, 62) "
    "WHERE range = 0 OR (CAST(1 AS BIGINT) << (range - 1)) < (SELECT d FROM d)) "
    "SELECT CAST((CAST(1 AS BIGINT) << k) AS BIGINT) AS t, "
    "(SELECT CAST(count(*) AS BIGINT) FROM f WHERE f.first_doc < "
    "(CAST(1 AS BIGINT) << ks.k)) AS vocab FROM ks ORDER BY 1"
)

ANALYTICS6_QUERIES["docs_heaps_curve"] = q_docs_heaps_curve
ANALYTICS6_ORACLES["docs_heaps_curve"] = SQL_HEAPS


# ----------------------------------------------------------------------
# TPC-H Q20-lite: suppliers concentrating > 30% of a part's volume
# ----------------------------------------------------------------------
Q20_TOP = 20


def q_q20_excess_suppliers(sf_dir):
    """Q20's shape on this schema: a supplier holds EXCESS share of a
    part when their lineitem quantity exceeds 15% of that part's total
    (strict, integer cross-multiply on exact quantity cents:
    100·qty_ps > 15·qty_p). Count such parts per supplier, top 20
    (count desc, suppkey asc)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey", "l_suppkey", "l_quantity"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        qc = np.floor(batch["l_quantity"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "part": batch["l_partkey"],
                "supp": batch["l_suppkey"],
                "qty_c": pa.array(qc, pa.int64()),
            }
        )

    ps = sum_by_key_pair(
        li.map_batches(partial, batch_format="pyarrow"), "part", "supp", ["qty_c"]
    )
    ptot = sum_by_key(
        ps.map_batches(
            lambda t: pa.table({"part": t["part"], "tot_c": t["qty_c"]}), batch_format="pyarrow"
        ),
        "part",
        ["tot_c"],
    )
    j = hash_join(ps, ptot, on="part", right_cols=["tot_c"])

    def gate(t: pa.Table) -> pa.Table:
        keep = 100 * t["qty_c"].to_numpy(zero_copy_only=False) > 15 * t["tot_c"].to_numpy(
            zero_copy_only=False
        )
        g = t.filter(pa.array(keep))
        s = g["supp"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(s, return_counts=True)
        return pa.table(
            {
                "suppkey": pa.array(u, pa.int64()),
                "n_parts": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    per_supp = sum_by_key(j.map_batches(gate, batch_format="pyarrow"), "suppkey", ["n_parts"])
    g0 = per_supp.map_batches(
        lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())),
        batch_format="pyarrow",
    )
    top = grouped_top_k(g0, "g", [("n_parts", False), ("suppkey", True)], Q20_TOP)
    df = top.to_pandas()
    if not len(df):
        return pd.DataFrame({"suppkey": [], "n_parts": []}).astype("int64")
    return (
        df[["suppkey", "n_parts"]]
        .sort_values(["n_parts", "suppkey"], ascending=[False, True])
        .reset_index(drop=True)
        .astype("int64")
    )


SQL_Q20 = (
    "WITH ps AS (SELECT l_partkey AS part, l_suppkey AS supp, "
    "CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c "
    "FROM lineitem GROUP BY 1, 2), "
    "pt AS (SELECT part, CAST(sum(qty_c) AS BIGINT) AS tot_c FROM ps GROUP BY 1), "
    "hit AS (SELECT supp FROM ps JOIN pt ON pt.part = ps.part "
    "WHERE 100 * ps.qty_c > 15 * pt.tot_c) "
    "SELECT CAST(supp AS BIGINT) AS suppkey, CAST(count(*) AS BIGINT) AS n_parts "
    f"FROM hit GROUP BY 1 ORDER BY n_parts DESC, suppkey ASC LIMIT {Q20_TOP}"
)

ANALYTICS6_QUERIES["q20_excess_suppliers"] = q_q20_excess_suppliers
ANALYTICS6_ORACLES["q20_excess_suppliers"] = SQL_Q20


# ----------------------------------------------------------------------
# Simpson lexical diversity per language (exact rational, ppb)
# ----------------------------------------------------------------------
def q_docs_simpson(sf_dir):
    """Simpson's diversity index per language: the probability two
    token draws (without replacement) are the SAME word, simpson_ppb =
    10⁹·Σc(c−1) // (N(N−1)) over exact counts — the repetition twin of
    docs_lang_entropy. The big products run in Python-int object math
    (HUGEINT on the SQL side), so no int64 overflow at any corpus
    size."""
    import re as _re

    from everythinggraph_ray.datapipe.text import WORD_RE

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        rx = _re.compile(WORD_RE)
        cnt: dict[tuple[str, str], int] = {}
        for lg, t in zip(batch["lang"].to_pylist(), pc.utf8_lower(batch["text"]).to_pylist()):
            for w in rx.findall(t or ""):
                cnt[(lg, w)] = cnt.get((lg, w), 0) + 1
        ks = list(cnt.keys())
        return pa.table(
            {
                "lang": pa.array([a for a, _ in ks], pa.string()),
                "token": pa.array([b for _, b in ks], pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["lang", "token"], as_index=False)["c"].sum()
        n = df["c"].to_numpy(np.int64)
        out = (
            pd.DataFrame({"lang": df["lang"], "n": n, "cc": n * (n - 1)})
            .groupby("lang", as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"),
        lambda b: _token_bucket(b["token"]),
        red,
    ).to_pandas()
    g = parts.groupby("lang", as_index=False).sum()
    rows = []
    for lang, n, cc in zip(g["lang"], g["n"], g["cc"]):
        n, cc = int(n), int(cc)
        ppb = (10**9 * cc) // (n * (n - 1)) if n > 1 else 0
        rows.append({"lang": lang, "n_tokens": n, "sum_cc": cc, "simpson_ppb": ppb})
    return (
        pd.DataFrame(rows)
        .sort_values("lang")
        .reset_index(drop=True)
        .astype({"lang": "string", "n_tokens": "int64", "sum_cc": "int64", "simpson_ppb": "int64"})
    )


SQL_SIMPSON = (
    "WITH tok AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t "
    "FROM documents), "
    "c AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2), "
    "s AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, "
    "CAST(sum(c * (c - 1)) AS BIGINT) AS sum_cc FROM c GROUP BY 1) "
    "SELECT lang, n_tokens, sum_cc, "
    "CAST(CASE WHEN n_tokens > 1 THEN CAST(1000000000 AS HUGEINT) * sum_cc // "
    "(CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) ELSE 0 END AS BIGINT) AS simpson_ppb "
    "FROM s"
)

ANALYTICS6_QUERIES["docs_simpson"] = q_docs_simpson
ANALYTICS6_ORACLES["docs_simpson"] = SQL_SIMPSON


# ----------------------------------------------------------------------
# Cross-lingual vocabulary overlap (pairwise Jaccard over vocabularies)
# ----------------------------------------------------------------------
def q_docs_vocab_overlap(sf_dir):
    """Vocabulary Jaccard for every language pair — shared tokens are
    the cross-lingual contamination signal (numbers, names, code).
    Languages are a tiny driver-known set; each token folds to ONE
    bitmask row (bucketed OR), pair intersection/union counts ride
    per-batch popcount partials. Output (lang_a, lang_b, n_common,
    n_union, jaccard_ppm) for a < b."""
    import re as _re

    from everythinggraph_ray.datapipe.text import WORD_RE

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )
    langs = sorted(
        docs.map_batches(
            lambda t: pa.table({"lang": pc.unique(t["lang"])}), batch_format="pyarrow"
        )
        .to_pandas()["lang"]
        .unique()
    )
    idx = {l: i for i, l in enumerate(langs)}

    def partial(batch: pa.Table) -> pa.Table:
        rx = _re.compile(WORD_RE)
        mask: dict[str, int] = {}
        for lg, t in zip(batch["lang"].to_pylist(), pc.utf8_lower(batch["text"]).to_pylist()):
            bit = 1 << idx[lg]
            for w in rx.findall(t or ""):
                mask[w] = mask.get(w, 0) | bit
        return pa.table(
            {
                "token": pa.array(list(mask.keys()), pa.string()),
                "mask": pa.array(list(mask.values()), pa.int64()),
            }
        )

    def or_fold(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values("token")
        tok = df["token"].to_numpy()
        m = df["mask"].to_numpy(np.int64)
        new = np.ones(len(tok), bool)
        new[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(new)
        ors = np.bitwise_or.reduceat(m, starts) if len(m) else m
        return pa.table(
            {
                "token": pa.array(tok[starts], pa.string()),
                "mask": pa.array(ors.astype(np.int64), pa.int64()),
            }
        )

    masks = bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"),
        lambda b: _token_bucket(b["token"]),
        or_fold,
    )

    def pair_counts(t: pa.Table) -> pa.Table:
        m = t["mask"].to_numpy(zero_copy_only=False)
        rows = {"a": [], "b": [], "inter": [], "only": []}
        for i in range(len(langs)):
            for j in range(i + 1, len(langs)):
                bi, bj = np.int64(1 << i), np.int64(1 << j)
                has_i = (m & bi) != 0
                has_j = (m & bj) != 0
                rows["a"].append(i)
                rows["b"].append(j)
                rows["inter"].append(int((has_i & has_j).sum()))
                rows["only"].append(int((has_i | has_j).sum()))
        return pa.table(
            {
                "a": pa.array(np.array(rows["a"], np.int64), pa.int64()),
                "b": pa.array(np.array(rows["b"], np.int64), pa.int64()),
                "n_common": pa.array(np.array(rows["inter"], np.int64), pa.int64()),
                "n_union": pa.array(np.array(rows["only"], np.int64), pa.int64()),
            }
        )

    agg = (
        sum_by_key_pair(
            masks.map_batches(pair_counts, batch_format="pyarrow"), "a", "b", ["n_common", "n_union"]
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    agg["lang_a"] = [langs[i] for i in agg["a"]]
    agg["lang_b"] = [langs[i] for i in agg["b"]]
    agg["jaccard_ppm"] = (1_000_000 * agg["n_common"]) // agg["n_union"]
    return agg[["lang_a", "lang_b", "n_common", "n_union", "jaccard_ppm"]].astype(
        {"lang_a": "string", "lang_b": "string", "n_common": "int64", "n_union": "int64", "jaccard_ppm": "int64"}
    )


SQL_VOCAB_OVERLAP = (
    "WITH v AS (SELECT DISTINCT lang, t FROM (SELECT lang, "
    "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents)), "
    "sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1), "
    "inter AS (SELECT x.lang AS lang_a, y.lang AS lang_b, CAST(count(*) AS BIGINT) AS n_common "
    "FROM v x JOIN v y ON x.t = y.t AND x.lang < y.lang GROUP BY 1, 2), "
    "pairs AS (SELECT a.lang AS lang_a, b.lang AS lang_b, a.n AS na, b.n AS nb "
    "FROM sz a JOIN sz b ON a.lang < b.lang) "
    "SELECT p.lang_a, p.lang_b, coalesce(i.n_common, 0) AS n_common, "
    "p.na + p.nb - coalesce(i.n_common, 0) AS n_union, "
    "CAST(1000000 * coalesce(i.n_common, 0) // (p.na + p.nb - coalesce(i.n_common, 0)) "
    "AS BIGINT) AS jaccard_ppm "
    "FROM pairs p LEFT JOIN inter i ON i.lang_a = p.lang_a AND i.lang_b = p.lang_b"
)

ANALYTICS6_QUERIES["docs_vocab_overlap"] = q_docs_vocab_overlap
ANALYTICS6_ORACLES["docs_vocab_overlap"] = SQL_VOCAB_OVERLAP


# ----------------------------------------------------------------------
# Basket-size histogram (lines per order → count of counts)
# ----------------------------------------------------------------------
def q_orders_basket_hist(sf_dir):
    """Order-size distribution: lineitem lines per order, then the
    count-of-counts histogram — two chained exact reduces."""
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"])

    def partial(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(batch["l_orderkey"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"ok": pa.array(u, pa.int64()), "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    per_order = sum_by_key(li.map_batches(partial, batch_format="pyarrow"), "ok", ["n"])

    def hist(t: pa.Table) -> pa.Table:
        u, cnt = np.unique(t["n"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {
                "n_lines": pa.array(u, pa.int64()),
                "n_orders": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    out = sum_by_key(per_order.map_batches(hist, batch_format="pyarrow"), "n_lines", ["n_orders"])
    return out.to_pandas().sort_values("n_lines").reset_index(drop=True).astype("int64")


SQL_BASKET = (
    "WITH o AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1) "
    "SELECT n AS n_lines, CAST(count(*) AS BIGINT) AS n_orders FROM o GROUP BY 1"
)

ANALYTICS6_QUERIES["orders_basket_hist"] = q_orders_basket_hist
ANALYTICS6_ORACLES["orders_basket_hist"] = SQL_BASKET
