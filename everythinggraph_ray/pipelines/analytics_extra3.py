"""Analytics batch (session 9): bipartiteness census, readability and
vocabulary-richness scoring, session bounce rates, the Pareto
concentration of event traffic, and TPC-H Q16-lite supplier counts.

Each is a (ray_fn, oracle_sql) pair continuing queries.py's exactness
discipline — integer surfaces wherever a float could reassociate, and
any shared expression tree written token-for-token on both sides.

Distributed shapes:
- ``rel_bipartite``: ONE packed min-semiring pass (BipartiteLevelKernel,
  state ``(label<<32)|dist``) yields component labels AND BFS parity
  together; the odd-edge census is two bucketed ``hash_join`` parity
  attaches over the distinct canonical undirected edges plus a
  ``sum_by_key`` fold — nothing per-vertex ever sits on the driver, the
  output is one row per component.
- ``docs_readability``: pure ``pyarrow.compute`` RE2 counting kernels
  (the doc_stats device) + an integer Flesch chain — zero Python in the
  per-row path.
- ``docs_yule_k``: per-doc token frequency spectra (the hapax
  tokenizer, WORD_RE) folded to (n_tokens, n_types, s2); Yule's K rides
  as one exact integer division (HUGEINT on the SQL side, Python-int
  object math per doc in Ray).
- ``events_bounce_rate``: the sessionization co-group (events_sessions
  precedent — user-bucketed, vectorized cumsum inside the bucket) with
  per-session (start day, size) kept, folded to per-day partials; the
  day table is O(timespan), never O(events).
- ``events_pareto_share``: per-user counts via ``sum_by_key``; the
  top-1% cut is a ``grouped_top_k`` over the AGGREGATED table (U rows,
  not events), with the share division done once on two scalars.
- ``q16_supplier_counts``: distinct (partkey, suppkey) via the edge
  dedup primitive, part attributes attached through the bucketed
  ``hash_join``, then supplier-bucketed triple dedup so each supplier
  counts once per (brand, size band) — count(DISTINCT) without any
  global shuffle beyond the repo's one bucketing convention.
"""

from __future__ import annotations

import os
import re as _re

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
)

ANALYTICS3_QUERIES: dict = {}
ANALYTICS3_ORACLES: dict = {}

DAY_US = 86_400_000_000


# ----------------------------------------------------------------------
# Bipartiteness census per component (odd-cycle certificate)
# ----------------------------------------------------------------------
def bipartite_census(edges: ray.data.Dataset, build_dir: str) -> pd.DataFrame:
    """Per-component bipartiteness census over arbitrary int64 edges:
    ONE BipartiteLevelKernel pass over the undirected build at
    ``build_dir`` gives every vertex its component label and BFS parity
    packed in one int64; an undirected edge whose endpoints share
    parity closes an odd cycle (self-loops included — a length-1 cycle
    is odd). Output: (component, n_vertices, n_edges, odd_edges,
    bipartite) — the 2-colorability census of the whole graph from one
    traversal + one edge sweep. Shared by q_rel_bipartite and the
    ``bipartite`` CLI op."""
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import BipartiteLevelKernel
    from everythinggraph_ray.stages.edges import dedup_edges, undirect_edges

    edges = edges.select_columns(["src", "dst"]).materialize()  # consumed twice
    build_graph(undirect_edges(edges), build_dir, num_partitions=8, hub_threshold=10**9)
    eng = GraphEngine(build_dir)
    try:
        res = eng.run(BipartiteLevelKernel())
        packed = res["dataset"]
    finally:
        eng.shutdown()

    def unpack(t: pa.Table) -> pa.Table:
        v = t["bipartite"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": t["vid"],
                "component": pa.array(v >> np.int64(32), pa.int64()),
                "par": pa.array(v & np.int64(1), pa.int64()),
            }
        )

    lab = packed.map_batches(unpack, batch_format="pyarrow")

    def size_partial(t: pa.Table) -> pa.Table:
        c = t["component"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table(
            {
                "component": pa.array(u, pa.int64()),
                "n_vertices": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    sizes = sum_by_key(
        lab.map_batches(size_partial, batch_format="pyarrow"), "component", ["n_vertices"]
    )

    # distinct canonical undirected edges, self-loops KEPT (odd cycles)
    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d), pa.int64()),
                "dst": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    ue = dedup_edges(edges.map_batches(canon, batch_format="pyarrow"))

    lab_a = lab.map_batches(
        lambda t: pa.table({"vid": t["vid"], "component": t["component"], "par_a": t["par"]}),
        batch_format="pyarrow",
    )
    lab_b = lab.map_batches(
        lambda t: pa.table({"vid": t["vid"], "par_b": t["par"]}), batch_format="pyarrow"
    )
    j = hash_join(ue, lab_a, on="src", right_on="vid", right_cols=["component", "par_a"])
    j = hash_join(j, lab_b, on="dst", right_on="vid", right_cols=["par_b"])

    def edge_partial(t: pa.Table) -> pa.Table:
        c = t["component"].to_numpy(zero_copy_only=False)
        odd = (
            t["par_a"].to_numpy(zero_copy_only=False)
            + t["par_b"].to_numpy(zero_copy_only=False)
        ) % 2 == 0
        u, inv = np.unique(c, return_inverse=True)
        return pa.table(
            {
                "component": pa.array(u, pa.int64()),
                "n_edges": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "odd_edges": pa.array(
                    np.bincount(inv, weights=odd.astype(np.int64)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    ec = sum_by_key(
        j.map_batches(edge_partial, batch_format="pyarrow"),
        "component",
        ["n_edges", "odd_edges"],
    )

    out = hash_join(sizes, ec, on="component", right_cols=["n_edges", "odd_edges"], how="left")

    def finish(t: pa.Table) -> pa.Table:
        ne = t["n_edges"].to_numpy(zero_copy_only=False)
        oe = t["odd_edges"].to_numpy(zero_copy_only=False)
        ne = np.nan_to_num(ne.astype(np.float64), nan=0.0).astype(np.int64)
        oe = np.nan_to_num(oe.astype(np.float64), nan=0.0).astype(np.int64)
        return pa.table(
            {
                "component": t["component"],
                "n_vertices": t["n_vertices"],
                "n_edges": pa.array(ne, pa.int64()),
                "odd_edges": pa.array(oe, pa.int64()),
                "bipartite": pa.array((oe == 0).astype(np.int64), pa.int64()),
            }
        )

    df = out.map_batches(finish, batch_format="pyarrow").to_pandas()
    return df.sort_values("component").reset_index(drop=True).astype("int64")


def q_rel_bipartite(sf_dir):
    """Bipartiteness census of the rel graph (see bipartite_census);
    the undirected build is the cached _rel_build layout."""
    from everythinggraph_ray.pipelines.flagship import build_dir_for
    from everythinggraph_ray.pipelines.queries import rel_edges

    return bipartite_census(
        rel_edges(sf_dir), build_dir_for(f"relbip|{sf_dir}", 8)
    )


def _bipartite_sql() -> str:
    from everythinggraph_ray.pipelines.queries import _sql_graph_prelude

    return (
        "WITH RECURSIVE "
        + _sql_graph_prelude(undirect=True)
        + ", r(vid, lab) AS (SELECT vid, vid FROM verts UNION "
        "SELECT und.v, r.lab FROM r JOIN und ON und.u = r.vid WHERE r.lab < und.v)"
        ", comp AS (SELECT vid, min(lab) AS c FROM r GROUP BY vid)"
        ", roots AS (SELECT DISTINCT c AS rv FROM comp)"
        ", h(vid, d) AS (SELECT rv, CAST(0 AS BIGINT) FROM roots UNION "
        "SELECT und.v, h.d + 1 FROM h JOIN und ON und.u = h.vid WHERE h.d < 64)"
        ", hm AS (SELECT vid, min(d) AS d FROM h GROUP BY vid)"
        ", ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e)"
        ", ec AS (SELECT c.c AS component, CAST(count(*) AS BIGINT) AS n_edges, "
        "CAST(sum(CASE WHEN (ha.d + hb.d) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS odd_edges "
        "FROM ue JOIN hm ha ON ha.vid = ue.a JOIN hm hb ON hb.vid = ue.b "
        "JOIN comp c ON c.vid = ue.a GROUP BY 1) "
        "SELECT c.c AS component, CAST(count(*) AS BIGINT) AS n_vertices, "
        "coalesce(max(ec.n_edges), 0) AS n_edges, "
        "coalesce(max(ec.odd_edges), 0) AS odd_edges, "
        "CAST(CASE WHEN coalesce(max(ec.odd_edges), 0) = 0 THEN 1 ELSE 0 END AS BIGINT) "
        "AS bipartite "
        "FROM comp c LEFT JOIN ec ON ec.component = c.c GROUP BY c.c"
    )


ANALYTICS3_QUERIES["rel_bipartite"] = q_rel_bipartite
# registration happens when queries.py imports this module at its tail,
# so the prelude import inside _bipartite_sql resolves (the _bowtie_sql
# circular-import device)
ANALYTICS3_ORACLES["rel_bipartite"] = _bipartite_sql()


# ----------------------------------------------------------------------
# Readability scoring (Flesch reading ease, integer surface)
# ----------------------------------------------------------------------
SENT_RE = r"[.!?]+"
VOWEL_RE = r"[aeiouy]+"


def q_docs_readability(sf_dir):
    """Flesch-style readability per document from three RE2 counting
    kernels (words \\S+, sentence marks [.!?]+, vowel groups as the
    syllable proxy) — the corpus-quality signal next to docs_quality.
    flesch_milli = 206835 - (1015·w)//max(s,1) - (84600·vg)//max(w,1),
    an integer chain written identically on both sides."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def score(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        w = pc.count_substring_regex(txt, r"\S+").to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.count_substring_regex(txt, SENT_RE).to_numpy(zero_copy_only=False).astype(np.int64)
        vg = (
            pc.count_substring_regex(pc.utf8_lower(txt), VOWEL_RE)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        fl = 206835 - (1015 * w) // np.maximum(s, 1) - (84600 * vg) // np.maximum(w, 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(w, pa.int64()),
                "n_sentences": pa.array(s, pa.int64()),
                "n_vowel_groups": pa.array(vg, pa.int64()),
                "flesch_milli": pa.array(fl, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


SQL_READABILITY = (
    r"WITH c AS (SELECT doc_id, "
    r"CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words, "
    r"CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences, "
    r"CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_vowel_groups "
    r"FROM documents) "
    r"SELECT doc_id, n_words, n_sentences, n_vowel_groups, "
    r"CAST(206835 - (1015 * n_words) // greatest(n_sentences, 1) "
    r"- (84600 * n_vowel_groups) // greatest(n_words, 1) AS BIGINT) AS flesch_milli FROM c"
)

ANALYTICS3_QUERIES["docs_readability"] = q_docs_readability
ANALYTICS3_ORACLES["docs_readability"] = SQL_READABILITY


# ----------------------------------------------------------------------
# Yule's K vocabulary richness per document
# ----------------------------------------------------------------------
def q_docs_yule_k(sf_dir):
    """Yule's K (vocabulary richness / repetitiveness) per document:
    K_micro = 10^10 · (S2 - N) // N², with N = token count, S2 = Σ f²
    over the frequency spectrum — the classic repetition signal next to
    docs_repetition's span device. Tokenizer = the hapax WORD_RE; the
    big product runs in Python-int object math per doc (HUGEINT on the
    SQL side), so no int64 overflow at any document length."""
    from everythinggraph_ray.datapipe.text import WORD_RE

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def spectrum(batch: pa.Table) -> pa.Table:
        from collections import Counter

        rx = _re.compile(WORD_RE)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = np.zeros(len(ids), np.int64)
        ty = np.zeros(len(ids), np.int64)
        s2 = np.zeros(len(ids), np.int64)
        yk = np.zeros(len(ids), np.int64)
        for i, t in enumerate(pc.utf8_lower(batch["text"]).to_pylist()):
            c = Counter(rx.findall(t or ""))
            ni = sum(c.values())
            s2i = sum(v * v for v in c.values())
            n[i], ty[i], s2[i] = ni, len(c), s2i
            if ni:
                yk[i] = (10_000_000_000 * (s2i - ni)) // (ni * ni)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "n_types": pa.array(ty, pa.int64()),
                "s2": pa.array(s2, pa.int64()),
                "yule_micro": pa.array(yk, pa.int64()),
            }
        )

    return docs.map_batches(spectrum, batch_format="pyarrow")


SQL_YULE = (
    "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t "
    "FROM documents), "
    "f AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2), "
    "s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
    "CAST(count(*) AS BIGINT) AS n_types, "
    "sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2 FROM f GROUP BY 1) "
    "SELECT d.doc_id, coalesce(s.n_tokens, 0) AS n_tokens, "
    "coalesce(s.n_types, 0) AS n_types, CAST(coalesce(s.s2, 0) AS BIGINT) AS s2, "
    "CAST(CASE WHEN coalesce(s.n_tokens, 0) > 0 THEN "
    "10000000000 * (s.s2 - s.n_tokens) // (CAST(s.n_tokens AS HUGEINT) * s.n_tokens) "
    "ELSE 0 END AS BIGINT) AS yule_micro "
    "FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id"
)

ANALYTICS3_QUERIES["docs_yule_k"] = q_docs_yule_k
ANALYTICS3_ORACLES["docs_yule_k"] = SQL_YULE


# ----------------------------------------------------------------------
# Session bounce rate per day
# ----------------------------------------------------------------------
def q_events_bounce_rate(sf_dir):
    """Bounce rate per day: the events_sessions sessionization (30-min
    gap, (ts, event_id) order) kept at per-session granularity — a
    session BOUNCES when it contains exactly one event; the day is the
    session's start day. Per-bucket sessions fold to (day, n_sessions,
    n_bounce) partials; bounce_ppm is one integer division per day."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return (
            mix64(batch["user_id"].to_numpy(zero_copy_only=False)).astype(np.int64)
            & 0x7FFFFFFF
        )

    def sess_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["user_id", "ts", "event_id"])
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            new[1:] = (uid[1:] != uid[:-1]) | ((us[1:] - us[:-1]) > 1_800_000_000)
        sid = np.cumsum(new) - 1
        # per-session size and start day (rows are sorted, so the first
        # row of each sid is the session start)
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, len(df)])
        day = us[starts] // DAY_US
        u, inv = np.unique(day, return_inverse=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "n_sessions": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "n_bounce": pa.array(
                    np.bincount(inv, weights=(sizes == 1).astype(np.int64)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    parts = bucketed_reduce(ev, bucket_of, sess_bucket).to_pandas()
    g = parts.groupby("day", as_index=False)[["n_sessions", "n_bounce"]].sum()
    g["bounce_ppm"] = (1_000_000 * g["n_bounce"]) // g["n_sessions"]
    return g.sort_values("day").reset_index(drop=True).astype("int64")


SQL_BOUNCE = (
    "WITH x AS (SELECT user_id, ts, event_id, CASE WHEN lag(ts) OVER w IS NULL "
    "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS ns "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "sid AS (SELECT user_id, ts, sum(ns) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM x), "
    "sess AS (SELECT user_id, sid, min(epoch_us(ts)) AS start_us, count(*) AS sz "
    "FROM sid GROUP BY 1, 2) "
    "SELECT CAST(start_us // 86400000000 AS BIGINT) AS day, "
    "CAST(count(*) AS BIGINT) AS n_sessions, "
    "CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce, "
    "CAST(1000000 * sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) // count(*) AS BIGINT) "
    "AS bounce_ppm FROM sess GROUP BY 1"
)

ANALYTICS3_QUERIES["events_bounce_rate"] = q_events_bounce_rate
ANALYTICS3_ORACLES["events_bounce_rate"] = SQL_BOUNCE


# ----------------------------------------------------------------------
# Pareto concentration: the top 1% of users' share of all events
# ----------------------------------------------------------------------
def q_events_pareto_share(sf_dir):
    """Traffic concentration: the share (ppm) of all events produced by
    the top ceil(U/100) users by event count (ties broken by user_id
    asc). Per-user counts via sum_by_key; the cut runs on the
    AGGREGATED U-row table (materialized once — it is the small side,
    not the corpus), the top slice reduces through Dataset.sum."""
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(batch["user_id"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    counts = sum_by_key(
        ev.map_batches(partial, batch_format="pyarrow"), "user_id", ["n"]
    ).materialize()
    n_users = counts.count()
    k = (n_users + 99) // 100
    total = int(counts.sum("n"))

    g0 = counts.map_batches(
        lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())),
        batch_format="pyarrow",
    )
    top = grouped_top_k(g0, "g", [("n", False), ("user_id", True)], int(k))
    top_events = int(top.sum("n"))
    return pd.DataFrame(
        {
            "n_users": [n_users],
            "top_users": [k],
            "top_events": [top_events],
            "total_events": [total],
            "share_ppm": [(1_000_000 * top_events) // total],
        }
    ).astype("int64")


SQL_PARETO = (
    "WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1), "
    "k AS (SELECT CAST((count(*) + 99) // 100 AS BIGINT) AS k FROM c), "
    "r AS (SELECT user_id, n, row_number() OVER (ORDER BY n DESC, user_id) AS rk FROM c) "
    "SELECT (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_users, "
    "(SELECT k FROM k) AS top_users, "
    "CAST(sum(CASE WHEN rk <= (SELECT k FROM k) THEN n ELSE 0 END) AS BIGINT) AS top_events, "
    "CAST(sum(n) AS BIGINT) AS total_events, "
    "CAST(1000000 * sum(CASE WHEN rk <= (SELECT k FROM k) THEN n ELSE 0 END) // sum(n) "
    "AS BIGINT) AS share_ppm FROM r"
)

ANALYTICS3_QUERIES["events_pareto_share"] = q_events_pareto_share
ANALYTICS3_ORACLES["events_pareto_share"] = SQL_PARETO


# ----------------------------------------------------------------------
# TPC-H Q16-lite: distinct suppliers per (brand, size band)
# ----------------------------------------------------------------------
def q_q16_supplier_counts(sf_dir):
    """Q16's shape on this schema (lineitem stands in for partsupp):
    distinct suppliers able to supply each (p_brand, p_size % 5) band,
    excluding Brand#1 and PROMO parts. Distinct (partkey, suppkey) via
    the edge-dedup primitive, part attributes through the bucketed
    hash_join, then a supplier-bucketed triple dedup (a supplier's rows
    co-locate, so per-bucket drop_duplicates IS the global distinct)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey", "l_suppkey"]
    )
    from everythinggraph_ray.stages.edges import dedup_edges

    pairs = dedup_edges(
        li.map_batches(
            lambda t: pa.table({"src": t["l_partkey"], "dst": t["l_suppkey"]}),
            batch_format="pyarrow",
        )
    )

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size", "p_type"],
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.not_equal(t["p_brand"], "Brand#1"), pc.not_equal(t["p_type"], "PROMO")
            )
        ),
        batch_format="pyarrow",
    )

    j = hash_join(pairs, part, on="src", right_on="p_partkey", right_cols=["p_brand", "p_size"])

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["dst"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def dedup_count(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df["size_band"] = (df["p_size"].astype(np.int64)) % 5
        d = df.drop_duplicates(["p_brand", "size_band", "dst"])
        out = d.groupby(["p_brand", "size_band"], as_index=False).size()
        return pa.table(
            {
                "p_brand": pa.array(out["p_brand"].astype(str), pa.string()),
                "size_band": pa.array(out["size_band"].to_numpy(np.int64), pa.int64()),
                "supplier_cnt": pa.array(out["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    parts = bucketed_reduce(j, bucket_of, dedup_count).to_pandas()
    g = parts.groupby(["p_brand", "size_band"], as_index=False)["supplier_cnt"].sum()
    return (
        g.sort_values(["p_brand", "size_band"])
        .reset_index(drop=True)
        .astype({"size_band": "int64", "supplier_cnt": "int64"})
    )


SQL_Q16 = (
    "SELECT p_brand, CAST(p_size % 5 AS BIGINT) AS size_band, "
    "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' GROUP BY 1, 2"
)

ANALYTICS3_QUERIES["q16_supplier_counts"] = q_q16_supplier_counts
ANALYTICS3_ORACLES["q16_supplier_counts"] = SQL_Q16
