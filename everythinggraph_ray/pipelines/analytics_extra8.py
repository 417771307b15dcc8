"""Analytics batch (session 10): DBSCAN over the embedding corpus, the
2-approx VERTEX COVER from the maximal matching, GROUP BY CUBE, the
UNPIVOT (wide→long melt) complement of the pivot reshape, and a
deterministic md5-Bernoulli TABLESAMPLE.

Each is a (ray_fn, oracle_sql) pair on queries.py's exactness
discipline: integer (or md5-string) surfaces only, every float folded
through the sanctioned devices (the cents floor(x*100+0.5) tree, the
1e-3 similarity grid), so the driver's value hash is
summation-order-proof.

Distributed shapes:
- ``emb_dbscan``: density clustering as pure dataflow. The
  eps-neighborhood graph comes from the EXACT all-pairs cosine operator
  (datapipe/knn.py allpairs_similarity — list_cosine_similarity parity);
  per-vertex neighbor counts via one bucketed ``sum_by_key`` decide
  core-ness (deg >= MIN_PTS); core↔core edges (two semi-joins) feed the
  distributed WCCKernel (datapipe/pairs.py cluster_pairs) whose
  min-label fixpoint IS the cluster id; isolated cores self-label via an
  anti-join; border points take the MIN cluster among their core
  neighbors (one grouped min) — the deterministic tie rule that replaces
  textbook DBSCAN's arrival-order assignment. Noise rows are absent from
  the output. The PAIR TABLE (not the corpus) is materialized once
  because three downstream folds consume it — it is the algorithm's own
  sparse intermediate (eps-graph edges), orders of magnitude smaller
  than the corpus at any scale. At 100 TB the pair generator swaps to
  the LSH candidate path (emb_near_dup) and everything downstream — the
  actual DBSCAN — is unchanged.
- ``rel_vertex_cover``: the classic 2-approximation — both endpoints of
  every edge of the deterministic maximal matching (graph/matching.py,
  whose parallel fixpoint equals the sequential greedy in md5-key
  order). One flat-map + bucketed distinct over the matched edge set;
  the SQL oracle wraps the unrolled-rounds matching oracle verbatim, so
  cover == matched endpoints is checked end-to-end. Maximality of the
  matching guarantees the cover (pytest asserts every edge is covered).
- ``docs_lang_source_cube``: all four grouping sets of CUBE(lang,
  source) derived from ONE distributed finest-level count (the rollup
  plan extended by the (all, source) axis — never re-scan the corpus per
  grouping set); '(all)' sentinels keep COALESCE-over-CUBE hash parity.
- ``docs_lang_source_unpivot``: the inverse reshape of
  docs_lang_source_pivot — the dense lang × 20-source long table
  INCLUDING explicit zero cells, built by outer-joining the finest-level
  count against the fixed source axis on the ≤ langs×sources aggregate
  (reshapes run on aggregates, never on raw rows).
- ``events_hash_sample``: deterministic Bernoulli TABLESAMPLE —
  md5(event_id-as-string) first 8 hex chars < SAMPLE_HEX8 keeps ~15.6%
  of rows with zero coordination (same-row-same-verdict on any
  partitioning, any cluster size, any retry — the property
  rand()-based sampling lacks). Surfaced as per-type sampled counts +
  exact-cents value sums; md5 string comparison is identical in
  hashlib and DuckDB, making the sample itself hash-checkable.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.stages.agg import bucketed_reduce, mix64, sum_by_key

ANALYTICS8_QUERIES: dict = {}
ANALYTICS8_ORACLES: dict = {}


# ----------------------------------------------------------------------
# DBSCAN over the embedding corpus
# ----------------------------------------------------------------------
DBSCAN_EPS_SIM = 0.35  # neighbor ⇔ cosine >= 0.35 (47 cores at sf0.01)
DBSCAN_MIN_PTS = 3  # core ⇔ >= 3 neighbors (self excluded)


def q_emb_dbscan(sf_dir):
    """DBSCAN(eps=cos>=0.35, minPts=3) over the embeddings table —
    core points clustered by WCC over the core↔core eps-graph
    (cluster id = min core vid, the WCCKernel fixpoint), border points
    assigned the MIN cluster among their core neighbors, noise dropped.
    Output (vec_id, cluster_id, is_core); full DuckDB hash parity via
    list_cosine_similarity + the recursive min-label CTE."""
    from everythinggraph_ray.datapipe.knn import allpairs_similarity
    from everythinggraph_ray.datapipe.pairs import cluster_pairs
    from everythinggraph_ray.pipelines.queries import _typed_collect

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    # the eps-graph EDGE LIST — the algorithm's own sparse intermediate,
    # consumed by three folds below (degree, core↔core, border attach)
    pairs = allpairs_similarity(emb, threshold=DBSCAN_EPS_SIM).materialize()
    if pairs.count() == 0:  # no eps-edges ⇒ no cores ⇒ all noise
        return pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype="int64"),
                "cluster_id": pd.Series([], dtype="int64"),
                "is_core": pd.Series([], dtype="bool"),
            }
        )

    def und(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "x": pa.array(np.concatenate([a, b]), pa.int64()),
                "y": pa.array(np.concatenate([b, a]), pa.int64()),
                "one": pa.array(np.ones(2 * len(a), np.int64), pa.int64()),
            }
        )

    u = pairs.map_batches(und, batch_format="pyarrow")
    deg = sum_by_key(u, "x", ["one"], out_names=["n_nbrs"], num_buckets=8)

    def cores_of(t: pa.Table) -> pa.Table:
        n = t["n_nbrs"].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": pa.array(x[n >= DBSCAN_MIN_PTS], pa.int64())})

    core = deg.map_batches(cores_of, batch_format="pyarrow").materialize()

    def _ren(ds, old, new):
        return ds.map_batches(
            lambda t, o=old, n=new: t.rename_columns(
                [n if c == o else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )

    # core↔core eps-edges → WCC min-label clustering
    cp = hash_join(pairs, _ren(core, "vid", "a"), on="a", how="semi")
    cp = hash_join(cp, _ren(core, "vid", "b"), on="b", how="semi").materialize()

    def self_label(t: pa.Table) -> pa.Table:
        v = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(v, pa.int64()), "cluster_id": pa.array(v, pa.int64())}
        )

    if cp.count() > 0:
        cc = cluster_pairs(cp)  # (doc_id, cluster_id), only cores WITH a core nbr
        iso = hash_join(
            _ren(core, "vid", "doc_id"),
            cc.select_columns(["doc_id"]),
            on="doc_id",
            how="anti",
        ).map_batches(self_label, batch_format="pyarrow")
        cores_lab = cc.union(iso).materialize()  # (doc_id, cluster_id) per core
    else:  # every core is isolated in the core graph: all self-labeled
        cores_lab = _ren(core, "vid", "doc_id").map_batches(
            self_label, batch_format="pyarrow"
        ).materialize()

    # border = non-core x with >= 1 core neighbor y → min cluster over y
    withc = hash_join(
        u.select_columns(["x", "y"]),
        _ren(cores_lab, "doc_id", "y"),
        on="y",
        right_cols=["cluster_id"],
    )
    border_cand = hash_join(withc, _ren(core, "vid", "x"), on="x", how="anti")

    def pre_min(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "x": t["x"].to_numpy(zero_copy_only=False),
                "cluster_id": t["cluster_id"].to_numpy(zero_copy_only=False),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("x", as_index=False)["cluster_id"].min(), preserve_index=False
        )

    def bucket_x(t: pa.Table) -> np.ndarray:
        return mix64(t["x"].to_numpy(zero_copy_only=False))

    border = bucketed_reduce(
        border_cand.map_batches(pre_min, batch_format="pyarrow"),
        bucket_x,
        pre_min,
        num_buckets=8,
    )

    def fin(t: pa.Table, vid_col: str, is_core: bool) -> pa.Table:
        return pa.table(
            {
                "vec_id": t[vid_col],
                "cluster_id": t["cluster_id"],
                "is_core": pa.array([is_core] * len(t), pa.bool_()),
            }
        )

    out = cores_lab.map_batches(
        lambda t: fin(t, "doc_id", True), batch_format="pyarrow"
    ).union(border.map_batches(lambda t: fin(t, "x", False), batch_format="pyarrow"))
    return _typed_collect(
        out, {"vec_id": "int64", "cluster_id": "int64", "is_core": "bool"}
    )


SQL_DBSCAN = (
    "WITH RECURSIVE "
    "p AS MATERIALIZED (SELECT a.vec_id AS a, b.vec_id AS b "
    "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
    "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) "
    f">= {DBSCAN_EPS_SIM}), "
    "und AS MATERIALIZED (SELECT a AS x, b AS y FROM p UNION ALL SELECT b, a FROM p), "
    f"core AS MATERIALIZED (SELECT x AS vid FROM und GROUP BY x "
    f"HAVING count(*) >= {DBSCAN_MIN_PTS}), "
    "cp AS MATERIALIZED (SELECT x AS u, y AS v FROM und "
    "WHERE x IN (SELECT vid FROM core) AND y IN (SELECT vid FROM core)), "
    "r(vid, lab) AS (SELECT vid, vid FROM core "
    "UNION SELECT cp.v, r.lab FROM r JOIN cp ON cp.u = r.vid WHERE r.lab < cp.v), "
    "cc AS MATERIALIZED (SELECT vid, min(lab) AS cluster_id FROM r GROUP BY vid), "
    "border AS (SELECT und.x AS vid, min(cc.cluster_id) AS cluster_id "
    "FROM und JOIN cc ON cc.vid = und.y "
    "WHERE und.x NOT IN (SELECT vid FROM core) GROUP BY und.x) "
    "SELECT vid AS vec_id, cluster_id, TRUE AS is_core FROM cc "
    "UNION ALL SELECT vid, cluster_id, FALSE AS is_core FROM border"
)

ANALYTICS8_QUERIES["emb_dbscan"] = q_emb_dbscan
ANALYTICS8_ORACLES["emb_dbscan"] = SQL_DBSCAN


# ----------------------------------------------------------------------
# 2-approx minimum vertex cover (matched endpoints)
# ----------------------------------------------------------------------
def q_rel_vertex_cover(sf_dir):
    """2-approx minimum vertex cover: both endpoints of every edge of
    the deterministic greedy maximal matching (graph/matching.py).
    Maximality ⇒ every edge has a matched endpoint ⇒ this is a cover;
    |cover| = 2|M| <= 2|M*| <= 2·OPT. Output the cover vids."""
    from everythinggraph_ray.graph.matching import maximal_matching
    from everythinggraph_ray.pipelines.queries import _typed_collect, rel_edges

    matched, _rounds = maximal_matching(rel_edges(sf_dir))

    def endpoints(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": pa.array(np.concatenate([a, b]), pa.int64()),
                "one": pa.array(np.ones(2 * len(a), np.int64), pa.int64()),
            }
        )

    cover = sum_by_key(
        matched.map_batches(endpoints, batch_format="pyarrow"),
        "vid",
        ["one"],
        num_buckets=8,
    ).select_columns(["vid"])
    return _typed_collect(cover, {"vid": "int64"})


def _vertex_cover_sql() -> str:
    from everythinggraph_ray.pipelines.queries import _matching_sql

    return (
        f"WITH m AS MATERIALIZED ({_matching_sql()}) "
        "SELECT a AS vid FROM m UNION SELECT b AS vid FROM m"
    )


ANALYTICS8_QUERIES["rel_vertex_cover"] = q_rel_vertex_cover
# oracle registered by register_late() below (needs queries._matching_sql)


# ----------------------------------------------------------------------
# GROUP BY CUBE(lang, source)
# ----------------------------------------------------------------------
def q_docs_lang_source_cube(sf_dir):
    """All four grouping sets of CUBE(lang, source) from ONE distributed
    finest-level count: (lang, source) ∪ per-lang ∪ per-source ∪ grand
    total, '(all)' sentinels for rolled axes (the rollup convention,
    docs_lang_source_rollup, extended by the (all, source) axis)."""
    from everythinggraph_ray.pipelines.queries import _lang_source_counts

    counts = _lang_source_counts(sf_dir)
    per_lang = counts.groupby("lang", as_index=False)["n"].sum()
    per_lang["source"] = "(all)"
    per_source = counts.groupby("source", as_index=False)["n"].sum()
    per_source["lang"] = "(all)"
    total = pd.DataFrame(
        {"lang": ["(all)"], "source": ["(all)"], "n": [counts["n"].sum()]}
    )
    allrows = pd.concat([counts, per_lang, per_source, total], ignore_index=True)
    return pa.table(
        {
            "lang": pa.array(allrows["lang"].to_numpy(object), pa.string()),
            "source": pa.array(allrows["source"].to_numpy(object), pa.string()),
            "n": pa.array(allrows["n"].to_numpy(np.int64), pa.int64()),
        }
    )


ANALYTICS8_QUERIES["docs_lang_source_cube"] = q_docs_lang_source_cube
ANALYTICS8_ORACLES["docs_lang_source_cube"] = (
    "SELECT COALESCE(lang, '(all)') AS lang, COALESCE(source, '(all)') AS source, "
    "COUNT(*) AS n FROM documents GROUP BY CUBE(lang, source)"
)


# ----------------------------------------------------------------------
# UNPIVOT — the dense wide→long melt (inverse of docs_lang_source_pivot)
# ----------------------------------------------------------------------
def q_docs_lang_source_unpivot(sf_dir):
    """The melt of the lang × 20-source pivot back to long form WITH
    explicit zero cells (the reshape inverse — what UNPIVOT of the wide
    table yields). Dense grid = observed langs × the generator-fixed
    source axis, outer-joined against the finest-level distributed
    count on the driver-sized aggregate."""
    from everythinggraph_ray.pipelines.queries import PIVOT_SOURCES, _lang_source_counts

    counts = _lang_source_counts(sf_dir)
    langs = sorted(counts["lang"].unique())
    grid = pd.MultiIndex.from_product(
        [langs, PIVOT_SOURCES], names=["lang", "source"]
    ).to_frame(index=False)
    out = grid.merge(counts, on=["lang", "source"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    return pa.table(
        {
            "lang": pa.array(out["lang"].to_numpy(object), pa.string()),
            "source": pa.array(out["source"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
        }
    )


ANALYTICS8_QUERIES["docs_lang_source_unpivot"] = q_docs_lang_source_unpivot
ANALYTICS8_ORACLES["docs_lang_source_unpivot"] = (
    "WITH langs AS (SELECT DISTINCT lang FROM documents), "
    "srcs AS (SELECT unnest(["
    + ", ".join(f"'src{i}'" for i in range(20))
    + "]) AS source), "
    "c AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2) "
    "SELECT langs.lang, srcs.source, COALESCE(c.n, 0) AS n "
    "FROM langs CROSS JOIN srcs "
    "LEFT JOIN c ON c.lang = langs.lang AND c.source = srcs.source"
)


# ----------------------------------------------------------------------
# Deterministic md5-Bernoulli TABLESAMPLE
# ----------------------------------------------------------------------
SAMPLE_HEX8 = "28f5c28f"  # ≈ 0.16 · 2^32 → ~16% keep rate


def q_events_hash_sample(sf_dir):
    """Deterministic Bernoulli sample of the events table: keep a row
    iff md5(str(event_id))[:8] < SAMPLE_HEX8 — same verdict per row on
    any partitioning / cluster size / retry (rand()-based TABLESAMPLE
    is none of those). Surfaced per event_type as sampled row count +
    exact-cents value sum; hashlib md5 == DuckDB md5 on the decimal
    string makes the sample itself hash-checkable."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "event_type", "value"]
    )

    def sample_partial(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (
                hashlib.md5(str(int(e)).encode()).hexdigest()[:8] < SAMPLE_HEX8
                for e in eid
            ),
            dtype=bool,
            count=len(eid),
        )
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas()[keep].to_numpy(object),
                "value_c": np.floor(
                    t["value"].to_numpy(zero_copy_only=False)[keep] * 100 + 0.5
                ).astype(np.int64),
            }
        )
        g = df.groupby("event_type", as_index=False).agg(
            n=("value_c", "size"), sum_value_c=("value_c", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge_group(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_value_c=("sum_value_c", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_et(t: pa.Table) -> np.ndarray:
        from everythinggraph_ray.stages.agg import string_buckets

        return string_buckets(t["event_type"])

    out = bucketed_reduce(
        ev.map_batches(sample_partial, batch_format="pyarrow"),
        bucket_et,
        merge_group,
        num_buckets=4,
    )
    return _typed_collect(
        out, {"event_type": "object", "n": "int64", "sum_value_c": "int64"}
    )


ANALYTICS8_QUERIES["events_hash_sample"] = q_events_hash_sample
ANALYTICS8_ORACLES["events_hash_sample"] = (
    f"SELECT event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c "
    "FROM events "
    f"WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 8) < '{SAMPLE_HEX8}' "
    "GROUP BY event_type"
)


def register_late(oracles: dict) -> None:
    """Oracles that need helpers from queries.py (imported at its tail —
    the _bowtie_sql circular-import device)."""
    oracles["rel_vertex_cover"] = _vertex_cover_sql()
