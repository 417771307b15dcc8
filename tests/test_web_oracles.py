"""Web flagship oracle family (round-3 VERDICT item 1): the distributed
extract → dense-renumber → kernel path must hash-match a DuckDB
derivation over the SERIAL extractor's side parquet. The driver runs
this at the 3000-page corpus; these tests pin the same machinery at the
800-page fixture so regressions surface in pytest first."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    return duckdb.connect()


def test_dense_renumber_edges_matches_rank():
    from everythinggraph_ray.stages.agg import dense_renumber_edges, dense_vid_map

    src = np.array([900, 5, 900, 31, 5, 5], np.int64)
    dst = np.array([5, 900, 42, 900, 5, 900], np.int64)  # self-loop + dups kept
    e = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    m = dense_vid_map(e).to_pandas().sort_values("vid").reset_index(drop=True)
    assert m["vid"].tolist() == [5, 31, 42, 900]
    assert m["dense"].tolist() == [0, 1, 2, 3]
    got = dense_renumber_edges(e).to_pandas()
    assert len(got) == 6  # multiplicity preserved
    want = pd.DataFrame({"src": [3, 0, 3, 1, 0, 0], "dst": [0, 3, 2, 3, 0, 3]})
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


@pytest.fixture(scope="module")
def web_fixture(small_corpus):
    """Distributed dense edges + the serial side parquet, 800 pages."""
    from everythinggraph_ray.corpus import ensure_web_oracle_edges
    from everythinggraph_ray.stages.agg import dense_renumber_edges
    from everythinggraph_ray.stages.extract import pages_to_edges

    side = ensure_web_oracle_edges(800, seed=42)
    dense = (
        dense_renumber_edges(
            pages_to_edges(ray.data.read_parquet(small_corpus))
        )
        .to_pandas()
    )
    return side, dense


def test_web_dense_edges_match_serial_sql(web_fixture, duck):
    """Distributed dense edge table == SQL dense_rank over the serial
    extractor's parquet — the exact comparison the driver hashes."""
    side, dense = web_fixture
    sql = (
        f"WITH we AS (SELECT src, dst FROM read_parquet('{side}')), "
        "wm AS (SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS id "
        "FROM (SELECT DISTINCT vid FROM (SELECT src AS vid FROM we UNION ALL SELECT dst AS vid FROM we))) "
        "SELECT ms.id AS src, md.id AS dst FROM we "
        "JOIN wm ms ON ms.vid = we.src JOIN wm md ON md.vid = we.dst"
    )
    want = duck.execute(sql).fetchdf()
    assert len(dense) == len(want) > 0
    pd.testing.assert_frame_equal(
        _canon(dense), _canon(want.astype({"src": "int64", "dst": "int64"}))
    )


def test_web_oracle_sql_builders_run_at_fixture_scale(duck):
    """The four registered oracle SQL strings (rebuilt for 800 pages) all
    execute in DuckDB and return plausible shapes."""
    from everythinggraph_ray.corpus import ensure_web_oracle_edges
    from everythinggraph_ray.pipelines.queries import _web_oracle_sqls

    ensure_web_oracle_edges(800, seed=42)
    sqls = _web_oracle_sqls(800)
    edges = duck.execute(sqls["web_edges"]).fetchdf()
    pr = duck.execute(sqls["web_pagerank10"]).fetchdf()
    wcc = duck.execute(sqls["web_wcc"]).fetchdf()
    top = duck.execute(sqls["web_top10"]).fetchdf()
    n_v = pd.concat([edges["src"], edges["dst"]]).nunique()
    assert len(pr) == len(wcc) == n_v > 0
    assert len(top) == 10
    assert abs(pr["pagerank"].sum()) > 0
    # components: every label is a member vid, labels ≤ vid
    assert (wcc["component"] <= wcc["vid"]).all()


def test_web_pagerank10_engine_vs_sql_fixture(duck, small_corpus):
    """End-to-end at 800 pages: engine 10-iteration PR over the dense web
    graph == the SQL chain (rounded 1e-7), exactly the driver's check."""
    import os
    import tempfile

    from everythinggraph_ray.corpus import ensure_web_oracle_edges
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import PageRankKernel
    from everythinggraph_ray.pipelines.queries import _web_oracle_sqls
    from everythinggraph_ray.stages.agg import dense_renumber_edges
    from everythinggraph_ray.stages.extract import pages_to_edges

    ensure_web_oracle_edges(800, seed=42)
    dense = dense_renumber_edges(pages_to_edges(ray.data.read_parquet(small_corpus)))
    bdir = os.path.join(tempfile.mkdtemp(prefix="webdense_t_"), "b")
    build_graph(dense, bdir, num_partitions=4)
    eng = GraphEngine(bdir)
    try:
        df = (
            eng.run(PageRankKernel(), n_iters=10)["dataset"]
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
    finally:
        eng.shutdown()
    df["pagerank"] = np.round(df["pagerank"].to_numpy(), 7)
    want = (
        duck.execute(_web_oracle_sqls(800)["web_pagerank10"])
        .fetchdf()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    assert np.array_equal(df["vid"].to_numpy(), want["vid"].to_numpy(np.int64))
    assert np.allclose(df["pagerank"], want["pagerank"], atol=2e-7)


def test_web_text_and_anchor_oracles_fixture(duck, small_corpus):
    """Serial (url, text) side parquet == distributed pages_to_text (the
    byte-identity invariant as the driver sees it), and the anchor
    oracle's top-20 equals the distributed aggregation, at 800 pages."""
    from everythinggraph_ray.corpus import (
        ensure_web_oracle_anchors,
        ensure_web_oracle_text,
    )
    from everythinggraph_ray.pipelines.queries import _web_oracle_sqls
    from everythinggraph_ray.stages.extract import pages_to_text

    ensure_web_oracle_text(800, seed=42)
    ensure_web_oracle_anchors(800, seed=42)
    sqls = _web_oracle_sqls(800)

    # the query body pointed at the 800-page fixture corpus (queries()
    # entries map sf_dir -> the 3000-page corpus via _corpus_for)
    got = _canon(
        pages_to_text(ray.data.read_parquet(str(small_corpus))).to_pandas()
    )
    want = _canon(duck.execute(sqls["web_extract_text"]).fetchdf())
    pd.testing.assert_frame_equal(got, want)

    ga = _canon(q_web_anchor_text_at(small_corpus).to_pandas())
    wa = _canon(duck.execute(sqls["web_anchor_text"]).fetchdf())
    pd.testing.assert_frame_equal(ga, wa.astype({"n": "int64"}))


def q_web_anchor_text_at(corpus_path):
    """q_web_anchor_text's body pointed at an explicit corpus path."""
    import numpy as np
    import pyarrow as pa

    from everythinggraph_ray.html import extract_anchors
    from everythinggraph_ray.pipelines.queries import ANCHOR_TOPK
    from everythinggraph_ray.stages.agg import bucketed_reduce, string_buckets

    pages = ray.data.read_parquet(str(corpus_path), columns=["url", "html"])

    def emit(batch):
        cnt = {}
        for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            for dst, text in extract_anchors(html, url):
                k = (dst, text)
                cnt[k] = cnt.get(k, 0) + 1
        return pa.table(
            {
                "dst_url": pa.array([k[0] for k in cnt], pa.string()),
                "anchor": pa.array([k[1] for k in cnt], pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def bucket_of(batch):
        return string_buckets(batch["dst_url"], batch["anchor"])

    def red(g):
        df = g.to_pandas().groupby(["dst_url", "anchor"], as_index=False)["n"].sum()
        df = df.sort_values(["n", "dst_url", "anchor"], ascending=[False, True, True])
        return pa.Table.from_pandas(df.head(ANCHOR_TOPK), preserve_index=False)

    top = bucketed_reduce(pages.map_batches(emit, batch_format="pyarrow"), bucket_of, red)
    return top.sort(["n", "dst_url", "anchor"], descending=[True, False, False]).limit(
        ANCHOR_TOPK
    )
