"""Extraction front end: byte-identity + edge-table correctness."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import ray.data

from everythinggraph_ray.html import extract_links, extract_text, normalize_url
from everythinggraph_ray.stages.extract import pages_to_edges, pages_to_text


def test_normalize_url():
    assert normalize_url("HTTP://Example.COM:80/a#frag") == "http://example.com/a"
    assert normalize_url("https://x.org") == "https://x.org/"
    assert normalize_url("ftp://x.org/a") is None
    assert normalize_url("https://x.org:443/q?a=1#f") == "https://x.org/q?a=1"


def test_extract_text_rules():
    html = (
        b"<html><head><title>T</title><script>if(1<2){}</script>"
        b"<style>a{}</style></head><body><h1>A &amp; B</h1>"
        b"<p>one  two</p><!-- c --><p>three<br>four</p></body></html>"
    )
    assert extract_text(html) == "T\nA & B\none two\nthree\nfour"


def test_extract_links_resolution():
    html = (
        b'<a href="/p/2">r</a><a href="#x">f</a><a href="mailto:a@b">m</a>'
        b'<a href="https://other.example/z">abs</a><a href="../up">rel</a>'
    )
    links = extract_links(html, "https://site0.example/p/1")
    assert links == [
        "https://site0.example/p/2",
        "https://other.example/z",
        "https://site0.example/up",
    ]


def test_distributed_text_byte_identity(tiny_corpus):
    """The north-rule per-row invariant: distributed map_batches text ==
    serial extractor output, byte for byte, per url (latest capture)."""
    pages = ray.data.read_parquet(tiny_corpus)
    got = pages_to_text(pages).to_pandas().set_index("url")["text"]

    t = pq.read_table(tiny_corpus)
    import pandas as pd

    df = pd.DataFrame(
        {
            "url": t["url"].to_pylist(),
            "ts": t["warc_ts"].to_pandas(),
            "html": t["html"].to_pylist(),
        }
    ).sort_values("ts").groupby("url", as_index=False).tail(1)
    want = {u: extract_text(h) for u, h in zip(df["url"], df["html"])}
    assert len(got) == len(want)
    for u, txt in want.items():
        assert got[u] == txt  # byte-identical


def test_pages_to_edges_matches_serial(small_corpus, small_edges):
    sv, dv = small_edges
    got = pages_to_edges(ray.data.read_parquet(small_corpus)).to_pandas()
    a = np.sort(np.stack([got["src"].to_numpy(), got["dst"].to_numpy()], axis=1), axis=0)
    b = np.sort(np.stack([sv, dv], axis=1), axis=0)
    # multiset equality of edges
    a = a[np.lexsort((a[:, 1], a[:, 0]))]
    b = b[np.lexsort((b[:, 1], b[:, 0]))]
    assert a.shape == b.shape
    assert np.array_equal(a, b)


def test_dedup_keep_latest_takes_latest_capture(tiny_corpus):
    """Duplicated urls (the ~1% re-crawls) must resolve to the LATER
    warc_ts capture — whose html contains the 'revision two' marker."""
    t = pq.read_table(tiny_corpus)
    urls = t["url"].to_pylist()
    dup_urls = {u for u in urls if urls.count(u) > 1}
    assert dup_urls, "corpus should contain duplicated urls"
    got = pages_to_text(ray.data.read_parquet(tiny_corpus)).to_pandas().set_index("url")["text"]
    for u in dup_urls:
        assert "revision two" in got[u]


def test_extract_anchors_semantics():
    from everythinggraph_ray.html import extract_anchors, extract_links

    h = (
        '<html><body><script>var a = "<a href=/inscript>no</a>";</script>'
        '<p>see <a href="https://EXample.com:443/p?q=1#frag"> Hello <b>World</b> </a>'
        ' and <a href="#top">skip</a><a href=\'/rel\'>rel&amp;</a>'
        '<a href="mailto:x@y">mail</a>'
        "<a href=/bare>bare<br>text</a></p></body></html>"
    )
    got = extract_anchors(h, "https://base.org/dir/page")
    assert got == [
        ("https://example.com/p?q=1", "Hello World"),
        ("https://base.org/rel", "rel&"),
        ("https://base.org/bare", "bare text"),
    ]
    # anchors' urls are a subset of extract_links (same filtering rules)
    assert [u for u, _ in got] == extract_links(h, "https://base.org/dir/page")


def test_extract_anchors_corpus_consistency():
    """Every corpus page's anchor urls must equal its extract_links output
    (the anchor extractor shares the href grammar)."""
    import pyarrow.parquet as pq

    from everythinggraph_ray.corpus import ensure_corpus
    from everythinggraph_ray.html import extract_anchors, extract_links

    d = ensure_corpus(200, seed=42)
    t = pq.read_table(d)
    for url, html in zip(t["url"].to_pylist()[:50], t["html"].to_pylist()[:50]):
        assert [u for u, _ in extract_anchors(html, url)] == extract_links(html, url)
