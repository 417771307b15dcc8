"""Corpus generator invariants (FIXTURES.md F1)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow.parquet as pq

from everythinggraph_ray.corpus import generate_pages
from everythinggraph_ray.graph import oracle as O
from everythinggraph_ray.html import extract_text


def test_deterministic():
    a = generate_pages(150, seed=42)
    b = generate_pages(150, seed=42)
    assert a.equals(b)
    c = generate_pages(150, seed=43)
    assert not a.equals(c)


def test_schema_matches_input_hint():
    t = generate_pages(50)
    assert [f.name for f in t.schema] == ["url", "warc_ts", "html", "text", "lang"]
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"
    assert str(t.schema.field("html").type) == "binary"


def test_text_column_is_extracted_text():
    t = generate_pages(100)
    for h, x in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(h) == x


def test_structure_invariants(small_corpus, small_edges):
    sv, dv = small_edges
    # skewed hub: top in-degree vertex gets >= 5% of in-edges
    top = collections.Counter(dv.tolist()).most_common(1)[0][1]
    assert top / len(dv) >= 0.05
    # >= 2 components among linked pages
    _, lab = O.wcc_oracle(sv, dv)
    assert len(np.unique(lab)) >= 2
    # self-links exist, duplicate edges exist
    assert (sv == dv).any()
    pairs = np.stack([sv, dv], axis=1)
    assert len(np.unique(pairs, axis=0)) < len(pairs)
    # duplicated urls exist
    t = pq.read_table(small_corpus)
    urls = t["url"].to_pylist()
    assert len(set(urls)) < len(urls)
