"""Hypothesis property tests for the pure functions (no Ray needed)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from everythinggraph_ray.datapipe.dedup import _token_shingles, jaccard
from everythinggraph_ray.graph import oracle as O
from everythinggraph_ray.hashing import url_to_vid, urls_to_vids
from everythinggraph_ray.html import extract_text, normalize_url

words = st.lists(st.text(alphabet="abcdefg hij", min_size=1, max_size=8), max_size=30)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=500))
def test_extract_text_total_and_deterministic(s):
    html = f"<html><body><p>{s}</p></body></html>".encode("utf-8", "replace")
    a = extract_text(html)
    assert a == extract_text(html)
    assert "\x00" not in a or "\x00" in s


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abcxyz:/._-?=&%0123456789", max_size=80))
def test_normalize_url_idempotent(s):
    n = normalize_url("https://host.example/" + s)
    if n is not None:
        assert normalize_url(n) == n  # idempotent


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abc/123.", min_size=1, max_size=20), min_size=1, max_size=50))
def test_urls_to_vids_matches_scalar(urls):
    vec = urls_to_vids(urls)
    assert vec.tolist() == [url_to_vid(u) for u in urls]
    assert (vec >= 0).all()


@settings(max_examples=30, deadline=None)
@given(words, words)
def test_jaccard_bounds(a, b):
    sa = np.sort(_token_shingles(" ".join(a)))
    sb = np.sort(_token_shingles(" ".join(b)))
    j = jaccard(sa, sb)
    assert 0.0 <= j <= 1.0
    assert jaccard(sa, sa) == 1.0


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=120
    )
)
def test_oracle_invariants(edge_list):
    src = np.array([e[0] for e in edge_list], dtype=np.int64)
    dst = np.array([e[1] for e in edge_list], dtype=np.int64)
    vids, pr, _ = O.pagerank_oracle(src, dst, tol=1e-8)
    assert (pr > 0).all()  # every vertex keeps at least the teleport mass
    _, lab = O.wcc_oracle(src, dst)
    # a component's label is a member of the component's vid set
    assert np.isin(lab, vids).all()
    assert (lab <= vids).all()  # min-label ≤ own vid
    root = int(vids[0])
    _, d = O.bfs_oracle(src, dst, root)
    assert d[0] == 1  # root at level 1 (vids[0] == root)
