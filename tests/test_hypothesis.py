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


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=6), min_size=2, max_size=60),
    st.integers(min_value=1, max_value=4),
)
def test_grouped_top_k_property(groups, k):
    """grouped_top_k == pandas reference on arbitrary group/value data."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.stages.agg import grouped_top_k

    n = len(groups)
    rng = np.random.default_rng(n * 31 + k)
    vals = np.round(rng.random(n), 3)  # rounded → deliberate ties
    ids = np.arange(n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(groups, pa.int64()),
                "v": pa.array(vals, pa.float64()),
                "id": pa.array(ids, pa.int64()),
            }
        )
    ).repartition(3)
    got = (
        grouped_top_k(ds, "g", [("v", False), ("id", True)], k)
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"g": groups, "v": vals, "id": ids})
        .sort_values(["v", "id"], ascending=[False, True], kind="stable")
        .groupby("g", as_index=False, sort=False)
        .head(k)
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert got[["g", "v", "id"]].equals(want)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.sampled_from(["a b c d", "a b c e", "x y z w", "p q r s"]), min_size=2, max_size=12))
def test_pairwise_verify_property(texts):
    """Distributed pair verify == direct jaccard for every candidate pair."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.datapipe.dedup import _token_shingles, jaccard, shingle_payloads
    from everythinggraph_ray.datapipe.pairs import pairwise_verify

    ids = list(range(len(texts)))
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    )
    pairs = [(a, b) for a in ids for b in ids if a < b]
    pairs_ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    out = (
        pairwise_verify(
            shingle_payloads(docs), pairs_ds, jaccard, out_col="jaccard",
            pay_type=pa.list_(pa.int64()),
        )
        .to_pandas()
        .set_index(["a", "b"])["jaccard"]
    )
    assert len(out) == len(pairs)
    for a, b in pairs:
        want = jaccard(
            np.sort(_token_shingles(texts[a])), np.sort(_token_shingles(texts[b]))
        )
        assert abs(out.loc[(a, b)] - want) < 1e-7
