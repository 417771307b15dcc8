"""Session-9 analytics batch (bipartiteness census / readability /
Yule's K / bounce rate / Pareto share / Q16-lite): serial-replay
exactness on synthetic fixtures, independent of the driver sweep."""

from __future__ import annotations

import re
from collections import Counter, deque

import numpy as np
import pandas as pd
import pytest

import ray.data

from everythinggraph_ray.pipelines.analytics_extra3 import (
    q_docs_readability,
    q_docs_yule_k,
    q_events_bounce_rate,
    q_events_pareto_share,
    q_q16_supplier_counts,
)


def _to_df(res):
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


# ----------------------------------------------------------------------
# BipartiteLevelKernel: component + parity census vs serial BFS
# ----------------------------------------------------------------------
def _serial_census(src, dst):
    """Per-component (n_vertices, n_edges, odd_edges, bipartite) via the
    textbook approach: WCC min-label, BFS parity from each component's
    min vid over the undirected adjacency, odd edge = same-parity
    endpoints among the distinct canonical undirected edges (self-loops
    kept — an odd cycle of length 1)."""
    verts = np.unique(np.concatenate([src, dst]))
    adj = {int(v): set() for v in verts}
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    comp, dist = {}, {}
    for v in sorted(adj):
        if v in comp:
            continue
        comp[v], dist[v] = v, 0
        dq = deque([v])
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in comp:
                    comp[w], dist[w] = v, dist[u] + 1
                    dq.append(w)
    ue = {(min(int(a), int(b)), max(int(a), int(b))) for a, b in zip(src, dst)}
    rows = {}
    for v in adj:
        c = comp[v]
        rows.setdefault(c, [0, 0, 0])[0] += 1
    for a, b in ue:
        c = comp[a]
        rows[c][1] += 1
        if (dist[a] + dist[b]) % 2 == 0:
            rows[c][2] += 1
    return pd.DataFrame(
        [
            {
                "component": c,
                "n_vertices": nv,
                "n_edges": ne,
                "odd_edges": oe,
                "bipartite": int(oe == 0),
            }
            for c, (nv, ne, oe) in sorted(rows.items())
        ]
    ).astype("int64")


def _run_bipartite(src, dst, tmp_path, tag):
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import BipartiteLevelKernel
    from everythinggraph_ray.stages.edges import undirect_edges

    e = ray.data.from_pandas(
        pd.DataFrame({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})
    )
    bdir = str(tmp_path / tag)
    build_graph(undirect_edges(e), bdir, num_partitions=4, hub_threshold=10**9)
    eng = GraphEngine(bdir)
    try:
        res = eng.run(BipartiteLevelKernel())
        df = res["dataset"].to_pandas()
    finally:
        eng.shutdown()
    v = df["bipartite"].to_numpy()
    return pd.DataFrame(
        {
            "vid": df["vid"].to_numpy(),
            "component": v >> np.int64(32),
            "par": v & np.int64(1),
        }
    ).sort_values("vid")


def test_bipartite_kernel_structured(tmp_path):
    # even cycle (bipartite) + odd cycle + self-loop comp + tree
    src = np.array([0, 1, 2, 3, 10, 11, 12, 20, 30, 31, 31], dtype=np.int64)
    dst = np.array([1, 2, 3, 0, 11, 12, 10, 20, 31, 32, 33], dtype=np.int64)
    got = _run_bipartite(src, dst, tmp_path, "struct")
    # serial reference for labels + parity
    ref = _serial_census(src, dst)
    comp = dict(zip(got["vid"], got["component"]))
    par = dict(zip(got["vid"], got["par"]))
    # component labels are min-vid labels
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10, 20: 20, 30: 30, 31: 30, 32: 30, 33: 30}
    # parity = BFS-level parity from the min-vid root
    assert par == {0: 0, 1: 1, 2: 0, 3: 1, 10: 0, 11: 1, 12: 1, 20: 0, 30: 0, 31: 1, 32: 0, 33: 0}
    # census: even cycle bipartite, odd cycle not, self-loop not, tree yes
    want = {0: 1, 10: 0, 20: 0, 30: 1}
    for c, b in want.items():
        assert int(ref.loc[ref["component"] == c, "bipartite"].iloc[0]) == b


def test_bipartite_query_matches_serial_on_random(tmp_path):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 80, 160).astype(np.int64)
    dst = rng.integers(0, 80, 160).astype(np.int64)
    got = _run_bipartite(src, dst, tmp_path, "rand")
    ref = _serial_census(src, dst)
    comp = dict(zip(got["vid"], got["component"]))
    par = dict(zip(got["vid"], got["par"]))
    # rebuild the census from the kernel output exactly as q_rel_bipartite does
    ue = {(min(int(a), int(b)), max(int(a), int(b))) for a, b in zip(src, dst)}
    rows = {}
    for v, c in comp.items():
        rows.setdefault(c, [0, 0, 0])[0] += 1
    for a, b in ue:
        c = comp[a]
        rows[c][1] += 1
        if (par[a] + par[b]) % 2 == 0:
            rows[c][2] += 1
    mine = pd.DataFrame(
        [
            {
                "component": c,
                "n_vertices": nv,
                "n_edges": ne,
                "odd_edges": oe,
                "bipartite": int(oe == 0),
            }
            for c, (nv, ne, oe) in sorted(rows.items())
        ]
    ).astype("int64")
    pd.testing.assert_frame_equal(mine, ref)


def test_bipartite_kernel_rejects_wide_vids():
    from everythinggraph_ray.graph.kernels import BipartiteLevelKernel

    k = BipartiteLevelKernel()
    with pytest.raises(ValueError, match="2\\^31"):
        k.init_values(np.array([1, 1 << 31], dtype=np.int64), None, None)


# ----------------------------------------------------------------------
# Text scoring fixtures
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    rng = np.random.default_rng(17)
    words = ["alpha", "beta", "Gamma", "x9", "the", "zz", "Mr.", "why?", "ok!"]
    texts = []
    for _ in range(80):
        n = int(rng.integers(0, 60))
        texts.append(" ".join(rng.choice(words, n)))
    texts += ["", "...", "!!!", "bcd fgh", "aaa aaa aaa. aaa?"]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    d = tmp_path_factory.mktemp("docs3")
    df.to_parquet(d / "documents.parquet")
    return str(d), df


def test_readability_matches_serial(docs_dir):
    d, df = docs_dir
    got = _to_df(q_docs_readability(d)).sort_values("doc_id").reset_index(drop=True)
    w = df["text"].map(lambda t: len(re.findall(r"\S+", t))).to_numpy(np.int64)
    s = df["text"].map(lambda t: len(re.findall(r"[.!?]+", t))).to_numpy(np.int64)
    vg = df["text"].map(
        lambda t: len(re.findall(r"[aeiouy]+", t.lower()))
    ).to_numpy(np.int64)
    fl = 206835 - (1015 * w) // np.maximum(s, 1) - (84600 * vg) // np.maximum(w, 1)
    assert np.array_equal(got["n_words"].to_numpy(), w)
    assert np.array_equal(got["n_sentences"].to_numpy(), s)
    assert np.array_equal(got["n_vowel_groups"].to_numpy(), vg)
    assert np.array_equal(got["flesch_milli"].to_numpy(), fl)


def test_yule_k_matches_serial(docs_dir):
    d, df = docs_dir
    got = _to_df(q_docs_yule_k(d)).sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(df["text"]):
        c = Counter(re.findall(r"[a-z0-9]+", t.lower()))
        n = sum(c.values())
        s2 = sum(v * v for v in c.values())
        assert int(got.loc[i, "n_tokens"]) == n
        assert int(got.loc[i, "n_types"]) == len(c)
        assert int(got.loc[i, "s2"]) == s2
        want = (10_000_000_000 * (s2 - n)) // (n * n) if n else 0
        assert int(got.loc[i, "yule_micro"]) == want


# ----------------------------------------------------------------------
# Events fixtures: bounce rate + Pareto share
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    rng = np.random.default_rng(23)
    n = 4000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 15 * 86400, n) * 1_000_000, unit="us", origin="2024-05-01"
            ),
            "user_id": rng.choice(
                np.r_[np.arange(50), np.zeros(30, np.int64)], n
            ).astype(np.int64),
            "event_type": rng.choice(["view", "click"], n),
            "value": np.zeros(n),
        }
    )
    d = tmp_path_factory.mktemp("ev3")
    ev.to_parquet(d / "events.parquet")
    return str(d), ev


def test_bounce_rate_matches_serial(events_dir):
    d, ev = events_dir
    got = _to_df(q_events_bounce_rate(d)).sort_values("day").reset_index(drop=True)
    df = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = df["user_id"].to_numpy()
    new = np.ones(len(df), bool)
    new[1:] = (uid[1:] != uid[:-1]) | ((us[1:] - us[:-1]) > 1_800_000_000)
    starts = np.flatnonzero(new)
    sizes = np.diff(np.r_[starts, len(df)])
    day = us[starts] // 86_400_000_000
    ref = (
        pd.DataFrame({"day": day, "bounce": (sizes == 1).astype(np.int64)})
        .groupby("day")
        .agg(n_sessions=("bounce", "size"), n_bounce=("bounce", "sum"))
        .reset_index()
    )
    ref["bounce_ppm"] = (1_000_000 * ref["n_bounce"]) // ref["n_sessions"]
    pd.testing.assert_frame_equal(got, ref.astype("int64"))


def test_pareto_share_matches_serial(events_dir):
    d, ev = events_dir
    got = _to_df(q_events_pareto_share(d))
    c = ev.groupby("user_id").size().reset_index(name="n")
    u = len(c)
    k = (u + 99) // 100
    top = c.sort_values(["n", "user_id"], ascending=[False, True]).head(k)
    assert int(got.loc[0, "n_users"]) == u
    assert int(got.loc[0, "top_users"]) == k
    assert int(got.loc[0, "top_events"]) == int(top["n"].sum())
    assert int(got.loc[0, "total_events"]) == len(ev)
    assert int(got.loc[0, "share_ppm"]) == (1_000_000 * int(top["n"].sum())) // len(ev)


# ----------------------------------------------------------------------
# Q16-lite: distinct suppliers per (brand, size band)
# ----------------------------------------------------------------------
def test_q16_matches_pandas(tmp_path):
    rng = np.random.default_rng(31)
    li = pd.DataFrame(
        {
            "l_partkey": rng.integers(1, 60, 500).astype(np.int64),
            "l_suppkey": rng.integers(1, 25, 500).astype(np.int64),
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(1, 60, dtype=np.int64),
            "p_brand": rng.choice(["Brand#1", "Brand#2", "Brand#3"], 59),
            "p_size": rng.integers(1, 50, 59).astype(np.int64),
            "p_type": rng.choice(["PROMO", "STANDARD", "ECONOMY"], 59),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    part.to_parquet(tmp_path / "part.parquet")
    got = _to_df(q_q16_supplier_counts(str(tmp_path))).reset_index(drop=True)
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j = j[(j["p_brand"] != "Brand#1") & (j["p_type"] != "PROMO")].copy()
    j["size_band"] = j["p_size"] % 5
    ref = (
        j.drop_duplicates(["p_brand", "size_band", "l_suppkey"])
        .groupby(["p_brand", "size_band"], as_index=False)
        .size()
        .rename(columns={"size": "supplier_cnt"})
        .sort_values(["p_brand", "size_band"])
        .reset_index(drop=True)
        .astype({"size_band": "int64", "supplier_cnt": "int64"})
    )
    pd.testing.assert_frame_equal(got, ref)
