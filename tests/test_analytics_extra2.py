"""Session-8 analytics batch (Q8 share / rolling users / attribution /
Levenshtein pairs / embedding outliers): serial-replay exactness on
synthetic fixtures, independent of the driver's DuckDB sweep."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from everythinggraph_ray.pipelines.analytics_extra2 import (
    _levenshtein,
    q_docs_lev_pairs,
    q_emb_outliers,
    q_events_attribution,
    q_events_rolling_users,
)


def _to_df(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _ref_lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, dp[j] = dp[j], cur
    return dp[n]


def test_levenshtein_matches_textbook_dp():
    rng = np.random.default_rng(11)
    alpha = "abcde"
    for _ in range(200):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 24)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 24)))
        assert _levenshtein(a, b) == _ref_lev(a, b)
    assert _levenshtein("", "") == 0
    assert _levenshtein("abc", "") == 3
    assert _levenshtein("", "xyz") == 3


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    rng = np.random.default_rng(5)
    n = 3000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 20 * 86400, n) * 1_000_000, unit="us", origin="2024-03-01"
            ),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": rng.choice(
                ["view", "click", "purchase"], n, p=[0.55, 0.3, 0.15]
            ),
            "value": np.round(rng.uniform(0, 10, n), 4),
            "props": ["{}"] * n,
        }
    )
    d = tmp_path_factory.mktemp("ev2")
    ev.to_parquet(d / "events.parquet")
    return str(d), ev


def test_rolling_users_equals_serial_window(events_dir):
    d, ev = events_dir
    got = _to_df(q_events_rolling_users(d)).sort_values("day").reset_index(drop=True)
    day = (
        ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    )
    du = pd.DataFrame({"d": day, "u": ev["user_id"]}).drop_duplicates()
    days = np.sort(du["d"].unique())
    want = [
        (int(e), int(du.loc[(du["d"] >= e - 6) & (du["d"] <= e), "u"].nunique()))
        for e in days
    ]
    want = pd.DataFrame(want, columns=["day", "users7"])
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_attribution_equals_serial_lag(events_dir):
    d, ev = events_dir
    got = (
        _to_df(q_events_attribution(d))
        .sort_values("prev_type")
        .reset_index(drop=True)
        .astype({"prev_type": str, "conversions": "int64"})
    )
    s = ev.sort_values(["user_id", "ts", "event_id"])
    prev = s.groupby("user_id")["event_type"].shift().fillna("(none)")
    want = (
        prev[s["event_type"].to_numpy() == "purchase"]
        .value_counts()
        .rename_axis("prev_type")
        .reset_index(name="conversions")
        .sort_values("prev_type")
        .reset_index(drop=True)
        .astype({"prev_type": str, "conversions": "int64"})
    )
    pd.testing.assert_frame_equal(got, want)


@pytest.fixture(scope="module")
def docs_emb_dir(tmp_path_factory):
    rng = np.random.default_rng(9)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    texts, langs = [], []
    for i in range(120):
        base = " ".join(rng.choice(words, 20))
        texts.append(base)
        langs.append(rng.choice(["en", "de"]))
        if i % 4 == 0:  # shared-prefix near-twins so blocks pair up
            texts.append(base[:30] + " " + " ".join(rng.choice(words, 10)))
            langs.append(langs[-1])
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(80, dtype=np.int64),
            "embedding": [rng.uniform(-0.5, 0.5, 16).astype(np.float32) for _ in range(80)],
            "label": np.zeros(80, np.int32),
        }
    )
    d = tmp_path_factory.mktemp("de2")
    docs.to_parquet(d / "documents.parquet")
    emb.to_parquet(d / "embeddings.parquet")
    return str(d), docs, emb


def test_lev_pairs_equals_serial_blocking(docs_emb_dir):
    d, docs, _ = docs_emb_dir
    got = (
        _to_df(q_docs_lev_pairs(d))
        .sort_values(["doc1", "doc2"])
        .reset_index(drop=True)
        .astype("int64")
    )
    rows = []
    key = docs["lang"] + "|" + docs["text"].str[:12]
    for _, grp in docs.assign(key=key).groupby("key"):
        grp = grp.sort_values("doc_id")
        ids = grp["doc_id"].to_numpy()
        ss = grp["text"].str[:64].to_numpy()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows.append((ids[i], ids[j], _ref_lev(ss[i], ss[j])))
    want = (
        pd.DataFrame(rows, columns=["doc1", "doc2", "dist"])
        .sort_values(["doc1", "doc2"])
        .reset_index(drop=True)
        .astype("int64")
    )
    assert len(want) > 0  # fixture must exercise non-trivial blocks
    pd.testing.assert_frame_equal(got, want)


def test_emb_outliers_equals_serial_energy(docs_emb_dir):
    d, _, emb = docs_emb_dir
    got = (
        _to_df(q_emb_outliers(d)).sort_values("vec_id").reset_index(drop=True).astype("int64")
    )
    x = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    q = np.floor(x * 1_000_000 + 0.5).astype(np.int64).astype(object)
    n = len(q)
    S = q.sum(axis=0)
    c = q * n - S
    score = (c * c).sum(axis=1)
    order = sorted(range(n), key=lambda i: (-int(score[i]), i))[:20]
    want = (
        pd.DataFrame(
            {"vec_id": np.asarray(order, np.int64), "score": [int(score[i]) for i in order]}
        )
        .sort_values("vec_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, want)


def test_top_user_per_day_equals_serial_window(events_dir):
    from everythinggraph_ray.pipelines.analytics_extra2 import q_events_top_user_per_day

    d, ev = events_dir
    got = (
        _to_df(q_events_top_user_per_day(d))
        .sort_values("day")
        .reset_index(drop=True)
        .astype("int64")
    )
    day = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    vu = np.floor(ev["value"].to_numpy() * 1_000_000 + 0.5).astype(np.int64)
    s = (
        pd.DataFrame({"day": day, "user_id": ev["user_id"], "spend_u": vu})
        .groupby(["day", "user_id"], as_index=False)["spend_u"]
        .sum()
        .sort_values(["day", "spend_u", "user_id"], ascending=[True, False, True])
    )
    want = s.groupby("day", as_index=False).first().astype("int64")
    pd.testing.assert_frame_equal(got, want[["day", "user_id", "spend_u"]])


def test_knn_wcc_mutuality_and_minlabel(docs_emb_dir):
    """Serial replay: exact cosine top-5, mutual filter, min-label
    components via union-find."""
    from everythinggraph_ray.pipelines.analytics_extra2 import KNN_WCC_K, q_emb_knn_wcc

    d, _, emb = docs_emb_dir
    got = _to_df(q_emb_knn_wcc(d)).sort_values("vec_id").reset_index(drop=True).astype("int64")
    x = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = np.floor(xn @ xn.T * 1000).astype(np.int64)
    n = len(x)
    tops = {}
    for i in range(n):
        order = sorted((j for j in range(n) if j != i), key=lambda j: (-sims[i, j], j))
        tops[i] = set(order[:KNN_WCC_K])
    mut = [(i, j) for i in range(n) for j in tops[i] if i < j and i in tops[j]]
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in mut:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted({v for p in mut for v in p})
    want = pd.DataFrame(
        {"vec_id": members, "cluster_id": [find(v) for v in members]}
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_ltv_deciles_equals_serial_ntile(events_dir):
    from everythinggraph_ray.pipelines.analytics_extra2 import q_events_ltv_deciles

    d, ev = events_dir
    got = _to_df(q_events_ltv_deciles(d)).sort_values("tile").reset_index(drop=True).astype("int64")
    vu = np.floor(ev["value"].to_numpy() * 1_000_000 + 0.5).astype(np.int64)
    s = (
        pd.DataFrame({"user_id": ev["user_id"], "spend_u": vu})
        .groupby("user_id", as_index=False)["spend_u"]
        .sum()
        .sort_values(["spend_u", "user_id"])
        .reset_index(drop=True)
    )
    n, k = len(s), 10
    base, extra = divmod(n, k)
    tiles = np.repeat(np.arange(1, k + 1), [base + (1 if i < extra else 0) for i in range(k)])
    s["tile"] = tiles
    want = (
        s.groupby("tile", as_index=False)
        .agg(n_users=("user_id", "size"), spend_u=("spend_u", "sum"))
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, want)


def test_degree_gini_matches_closed_form(tmp_path):
    """Serial replay of the rank formula on the derived edge table."""
    from everythinggraph_ray.pipelines.analytics_extra2 import q_rel_degree_gini

    rng = np.random.default_rng(21)
    n = 2000
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 5000, n).astype(np.int64),
            "l_partkey": rng.integers(0, 5000, n).astype(np.int64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _to_df(q_rel_degree_gini(str(tmp_path))).iloc[0]
    src = li["l_orderkey"].to_numpy() % 1000
    dst = li["l_partkey"].to_numpy() % 1000
    verts = np.unique(np.concatenate([src, dst]))
    deg = pd.Series(dst).value_counts().reindex(verts, fill_value=0)
    d = deg.sort_index().to_numpy(np.int64)
    order = np.lexsort((verts, d))
    ds_ = d[order]
    nn = len(ds_)
    ranks = np.arange(1, nn + 1, dtype=np.int64)
    sd, srd = int(ds_.sum()), int((ranks * ds_).sum())
    want = (2 * srd - (nn + 1) * sd) * 1_000_000 // (nn * sd)
    assert int(got["n_vertices"]) == nn
    assert int(got["sum_deg"]) == sd
    assert int(got["gini_ppm"]) == want


def test_kl_nonnegative_and_zero_for_uniform(tmp_path):
    """KL(lang||corpus) is ~0 when every language shares one word
    distribution, and strictly positive when distributions differ."""
    from everythinggraph_ray.pipelines.analytics_extra2 import q_docs_kl

    same = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["alpha beta gamma"] * 4,
            "lang": ["en", "en", "de", "de"],
            "source": ["s"] * 4,
            "n_chars": [16] * 4,
        }
    )
    d1 = tmp_path / "u"
    d1.mkdir()
    same.to_parquet(d1 / "documents.parquet")
    r1 = _to_df(q_docs_kl(str(d1)))
    assert np.allclose(r1["kl"].to_numpy(), 0.0, atol=1e-9)

    diff = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["alpha alpha alpha", "alpha beta", "zeta zeta zeta", "zeta eta"],
            "lang": ["en", "en", "de", "de"],
            "source": ["s"] * 4,
            "n_chars": [16] * 4,
        }
    )
    d2 = tmp_path / "v"
    d2.mkdir()
    diff.to_parquet(d2 / "documents.parquet")
    r2 = _to_df(q_docs_kl(str(d2)))
    assert (r2["kl"].to_numpy() > 0.1).all()


def test_coreness_matches_serial_peel():
    """Distributed level-sweep peel == textbook serial peel, on a graph
    with chains (long deg<=1 cascades), a clique, and self-loop-only
    vertices (core 0)."""
    import ray.data

    from everythinggraph_ray.graph.kcore import coreness, coreness_serial

    rng = np.random.default_rng(33)
    src = list(rng.integers(0, 300, 900))
    dst = list(rng.integers(0, 300, 900))
    # a 6-clique (core 5), a 40-vertex path (core 1), self-loop islands
    for i in range(400, 406):
        for j in range(400, 406):
            if i < j:
                src.append(i)
                dst.append(j)
    for i in range(500, 540):
        src.append(i)
        dst.append(i + 1)
    src += [900, 901]
    dst += [900, 901]
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    core, rounds = coreness(edges)
    got = {int(r["vid"]): int(r["core"]) for r in core.take_all()}
    want = coreness_serial(src, dst)
    assert got == want
    assert got[400] == 5 and got[510] == 1 and got[900] == 0
    assert rounds >= 2


def test_coreness_spill_cut_path():
    """A long path graph forces > spill_every peel rounds, exercising
    the lineage-cut branch."""
    import ray.data

    from everythinggraph_ray.graph.kcore import coreness, coreness_serial

    n = 60  # path of 60 vertices peels ~30 rounds at k=1
    src = np.arange(0, n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    core, rounds = coreness(edges)
    got = {int(r["vid"]): int(r["core"]) for r in core.take_all()}
    assert got == coreness_serial(src, dst)
    assert rounds > 20  # proves the spill-cut branch ran


def test_q2_min_cost_supplier_serial(tmp_path):
    from everythinggraph_ray.pipelines.analytics_extra2 import q_q2_min_cost_supplier

    rng = np.random.default_rng(8)
    n = 500
    li = pd.DataFrame(
        {
            "l_partkey": rng.integers(0, 40, n).astype(np.int64),
            "l_suppkey": rng.integers(0, 10, n).astype(np.int64),
            "l_quantity": rng.integers(1, 50, n).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(100, 9000, n), 2),
            "l_discount": np.round(rng.choice([0.0, 0.05, 0.1], n), 2),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = (
        _to_df(q_q2_min_cost_supplier(str(tmp_path)))
        .sort_values("p_partkey")
        .reset_index(drop=True)
        .astype("int64")
    )
    rev = np.floor(li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5).astype(np.int64)
    qty = np.floor(li["l_quantity"] + 0.5).astype(np.int64)
    df = pd.DataFrame(
        {
            "p_partkey": li["l_partkey"],
            "s_suppkey": li["l_suppkey"],
            "unit_milli": rev * 1000 // qty,
        }
    ).sort_values(["p_partkey", "unit_milli", "s_suppkey"])
    want = df.groupby("p_partkey", as_index=False).first().astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_normalize_serial_parity(docs_emb_dir):
    import re

    from everythinggraph_ray.pipelines.analytics_extra2 import q_docs_normalize

    d, docs, _ = docs_emb_dir
    got = _to_df(q_docs_normalize(d)).sort_values("doc_id").reset_index(drop=True)
    want_text = [
        re.sub(r"\s+", " ", re.sub(r"[.,;:!?]", "", t.lower())).strip() for t in docs["text"]
    ]
    assert list(got["norm_text"]) == want_text
    assert list(got["n_chars_norm"]) == [len(t) for t in want_text]


def test_minhash_recall_known_fixture(tmp_path):
    """Near-identical docs must be found (recall 1.0 on an easy
    fixture); the true-pair count matches a serial shingle-Jaccard."""
    from everythinggraph_ray.pipelines.analytics_extra2 import (
        MINHASH_RECALL_T,
        q_docs_minhash_recall,
    )

    rng = np.random.default_rng(17)
    words = ["red", "green", "blue", "cyan", "teal", "plum", "gold", "jade"]
    texts = []
    for i in range(30):
        base = " ".join(rng.choice(words, 30))
        texts.append(base)
        if i % 3 == 0:  # a near-twin: one word changed
            toks = base.split()
            toks[5] = "swap"
            texts.append(" ".join(toks))
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    row = _to_df(q_docs_minhash_recall(str(tmp_path))).iloc[0]

    # serial truth: 3-shingle Jaccard >= t over all pairs
    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = [sh(t) for t in texts]
    n_true = sum(
        1
        for i in range(len(sets))
        for j in range(i + 1, len(sets))
        if len(sets[i] & sets[j]) / max(1, len(sets[i] | sets[j])) >= MINHASH_RECALL_T
    )
    assert int(row["n_true"]) == n_true
    assert n_true >= 10  # the fixture really contains near-twins
    assert int(row["recall_ppm"]) >= 900_000  # near-twins are easy for 16x4 bands


def test_first_last_serial(events_dir, tmp_path):
    from everythinggraph_ray.pipelines.analytics_extra2 import q_orders_first_last

    rng = np.random.default_rng(12)
    n = 800
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.integers(0, 60, n).astype(np.int64),
            "o_orderdate": pd.to_datetime(
                rng.integers(0, 400, n) * 86_400_000_000, unit="us", origin="1996-01-01"
            ),
            "o_totalprice": np.round(rng.uniform(100, 30000, n), 2),
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")
    got = (
        _to_df(q_orders_first_last(str(tmp_path)))
        .sort_values("custkey")
        .reset_index(drop=True)
        .astype("int64")
    )
    df = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).copy()
    df["price_c"] = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    df["day"] = df["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
    gb = df.groupby("o_custkey")
    want = pd.DataFrame(
        {
            "custkey": gb.size().index.to_numpy(np.int64),
            "n_orders": gb.size().to_numpy(np.int64),
            "first_price_c": gb["price_c"].first().to_numpy(np.int64),
            "last_price_c": gb["price_c"].last().to_numpy(np.int64),
            "span_days": (gb["day"].last() - gb["day"].first()).to_numpy(np.int64),
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_bowtie_regions_on_constructed_graph(tmp_path):
    """A graph built to have all four regions: a 3-cycle CORE, an IN
    chain, an OUT chain, and a disconnected pair (OTHER). rel_edges
    derives src/dst as (orderkey, partkey) % 1000, so the fixture
    writes vids directly."""
    from everythinggraph_ray.pipelines.analytics_extra2 import q_rel_bowtie

    # core: 10<->11<->12 cycle; in: 1 -> 2 -> 10; out: 12 -> 20 -> 21;
    # other: 30 -> 31 (disconnected from core)
    src = [10, 11, 12, 1, 2, 12, 20, 30]
    dst = [11, 12, 10, 2, 10, 20, 21, 31]
    li = pd.DataFrame(
        {"l_orderkey": np.asarray(src, np.int64), "l_partkey": np.asarray(dst, np.int64)}
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _to_df(q_rel_bowtie(str(tmp_path)))
    regions = dict(zip(got["vid"].astype(int), got["region"].astype(str)))
    assert {regions[v] for v in (10, 11, 12)} == {"CORE"}
    assert regions[1] == "IN" and regions[2] == "IN"
    assert regions[20] == "OUT" and regions[21] == "OUT"
    assert regions[30] == "OTHER" and regions[31] == "OTHER"


def test_reach_kernel_multi_source(tmp_path):
    """ReachKernel: reach(v) == 1 iff some seed has a directed path to
    v, on a random digraph vs a serial BFS closure."""
    import ray.data

    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.kernels import ReachKernel
    from everythinggraph_ray.pipelines.queries import _run_engine

    rng = np.random.default_rng(7)
    n_e, V = 400, 120
    src = rng.integers(0, V, n_e).astype(np.int64)
    dst = rng.integers(0, V, n_e).astype(np.int64)
    seeds = [3, 77]
    edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    bdir = str(tmp_path / "build")
    build_graph(edges, bdir, num_partitions=4, hub_threshold=10**9)
    got = _run_engine(bdir, ReachKernel(seeds))
    adj: dict[int, list[int]] = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), []).append(int(b))
    seen = set(seeds)
    stack = list(seeds)
    while stack:
        u = stack.pop()
        for w in adj.get(u, []):
            if w not in seen:
                seen.add(w)
                stack.append(w)
    want = {int(v): int(v in seen) for v in np.unique(np.concatenate([src, dst]))}
    assert dict(zip(got["vid"].astype(int), got["reach"].astype(int))) == want


def test_abandonment_serial(events_dir):
    from everythinggraph_ray.pipelines.analytics_extra2 import (
        ABANDON_WIN_US,
        q_events_abandonment,
    )

    d, ev = events_dir
    got = _to_df(q_events_abandonment(d)).sort_values("day").reset_index(drop=True).astype("int64")
    us = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    df = pd.DataFrame({"u": ev["user_id"], "us": us, "et": ev["event_type"]})
    buys = {u: np.sort(g["us"].to_numpy()) for u, g in df[df["et"] == "purchase"].groupby("u")}
    rows = []
    for _, r in df[df["et"] == "view"].iterrows():
        b = buys.get(r["u"], np.array([], np.int64))
        i = np.searchsorted(b, r["us"])
        ok = i < len(b) and b[i] - r["us"] <= ABANDON_WIN_US
        rows.append((r["us"] // 86_400_000_000, 1, int(ok)))
    s = pd.DataFrame(rows, columns=["day", "v", "c"]).groupby("day", as_index=False).sum()
    s["abandon_ppm"] = (s["v"] - s["c"]) * 1_000_000 // s["v"]
    want = s.rename(columns={"v": "n_views", "c": "n_converted"}).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_supplier_hhi_bounds_and_monopoly(tmp_path):
    """HHI == 1e6 for a single-supplier nation; matches the closed form
    on a two-supplier split."""
    from everythinggraph_ray.pipelines.analytics_extra2 import q_supplier_hhi

    pd.DataFrame(
        {"n_nationkey": np.asarray([0, 1], np.int32), "n_name": ["MONO", "DUO"],
         "n_regionkey": np.asarray([0, 0], np.int32)}
    ).to_parquet(tmp_path / "nation.parquet")
    pd.DataFrame(
        {
            "s_suppkey": np.asarray([1, 2, 3], np.int64),
            "s_nationkey": np.asarray([0, 1, 1], np.int32),
            "s_name": ["a", "b", "c"],
            "s_acctbal": [0.0, 0.0, 0.0],
        }
    ).to_parquet(tmp_path / "supplier.parquet")
    li = pd.DataFrame(
        {
            "l_suppkey": np.asarray([1, 1, 2, 3], np.int64),
            "l_extendedprice": [100.0, 200.0, 100.0, 300.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0],
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _to_df(q_supplier_hhi(str(tmp_path))).set_index("nation")
    assert int(got.loc["MONO", "hhi_ppm"]) == 1_000_000
    # DUO: 10000 and 30000 cents -> (1e8 + 9e8)*1e6 // 16e8 = 625000
    assert int(got.loc["DUO", "hhi_ppm"]) == 625_000
