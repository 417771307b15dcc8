"""Analytics batch (CUSUM / inter-arrival / deciles / label centroids):
serial-replay exactness on synthetic fixtures, independent of the
driver's DuckDB sweep."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from everythinggraph_ray.pipelines.analytics_extra import (
    ANALYTICS_EXTRA_ORACLES,
    q_emb_label_centroid,
    q_events_cusum,
    q_events_interarrival,
    q_lineitem_deciles,
)


def _to_df(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    rng = np.random.default_rng(3)
    n = 4000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                np.sort(rng.integers(0, 40 * 86400, n)) * 1_000_000, unit="us",
                origin="2024-01-01",
            ),
            "user_id": rng.integers(0, 60, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "purchase"], n, p=[0.6, 0.3, 0.1]),
            "value": np.round(rng.uniform(0, 50, n), 4),
        }
    )
    # same-(user, second) twins so the inter-arrival bucket 0 is exercised
    twins = ev.head(50).copy()
    twins["event_id"] = np.arange(n, n + 50, dtype=np.int64)
    ev = pd.concat([ev, twins], ignore_index=True)
    d = tmp_path_factory.mktemp("ev")
    ev.to_parquet(d / "events.parquet")
    return str(d), ev


def test_cusum_equals_serial_recursion(events_dir):
    """The closed-form prefix computation equals the textbook
    S_t = max(0, S_{t-1} + x_t − k) recursion replayed serially."""
    d, ev = events_dir
    got = _to_df(q_events_cusum(d)).sort_values("hour").reset_index(drop=True)

    p = ev[ev["event_type"] == "purchase"].copy()
    hr = p["ts"].dt.floor("h")
    series = hr.value_counts().sort_index()
    x = series.to_numpy(np.int64)
    k = (int(x.sum()) + len(x) - 1) // len(x)
    s, exp = 0, []
    for xi in x:
        s = max(0, s + int(xi) - k)
        exp.append(s)
    assert got["hour"].tolist() == series.index.tolist()
    assert got["x"].tolist() == x.tolist()
    assert got["cusum"].tolist() == exp
    assert max(exp) > 0  # non-vacuous: some drift accumulated


def test_interarrival_equals_serial_replay(events_dir):
    d, ev = events_dir
    got = (
        _to_df(q_events_interarrival(d))
        .sort_values(["event_type", "gap_bits"])
        .reset_index(drop=True)
    )
    s = ev.sort_values(["user_id", "ts", "event_id"]).copy()
    us = s["ts"].astype("int64")  # ns since epoch
    prev = us.groupby(s["user_id"]).shift()
    ok = prev.notna()
    gap_s = ((us[ok] - prev[ok]).astype(np.int64) // 1_000_000_000).to_numpy()
    bits = np.array([int(g).bit_length() for g in gap_s], np.int64)
    exp = (
        pd.DataFrame({"event_type": s["event_type"][ok].to_numpy(), "gap_bits": bits})
        .groupby(["event_type", "gap_bits"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["event_type", "gap_bits"])
        .reset_index(drop=True)
    )
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["gap_bits"].tolist() == exp["gap_bits"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert (got["gap_bits"] == 0).any()  # same-second pairs exercise bucket 0


def test_deciles_tie_invariant_vs_duckdb(tmp_path):
    """Heavy ties (5 distinct prices over 1000 rows, duplicated
    (orderkey, linenumber) pairs) still produce the exact per-decile
    aggregate both sides — the tie-invariance contract."""
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(9)
    n = 1000
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 40, n).astype(np.int64),
            "l_linenumber": rng.integers(1, 8, n).astype(np.int32),
            "l_extendedprice": rng.choice([10.0, 10.0, 25.5, 99.99, 1000.0], n),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet")
    got = (
        _to_df(q_lineitem_deciles(str(d))).sort_values("decile").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    exp = (
        con.execute(ANALYTICS_EXTRA_ORACLES["lineitem_deciles"])
        .df()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    assert got["decile"].tolist() == exp["decile"].tolist() == list(range(1, 11))
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["sum_price_c"].tolist() == exp["sum_price_c"].tolist()


def test_label_centroid_equals_numpy(tmp_path):
    rng = np.random.default_rng(5)
    n, d = 300, 16
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in rng.normal(size=(n, d))],
            "label": rng.integers(0, 4, n).astype(np.int32),
        }
    )
    dd = tmp_path / "sf"
    dd.mkdir()
    emb.to_parquet(dd / "embeddings.parquet")
    got = (
        _to_df(q_emb_label_centroid(str(dd)))
        .sort_values(["label", "d"])
        .reset_index(drop=True)
    )
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(m * 1e6 + 0.5).astype(np.int64)
    lab = emb["label"].to_numpy(np.int64)
    rows = []
    for L in sorted(set(lab)):
        sel = q[lab == L]
        for j in range(d):
            rows.append((L, j + 1, int(sel[:, j].sum()), len(sel)))
    exp = pd.DataFrame(rows, columns=["label", "d", "sum_q", "n_vecs"])
    assert got["label"].tolist() == exp["label"].tolist()
    assert got["d"].tolist() == exp["d"].tolist()
    assert got["sum_q"].tolist() == exp["sum_q"].tolist()
    assert got["n_vecs"].tolist() == exp["n_vecs"].tolist()


def test_bm25_equals_serial_replay(tmp_path):
    """bm25_topk == the textbook serial Okapi computation (same idf,
    same length norm, same fixed term order), including ranks."""
    import math

    from everythinggraph_ray.datapipe.text import bm25_topk

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "hash join hash join window",
                "stream stream stream",
                "hash",
                "the quick brown fox",
                "join window stream hash join",
                "window",
                "",
                "hash hash hash hash hash hash",
            ],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")
    terms = ("hash", "join", "stream")
    got = bm25_topk(
        __import__("ray.data", fromlist=["read_parquet"]).read_parquet(
            str(d / "documents.parquet")
        ),
        terms,
        5,
    )

    import re

    toks = [re.findall(r"[a-z0-9]+", t.lower()) for t in docs["text"]]
    N = len(docs)
    total = sum(len(t) for t in toks)
    avglen = float(total) / N
    dfs = [sum(1 for t in toks if term in t) for term in terms]
    idfs = [math.log((float(N) - df + 0.5) / (df + 0.5) + 1.0) for df in dfs]
    rows = []
    for i, t in enumerate(toks):
        tfs = [t.count(term) for term in terms]
        if sum(tfs) == 0:
            continue
        norm = 1 - 0.75 + 0.75 * (len(t) / avglen)
        s = 0.0
        for j in range(3):
            s = s + (idfs[j] * (tfs[j] * 2.2)) / (tfs[j] + 1.2 * norm)
        rows.append((i, s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    exp = rows[:5]
    assert got["doc_id"].tolist() == [r[0] for r in exp]
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]
    assert np.allclose(got["score"].to_numpy(), [round(r[1], 6) for r in exp], atol=1e-12)


def test_1nn_accuracy_serial_and_tie_rule(tmp_path):
    """1-NN accuracy equals the serial leave-one-out replay, including
    the (sim desc, id asc) tie rule on an EXACT duplicate pair with
    different labels."""
    from everythinggraph_ray.pipelines.analytics_extra import q_emb_1nn_accuracy

    rng = np.random.default_rng(13)
    n, dim = 120, 8
    m = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 3, n).astype(np.int32)
    # duplicate pair with different labels: vec 5 == vec 50; the 1-NN of
    # each must be the other (sim 1.0), resolved by id-ascending ties
    m[50] = m[5]
    labels[5], labels[50] = 0, 1
    emb = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(m), "label": labels}
    )
    d = tmp_path / "sf"
    d.mkdir()
    emb.to_parquet(d / "embeddings.parquet")
    got = _to_df(q_emb_1nn_accuracy(str(d))).sort_values("label").reset_index(drop=True)

    x = m.astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = x @ x.T
    np.fill_diagonal(sims, -np.inf)
    exp = {}
    for i in range(n):
        best = sims[i].max()
        cand = np.flatnonzero(sims[i] == best)
        j = int(cand.min())  # id-ascending tie rule
        L = int(labels[i])
        nn_ok = int(labels[j] == L)
        a, c = exp.get(L, (0, 0))
        exp[L] = (a + 1, c + nn_ok)
    for _, row in got.iterrows():
        a, c = exp[int(row["label"])]
        assert int(row["n"]) == a and int(row["n_correct"]) == c
    # the duplicate pair found each other: vec 5's NN is 50 and vice versa
    assert int(np.flatnonzero(sims[5] == sims[5].max()).min()) == 50


def test_user_growth_and_ab_arms_serial(events_dir):
    from everythinggraph_ray.pipelines.analytics_extra import (
        q_events_ab_arms,
        q_events_user_growth,
    )

    d, ev = events_dir
    got = _to_df(q_events_user_growth(d))
    first = ev.groupby("user_id")["ts"].min().dt.floor("D")
    daily = first.value_counts().sort_index()
    assert got["day"].tolist() == daily.index.tolist()
    assert got["new_users"].tolist() == daily.tolist()
    assert got["cum_users"].tolist() == daily.cumsum().tolist()
    assert got["cum_users"].iloc[-1] == ev["user_id"].nunique()

    import hashlib

    arms_got = _to_df(q_events_ab_arms(d)).sort_values("arm").reset_index(drop=True)
    per_user = ev.groupby("user_id").apply(
        lambda g: (g["event_type"] == "purchase").sum(), include_groups=False
    )
    arm_of = {
        u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        for u in per_user.index
    }
    for a in (0, 1):
        us = [u for u in per_user.index if arm_of[u] == a]
        conv = sum(1 for u in us if per_user[u] > 0)
        row = arms_got[arms_got["arm"] == a].iloc[0]
        assert int(row["n_users"]) == len(us)
        assert int(row["n_converters"]) == conv
        assert int(row["conv_milli"]) == conv * 1000 // len(us)


def test_adamic_adar_equals_bruteforce():
    """score='adamic' == brute-force Adamic–Adar with the same integer
    quantization, on a random simple graph."""
    import pyarrow as pa

    import ray.data

    from everythinggraph_ray.graph.linkpred import common_neighbors_topk

    rng = np.random.default_rng(31)
    src = rng.integers(0, 40, 300).astype(np.int64)
    dst = rng.integers(0, 40, 300).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    got = (
        common_neighbors_topk(edges, 15, score="adamic")
        .to_pandas()
        .reset_index(drop=True)
    )

    es = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = {}
    for c, nbrs in adj.items():
        su = int(np.floor(1e9 / np.log(float(len(nbrs))))) if len(nbrs) >= 2 else None
        if su is None:
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                scores[p] = scores.get(p, 0) + su
    cand = [(p, s) for p, s in scores.items() if p not in es]
    cand.sort(key=lambda t: (-t[1], t[0]))
    exp = cand[:15]
    assert [(int(r["a"]), int(r["b"])) for _, r in got.iterrows()] == [p for p, _ in exp]
    assert got["cnt"].tolist() == [s for _, s in exp]


def test_trigrams_equals_serial_replay(events_dir):
    from everythinggraph_ray.pipelines.analytics_extra import q_events_trigrams

    d, ev = events_dir
    got = (
        _to_df(q_events_trigrams(d))
        .sort_values(["t1", "t2", "t3"])
        .reset_index(drop=True)
    )
    s = ev.sort_values(["user_id", "ts", "event_id"])
    p1 = s.groupby("user_id")["event_type"].shift(1)
    p2 = s.groupby("user_id")["event_type"].shift(2)
    ok = p2.notna()
    exp = (
        pd.DataFrame(
            {"t1": p2[ok].to_numpy(), "t2": p1[ok].to_numpy(),
             "t3": s["event_type"][ok].to_numpy()}
        )
        .groupby(["t1", "t2", "t3"], as_index=False)
        .size()
        .sort_values(["t1", "t2", "t3"])
        .reset_index(drop=True)
    )
    assert got["t1"].tolist() == exp["t1"].tolist()
    assert got["t2"].tolist() == exp["t2"].tolist()
    assert got["t3"].tolist() == exp["t3"].tolist()
    assert got["n"].tolist() == exp["size"].tolist()


def test_sq8_recall_bounds_and_degradation(tmp_path):
    """SQ8 recall: overlaps are in [0, 10]; an aggressively clustered
    corpus with near-identical vectors still keeps positive overlap
    (codes preserve coarse geometry); exact duplicates of the query set
    rank first on both sides."""
    from everythinggraph_ray.pipelines.analytics_extra import q_emb_sq8_recall

    rng = np.random.default_rng(17)
    n, dim = 200, 16
    centers = rng.normal(size=(4, dim))
    m = (centers[rng.integers(0, 4, n)] + 0.05 * rng.normal(size=(n, dim))).astype(
        np.float32
    )
    emb = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(m)}
    )
    d = tmp_path / "sf"
    d.mkdir()
    emb.to_parquet(d / "embeddings.parquet")
    got = _to_df(q_emb_sq8_recall(str(d)))
    assert len(got) == 8
    assert got["n_overlap"].between(0, 10).all()
    assert got["n_overlap"].mean() > 3  # coarse geometry survives 8-bit codes


def test_lineitem_corr_equals_numpy(tmp_path):
    from everythinggraph_ray.pipelines.analytics_extra import q_lineitem_corr

    rng = np.random.default_rng(23)
    n = 2000
    qty = rng.integers(1, 51, n).astype(np.float64)
    price = np.round(qty * 100 + rng.uniform(0, 500, n), 2)  # correlated with qty
    li = pd.DataFrame(
        {
            "l_quantity": qty,
            "l_extendedprice": price,
            "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet")
    got = _to_df(q_lineitem_corr(str(d)))
    row = got[(got["x_name"] == "qty") & (got["y_name"] == "price_d")].iloc[0]
    qi = np.floor(qty + 0.5).astype(np.int64)
    pi = np.floor(price + 0.5).astype(np.int64)
    exp_r = np.corrcoef(qi, pi)[0, 1]
    assert abs(float(row["r"]) - exp_r) < 1e-9
    assert float(row["r"]) > 0.9  # the planted correlation
    assert int(row["sum_x"]) == int(qi.sum()) and int(row["sum_xy"]) == int((qi * pi).sum())
    assert len(got) == 6


def test_cocitation_cosine_equals_bruteforce():
    import pyarrow as pa

    import ray.data

    from everythinggraph_ray.graph.linkpred import cocitation_topk

    rng = np.random.default_rng(29)
    src = rng.integers(0, 50, 400).astype(np.int64)
    dst = rng.integers(100, 140, 400).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    got = cocitation_topk(edges, 10, score="cosine").to_pandas().reset_index(drop=True)

    es = sorted({(a, b) for a, b in zip(src, dst)})
    from collections import defaultdict

    outs = defaultdict(set)
    indeg = defaultdict(int)
    for a, b in es:
        outs[a].add(b)
        indeg[b] += 1
    cnt = defaultdict(int)
    for a in outs:
        ns = sorted(outs[a])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                cnt[(ns[i], ns[j])] += 1
    scored = [
        (p, c, c / (np.sqrt(float(indeg[p[0]])) * np.sqrt(float(indeg[p[1]]))))
        for p, c in cnt.items()
    ]
    scored.sort(key=lambda t: (-t[2], t[0]))
    exp = scored[:10]
    assert [(int(r["a"]), int(r["b"])) for _, r in got.iterrows()] == [p for p, _, _ in exp]
    assert got["cnt"].tolist() == [c for _, c, _ in exp]
    assert np.allclose(got["cosine"].to_numpy(), [s for _, _, s in exp], atol=1e-12)


def test_ewma_equals_serial_recursion(events_dir):
    from everythinggraph_ray.pipelines.analytics_extra import q_events_ewma

    d, ev = events_dir
    got = _to_df(q_events_ewma(d)).sort_values("hour").reset_index(drop=True)
    series = ev["ts"].dt.floor("h").value_counts().sort_index()
    x = series.to_numpy(np.int64)
    s = float(x[0])
    exp = [s]
    for xi in x[1:]:
        s = 0.5 * s + 0.5 * float(xi)
        exp.append(s)
    exp_u = np.floor(np.array(exp) * 1e6 + 0.5).astype(np.int64)
    assert got["hour"].tolist() == series.index.tolist()
    assert got["x"].tolist() == x.tolist()
    assert got["ewma_u"].tolist() == exp_u.tolist()


def test_part_chi2_detects_dependence(tmp_path):
    """chi2 statistic: near zero on an independent grid, large when
    brand determines size; matches an arbitrary-precision serial fold."""
    from everythinggraph_ray.pipelines.analytics_extra import q_part_chi2

    def run(df):
        d = tmp_path / f"sf{len(df)}"
        d.mkdir(exist_ok=True)
        df.to_parquet(d / "part.parquet")
        return _to_df(q_part_chi2(str(d)))

    rng = np.random.default_rng(41)
    n = 3000
    ind = pd.DataFrame(
        {
            "p_brand": [f"Brand#{i % 5}" for i in range(n)],
            "p_size": rng.integers(1, 51, n).astype(np.int32),
        }
    )
    dep = pd.DataFrame(
        {
            "p_brand": [f"Brand#{i % 5}" for i in range(n)],
            # brand i only ships sizes in its own decile band
            "p_size": [(i % 5) * 10 + 1 + int(rng.integers(0, 10)) for i in range(n)],
        }
    )
    chi_ind = int(run(ind)["chi2_milli"].iloc[0])
    chi_dep = int(run(dep)["chi2_milli"].iloc[0])
    assert chi_dep > 20 * max(chi_ind, 1)

    # serial replay with python ints
    got = run(dep)
    cells = got[["brand", "band", "o", "r", "c"]]
    nn = int(cells.drop_duplicates(["brand", "band"])["o"].sum())
    chi = 0
    for _, row in cells.iterrows():
        o, r, c = int(row["o"]), int(row["r"]), int(row["c"])
        chi += ((o * nn - r * c) ** 2 * 1000) // (r * c * nn)
    assert chi == chi_dep
