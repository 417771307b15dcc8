"""Session-9 second wave (Q12-lite / user entropy / burstiness /
Kaplan–Meier / centroid assignment / densest peel): serial-replay
exactness on synthetic fixtures, independent of the driver sweep."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from everythinggraph_ray.pipelines.analytics_extra4 import (
    KM_WINDOW,
    _densest_peel_stats,
    q_emb_centroid_assign,
    q_events_burstiness,
    q_events_kaplan_meier,
    q_events_user_entropy,
    q_q12_priority,
)


def _to_df(res):
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    rng = np.random.default_rng(41)
    n = 3000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 20 * 86400, n) * 1_000_000, unit="us", origin="2024-06-01"
            ),
            "user_id": rng.integers(0, 60, n).astype(np.int64),
            "event_type": rng.choice(
                ["view", "click", "purchase", "error"], n, p=[0.6, 0.25, 0.05, 0.1]
            ),
            "value": np.zeros(n),
        }
    )
    # a few single-type users (entropy 0) and a never-purchasing user
    ev.loc[ev["user_id"] == 3, "event_type"] = "view"
    ev.loc[ev["user_id"] == 7, "event_type"] = ev.loc[
        ev["user_id"] == 7, "event_type"
    ].replace("purchase", "click")
    d = tmp_path_factory.mktemp("ev4")
    ev.to_parquet(d / "events.parquet")
    return str(d), ev


def test_user_entropy_matches_serial(events_dir):
    d, ev = events_dir
    got = _to_df(q_events_user_entropy(d)).sort_values("user_id").reset_index(drop=True)
    ref_rows = []
    for u, grp in ev.groupby("user_id"):
        c = grp["event_type"].value_counts().to_numpy()
        n = int(c.sum())
        h = np.log(n) - float((c * np.log(c)).sum()) / n
        ref_rows.append({"user_id": int(u), "n_events": n, "entropy": round(h, 7)})
    ref = pd.DataFrame(ref_rows)
    assert np.array_equal(got["user_id"].to_numpy(), ref["user_id"].to_numpy())
    assert np.array_equal(got["n_events"].to_numpy(), ref["n_events"].to_numpy())
    np.testing.assert_allclose(got["entropy"], ref["entropy"], rtol=0, atol=1e-7)
    # single-type user scores exactly 0
    assert float(got.loc[got["user_id"] == 3, "entropy"].iloc[0]) == 0.0


def test_burstiness_matches_serial(events_dir):
    d, ev = events_dir
    got = _to_df(q_events_burstiness(d)).sort_values("user_id").reset_index(drop=True)
    rows = []
    for u, grp in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        us = grp["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(us) < 2:
            continue
        g = (us[1:] - us[:-1]) // 1_000_000
        n, s1, s2 = len(g), int(g.sum()), int((g * g).sum())
        dd = n * s2 - s1 * s1
        r = np.sqrt(float(dd))
        b = round((r - s1) / (r + s1), 7) if r + s1 > 0 else 0.0
        rows.append({"user_id": int(u), "n_gaps": n, "s1": s1, "s2": s2, "burstiness": b})
    ref = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(
        got.astype({"burstiness": "float64"}), ref.astype({"user_id": "int64"}),
        check_dtype=False,
    )
    # bounded in (-1, 1)
    assert (got["burstiness"].abs() <= 1.0).all()


def test_kaplan_meier_matches_serial(events_dir):
    d, ev = events_dir
    got = _to_df(q_events_kaplan_meier(d))
    df = ev.copy()
    df["day"] = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    first = df.groupby("user_id")["day"].min()
    p = df[df["event_type"] == "purchase"].groupby("user_id")["day"].min()
    gap = (p.reindex(first.index) - first).to_numpy()
    died = ~np.isnan(gap) & (gap <= KM_WINDOW)
    obs = np.where(np.isnan(gap), KM_WINDOW, np.minimum(gap, KM_WINDOW))
    s = 1_000_000
    rows = []
    for tk in np.sort(np.unique(gap[died])):
        n_risk = int((obs >= tk).sum())
        dcnt = int((died & (gap == tk)).sum())
        s = s * (n_risk - dcnt) // n_risk
        rows.append({"t": int(tk), "n_risk": n_risk, "d": dcnt, "s_ppm": s})
    ref = pd.DataFrame(rows).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    # survival is monotone nonincreasing and within [0, 1e6]
    assert (np.diff(got["s_ppm"].to_numpy()) <= 0).all()
    assert got["s_ppm"].between(0, 1_000_000).all()


def test_q12_matches_pandas(tmp_path):
    rng = np.random.default_rng(19)
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(1, 300, 2000).astype(np.int64),
            "l_returnflag": rng.choice(["A", "N", "R"], 2000),
            "l_shipdate": pd.to_datetime(
                rng.integers(0, 4 * 365, 2000) * 86_400_000_000, unit="us", origin="1995-01-01"
            ),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 300, dtype=np.int64),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], 299
            ),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")
    got = _to_df(q_q12_priority(str(tmp_path))).reset_index(drop=True)
    j = li[(li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1997-01-01")].merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )
    j["h"] = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(np.int64)
    ref = (
        j.groupby("l_returnflag", as_index=False)
        .agg(high_line_count=("h", "sum"), low_line_count=("h", lambda s: int((1 - s).sum())))
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_centroid_assign_matches_serial(tmp_path):
    rng = np.random.default_rng(29)
    n, dims, k = 120, 8, 4
    emb = rng.normal(0, 0.3, (n, dims)).astype(np.float32)
    lab = rng.integers(0, k, n).astype(np.int32)
    emb[lab == 0] += 0.4  # separate one class so accuracy is nontrivial
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [e.tolist() for e in emb],
            "label": lab,
        }
    )
    df.to_parquet(tmp_path / "embeddings.parquet")
    got = _to_df(q_emb_centroid_assign(str(tmp_path)))
    # serial replica of the integer geometry
    q = np.floor(emb.astype(np.float64) * 1000 + 0.5).astype(np.int64) + 1000
    cq = np.zeros((k, dims), np.int64)
    for c in range(k):
        s = q[lab == c].sum(axis=0)
        cq[c] = (s * 1000) // int((lab == c).sum())
    d2 = ((q[:, None, :] * 1000 - cq[None, :, :]) ** 2).sum(axis=2)
    assigned = np.argmin(d2, axis=1)  # argmin takes the first min → smaller label
    ref = (
        pd.DataFrame({"label": lab.astype(np.int64), "assigned": assigned.astype(np.int64)})
        .groupby(["label", "assigned"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, ref)
    assert got["n"].sum() == n


def _serial_peel(src, dst):
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    m = a != b
    e = np.unique(a[m] * (1 << 32) + b[m])
    a, b = e >> 32, e & 0xFFFFFFFF
    stats = []
    r = 0
    while len(a):
        verts, cnt = np.unique(np.r_[a, b], return_counts=True)
        V, E = len(verts), len(a)
        stats.append((r, V, E, (1_000_000 * E) // V))
        surv = verts[cnt * 5 * V > 11 * E]
        keep = np.isin(a, surv) & np.isin(b, surv)
        a, b = a[keep], b[keep]
        r += 1
    return stats


def test_densest_peel_star_empties_mid_round():
    # star K1,10: the center survives the threshold but every leaf is
    # peeled, so the src-side semi join leaves edges whose dst side then
    # empties the set — the hash_join empty-input path (joins._peek_schema)
    src = np.zeros(10, np.int64)
    dst = np.arange(1, 11, dtype=np.int64)
    from everythinggraph_ray.graph.triangles import _canonical_undirected

    e = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    got = _densest_peel_stats(_canonical_undirected(e))
    assert got == _serial_peel(src, dst)
    assert got[0][:3] == (0, 11, 10)


def test_densest_peel_matches_serial():
    from everythinggraph_ray.graph.triangles import _canonical_undirected

    rng = np.random.default_rng(3)
    src = rng.integers(0, 120, 700).astype(np.int64)
    dst = rng.integers(0, 120, 700).astype(np.int64)
    # plant a dense clique on vertices 200..214 so the peel finds it
    cl = np.array([(i, j) for i in range(200, 215) for j in range(i + 1, 215)], np.int64)
    src = np.r_[src, cl[:, 0]]
    dst = np.r_[dst, cl[:, 1]]
    e = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    got = _densest_peel_stats(_canonical_undirected(e))
    want = _serial_peel(src, dst)
    assert got == want
    best = max(got, key=lambda t: (t[3], t[1], -t[0]))
    # the planted 15-clique (density 7) must dominate the sparse noise
    assert best[3] >= 7_000_000
