"""Session-10 wave (DBSCAN / 2-approx vertex cover / CUBE / UNPIVOT /
md5-Bernoulli sample): serial-replay exactness on synthetic fixtures."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

from everythinggraph_ray.pipelines.analytics_extra8 import (
    DBSCAN_EPS_SIM,
    DBSCAN_MIN_PTS,
    SAMPLE_HEX8,
    q_docs_lang_source_cube,
    q_docs_lang_source_unpivot,
    q_emb_dbscan,
    q_events_hash_sample,
    q_rel_vertex_cover,
)


def _to_df(res):
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _dbscan_serial(vecs: np.ndarray, ids: np.ndarray) -> pd.DataFrame:
    """Textbook DBSCAN with the module's deterministic tie rules:
    cluster id = min core vid of the component, border → min cluster
    among core neighbors, noise absent."""
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    S = n @ n.T
    adj = (S >= DBSCAN_EPS_SIM) & ~np.eye(len(vecs), dtype=bool)
    deg = adj.sum(1)
    is_core = deg >= DBSCAN_MIN_PTS
    # min-label fixpoint over core↔core edges
    lab = {int(ids[i]): int(ids[i]) for i in range(len(ids)) if is_core[i]}
    changed = True
    while changed:
        changed = False
        for i in range(len(ids)):
            if not is_core[i]:
                continue
            for j in np.nonzero(adj[i])[0]:
                if is_core[j] and lab[int(ids[j])] < lab[int(ids[i])]:
                    lab[int(ids[i])] = lab[int(ids[j])]
                    changed = True
    rows = [
        {"vec_id": int(ids[i]), "cluster_id": lab[int(ids[i])], "is_core": True}
        for i in range(len(ids))
        if is_core[i]
    ]
    for i in range(len(ids)):
        if is_core[i]:
            continue
        cn = [lab[int(ids[j])] for j in np.nonzero(adj[i])[0] if is_core[j]]
        if cn:
            rows.append(
                {"vec_id": int(ids[i]), "cluster_id": min(cn), "is_core": False}
            )
    return (
        pd.DataFrame(rows, columns=["vec_id", "cluster_id", "is_core"])
        .sort_values("vec_id")
        .reset_index(drop=True)
        .astype({"vec_id": "int64", "cluster_id": "int64", "is_core": "bool"})
    )


def test_dbscan_matches_serial(tmp_path):
    rng = np.random.default_rng(8)
    base = rng.normal(0, 1, (4, 16))
    rows = []
    for i in range(60):
        if i < 48:  # 4 dense blobs of 12
            v = base[i % 4] + rng.normal(0, 0.12, 16)
        else:  # background noise
            v = rng.normal(0, 1, 16)
        rows.append(v.astype(np.float32))
    ids = np.arange(100, 160, dtype=np.int64)
    pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [r.tolist() for r in rows],
            "label": np.zeros(60, np.int32),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    got = (
        _to_df(q_emb_dbscan(str(tmp_path)))
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ref = _dbscan_serial(
        np.array([np.asarray(r, np.float64) for r in rows]), ids
    )
    assert len(ref) >= 40  # the blobs actually clustered
    assert ref["is_core"].sum() >= 30 and (~ref["is_core"]).sum() >= 0
    pd.testing.assert_frame_equal(got, ref)
    # the planted blobs come out as more than one cluster (some may
    # merge through bridging noise points — exactness above is the test)
    assert got.loc[got["is_core"], "cluster_id"].nunique() >= 2


def test_vertex_cover_covers_every_edge(tmp_path):
    from everythinggraph_ray.graph.matching import matching_serial

    rng = np.random.default_rng(12)
    src = rng.integers(0, 80, 300).astype(np.int64)
    dst = rng.integers(0, 80, 300).astype(np.int64)
    pd.DataFrame({"l_orderkey": src, "l_partkey": dst}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got = set(_to_df(q_rel_vertex_cover(str(tmp_path)))["vid"])
    # covers every non-self-loop edge
    for s, d in zip(src, dst):
        if s != d:
            assert s in got or d in got
    # and is exactly the matched endpoints of the deterministic matching
    m = matching_serial(src, dst)
    assert got == {v for e in m for v in e}


def _docs_fixture(tmp_path, n=400, langs=("en", "de", "fr"), n_src=5):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["x"] * n,
            "lang": rng.choice(list(langs), n),
            "source": rng.choice([f"src{i}" for i in range(n_src)], n),
            "n_chars": np.ones(n, np.int64),
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    return df


def test_cube_matches_pandas(tmp_path):
    df = _docs_fixture(tmp_path)
    got = (
        _to_df(q_docs_lang_source_cube(str(tmp_path)))
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    fine = df.groupby(["lang", "source"], as_index=False).size().rename(columns={"size": "n"})
    pl = fine.groupby("lang", as_index=False)["n"].sum().assign(source="(all)")
    ps = fine.groupby("source", as_index=False)["n"].sum().assign(lang="(all)")
    tot = pd.DataFrame({"lang": ["(all)"], "source": ["(all)"], "n": [len(df)]})
    ref = (
        pd.concat([fine, pl, ps, tot], ignore_index=True)[["lang", "source", "n"]]
        .astype({"n": "int64"})
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)
    # grand total appears exactly once and equals the row count
    assert int(got.loc[(got["lang"] == "(all)") & (got["source"] == "(all)"), "n"].iloc[0]) == len(df)


def test_unpivot_dense_grid_with_zeros(tmp_path):
    df = _docs_fixture(tmp_path, n_src=3)  # sources src0-2 only → 17 zero cols per lang
    got = _to_df(q_docs_lang_source_unpivot(str(tmp_path)))
    langs = sorted(df["lang"].unique())
    assert len(got) == len(langs) * 20  # dense grid
    assert int(got["n"].sum()) == len(df)
    # a cell that cannot occur is present and zero
    z = got[(got["source"] == "src19")]
    assert len(z) == len(langs) and (z["n"] == 0).all()
    fine = df.groupby(["lang", "source"], as_index=False).size()
    for _, r in fine.iterrows():
        assert (
            int(
                got[(got["lang"] == r["lang"]) & (got["source"] == r["source"])][
                    "n"
                ].iloc[0]
            )
            == r["size"]
        )


def test_hash_sample_matches_serial(tmp_path):
    rng = np.random.default_rng(4)
    n = 3000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(10_000, 10_000 + n, dtype=np.int64),
            "ts": pd.date_range("2024-01-01", periods=n, freq="min"),
            "user_id": rng.integers(0, 50, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "purchase"], n),
            "value": np.round(rng.uniform(-5, 100, n), 3),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    got = (
        _to_df(q_events_hash_sample(str(tmp_path)))
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    keep = ev["event_id"].map(
        lambda e: hashlib.md5(str(int(e)).encode()).hexdigest()[:8] < SAMPLE_HEX8
    )
    s = ev[keep].copy()
    s["value_c"] = np.floor(s["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    ref = (
        s.groupby("event_type", as_index=False)
        .agg(n=("value_c", "size"), sum_value_c=("value_c", "sum"))
        .astype({"n": "int64", "sum_value_c": "int64"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    # the keep rate is in the Bernoulli ballpark, not degenerate
    assert 0.10 < keep.mean() < 0.22
    pd.testing.assert_frame_equal(got, ref)
