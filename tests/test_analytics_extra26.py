"""Session-12 tenth wave (Lindley waits / codepoint census / MMR):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra26 import (
    MMR_K,
    MMR_LAMBDA,
    MMR_POOL,
    SERVICE_US,
    q_docs_codepoint_census,
    q_emb_mmr_top10,
    q_events_queue_wait,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_queue_wait_matches_lindley_recursion(tmp_path):
    rng = np.random.default_rng(161)
    n = 600
    base = pd.Timestamp("2024-10-01").value // 1000
    # bursty arrivals: many gaps < service time so queues actually build
    gaps = rng.integers(1, 25, n) * 60_000_000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 7, n).astype(np.int64),
            "ts": pd.to_datetime(base + np.cumsum(gaps), unit="us"),
            "value": rng.normal(0, 1, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_queue_wait(str(tmp_path)))
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    ts_us = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ref = np.empty(n, np.int64)
    for uid, g in ev.groupby("user_id"):
        ix = g.index.to_numpy()
        order = ix[np.lexsort((ev["event_id"].to_numpy()[ix], ts_us[ix]))]
        w = 0
        prev = None
        for j in order:
            if prev is None:
                w = 0
            else:
                w = max(0, w + SERVICE_US - (int(ts_us[j]) - prev))
            ref[j] = w
            prev = int(ts_us[j])
    refdf = pd.DataFrame(
        {"event_id": ev["event_id"], "user_id": ev["user_id"], "wait_us": ref}
    )
    pd.testing.assert_frame_equal(got, refdf)
    assert ref.max() > 0  # the queue actually builds


def test_codepoint_census_matches_python(tmp_path):
    texts = ["ab12 中文!", "ALLCAPS\tand\nlines", "中中中", "?!#", ""]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")

    got = (
        _to_df(q_docs_codepoint_census(str(tmp_path)))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        alpha = sum(c.isascii() and c.isalpha() for c in t)
        digit = sum(c.isascii() and c.isdigit() for c in t)
        cjk = sum(0x4E00 <= ord(c) <= 0x9FFF for c in t)
        space = sum(c in " \t\n\r" for c in t)
        other = len(t) - alpha - digit - cjk - space
        row = got.iloc[i]
        assert (row["n_alpha"], row["n_digit"], row["n_cjk"], row["n_other"]) == (
            alpha,
            digit,
            cjk,
            other,
        ), t


def test_mmr_prefers_diversity_and_replays(tmp_path):
    # query at id 0; a cluster of near-duplicates of the query and one
    # orthogonal-ish vector: plain top-k would take only the cluster,
    # MMR must pick the diverse vector early
    rng = np.random.default_rng(162)
    q = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    dup = np.array([0.999, 0.04, 0.0, 0.0], np.float32)
    dup2 = np.array([0.9991, 0.041, 0.0, 0.0], np.float32)
    dup3 = np.array([0.9989, 0.042, 0.0, 0.0], np.float32)
    # near-orthogonal to the dup cluster but still relevant: beats the
    # near-duplicates on marginal relevance at lambda = 1/2
    div = np.array([0.6, 0.0, 0.8, 0.0], np.float32)
    # irrelevant tail (negative relevance) so it never competes
    rows = [q, dup, dup2, dup3, div] + [
        (np.array([-0.9, 0, 0, 0]) + rng.normal(0, 0.02, 4)).astype(np.float32)
        for _ in range(10)
    ]
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(len(rows), dtype=np.int64),
            "embedding": [r.tolist() for r in rows],
            "label": np.zeros(len(rows), np.int32),
        }
    )
    emb.to_parquet(tmp_path / "embeddings.parquet")

    got = _to_df(q_emb_mmr_top10(str(tmp_path)))
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    assert 0 not in set(got["vec_id"])  # query excluded
    # first pick = most relevant (dup), diverse vector ranks above the
    # remaining near-duplicates
    picks = list(got["vec_id"])
    assert picks[0] == 1  # plain most-relevant first
    assert picks[1] == 4  # the diverse vector beats the near-duplicates

    # serial replay of the greedy over the same pool
    V = np.stack([np.asarray(r, np.float64) for r in rows])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    rel = V @ V[0]
    cand = [i for i in np.lexsort((np.arange(len(rows)), -rel)) if i != 0][:MMR_POOL]
    ids = np.array(cand)
    r = rel[ids]
    M = V[ids]
    chosen: list[int] = []
    max_sim = np.full(len(ids), -np.inf)
    mask = np.zeros(len(ids), bool)
    for _ in range(min(MMR_K, len(ids))):
        pen = np.maximum(max_sim, 0.0)
        score = np.where(mask, -np.inf, MMR_LAMBDA * r - (1 - MMR_LAMBDA) * pen)
        best = int(np.lexsort((ids, -score))[0])
        chosen.append(int(ids[best]))
        mask[best] = True
        max_sim = np.maximum(max_sim, M @ M[best])
    assert picks == chosen
