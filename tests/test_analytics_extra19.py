"""Session-12 third wave (keyword counts / rolling median / bootstrap
percolation): serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra19 import (
    CASCADE_ROUNDS,
    CASCADE_SEED_MAX,
    CASCADE_THRESH,
    KEYWORDS,
    ROLL_ROWS,
    q_docs_keyword_counts,
    q_events_rolling_median,
    q_rel_threshold_cascade,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_keyword_counts_matches_python_count(tmp_path):
    texts = [
        "data table data",  # data x2, table x1
        "windowwindow spark",  # window x2 (adjacent), spark x1
        "no keywords here at all",
        "datatable",  # data x1, table x1 (substring overlap across words)
        "spark spark spark window",
    ] * 7
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

    got = _to_df(q_docs_keyword_counts(str(tmp_path)))
    for kw in KEYWORDS:
        counts = [t.count(kw) for t in texts]  # str.count = non-overlapping
        row = got[got["keyword"] == kw].iloc[0]
        assert row["n_docs_with"] == sum(c > 0 for c in counts), kw
        assert row["total_occurrences"] == sum(counts), kw
    assert list(got["keyword"]) == sorted(KEYWORDS)


def test_rolling_median_matches_bruteforce_with_duplicate_ts(tmp_path):
    rng = np.random.default_rng(91)
    n = 600
    base = pd.Timestamp("2024-05-01").value // 1000
    ts_us = base + rng.integers(0, 200, n) * 1_000_000  # heavy ts duplication
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 8, n).astype(np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "value": rng.normal(50, 20, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_rolling_median(str(tmp_path)))
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    v = np.floor(ev["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    tsv = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ref_vals = np.empty(n, np.int64)
    for uid, g in ev.groupby("user_id"):
        ix = g.index.to_numpy()
        order = ix[np.lexsort((ev["event_id"].to_numpy()[ix], tsv[ix]))]
        vals = v[order].astype(float)
        for pos, row_ix in enumerate(order):
            w = vals[max(0, pos - ROLL_ROWS + 1) : pos + 1]
            ref_vals[row_ix] = int(round(2 * float(np.median(w))))
    ref = pd.DataFrame(
        {
            "event_id": ev["event_id"],
            "user_id": ev["user_id"],
            "roll_median2x": ref_vals,
        }
    )
    pd.testing.assert_frame_equal(got, ref)
    assert ev.duplicated(subset=["user_id", "ts"], keep=False).any()


def test_threshold_cascade_matches_serial(tmp_path):
    rng = np.random.default_rng(92)
    # dense-enough digraph on 120 vertices that seeds < 20 cascade
    src = rng.integers(0, 120, 2500)
    dst = rng.integers(0, 120, 2500)
    pd.DataFrame({"l_orderkey": src, "l_partkey": dst}).to_parquet(
        tmp_path / "lineitem.parquet"
    )

    got = _to_df(q_rel_threshold_cascade(str(tmp_path)))

    e = set()
    for a, b in zip(src % 1000, dst % 1000):
        if a != b:
            e.add((int(a), int(b)))
    univ = {a for a, _ in e} | {b for _, b in e}
    active = {v for v in univ if v < CASCADE_SEED_MAX}
    ref = [(0, len(active))]
    for rnd in range(1, CASCADE_ROUNDS + 1):
        cnt: dict[int, int] = {}
        for a, b in e:
            if a in active:
                cnt[b] = cnt.get(b, 0) + 1
        active |= {v for v, c in cnt.items() if c >= CASCADE_THRESH}
        ref.append((rnd, len(active)))
    refdf = pd.DataFrame(ref, columns=["rnd", "n_active"]).astype("int64")
    pd.testing.assert_frame_equal(got, refdf)
    # the cascade actually spreads beyond the seeds and grows over rounds
    assert refdf["n_active"].iloc[-1] > refdf["n_active"].iloc[0]
    assert refdf["n_active"].is_monotonic_increasing
