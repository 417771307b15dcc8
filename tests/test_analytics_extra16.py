"""Session-11 fourth wave (Holt-Winters / naive Bayes langid / greedy
set cover): serial-replay exactness + classifier accuracy."""

from __future__ import annotations

import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.datapipe.text import WORD_RE
from everythinggraph_ray.pipelines.analytics_extra12 import _tdiv2
from everythinggraph_ray.pipelines.analytics_extra16 import (
    COVER_ROUNDS,
    HW_PERIOD,
    NB_LANGS,
    _tok_key,
    q_docs_nb_langid,
    q_events_holt_winters,
    q_supplier_cover_greedy,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_holt_winters_matches_serial_with_seasonality(tmp_path):
    rng = np.random.default_rng(61)
    n = 1200
    day = rng.integers(0, 35, n)
    # strong weekly pattern + downward trend so seasonal AND negative
    # trend paths are exercised
    base = 20_000 - 300 * day + 5_000 * np.sin(2 * np.pi * (day % 7) / 7)
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime("2023-01-02")
            + pd.to_timedelta(day, unit="D")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "value": base + rng.normal(0, 40, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = _to_df(q_events_holt_winters(str(tmp_path))).reset_index(drop=True)

    dd = ev.copy()
    dd["day"] = dd["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    dd["v"] = np.floor(dd["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    days = dd.groupby("day", as_index=False)["v"].sum().sort_values("day")
    lev, b = int(days["v"].iloc[0]), 0
    reg = [0] * HW_PERIOD
    L, B, G = [lev], [0], [0]
    for v in days["v"].iloc[1:]:
        g7 = reg[-1]
        l_new = _tdiv2(int(v) - g7 + lev + b)
        b = _tdiv2(l_new - lev + b)
        g_new = _tdiv2(int(v) - l_new + g7)
        lev = l_new
        reg = [g_new] + reg[:-1]
        L.append(lev)
        B.append(b)
        G.append(g_new)
    days["level_milli"] = np.array(L, np.int64)
    days["trend_milli"] = np.array(B, np.int64)
    days["season_milli"] = np.array(G, np.int64)
    ref = days.reset_index(drop=True).astype("int64")
    assert (ref["trend_milli"] < 0).any()  # trunc-vs-floor divergence hit
    assert ref["season_milli"].abs().max() > 1000  # seasonality learned
    pd.testing.assert_frame_equal(got, ref)


def _serial_nb(docs: pd.DataFrame):
    rx = re.compile(WORD_RE)
    L = len(NB_LANGS)
    lang_ix = {lg: i for i, lg in enumerate(NB_LANGS)}
    tok_counts: dict = defaultdict(lambda: np.zeros(L, np.int64))
    doc_toks = []
    for _, r in docs.iterrows():
        cnt: dict = {}
        for w in rx.findall(r["text"].lower()):
            cnt[w] = cnt.get(w, 0) + 1
        keyed = dict(zip(_tok_key(list(cnt.keys())).tolist(), cnt.values()))
        doc_toks.append(keyed)
        for k, c in keyed.items():
            tok_counts[k][lang_ix[r["lang"]]] += c
    vocab = len(tok_counts)
    totals = np.zeros(L, np.int64)
    for v in tok_counts.values():
        totals += v
    weights = {
        k: np.round(1_000_000 * np.log10((v + 1) / (totals + vocab).astype(float))).astype(
            np.int64
        )
        for k, v in tok_counts.items()
    }
    nd = docs.groupby("lang").size().reindex(NB_LANGS).fillna(0).astype(int)
    n_docs = int(nd.sum())
    priors = np.array(
        [
            int(np.round(1_000_000 * np.log10((nd.iloc[i] or 1) / float(n_docs))))
            for i in range(L)
        ],
        np.int64,
    )
    preds = []
    for keyed in doc_toks:
        s = priors.copy()
        for k, c in keyed.items():
            s = s + c * weights[k]
        preds.append(NB_LANGS[int(np.argmax(s))])
    return preds


def test_nb_langid_matches_serial_and_learns(tmp_path):
    rng = np.random.default_rng(62)
    vocab = {
        "de": ["der", "und", "nicht", "haus", "wasser"],
        "en": ["the", "and", "not", "house", "water"],
        "es": ["el", "y", "no", "casa", "agua"],
        "fr": ["le", "et", "pas", "maison", "eau"],
        "zh": ["de5", "he2", "bu4", "fang2", "shui3"],
    }
    shared = ["data", "graph", "ray"]
    rows = []
    for i in range(200):
        lg = NB_LANGS[i % 5]
        words = list(rng.choice(vocab[lg], 12)) + list(rng.choice(shared, 4))
        rng.shuffle(words)
        rows.append((i, " ".join(words), lg))
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    docs["n_chars"] = docs["text"].str.len()
    docs["source"] = "src0"
    docs.to_parquet(tmp_path / "documents.parquet")

    got = (
        _to_df(q_docs_nb_langid(str(tmp_path)))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    preds = _serial_nb(docs)
    ref = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].astype("int64"),
            "lang": docs["lang"],
            "pred_lang": preds,
        }
    )
    ref["correct"] = (ref["pred_lang"] == ref["lang"]).astype("int64")
    pd.testing.assert_frame_equal(got, ref[["doc_id", "lang", "pred_lang", "correct"]])
    # disjoint per-lang vocab -> the classifier actually learns
    assert got["correct"].mean() > 0.95


def test_cover_greedy_matches_serial(tmp_path):
    rng = np.random.default_rng(63)
    n = 1200
    li = pd.DataFrame(
        {
            "l_suppkey": rng.integers(1, 30, n).astype(np.int64),
            "l_partkey": rng.integers(1, 300, n).astype(np.int64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_supplier_cover_greedy(str(tmp_path)))

    e = li.drop_duplicates()
    parts_of = {s: set(g["l_partkey"]) for s, g in e.groupby("l_suppkey")}
    uncovered = set(e["l_partkey"])
    rows, cum = [], 0
    for rnd in range(1, COVER_ROUNDS + 1):
        if not uncovered:
            break
        best = min(
            parts_of, key=lambda s: (-len(parts_of[s] & uncovered), s)
        )
        newly = len(parts_of[best] & uncovered)
        uncovered -= parts_of[best]
        cum += newly
        rows.append((rnd, best, newly, cum))
    ref = pd.DataFrame(
        rows, columns=["rnd", "suppkey", "newly_covered", "cum_covered"]
    ).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    # greedy monotonicity certificate
    assert got["newly_covered"].is_monotonic_decreasing