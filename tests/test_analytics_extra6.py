"""Session-9 fourth wave (Heaps curve / Q20-lite / Simpson / vocab
overlap / basket histogram): serial-replay exactness on synthetic
fixtures, independent of the driver sweep."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

import ray.data

from everythinggraph_ray.pipelines.analytics_extra6 import (
    q_docs_heaps_curve,
    q_docs_simpson,
    q_docs_vocab_overlap,
    q_orders_basket_hist,
    q_q20_excess_suppliers,
)


def _to_df(res):
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    rng = np.random.default_rng(61)
    langs = ["en", "de", "fr"]
    vocab = {
        "en": [f"en{i}" for i in range(60)] + ["shared", "common", "x1"],
        "de": [f"de{i}" for i in range(50)] + ["shared", "x1"],
        "fr": [f"fr{i}" for i in range(40)] + ["common", "x1"],
    }
    rows = []
    for did in range(90):
        lg = langs[did % 3]
        n = int(rng.integers(5, 40))
        rows.append({"doc_id": did, "lang": lg, "text": " ".join(rng.choice(vocab[lg], n))})
    df = pd.DataFrame(rows)
    d = tmp_path_factory.mktemp("docs6")
    df.to_parquet(d / "documents.parquet")
    return str(d), df


def _tokens(t):
    return re.findall(r"[a-z0-9]+", t.lower())


def test_heaps_curve_matches_serial(docs_dir):
    d, df = docs_dir
    got = _to_df(q_docs_heaps_curve(d))
    first = {}
    for did, t in zip(df["doc_id"], df["text"]):
        for w in _tokens(t):
            if w not in first:
                first[w] = did
            else:
                first[w] = min(first[w], did)
    D = int(df["doc_id"].max()) + 1
    ts = []
    k = 0
    while True:
        ts.append(1 << k)
        if (1 << k) >= D:
            break
        k += 1
    fd = np.array(list(first.values()))
    ref = pd.DataFrame({"t": ts, "vocab": [int((fd < t).sum()) for t in ts]}).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    # monotone growth ending at the full vocabulary
    assert got["vocab"].is_monotonic_increasing
    assert int(got["vocab"].iloc[-1]) == len(first)


def test_simpson_matches_serial(docs_dir):
    d, df = docs_dir
    got = _to_df(q_docs_simpson(d)).set_index("lang")
    for lg, grp in df.groupby("lang"):
        c = Counter()
        for t in grp["text"]:
            c.update(_tokens(t))
        n = sum(c.values())
        cc = sum(v * (v - 1) for v in c.values())
        assert int(got.loc[lg, "n_tokens"]) == n
        assert int(got.loc[lg, "sum_cc"]) == cc
        assert int(got.loc[lg, "simpson_ppb"]) == (10**9 * cc) // (n * (n - 1))


def test_vocab_overlap_matches_serial(docs_dir):
    d, df = docs_dir
    got = _to_df(q_docs_vocab_overlap(d))
    vocabs = {}
    for lg, grp in df.groupby("lang"):
        s = set()
        for t in grp["text"]:
            s.update(_tokens(t))
        vocabs[lg] = s
    langs = sorted(vocabs)
    rows = []
    for i, a in enumerate(langs):
        for b in langs[i + 1 :]:
            inter = len(vocabs[a] & vocabs[b])
            union = len(vocabs[a] | vocabs[b])
            rows.append(
                {
                    "lang_a": a,
                    "lang_b": b,
                    "n_common": inter,
                    "n_union": union,
                    "jaccard_ppm": (1_000_000 * inter) // union,
                }
            )
    ref = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    # the planted shared tokens make every pair overlap
    assert (got["n_common"] >= 1).all()


def test_q20_matches_pandas(tmp_path):
    rng = np.random.default_rng(71)
    li = pd.DataFrame(
        {
            "l_partkey": rng.integers(1, 40, 1500).astype(np.int64),
            "l_suppkey": rng.integers(1, 12, 1500).astype(np.int64),
            "l_quantity": rng.integers(1, 50, 1500).astype(np.float64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _to_df(q_q20_excess_suppliers(str(tmp_path))).reset_index(drop=True)
    df = li.copy()
    df["qc"] = np.floor(df["l_quantity"].to_numpy() * 100 + 0.5).astype(np.int64)
    ps = df.groupby(["l_partkey", "l_suppkey"], as_index=False)["qc"].sum()
    pt = ps.groupby("l_partkey")["qc"].sum()
    ps = ps.merge(pt.rename("tot"), left_on="l_partkey", right_index=True)
    hit = ps[100 * ps["qc"] > 15 * ps["tot"]]
    ref = (
        hit.groupby("l_suppkey").size().reset_index(name="n_parts")
        .rename(columns={"l_suppkey": "suppkey"})
        .sort_values(["n_parts", "suppkey"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, ref)


def test_q20_empty_gate(tmp_path):
    # perfectly balanced shares: nobody exceeds 15% of a 10-supplier part
    li = pd.DataFrame(
        {
            "l_partkey": np.repeat(np.arange(1, 5, dtype=np.int64), 10),
            "l_suppkey": np.tile(np.arange(1, 11, dtype=np.int64), 4),
            "l_quantity": np.full(40, 7.0),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _to_df(q_q20_excess_suppliers(str(tmp_path)))
    assert len(got) == 0
    assert list(got.columns) == ["suppkey", "n_parts"]


def test_basket_hist_matches_pandas(tmp_path):
    rng = np.random.default_rng(83)
    li = pd.DataFrame({"l_orderkey": rng.integers(1, 200, 900).astype(np.int64)})
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _to_df(q_orders_basket_hist(str(tmp_path)))
    per = li.groupby("l_orderkey").size()
    ref = (
        per.value_counts().sort_index().reset_index()
        .set_axis(["n_lines", "n_orders"], axis=1)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, ref)
    assert int((got["n_lines"] * got["n_orders"]).sum()) == len(li)
