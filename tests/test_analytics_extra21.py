"""Session-12 fifth wave (compression ratio / novel 5-grams / degree
moments): serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra21 import (
    NGRAM_N,
    ZLIB_LEVEL,
    q_docs_compression_ratio,
    q_docs_novel_5grams,
    q_rel_inout_degree_moments,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_compression_ratio_matches_zlib_and_orders_repetition(tmp_path):
    texts = [
        "spam " * 200,  # highly repetitive -> high ratio
        "".join(chr(33 + ((i * 7919) % 90)) for i in range(1000)),  # noisy
        "a short one",
        "中文 " * 50,
    ]
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
        _to_df(q_docs_compression_ratio(str(tmp_path)))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        c = len(zlib.compress(b, ZLIB_LEVEL))
        row = got.iloc[i]
        assert row["raw_len"] == len(b)
        assert row["comp_len"] == c
        assert row["ratio_ppm"] == (len(b) * 1_000_000) // c
    # repetitive text compresses far better than the noisy one
    assert got.iloc[0]["ratio_ppm"] > 3 * got.iloc[1]["ratio_ppm"]


def test_novel_5grams_matches_serial(tmp_path):
    texts = [
        "a b c d e f",        # grams: abcde, bcdef — all novel (doc 0)
        "a b c d e x",        # abcde seen (doc 0 owns), bcdex novel
        "z z z z z",          # single gram zzzzz, novel
        "a b c d e f g",      # abcde+bcdef owned by 0, cdefg novel
        "tiny",               # < 5 words -> no grams, absent from output
    ]
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
        _to_df(q_docs_novel_5grams(str(tmp_path)))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # serial reference
    first: dict[str, int] = {}
    per_doc = []
    for i, t in enumerate(texts):
        ws = t.split(" ")
        grams = {
            " ".join(ws[j : j + NGRAM_N]) for j in range(max(0, len(ws) - NGRAM_N + 1))
        }
        per_doc.append(grams)
        for g in grams:
            first[g] = min(first.get(g, i), i)
    rows = [
        (i, len(g), sum(1 for x in g if first[x] == i))
        for i, g in enumerate(per_doc)
        if g
    ]
    ref = pd.DataFrame(rows, columns=["doc_id", "n_grams", "n_novel"]).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    assert got.set_index("doc_id").loc[1, "n_novel"] == 1  # shared gram detected
    assert 4 not in set(got["doc_id"])  # sub-5-word doc emits nothing


def test_inout_moments_match_bruteforce(tmp_path):
    rng = np.random.default_rng(111)
    src = rng.integers(0, 80, 1500)
    dst = rng.integers(0, 80, 1500)
    pd.DataFrame({"l_orderkey": src, "l_partkey": dst}).to_parquet(
        tmp_path / "lineitem.parquet"
    )

    got = _to_df(q_rel_inout_degree_moments(str(tmp_path))).iloc[0]

    s = src % 1000
    d = dst % 1000
    univ = sorted(set(s) | set(d))
    x = np.array([(s == v).sum() for v in univ], np.int64)
    y = np.array([(d == v).sum() for v in univ], np.int64)
    assert got["n"] == len(univ)
    assert got["sum_out"] == x.sum()
    assert got["sum_in"] == y.sum()
    assert got["sum_prod"] == (x * y).sum()
    assert got["sum_out2"] == (x * x).sum()
    assert got["sum_in2"] == (y * y).sum()
