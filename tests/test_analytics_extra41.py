"""Session-12 twenty-fifth wave (per-doc TextRank): serial-replay
exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra41 import (
    q_docs_textrank_top,
    textrank_top_sentence,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_textrank_prefers_central_sentence():
    # sentence 1 shares words with both 0 and 2; 0 and 2 share nothing:
    # the hub sentence must win
    text = "alpha beta gamma. beta gamma delta epsilon. delta epsilon zeta."
    top, n = textrank_top_sentence(text)
    assert n == 3
    assert top == 1


def test_textrank_degenerate_cases():
    assert textrank_top_sentence("") == (-1, 0)
    assert textrank_top_sentence("!!! ... ??") == (-1, 0)
    # single sentence wins trivially
    assert textrank_top_sentence("only one sentence here") == (0, 1)
    # disconnected pairs: ties resolve to the earliest sentence
    top, n = textrank_top_sentence("aa bb. aa bb. cc dd. cc dd.")
    assert n == 4 and top == 0


def test_textrank_query_replays(tmp_path):
    rng = np.random.default_rng(281)
    vocab = ["graph", "ray", "data", "batch", "actor", "shuffle", "arrow", "join"]
    texts = []
    for _ in range(60):
        n_s = rng.integers(2, 7)
        sents = [
            " ".join(rng.choice(vocab, rng.integers(3, 7)))
            for _ in range(n_s)
        ]
        texts.append(". ".join(sents) + ".")
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
        _to_df(q_docs_textrank_top(str(tmp_path)))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        top, n = textrank_top_sentence(t)
        row = got.iloc[i]
        assert (row["top_sentence"], row["n_sentences"]) == (top, n), i
