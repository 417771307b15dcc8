"""Analytics batch (session 12, twenty-fifth wave): per-document
TextRank.

Distributed shape:
- ``docs_textrank_top``: extractive summarization — for every doc,
  the TextRank-highest sentence (PageRank over the within-doc
  sentence-similarity graph, edge weight = shared lowercase words,
  damping 0.85, 30 fixed power iterations, ties to the earliest
  sentence). The graphs are PER-RECORD (a few dozen sentences), so
  the whole computation is embarrassingly parallel INSIDE
  map_batches — the complementary regime to the global partition-
  actor engine: no shuffle at all, every doc's eigenvector solved
  locally in numpy. Rows-only (power iteration has no SQL form);
  serial replay + hand-constructed-similarity pytests.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

ANALYTICS41_QUERIES: dict = {}
ANALYTICS41_ORACLES: dict = {}

TEXTRANK_ITERS = 30
TEXTRANK_DAMPING = 0.85
_SENT_SPLIT = re.compile(r"[.!?]+")
_WORD = re.compile(r"[a-z0-9]+")


def textrank_top_sentence(text: str) -> tuple[int, int]:
    """(top_sentence_idx, n_sentences) for one document; (-1, 0) when
    no sentence has words. Deterministic: fixed iterations, earliest
    sentence wins ties (argmax on the negated lexsort)."""
    sents = [s for s in (x.strip() for x in _SENT_SPLIT.split(text)) if s]
    words = [set(_WORD.findall(s.lower())) for s in sents]
    keep = [i for i, w in enumerate(words) if w]
    if not keep:
        return -1, len(sents)
    W = [words[i] for i in keep]
    n = len(W)
    if n == 1:
        return keep[0], len(sents)
    A = np.zeros((n, n), np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            w = len(W[i] & W[j])
            A[i, j] = A[j, i] = float(w)
    deg = A.sum(axis=1)
    deg[deg == 0] = 1.0
    P = A / deg[:, None]
    r = np.full(n, 1.0 / n)
    for _ in range(TEXTRANK_ITERS):
        r = (1 - TEXTRANK_DAMPING) / n + TEXTRANK_DAMPING * (P.T @ r)
    best = int(np.lexsort((np.arange(n), -r))[0])
    return keep[best], len(sents)


def q_docs_textrank_top(sf_dir):
    """(doc_id, top_sentence, n_sentences): the TextRank pick per doc."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def pick(t: pa.Table) -> pa.Table:
        ids, tops, ns = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            top, n = textrank_top_sentence(txt)
            ids.append(did)
            tops.append(top)
            ns.append(n)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "top_sentence": pa.array(tops, pa.int64()),
                "n_sentences": pa.array(ns, pa.int64()),
            }
        )

    return _typed_collect(
        docs.map_batches(pick, batch_format="pyarrow"),
        {"doc_id": "int64", "top_sentence": "int64", "n_sentences": "int64"},
    )


ANALYTICS41_QUERIES["docs_textrank_top"] = q_docs_textrank_top
# rows-only: power iteration has no SQL form; serial replay pytest.
