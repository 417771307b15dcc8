"""Corpus-level bigram language-model scoring — a training-data quality
signal (CCNet/Gopher-style "perplexity vs the corpus itself" filter,
here with the corpus as its own LM so no external model is needed).

Per document: ``logprob = Σ over bigram occurrences
ln((cb + 1) / (cu + B))`` where ``cb`` is the corpus-wide count of the
bigram, ``cu = Σ_w2 cb(w1, w2)`` the standard bigram-MLE denominator,
and ``B`` the number of distinct corpus bigrams (add-one smoothing over
the observed bigram space). Tokenization is the repo-wide word rule
(lower + ``[a-z0-9]+``, shared verbatim with the SQL oracles —
`docs_top_tokens`).

Shape (the tfidf pattern, datapipe/text.py): doc-bigram rows stream;
the bigram count table reduces via the shared bucketed_reduce; counts
attach back with two bucketed `hash_join`s (no vocab broadcast — the
count tables can exceed driver memory at corpus scale); the per-doc
score is a per-batch partial + doc-bucketed final. The corpus is
tokenized twice (count pass + attach pass) — the streaming trade the
tfidf stage documents; nothing row-wise ever lands on the driver except
the one scalar ``B``.

Float parity: each term is ``ln`` of a ratio of exact integers; the
per-doc sum is order-dependent, absorbed by the repo-wide
``round(·, 7)`` device (same as `_pagerank10_sql`).
"""

from __future__ import annotations

import re
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from everythinggraph_ray.datapipe.text import WORD_RE
from everythinggraph_ray.stages.agg import bucketed_reduce, mix64


def _doc_bigrams(docs: ray.data.Dataset, text_col: str, id_col: str) -> ray.data.Dataset:
    """(doc_id, w1, w2, c) rows — per-(doc, bigram) multiplicity,
    combined inside the batch (the partial-aggregate discipline)."""

    def emit(batch: pa.Table):
        rx = re.compile(WORD_RE)
        ids = batch[id_col].to_pylist()
        texts = pc.utf8_lower(batch[text_col]).to_pylist()
        out_id, out_w1, out_w2, out_c = [], [], [], []
        for did, t in zip(ids, texts):
            toks = rx.findall(t or "")
            if len(toks) < 2:
                continue
            cnt: dict[tuple[str, str], int] = {}
            for a, b in zip(toks, toks[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
            for (a, b), c in cnt.items():
                out_id.append(did)
                out_w1.append(a)
                out_w2.append(b)
                out_c.append(c)
        if out_id:
            yield pa.table(
                {
                    id_col: pa.array(out_id),
                    "w1": pa.array(out_w1, pa.string()),
                    "w2": pa.array(out_w2, pa.string()),
                    "c": pa.array(out_c, pa.int64()),
                }
            )

    return docs.map_batches(emit, batch_format="pyarrow")


def _str_pair_bucket(batch: pa.Table) -> np.ndarray:
    from everythinggraph_ray.stages.agg import string_buckets

    return string_buckets(batch["w1"], batch["w2"])


def _str_bucket(batch: pa.Table) -> np.ndarray:
    from everythinggraph_ray.stages.agg import string_buckets

    return string_buckets(batch["w1"])


def bigram_lm(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Score every document against the corpus's own bigram LM.
    Returns (id_col, n_bigrams int64, logprob float64 rounded to 7) —
    one row per input document (no-bigram docs score 0)."""
    from everythinggraph_ray.datapipe.joins import hash_join

    bi = _doc_bigrams(docs, text_col, id_col)

    # corpus bigram counts cb(w1, w2) — the "model". Materialized: it is
    # the multiply-consumed SMALL side (bounded by distinct bigrams, not
    # corpus size), read again for cu and the attach join.
    def red_cb(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["w1", "w2"], as_index=False)["c"].sum()
        return pa.table(
            {
                "w1": pa.array(df["w1"], pa.string()),
                "w2": pa.array(df["w2"], pa.string()),
                "cb": pa.array(df["c"], pa.int64()),
            }
        )

    cb = bucketed_reduce(
        bi.select_columns(["w1", "w2", "c"]), _str_pair_bucket, red_cb
    ).materialize()
    B = int(cb.count())  # distinct corpus bigrams (the smoothing constant)

    def red_cu(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("w1", as_index=False)["cb"].sum()
        return pa.table(
            {"w1": pa.array(df["w1"], pa.string()), "cu": pa.array(df["cb"], pa.int64())}
        )

    cu = bucketed_reduce(cb, _str_bucket, red_cu)

    j = hash_join(bi, cb, on=["w1", "w2"], right_cols=["cb"])
    j = hash_join(j, cu, on="w1", right_cols=["cu"])

    def partial(batch: pa.Table):
        if batch.num_rows == 0:
            return
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        cbv = batch["cb"].to_numpy(zero_copy_only=False).astype(np.float64)
        cuv = batch["cu"].to_numpy(zero_copy_only=False).astype(np.float64)
        term = c * (np.log(cbv + 1.0) - np.log(cuv + float(B)))
        import pandas as pd

        df = pd.DataFrame({id_col: ids, "n": batch["c"].to_numpy(zero_copy_only=False), "lp": term})
        agg = df.groupby(id_col, as_index=False).sum()
        yield pa.table(
            {
                id_col: pa.array(agg[id_col]),
                "n": pa.array(agg["n"], pa.int64()),
                "lp": pa.array(agg["lp"], pa.float64()),
            }
        )

    def doc_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch[id_col].to_numpy(zero_copy_only=False)) & 0x7FFFFFFF

    def red_doc(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(id_col, as_index=False).sum()
        return pa.table(
            {
                id_col: pa.array(df[id_col]),
                "n_bigrams": pa.array(df["n"], pa.int64()),
                "logprob": pa.array(np.round(df["lp"].to_numpy(), 7), pa.float64()),
            }
        )

    scores = bucketed_reduce(j.map_batches(partial, batch_format="pyarrow"), doc_bucket, red_doc)

    # every input doc surfaces (no-bigram docs score 0): LEFT-attach
    out = hash_join(
        docs.select_columns([id_col]),
        scores,
        on=id_col,
        right_cols=["n_bigrams", "logprob"],
        how="left",
    )

    def fill(batch: pa.Table) -> pa.Table:
        n = batch["n_bigrams"].to_numpy(zero_copy_only=False)
        lp = batch["logprob"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bigrams": pa.array(
                    np.where(np.isnan(n.astype(np.float64)), 0, n).astype(np.int64)
                    if n.dtype != np.int64
                    else n,
                    pa.int64(),
                ),
                "logprob": pa.array(np.nan_to_num(lp, nan=0.0), pa.float64()),
            }
        )

    return out.map_batches(fill, batch_format="pyarrow")


def bigram_lm_serial(ids, texts):
    """Pure-Python oracle for tests — same tokenizer, counts and
    smoothing, per-doc sums in occurrence order."""
    import math

    rx = re.compile(WORD_RE)
    toks = {i: rx.findall((t or "").lower()) for i, t in zip(ids, texts)}
    cb: dict[tuple[str, str], int] = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
    cu: dict[str, int] = {}
    for (a, _), c in cb.items():
        cu[a] = cu.get(a, 0) + c
    B = len(cb)
    out = []
    for i in ids:
        ts = toks[i]
        lp, n = 0.0, 0
        for a, b in zip(ts, ts[1:]):
            lp += math.log(cb[(a, b)] + 1.0) - math.log(cu[a] + float(B))
            n += 1
        out.append((i, n, round(lp, 7)))
    return out
