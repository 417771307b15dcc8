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

Shape (round-5 fused — the jaccard-join idiom): doc-bigram rows stream
through TWO chained co-groups that each fuse a count reduce with its
attach — (w1, w2)-bucketed (every row of a bigram in one bucket ⇒ cb
computed AND attached in place, plus a per-bigram first-row flag whose
global sum is ``B``), then w1-bucketed (distinct (w1, w2, cb) rows give
cu ⇒ attached in place). The attached table materializes ONCE (it is
consumed by the B aggregate and the scoring reduce), replacing the old
double tokenization + two bucketed hash_joins: 4 shuffles and one
tokenization pass instead of 6 and two. No vocab broadcast — count
tables can exceed driver memory at corpus scale; nothing row-wise ever
lands on the driver except the one scalar ``B``.

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

    # --- co-group 1: (w1, w2)-bucketed — compute cb AND attach it, and
    # flag each bigram's first row (Σ flags == B, the smoothing constant)
    def red_cb_attach(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        if g.num_rows == 0:
            return g

        order = pc2.sort_indices(
            g, sort_keys=[("w1", "ascending"), ("w2", "ascending")]
        )
        t = g.take(order)
        w1 = t["w1"].to_numpy(zero_copy_only=False)
        w2 = t["w2"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(c)
        first = (
            np.r_[True, (w1[1:] != w1[:-1]) | (w2[1:] != w2[:-1])]
            if n
            else np.empty(0, bool)
        )
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, n])
        csum = np.cumsum(c)
        cb = np.repeat(csum[np.r_[starts[1:] - 1, n - 1]] - (csum[starts] - c[starts]), lens)
        return pa.table(
            {
                id_col: t[id_col],
                "w1": t["w1"],
                "w2": t["w2"],
                "c": pa.array(c, pa.int64()),
                "cb": pa.array(cb, pa.int64()),
                "nb_first": pa.array(first.astype(np.int64), pa.int64()),
            }
        )

    att1 = bucketed_reduce(bi, _str_pair_bucket, red_cb_attach)

    # --- co-group 2: w1-bucketed — cu(w1) = Σ cb over DISTINCT (w1, w2)
    # within the bucket, attached in place
    def red_cu_attach(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        if g.num_rows == 0:
            return g

        order = pc2.sort_indices(
            g, sort_keys=[("w1", "ascending"), ("w2", "ascending")]
        )
        t = g.take(order)
        w1 = t["w1"].to_numpy(zero_copy_only=False)
        w2 = t["w2"].to_numpy(zero_copy_only=False)
        cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(cb)
        new_w1 = np.r_[True, w1[1:] != w1[:-1]] if n else np.empty(0, bool)
        new_bi = (
            np.r_[True, (w1[1:] != w1[:-1]) | (w2[1:] != w2[:-1])]
            if n
            else np.empty(0, bool)
        )
        starts = np.flatnonzero(new_w1)
        lens = np.diff(np.r_[starts, n])
        dsum = np.cumsum(np.where(new_bi, cb, 0))
        ends = np.r_[starts[1:] - 1, n - 1] if n else starts
        cu = np.repeat(
            dsum[ends] - (dsum[starts] - np.where(new_bi, cb, 0)[starts]), lens
        )
        return pa.table(
            {
                id_col: t[id_col],
                "c": t["c"],
                "cb": t["cb"],
                "cu": pa.array(cu, pa.int64()),
                "nb_first": t["nb_first"],
            }
        )

    # materialized ONCE: consumed by the B aggregate and the scoring
    # reduce (replaces the old second tokenization pass — token-level
    # rows live in the object store, which spills at corpus scale)
    att2 = bucketed_reduce(att1, _str_bucket, red_cu_attach).materialize()
    B = int(att2.sum("nb_first"))  # distinct corpus bigrams

    def partial(batch: pa.Table):
        if batch.num_rows == 0:
            return
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        cbv = batch["cb"].to_numpy(zero_copy_only=False).astype(np.float64)
        cuv = batch["cu"].to_numpy(zero_copy_only=False).astype(np.float64)
        term = c * (np.log(cbv + 1.0) - np.log(cuv + float(B)))
        t = pa.table(
            {
                id_col: batch[id_col],
                "n": batch["c"],
                "lp": pa.array(term, pa.float64()),
            }
        )
        agg = t.group_by(id_col).aggregate([("n", "sum"), ("lp", "sum")])
        yield pa.table(
            {
                id_col: agg[id_col],
                "n": agg["n_sum"].cast(pa.int64()),
                "lp": agg["lp_sum"],
            }
        )

    def doc_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(batch[id_col].to_numpy(zero_copy_only=False)) & 0x7FFFFFFF

    def red_doc(g: pa.Table) -> pa.Table:
        agg = g.group_by(id_col).aggregate([("n", "sum"), ("lp", "sum")])
        return pa.table(
            {
                id_col: agg[id_col],
                "n_bigrams": agg["n_sum"].cast(pa.int64()),
                "logprob": pa.array(
                    np.round(agg["lp_sum"].to_numpy(zero_copy_only=False), 7),
                    pa.float64(),
                ),
            }
        )

    scores = bucketed_reduce(
        att2.map_batches(partial, batch_format="pyarrow"), doc_bucket, red_doc
    )

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
