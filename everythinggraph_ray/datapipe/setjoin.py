"""Exact set-similarity self-join (Jaccard >= tau) with prefix filtering.

The AllPairs/PPJoin family (Bayardo et al. WWW'07; Xiao et al. WWW'08):
order every document's distinct-token set by ascending global document
frequency (rarest first), keep only the first ``n - ceil(tau*n) + 1``
tokens as the PREFIX, and generate candidate pairs only from shared
prefix tokens — the prefix lemma guarantees every pair with Jaccard >=
tau shares at least one prefix token, so the join is EXACT while the
candidate volume tracks rare-token co-occurrence instead of |corpus|^2.

Distributed shape (no driver state, no broadcast vocabulary):
  1. (doc, token) distinct rows — per-batch regex tokenize (per-doc work
     by nature, same idiom as tfidf/inverted_index).
  2. token -> df via one bucketed token reduce.
  3. df attached back with the bucketed hash_join (token-keyed co-group;
     vocabularies are unbounded at corpus scale, so never broadcast).
  4. per-doc regroup (doc-bucketed co-group): sort the doc's tokens by
     (df, token), emit the full sorted set as the verify payload and the
     prefix tokens as candidate-generation rows.
  5. shared-prefix-token candidates via group_pairs (hash-bucketed, the
     LSH-band machinery reused; oversized buckets surface as starred).
  6. exact Jaccard per candidate via pairwise_verify's two-stage
     bucketed co-group; integers only (jac_milli = (1000*inter)//union),
     so the threshold test and the SQL oracle are bit-exact.

Complement to the MinHash path (datapipe/dedup.py): MinHash trades
recall for near-constant per-doc work; this join is exact and pays for
it in candidate volume on corpora with hot rare-ish tokens.
"""

from __future__ import annotations

import re
from collections import Counter
from hashlib import blake2b

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.datapipe.pairs import group_pairs, pairwise_verify
from everythinggraph_ray.datapipe.text import WORD_RE
from everythinggraph_ray.stages.agg import bucketed_reduce, mix64


def _tok_hash64(tokens: list[str]) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(blake2b(t.encode(), digest_size=8).digest(), "little")
            >> 1  # keep positive in int64
            for t in tokens
        ),
        dtype=np.int64,
        count=len(tokens),
    )


def jaccard_join(
    docs: ray.data.Dataset,
    *,
    threshold_milli: int = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 512,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """All pairs (a < b) of documents whose distinct-word Jaccard is
    >= threshold_milli/1000, with the exact integer similarity:
    (a, b, jac_milli = (1000*inter) // union). ``floor(1000*i/u) >= m``
    is equivalent to ``1000*i >= m*u`` for integer m, so the output
    filter, the prefix length, and the DuckDB oracle agree exactly."""
    if not 0 < threshold_milli <= 1000:
        raise ValueError("threshold_milli must be in (0, 1000]")
    rx = re.compile(WORD_RE)

    def emit_tok(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids: list[int] = []
        toks: list[str] = []
        for i, t in zip(
            batch[id_col].to_pylist(), pc.utf8_lower(batch[text_col]).to_pylist()
        ):
            ks = Counter(rx.findall(t)).keys()
            ids.extend([i] * len(ks))
            toks.extend(ks)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
            }
        )

    tok = docs.map_batches(emit_tok, batch_format="pyarrow")

    def tok_bucket(batch: pa.Table) -> np.ndarray:
        return _tok_hash64(batch["token"].to_pylist()) & 0x7FFFFFFF

    def df_red(g: pa.Table) -> pa.Table:
        d = g.to_pandas().groupby("token", as_index=False).size()
        return pa.table(
            {
                "token": pa.array(d["token"], pa.string()),
                "df": pa.array(d["size"], pa.int64()),
            }
        )

    df = bucketed_reduce(
        tok.select_columns(["token"]), tok_bucket, df_red, num_buckets=num_buckets
    )
    tok_df = hash_join(tok, df, on="token", right_cols=["df"])

    # per-doc regroup: one row per doc with the (df, token)-sorted set
    def doc_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(
            batch[id_col].to_numpy(zero_copy_only=False)
        ).astype(np.int64) & 0x7FFFFFFF

    m = int(threshold_milli)

    def pay_red(g: pa.Table) -> pa.Table:
        d = g.to_pandas().sort_values(["df", "token"])
        ids_out: list[int] = []
        pays: list[list[str]] = []
        plens: list[int] = []
        for i, grp in d.groupby(id_col, sort=False):
            toks = grp["token"].tolist()
            n = len(toks)
            # prefix lemma: p = n - ceil(tau*n) + 1 (integer ceil)
            p = n - (-((-m * n) // 1000)) + 1
            if p <= 0:
                continue
            ids_out.append(int(i))
            pays.append(toks)
            plens.append(min(p, n))
        return pa.table(
            {
                id_col: pa.array(ids_out, pa.int64()),
                "pay": pa.array(pays, pa.list_(pa.string())),
                "plen": pa.array(plens, pa.int64()),
            }
        )

    payloads = bucketed_reduce(tok_df, doc_bucket, pay_red, num_buckets=num_buckets)
    # consumed twice (prefix rows + verify payloads): materialize the
    # compact per-doc table, not the raw token rows
    payloads = payloads.materialize()

    def prefix_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        plens = batch["plen"].to_numpy(zero_copy_only=False)
        pays = batch["pay"].to_pylist()
        out_ids: list[int] = []
        out_tok: list[str] = []
        for i, p, toks in zip(ids, plens, pays):
            out_ids.extend([int(i)] * int(p))
            out_tok.extend(toks[: int(p)])
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                "grp": pa.array(_tok_hash64(out_tok), pa.int64()),
            }
        )

    cand = group_pairs(
        payloads.map_batches(prefix_rows, batch_format="pyarrow"),
        ["grp"],
        max_bucket=max_bucket,
        id_col=id_col,
        num_buckets=num_buckets,
    )

    def jac_milli(a: np.ndarray, b: np.ndarray) -> float:
        inter = len(np.intersect1d(a, b, assume_unique=True))
        union = len(a) + len(b) - inter
        return float((1000 * inter) // union) if union else 0.0

    scored = pairwise_verify(
        payloads.select_columns([id_col, "pay"]),
        cand,
        jac_milli,
        id_col=id_col,
        out_col="jac_milli",
        pay_type=pa.list_(pa.string()),
        num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        jm = t["jac_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = jm >= m
        return pa.table(
            {
                "a": pa.array(
                    t["a"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "b": pa.array(
                    t["b"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "jac_milli": pa.array(jm[keep], pa.int64()),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")


def jaccard_join_serial(
    docs: pd.DataFrame,
    *,
    threshold_milli: int = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Quadratic serial oracle for tests: same tokenizer, same integer
    similarity, no prefix filter."""
    rx = re.compile(WORD_RE)
    sets = {
        int(i): frozenset(rx.findall(str(t).lower()))
        for i, t in zip(docs[id_col], docs[text_col])
    }
    ids = sorted(sets)
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and 1000 * inter >= threshold_milli * union:
                rows.append((a, b, (1000 * inter) // union))
    return pd.DataFrame(rows, columns=["a", "b", "jac_milli"]).astype("int64")
