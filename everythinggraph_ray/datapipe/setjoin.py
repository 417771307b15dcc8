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
  2. ONE token-keyed co-group fuses df-count, df-attach and token→int64
     encoding: each bucket holds every row of its tokens, so it emits
     (doc, code, df) with the token's exact global df and a
     COLLISION-FREE code (bucket<<32 | rank-in-bucket). Token strings
     never leave this stage; vocabularies are unbounded at corpus
     scale, so nothing is broadcast.
  3. per-doc regroup (doc-bucketed co-group): sort the doc's codes by
     (df, code) — any consistent global total order satisfies the
     prefix lemma — emit the sorted set as the verify payload and the
     prefix codes as candidate-generation rows.
  4. shared-prefix-token candidates via group_pairs (hash-bucketed, the
     LSH-band machinery reused; oversized buckets surface as starred).
  5. exact Jaccard per candidate via pairwise_verify's bucketed
     co-groups with the vectorized batch_jaccard_milli scorer; integers
     only (jac_milli = (1000*inter)//union), so the threshold test and
     the SQL oracle are bit-exact.

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

from everythinggraph_ray.datapipe.pairs import (
    batch_jaccard_milli,
    group_pairs,
    pairwise_verify,
)
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


def _tok_hash_arrow(tokens: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Deterministic 63-bit token hash at C speed (pandas siphash over the
    string column — process-independent fixed key). Used only as a GROUP
    key: equal tokens always collide into one group, so candidate
    generation is unchanged; a cross-token collision merely merges two
    groups (extra candidates, removed by the exact verify)."""
    from pandas.util import hash_array

    return (
        hash_array(tokens.to_numpy(zero_copy_only=False), categorize=True)
        .astype(np.int64)
        & 0x7FFFFFFFFFFFFFFF
    )


def jaccard_join(
    docs: ray.data.Dataset,
    *,
    threshold_milli: int = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = 512,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """All pairs (a < b) of documents whose distinct-word Jaccard is
    >= threshold_milli/1000, with the exact integer similarity:
    (a, b, jac_milli = (1000*inter) // union). ``floor(1000*i/u) >= m``
    is equivalent to ``1000*i >= m*u`` for integer m, so the output
    filter, the prefix length, and the DuckDB oracle agree exactly.

    EXACTNESS CONTRACT: the join is exact while no prefix token is
    shared by more than ``max_bucket`` documents; beyond that the
    group_pairs star fallback bounds the per-group candidate clique
    (O(n) star instead of O(n²)) and RECALL IS LOST — loudly, via the
    ``starred`` flag group_pairs emits. On a corpus where thousands of
    docs share every token the exact OUTPUT is itself Θ(n²) pairs
    (e.g. the sf0.1 fixture: 8.9M similar pairs from 5k docs), so an
    uncapped run is a deliberate choice: pass ``max_bucket=None`` for
    exact-at-any-cost; the default cap keeps candidate volume linear
    in the group count, the 100 TB-safe behavior."""
    if max_bucket is None:
        max_bucket = 1 << 62  # exact mode: never star
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
        return _tok_hash_arrow(batch["token"]) & 0x7FFFFFFF

    NB = int(num_buckets)

    def code_red(g: pa.Table) -> pa.Table:
        # FUSED df-count + df-attach + token→int encoding in ONE token
        # co-group (replaces the former df bucketed_reduce PLUS the
        # tok ⋈ df hash_join — one full shuffle of the token table
        # saved). Every row of a token lands in its bucket, so the
        # bucket computes the token's exact global df AND assigns it a
        # COLLISION-FREE int64 code (bucket_id << 32) | local_rank —
        # not a hash: distinct tokens always get distinct codes, so
        # every later stage (prefix ordering, candidate grouping, the
        # exact Jaccard verify) runs on int64 columns with provably
        # identical semantics to the string formulation. Token strings
        # never leave this stage.
        import pyarrow.compute as pc

        if g.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "code": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        order = pc.sort_indices(g, sort_keys=[("token", "ascending")])
        toks = pc.take(g["token"], order)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ids = pc.take(g[id_col], order).to_numpy(zero_copy_only=False)
        # dictionary_encode on a SORTED array: first-appearance order ==
        # sorted order, so indices are dense ascending ranks
        rank = toks.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bucket = int(_tok_hash_arrow(toks.slice(0, 1))[0] & 0x7FFFFFFF) % NB
        df = np.bincount(rank)[rank]
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64), pa.int64()),
                "code": pa.array((np.int64(bucket) << np.int64(32)) | rank, pa.int64()),
                "df": pa.array(df.astype(np.int64), pa.int64()),
            }
        )

    tok_df = bucketed_reduce(tok, tok_bucket, code_red, num_buckets=NB)

    # per-doc regroup: one row per doc with the (df, code)-sorted set
    def doc_bucket(batch: pa.Table) -> np.ndarray:
        return mix64(
            batch[id_col].to_numpy(zero_copy_only=False)
        ).astype(np.int64) & 0x7FFFFFFF

    m = int(threshold_milli)

    def pay_red(g: pa.Table) -> pa.Table:
        # Arrow/numpy-native per-doc regroup (round-4 VERDICT item 2):
        # one lexsort by (doc, df, code) makes every doc's tokens a
        # contiguous run ordered by the global (df, code) total order
        # (any consistent total order satisfies the prefix lemma); the
        # per-doc list payloads are offset slices over the sorted int64
        # code column — no pandas, no per-group Python loop
        if g.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "pay": pa.array([], pa.list_(pa.int64())),
                    "plen": pa.array([], pa.int64()),
                }
            )
        ids = g[id_col].to_numpy(zero_copy_only=False)
        code = g["code"].to_numpy(zero_copy_only=False)
        df = g["df"].to_numpy(zero_copy_only=False)
        o = np.lexsort((code, df, ids))
        ids, code = ids[o], code[o]
        bounds = np.flatnonzero(ids[1:] != ids[:-1]) + 1
        starts = np.r_[0, bounds].astype(np.int64)
        n = np.diff(np.r_[starts, len(ids)]).astype(np.int64)
        # prefix lemma: p = n - ceil(tau*n) + 1 (integer ceil; >= 1 for
        # any 0 < m <= 1000, so no group is ever dropped)
        p = np.minimum(n - (-((-m * n) // 1000)) + 1, n)
        return pa.table(
            {
                id_col: pa.array(ids[starts].astype(np.int64), pa.int64()),
                "pay": pa.ListArray.from_arrays(
                    pa.array(np.r_[starts, [len(ids)]], pa.int32()),
                    pa.array(code, pa.int64()),
                ),
                "plen": pa.array(p, pa.int64()),
            }
        )

    payloads = bucketed_reduce(tok_df, doc_bucket, pay_red, num_buckets=num_buckets)
    # consumed twice (prefix rows + verify payloads): materialize the
    # compact per-doc table, not the raw token rows
    payloads = payloads.materialize()

    def prefix_rows(batch: pa.Table) -> pa.Table:
        # vectorized prefix expansion: one ragged gather over the list
        # buffers (np.repeat ids, prefix slice per doc); the candidate
        # group key IS the token code — no hashing at all
        from everythinggraph_ray.datapipe.pairs import _ragged_idx

        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        plens = batch["plen"].to_numpy(zero_copy_only=False).astype(np.int64)
        pay = batch["pay"]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        offs = pay.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = pay.values.to_numpy(zero_copy_only=False)
        idx = _ragged_idx(offs[:-1], plens)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, plens), pa.int64()),
                "grp": pa.array(vals[idx], pa.int64()),
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
        pay_type=pa.list_(pa.int64()),
        num_buckets=num_buckets,
        batch_score_fn=batch_jaccard_milli,
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
