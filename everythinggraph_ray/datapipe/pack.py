"""Sequence packing: assign documents to fixed-capacity token bins — the
step of an LLM training-data pipeline that concatenates documents into
context windows. Built as a DISTRIBUTED PREFIX SCAN, the Ray analogue of
the reference's ``sequence::scan`` primitives (utils_ligra.h:156-219,
SURVEY.md §2.f O2) at corpus scale:

    1. one vectorized pass computes per-doc token counts (the RE2 BPE-ish
       pre-tokenizer, identical to docs_token_count_bpe) and an ORDERED
       range id ``rng = doc_id * R // (max_id + 1)`` — ranges partition
       the doc_id order, so a per-range scan + offset equals the global
       scan;
    2. per-range token SUMS via per-batch partials → a tiny R-row table;
    3. the driver cumsums the R range sums into exclusive offsets (the
       only driver-side state: R integers, never O(docs));
    4. each range computes its local inclusive cumsum plus its offset and
       assigns ``bin_id = (cum - n_tokens) // bin_tokens`` — a document
       goes to the bin where its FIRST token lands (long docs span bins).

Deterministic (pure function of the table) and SQL-expressible: the
oracle is a window cumsum ordered by doc_id. The narrow (doc_id,
n_tokens, rng) table is materialized between passes 2 and 4 — the scan is
inherently two-pass, and that table is ~0.1% the width of the corpus
(24 bytes/row; the TEXT is read exactly once).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce

BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def pack_sequences(
    docs: ray.data.Dataset,
    *,
    bin_tokens: int = 4096,
    num_ranges: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, n_tokens, bin_id): contiguous greedy packing of documents
    in doc_id order into ``bin_tokens``-capacity bins (see module
    docstring for the distributed-scan construction)."""
    R = int(num_ranges)
    max_id = int(docs.select_columns([id_col]).max(id_col))

    def count(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tok = pc.cast(
            pc.count_substring_regex(batch[text_col], BPE_RE), pa.int64()
        ).to_numpy(zero_copy_only=False)
        rng = ids * R // (max_id + 1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(tok, pa.int64()),
                "rng": pa.array(rng.astype(np.int64), pa.int64()),
            }
        )

    # narrow scan table, read the text exactly once (see module docstring)
    toks = docs.map_batches(count, batch_format="pyarrow").materialize()

    # --- per-range sums (per-batch partials -> tiny R-row combine) -------
    def partial_sums(batch: pa.Table) -> pa.Table:
        rng = batch["rng"].to_numpy(zero_copy_only=False)
        tok = batch["n_tokens"].to_numpy(zero_copy_only=False)
        s = np.bincount(rng, weights=tok, minlength=R).astype(np.int64)
        nz = np.flatnonzero(s)
        return pa.table(
            {"rng": pa.array(nz, pa.int64()), "s": pa.array(s[nz], pa.int64())}
        )

    part = toks.map_batches(partial_sums, batch_format="pyarrow").to_pandas()
    sums = np.zeros(R, dtype=np.int64)
    if len(part):
        np.add.at(sums, part["rng"].to_numpy(np.int64), part["s"].to_numpy(np.int64))
    offsets = np.r_[0, np.cumsum(sums)[:-1]]  # exclusive per-range offsets

    # --- per-range local scan + offset ------------------------------------
    def bucket_of(batch: pa.Table) -> np.ndarray:
        return batch["rng"].to_numpy(zero_copy_only=False)

    def scan(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        tok = g["n_tokens"].to_numpy(zero_copy_only=False)
        rng = g["rng"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids,))  # doc_id order within the bucket
        ids, tok, rng = ids[order], tok[order], rng[order]
        # a bucket may hold several ranges (R > num_buckets): restart the
        # cumsum at each range boundary and add that range's offset
        cum = np.cumsum(tok)
        starts = np.flatnonzero(np.r_[True, rng[1:] != rng[:-1]]) if len(rng) else np.empty(0, np.int64)
        base = np.zeros(len(ids), dtype=np.int64)
        for s in starts:  # ≤ R tiny iterations per bucket
            base[s:] = offsets[rng[s]] - (cum[s - 1] if s else 0)
        cum = cum + base
        bin_id = (cum - tok) // bin_tokens
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(tok, pa.int64()),
                "bin_id": pa.array(bin_id, pa.int64()),
            }
        )

    return bucketed_reduce(toks, bucket_of, scan)
