"""Cross-document duplicate-SPAN detection — substring-level dedup stats
(the "Deduplicating Training Data Makes Language Models Better" signal,
Lee et al. 2022, at word-window granularity).

Exact-document dedup (dedup.py:exact_duplicates) misses documents that
share long boilerplate runs without being byte-identical; MinHash/SimHash
flag whole near-duplicate documents.  This operator finds the SPANS: every
``n``-token window whose gram occurs in two or more DISTINCT documents is
marked duplicated, and per-document coverage statistics (how many windows,
how many token positions fall under at least one duplicated window) are
reduced — the per-doc signal a curation pass thresholds on before cutting
repeated passages.

Methodology notes:

- Tokens are the repo-wide SQL-parity tokenizer (``[a-z0-9]+`` over the
  lowered text); grams are ``n``-token runs joined with ``'_'``; the gram
  key is md5 bytes[8:16] little-endian (DuckDB ``md5_number_lower``)
  ``>> 3`` — the same bit-for-bit recipe as dedup.py:minhash_signatures_md5,
  so the whole pipeline is expressible (and checked) in ANSI SQL.
- The duplication DECISION compares 61-bit gram hashes, not gram strings,
  on BOTH the Ray and SQL sides — identical semantics (hash-exact parity
  even in the astronomically-unlikely collision case) and an 8-byte
  shuffle key instead of an n-token string.  A production pass that must
  be string-exact would add an in-bucket string compare exactly like
  curate.py:decontaminate; the shape is unchanged.
- Within-document repeats do NOT count as duplication here (that signal
  is curate.py:repetition_stats); "duplicated" means >= ``min_docs``
  distinct documents contain the gram.

Scale shape (two bucketed shuffles, both streaming):

1. map_batches: each doc emits its (doc_id, pos, h) window rows — one
   vectorized md5 pass per doc, no state.
2. co-group by h-bucket: one shuffle of the window rows.  Inside a bucket
   every occurrence of a gram hash is present, so the distinct-doc count
   and the row marking happen together (no separate count + join-back
   passes).  Duplicated rows leave as (doc_id, pos); every row also folds
   into a per-(bucket, doc) partial window count so the total window count
   rides along without a second pass over the text.
3. co-group by doc-bucket: per-doc interval union (sorted positions,
   clipped gaps — fully vectorized with reduceat) -> one output row per
   doc.  Shuffle weight is only the DUPLICATED rows plus one partial-count
   row per (bucket, doc).

Reference scope: beyond EverythingGraph (a graph engine); included as a
first-class training-data curation operator per the engine's charter.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from everythinggraph_ray.datapipe.text import WORD_RE
from everythinggraph_ray.stages.agg import bucketed_reduce

__all__ = ["window_rows", "duplicate_spans"]


def window_rows(
    docs: ray.data.Dataset,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, pos, h) for every ``n``-token window of every document
    with at least ``n`` tokens.  ``pos`` is 1-based (matching DuckDB's
    ``generate_series`` in the oracle); ``h`` is the md5_number_lower-
    parity 61-bit gram hash."""
    import re

    rx = re.compile(WORD_RE)

    def emit(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = pc.utf8_lower(batch[text_col]).to_pylist()
        out_id: list[np.ndarray] = []
        out_pos: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        for did, text in zip(ids, texts):
            toks = rx.findall(text or "")
            m = len(toks) - n + 1
            if m <= 0:
                continue
            h = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5("_".join(toks[i : i + n]).encode()).digest()[8:16],
                        "little",
                    )
                    >> 3
                    for i in range(m)
                ),
                dtype=np.int64,
                count=m,
            )
            out_id.append(np.full(m, did, np.int64))
            out_pos.append(np.arange(1, m + 1, dtype=np.int64))
            out_h.append(h)
        if not out_id:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "pos": pa.array(np.concatenate(out_pos), pa.int64()),
                "h": pa.array(np.concatenate(out_h), pa.int64()),
            }
        )

    return docs.map_batches(emit, batch_format="pyarrow")


def duplicate_spans(
    docs: ray.data.Dataset,
    *,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-document duplicated-span statistics:

    (doc_id, n_tokens, n_windows, dup_windows, covered_tokens, dup_frac)

    for every document with at least ``n`` tokens.  ``dup_windows`` is the
    number of windows whose gram hash occurs in >= ``min_docs`` distinct
    documents; ``covered_tokens`` is the size of the union of their
    [pos, pos+n-1] token intervals; ``dup_frac`` = covered / n_tokens is
    the single IEEE division (all other columns are exact int64).
    ``n_tokens`` is recovered as ``n_windows + n - 1`` — no second pass
    over the text."""
    wins = window_rows(docs, n=n, id_col=id_col, text_col=text_col)

    # ---- shuffle 1: co-locate gram hashes; mark duplicated rows and fold
    # per-(bucket, doc) window-count partials into the same output (rows
    # with pos == 0 carry the partial counts, real positions are >= 1).
    def bucket_h(batch: pa.Table) -> np.ndarray:
        return batch["h"].to_numpy(zero_copy_only=False) % np.int64(2**31 - 1)

    def mark(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        nd = df.groupby("h")["doc_id"].nunique()
        dup = df[df["h"].map(nd).to_numpy() >= min_docs]
        part = df.groupby("doc_id").size()
        doc_id = np.concatenate(
            [dup["doc_id"].to_numpy(np.int64), np.asarray(part.index, np.int64)]
        )
        pos = np.concatenate(
            [dup["pos"].to_numpy(np.int64), np.zeros(len(part), np.int64)]
        )
        cnt = np.concatenate(
            [np.zeros(len(dup), np.int64), part.to_numpy().astype(np.int64)]
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "wins": pa.array(cnt, pa.int64()),
            }
        )

    marked = bucketed_reduce(wins, bucket_h, mark, num_buckets=num_buckets)

    # ---- shuffle 2: co-locate each doc's rows; interval union + counts.
    def bucket_doc(batch: pa.Table) -> np.ndarray:
        return batch["doc_id"].to_numpy(zero_copy_only=False) % np.int64(2**31 - 1)

    def finish(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["doc_id", "pos"], kind="mergesort")
        ids = df["doc_id"].to_numpy(np.int64)
        pos = df["pos"].to_numpy(np.int64)
        wins = df["wins"].to_numpy(np.int64)
        uids, starts = np.unique(ids, return_index=True)
        n_windows = np.add.reduceat(wins, starts)
        is_dup = pos > 0
        dup_windows = np.add.reduceat(is_dup.astype(np.int64), starts)
        # union of [pos, pos+n-1] per doc over the sorted dup positions:
        # each dup row covers min(gap to next dup row in the same doc, n)
        # new tokens, where the LAST dup row of a doc covers n.  Partial-
        # count rows sort first (pos == 0) and contribute 0.
        nxt = np.empty_like(pos)
        nxt[:-1] = pos[1:]
        nxt[-1] = 0
        same_doc = np.empty(len(ids), dtype=bool)
        same_doc[:-1] = ids[1:] == ids[:-1]
        same_doc[-1] = False
        gap = np.where(same_doc & is_dup, nxt - pos, n)
        contrib = np.where(is_dup, np.minimum(gap, n), 0)
        covered = np.add.reduceat(contrib, starts)
        n_tokens = n_windows + n - 1
        return pa.table(
            {
                "doc_id": pa.array(uids, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_windows": pa.array(n_windows, pa.int64()),
                "dup_windows": pa.array(dup_windows, pa.int64()),
                "covered_tokens": pa.array(covered, pa.int64()),
                "dup_frac": pa.array(
                    covered.astype(np.float64) / n_tokens.astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return bucketed_reduce(marked, bucket_doc, finish, num_buckets=num_buckets)
