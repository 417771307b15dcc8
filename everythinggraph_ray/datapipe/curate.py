"""Corpus-curation operators for large-scale training-data pipelines.

PII redaction, deterministic stratified sampling, Gopher-style repetition
statistics, benchmark decontamination, and mixing-weight computation —
the filter/govern layer a pretraining pipeline runs between raw
extraction and tokenization. All narrow stages are vectorized
``map_batches`` transforms; the wide steps (decontamination's gram join,
the count tails) ride the bucketed-reduce pattern (stages/agg.py), so
there is no per-key group overhead and no driver-side state.

Oracle-parity rules (the doc_stats/fingerprint convention): every
SQL-checkable transform sticks to RE2 regexes (pyarrow.compute and DuckDB
both embed RE2), md5 (shared with DuckDB), and integer arithmetic
(floor-division weights, micro-unit sums) so the driver's DuckDB oracle
hash-compares exactly.

The reference engine (jmalicevic/EverythingGraph) has no corpus layer at
all — these are north-rule / training-data additions; their shapes reuse
the reference-derived primitives (count-sort-style bucketed reduction,
init_all.c:425-443 analogue) rather than any new machinery.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from everythinggraph_ray.datapipe.text import TOKEN_RE, WORD_RE
from everythinggraph_ray.stages.agg import bucketed_reduce, sum_by_key

# RE2 patterns shared verbatim with the DuckDB oracles
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_redact(
    docs: ray.data.Dataset, text_col: str = "text", *, keep_text: bool = False
) -> ray.data.Dataset:
    """(doc_id, n_emails, n_phones, redacted_md5): count and redact
    email addresses then phone numbers (RE2, non-overlapping, applied in
    that documented order — phone counting runs on the email-redacted
    text so the two passes compose deterministically). The redacted text
    is returned as its md5 hex digest so the result stays narrow; pass
    ``keep_text=True`` for the full redacted column (the production
    sink shape)."""

    def red(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        n_em = pc.cast(pc.count_substring_regex(txt, EMAIL_RE), pa.int64())
        t1 = pc.replace_substring_regex(txt, EMAIL_RE, "<EMAIL>")
        n_ph = pc.cast(pc.count_substring_regex(t1, PHONE_RE), pa.int64())
        t2 = pc.replace_substring_regex(t1, PHONE_RE, "<PHONE>")
        md5 = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in t2.to_pylist()]
        cols = {
            "doc_id": batch["doc_id"],
            "n_emails": n_em,
            "n_phones": n_ph,
            "redacted_md5": pa.array(md5, pa.string()),
        }
        if keep_text:
            cols["redacted"] = t2
        return pa.table(cols)

    return docs.map_batches(red, batch_format="pyarrow")


def _rate_threshold(rate: float) -> str:
    """Hex threshold for md5-prefix sampling: keep a row iff its digest
    is lexicographically below this. 8 hex digits give 2^-32 rate
    resolution; 'g' sorts above every hex digest (keep-all)."""
    if rate >= 1.0:
        return "g"
    return format(max(int(rate * 16**8), 0), "08x")


def stratified_sample(
    docs: ray.data.Dataset,
    rates: dict[str, float],
    *,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> ray.data.Dataset:
    """Deterministic per-stratum sampling: keep a row iff
    ``md5(str(id)) < threshold(rates[stratum])``. No RNG, no state — any
    worker (or a resumed run, or the DuckDB oracle) keeps exactly the
    same rows, and raising a stratum's rate strictly grows its sample
    (nested samples, the property curation reruns rely on)."""
    thresholds = {k: _rate_threshold(v) for k, v in rates.items()}
    dflt = _rate_threshold(default_rate)

    def samp(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        strata = batch[strata_col].to_pylist()
        keep = [
            hashlib.md5(str(i).encode("utf-8")).hexdigest() < thresholds.get(s, dflt)
            for i, s in zip(ids, strata)
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    return docs.map_batches(samp, batch_format="pyarrow")


def repetition_stats(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_words, n_unique_words, top_word_n, top_bigram_n) —
    Gopher-style within-document repetition signals: vocabulary size vs
    length, the most-frequent word's count and the most-frequent word
    bigram's count (all integers, so the oracle matches exactly; callers
    derive the fraction filters, e.g. ``top_word_n / n_words > 0.1``)."""

    def stats(batch: pa.Table) -> pa.Table:
        rx = re.compile(WORD_RE)
        n_words, n_uniq, top_w, top_b = [], [], [], []
        for t in pc.utf8_lower(batch[text_col]).to_pylist():
            ws = rx.findall(t)
            n_words.append(len(ws))
            n_uniq.append(len(set(ws)))
            top_w.append(max(Counter(ws).values()) if ws else 0)
            top_b.append(max(Counter(zip(ws, ws[1:])).values()) if len(ws) >= 2 else 0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "n_unique_words": pa.array(n_uniq, pa.int64()),
                "top_word_n": pa.array(top_w, pa.int64()),
                "top_bigram_n": pa.array(top_b, pa.int64()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def decontaminate(
    corpus: ray.data.Dataset,
    bench: ray.data.Dataset,
    *,
    ngram: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Benchmark decontamination: (doc_id, n_contaminated) — the number
    of DISTINCT word-``ngram``s a corpus doc shares with ANY benchmark
    doc, for every doc with at least one hit (the rows a training run
    would drop or flag).

    Fully distributed: both sides emit per-doc-deduped (doc_id, gram)
    rows, grams co-locate by hash bucket (one bucketed co-group), each
    bucket resolves membership with a vectorized ``isin`` against its
    benchmark grams, and per-doc partial hit counts combine in a bucketed
    sum. Gram STRINGS (not hashes) are compared inside the buckets, so
    the result is exact — no false hits from hash collisions. Neither
    side is collected or broadcast: a small benchmark could be broadcast
    via ``ray.put`` instead, but this shape also covers benchmark sets
    too large for one node."""

    def grams_of(role: int):
        def emit(batch: pa.Table) -> pa.Table:
            rx = re.compile(WORD_RE)
            ids: list[int] = []
            gs: list[str] = []
            for i, t in zip(
                batch[id_col].to_pylist(), pc.utf8_lower(batch[text_col]).to_pylist()
            ):
                ws = rx.findall(t)
                seen = {" ".join(ws[j : j + ngram]) for j in range(len(ws) - ngram + 1)}
                ids.extend([i] * len(seen))
                gs.extend(seen)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "gram": pa.array(gs, pa.string()),
                    "is_bench": pa.array(np.full(len(ids), role, np.int8), pa.int8()),
                }
            )

        return emit

    tagged = corpus.map_batches(grams_of(0), batch_format="pyarrow").union(
        bench.map_batches(grams_of(1), batch_format="pyarrow")
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        from everythinggraph_ray.stages.agg import string_buckets

        return string_buckets(batch["gram"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        bench_grams = set(df.loc[df["is_bench"] == 1, "gram"])
        hits = df[(df["is_bench"] == 0) & df["gram"].isin(bench_grams)]
        agg = hits.groupby("doc_id").size()
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(agg.index, np.int64), pa.int64()),
                "n_contaminated": pa.array(agg.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    per_bucket = bucketed_reduce(tagged, bucket_of, red, num_buckets=num_buckets)
    return sum_by_key(per_bucket, "doc_id", ["n_contaminated"])


def mix_weights(
    docs: ray.data.Dataset,
    *,
    group_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> pd.DataFrame:
    """Per-group corpus statistics + uniform-mixing sampling weight:
    (group_cols..., n_docs, n_tokens, weight_u) where
    ``weight_u = (1_000_000 * min_group_tokens) // group_tokens`` — the
    integer floor-division form so the DuckDB oracle is bit-exact.
    Sampling each group at weight_u/1e6 equalizes every group's expected
    token contribution to the smallest group's (the naive uniform mixing
    rule; real runs plug their own target distribution in).

    Per-batch partial counts combine in one small groupby (#groups
    rows); only the final tiny table reaches the driver."""
    gcols = list(group_cols)

    def partial(batch: pa.Table) -> pa.Table:
        tok = pc.cast(pc.count_substring_regex(batch[text_col], TOKEN_RE), pa.int64())
        df = pd.DataFrame({c: batch[c].to_pylist() for c in gcols})
        df["n_docs"] = 1
        df["n_tokens"] = tok.to_numpy(zero_copy_only=False)
        g = df.groupby(gcols, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = docs.map_batches(partial, batch_format="pyarrow", batch_size=256 * 1024)
    df = parts.to_pandas().groupby(gcols, as_index=False).sum()  # small: one row per group
    min_tokens = int(df["n_tokens"].min())
    df["weight_u"] = (1_000_000 * min_tokens) // df["n_tokens"].astype(np.int64)
    df["n_docs"] = df["n_docs"].astype(np.int64)
    df["n_tokens"] = df["n_tokens"].astype(np.int64)
    df["weight_u"] = df["weight_u"].astype(np.int64)
    return df


def shard_assign(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    num_shards: int = 16,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Deterministic global shuffle + output sharding: (id, shard, pos)
    where ``shard = int(md5(str(id))[:8], 16) % num_shards`` and ``pos``
    is the row's rank within its shard ordered by (md5, id). The
    hash-order position IS the shuffle — a training run reading shards
    sequentially sees a deterministic, well-mixed order with no RNG and
    no global sort, and any failed shard can be regenerated alone (the
    resumable-output contract).

    Distributed shape: per-row md5 in map_batches, shards co-locate via
    the bucketed co-group, one vectorized sort + cumcount per bucket.
    Contract: one shard's ids fit a worker (that is what sharding is
    for — size num_shards to the corpus)."""
    S = int(num_shards)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hs = [hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids]
        sh = np.fromiter((int(h[:8], 16) % S for h in hs), np.int64, count=len(hs))
        return pa.table(
            {
                id_col: batch[id_col],
                "shard": pa.array(sh, pa.int64()),
                "__h": pa.array(hs, pa.string()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        from everythinggraph_ray.stages.agg import mix64

        return mix64(batch["shard"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def rank(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["shard", "__h", id_col], kind="stable")
        pos = df.groupby("shard").cumcount().to_numpy(np.int64)
        return pa.table(
            {
                id_col: pa.Array.from_pandas(df[id_col]),
                "shard": pa.array(df["shard"].to_numpy(np.int64), pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return bucketed_reduce(docs.select_columns([id_col]).map_batches(tag, batch_format="pyarrow"), bucket_of, rank, num_buckets=num_buckets)


def weighted_sample(
    docs: ray.data.Dataset,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement of exactly ``k`` docs with
    inclusion probability proportional to length (Efraimidis-Spirakis
    A-ES, IPL 2006): each doc draws a deterministic uniform u from its
    id's md5 (the no-RNG convention of shard_assign/mixture_sample) and
    the k largest keys ln(u)/w win — the distributed-friendly reduction
    of weighted reservoir sampling (the data-mixing sampler: at 100 TB
    every block computes its local top-k candidates in one streaming
    pass and only #blocks x k tiny rows reach the final merge; no
    shuffle of the corpus). Returns (doc_id, weight, rank) — the key
    itself stays internal so the surface is integer-only.
    """

    def keys(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        w = pc.cast(pc.utf8_length(batch[text_col]), pa.int64()).to_numpy(
            zero_copy_only=False
        ) + 1
        u = (
            np.fromiter(
                (
                    int(hashlib.md5(str(i).encode("utf-8")).hexdigest()[:8], 16)
                    for i in ids
                ),
                np.float64,
                count=len(ids),
            )
            + 0.5
        ) / 4294967296.0
        key = np.log(u) / w
        df = pd.DataFrame({id_col: ids, "weight": w, "__key": key})
        # local candidates: the global top-k can only contain each
        # block's top-k, so everything else is dropped here
        df = df.sort_values(["__key", id_col], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = docs.select_columns([id_col, text_col]).map_batches(
        keys, batch_format="pyarrow"
    ).to_pandas()  # <= #blocks x k rows
    cand = cand.sort_values(["__key", id_col], ascending=[False, True]).head(k)
    cand = cand.reset_index(drop=True)
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand[[id_col, "weight", "rank"]].astype("int64")
