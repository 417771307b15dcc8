"""Text-analysis operators for training-data pipelines.

Language-ID (n-gram/stopword heuristic), quality scoring, token counting,
document fingerprinting — each a vectorized ``map_batches`` stage over the
``documents`` table. The SQL-checkable ops (token/char/punct/stopword
counts) use RE2 regexes via ``pyarrow.compute`` so DuckDB's
``regexp_extract_all`` (also RE2) produces identical counts — verified in
tests.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TOKEN_RE = r"\S+"
WORD_RE = r"[a-z0-9]+"
PUNCT_RE = r"[.,;:!?]"
STOPWORD_RE = r"\b(the|and|of|a|to|in|is)\b"

# tiny per-language stopword profiles for the language-ID heuristic
_LANG_PROFILES = {
    "en": r"\b(the|and|of|to|in|is|that|it|for|was|with|you|this|have|are)\b",
    "de": r"\b(der|die|das|und|ist|nicht|von|mit|sich|auf|für|ein|eine|den|dem)\b",
    "fr": r"\b(le|la|les|et|de|des|un|une|est|que|pour|dans|qui|pas|sur)\b",
    "es": r"\b(el|la|los|las|y|de|que|en|un|una|es|por|para|con|no)\b",
}


def doc_stats(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_chars_calc, n_tokens, n_punct, n_stop) — quality-signal
    counts, all integers so the DuckDB oracle matches exactly."""

    def stats(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars_calc": pc.cast(pc.utf8_length(txt), pa.int64()),
                "n_tokens": pc.cast(pc.count_substring_regex(txt, TOKEN_RE), pa.int64()),
                "n_punct": pc.cast(pc.count_substring_regex(txt, PUNCT_RE), pa.int64()),
                "n_stop": pc.cast(
                    pc.count_substring_regex(pc.utf8_lower(txt), STOPWORD_RE), pa.int64()
                ),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def quality_values(txt: pa.Array | pa.ChunkedArray, *, rounded: bool = True) -> np.ndarray:
    """Vectorized quality score in [0,1] for a string array — a pure
    function of the text, so gates can compute it INLINE in the same
    map_batches as the filter (no broadcast keep-set, no second pass).
    ``rounded=False`` returns the raw IEEE double (consumers that
    quantize — e.g. rank correlation's floor(q·1e8+0.5) — must start
    from the unrounded value so a SQL mirror of the expression tree
    reproduces the identical double)."""
    n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.float64)
    n_tok = pc.count_substring_regex(txt, TOKEN_RE).to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = pc.count_substring_regex(txt, PUNCT_RE).to_numpy(zero_copy_only=False).astype(np.float64)
    n_stop = (
        pc.count_substring_regex(pc.utf8_lower(txt), STOPWORD_RE)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    len_score = np.clip(n_chars / 1000.0, 0.0, 1.0)
    tok = np.maximum(n_tok, 1.0)
    punct_ratio = n_punct / tok
    punct_score = np.clip(1.0 - np.abs(punct_ratio - 0.1) * 2.0, 0.0, 1.0)
    stop_score = np.clip(n_stop / tok * 4.0, 0.0, 1.0)
    q = 0.4 * len_score + 0.3 * punct_score + 0.3 * stop_score
    return np.round(q, 8) if rounded else q


def quality_score(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, quality) in [0,1]: length, punctuation-density and
    stopword-density heuristics (the usual web-corpus quality gates).
    Deterministic pure function of the text."""

    def score(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "quality": pa.array(quality_values(batch[text_col]), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


class LangIdStage:
    """Actor-pool language-ID: stopword-profile hit densities, argmax.

    State (compiled per-language patterns) built once per actor in
    __init__ — the reference pattern for stateful map_batches stages."""

    def __init__(self, min_tokens: int = 3):
        self.min_tokens = min_tokens
        self.langs = sorted(_LANG_PROFILES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(batch["text"])
        tok_counts = pc.count_substring_regex(txt, TOKEN_RE).to_numpy(zero_copy_only=False)
        n_tok = np.maximum(tok_counts, 1).astype(np.float64)
        scores = np.stack(
            [
                pc.count_substring_regex(txt, _LANG_PROFILES[lg])
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                / n_tok
                for lg in self.langs
            ]
        )
        best = np.argmax(scores, axis=0)
        best_score = scores[best, np.arange(scores.shape[1])]
        too_short = tok_counts < self.min_tokens  # reuse: no second regex scan
        pred = np.array(self.langs, dtype=object)[best]
        pred[(best_score <= 0.0) | too_short] = "und"
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(list(pred), pa.string())}
        )


def lang_id(docs: ray.data.Dataset, *, concurrency: int = 4) -> ray.data.Dataset:
    return docs.map_batches(LangIdStage, batch_format="pyarrow", concurrency=concurrency)


_FP_BASE = np.uint64(1099511628211)
_FP_SEED = np.uint64(1469598103934665603)


def rolling_fingerprint(text: str) -> int:
    """FNV-1a-style ROLLING hash over whitespace tokens — a stable 63-bit
    order-sensitive, whitespace-normalized document fingerprint (the
    streaming-friendly variant: updatable token-by-token without holding
    the document). The md5 ``fingerprint`` below is the oracle-checkable
    batch form; this one exists for incremental/streaming fingerprinting
    and is exactness-tested in pytest."""
    import re

    h = _FP_SEED
    for tok in re.findall(r"\S+", text):
        for byt in tok.encode("utf-8"):
            h = (h ^ np.uint64(byt)) * _FP_BASE
        h = (h ^ np.uint64(32)) * _FP_BASE  # normalized single separator
    return int(h & np.uint64(0x7FFF_FFFF_FFFF_FFFF))


def fingerprint(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, fingerprint): md5 hex digest of the whitespace-normalized
    text (``\\S+`` tokens re-joined with single spaces). Two docs differing
    only in whitespace runs/kind collide on purpose; token ORDER still
    matters. md5 (not blake2b, round-2 VERDICT) so the DuckDB oracle
    ``md5(array_to_string(regexp_extract_all(text, '\\S+'), ' '))``
    reproduces it exactly — both regex engines are RE2."""

    def fp(batch: pa.Table) -> pa.Table:
        import hashlib
        import re

        rx = re.compile(r"\S+")
        out = [
            hashlib.md5(" ".join(rx.findall(t)).encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(out, pa.string())})

    return docs.map_batches(fp, batch_format="pyarrow")


def top_tokens(docs: ray.data.Dataset, k: int = 50, text_col: str = "text") -> ray.data.Dataset:
    """Top-k word frequencies: per-batch partial counts (the combiner),
    then one small groupby-sum + sort. Ties broken by token asc."""

    def partial(batch: pa.Table) -> pa.Table:
        import re

        cnt: dict[str, int] = {}
        rx = re.compile(WORD_RE)
        for t in pc.utf8_lower(batch[text_col]).to_pylist():
            for w in rx.findall(t):
                cnt[w] = cnt.get(w, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(cnt.keys()), pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    from everythinggraph_ray.stages.agg import bucketed_reduce, string_buckets

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return string_buckets(batch["token"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("token", as_index=False)["c"].sum()
        return pa.table(
            {"token": pa.array(df["token"], pa.string()), "n": pa.array(df["c"], pa.int64())}
        )

    agg = bucketed_reduce(docs.map_batches(partial, batch_format="pyarrow"), bucket_of, red)
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


def tfidf_top_terms(
    docs: ray.data.Dataset,
    n_docs: int,
    *,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Top-k characteristic terms per document by tf-idf
    (score = tf * ln(N / df)) — the keyword-extraction / topic-labeling
    step of corpus curation. Emits (doc_id, token, score, rnk); ranking
    is on the UNROUNDED score with token-asc ties, score is rounded to
    6 decimals in the output (the SQL oracle mirrors both).

    Shape: per-batch per-doc term counts (one Counter per doc — regex
    tokenization is inherently per-doc, same idiom as inverted_index),
    document frequencies via one bucketed token reduce, df attached
    back with the bucketed hash_join (token-keyed co-group — no
    vocabulary broadcast, vocabularies are unbounded at corpus scale),
    then grouped_top_k's partial combiner caps the final shuffle at
    k rows per doc. ``n_docs`` is the global document count (callers
    pass ds.count() — the one driver-side scalar)."""
    from collections import Counter

    from everythinggraph_ray.datapipe.joins import hash_join
    from everythinggraph_ray.stages.agg import bucketed_reduce, grouped_top_k

    if n_docs < 1:
        raise ValueError("tfidf_top_terms needs n_docs >= 1")
    rx = re.compile(WORD_RE)

    def emit_tf(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        toks: list[str] = []
        tfs: list[int] = []
        for i, t in zip(
            batch[id_col].to_pylist(), pc.utf8_lower(batch[text_col]).to_pylist()
        ):
            cnt = Counter(rx.findall(t))
            ids.extend([i] * len(cnt))
            toks.extend(cnt.keys())
            tfs.extend(cnt.values())
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    tf = docs.map_batches(emit_tf, batch_format="pyarrow")

    # df = rows per token (tf rows are unique per (doc, token))
    def bucket_of(batch: pa.Table) -> np.ndarray:
        from everythinggraph_ray.stages.agg import string_buckets

        return string_buckets(batch["token"])

    def red(g: pa.Table) -> pa.Table:
        d = g.to_pandas().groupby("token", as_index=False).size()
        return pa.table(
            {
                "token": pa.array(d["token"], pa.string()),
                "df": pa.array(d["size"], pa.int64()),
            }
        )

    df = bucketed_reduce(tf.select_columns(["token"]), bucket_of, red)

    scored = hash_join(tf, df, on="token", right_cols=["df"]).map_batches(
        lambda t: t.append_column(
            "score",
            pa.array(
                t["tf"].to_numpy(zero_copy_only=False)
                * np.log(float(n_docs) / t["df"].to_numpy(zero_copy_only=False)),
                pa.float64(),
            ),
        ),
        batch_format="pyarrow",
    )
    top = grouped_top_k(
        scored, id_col, [("score", False), ("token", True)], k, rank_col="rnk"
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "token": t["token"],
                "score": pc.round(t["score"], ndigits=6),
                "rnk": t["rnk"],
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


def inverted_index(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distributed inverted index: (token, df, postings) where ``df`` is
    the document frequency and ``postings`` the comma-joined sorted doc
    ids — the search-engine build step, and (with ``min_df``) the
    rare-token vocabulary pruning of tokenizer training.

    Shape: per-batch per-doc-DEDUPED (token, doc_id) rows (a doc
    contributes each token once), tokens co-locate by hash bucket, one
    vectorized sort + reduceat per bucket builds every posting list —
    no per-token Python loop, no driver state. Posting lists are strings
    so the result is a flat, oracle-comparable table; the production
    sink would keep ``list<int64>`` instead. Contract: one token's
    postings fit a worker (stopword-scale tokens are exactly the rows a
    real index shards further or drops via ``max_df``)."""
    from everythinggraph_ray.stages.agg import bucketed_reduce

    rx = re.compile(WORD_RE)

    def emit(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        toks: list[str] = []
        for i, t in zip(
            batch[id_col].to_pylist(), pc.utf8_lower(batch[text_col]).to_pylist()
        ):
            seen = sorted(set(rx.findall(t)))
            ids.extend([i] * len(seen))
            toks.extend(seen)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                id_col: pa.array(ids, pa.int64()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        from everythinggraph_ray.stages.agg import string_buckets

        return string_buckets(batch["token"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["token", id_col], kind="stable")
        toks = df["token"].to_numpy()
        ids = df[id_col].to_numpy(np.int64)
        st = np.flatnonzero(np.r_[True, toks[1:] != toks[:-1]]) if len(toks) else np.empty(0, np.int64)
        cnt = np.diff(np.r_[st, len(toks)])
        keep = cnt >= min_df
        id_str = ids.astype(str)
        postings = [
            ",".join(id_str[s : s + c]) for s, c, k in zip(st, cnt, keep) if k
        ]
        return pa.table(
            {
                "token": pa.array(toks[st[keep]], pa.string()),
                "df": pa.array(cnt[keep].astype(np.int64), pa.int64()),
                "postings": pa.array(postings, pa.string()),
            }
        )

    return bucketed_reduce(
        docs.map_batches(emit, batch_format="pyarrow"), bucket_of, red, num_buckets=num_buckets
    )


def winnow_fingerprints(
    docs: ray.data.Dataset,
    *,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS local fingerprinting scheme): hash every k-gram of word tokens,
    slide a window of ``w`` consecutive gram hashes over the document, and
    select the MINIMUM hash of each window (rightmost position on ties).
    The selected set is position-robust: any shared substring of at least
    ``k + w - 1`` tokens between two documents is guaranteed to share at
    least one fingerprint — the local-dedup / plagiarism-detection
    primitive (the reference has no text surface; this extends the
    training-data layer like datapipe/dedup.py).

    Deterministic and SQL-checkable: tokens are ``[a-z0-9]+`` on the
    lowercased text, the gram hash is the lower 64 bits of
    md5('_'.join(gram)) (DuckDB ``md5_number_lower``), so the DuckDB
    oracle reproduces the selected set exactly. Emits one row per
    selected gram: (doc_id, pos [1-based gram index], h [hash >> 3 so it
    fits BIGINT]). Docs with fewer than ``k + w - 1`` tokens emit nothing
    (no full window exists).

    Per-doc work is embarrassingly parallel (one map_batches, no
    shuffle); the window argmin is a vectorized sliding-window argmin
    over a reversed view (np.argmin takes the FIRST min of the reversed
    window = the RIGHTMOST of the original — the paper's tie rule).
    """
    import hashlib

    rx = re.compile(WORD_RE)

    def fp(batch: pa.Table) -> pa.Table:
        ids_out: list[np.ndarray] = []
        pos_out: list[np.ndarray] = []
        h_out: list[np.ndarray] = []
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        for did, txt in zip(ids, pc.utf8_lower(batch[text_col]).to_pylist()):
            toks = rx.findall(txt)
            m = len(toks) - k + 1  # number of k-grams
            if m < w:
                continue
            h = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5("_".join(toks[i : i + k]).encode()).digest()[8:16],
                        "little",
                    )
                    for i in range(m)
                ),
                dtype=np.uint64,
                count=m,
            )
            win = np.lib.stride_tricks.sliding_window_view(h, w)[:, ::-1]
            sel = np.arange(win.shape[0]) + (w - 1 - np.argmin(win, axis=1))
            sel = np.unique(sel)
            ids_out.append(np.full(len(sel), did, np.int64))
            pos_out.append(sel + 1)  # 1-based, matches the SQL oracle
            h_out.append((h[sel] >> np.uint64(3)).astype(np.int64))
        if not ids_out:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(ids_out), pa.int64()),
                "pos": pa.array(np.concatenate(pos_out), pa.int64()),
                "h": pa.array(np.concatenate(h_out), pa.int64()),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


def top_tokens_per_lang(
    docs: ray.data.Dataset,
    k: int = 10,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Grouped heavy hitters: the k most frequent words per language
    (top_tokens generalized to a grouped final). Per-batch (lang, token)
    partial counts (the combiner), (lang, token)-bucketed exact sums,
    then grouped_top_k — the shuffle moves distinct (lang, token) pairs
    and the final moves k·|langs| rows, never the corpus."""
    import re as _re

    from hashlib import blake2b

    from everythinggraph_ray.stages.agg import bucketed_reduce, grouped_top_k

    def partial(batch: pa.Table) -> pa.Table:
        rx = _re.compile(WORD_RE)
        cnt: dict[tuple[str, str], int] = {}
        langs = batch[lang_col].to_pylist()
        for lg, t in zip(langs, pc.utf8_lower(batch[text_col]).to_pylist()):
            for w in rx.findall(t):
                cnt[(lg, w)] = cnt.get((lg, w), 0) + 1
        ks = list(cnt.keys())
        return pa.table(
            {
                lang_col: pa.array([a for a, _ in ks], pa.string()),
                "token": pa.array([b for _, b in ks], pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        from everythinggraph_ray.stages.agg import string_buckets

        return string_buckets(batch[lang_col], batch["token"])

    def red(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby([lang_col, "token"], as_index=False)["c"].sum()
        df = df.rename(columns={"c": "n"})
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"), bucket_of, red
    )
    return grouped_top_k(
        agg, lang_col, [("n", False), ("token", True)], k, rank_col="rank"
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: ray.data.Dataset,
    terms: tuple[str, ...],
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Okapi BM25 retrieval: top-``k`` documents for a fixed term query
    (k1=1.2, b=0.75, Lucene idf ``ln((N-df+0.5)/(df+0.5)+1)``) — the
    query-time complement of ``inverted_index``.

    One tokenization pass over the corpus emits a NARROW int table:
    candidate rows (doc_id, len_d, tf_0..tf_{T-1}) for docs matching at
    least one term, plus one per-batch partial row (kind=1) carrying
    (n_docs, total_len, df_0..df_{T-1}). That table is materialized
    (ints, <= one row per doc — tiny next to the text), the partials
    fold to T+2 driver scalars, and candidates score vectorized with
    the broadcast idf/avglen constants, per-term products summed in
    fixed term order so the float expression tree is reproducible
    (docs_tfidf's ln-parity precedent). Returns a pandas frame
    (doc_id, score, rank) — k rows.
    """
    import re as _re

    T = len(terms)
    tf_cols = [f"tf{j}" for j in range(T)]

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        rx = _re.compile(r"[a-z0-9]+")
        idx = {t: j for j, t in enumerate(terms)}
        lens = np.zeros(len(texts), np.int64)
        tfs = np.zeros((len(texts), T), np.int64)
        for i, tx in enumerate(texts):
            toks = rx.findall((tx or "").lower())
            lens[i] = len(toks)
            for tok in toks:
                j = idx.get(tok)
                if j is not None:
                    tfs[i, j] += 1
        cand = tfs.sum(axis=1) > 0
        cols = {
            "kind": pa.array(
                np.r_[np.zeros(int(cand.sum()), np.int8), np.int8(1)], pa.int8()
            ),
            id_col: pa.array(np.r_[ids[cand], np.int64(len(texts))], pa.int64()),
            "len_d": pa.array(np.r_[lens[cand], lens.sum()], pa.int64()),
        }
        for j, c in enumerate(tf_cols):
            # partial row carries df_j (docs in this batch containing term j)
            cols[c] = pa.array(
                np.r_[tfs[cand, j], np.int64((tfs[:, j] > 0).sum())], pa.int64()
            )
        return pa.table(cols)

    narrow = docs.map_batches(stats, batch_format="pyarrow").materialize()

    def only(kind: int):
        def f(batch: pa.Table) -> pa.Table:
            m = batch["kind"].to_numpy(zero_copy_only=False) == kind
            return batch.filter(pa.array(m))

        return f

    part = narrow.map_batches(only(1), batch_format="pyarrow").to_pandas()
    n_docs = int(part[id_col].sum())
    total_len = int(part["len_d"].sum())
    dfs = [int(part[c].sum()) for c in tf_cols]
    if n_docs == 0 or total_len == 0:
        return pd.DataFrame(
            {id_col: pd.array([], dtype="int64"), "score": pd.array([], dtype="float64"),
             "rank": pd.array([], dtype="int64")}
        )
    avglen = float(total_len) / n_docs
    idfs = [
        float(np.log((float(n_docs) - df + 0.5) / (df + 0.5) + 1.0)) for df in dfs
    ]

    def score(batch: pa.Table) -> pa.Table:
        ld = batch["len_d"].to_numpy(zero_copy_only=False)
        norm = 1 - BM25_B + BM25_B * (ld / avglen)
        s = np.zeros(len(ld), np.float64)
        for j in range(T):  # fixed term order: reproducible float sum
            tf = batch[tf_cols[j]].to_numpy(zero_copy_only=False)
            # literal 2.2 (not K1+1.0): the SQL oracle writes 2.2, and the
            # two spellings are NOT the same double
            s = s + (idfs[j] * (tf * 2.2)) / (tf + BM25_K1 * norm)
        return pa.table(
            {id_col: batch[id_col], "score": pa.array(s, pa.float64())}
        )

    top = (
        narrow.map_batches(only(0), batch_format="pyarrow")
        .map_batches(score, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["score"] = np.round(top["score"].to_numpy(np.float64), 6)
    return top[[id_col, "score", "rank"]]
