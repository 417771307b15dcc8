"""BPE tokenizer TRAINING over a corpus — the merge-table learning loop
(Sennrich et al. ACL'16; the GPT-2 byte-pair variant's word-level core).

Training never touches the corpus after pass 0: BPE operates on the
word-frequency VOCABULARY, so the per-merge work is O(|vocab|), not
O(corpus). Distributed shape:

  0. word counts — per-batch Counter combiner + one bucketed token
     reduce (the top_tokens machinery); the corpus is read ONCE.
  1. per merge step (K steps, loop-carried Dataset state):
     a. adjacent-symbol-pair counts weighted by word frequency —
        per-batch partial Counter → one bucketed pair sum;
     b. the argmax pair (count desc, then lexicographic (l, r) asc for
        determinism) via distributed sort + limit(1) — TWO strings to
        the driver per step, never the pair table;
     c. vocabulary rewrite — the (l, r) pair broadcasts in the closure
        and each batch merges left-to-right within each word.

The learned table is (rank, left, right) — apply-side parity with any
standard BPE implementation given the same vocabulary and tie rule.
No SQL form (iterative rewriting); exactness is pytest-checked against
a serial dict-based reference.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.datapipe.text import WORD_RE
from everythinggraph_ray.stages.agg import bucketed_reduce


def _blake_bucket(col: pa.Array) -> np.ndarray:
    from everythinggraph_ray.stages.agg import string_buckets

    return string_buckets(col)


def word_counts(
    docs: ray.data.Dataset, *, text_col: str = "text"
) -> ray.data.Dataset:
    """(word, n) over the corpus — per-batch Counter, one bucketed sum."""
    rx = re.compile(WORD_RE)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cnt: Counter[str] = Counter()
        for t in pc.utf8_lower(batch[text_col]).to_pylist():
            cnt.update(rx.findall(t))
        return pa.table(
            {
                "word": pa.array(list(cnt.keys()), pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return _blake_bucket(batch["word"])

    def red(g: pa.Table) -> pa.Table:
        d = g.to_pandas().groupby("word", as_index=False)["n"].sum()
        return pa.table(
            {
                "word": pa.array(d["word"], pa.string()),
                "n": pa.array(d["n"], pa.int64()),
            }
        )

    return bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"), bucket_of, red
    )


def _merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """One left-to-right merge pass of (left, right) -> left+right."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    docs: ray.data.Dataset,
    *,
    n_merges: int = 8,
    text_col: str = "text",
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges; returns a DataFrame
    (rank, left, right, pair_count) — rank 0 is the first merge."""
    vocab = word_counts(docs, text_col=text_col)

    def symbolize(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        return pa.table(
            {
                "syms": pa.array([list(w) for w in words], pa.list_(pa.string())),
                "n": batch["n"],
            }
        )

    state = vocab.map_batches(symbolize, batch_format="pyarrow").materialize()
    merges: list[tuple[int, str, str, int]] = []

    for rank in range(n_merges):

        def pair_partial(batch: pa.Table) -> pa.Table:
            cnt: Counter[tuple[str, str]] = Counter()
            ns = batch["n"].to_numpy(zero_copy_only=False)
            for syms, n in zip(batch["syms"].to_pylist(), ns):
                n = int(n)
                for a, b in zip(syms, syms[1:]):
                    cnt[(a, b)] += n
            if not cnt:
                return pa.table(
                    {
                        "l": pa.array([], pa.string()),
                        "r": pa.array([], pa.string()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            ls, rs = zip(*cnt.keys())
            return pa.table(
                {
                    "l": pa.array(list(ls), pa.string()),
                    "r": pa.array(list(rs), pa.string()),
                    "c": pa.array(list(cnt.values()), pa.int64()),
                }
            )

        def pair_bucket(batch: pa.Table) -> np.ndarray:
            from everythinggraph_ray.stages.agg import string_buckets

            return string_buckets(batch["l"], batch["r"])

        def pair_red(g: pa.Table) -> pa.Table:
            d = g.to_pandas().groupby(["l", "r"], as_index=False)["c"].sum()
            return pa.Table.from_pandas(d, preserve_index=False)

        pairs = bucketed_reduce(
            state.map_batches(pair_partial, batch_format="pyarrow"),
            pair_bucket,
            pair_red,
        )
        # argmax pair: distributed sort, ONE row to the driver
        top = pairs.sort(["c", "l", "r"], descending=[True, False, False]).limit(1)
        tdf = top.to_pandas()
        if not len(tdf) or int(tdf["c"].iloc[0]) < 2:
            break  # nothing left to merge
        left, right, c = str(tdf["l"].iloc[0]), str(tdf["r"].iloc[0]), int(tdf["c"].iloc[0])
        merges.append((rank, left, right, c))

        def apply_merge(batch: pa.Table, _l=left, _r=right) -> pa.Table:
            return pa.table(
                {
                    "syms": pa.array(
                        [
                            _merge_word(s, _l, _r)
                            for s in batch["syms"].to_pylist()
                        ],
                        pa.list_(pa.string()),
                    ),
                    "n": batch["n"],
                }
            )

        # loop-carried state: materialize per round (K is small and the
        # vocab table is compact; the settle rationale from MSF/SCC)
        state = state.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])


def bpe_train_serial(
    texts: list[str], *, n_merges: int = 8
) -> pd.DataFrame:
    """Dict-based serial reference: identical vocabulary, pair counting,
    tie rule (count desc, then (l, r) lexicographic asc)."""
    rx = re.compile(WORD_RE)
    wc: Counter[str] = Counter()
    for t in texts:
        wc.update(rx.findall(t.lower()))
    vocab = {w: (list(w), n) for w, n in wc.items()}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        cnt: Counter[tuple[str, str]] = Counter()
        for syms, n in vocab.values():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += n
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < 2:
            break
        merges.append((rank, l, r, c))
        vocab = {w: (_merge_word(s, l, r), n) for w, (s, n) in vocab.items()}
    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])


class BPEApplyStage:
    """Actor-pool merge-table application: the learned merges broadcast
    once per actor (``__init__``), each batch tokenizes per word with a
    per-actor word→n_tokens cache (zipfian text → most words hit the
    cache). Emits (id_col, n_bpe_tokens, n_words)."""

    def __init__(self, merges: list[tuple[str, str]], id_col: str, text_col: str):
        self.merges = list(merges)
        self.id_col = id_col
        self.text_col = text_col
        self.rx = re.compile(WORD_RE)
        self._cache: dict[str, int] = {}

    def _word_tokens(self, w: str) -> int:
        n = self._cache.get(w)
        if n is None:
            syms = list(w)
            for left, right in self.merges:
                syms = _merge_word(syms, left, right)
            n = len(syms)
            if len(self._cache) < 2_000_000:  # bound actor memory
                self._cache[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch[self.id_col]
        n_tok: list[int] = []
        n_words: list[int] = []
        for t in pc.utf8_lower(batch[self.text_col]).to_pylist():
            ws = self.rx.findall(t)
            n_words.append(len(ws))
            n_tok.append(sum(self._word_tokens(w) for w in ws))
        return pa.table(
            {
                self.id_col: ids,
                "n_bpe_tokens": pa.array(n_tok, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
            }
        )


def bpe_apply(
    docs: ray.data.Dataset,
    merges: pd.DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Token counts under a learned merge table — the apply side of
    bpe_train (train on a sample, apply to the corpus: the production
    tokenizer split). Stateful actor stage: merges load once per actor."""
    pairs = list(zip(merges["left"].tolist(), merges["right"].tolist()))
    return docs.map_batches(
        BPEApplyStage,
        fn_constructor_args=(pairs, id_col, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
