"""Analytics batch (session 11, fourth wave): Holt-Winters seasonal
smoothing on the integer grid, a fully-join-based (broadcast-free)
naive-Bayes language classifier, and greedy set cover.

Distributed shapes:
- ``events_holt_winters``: additive Holt-Winters (alpha=beta=gamma=1/2,
  period 7 in observation index) over the per-day value-milli totals.
  Day totals fold distributed (the monthly_growth device); the
  inherently-serial 3-state recursion runs on the driver's bounded day
  table in exact integers with TRUNC division. The SQL oracle carries
  the 7-slot seasonal register as SEVEN rotating recursive-CTE columns
  (a shift register: g1 = seasonal just computed, g7 = seasonal from 7
  steps ago) — lag-7 state inside a recursion that can only see the
  previous row.
- ``docs_nb_langid``: add-one-smoothed multinomial naive Bayes over
  WORD_RE tokens, trained and evaluated on the corpus WITHOUT any
  model broadcast: per-(token, lang) counts fold via the two-key
  bucketed sum, widen to the 5 fixed langs per token in one bucketed
  pass, then SCORING IS A JOIN — doc tokens co-locate with their
  token's weight row by token-hash bucket, per-doc per-lang partials
  sum by doc. Per-token weights are integer micro-log10s (each token's
  log rounded to int64 BEFORE summation, so scores are summation-
  order-proof); argmax tie -> lexicographically smallest lang. Rows-
  only (log10 inside SQL would be float-boundary-fragile); serial
  replay + accuracy pytests.
- ``supplier_cover_greedy``: classic greedy SET COVER (suppliers
  covering parts), 10 rounds: per-round coverage counts = semi-join of
  the incidence edges against the uncovered set + bucketed sum; the
  argmax pick is a 1-row driver fold; the uncovered set shrinks by an
  anti-join and is lineage-cut (sever) each round. SQL oracle unrolls
  the 10 picks as MATERIALIZED CTE pairs.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from everythinggraph_ray.datapipe.joins import hash_join
from everythinggraph_ray.datapipe.text import WORD_RE
from everythinggraph_ray.pipelines.analytics_extra12 import HOLT_SCALE, _tdiv2
from everythinggraph_ray.stages.agg import (
    bucketed_reduce,
    mix64,
    sever,
    sum_by_key,
    sum_by_key_pair,
)

ANALYTICS16_QUERIES: dict = {}
ANALYTICS16_ORACLES: dict = {}

NB_LANGS = ("de", "en", "es", "fr", "zh")
COVER_ROUNDS = 10
HW_PERIOD = 7


# ----------------------------------------------------------------------
# Holt-Winters (additive, period 7, integer grid, trunc division)
# ----------------------------------------------------------------------
def q_events_holt_winters(sf_dir):
    """s_t/b_t/g_t recursion with alpha=beta=gamma=1/2 over day totals:
    l' = trunc((v - g7 + l + b)/2); b' = trunc((l' - l + b)/2);
    g' = trunc((v - l' + g7)/2), where g7 is the seasonal computed 7
    observations ago (0 for the first 7). Row 1 seeds l = v, b = 0."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        v = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * HOLT_SCALE + 0.5
        ).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "v": pa.array(np.bincount(inv, weights=v).astype(np.int64), pa.int64()),
            }
        )

    days = (
        ev.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("day", as_index=False)["v"]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    lev = int(days["v"].iloc[0])
    b = 0
    reg = [0] * HW_PERIOD  # reg[-1] = seasonal 7 steps ago
    out_l, out_b, out_g = [lev], [0], [0]
    for v in days["v"].iloc[1:]:
        g7 = reg[-1]
        l_new = _tdiv2(int(v) - g7 + lev + b)
        b = _tdiv2(l_new - lev + b)
        g_new = _tdiv2(int(v) - l_new + g7)
        lev = l_new
        reg = [g_new] + reg[:-1]
        out_l.append(lev)
        out_b.append(b)
        out_g.append(g_new)
    days["level_milli"] = np.array(out_l, np.int64)
    days["trend_milli"] = np.array(out_b, np.int64)
    days["season_milli"] = np.array(out_g, np.int64)
    return days.astype("int64")


ANALYTICS16_QUERIES["events_holt_winters"] = q_events_holt_winters


def _hw_sql() -> str:
    regs = ", ".join(f"CAST(0 AS BIGINT) AS g{i}" for i in range(1, HW_PERIOD + 1))
    lx = "(d.v - h.g7 + h.l + h.b) // 2"
    bx = f"(({lx}) - h.l + h.b) // 2"
    gx = f"(d.v - ({lx}) + h.g7) // 2"
    rot = ", ".join(f"h.g{i - 1} AS g{i}" for i in range(2, HW_PERIOD + 1))
    return (
        "WITH RECURSIVE dd AS (SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, "
        f"CAST(SUM(CAST(FLOOR(value * {HOLT_SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS v "
        "FROM events GROUP BY 1), "
        "days AS (SELECT day, v, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM dd), "
        f"h AS (SELECT rn, day, v, v AS l, CAST(0 AS BIGINT) AS b, {regs} "
        "FROM days WHERE rn = 1 "
        "UNION ALL "
        f"SELECT d.rn, d.day, d.v, {lx} AS l, {bx} AS b, {gx} AS g1, {rot} "
        "FROM days d JOIN h ON d.rn = h.rn + 1) "
        "SELECT day, v, l AS level_milli, b AS trend_milli, g1 AS season_milli FROM h"
    )


ANALYTICS16_ORACLES["events_holt_winters"] = _hw_sql()


# ----------------------------------------------------------------------
# naive Bayes language ID (model join, no broadcast)
# ----------------------------------------------------------------------
def _tok_key(tokens: list[str]) -> np.ndarray:
    """Stable 63-bit token key (md5 low bytes — the repo's string-key
    device, replayable in the serial oracle)."""
    import hashlib

    return np.array(
        [
            int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little")
            & 0x7FFFFFFFFFFFFFFF
            for t in tokens
        ],
        np.int64,
    )


def q_docs_nb_langid(sf_dir):
    """(doc_id, lang, pred_lang, correct): add-one multinomial NB,
    trained on the labeled corpus and scored over it via a token-hash
    JOIN (no model broadcast). Integer micro-log10 per-token weights
    make per-doc scores exact under any summation order."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    L = len(NB_LANGS)
    lang_ix = {lg: i for i, lg in enumerate(NB_LANGS)}

    def doc_tokens(t: pa.Table) -> pa.Table:
        rx = re.compile(WORD_RE)
        ids, keys, counts, langs = [], [], [], []
        for did, lg, txt in zip(
            t["doc_id"].to_pylist(),
            t["lang"].to_pylist(),
            pc.utf8_lower(t["text"]).to_pylist(),
        ):
            cnt: dict = {}
            for w in rx.findall(txt):
                cnt[w] = cnt.get(w, 0) + 1
            ks = _tok_key(list(cnt.keys()))
            ids.extend([did] * len(cnt))
            langs.extend([lang_ix[lg]] * len(cnt))
            keys.extend(ks.tolist())
            counts.extend(cnt.values())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "li": pa.array(langs, pa.int64()),
                "tok": pa.array(keys, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    toks = docs.map_batches(doc_tokens, batch_format="pyarrow").materialize()

    # model: per-(token, lang) counts -> one wide row per token
    tl = sum_by_key_pair(toks, "tok", "li", ["n"])

    def widen(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        w = df.pivot_table(index="tok", columns="li", values="n", aggfunc="sum", fill_value=0)
        cols = {"tok": pa.array(w.index.to_numpy(np.int64), pa.int64())}
        for i in range(L):
            v = w[i].to_numpy(np.int64) if i in w.columns else np.zeros(len(w), np.int64)
            cols[f"c{i}"] = pa.array(v, pa.int64())
        return pa.table(cols)

    def tok_bucket(t: pa.Table) -> np.ndarray:
        return mix64(t["tok"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    model = bucketed_reduce(tl, tok_bucket, widen)

    # per-lang token totals + vocab size (tiny driver scalars)
    lt = (
        sum_by_key(toks, "li", ["n"])
        .to_pandas()
        .set_index("li")["n"]
        .reindex(range(L))
        .fillna(0)
        .astype(np.int64)
    )
    vocab = int(model.count())
    totals = lt.to_numpy(np.int64)

    def weights(t: pa.Table) -> pa.Table:
        cols = {"tok": t["tok"]}
        for i in range(L):
            c = t[f"c{i}"].to_numpy(zero_copy_only=False)
            w = np.round(
                1_000_000 * np.log10((c + 1) / float(totals[i] + vocab))
            ).astype(np.int64)
            cols[f"w{i}"] = pa.array(w, pa.int64())
        return pa.table(cols)

    wmodel = model.map_batches(weights, batch_format="pyarrow")

    scored = hash_join(
        toks, wmodel, on="tok", right_cols=[f"w{i}" for i in range(L)]
    )

    def partial_scores(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        cols = {"doc_id": t["doc_id"], "li": t["li"]}
        for i in range(L):
            cols[f"s{i}"] = pa.array(
                n * t[f"w{i}"].to_numpy(zero_copy_only=False), pa.int64()
            )
        return pa.table(cols)

    per_doc = sum_by_key(
        scored.map_batches(partial_scores, batch_format="pyarrow"),
        "doc_id",
        [f"s{i}" for i in range(L)] + ["li"],
        out_names=[f"s{i}" for i in range(L)] + ["li_sum"],
    )
    # li is constant per doc; the sum needs de-averaging via the row count
    cnt_per_doc = sum_by_key(
        toks.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "rows": pa.array(np.ones(t.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        ),
        "doc_id",
        ["rows"],
    )
    both = hash_join(per_doc, cnt_per_doc, on="doc_id", right_cols=["rows"])

    # doc priors (tiny): docs per lang
    nd = (
        docs.map_batches(
            lambda t: pa.table(
                {
                    "li": pa.array(
                        [lang_ix[x] for x in t["lang"].to_pylist()], pa.int64()
                    ),
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("li")["one"]
        .sum()
        .reindex(range(L))
        .fillna(0)
        .astype(np.int64)
    )
    n_docs = int(nd.sum())
    priors = np.array(
        [
            int(np.round(1_000_000 * np.log10((nd.iloc[i] or 1) / float(n_docs))))
            for i in range(L)
        ],
        np.int64,
    )

    def finish(t: pa.Table) -> pa.Table:
        S = np.stack(
            [
                t[f"s{i}"].to_numpy(zero_copy_only=False) + priors[i]
                for i in range(L)
            ],
            axis=1,
        )
        pred = S.argmax(axis=1)  # np argmax: first (lexicographically smallest) wins
        li = (
            t["li_sum"].to_numpy(zero_copy_only=False)
            // t["rows"].to_numpy(zero_copy_only=False)
        )
        langs_arr = np.array(NB_LANGS, object)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": pa.array(langs_arr[li], pa.string()),
                "pred_lang": pa.array(langs_arr[pred], pa.string()),
                "correct": pa.array((pred == li).astype(np.int64), pa.int64()),
            }
        )

    from everythinggraph_ray.pipelines.queries import _typed_collect

    return _typed_collect(
        both.map_batches(finish, batch_format="pyarrow"),
        {"doc_id": "int64", "lang": "object", "pred_lang": "object", "correct": "int64"},
    )


ANALYTICS16_QUERIES["docs_nb_langid"] = q_docs_nb_langid
# no SQL oracle: integer micro-log10 weights need log10 on exact values;
# DuckDB's float rounding at micro boundaries is not contractually
# identical. Serial replay + accuracy pytests instead.


# ----------------------------------------------------------------------
# greedy set cover (suppliers covering parts)
# ----------------------------------------------------------------------
@ray.remote(num_cpus=0.25)
class _CoverPartition:
    # fractional CPUs: 8 partition actors must co-schedule even on a
    # 4-CPU test session (each round's work is a sub-ms bincount; the
    # pool would deadlock waiting for 8 full cores otherwise)
    """One supplier-hash partition of the distinct supplier→part
    incidence, pinned in actor memory (the engine's C1/C2 pattern) so
    each greedy round is ONE vectorized pass + one RPC instead of a
    4-stage Dataset pipeline. A supplier's rows live entirely in one
    actor (hash(s) partitioning), so local gains are exact; covered
    parts are broadcast to every actor after each pick, so ``alive``
    stays globally consistent. Scale contract: memory is the partition's
    incidence rows — grow the actor count, never the per-actor state."""

    def __init__(self, part_dir: str):
        from everythinggraph_ray.graph.engine import _read_part_dir

        t = _read_part_dir(part_dir)
        if t is None or t.num_rows == 0:
            self.s = np.empty(0, np.int64)
            self.p = np.empty(0, np.int64)
        else:
            self.s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
            self.p = t["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.sid, self.sinv = np.unique(self.s, return_inverse=True)
        self.alive = np.ones(len(self.s), bool)

    def best(self) -> tuple[int, int]:
        """(max gain, smallest supplier achieving it) — local lazy eval."""
        if not len(self.sid) or not self.alive.any():
            return (0, -1)
        gains = np.bincount(self.sinv[self.alive], minlength=len(self.sid))
        c = int(gains.max())
        if c == 0:
            return (0, -1)
        return (c, int(self.sid[gains == c].min()))

    def parts_of(self, s: int) -> np.ndarray:
        """The pick's still-uncovered parts (= its newly covered set)."""
        return self.p[(self.s == s) & self.alive]

    def cover(self, parts: np.ndarray) -> None:
        if len(parts):
            self.alive &= ~np.isin(self.p, parts)


def q_supplier_cover_greedy(sf_dir):
    """(rnd, suppkey, newly_covered, cum_covered): the first
    COVER_ROUNDS greedy picks of the classic set-cover heuristic over
    the distinct supplier-part incidence; stops early when every part
    is covered (SQL rounds past exhaustion contribute no rows).

    Round-4 VERDICT item 5: the per-pick work is now one actor-RPC
    round over a supplier-hash-partitioned incidence held in
    _CoverPartition actors (raw actors are justified here — greedy set
    cover is a shared mutable index the Dataset API can't express
    per-round without 4 stages/pick; was 20.4s at sf0.01)."""
    import shutil
    import tempfile

    from everythinggraph_ray.graph.build import _write_partitioned
    from everythinggraph_ray.pipelines.queries import _typed_collect

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_suppkey", "l_partkey"]
    )

    def tag(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "s": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "p": t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        ).drop_duplicates()
        df["one"] = np.int64(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = sum_by_key_pair(li.map_batches(tag, batch_format="pyarrow"), "s", "p", ["one"])
    P = 8

    def add_spart(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "s": pa.array(s, pa.int64()),
                "p": t["p"],
                "spart": pa.array((mix64(s) % np.uint64(P)).astype(np.int64), pa.int64()),
            }
        )

    spill = tempfile.mkdtemp(prefix="cover_greedy_")
    actors: list = []
    rows: list[tuple[int, int, int, int]] = []
    try:
        _write_partitioned(
            edges.map_batches(add_spart, batch_format="pyarrow"), spill, "spart"
        )
        actors = [
            _CoverPartition.remote(os.path.join(spill, f"p={i:05d}")) for i in range(P)
        ]
        cum = 0
        for rnd in range(1, COVER_ROUNDS + 1):
            bests = ray.get([a.best.remote() for a in actors])
            c, s_owner = max(
                ((c, (-s, i)) for i, (c, s) in enumerate(bests)), key=lambda t: (t[0], t[1])
            )
            pick, owner = -s_owner[0], s_owner[1]
            if c <= 0:
                break  # every part covered — SQL rounds past this add no rows
            parts = ray.get(actors[owner].parts_of.remote(pick))
            pref = ray.put(parts)
            ray.get([a.cover.remote(pref) for a in actors])
            cum += c
            rows.append((rnd, pick, c, cum))
    finally:
        for a in actors:
            ray.kill(a)
        shutil.rmtree(spill, ignore_errors=True)

    out = pd.DataFrame(
        rows, columns=["rnd", "suppkey", "newly_covered", "cum_covered"]
    ).astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {
            "rnd": "int64",
            "suppkey": "int64",
            "newly_covered": "int64",
            "cum_covered": "int64",
        },
    )


ANALYTICS16_QUERIES["supplier_cover_greedy"] = q_supplier_cover_greedy


def _cover_sql() -> str:
    ctes = [
        "e AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem)",
        "u0 AS MATERIALIZED (SELECT DISTINCT p FROM e)",
    ]
    selects = []
    for r in range(1, COVER_ROUNDS + 1):
        ctes.append(
            f"pick{r} AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT) AS c "
            f"FROM e JOIN u{r - 1} USING (p) GROUP BY s ORDER BY c DESC, s LIMIT 1)"
        )
        ctes.append(
            f"u{r} AS MATERIALIZED (SELECT p FROM u{r - 1} WHERE p NOT IN "
            f"(SELECT e.p FROM e JOIN pick{r} USING (s)))"
        )
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS rnd, CAST(s AS BIGINT) AS suppkey, "
            f"c AS newly_covered, "
            f"CAST((SELECT count(*) FROM u0) - (SELECT count(*) FROM u{r}) AS BIGINT) "
            f"AS cum_covered FROM pick{r}"
        )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


ANALYTICS16_ORACLES["supplier_cover_greedy"] = _cover_sql()
