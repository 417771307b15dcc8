"""Curation-layer oracles (datapipe/curate.py) + range join.

Each operator is checked against a direct serial recomputation on the
same fixture — the pytest analogue of the driver's DuckDB gate, plus the
properties SQL can't express (nested samples, bucket-width invariance).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.datapipe.curate import (
    EMAIL_RE,
    PHONE_RE,
    decontaminate,
    mix_weights,
    pii_redact,
    repetition_stats,
    stratified_sample,
)
from everythinggraph_ray.datapipe.joins import range_join


def _docs_fixture(n=120, seed=7):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = []
    for i in range(n):
        words = rng.choice(vocab, size=rng.integers(3, 40)).tolist()
        t = " ".join(words)
        if i % 5 == 0:
            t += f" mail bob{i}@test.org and alice.k{i}@sub.domain.io"
        if i % 7 == 0:
            t += " dial 415-555-0199 or 650.555.0100 now"
        rows.append(
            {
                "doc_id": i,
                "text": t,
                "lang": ["en", "de", "fr", "zh"][i % 4],
                "source": ["web", "books"][i % 2],
            }
        )
    return pd.DataFrame(rows)


def test_pii_redact_matches_serial():
    df = _docs_fixture()
    out = (
        pii_redact(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in df.iterrows():
        o = out[out["doc_id"] == r["doc_id"]].iloc[0]
        t1 = re.sub(EMAIL_RE, "<EMAIL>", r["text"])
        t2 = re.sub(PHONE_RE, "<PHONE>", t1)
        assert o["n_emails"] == len(re.findall(EMAIL_RE, r["text"]))
        assert o["n_phones"] == len(re.findall(PHONE_RE, t1))
        assert o["redacted_md5"] == hashlib.md5(t2.encode()).hexdigest()
    # the fixture actually exercises both pattern families
    assert out["n_emails"].sum() > 0 and out["n_phones"].sum() > 0


def test_pii_redact_keep_text_round_trip():
    df = _docs_fixture(30)
    out = pii_redact(ray.data.from_pandas(df), keep_text=True).to_pandas()
    for _, o in out.iterrows():
        assert hashlib.md5(o["redacted"].encode()).hexdigest() == o["redacted_md5"]
        assert "@" not in o["redacted"] or "<EMAIL>" in o["redacted"]


def test_stratified_sample_deterministic_and_nested():
    df = _docs_fixture(400)
    ds = ray.data.from_pandas(df)
    lo = {"en": 0.25, "de": 0.5}
    hi = {"en": 0.5, "de": 0.75}
    a1 = set(stratified_sample(ds, lo, default_rate=0.1).to_pandas()["doc_id"])
    a2 = set(stratified_sample(ds, lo, default_rate=0.1).to_pandas()["doc_id"])
    b = set(stratified_sample(ds, hi, default_rate=0.2).to_pandas()["doc_id"])
    assert a1 == a2  # deterministic across runs
    assert a1 <= b  # raising every rate strictly grows the sample (nested)
    # rate ~ observed fraction, loose bound
    n_en = (df["lang"] == "en").sum()
    k_en = sum(1 for i in a1 if df.loc[df["doc_id"] == i, "lang"].iloc[0] == "en")
    assert 0.1 < k_en / n_en < 0.45


def test_repetition_stats_matches_serial():
    df = _docs_fixture()
    out = (
        repetition_stats(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rx = re.compile(r"[a-z0-9]+")
    for _, r in df.iterrows():
        ws = rx.findall(r["text"].lower())
        o = out[out["doc_id"] == r["doc_id"]].iloc[0]
        assert o["n_words"] == len(ws)
        assert o["n_unique_words"] == len(set(ws))
        assert o["top_word_n"] == (max(Counter(ws).values()) if ws else 0)
        assert o["top_bigram_n"] == (
            max(Counter(zip(ws, ws[1:])).values()) if len(ws) >= 2 else 0
        )


def test_decontaminate_matches_serial():
    df = _docs_fixture(80, seed=11)
    bench_df = df[df["doc_id"] % 6 == 0]
    corp_df = df[df["doc_id"] % 6 != 0]
    got = (
        decontaminate(
            ray.data.from_pandas(corp_df),
            ray.data.from_pandas(bench_df),
            ngram=3,
            num_buckets=8,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rx = re.compile(r"[a-z0-9]+")

    def grams(t):
        ws = rx.findall(t.lower())
        return {" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)}

    bench_g = set().union(*(grams(t) for t in bench_df["text"]))
    want = {
        int(r["doc_id"]): len(grams(r["text"]) & bench_g)
        for _, r in corp_df.iterrows()
        if grams(r["text"]) & bench_g
    }
    assert dict(zip(got["doc_id"], got["n_contaminated"])) == want
    assert len(want) > 0  # fixture actually contaminates


def test_mix_weights_matches_serial():
    df = _docs_fixture()
    got = (
        mix_weights(ray.data.from_pandas(df))
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    tdf = df.copy()
    tdf["n_tokens"] = [len(re.findall(r"\S+", t)) for t in df["text"]]
    want = (
        tdf.groupby(["lang", "source"])
        .agg(n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"))
        .reset_index()
    )
    mn = want["n_tokens"].min()
    want["weight_u"] = (1_000_000 * mn) // want["n_tokens"]
    pd.testing.assert_frame_equal(
        got, want.sort_values(["lang", "source"]).reset_index(drop=True), check_dtype=False
    )
    assert (got["weight_u"] <= 1_000_000).all() and (got["weight_u"] > 0).any()


def _range_fixture(seed=3, n_l=500, n_r=60):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l).astype(np.int64),
            "ts": rng.integers(0, 10_000, n_l).astype(np.int64),
            "lid": np.arange(n_l, dtype=np.int64),
        }
    )
    st = rng.integers(0, 9_000, n_r).astype(np.int64)
    # mix of short and long (multi-bucket) intervals
    ln = np.where(rng.random(n_r) < 0.3, rng.integers(2_000, 6_000, n_r), rng.integers(0, 800, n_r))
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_r).astype(np.int64),
            "st": st,
            "en": (st + ln).astype(np.int64),
            "rid": np.arange(n_r, dtype=np.int64),
        }
    )
    return left, right


def _brute(left, right, closed):
    lo = {"both": "ge", "left": "ge", "right": "gt", "neither": "gt"}[closed]
    hi = {"both": "le", "right": "le", "left": "lt", "neither": "lt"}[closed]
    m = left.merge(right, on="k")
    ge = m["ts"] >= m["st"] if lo == "ge" else m["ts"] > m["st"]
    le = m["ts"] <= m["en"] if hi == "le" else m["ts"] < m["en"]
    return set(zip(m.loc[ge & le, "lid"], m.loc[ge & le, "rid"]))


def test_range_join_matches_bruteforce_all_closed_modes():
    left, right = _range_fixture()
    for closed in ("both", "left", "right", "neither"):
        got = range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            by="k",
            left_on="ts",
            right_start="st",
            right_end="en",
            right_cols=["rid"],
            closed=closed,
            bucket_width_us=1_000,
            num_buckets=16,
        ).to_pandas()
        assert set(zip(got["lid"], got["rid"])) == _brute(left, right, closed)
        # no duplicate pairs despite interval replication
        assert len(got) == len(set(zip(got["lid"], got["rid"])))


def test_range_join_bucket_width_invariant():
    """The result must not depend on the tiling width (replication is an
    implementation detail)."""
    left, right = _range_fixture(seed=9)
    want = _brute(left, right, "both")
    for width in (137, 5_000, 50_000):
        got = range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            by="k",
            left_on="ts",
            right_start="st",
            right_end="en",
            right_cols=["rid"],
            bucket_width_us=width,
            num_buckets=8,
        ).to_pandas()
        assert set(zip(got["lid"], got["rid"])) == want


def test_range_join_rejects_colliding_and_bad_args():
    left, right = _range_fixture()
    import pytest

    with pytest.raises(ValueError, match="collide"):
        range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right.rename(columns={"rid": "lid"})),
            by="k",
            left_on="ts",
            right_start="st",
            right_end="en",
            right_cols=["lid"],
        )
    with pytest.raises(ValueError, match="closed"):
        range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            by="k",
            left_on="ts",
            right_start="st",
            right_end="en",
            right_cols=["rid"],
            closed="open",
        )


def test_range_join_drops_inverted_intervals():
    left = pd.DataFrame({"k": [1, 1], "ts": [5, 50], "lid": [0, 1]})
    right = pd.DataFrame({"k": [1, 1], "st": [60, 0], "en": [10, 100], "rid": [0, 1]})
    got = range_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        by="k",
        left_on="ts",
        right_start="st",
        right_end="en",
        right_cols=["rid"],
        bucket_width_us=64,
    ).to_pandas()
    # interval 0 is inverted (60 > 10): silently dropped, never matched
    assert set(zip(got["lid"], got["rid"])) == {(0, 1), (1, 1)}


def _join_fixture(seed=17):
    rng = np.random.default_rng(seed)
    n_l, n_r = 300, 90
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n_l).astype(np.int64),
            "s": rng.choice(["x", "y", "z"], n_l),
            "lid": np.arange(n_l, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(20, 60, n_r).astype(np.int64),  # partial overlap
            "rs": rng.choice(["x", "y", "w"], n_r),
            "val": rng.integers(0, 10**6, n_r).astype(np.int64),
        }
    )
    return left, right


def _run_hash_join(left, right, how, on, right_on, right_cols):
    from everythinggraph_ray.datapipe.joins import hash_join

    return hash_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on=on,
        right_on=right_on,
        right_cols=right_cols,
        how=how,
        num_buckets=16,
    ).to_pandas()


def test_hash_join_inner_left_match_pandas():
    left, right = _join_fixture()
    r2 = right.rename(columns={"rk": "k", "rs": "s"})
    for how in ("inner", "left"):
        got = (
            _run_hash_join(left, right, how, ["k", "s"], ["rk", "rs"], ["val"])
            .sort_values(["lid", "val"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(r2, on=["k", "s"], how=how)
            .sort_values(["lid", "val"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want), how
        g = got["val"].to_numpy(np.float64, na_value=np.nan)
        w = want["val"].to_numpy(np.float64, na_value=np.nan)
        assert np.array_equal(np.isnan(g), np.isnan(w))
        assert np.array_equal(g[~np.isnan(g)], w[~np.isnan(w)])
        assert got["lid"].tolist() == want["lid"].tolist()
    # left keeps every left row at least once
    got_l = _run_hash_join(left, right, "left", ["k", "s"], ["rk", "rs"], ["val"])
    assert set(got_l["lid"]) == set(left["lid"])


def test_hash_join_semi_anti_partition_left():
    left, right = _join_fixture(seed=5)
    semi = _run_hash_join(left, right, "semi", "k", "rk", [])
    anti = _run_hash_join(left, right, "anti", "k", "rk", [])
    matched = set(left.loc[left["k"].isin(set(right["rk"])), "lid"])
    assert set(semi["lid"]) == matched
    assert set(anti["lid"]) == set(left["lid"]) - matched
    # semi never multiplies despite duplicate right keys
    assert len(semi) == len(set(semi["lid"]))
    assert list(semi.columns) == ["k", "s", "lid"]  # left columns only


def test_hash_join_null_keys_sql_semantics():
    """Null keys never match: inner/semi drop them, left/anti keep them."""
    left = pd.DataFrame(
        {"k": pd.array([1, 2, None, 4], dtype="Int64"), "lid": [0, 1, 2, 3]}
    )
    right = pd.DataFrame(
        {"k": pd.array([1, None], dtype="Int64"), "val": [10, 99]}
    )
    inner = _run_hash_join(left, right, "inner", "k", "k", ["val"])
    left_j = _run_hash_join(left, right, "left", "k", "k", ["val"])
    semi = _run_hash_join(left, right, "semi", "k", "k", [])
    anti = _run_hash_join(left, right, "anti", "k", "k", [])
    assert set(inner["lid"]) == {0}
    assert set(semi["lid"]) == {0}
    assert set(anti["lid"]) == {1, 2, 3}
    assert set(left_j["lid"]) == {0, 1, 2, 3}
    row2 = left_j[left_j["lid"] == 2].iloc[0]
    assert pd.isna(row2["val"])  # null-key left row kept, unmatched


def test_hash_join_rejects_bad_args():
    import pytest

    left, right = _join_fixture()
    with pytest.raises(ValueError, match="how"):
        _run_hash_join(left, right, "outer", "k", "rk", [])
    with pytest.raises(ValueError, match="left columns"):
        _run_hash_join(left, right.rename(columns={"val": "lid"}), "inner", "k", "rk", ["lid"])
    with pytest.raises(ValueError, match="right_cols"):
        _run_hash_join(left, right, "semi", "k", "rk", ["val"])


def test_grouped_quantiles_matches_numpy():
    """grouped_quantiles == the quantile_disc definition (sorted element
    at index ceil(q*n)-1), per group and globally, across bucket splits."""
    from everythinggraph_ray.stages.agg import grouped_quantiles

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 2000),
            "v": rng.integers(0, 300, 2000).astype(np.int64),
        }
    )
    qs = [0.25, 0.5, 0.9, 0.99, 1.0]

    def disc(vals, q):
        s = np.sort(vals)
        return int(s[max(int(np.ceil(q * len(s))), 1) - 1])

    got = (
        grouped_quantiles(ray.data.from_pandas(df), "v", qs, group_col="g", num_buckets=8)
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    assert len(got) == 3
    for g, grp in df.groupby("g"):
        for q, col in zip(qs, ["p25", "p50", "p90", "p99", "p100"]):
            assert got.loc[g, col] == disc(grp["v"].to_numpy(), q), (g, q)

    glob = grouped_quantiles(ray.data.from_pandas(df), "v", [0.5]).to_pandas()
    assert len(glob) == 1 and glob["p50"][0] == disc(df["v"].to_numpy(), 0.5)

    import pytest

    with pytest.raises(ValueError, match="qs"):
        grouped_quantiles(ray.data.from_pandas(df), "v", [0.0])


def test_shard_assign_deterministic_and_complete():
    """shard_assign: every id exactly once, shards balanced-ish, pos is a
    dense 0..n_s-1 rank in (md5, id) order, stable across runs and
    independent of input partitioning."""
    import hashlib as hl

    from everythinggraph_ray.datapipe.curate import shard_assign

    ids = np.arange(700, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    a = shard_assign(ray.data.from_pandas(df), num_shards=8).to_pandas()
    b = shard_assign(
        ray.data.from_pandas(df).repartition(13), num_shards=8
    ).to_pandas()
    for out in (a, b):
        assert sorted(out["doc_id"]) == list(ids)
        hx = {i: hl.md5(str(i).encode()).hexdigest() for i in ids}
        for s, grp in out.groupby("shard"):
            grp = grp.sort_values("pos")
            assert list(grp["pos"]) == list(range(len(grp)))  # dense rank
            want_order = sorted(grp["doc_id"], key=lambda i: (hx[i], i))
            assert list(grp["doc_id"]) == want_order
        assert (out["shard"] == [int(hx[i][:8], 16) % 8 for i in out["doc_id"]]).all()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    assert a["shard"].nunique() == 8


def test_inverted_index_matches_serial():
    """inverted_index == a serial build: df counts, sorted postings,
    min_df pruning; doc-level dedup means repeated tokens count once."""
    from everythinggraph_ray.datapipe.text import inverted_index

    df = _docs_fixture(90, seed=13)
    got = (
        inverted_index(ray.data.from_pandas(df), min_df=2, num_buckets=8)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    rx = re.compile(r"[a-z0-9]+")
    want: dict[str, list[int]] = {}
    for _, r in df.iterrows():
        for t in set(rx.findall(r["text"].lower())):
            want.setdefault(t, []).append(int(r["doc_id"]))
    want = {t: sorted(v) for t, v in want.items() if len(v) >= 2}
    assert set(got["token"]) == set(want)
    for _, r in got.iterrows():
        assert r["df"] == len(want[r["token"]])
        assert r["postings"] == ",".join(map(str, want[r["token"]]))


def test_hash_join_native_impl_equivalent():
    """impl='native' (Ray's experimental Dataset.join) == impl='bucketed'
    on every join type, including the no-match and duplicate-key paths."""
    from everythinggraph_ray.datapipe.joins import hash_join

    left, right = _join_fixture(seed=29)

    def run(how, impl, right_cols):
        return hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            right_on="rk",
            right_cols=right_cols,
            how=how,
            num_buckets=8,
            impl=impl,
        ).to_pandas()

    for how, rc in [("inner", ["val"]), ("left", ["val"]), ("semi", []), ("anti", [])]:
        a = run(how, "bucketed", rc)
        b = run(how, "native", rc)
        key = ["lid"] + rc
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert sorted(a.columns) == sorted(b.columns), how
        assert len(a) == len(b), how
        for c in a.columns:
            av = a[c].to_numpy(np.float64, na_value=np.nan) if a[c].dtype.kind in "if" else a[c].to_numpy()
            bv = b[c].to_numpy(np.float64, na_value=np.nan) if b[c].dtype.kind in "if" else b[c].to_numpy()
            if av.dtype.kind == "f":
                assert np.array_equal(np.isnan(av), np.isnan(bv)), (how, c)
                assert np.array_equal(av[~np.isnan(av)], bv[~np.isnan(bv)]), (how, c)
            else:
                assert np.array_equal(av, bv), (how, c)


def test_write_sharded_resume_and_readback(tmp_path):
    """write_sharded: deterministic md5 shards, _SUCCESS-last markers,
    resume skips completed shards, read_sharded sees only marked dirs."""
    from everythinggraph_ray.datapipe.sink import (
        completed_shards,
        read_sharded,
        write_sharded,
    )

    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64), "v": np.arange(400) * 3})
    out = str(tmp_path / "sharded")
    n1 = write_sharded(ray.data.from_pandas(df), out, num_shards=8)
    assert sum(n1.values()) == 400 and set(n1) == set(range(8))
    assert completed_shards(out) == set(range(8))

    back = read_sharded(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)

    # simulate a failed run: two shards lose their marker → resume
    # rewrites exactly those, completed ones are skipped
    import os

    for s in (2, 5):
        os.remove(f"{out}/shard={s}/_SUCCESS")
    n2 = write_sharded(ray.data.from_pandas(df), out, num_shards=8)
    assert set(n2) == {2, 5}
    assert completed_shards(out) == set(range(8))
    back2 = read_sharded(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back2, df)

    # a marker-less dir is invisible to readers
    os.remove(f"{out}/shard=3/_SUCCESS")
    part = read_sharded(out).to_pandas()
    assert len(part) == 400 - n1[3]
    # shard membership matches shard_assign's md5 rule
    import hashlib as hl

    got3 = set(
        read_sharded(out, shards=[1])
        .to_pandas()["doc_id"]
    )
    want3 = {i for i in range(400) if int(hl.md5(str(i).encode()).hexdigest()[:8], 16) % 8 == 1}
    assert got3 == want3


def test_hash_join_exact_at_63bit_keys():
    """Regression: the bucketed join used to to_pandas the role-tagged
    UNION, whose injected nulls float64-coerced int64 columns — silently
    corrupting values above 2^53 (url-hash vids). All four modes must be
    exact at 63-bit keys and 63-bit carried values."""
    rng = np.random.default_rng(11)
    base = rng.integers(1 << 60, 1 << 62, 200).astype(np.int64)
    left = pd.DataFrame(
        {
            "k": base,
            "other": base + 1,  # non-key 63-bit column must survive intact
            "lid": np.arange(200),
        }
    )
    right = pd.DataFrame({"rk": base[::2], "val": base[::2] * 2 + 1})
    kset = set(right["rk"])
    semi = _run_hash_join(left, right, "semi", "k", "rk", [])
    assert set(semi["k"]) == kset and set(semi["other"]) == {k + 1 for k in kset}
    anti = _run_hash_join(left, right, "anti", "k", "rk", [])
    assert set(anti["k"]) == set(base) - kset
    inner = _run_hash_join(left, right, "inner", "k", "rk", ["val"])
    assert set(inner["k"]) == kset
    assert all(v == k * 2 + 1 for k, v in zip(inner["k"], inner["val"]))
    # left join: unmatched rows put nulls in val, so check via ARROW —
    # the operator emits exact int64+nulls; a driver-side to_pandas view
    # of nullable int64 float-coerces by pandas' own semantics
    import pyarrow as pa

    from everythinggraph_ray.datapipe.joins import hash_join

    ds = hash_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on="k",
        right_on="rk",
        right_cols=["val"],
        how="left",
        num_buckets=16,
    )
    t = pa.concat_tables(ray.get(ds.to_arrow_refs())).to_pydict()
    assert t and pa.concat_tables(ray.get(ds.to_arrow_refs()))["val"].type == pa.int64()
    assert set(t["k"]) == set(base)
    assert all(v is None or v == k * 2 + 1 for k, v in zip(t["k"], t["val"]))
    assert sum(v is not None for v in t["val"]) == len(kset)


def test_web_crawl_schedule_slot_semantics():
    """Per-host slots are exactly 1..n_host (unique, contiguous), and
    slot 1 of each host is its top-PageRank page (matches
    web_top_per_domain's rank-1 rows)."""
    from everythinggraph_ray.pipelines.queries import (
        q_web_crawl_schedule,
        q_web_top_per_domain,
    )

    df = q_web_crawl_schedule("/root/testdata/sf0.001").to_pandas()
    g = df.groupby("domain")["slot"]
    assert (g.min() == 1).all()
    assert (g.max() == g.count()).all()
    assert g.apply(lambda s: s.is_unique).all()

    top = q_web_top_per_domain("/root/testdata/sf0.001").to_pandas()
    want_first = top[top["rk"] == 1].set_index("domain")["vid"].to_dict()
    got_first = df[df["slot"] == 1].set_index("domain")["vid"].to_dict()
    assert got_first == want_first


def test_web_hostrank_matches_serial_weighted_pagerank():
    """Host-graph contraction + weighted PR == the serial reference:
    same keep-latest, same link extraction, same host hashing, same
    weight aggregation, wpagerank_oracle for the 10 iterations."""
    from urllib.parse import urlsplit

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from everythinggraph_ray.graph.oracle import wpagerank_oracle
    from everythinggraph_ray.hashing import urls_to_vids
    from everythinggraph_ray.html import extract_links
    from everythinggraph_ray.pipelines.queries import _corpus_for, q_web_hostrank

    import pyarrow as pa

    sf = "/root/testdata/sf0.001"
    got = q_web_hostrank(sf)
    # output is keyed by domain since round 4 (SQL-checkable); the serial
    # oracle works in host-hash vid space — recover vids from the names
    got = got.assign(
        vid=urls_to_vids(pa.array(got["domain"].tolist(), pa.string()))
    ).sort_values("vid").reset_index(drop=True)

    t = pq.read_table(_corpus_for(sf))
    df = pd.DataFrame(
        {
            "url": t["url"].to_pylist(),
            "ts": t["warc_ts"].to_pandas(),
            "html": t["html"].to_pylist(),
        }
    )
    df = df.sort_values("ts").groupby("url", as_index=False).tail(1)
    sh, dh = [], []
    for u, h in zip(df["url"], df["html"]):
        hu = urlsplit(u).netloc.lower()
        for l in extract_links(h, u):
            hl = urlsplit(l).netloc.lower()
            if hu != hl:
                sh.append(hu)
                dh.append(hl)
    import pyarrow as pa

    sv = urls_to_vids(pa.array(sh, pa.string()))
    dv = urls_to_vids(pa.array(dh, pa.string()))
    # aggregate multiplicities
    e = pd.DataFrame({"s": sv, "d": dv}).groupby(["s", "d"], as_index=False).size()
    vids, ranks = wpagerank_oracle(
        e["s"].to_numpy(np.int64),
        e["d"].to_numpy(np.int64),
        e["size"].to_numpy(np.float64),
        n_iters=10,
    )
    assert np.array_equal(got["vid"].to_numpy(), vids)
    np.testing.assert_allclose(got["hostrank"].to_numpy(), ranks, rtol=0, atol=1e-7)
    # every host in the graph carries its real name (link-target-only
    # hosts included — their name comes from the link url itself)
    assert (got["domain"] != "").all()


def _ws_serial(ids, texts, k):
    w = np.array([len(t) + 1 for t in texts], dtype=np.int64)
    u = (
        np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in ids],
            dtype=np.float64,
        )
        + 0.5
    ) / 4294967296.0
    key = np.log(u) / w
    df = pd.DataFrame({"doc_id": ids, "weight": w, "__key": key})
    df = df.sort_values(["__key", "doc_id"], ascending=[False, True]).head(k)
    df = df.reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["doc_id", "weight", "rank"]].astype("int64")


def test_weighted_sample_matches_serial():
    from everythinggraph_ray.datapipe.curate import weighted_sample

    rng = np.random.default_rng(5)
    ids = list(range(300))
    texts = ["x" * int(n) for n in rng.integers(1, 500, size=300)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ).repartition(7)  # several blocks: exercises the per-block candidate cut
    got = weighted_sample(ds, 25)
    want = _ws_serial(ids, texts, 25)
    pd.testing.assert_frame_equal(got, want)


def test_weighted_sample_prefers_heavy_docs():
    from everythinggraph_ray.datapipe.curate import weighted_sample

    # 10 docs carry ~98% of the weight mass: nearly all must be sampled
    ids = list(range(210))
    texts = ["y" * 10000] * 10 + ["z" * 10] * 200
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    got = weighted_sample(ds, 20)
    heavy = sum(1 for d in got["doc_id"] if d < 10)
    assert heavy >= 8, got
