"""Training-data operators: dedup, text analysis, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from everythinggraph_ray.datapipe.dedup import (
    MinHashStage,
    exact_duplicates,
    jaccard,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
    _token_shingles,
)
from everythinggraph_ray.datapipe.multimodal import FEATURE_DIM, decode_features, frame_sample
from everythinggraph_ray.datapipe.text import doc_stats, fingerprint, lang_id


def _docs_ds(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    )


def test_exact_duplicates():
    ds = _docs_ds(["aaa", "bbb", "aaa", "ccc", "aaa"])
    out = exact_duplicates(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1, 3]
    assert out.set_index("doc_id")["n_copies"].to_dict() == {0: 3, 1: 1, 3: 1}


def test_minhash_finds_near_duplicates():
    base = "the quick brown fox jumps over the lazy dog and runs far away home " * 5
    near = base.replace("lazy", "sleepy")
    other = "completely different words about graphs and rays and arrows " * 6
    ds = _docs_ds([base, near, other, base])
    out = minhash_near_duplicates(ds, threshold=0.5).to_pandas()
    clusters = out.set_index("doc_id")["cluster_id"].to_dict()
    assert clusters.get(0) == 0 and clusters.get(1) == 0 and clusters.get(3) == 0
    assert 2 not in clusters  # unrelated doc not clustered


def test_minhash_estimates_jaccard():
    stage = MinHashStage(num_perm=256, bands=32)
    a = "one two three four five six seven eight nine ten eleven twelve"
    b = "one two three four five six seven eight nine ten thirteen fourteen"
    sa, sb = stage.signature(a), stage.signature(b)
    est = float(np.mean(sa == sb))
    true = jaccard(np.sort(_token_shingles(a)), np.sort(_token_shingles(b)))
    assert abs(est - true) < 0.2


def test_simhash_near_vs_far():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("dog", "cat")
    far = "unrelated text entirely about something else completely different " * 8
    ds = _docs_ds([base, near, far])
    sh = simhash(ds).to_pandas().sort_values("doc_id")["simhash"].to_numpy(np.uint64)
    ham = lambda x, y: bin(int(x) ^ int(y)).count("1")
    assert ham(sh[0], sh[1]) < ham(sh[0], sh[2])
    cand = simhash_candidates(ds).to_pandas()
    pairs = {tuple(r) for r in cand[["a", "b"]].to_numpy()} if len(cand) else set()
    assert (0, 1) in pairs


def test_ngram_jaccard_pairs():
    ds = _docs_ds(["a b c d e f", "a b c d e g", "x y z w v u"])
    pairs = pd.DataFrame({"a": [0, 0], "b": [1, 2]})
    out = ngram_jaccard_pairs(ds, pairs).to_pandas()
    j01 = out[(out["a"] == 0) & (out["b"] == 1)]["jaccard"].iloc[0]
    j02 = out[(out["a"] == 0) & (out["b"] == 2)]["jaccard"].iloc[0]
    assert j01 > 0.3 and j02 == 0.0


def test_doc_stats_counts():
    ds = _docs_ds(["The cat, and the dog!", ""])
    out = doc_stats(ds).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [5, 0]
    assert out["n_punct"].tolist() == [2, 0]
    assert out["n_stop"].tolist() == [3, 0]


def test_lang_id_heuristic():
    ds = _docs_ds(
        [
            "the cat and the dog are in the house and it is big",
            "der Hund und die Katze sind nicht auf dem Tisch mit der Maus",
            "le chat et le chien sont dans la maison pour les vacances",
            "xz qqq",
        ]
    )
    out = lang_id(ds).to_pandas().sort_values("doc_id")["lang_pred"].tolist()
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr" and out[3] == "und"


def test_fingerprint_whitespace_invariant():
    ds = _docs_ds(["a b  c", "a\tb\nc", "a b d"])
    out = fingerprint(ds).to_pandas().sort_values("doc_id")["fingerprint"].tolist()
    assert out[0] == out[1]
    assert out[0] != out[2]


def test_multimodal_decode_plumbing():
    items = ray.data.from_arrow(
        pa.table(
            {
                "item_id": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array([b"abc" * 100, b"", b"zzz"], pa.binary()),
            }
        )
    )
    out = decode_features(items, batch_size=2).to_pandas().sort_values("item_id")
    assert out["n_bytes"].tolist() == [300, 0, 3]
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (3, FEATURE_DIM)
    # deterministic
    out2 = decode_features(items, batch_size=2).to_pandas().sort_values("item_id")
    assert np.array_equal(feats, np.stack(out2["features"].to_numpy()))


def _make_wav(freq: float = 440.0, n: int = 8000, rate: int = 8000) -> bytes:
    """16-bit PCM WAV via the stdlib wave module (no external codec)."""
    import io
    import wave

    t = np.arange(n) / rate
    x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_audio_wav_real_decode():
    """The audio codec ladder's stdlib-wave rung is a REAL decode (not
    the fake): segment RMS of a sine is ~amplitude/sqrt(2) in every
    segment, and the distributed stage reproduces the serial decode."""
    from everythinggraph_ray.datapipe.multimodal import (
        _fake_decode,
        default_decode_audio,
    )

    wav = _make_wav()
    feats = default_decode_audio(wav)
    assert feats.shape == (FEATURE_DIM,)
    assert not np.array_equal(feats, _fake_decode(wav))  # real path taken
    assert np.all(np.abs(feats - 0.5 / np.sqrt(2)) < 0.02)

    items = ray.data.from_arrow(
        pa.table(
            {
                "item_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array([wav, _make_wav(freq=100.0)], pa.binary()),
            }
        )
    )
    out = (
        decode_features(items, batch_size=1, decode=default_decode_audio)
        .to_pandas()
        .sort_values("item_id")
    )
    got = np.stack(out["features"].to_numpy())
    assert np.allclose(got[0], feats, atol=1e-6)


def test_codec_fallback_on_garbage():
    """Undecodable payloads fall back to the deterministic fake on BOTH
    codec ladders (and never raise) — in codec-less containers this also
    pins the documented stub behavior."""
    from everythinggraph_ray.datapipe.multimodal import (
        _fake_decode,
        default_decode,
        default_decode_audio,
    )

    junk = b"not media at all" * 3
    assert np.array_equal(default_decode(junk), _fake_decode(junk))
    assert np.array_equal(default_decode_audio(junk), _fake_decode(junk))


def test_image_pil_real_decode():
    """Runs wherever PIL is installed (skipped in this container): the
    image rung decodes a real PNG to the 4x4 grayscale feature vector."""
    import pytest

    from everythinggraph_ray.datapipe import multimodal as mm

    if mm._PIL_Image is None:
        pytest.skip("PIL not installed — image codec rung unavailable")
    import io

    img = mm._PIL_Image.new("L", (8, 8), color=200)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    feats = mm.default_decode(buf.getvalue())
    assert feats.shape == (FEATURE_DIM,)
    assert np.allclose(feats, 200.0 / 255.0, atol=1e-6)


def test_audio_soundfile_decode():
    """Runs wherever soundfile is installed (skipped in this container)."""
    import pytest

    from everythinggraph_ray.datapipe import multimodal as mm

    if mm._soundfile is None:
        pytest.skip("soundfile not installed — audio codec rung unavailable")
    feats = mm.default_decode_audio(_make_wav())
    assert feats.shape == (FEATURE_DIM,)
    assert np.all(np.abs(feats - 0.5 / np.sqrt(2)) < 0.02)


def test_frame_sample():
    items = ray.data.from_arrow(
        pa.table(
            {
                "item_id": pa.array([7], pa.int64()),
                "payload": pa.array([bytes(1024 * 25)], pa.binary()),
            }
        )
    )
    out = frame_sample(items, every_n=10).to_pandas()
    assert out["frame_idx"].tolist() == [0, 10, 20]
    assert all(len(f) == 1024 for f in out["frame"])


def test_web_curation_pipeline_invariants():
    from everythinggraph_ray.pipelines.queries import q_web_curation

    out = q_web_curation("/root/testdata/sf0.001").to_pandas().iloc[0]
    assert out["n_pages"] > 0
    assert 0 < out["n_quality"] <= out["n_pages"]
    assert 0 < out["n_unique"] <= out["n_quality"]
    # deterministic
    out2 = q_web_curation("/root/testdata/sf0.001").to_pandas().iloc[0]
    assert tuple(out) == tuple(out2)


def test_signature_matrix_matches_per_doc():
    """Blocked vectorized signatures == per-doc minhash_signature."""
    from everythinggraph_ray.datapipe.dedup import (
        _minhash_params,
        minhash_signature,
        signature_matrix,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "one two",
        "alpha beta gamma delta epsilon zeta eta theta " * 20,
    ]
    a, b = _minhash_params(64)
    got = signature_matrix(texts, a, b, k=3, slab=17)  # tiny slab: force splits
    for i, t in enumerate(texts):
        want = minhash_signature(_token_shingles(t, 3), a, b)
        assert np.array_equal(got[i], want), f"doc {i} signature mismatch"


def test_minhash_clusters_match_bruteforce():
    """Distributed LSH+verify+WCC clusters == serial all-pairs Jaccard +
    union-find reference (the round-1 driver-side semantics)."""
    from everythinggraph_ray.datapipe.dedup import minhash_near_duplicates

    base = "the quick brown fox jumps over the lazy dog and runs far away home " * 5
    texts = [
        base,
        base.replace("lazy", "sleepy"),
        "completely different words about graphs and rays and arrows " * 6,
        base,
        base.replace("quick", "swift").replace("dog", "cat"),
        "another unrelated document talking about benchmarks and clusters " * 6,
    ]
    ds = _docs_ds(texts)
    got = (
        minhash_near_duplicates(ds, threshold=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # serial reference: all-pairs exact jaccard >= threshold, union-find
    sh = [np.sort(_token_shingles(t)) for t in texts]
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    linked = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if jaccard(sh[i], sh[j]) >= 0.5:
                linked.update((i, j))
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    want = sorted((d, find(d)) for d in sorted(linked))
    assert list(map(tuple, got[["doc_id", "cluster_id"]].to_numpy())) == want


def test_group_pairs_star_fallback_surfaced():
    """An oversized bucket emits a hub star (surfaced via starred=True),
    not silence — connectivity through the hub is preserved."""
    import ray.data as rd

    from everythinggraph_ray.datapipe.pairs import group_pairs

    n = 20
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "g": pa.array([7] * n, pa.int64()),
        }
    )
    out = group_pairs(rd.from_arrow(t), ["g"], max_bucket=5).to_pandas()
    assert out["starred"].all()
    assert len(out) == n - 1  # star, not clique
    assert (out["a"] == 0).all() and set(out["b"]) == set(range(1, n))


def test_pairwise_verify_matches_direct_jaccard():
    from everythinggraph_ray.datapipe.dedup import shingle_payloads
    from everythinggraph_ray.datapipe.pairs import pairwise_verify

    texts = ["a b c d e f", "a b c d e g", "x y z w v u"]
    ds = _docs_ds(texts)
    pairs = ray.data.from_arrow(
        pa.table({"a": pa.array([0, 0], pa.int64()), "b": pa.array([1, 2], pa.int64())})
    )
    out = (
        pairwise_verify(
            shingle_payloads(ds), pairs, jaccard, out_col="jaccard", pay_type=pa.list_(pa.int64())
        )
        .to_pandas()
        .set_index(["a", "b"])["jaccard"]
    )
    sh = [np.sort(_token_shingles(t)) for t in texts]
    assert abs(out.loc[(0, 1)] - jaccard(sh[0], sh[1])) < 1e-8
    assert out.loc[(0, 2)] == 0.0


def test_simhash_stage_matches_per_doc_reference():
    """Vectorized batched SimHash == straightforward per-doc majority vote."""
    import hashlib as _hl

    from everythinggraph_ray.datapipe.dedup import _SHINGLE_RE, SimHashStage

    texts = ["the quick brown fox", "", "aaa aaa aaa bbb", "unrelated words entirely"]
    batch = pa.table(
        {"doc_id": pa.array(list(range(len(texts))), pa.int64()), "text": pa.array(texts)}
    )
    got = SimHashStage()(batch)["simhash"].to_pylist()
    for i, t in enumerate(texts):
        toks = _SHINGLE_RE.findall(t.lower())
        if not toks:
            assert got[i] == 0
            continue
        v = np.zeros(64, dtype=np.int64)
        for w in toks:
            h = int.from_bytes(_hl.blake2b(w.encode(), digest_size=8).digest(), "little")
            for j in range(64):
                v[j] += 1 if (h >> j) & 1 else -1
        want = 0
        for j in range(64):
            if v[j] > 0:
                want |= 1 << j
        assert got[i] == want & 0x7FFF_FFFF_FFFF_FFFF


def test_multimodal_queries_rows_and_determinism():
    from everythinggraph_ray.pipelines.queries import q_multimodal_features, q_multimodal_frames

    sf = "/root/testdata/sf0.001"
    cols = ["item_id", "n_bytes", "feat_mean"]
    f1 = q_multimodal_features(sf).to_pandas().sort_values(cols).reset_index(drop=True)
    f2 = q_multimodal_features(sf).to_pandas().sort_values(cols).reset_index(drop=True)
    assert len(f1) > 0 and f1.equals(f2)
    fr = q_multimodal_frames(sf).to_pandas()
    assert len(fr) > 0 and (fr["frame_len"] > 0).all() and (fr["frame_idx"] >= 0).all()


def test_candidate_starred_counts_on_oversized_bucket():
    """The starred-pair loss metric counts exactly: one oversized group of
    n ids at max_bucket < n-1 yields n-1 starred rows and 0 clique rows."""
    import ray.data as rd

    from everythinggraph_ray.datapipe.pairs import group_pairs

    n, small = 12, 3
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)) + [100, 101], pa.int64()),
            "g": pa.array([7] * n + [9, 9], pa.int64()),
        }
    )
    cand = group_pairs(rd.from_arrow(t), ["g"], max_bucket=small)

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["starred"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_pairs": pa.array([len(s)], pa.int64()),
                "n_starred": pa.array([int(s.sum())], pa.int64()),
            }
        )

    df = cand.map_batches(partial, batch_format="pyarrow").to_pandas()
    assert int(df["n_pairs"].sum()) == (n - 1) + 1  # star of 12 + the (100,101) pair
    assert int(df["n_starred"].sum()) == n - 1


def test_web_curation_matches_two_pass_reference():
    """The one-pass fused counts equal the naive two-pass formulation
    (materialize + exact_duplicates) on the same corpus."""
    from everythinggraph_ray.datapipe.dedup import exact_duplicates
    from everythinggraph_ray.datapipe.text import quality_values
    from everythinggraph_ray.hashing import urls_to_vids
    from everythinggraph_ray.pipelines.queries import _corpus_for, q_web_curation
    from everythinggraph_ray.stages.extract import pages_to_text

    out = q_web_curation("/root/testdata/sf0.001").to_pandas().iloc[0]

    pages = ray.data.read_parquet(_corpus_for("/root/testdata/sf0.001"))
    ex = pages_to_text(pages)

    def as_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(urls_to_vids(batch["url"]), pa.int64()),
                "text": batch["text"],
            }
        )

    docs = ex.map_batches(as_docs, batch_format="pyarrow").materialize()
    kept = docs.map_batches(
        lambda b: b.filter(pa.array(quality_values(b["text"]) >= 0.2)),
        batch_format="pyarrow",
    ).materialize()
    assert int(out["n_pages"]) == docs.count()
    assert int(out["n_quality"]) == kept.count()
    assert int(out["n_unique"]) == exact_duplicates(kept).count()


def test_pack_sequences_matches_serial_scan():
    """Distributed prefix-scan packing == the serial cumsum, including
    when ranges outnumber buckets (multi-range bucket path) and when a
    doc spans bins."""
    import re

    from everythinggraph_ray.datapipe.pack import BPE_RE, pack_sequences

    rng = np.random.default_rng(7)
    texts = [" ".join(f"w{i}" for i in range(int(n))) for n in rng.integers(1, 60, 300)]
    texts[5] = "x " * 500  # longer than a bin: spans bins
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(300)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = (
        pack_sequences(ds, bin_tokens=100, num_ranges=256)  # ranges > 64 buckets
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tok = np.array([len(re.findall(BPE_RE, t)) for t in texts], dtype=np.int64)
    cum = np.cumsum(tok)
    want_bin = (cum - tok) // 100
    assert np.array_equal(out["n_tokens"].to_numpy(), tok)
    assert np.array_equal(out["bin_id"].to_numpy(), want_bin)
    # contiguity: bin ids are non-decreasing in doc order and start at 0
    b = out["bin_id"].to_numpy()
    assert b[0] == 0 and (np.diff(b) >= 0).all()


def test_asof_join_two_tables_matches_pandas():
    """Generic two-table as-of join (non-strict) == a direct global
    pandas.merge_asof, including left rows with no match (nulls)."""
    import pandas as pd

    from everythinggraph_ray.datapipe.joins import asof_join

    rng = np.random.default_rng(23)
    n_l, n_r = 400, 120
    left_df = pd.DataFrame(
        {
            "eid": np.arange(n_l, dtype=np.int64),
            "t": rng.integers(0, 1000, n_l).astype(np.int64),
            "key": rng.integers(0, 12, n_l).astype(np.int64),
        }
    )
    right_df = pd.DataFrame(
        {
            "key": rng.integers(0, 12, n_r).astype(np.int64),
            "t": rng.integers(0, 1000, n_r).astype(np.int64),
            "feat": rng.integers(0, 10**6, n_r).astype(np.int64),
        }
    ).drop_duplicates(["key", "t"])  # unique (key, t): deterministic winner

    left = ray.data.from_pandas(left_df.rename(columns={"t": "ts", "key": "user"}))
    right = ray.data.from_pandas(right_df.rename(columns={"t": "ts", "key": "user"}))
    got = (
        asof_join(left, right, by="user", on="ts", value_cols=["feat"])
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )

    want = pd.merge_asof(
        left_df.sort_values(["t", "key"], kind="stable"),
        right_df.sort_values(["t", "feat"], kind="stable"),
        on="t",
        by="key",
        direction="backward",
    ).sort_values("eid").reset_index(drop=True)
    assert len(got) == n_l
    g = got["feat"].to_numpy(dtype=np.float64, na_value=np.nan)
    w = want["feat"].to_numpy(dtype=np.float64, na_value=np.nan)
    assert np.array_equal(np.isnan(g), np.isnan(w))
    assert np.array_equal(g[~np.isnan(g)], w[~np.isnan(w)])
    assert np.isnan(g).any()  # the no-match path is actually exercised


def test_cdc_chunks_properties():
    """Content-defined chunking: deterministic, bounds respected, chunks
    reassemble the document, and an edit near the END leaves the EARLY
    chunks untouched (the rolling-hash locality property fixed-size
    blocking lacks)."""
    from everythinggraph_ray.datapipe.chunk import cdc_chunks

    rng = np.random.default_rng(41)
    words = ["w%d" % x for x in rng.integers(0, 500, 3000)]
    base = " ".join(words)
    edited = base + " tail edit zzz"
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array([base, edited], pa.string()),
            }
        )
    )
    out = cdc_chunks(ds).to_pandas().sort_values(["doc_id", "chunk_idx"])
    a = out[out["doc_id"] == 1].reset_index(drop=True)
    b = out[out["doc_id"] == 2].reset_index(drop=True)
    assert len(a) > 3
    # bounds: every chunk within [min_len, max_len] except possibly the tail
    assert (a["chunk_len"].iloc[:-1] >= 64).all() and (a["chunk_len"] <= 2048).all()
    # reassembly: contiguous coverage
    assert a["chunk_start"].iloc[0] == 0
    assert (
        a["chunk_start"].iloc[1:].to_numpy()
        == (a["chunk_start"] + a["chunk_len"]).iloc[:-1].to_numpy()
    ).all()
    assert int((a["chunk_start"] + a["chunk_len"]).iloc[-1]) == len(base.encode())
    # edit locality: all but the last chunk(s) identical between the docs
    n_shared = min(len(a), len(b)) - 1
    assert (
        a["chunk_hash"].iloc[: n_shared - 1].to_numpy()
        == b["chunk_hash"].iloc[: n_shared - 1].to_numpy()
    ).all()
    # determinism
    out2 = cdc_chunks(ds).to_pandas().sort_values(["doc_id", "chunk_idx"])
    assert out["chunk_hash"].tolist() == out2["chunk_hash"].tolist()


def test_rolling_fingerprint_matches_batch_semantics():
    """The streaming rolling fingerprint is whitespace-invariant and
    order-sensitive, like the md5 batch fingerprint."""
    from everythinggraph_ray.datapipe.text import rolling_fingerprint

    assert rolling_fingerprint("a b  c") == rolling_fingerprint("a\tb\nc")
    assert rolling_fingerprint("a b c") != rolling_fingerprint("a c b")


def test_asof_join_duplicate_right_keys_deterministic():
    """Right-side ties on (key, ts) resolve to the same deterministic
    winner as the global-sort pandas merge_asof (sort by on + value_cols:
    last wins), across shuffles — run twice, identical."""
    import pandas as pd

    from everythinggraph_ray.datapipe.joins import asof_join

    rng = np.random.default_rng(47)
    left_df = pd.DataFrame(
        {
            "eid": np.arange(200, dtype=np.int64),
            "ts": rng.integers(0, 50, 200).astype(np.int64),  # heavy ts ties
            "key": rng.integers(0, 5, 200).astype(np.int64),
        }
    )
    right_df = pd.DataFrame(
        {
            "key": rng.integers(0, 5, 150).astype(np.int64),
            "ts": rng.integers(0, 50, 150).astype(np.int64),  # duplicate (key, ts)
            "feat": rng.integers(0, 100, 150).astype(np.int64),
        }
    )
    want = pd.merge_asof(
        left_df.sort_values(["ts", "key"], kind="stable"),
        right_df.sort_values(["ts", "feat"], kind="stable"),
        on="ts",
        by="key",
        direction="backward",
    ).sort_values("eid").reset_index(drop=True)

    outs = []
    for _ in range(2):
        got = (
            asof_join(
                ray.data.from_pandas(left_df),
                ray.data.from_pandas(right_df),
                by="key",
                on="ts",
                value_cols=["feat"],
            )
            .to_pandas()
            .sort_values("eid")
            .reset_index(drop=True)
        )
        outs.append(got["feat"].to_numpy(dtype=np.float64, na_value=np.nan))
    w = want["feat"].to_numpy(dtype=np.float64, na_value=np.nan)
    for g in outs:
        assert np.array_equal(np.isnan(g), np.isnan(w))
        assert np.array_equal(g[~np.isnan(g)], w[~np.isnan(w)])
    assert np.array_equal(outs[0], outs[1], equal_nan=True)


def test_tfidf_top_terms_matches_serial():
    import math
    import re
    from collections import Counter

    from everythinggraph_ray.datapipe.text import WORD_RE, tfidf_top_terms

    texts = [
        "apple banana apple cherry",
        "banana banana date",
        "apple date date date egg",
        "cherry cherry cherry",
        "fig",  # unique term: highest idf
        "apple banana cherry date egg fig",
    ]
    ds = _docs_ds(texts)
    n = len(texts)
    out = (
        tfidf_top_terms(ds, n, k=2)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    # serial oracle
    rx = re.compile(WORD_RE)
    tfs = [Counter(rx.findall(t.lower())) for t in texts]
    dfc = Counter(tok for tf in tfs for tok in tf)
    rows = []
    for i, tf in enumerate(tfs):
        scored = sorted(
            ((tok, c * math.log(n / dfc[tok])) for tok, c in tf.items()),
            key=lambda p: (-p[1], p[0]),
        )[:2]
        for r, (tok, s) in enumerate(scored, 1):
            rows.append((i, tok, round(s, 6), r))
    exp = pd.DataFrame(rows, columns=["doc_id", "token", "score", "rnk"])
    pd.testing.assert_frame_equal(out, exp)
    # n_docs validation
    import pytest

    with pytest.raises(ValueError):
        tfidf_top_terms(ds, 0)


def test_hll_distinct_accuracy_and_determinism():
    from everythinggraph_ray.datapipe.sketch import hll_distinct, hll_distinct_tokens

    rng = np.random.default_rng(4)
    true_n = 5000
    vals = rng.permutation(np.arange(true_n).repeat(4))
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    est = hll_distinct(ds, "v")
    assert abs(est["estimate"] - true_n) / true_n < 0.05
    # merge-invariance: partitioning must not change the registers
    est8 = hll_distinct(ds.repartition(8), "v")
    assert est8["estimate"] == est["estimate"]
    assert est8["registers"] == est["registers"]
    # duplicates never move the estimate
    dup = ray.data.from_arrow(
        pa.table({"v": pa.array(np.concatenate([vals, vals[:1000]]), pa.int64())})
    )
    assert hll_distinct(dup, "v")["estimate"] == est["estimate"]
    # token estimator vs exact vocabulary on a small corpus
    import re

    from everythinggraph_ray.datapipe.text import WORD_RE

    texts = [f"tok{i} tok{i % 50} shared common" for i in range(400)]
    docs = _docs_ds(texts)
    exact = len({w for t in texts for w in re.findall(WORD_RE, t.lower())})
    tok_est = hll_distinct_tokens(docs)
    assert abs(tok_est["estimate"] - exact) / exact < 0.1
    # p validation
    import pytest

    with pytest.raises(ValueError):
        hll_distinct(ds, "v", p=2)


def test_above_median_len_matches_pandas(tmp_path):
    import os

    import pyarrow.parquet as pq

    from everythinggraph_ray.pipelines.queries import q_docs_above_median_len

    rng = np.random.default_rng(6)
    langs = rng.choice(["en", "de", "fr"], 300)
    texts = ["x" * int(n) for n in rng.integers(1, 400, 300)]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(
        pa.table({"lang": pa.array(langs), "text": pa.array(texts)}),
        os.path.join(d, "documents.parquet"),
    )
    out = q_docs_above_median_len(d)
    df = pd.DataFrame({"lang": langs, "len": [len(t) for t in texts]})
    exp_rows = []
    for lang, g in df.groupby("lang"):
        v = np.sort(g["len"].to_numpy())
        med = int(v[max(int(np.ceil(0.5 * len(v))), 1) - 1])  # quantile_disc
        exp_rows.append((lang, med, int((g["len"] >= med).sum())))
    exp = pd.DataFrame(exp_rows, columns=["lang", "median_len", "n_above"])
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)


def test_minhash_md5_matches_serial_reference():
    """minhash_signatures_md5 == a per-doc pure-Python big-int reference
    (md5 bytes[8:16] LE base hash, affine mod 2^64, >> 3), including the
    <k-token omission rule and duplicate-shingle invariance."""
    import hashlib

    import ray.data

    from everythinggraph_ray.datapipe.dedup import (
        MD5_MINHASH_SEEDS,
        minhash_signatures_md5,
    )

    texts = [
        "The quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog again and again",
        "too short",  # 2 tokens < k=3 -> omitted
        "a b c",  # exactly one shingle
        "dup dup dup dup dup",  # one distinct shingle repeated
    ]
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    got = (
        minhash_signatures_md5(docs)
        .to_pandas()
        .sort_values(["doc_id", "seed"])
        .reset_index(drop=True)
    )

    import re

    want = []
    for i, t in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        if len(toks) < 3:
            continue
        sh = {"_".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        hs = [
            int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
            for s in sh
        ]
        for seed, (a, b) in enumerate(MD5_MINHASH_SEEDS):
            mh = min(((a * h + b) % (1 << 64)) >> 3 for h in hs)
            want.append({"doc_id": i, "seed": seed, "minhash": mh})
    wdf = pd.DataFrame(want)
    assert got["doc_id"].tolist() == wdf["doc_id"].tolist()
    assert got["seed"].tolist() == wdf["seed"].tolist()
    assert got["minhash"].tolist() == wdf["minhash"].tolist()
    assert 2 not in set(got["doc_id"])  # <k tokens omitted


def test_allpairs_similarity_matches_numpy_bruteforce():
    """allpairs_similarity == dense numpy all-pairs cosine: same pair
    set (a<b, cos >= thr), same floor-milli values, self-pairs absent."""
    import ray.data

    from everythinggraph_ray.datapipe.knn import allpairs_similarity

    rng = np.random.default_rng(11)
    n, d = 120, 16
    vecs = rng.normal(size=(n, d))
    vecs[17] = vecs[3] + 0.01 * rng.normal(size=d)  # planted near-dup
    ids = np.arange(n, dtype=np.int64) * 7  # non-contiguous ids
    docs = ray.data.from_items(
        [
            {"vec_id": int(ids[i]), "embedding": vecs[i].astype(np.float32).tolist()}
            for i in range(n)
        ]
    )
    thr = 0.5
    got = (
        allpairs_similarity(docs, threshold=thr, batch_size=32)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )

    m = vecs.astype(np.float32).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    want = []
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= thr:
                want.append(
                    (int(ids[i]), int(ids[j]), int(np.floor(sims[i, j] * 1000)))
                )
    want.sort()
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert (got["a"] < got["b"]).all()
    assert {(3 * 7, 17 * 7)} <= {(r.a, r.b) for r in got.itertuples()}


def test_bigram_lm_matches_serial():
    """Distributed bigram-LM scores == the pure-Python oracle, including
    empty / single-token / repeated-bigram documents."""
    import pandas as pd
    import ray.data

    from everythinggraph_ray.datapipe.lm import bigram_lm, bigram_lm_serial

    texts = [
        "the cat sat on the mat",
        "the cat sat",
        "the dog sat on the mat the dog sat",
        "",          # no tokens
        "solo",      # one token, no bigrams
        "the cat sat on the mat",  # exact duplicate boosts cb
        "mat the mat the mat the",  # heavy repetition inside one doc
    ]
    ids = list(range(len(texts)))
    docs = ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))
    got = (
        bigram_lm(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        bigram_lm_serial(ids, texts), columns=["doc_id", "n_bigrams", "logprob"]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.loc[3, "n_bigrams"] == 0 and got.loc[3, "logprob"] == 0.0
    # the duplicated doc must outscore its unique-text twin's counterpart
    assert got.loc[5, "logprob"] == got.loc[0, "logprob"]
    assert (got.loc[[0, 2, 6], "logprob"] < 0).all()


def test_cms_never_undercounts_and_matches_serial():
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd

    from everythinggraph_ray.datapipe.sketch import (
        _cms_slots,
        cms_heavy_hitters,
        cms_token_counts,
    )

    rng = np.random.default_rng(2)
    words = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(5, 30)))
        for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    truth = Counter(w for t in texts for w in re.findall(r"[a-z0-9]+", t.lower()))

    W, D = 64, 3  # narrow grid to force collisions
    ds = ray.data.from_pandas(df)

    # grid == serial grid (merge correctness across batches/partitions)
    grid_rows = cms_token_counts(ds.repartition(7), width=W, depth=D).to_pandas()
    grid = np.zeros(D * W, np.int64)
    grid[grid_rows["slot"]] = grid_rows["cnt"]
    want = np.zeros(D * W, np.int64)
    toks = sorted(truth)
    slots = _cms_slots(toks, W, D)
    for j, t in enumerate(toks):
        for r in range(D):
            want[slots[r, j]] += truth[t]
    assert (grid == want).all()

    # point estimates never undercount; heavy hitters include every true-heavy token
    hh = cms_heavy_hitters(ds, 40, width=W, depth=D).to_pandas()
    est = dict(zip(hh["token"], hh["est"]))
    for t, e in est.items():
        assert e >= truth[t]
    for t, c in truth.items():
        if c >= 40:
            assert t in est and est[t] >= c

    # wide grid, no collisions: estimates exact, threshold boundary exact
    hh2 = cms_heavy_hitters(ds, 40, width=4096, depth=4).to_pandas()
    want2 = {t: c for t, c in truth.items() if c >= 40}
    assert dict(zip(hh2["token"], hh2["est"])) == want2


def test_bloom_upper_bounds_exact_decontamination():
    """Bloom counts >= exact counts everywhere (no false negatives), and
    with a filter big enough for zero FPs they are EQUAL."""
    import numpy as np
    import pandas as pd

    from everythinggraph_ray.pipelines.queries import (
        q_docs_bloom_decontaminate,
        q_docs_decontaminate,
    )

    sf = "/root/testdata/sf0.001"
    bloom = q_docs_bloom_decontaminate(sf).to_pandas().set_index("doc_id")["n_flagged"]
    ex = q_docs_decontaminate(sf)
    ex = (ex.to_pandas() if not isinstance(ex, pd.DataFrame) else ex).set_index("doc_id")[
        "n_contaminated"
    ]
    # every exactly-contaminated doc is flagged at least as hard
    for did, n in ex.items():
        assert bloom.get(did, 0) >= n
    # and bloom may add FP rows/extra counts but only upward
    assert bloom.sum() >= ex.sum()


def test_bloom_build_partition_invariance():
    import numpy as np
    import pandas as pd

    import ray.data

    from everythinggraph_ray.datapipe.sketch import bloom_build

    df = pd.DataFrame({"doc_id": range(60), "text": [f"tok{i} alpha beta" for i in range(60)]})

    def values_of(batch):
        out = []
        for t in batch["text"].to_pylist():
            out.extend(t.split())
        return out

    a = bloom_build(ray.data.from_pandas(df), values_of, m_bits=1 << 12, k=3)
    b = bloom_build(ray.data.from_pandas(df).repartition(7), values_of, m_bits=1 << 12, k=3)
    assert (a == b).all() and a.any()


def test_jaccard_join_matches_serial_quadratic():
    """Prefix-filtered distributed join == the quadratic serial spec,
    including boundary pairs at exactly tau and integer similarities."""
    from everythinggraph_ray.datapipe.setjoin import jaccard_join, jaccard_join_serial

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(12, dtype=np.int64),
            "text": [
                base,                                   # 0
                base,                                   # 1 exact dup of 0
                base + " iota",                         # 2 jac 8/9
                "alpha beta gamma delta",               # 3 jac 4/8 = exactly 0.5 vs 0
                "alpha beta gamma",                     # 4 jac 3/8 < 0.5 vs 0
                "totally different words here now",     # 5
                "totally different words here now",     # 6 dup of 5
                "ALPHA beta GAMMA delta",               # 7 case-folds to 3
                "",                                     # 8 empty
                "unrelated solitary document",          # 9
                base + " " + base,                      # 10 same SET as 0
                "alpha alpha alpha beta",               # 11 distinct set {alpha, beta}
            ],
        }
    )
    got = (
        jaccard_join(ray.data.from_pandas(docs), threshold_milli=500, num_buckets=8)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = jaccard_join_serial(docs, threshold_milli=500)
    want = want.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["a", "b", "jac_milli"]], want)
    # the boundary pair (0, 3) at exactly 0.5 must be INcluded
    assert ((want["a"] == 0) & (want["b"] == 3)).any()
    # and (0, 4) below it excluded
    assert not ((want["a"] == 0) & (want["b"] == 4)).any()


def test_jaccard_join_partition_invariance():
    from everythinggraph_ray.datapipe.setjoin import jaccard_join, jaccard_join_serial

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 25)))
        for _ in range(60)
    ]
    # plant near-duplicates so the expected output is non-trivially sized
    texts += [t + " w0" for t in texts[:20]]
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    got = (
        jaccard_join(
            ray.data.from_pandas(docs).repartition(9),
            threshold_milli=700,
            num_buckets=5,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = (
        jaccard_join_serial(docs, threshold_milli=700)
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["a", "b", "jac_milli"]], want)


def test_sq8_quantize_partition_invariant_and_exact():
    from everythinggraph_ray.datapipe.quantize import sq8_minmax, sq8_quantize

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(64, 8)).astype(np.float32)
    mat[:, 3] = 1.25  # constant dim -> code 0
    df = pd.DataFrame(
        {"vec_id": np.arange(64, dtype=np.int64), "embedding": list(mat)}
    )
    ds = ray.data.from_pandas(df)
    mn, mx = sq8_minmax(ds)
    assert np.allclose(mn, mat.astype(np.float64).min(axis=0))
    assert np.allclose(mx, mat.astype(np.float64).max(axis=0))
    got = sq8_quantize(ds).to_pandas().sort_values("vec_id").reset_index(drop=True)
    # serial reference: same expression tree
    m = mat.astype(np.float64)
    span = mx - mn
    codes = np.floor((m - mn) * 255.0 / np.where(span == 0, 1, span))
    codes = np.where(span == 0, 0.0, codes)
    codes = np.clip(codes, 0, 255).astype(np.int64)
    import hashlib as _h

    want_md5 = [
        _h.md5(",".join(str(c) for c in row).encode()).hexdigest() for row in codes
    ]
    assert got["code_md5"].tolist() == want_md5
    assert got["code_sum"].tolist() == codes.sum(axis=1).tolist()
    # partition invariance: min/max and codes are order-free
    got2 = (
        sq8_quantize(ds.repartition(7))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got2["code_md5"].tolist() == want_md5


def test_bpe_train_matches_serial_reference():
    from everythinggraph_ray.datapipe.bpe import bpe_train, bpe_train_serial

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "the the the them theme",
    ] * 3
    ds = _docs_ds(texts)
    got = bpe_train(ds, n_merges=6)
    want = bpe_train_serial(texts, n_merges=6)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 6
    # merges compose: a later merge may consume an earlier merged symbol
    syms = set(got["left"]).union(got["right"])
    assert any(len(s) > 1 for s in syms)


def test_bpe_train_partition_invariant():
    from everythinggraph_ray.datapipe.bpe import bpe_train, bpe_train_serial

    rng = np.random.default_rng(23)
    words = ["alpha", "alphabet", "beta", "betamax", "gamma", "gam"]
    texts = [" ".join(rng.choice(words, size=12)) for _ in range(40)]
    got = bpe_train(_docs_ds(texts).repartition(7), n_merges=5)
    want = bpe_train_serial(texts, n_merges=5)
    pd.testing.assert_frame_equal(got, want)


def test_bpe_apply_matches_serial_application():
    from everythinggraph_ray.datapipe.bpe import (
        _merge_word,
        bpe_apply,
        bpe_train,
        bpe_train_serial,
    )
    import re

    from everythinggraph_ray.datapipe.text import WORD_RE

    texts = ["low lower lowest low low", "new newer newest new newer"] * 4
    ds = _docs_ds(texts)
    merges = bpe_train(ds, n_merges=5)
    got = (
        bpe_apply(ds, merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rx = re.compile(WORD_RE)
    pairs = list(zip(merges["left"], merges["right"]))

    def count(t):
        n = 0
        for w in rx.findall(t.lower()):
            syms = list(w)
            for l, r in pairs:
                syms = _merge_word(syms, l, r)
            n += len(syms)
        return n

    assert got["n_bpe_tokens"].tolist() == [count(t) for t in texts]
    assert got["n_words"].tolist() == [len(rx.findall(t.lower())) for t in texts]
    # merging strictly reduces token counts vs raw chars
    raw = [sum(len(w) for w in rx.findall(t.lower())) for t in texts]
    assert all(g < r for g, r in zip(got["n_bpe_tokens"], raw))


def test_dedup_keep_best_rule_exact():
    """keep_doc_id is the max-quality (doc_id-asc tiebreak) member of its
    cluster, n_members matches the cluster table, one row per cluster."""
    from everythinggraph_ray.pipelines.queries import (
        q_docs_dedup_keep_best,
        q_docs_minhash_clusters,
        q_docs_quality,
    )

    sf = "/root/testdata/sf0.001"
    kept = q_docs_dedup_keep_best(sf)
    clusters = q_docs_minhash_clusters(sf)
    qual = q_docs_quality(sf).to_pandas()
    m = clusters.merge(qual, on="doc_id")
    m["q8"] = np.round(m["quality"].to_numpy(), 8)
    want = (
        m.sort_values(["cluster_id", "quality", "doc_id"], ascending=[True, False, True])
        .groupby("cluster_id", as_index=False)
        .first()
    )
    sizes = m.groupby("cluster_id", as_index=False).size()
    assert len(kept) == clusters["cluster_id"].nunique()
    got = kept.sort_values("cluster_id").reset_index(drop=True)
    assert got["keep_doc_id"].tolist() == want["doc_id"].tolist()
    assert got["quality"].tolist() == want["q8"].tolist()
    assert got["n_members"].tolist() == sizes["size"].tolist()


def _serial_winnow(text, k, w):
    """Direct double-loop winnowing reference (Schleimer et al. fig. 5
    semantics: per window take min hash, rightmost on ties)."""
    import hashlib
    import re as _re

    toks = _re.findall(r"[a-z0-9]+", text.lower())
    m = len(toks) - k + 1
    if m < w:
        return set()
    h = [
        int.from_bytes(hashlib.md5("_".join(toks[i : i + k]).encode()).digest()[8:16], "little")
        for i in range(m)
    ]
    sel = set()
    for ws in range(m - w + 1):
        best = ws
        for j in range(ws, ws + w):
            if h[j] <= h[best]:
                best = j  # <= keeps the RIGHTMOST minimum
        sel.add((best + 1, h[best] >> 3))
    return sel


def test_winnow_matches_serial_reference():
    from everythinggraph_ray.datapipe.text import winnow_fingerprints

    texts = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "aa bb aa bb aa bb aa bb aa bb aa bb",  # periodic: exercises ties
        "short text",  # < k+w-1 tokens: emits nothing
        "one two three four five six seven eight nine ten eleven twelve",
    ]
    out = winnow_fingerprints(_docs_ds(texts), k=5, w=4).to_pandas()
    for did, txt in enumerate(texts):
        got = set(
            zip(
                out[out.doc_id == did]["pos"].tolist(),
                out[out.doc_id == did]["h"].tolist(),
            )
        )
        assert got == _serial_winnow(txt, 5, 4), f"doc {did}"


def test_winnow_guarantee_shared_substring_shares_fingerprint():
    """The winnowing guarantee: two docs sharing a >= k+w-1-token run
    share at least one (gram-hash) fingerprint value."""
    from everythinggraph_ray.datapipe.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = k+w-1
    texts = [
        "xx yy zz " + shared + " pp qq rr ss tt uu vv ww",
        "one two three four five " + shared + " six seven eight nine",
    ]
    out = winnow_fingerprints(_docs_ds(texts), k=5, w=4).to_pandas()
    h0 = set(out[out.doc_id == 0]["h"])
    h1 = set(out[out.doc_id == 1]["h"])
    assert h0 & h1


def test_standardize_matches_serial_and_constant_dim():
    from everythinggraph_ray.datapipe.quantize import standardize

    rng = np.random.default_rng(13)
    mat = rng.normal(loc=2.0, scale=3.0, size=(80, 6)).astype(np.float32)
    mat[:, 2] = 4.5  # constant dim -> sigma 0 -> guarded to 1, z = 0
    df = pd.DataFrame(
        {"vec_id": np.arange(80, dtype=np.int64), "embedding": list(mat)}
    )
    ds = ray.data.from_pandas(df).repartition(5)
    got = standardize(ds).to_pandas().sort_values("vec_id").reset_index(drop=True)
    m = mat.astype(np.float64)
    mu = m.mean(axis=0)
    sigma = np.sqrt((m * m).mean(axis=0) - mu * mu)
    sigma = np.where(sigma == 0.0, 1.0, sigma)
    want = np.round(((m - mu) / sigma).sum(axis=1) * 1e6).astype(np.int64)
    assert got["z_sum_u"].tolist() == want.tolist()
    # standardized dims have mean 0 / var 1: the per-dim z-sums across the
    # corpus must each be ~0, so the total is ~0 too
    assert abs(got["z_sum_u"].sum()) < 1e3 * 80


def test_top_tokens_per_lang_matches_serial():
    from everythinggraph_ray.datapipe.text import top_tokens_per_lang

    docs = pd.DataFrame(
        {
            "lang": ["en", "en", "fr", "fr", "fr"],
            "text": [
                "the cat the dog",
                "the CAT sat",
                "le chat le chien le",
                "chat chat",
                "le miaou",
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    got = (
        top_tokens_per_lang(ds, k=2)
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    # en: the=3, cat=2; fr: le=4, chat=3
    assert got[["lang", "token", "n", "rank"]].values.tolist() == [
        ["en", "the", 3, 1],
        ["en", "cat", 2, 2],
        ["fr", "le", 4, 1],
        ["fr", "chat", 3, 2],
    ]


def test_docs_lang_entropy_matches_serial(tmp_path):
    import re
    from collections import Counter

    from everythinggraph_ray.pipelines.queries import q_docs_lang_entropy

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "lang": ["en", "en", "en", "fr", "fr", "fr"],
            "source": ["w"] * 6,
            "text": [
                "aa bb aa cc",
                "bb bb dd",
                "aa",
                "xx yy",
                "xx xx zz zz zz",
                "yy",
            ],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")
    res = q_docs_lang_entropy(str(d)).sort_values("lang").reset_index(drop=True)
    for lg in ("en", "fr"):
        toks = re.findall(
            r"[a-z0-9]+", " ".join(docs[docs.lang == lg].text.str.lower())
        )
        c = np.array(list(Counter(toks).values()), dtype=np.int64)
        N = c.sum()
        want = round(float(np.log(N) - (c * np.log(c)).sum() / N), 7)
        row = res[res.lang == lg].iloc[0]
        assert row["n_tokens"] == N
        assert row["entropy"] == want


def test_snm_matches_serial_global_window():
    from everythinggraph_ray.datapipe.dedup import (
        _SHINGLE_RE,
        _token_shingles,
        jaccard,
        snm_near_duplicates,
    )

    rng = np.random.default_rng(29)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = []
    for i in range(300):
        base = " ".join(rng.choice(words, size=12))
        texts.append(base)
        if i % 7 == 0:  # inject near-duplicates that sort adjacently
            texts.append(base + " theta")
    ids = np.arange(len(texts), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    ).repartition(6)
    W, THR = 5, 700
    got = (
        snm_near_duplicates(ds, window=W, threshold_milli=THR, num_ranges=8)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # serial global-order window scan
    keys = ["".join(_SHINGLE_RE.findall(t.lower()))[:32] for t in texts]
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    sh = [_token_shingles(t) for t in texts]
    want = set()
    for p in range(len(order)):
        for q in range(p + 1, min(p + W, len(order))):
            i, j = order[p], order[q]
            if int(jaccard(sh[i], sh[j]) * 1000) >= THR:
                want.add((min(i, j), max(i, j)))
    assert set(zip(got["a"], got["b"])) == want
    assert len(want) > 0


def test_containment_finds_quotes_jaccard_misses():
    from everythinggraph_ray.datapipe.dedup import (
        _token_shingles,
        containment_pairs,
        jaccard,
    )

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(500)]
    # long docs of 200 distinct-ish words; doc 100 quotes 15 words of doc 0
    texts = [" ".join(rng.choice(vocab, size=200)) for _ in range(100)]
    quote = " ".join(texts[0].split()[:15])
    texts.append(quote)  # doc 100 = pure quote of doc 0's prefix
    ids = np.arange(len(texts), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    ).repartition(5)
    got = containment_pairs(ds, threshold_milli=800, max_group=8).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 100) in pairs, pairs
    # and the symmetric jaccard really is tiny — the case MinHash misses
    j = jaccard(
        np.sort(_token_shingles(texts[0])), np.sort(_token_shingles(quote))
    )
    assert j < 0.15
    row = got[(got["a"] == 0) & (got["b"] == 100)].iloc[0]
    assert row["cont_milli"] >= 800


def test_containment_serial_parity():
    from everythinggraph_ray.datapipe.dedup import (
        _token_shingles,
        containment,
        containment_pairs,
    )

    rng = np.random.default_rng(43)
    vocab = [f"t{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(80)]
    ids = np.arange(len(texts), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    ).repartition(4)
    MG, THR = 8, 800
    got = set(
        zip(*containment_pairs(ds, threshold_milli=THR, max_group=MG)
            .to_pandas()[["a", "b"]].to_numpy().T.tolist())
    ) if len(containment_pairs(ds, threshold_milli=THR, max_group=MG).to_pandas()) else set()
    # serial replica of the same semantics: rare-shingle blocking + verify
    sh = [np.sort(_token_shingles(t)) for t in texts]
    from collections import defaultdict

    by_sh = defaultdict(list)
    for i, s in enumerate(sh):
        for h in s.tolist():
            by_sh[h].append(i)
    cand = set()
    for h, members in by_sh.items():
        if 2 <= len(members) <= MG:
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    cand.add((members[x], members[y]))
    want = {
        (a, b)
        for a, b in cand
        if int(round(containment(sh[a], sh[b]) * 1000)) >= THR
    }
    assert got == want


def test_gram_and_ridge_match_numpy():
    from everythinggraph_ray.datapipe.cluster import gram_matrix, ridge_solve

    rng = np.random.default_rng(51)
    n, d = 200, 6
    X = rng.standard_normal((n, d)).astype(np.float32)
    w_true = rng.standard_normal(d)
    y = (X.astype(np.float64) @ w_true + rng.standard_normal(n) * 0.1).astype(np.int32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(X.tolist(), pa.list_(pa.float32(), d)),
                "label": pa.array(y, pa.int32()),
            }
        )
    ).repartition(5)
    gram = gram_matrix(ds)
    Xd = X.astype(np.float64)
    G = Xd.T @ Xd
    xy = Xd.T @ y.astype(np.float64)
    for i, j, g in gram[["i", "j", "g"]].itertuples(index=False):
        want = xy[int(i) - 1] if j == 0 else G[int(i) - 1, int(j) - 1]
        assert abs(g - round(want, 7)) < 1e-6, (i, j)
    w = ridge_solve(gram, lam=1.0)
    want_w = np.linalg.solve(G + np.eye(d), xy)
    np.testing.assert_allclose(w, want_w, rtol=1e-6)
    # the ridge fit recovers the generating weights to first order
    assert np.corrcoef(w, w_true)[0, 1] > 0.99


def test_starred_fraction_propagated():
    """The starred-bucket recall-loss metric rides the RESULT (round-3
    VERDICT item 9): an all-identical corpus with a tiny max_bucket makes
    every band bucket oversized -> starred_milli == 1000 on every output
    row; a clean corpus reports 0."""
    from everythinggraph_ray.datapipe.dedup import (
        minhash_near_duplicates,
        simhash_candidates,
        starred_milli_of,
    )

    txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    ds = _docs_ds([txt] * 10)
    got = (
        minhash_near_duplicates(ds, threshold=0.5, max_bucket=4, with_starred_frac=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == list(range(10))  # star keeps connectivity
    assert set(got["cluster_id"]) == {0}
    assert set(got["starred_milli"]) == {1000}

    base = "the quick brown fox jumps over the lazy dog and runs far away home " * 5
    ds2 = _docs_ds([base, base.replace("lazy", "sleepy"), base])
    got2 = (
        minhash_near_duplicates(ds2, threshold=0.5, max_bucket=64, with_starred_frac=True)
        .to_pandas()
    )
    assert len(got2) == 3 and set(got2["starred_milli"]) == {0}

    # the helper itself, over simhash candidates of identical docs
    cand = simhash_candidates(_docs_ds([txt] * 12), max_bucket=4).materialize()
    assert starred_milli_of(cand) == 1000


def test_pairwise_batch_scorers_match_serial():
    """The vectorized bucket-wide scorers (round-4 VERDICT item 2) are
    bit-identical to their per-pair reference functions on ragged sets,
    including empty-set edge cases."""
    from everythinggraph_ray.datapipe.dedup import containment, jaccard
    from everythinggraph_ray.datapipe.knn import _cosine
    from everythinggraph_ray.datapipe.pairs import (
        batch_containment,
        batch_cosine,
        batch_jaccard,
        batch_jaccard_milli,
    )

    rng = np.random.default_rng(7)
    sets = [
        np.sort(rng.choice(50, size=s, replace=False)).astype(np.int64)
        for s in [0, 1, 3, 7, 20, 50]
    ]
    pairs = [(i, j) for i in range(len(sets)) for j in range(len(sets))]
    lens_a = np.array([len(sets[i]) for i, _ in pairs])
    lens_b = np.array([len(sets[j]) for _, j in pairs])
    vals_a = np.concatenate([sets[i] for i, _ in pairs])
    vals_b = np.concatenate([sets[j] for _, j in pairs])

    got_j = batch_jaccard(vals_a, lens_a, vals_b, lens_b)
    got_m = batch_jaccard_milli(vals_a, lens_a, vals_b, lens_b)
    got_c = batch_containment(vals_a, lens_a, vals_b, lens_b)
    for k, (i, j) in enumerate(pairs):
        assert got_j[k] == jaccard(sets[i], sets[j])
        inter = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
        union = len(sets[i]) + len(sets[j]) - inter
        assert got_m[k] == (float((1000 * inter) // union) if union else 0.0)
        assert got_c[k] == containment(sets[i], sets[j])

    vecs = rng.normal(size=(6, 16))
    va = np.concatenate([vecs[i] for i, _ in pairs[:10]])
    vb = np.concatenate([vecs[j] for _, j in pairs[:10]])
    d16 = np.full(10, 16)
    got_cos = batch_cosine(va, d16, vb, d16)
    for k, (i, j) in enumerate(pairs[:10]):
        assert abs(got_cos[k] - _cosine(vecs[i], vecs[j])) < 1e-12


def test_jaccard_join_fixture_groups_under_cap():
    """Driver-gate guard: at the correctness fixture scales every prefix
    token group stays under the default max_bucket, so the distributed
    join is EXACT there (the star fallback never fires). If a testdata
    regeneration ever breaks this, the driver hash gate would silently
    compare a truncated join — fail here instead."""
    import re as _re
    from collections import Counter as _Counter

    import duckdb

    from everythinggraph_ray.datapipe.text import WORD_RE

    rx = _re.compile(WORD_RE)
    con = duckdb.connect()
    df = con.execute(
        "SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).df()
    toks = {
        int(i): sorted(set(rx.findall(str(t).lower())))
        for i, t in zip(df.doc_id, df.text)
    }
    dfreq = _Counter(t for s in toks.values() for t in s)
    grp: _Counter = _Counter()
    m = 500
    for s in toks.values():
        s2 = sorted(s, key=lambda t: (dfreq[t], t))
        n = len(s2)
        p = n - (-((-m * n) // 1000)) + 1
        for t in s2[: max(p, 0)]:
            grp[t] += 1
    assert max(grp.values(), default=0) <= 512


def test_stdlib_raster_decode_exact():
    """The stdlib PPM/PGM/BMP rung decodes REAL rasters exactly (round-4
    VERDICT item 3): hand-built images with known pixels produce the
    exact 4x4 block means, all three formats agree on the same pixels,
    and non-raster payloads return None (fake rung)."""
    from everythinggraph_ray.datapipe.multimodal import (
        _block_mean_features,
        _raster_gray,
        default_decode,
        synth_raster_payload,
    )

    # 4x4 PGM with known pixels -> block means ARE the pixels
    px = np.arange(16, dtype=np.uint8).reshape(4, 4) * 17
    pgm = b"P5\n# comment\n4 4\n255\n" + px.tobytes()
    g = _raster_gray(pgm)
    assert g is not None and g.shape == (4, 4)
    np.testing.assert_allclose(g, px / 255.0, atol=1e-7)
    feats = default_decode(pgm)
    np.testing.assert_allclose(feats, (px / 255.0).ravel(), atol=1e-6)

    # PPM: RGB whose channel-mean equals the same grayscale
    rgb = np.repeat(px[:, :, None], 3, axis=2)
    ppm = b"P6\n4 4\n255\n" + rgb.tobytes()
    np.testing.assert_allclose(_raster_gray(ppm), px / 255.0, atol=1e-7)

    # BMP (bottom-up, stride-padded): same pixels, same grayscale
    w, h = 4, 4
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h - 1, -1, -1):  # bottom-up
        row = rgb[r].tobytes()
        rows.append(row + b"\x00" * (stride - len(row)))
    bmp = (
        b"BM" + (54 + stride * h).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + (stride * h).to_bytes(4, "little") + b"\x00" * 16
        + b"".join(rows)
    )
    np.testing.assert_allclose(_raster_gray(bmp), px / 255.0, atol=1e-7)

    # non-raster -> None; decode falls to the deterministic fake
    assert _raster_gray(b"<html>not an image</html>") is None
    f1 = default_decode(b"<html>not an image</html>")
    f2 = default_decode(b"<html>not an image</html>")
    np.testing.assert_array_equal(f1, f2)

    # the synthesizer round-trips through the real rungs deterministically
    for kind in range(4):
        p1 = synth_raster_payload(b"seed-bytes", kind)
        assert p1 == synth_raster_payload(b"seed-bytes", kind)
        if kind < 3:
            assert _raster_gray(p1) is not None
    # block-mean pooling handles non-divisible shapes
    img = np.linspace(0, 1, 7 * 5).reshape(7, 5).astype(np.float32)
    bm = _block_mean_features(img)
    assert bm.shape == (16,) and np.isfinite(bm).all()


def test_group_pairs_vectorized_matches_reference():
    """The lexsort + triangular-index-inversion group_pairs reducer is
    pair-for-pair identical to the per-group reference (np.triu_indices
    cliques, min-id stars) across random group shapes, duplicates, and
    boundary sizes (1, 2, exactly max_bucket, max_bucket+1)."""
    from everythinggraph_ray.datapipe.pairs import group_pairs

    rng = np.random.default_rng(11)
    rows_g, rows_i = [], []
    sizes = [1, 2, 3, 7, 64, 65, 500]
    for gi, s in enumerate(sizes):
        ids = rng.choice(10000, size=s, replace=False)
        rows_g.extend([gi] * s)
        rows_i.extend(ids.tolist())
        # duplicate (group, id) rows must not create pairs
        rows_g.extend([gi] * min(3, s))
        rows_i.extend(ids[: min(3, s)].tolist())
    perm = rng.permutation(len(rows_g))
    t = pa.table(
        {
            "doc_id": pa.array(np.asarray(rows_i)[perm], pa.int64()),
            "grp": pa.array(np.asarray(rows_g)[perm], pa.int64()),
        }
    )
    got = (
        group_pairs(ray.data.from_arrow(t), ["grp"], max_bucket=64)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # serial reference
    ref_rows = []
    for gi, s in enumerate(sizes):
        ids = np.sort(
            np.unique(
                np.asarray(rows_i)[np.asarray(rows_g) == gi]
            )
        )
        if len(ids) < 2:
            continue
        if len(ids) > 64:
            for b in ids[1:]:
                ref_rows.append((ids[0], b, True))
        else:
            i, j = np.triu_indices(len(ids), k=1)
            for x, y in zip(ids[i], ids[j]):
                ref_rows.append((x, y, False))
    ref = (
        pd.DataFrame(ref_rows, columns=["a", "b", "starred"])
        .astype({"a": "int64", "b": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)
