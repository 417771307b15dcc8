"""Session-12 fourth wave (binary round-trip / dataset checksum /
window distinct users): serial-replay exactness on adversarial
fixtures."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra20 import (
    CHECKSUM_MOD,
    MASK63,
    UNIQ_WINDOW_US,
    q_docs_dataset_checksum,
    q_events_window_uniques,
    q_rel_edges_bin_roundtrip,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_bin_roundtrip_is_lossless(tmp_path):
    rng = np.random.default_rng(101)
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 4000, 2500).astype(np.int64),
            "l_partkey": rng.integers(0, 4000, 2500).astype(np.int64),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_rel_edges_bin_roundtrip(str(tmp_path))).iloc[0]
    s = (li["l_orderkey"] % 1000).to_numpy(np.int64)
    d = (li["l_partkey"] % 1000).to_numpy(np.int64)
    assert got["n_edges"] == len(s)
    assert got["sum_src"] == s.sum()
    assert got["sum_dst"] == d.sum()
    assert got["sum_prod"] == (s * d).sum()


def test_dataset_checksum_is_order_insensitive_and_content_sensitive(tmp_path):
    texts = [f"document body {i} with ünicode" for i in range(300)]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    a = _to_df(q_docs_dataset_checksum(str(tmp_path))).iloc[0]

    # serial reference
    ks = [
        int.from_bytes(hashlib.md5(f"{i}:{t}".encode()).digest()[8:16], "little")
        & MASK63
        for i, t in enumerate(texts)
    ]
    assert a["n_rows"] == 300
    x = 0
    for k in ks:
        x ^= k
    assert a["xor_sig"] == x
    assert a["sum_mod"] == sum(ks) % CHECKSUM_MOD

    # permuted rows -> identical checksum
    docs.sample(frac=1.0, random_state=7).to_parquet(tmp_path / "documents.parquet")
    b = _to_df(q_docs_dataset_checksum(str(tmp_path))).iloc[0]
    assert tuple(a) == tuple(b)

    # one changed character -> different checksum
    docs2 = docs.copy()
    docs2.loc[0, "text"] = docs2.loc[0, "text"] + "!"
    docs2.to_parquet(tmp_path / "documents.parquet")
    c = _to_df(q_docs_dataset_checksum(str(tmp_path))).iloc[0]
    assert c["xor_sig"] != a["xor_sig"] or c["sum_mod"] != a["sum_mod"]


def test_window_uniques_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(102)
    n = 700
    base = pd.Timestamp("2024-06-01").value // 1000
    # spread over ~6 hours so windows straddle bucket boundaries; some
    # exact boundary hits via second-aligned grid
    ts_us = base + rng.integers(0, 6 * 3600, n) * 1_000_000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 15, n).astype(np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "value": rng.normal(0, 1, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_window_uniques(str(tmp_path)))
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    tsv = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = ev["user_id"].to_numpy()
    ref = np.empty(n, np.int64)
    for i in range(n):
        m = (tsv >= tsv[i] - UNIQ_WINDOW_US) & (tsv <= tsv[i])
        ref[i] = len(set(uid[m]))
    refdf = pd.DataFrame({"event_id": ev["event_id"], "uniq_users": ref})
    pd.testing.assert_frame_equal(got, refdf)
    assert ref.max() > 1  # windows actually span multiple users
