"""Session-12 second wave (JSON round-trip / decision stump / pointer
doubling): serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra18 import (
    FUNC_ITER_STEPS,
    q_docs_json_roundtrip,
    q_lineitem_stump,
    q_rel_func_iter16,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_json_roundtrip_survives_escapes_and_unicode(tmp_path):
    texts = [
        'he said "hi"\nthen left',
        "back\\slash and tab\there",
        "中文字符 héllo ü",
        "control \x01 char",
        "plain ascii",
    ] * 20
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en", "en", "zh", "en", "en"] * 20,
            "source": "s0",
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")

    got = _to_df(q_docs_json_roundtrip(str(tmp_path))).iloc[0]
    assert got["n_docs"] == len(docs)
    assert got["sum_doc_id"] == docs["doc_id"].sum()
    assert got["sum_n_chars"] == docs["n_chars"].sum()
    assert got["sum_text_len"] == sum(len(t) for t in texts)
    assert got["sum_lang_len"] == 2 * len(docs)


def test_stump_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(81)
    n = 4000
    q = rng.integers(1, 51, n).astype(np.int64)
    # label correlated with quantity so a non-trivial split wins
    y = (q + rng.integers(-12, 13, n)) > 30
    li = pd.DataFrame(
        {
            "l_quantity": q,
            "l_returnflag": np.where(y, "R", "N"),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")

    got = _to_df(q_lineitem_stump(str(tmp_path))).iloc[0]

    best = None
    for t in np.unique(q):
        l, r = q <= t, q > t
        err = min(y[l].sum(), (~y[l]).sum()) + min(y[r].sum(), (~y[r]).sum())
        if best is None or err < best[1]:
            best = (int(t), int(err))
    assert (got["threshold"], got["misclassified"]) == best
    assert got["total"] == n
    # the split actually separates (beats majority-class baseline)
    assert got["misclassified"] < min(y.sum(), (~y).sum())


def test_func_iter16_matches_serial_with_cycles_and_sinks(tmp_path):
    rng = np.random.default_rng(82)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    # planted structures: a 3-cycle under min-neighbor, a chain into a
    # sink, and a self-loop fixpoint
    extra = np.array(
        [(70, 71), (71, 72), (72, 70), (80, 81), (81, 82), (90, 90)], np.int64
    )
    src = np.r_[src, extra[:, 0]]
    dst = np.r_[dst, extra[:, 1]]
    pd.DataFrame({"l_orderkey": src, "l_partkey": dst}).to_parquet(
        tmp_path / "lineitem.parquet"
    )

    got = (
        _to_df(q_rel_func_iter16(str(tmp_path)))
        .sort_values("v")
        .reset_index(drop=True)
    )

    s = src % 1000
    d = dst % 1000
    f: dict[int, int] = {}
    for a, b in zip(s, d):
        f[a] = min(f.get(a, b), b)
    univ = sorted(set(s) | set(d))
    ref = []
    for v in univ:
        cur = v
        for _ in range(FUNC_ITER_STEPS):
            cur = f.get(cur, cur)
        ref.append((v, cur))
    ref = pd.DataFrame(ref, columns=["v", "f16"]).astype("int64")
    pd.testing.assert_frame_equal(got, ref)
    # planted fixpoint and sink behave
    r = got.set_index("v")["f16"]
    assert r[90] == 90
    assert r[80] == 82 and r[81] == 82
    assert r[70] in (70, 71, 72)
