"""Session-12 eighth wave (apportionment / Euler check / Huffman):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra24 import (
    SEATS,
    huffman_lengths,
    q_docs_huffman_lengths,
    q_mktsegment_seats,
    q_rel_euler_check,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_seats_sum_and_match_largest_remainder(tmp_path):
    rng = np.random.default_rng(141)
    segs = ["AUTO", "BUILD", "FURN", "HOUSE", "MACH"]
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(100, dtype=np.int64),
            "c_mktsegment": [segs[i % 5] for i in range(100)],
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": rng.integers(0, 100, 2000).astype(np.int64),
            "o_totalprice": rng.uniform(10, 5000, 2000),
        }
    )
    cust.to_parquet(tmp_path / "customer.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")

    got = _to_df(q_mktsegment_seats(str(tmp_path))).sort_values("segment")
    assert got["seats"].sum() == SEATS

    rev = {}
    seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    for ck, tp in zip(orders["o_custkey"], orders["o_totalprice"]):
        rev[seg_of[ck]] = rev.get(seg_of[ck], 0) + int(np.floor(tp * 1000 + 0.5))
    tot = sum(rev.values())
    rows = sorted(rev)
    fl = {s: SEATS * rev[s] // tot for s in rows}
    rem = {s: SEATS * rev[s] - fl[s] * tot for s in rows}
    leftover = SEATS - sum(fl.values())
    bonus = sorted(rows, key=lambda s: (-rem[s], s))[:leftover]
    ref = pd.DataFrame(
        {"segment": rows, "seats": [fl[s] + (s in bonus) for s in rows]}
    )
    ref["seats"] = ref["seats"].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref)


def test_euler_check_positive_and_negative_cases(tmp_path):
    # a single directed cycle 0->1->2->3->0: balanced, connected -> path
    cyc = np.array([(0, 1), (1, 2), (2, 3), (3, 0)], np.int64)
    pd.DataFrame({"l_orderkey": cyc[:, 0], "l_partkey": cyc[:, 1]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got = _to_df(q_rel_euler_check(str(tmp_path))).iloc[0]
    assert (
        got["n_pos"],
        got["n_neg"],
        got["n_bad"],
        got["n_comp"],
        got["has_euler_path"],
    ) == (0, 0, 0, 1, 1)

    # disconnect it -> no path (two components)
    two = np.array([(0, 1), (1, 0), (5, 6), (6, 5)], np.int64)
    pd.DataFrame({"l_orderkey": two[:, 0], "l_partkey": two[:, 1]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got2 = _to_df(q_rel_euler_check(str(tmp_path))).iloc[0]
    assert got2["n_comp"] == 2 and got2["has_euler_path"] == 0

    # open trail 0->1->2->0->2: imbalance exactly one +1 (0) / one -1 (2)
    tr = np.array([(0, 1), (1, 2), (2, 0), (0, 2)], np.int64)
    pd.DataFrame({"l_orderkey": tr[:, 0], "l_partkey": tr[:, 1]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got3 = _to_df(q_rel_euler_check(str(tmp_path))).iloc[0]
    assert (got3["n_pos"], got3["n_neg"], got3["has_euler_path"]) == (1, 1, 1)


def test_huffman_lengths_kraft_and_monotone(tmp_path):
    # deterministic skewed corpus
    words = (
        ["alpha"] * 40 + ["beta"] * 20 + ["gamma"] * 10 + ["delta"] * 5 + ["eps"] * 2
    )
    docs = pd.DataFrame(
        {
            "doc_id": [0],
            "text": [" ".join(words)],
            "lang": "en",
            "source": "s0",
            "n_chars": [1],
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")

    got = _to_df(q_docs_huffman_lengths(str(tmp_path)))
    # Kraft equality for a full binary code
    assert abs(sum(2.0 ** -l for l in got["code_len"]) - 1.0) < 1e-12
    # more frequent -> never longer
    g = got.sort_values("cnt", ascending=False).reset_index(drop=True)
    assert (g["code_len"].diff().fillna(0) >= 0).all()
    # serial replay
    ref = huffman_lengths(list(zip(got["token"], got["cnt"].astype(int))))
    assert all(ref[t] == l for t, l in zip(got["token"], got["code_len"]))
    # the known optimal lengths for 40/20/10/5/2
    by_tok = dict(zip(got["token"], got["code_len"]))
    assert by_tok["alpha"] == 1 and by_tok["beta"] == 2 and by_tok["gamma"] == 3
    assert by_tok["delta"] == 4 and by_tok["eps"] == 4
