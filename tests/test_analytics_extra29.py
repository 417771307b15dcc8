"""Session-12 thirteenth wave (AND-semiring dominators / per-user LIS):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra29 import (
    q_events_user_lis,
    q_rel_dominators,
    serial_dominators,
)


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_dominators_match_serial_fixpoint_and_structure(tmp_path):
    # CFG-shaped: root 0; diamond 0->1->3, 0->2->3 (3 dominated only by
    # 0 and itself); chain 3->4->5 (5 dominated by 0,3,4,5); back edge
    # 5->1 (must not add dominators); unreachable island 8->9
    edges = np.array(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 1), (8, 9)],
        np.int64,
    )
    pd.DataFrame({"l_orderkey": edges[:, 0], "l_partkey": edges[:, 1]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )

    got = (
        _to_df(q_rel_dominators(str(tmp_path)))
        .sort_values("vid")
        .reset_index(drop=True)
    )

    verts = sorted({int(v) for e in edges for v in e})
    bits = {v: i for i, v in enumerate(verts[:63])}
    ref = serial_dominators([tuple(map(int, e)) for e in edges], 0, bits)
    for _, row in got.iterrows():
        assert int(row["dom_mask"]) == ref[int(row["vid"])], row["vid"]

    m = got.set_index("vid")["dom_mask"]
    b = lambda v: 1 << bits[v]  # noqa: E731
    assert m[0] == b(0)  # root: itself only
    assert m[3] == b(0) | b(3)  # diamond join: no branch dominates
    assert m[5] == b(0) | b(3) | b(4) | b(5)  # chain accumulates
    assert m[1] == b(0) | b(1)  # back edge added nothing
    assert m[8] == -1 and m[9] == -1  # unreachable sentinel


def test_lis_matches_quadratic_dp(tmp_path):
    rng = np.random.default_rng(191)
    n = 500
    base = pd.Timestamp("2024-12-01").value // 1000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            "ts": pd.to_datetime(base + rng.integers(0, 10**6, n) * 1000, unit="us"),
            "value": rng.normal(0, 100, n),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")

    got = (
        _to_df(q_events_user_lis(str(tmp_path)))
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    v = np.floor(ev["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    ts = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    rows = []
    for uid, g in ev.groupby("user_id"):
        ix = g.index.to_numpy()
        order = ix[np.lexsort((ev["event_id"].to_numpy()[ix], ts[ix]))]
        seq = v[order]
        m = len(seq)
        dp = np.ones(m, np.int64)
        for i in range(m):
            for j in range(i):
                if seq[j] < seq[i]:
                    dp[i] = max(dp[i], dp[j] + 1)
        rows.append((int(uid), m, int(dp.max()) if m else 0))
    ref = pd.DataFrame(rows, columns=["user_id", "n_events", "lis_len"]).astype(
        "int64"
    )
    pd.testing.assert_frame_equal(got, ref)
    assert (got["lis_len"] <= got["n_events"]).all()
    assert got["lis_len"].max() >= 3
