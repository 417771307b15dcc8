"""Session-12 twenty-seventh wave (embedding drift): serial-replay
exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra43 import q_emb_mean_shift


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_mean_shift_detects_planted_drift(tmp_path):
    rng = np.random.default_rng(301)
    n = 400
    M = rng.normal(0, 1, (n, 64)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    # plant drift: odd cohort shifted +2 in dim 0 (index 1 in output)
    M[ids % 2 == 1, 0] += 2.0
    emb = pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [r.tolist() for r in M],
            "label": np.zeros(n, np.int32),
        }
    )
    emb.to_parquet(tmp_path / "embeddings.parquet")

    got = _to_df(q_emb_mean_shift(str(tmp_path))).set_index("dim")
    # exact replay
    Q = np.floor(M.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    even = ids % 2 == 0
    for d in range(64):
        row = got.loc[d + 1]
        assert row["n_a"] == int(even.sum())
        assert row["n_b"] == int((~even).sum())
        assert row["sum_a_e6"] == int(Q[even, d].sum())
        assert row["sum_b_e6"] == int(Q[~even, d].sum())
    # the planted drift is visible in dim 1 and absent elsewhere
    shift = (
        got["sum_b_e6"] / got["n_b"] - got["sum_a_e6"] / got["n_a"]
    ) / 1_000_000
    assert abs(shift.loc[1] - 2.0) < 0.2
    assert shift.drop(1).abs().max() < 0.5
