"""Exact per-hour distinct-user count vs a serial pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_hourly_uniques_matches_serial():
    from everythinggraph_ray.pipelines.queries import q_events_hourly_uniques

    ev = pq.read_table(
        SF_DIR + "/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    hour = (ev["ts"].astype("int64") // 3_600_000_000).astype(np.int64)
    want = (
        pd.DataFrame({"hour_bucket": hour, "user_id": ev["user_id"]})
        .groupby("hour_bucket")["user_id"]
        .nunique()
        .rename("n_users")
        .reset_index()
        .astype(np.int64)
        .sort_values("hour_bucket")
        .reset_index(drop=True)
    )
    got = (
        q_events_hourly_uniques(SF_DIR)
        .to_pandas()
        .sort_values("hour_bucket")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # exactness matters precisely when users repeat within an hour:
    # the fixture must exercise the dedup (else this test is vacuous)
    assert want["n_users"].sum() < len(ev)
