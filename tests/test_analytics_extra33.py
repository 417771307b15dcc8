"""Session-12 seventeenth wave (SCD-2 intervals): serial-replay
exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra33 import q_orders_scd2_priority


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_scd2_matches_serial_runs_with_same_day_flips(tmp_path):
    # customer 1: A A B A (B run in the middle, reverts to A);
    # customer 2: three SAME-DAY orders alternating A B A (orderkey
    # tie-break decides the run order); customer 3: single order
    rows = [
        (1, 10, "1995-01-01", "A"),
        (1, 11, "1995-02-01", "A"),
        (1, 12, "1995-03-01", "B"),
        (1, 13, "1995-04-01", "A"),
        (2, 20, "1996-06-15", "A"),
        (2, 21, "1996-06-15", "B"),
        (2, 22, "1996-06-15", "A"),
        (3, 30, "1997-01-01", "C"),
    ]
    orders = pd.DataFrame(
        rows, columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    orders["o_orderdate"] = pd.to_datetime(orders["o_orderdate"])
    orders.to_parquet(tmp_path / "orders.parquet")

    got = (
        _to_df(q_orders_scd2_priority(str(tmp_path)))
        .sort_values(["custkey", "valid_from_day", "priority"])
        .reset_index(drop=True)
    )

    def day(s):
        return int(np.datetime64(s, "D").astype(np.int64))

    ref = pd.DataFrame(
        [
            (1, "A", day("1995-01-01"), day("1995-03-01")),
            (1, "B", day("1995-03-01"), day("1995-04-01")),
            (1, "A", day("1995-04-01"), -1),
            (2, "A", day("1996-06-15"), day("1996-06-15")),
            (2, "B", day("1996-06-15"), day("1996-06-15")),
            (2, "A", day("1996-06-15"), -1),
            (3, "C", day("1997-01-01"), -1),
        ],
        columns=["custkey", "priority", "valid_from_day", "valid_to_day"],
    )
    ref = ref.sort_values(["custkey", "valid_from_day", "priority"]).reset_index(
        drop=True
    )
    ref[["custkey", "valid_from_day", "valid_to_day"]] = ref[
        ["custkey", "valid_from_day", "valid_to_day"]
    ].astype("int64")
    # same-day flips produce ambiguous (from, priority) sort keys for
    # cust 2 rows with identical from-days; compare as multisets per cust
    for cust in (1, 2, 3):
        g = got[got["custkey"] == cust]
        r = ref[ref["custkey"] == cust]
        assert sorted(map(tuple, g.to_numpy())) == sorted(map(tuple, r.to_numpy())), cust
    # exactly one open row per customer
    assert (got["valid_to_day"] == -1).sum() == 3
