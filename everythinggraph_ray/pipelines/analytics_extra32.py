"""Analytics batch (session 12, sixteenth wave): AR aging buckets and
watermark refinements.

Distributed shapes:
- ``orders_aging_buckets``: the accounts-receivable AGING report —
  orders bucketed by days outstanding relative to the corpus as-of
  date (max orderdate, one distributed max), bands 0-30/31-60/61-90/
  90+, count + revenue millis per band. Banded aggregation with a
  broadcast scalar.
- ``events_hourly_refinements``: streaming REFINEMENT accounting (the
  Beam on-time/late pane split): per tumbling hour, how many events
  arrived on time vs LATE (ts more than 5 min behind the watermark =
  running max ts over arrival order, the ``events_late_arrivals``
  device) — i.e. how much each hourly aggregate would be corrected by
  a late-data refinement pass. Reuses the exclusive prefix-max scan,
  then one two-key bucketed sum by (hour, lateness).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.pipelines.analytics_extra22 import LATENESS_US
from everythinggraph_ray.stages.agg import sum_by_key_pair

ANALYTICS32_QUERIES: dict = {}
ANALYTICS32_ORACLES: dict = {}

AGING_BANDS = (30, 60, 90)  # band edges in days; beyond last = "90+"
HOUR_US = 3_600_000_000


# ----------------------------------------------------------------------
# AR aging buckets
# ----------------------------------------------------------------------
def q_orders_aging_buckets(sf_dir):
    """(band, n_orders, rev_milli): orders by days outstanding
    (as-of = max orderdate); band 0: 0-30, 1: 31-60, 2: 61-90, 3: 90+."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "d": pa.array(
                    t["o_orderdate"].to_numpy(zero_copy_only=False)
                    .astype("datetime64[D]")
                    .astype(np.int64),
                    pa.int64(),
                ),
                "rev": pa.array(
                    np.floor(
                        t["o_totalprice"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    asof = int(orders.max("d"))

    def band(t: pa.Table) -> pa.Table:
        age = asof - t["d"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(np.asarray(AGING_BANDS, np.int64), age, side="left")
        u, inv = np.unique(b, return_inverse=True)
        return pa.table(
            {
                "band": pa.array(u.astype(np.int64), pa.int64()),
                "zero": pa.array(np.zeros(len(u), np.int64), pa.int64()),
                "n_orders": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "rev_milli": pa.array(
                    np.bincount(
                        inv, weights=t["rev"].to_numpy(zero_copy_only=False)
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    res = sum_by_key_pair(
        orders.map_batches(band, batch_format="pyarrow"),
        "band",
        "zero",
        ["n_orders", "rev_milli"],
    ).map_batches(
        lambda t: pa.table(
            {
                "band": t["band"],
                "n_orders": t["n_orders"],
                "rev_milli": t["rev_milli"],
            }
        ),
        batch_format="pyarrow",
    )
    return _typed_collect(
        res, {"band": "int64", "n_orders": "int64", "rev_milli": "int64"}
    )


ANALYTICS32_QUERIES["orders_aging_buckets"] = q_orders_aging_buckets

ANALYTICS32_ORACLES["orders_aging_buckets"] = (
    "WITH t AS (SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d, "
    "CAST(FLOOR(o_totalprice * 1000 + 0.5) AS BIGINT) AS rev FROM orders), "
    "a AS (SELECT MAX(d) AS as_of FROM t), "
    "b AS (SELECT CASE WHEN as_of - d <= 30 THEN 0 WHEN as_of - d <= 60 THEN 1 "
    "WHEN as_of - d <= 90 THEN 2 ELSE 3 END AS band, rev FROM t, a) "
    "SELECT CAST(band AS BIGINT) AS band, CAST(count(*) AS BIGINT) AS n_orders, "
    "CAST(SUM(rev) AS BIGINT) AS rev_milli FROM b GROUP BY 1"
)


# ----------------------------------------------------------------------
# hourly refinements (on-time vs late panes)
# ----------------------------------------------------------------------
def q_events_hourly_refinements(sf_dir):
    """(hour_us, n_ontime, n_late): per tumbling event-time hour, how
    many events arrived on time vs late (> 5 min behind the arrival
    watermark) — the size of the late-data refinement per pane."""
    from everythinggraph_ray.pipelines.analytics_extra22 import (
        q_events_late_arrivals,
    )
    from everythinggraph_ray.pipelines.queries import _typed_collect

    late_ds = ray.data.from_pandas(
        q_events_late_arrivals(sf_dir)[["event_id", "is_late"]]
    )

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "ts_us": pa.array(
                    t["ts"].to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    from everythinggraph_ray.datapipe.joins import hash_join

    joined = hash_join(ev, late_ds, on="event_id", right_cols=["is_late"])

    def tag(t: pa.Table) -> pa.Table:
        h = (t["ts_us"].to_numpy(zero_copy_only=False) // HOUR_US) * HOUR_US
        lt = t["is_late"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hour_us": pa.array(h, pa.int64()),
                "is_late": pa.array(lt.astype(np.int64), pa.int64()),
                "one": pa.array(np.ones(len(h), np.int64)),
            }
        )

    agg = sum_by_key_pair(
        joined.map_batches(tag, batch_format="pyarrow"),
        "hour_us",
        "is_late",
        ["one"],
    ).to_pandas()
    wide = (
        agg.pivot_table(index="hour_us", columns="is_late", values="one", fill_value=0)
        .reindex(columns=[0, 1], fill_value=0)
        .reset_index()
    )
    out = pd.DataFrame(
        {
            "hour_us": wide["hour_us"].astype("int64"),
            "n_ontime": wide[0].astype("int64"),
            "n_late": wide[1].astype("int64"),
        }
    )
    return _typed_collect(
        ray.data.from_pandas(out),
        {"hour_us": "int64", "n_ontime": "int64", "n_late": "int64"},
    )


ANALYTICS32_QUERIES["events_hourly_refinements"] = q_events_hourly_refinements

ANALYTICS32_ORACLES["events_hourly_refinements"] = (
    "WITH t AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events), "
    "w AS (SELECT event_id, ts_us, MAX(ts_us) OVER (ORDER BY event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm FROM t), "
    "f AS (SELECT (ts_us // 3600000000) * 3600000000 AS hour_us, "
    f"CASE WHEN wm IS NOT NULL AND ts_us < wm - {LATENESS_US} THEN 1 ELSE 0 END AS lt "
    "FROM w) "
    "SELECT hour_us, CAST(SUM(1 - lt) AS BIGINT) AS n_ontime, "
    "CAST(SUM(lt) AS BIGINT) AS n_late FROM f GROUP BY 1"
)
