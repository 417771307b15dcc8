"""Analytics batch (session 12, twenty-third wave): Tukey median
polish and the Poisson dispersion index.

Distributed shapes:
- ``orders_median_polish``: Tukey's MEDIAN POLISH of the segment ×
  order-year revenue table — the robust two-way decomposition
  (overall + row effect + column effect + residual). The cell table
  folds distributed (broadcast customer join + pair-key sums); the
  5×7-cell polish iterates on the driver in DOUBLED integers (2×
  medians stay exact). Rows-only (iterative medians have no SQL
  form); serial replay + row/col-median-zero pytests.
- ``events_dispersion_by_type``: the Poisson over/under-dispersion
  certificate per event type — exact integer moments (n_days, Σc,
  Σc²) of the per-day event counts, dispersion = variance/mean left
  to the caller as a division of exact pieces. Two-level aggregation:
  (type, day) counts via the pair-key bucketed sum, then per-type
  moment partials.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from everythinggraph_ray.stages.agg import sum_by_key_pair

ANALYTICS39_QUERIES: dict = {}
ANALYTICS39_ORACLES: dict = {}

POLISH_ROUNDS = 3


def median_polish_scaled(cells: np.ndarray, rounds: int = POLISH_ROUNDS):
    """Tukey median polish in EXACT integers: the input grid is
    pre-scaled by 2^(4*rounds); every median step ((a+b)//2 on an
    even-power grid) loses at most one factor of two, and there are at
    most 4 median phases per round — so all effects and residuals stay
    integral throughout. Returns (overall, row_effects, col_effects,
    residuals, scale_log2) as python-int object arrays at the shared
    2^scale_log2 scale (object dtype: no int64 overflow mid-polish)."""
    steps = 4 * rounds
    nr, nc = cells.shape
    R = cells.astype(object) * (1 << steps)
    row = np.zeros(nr, dtype=object)
    col = np.zeros(nc, dtype=object)
    overall = 0

    def med(vals):
        a = sorted(int(x) for x in vals)
        n = len(a)
        return a[n // 2] if n % 2 else (a[n // 2 - 1] + a[n // 2]) // 2

    for _ in range(rounds):
        for i in range(nr):
            m = med(R[i])
            R[i] -= m
            row[i] += m
        rm = med(row)
        row -= rm
        overall += rm
        for j in range(nc):
            m = med(R[:, j])
            R[:, j] -= m
            col[j] += m
        cm = med(col)
        col -= cm
        overall += cm
    return overall, row, col, R, steps


def q_orders_median_polish(sf_dir):
    """(segment, year, cell_milli, resid_scaled, scale_log2): the
    polish residual per cell plus the shared scale; row/col/overall
    effects ride as extra rows with year = -1 / segment = '__row__'
    conventions kept OUT — instead every output row carries its cell's
    residual, and the effects are recoverable from any row set (the
    pytest checks the identity)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_of = ray.put(dict(zip(cust["c_custkey"].astype(np.int64), cust["c_mktsegment"])))
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        m = ray.get(seg_of)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        yr = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        rev = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        segs = pd.Series(ck).map(m)
        df = pd.DataFrame({"seg": segs, "year": yr, "rev": rev}).groupby(
            ["seg", "year"], as_index=False
        )["rev"].sum()
        df["segkey"] = df["seg"].map(lambda s: int.from_bytes(s.encode()[:8].ljust(8, b"\0"), "big"))
        return pa.Table.from_pandas(
            df[["segkey", "year", "rev"]], preserve_index=False
        )

    agg = (
        sum_by_key_pair(
            orders.map_batches(partial, batch_format="pyarrow"), "segkey", "year", ["rev"]
        )
        .to_pandas()
        .sort_values(["segkey", "year"])
        .reset_index(drop=True)
    )
    segs = sorted(agg["segkey"].unique())
    years = sorted(agg["year"].unique())
    grid = np.zeros((len(segs), len(years)), np.int64)
    si = np.searchsorted(np.asarray(segs, np.int64), agg["segkey"].to_numpy(np.int64))
    yi = np.searchsorted(np.asarray(years, np.int64), agg["year"].to_numpy(np.int64))
    grid[si, yi] = agg["rev"].to_numpy(np.int64)
    overall, roweff, coleff, resid, scale = median_polish_scaled(grid)
    seg_names = {
        int.from_bytes(s.encode()[:8].ljust(8, b"\0"), "big"): s
        for s in cust["c_mktsegment"].unique()
    }
    rows = []
    for i, sk in enumerate(segs):
        for j, y in enumerate(years):
            rows.append(
                (
                    seg_names[sk],
                    int(y),
                    int(grid[i, j]),
                    int(resid[i, j]),
                    scale,
                )
            )
    out = pd.DataFrame(
        rows, columns=["segment", "year", "cell_milli", "resid_scaled", "scale_log2"]
    )
    out[["year", "cell_milli", "resid_scaled", "scale_log2"]] = out[
        ["year", "cell_milli", "resid_scaled", "scale_log2"]
    ].astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {
            "segment": "object",
            "year": "int64",
            "cell_milli": "int64",
            "resid_scaled": "int64",
            "scale_log2": "int64",
        },
    )


ANALYTICS39_QUERIES["orders_median_polish"] = q_orders_median_polish
# rows-only: iterative medians have no SQL form; pytest replays the
# polish serially and checks the decomposition identity.


# ----------------------------------------------------------------------
# Poisson dispersion index per event type
# ----------------------------------------------------------------------
def q_events_dispersion_by_type(sf_dir):
    """(event_type, n_days, sum_c, sum_c2): exact moments of per-day
    counts per type (dispersion = caller-side division)."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        ty = np.asarray(t["event_type"].to_pylist(), object)
        df = pd.DataFrame({"ty": ty, "day": day})
        g = df.groupby(["ty", "day"], as_index=False).size()
        g["tykey"] = g["ty"].map(
            lambda s: int.from_bytes(s.encode()[:8].ljust(8, b"\0"), "big")
        )
        return pa.table(
            {
                "tykey": pa.array(g["tykey"].to_numpy(np.int64), pa.int64()),
                "day": pa.array(g["day"].to_numpy(np.int64), pa.int64()),
                "c": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    per_day = sum_by_key_pair(
        ev.map_batches(partial, batch_format="pyarrow"), "tykey", "day", ["c"]
    ).to_pandas()
    names = {
        int.from_bytes(s.encode()[:8].ljust(8, b"\0"), "big"): s
        for s in ("signup", "error", "click", "view", "purchase")
    }
    g = per_day.groupby("tykey")["c"].agg(
        n_days="count", sum_c="sum", sum_c2=lambda x: int((x.to_numpy(np.int64) ** 2).sum())
    ).reset_index()
    g["event_type"] = g["tykey"].map(names)
    out = (
        g[["event_type", "n_days", "sum_c", "sum_c2"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out[["n_days", "sum_c", "sum_c2"]] = out[["n_days", "sum_c", "sum_c2"]].astype(
        "int64"
    )
    return _typed_collect(
        ray.data.from_pandas(out),
        {"event_type": "object", "n_days": "int64", "sum_c": "int64", "sum_c2": "int64"},
    )


ANALYTICS39_QUERIES["events_dispersion_by_type"] = q_events_dispersion_by_type

ANALYTICS39_ORACLES["events_dispersion_by_type"] = (
    "WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, "
    "CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n_days, "
    "CAST(SUM(c) AS BIGINT) AS sum_c, CAST(SUM(c * c) AS BIGINT) AS sum_c2 "
    "FROM d GROUP BY 1"
)
