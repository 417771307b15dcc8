"""Analytics batch (session 12, twenty-fourth wave): Viterbi burst
decoding.

Distributed shape:
- ``events_burst_viterbi``: Kleinberg-style burst detection as an
  EXACT min-plus Viterbi decode over the per-day event-count series —
  2 states (base μ = the median daily count, burst μ = 2·median),
  integer L1 emission costs |c − μ_state| and a fixed switch penalty;
  ties prefer base. Day totals fold distributed (the Holt/PAVA
  device); the 2-state DP runs on the driver's bounded day table in
  pure integers — min-plus Viterbi joins the engine's DP family
  beside max-plus knapsack convolution, patience LIS and PAVA pools.
  Rows-only (back-pointer DP has no SQL form); serial replay +
  planted-burst pytests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

ANALYTICS40_QUERIES: dict = {}
ANALYTICS40_ORACLES: dict = {}

SWITCH_PENALTY = 3  # in units of daily-count L1 error


def viterbi_burst(counts: np.ndarray, penalty: int = SWITCH_PENALTY):
    """Exact 2-state min-plus Viterbi: returns (states 0/1 per day,
    total_cost, mu_base, mu_burst). Ties prefer base (state 0) and, on
    equal incoming cost, staying in the current state."""
    c = np.asarray(counts, np.int64)
    srt = np.sort(c)
    n = len(c)
    mu0 = int(srt[n // 2] if n % 2 else (srt[n // 2 - 1] + srt[n // 2]) // 2)
    mu1 = 2 * mu0
    INF = 1 << 60
    cost = [0, 0]
    cost[0] = abs(int(c[0]) - mu0)
    cost[1] = abs(int(c[0]) - mu1)
    back: list[tuple[int, int]] = []
    for t in range(1, n):
        e0 = abs(int(c[t]) - mu0)
        e1 = abs(int(c[t]) - mu1)
        # into state 0: stay beats switch on ties; into 1 likewise
        stay0, sw0 = cost[0], cost[1] + penalty
        p0 = 0 if stay0 <= sw0 else 1
        n0 = e0 + min(stay0, sw0)
        stay1, sw1 = cost[1], cost[0] + penalty
        p1 = 1 if stay1 < sw1 else 0  # tie -> come FROM base
        n1 = e1 + min(stay1, sw1)
        back.append((p0, p1))
        cost = [n0, n1]
    states = np.zeros(n, np.int64)
    cur = 0 if cost[0] <= cost[1] else 1  # final tie -> base
    states[n - 1] = cur
    for t in range(n - 2, -1, -1):
        cur = back[t][cur]
        states[t] = cur
    return states, int(min(cost)), mu0, mu1


def q_events_burst_viterbi(sf_dir):
    """(day, n_events, burst): per-day counts with the decoded burst
    flag."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        u, cnt = np.unique(day, return_counts=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    days = (
        ev.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("day", as_index=False)["n"]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    states, _, _, _ = viterbi_burst(days["n"].to_numpy(np.int64))
    out = pd.DataFrame(
        {
            "day": days["day"].astype("int64"),
            "n_events": days["n"].astype("int64"),
            "burst": states,
        }
    ).astype("int64")
    return _typed_collect(
        ray.data.from_pandas(out),
        {"day": "int64", "n_events": "int64", "burst": "int64"},
    )


ANALYTICS40_QUERIES["events_burst_viterbi"] = q_events_burst_viterbi
# rows-only: back-pointer Viterbi has no SQL form; serial replay +
# planted-burst pytests.
