"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir, compares against
``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns). Usage:

    python tools/check_queries.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

# the tool lives in tools/: put the repo root (where __ray_entry__ lives)
# on the path so it runs from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

import ray


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    from pandas.util import hash_pandas_object

    return hex(int(hash_pandas_object(df, index=False).sum()) & 0xFFFFFFFFFFFFFFFF)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    # pass the sf under test: web/corpus oracles resolve their side
    # parquets through the same sf→n_pages map as the Ray queries
    # (oracle_sql defaults to sf0.01 — the driver's correctness scale)
    oracles = entry_mod.oracle_sql(sf_dir)

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    ok = fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_df(fn(sf_dir)))
        except Exception:
            print(f"[ERR ] {name}: query raised")
            traceback.print_exc()
            fail += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"[rows] {name}: {len(mine)} rows, cols={list(mine.columns)} ({el:.1f}s)")
            ok += 1
            continue
        try:
            ref = canon(con.execute(oracles[name]).df())
        except Exception:
            print(f"[ERR ] {name}: oracle SQL raised")
            traceback.print_exc()
            fail += 1
            continue
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} vs {len(ref)}")
        if list(mine.columns) != list(ref.columns):
            problems.append(f"cols {list(mine.columns)} vs {list(ref.columns)}")
        if not problems:
            try:
                pd.testing.assert_frame_equal(
                    mine.reset_index(drop=True),
                    ref.reset_index(drop=True),
                    check_dtype=False,
                    check_exact=True,
                )
            except AssertionError as e:
                problems.append("values differ: " + str(e).split("\n")[0])
                # show a few diffs
                for c in mine.columns:
                    a, b = mine[c].to_numpy(), ref[c].to_numpy()
                    if a.dtype.kind in "fc":
                        bad = ~np.isclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)
                    else:
                        bad = a != b
                    if bad.any():
                        i = int(np.flatnonzero(bad)[0])
                        problems.append(f"  col {c} first diff @{i}: {a[i]!r} vs {b[i]!r} ({int(bad.sum())} total)")
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems[:4]))
            fail += 1
        else:
            print(f"[ OK ] {name}: {len(mine)} rows match ({el:.1f}s)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    ray.shutdown()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
