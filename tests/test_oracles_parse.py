"""Every registered oracle must at least PLAN in DuckDB against the
real table schemas — catches syntax errors (reserved words, dialect
slips) and schema drift without running the queries."""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def test_every_oracle_plans(con):
    import __ray_entry__ as entry

    oracles = entry.oracle_sql()
    assert len(oracles) >= 300
    bad = {}
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collect all failures
            bad[name] = str(e).splitlines()[0]
    assert not bad, bad
