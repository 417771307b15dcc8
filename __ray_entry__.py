"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 scale: deterministic
    page corpus → extract links (byte-identical text invariant) → edge
    table → partitioned build → superstep PageRank to 1e-6. Returns a
    Ray Dataset (vid, pagerank)."""
    from everythinggraph_ray.pipelines.flagship import flagship_small

    return flagship_small()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (graph
    kernels over a derived integer edge table + the web-corpus pipeline +
    training-data operators over documents/embeddings/events)."""
    from everythinggraph_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """DuckDB equivalents for every SQL-expressible query. The web
    flagship family (web_edges / web_pagerank10 / web_wcc / web_top10)
    reads a SERIAL-extractor side parquet from /tmp — materialized here
    (cached, <1 s) so the SQL binds whenever the driver runs it. The web
    oracle corpus scale is resolved from ``sf_dir`` through the SAME
    sf→n_pages mapping the Ray-side queries use, so a correctness pass at
    any sf compares against the matching corpus (the driver calls this
    with no argument → sf0.01 → the 3000-page corpus).
    Hash/model-based ops with no SQL form (MinHash, language-ID
    heuristic, to-convergence PageRank's data-dependent iteration count)
    are intentionally omitted → rows-only check, with exactness covered
    by tests/ against serial oracles."""
    from everythinggraph_ray.pipelines.queries import (
        ORACLES,
        register_web_oracles,
        web_oracle_pages_for,
    )

    register_web_oracles(web_oracle_pages_for(sf_dir), ensure=True)
    return dict(ORACLES)
