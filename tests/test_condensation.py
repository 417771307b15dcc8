"""SCC condensation DAG (q_rel_scc_condensation) vs serial oracles."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def serial_condensation(src, dst) -> set[tuple[int, int]]:
    from everythinggraph_ray.graph.scc import scc_serial

    comp = scc_serial(src, dst)
    return {
        (comp[int(a)], comp[int(b)])
        for a, b in zip(src, dst)
        if int(a) != int(b) and comp[int(a)] != comp[int(b)]
    }


def _fake_sf_dir(tmp_path, src, dst) -> str:
    """An sf_dir whose lineitem derives exactly (src, dst): rel_edges is
    l_orderkey % 1000, l_partkey % 1000 — values < 1000 map to
    themselves."""
    assert max(list(src) + list(dst)) < 1000
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.asarray(src, np.int64), pa.int64()),
                "l_partkey": pa.array(np.asarray(dst, np.int64), pa.int64()),
            }
        ),
        os.path.join(tmp_path, "lineitem.parquet"),
    )
    return str(tmp_path)


def _got_pairs(sf_dir) -> set[tuple[int, int]]:
    from everythinggraph_ray.pipelines.queries import q_rel_scc_condensation

    df = q_rel_scc_condensation(sf_dir)
    return set(zip(df["c_src"].astype(int), df["c_dst"].astype(int)))


def test_condensation_two_cycles_bridge(tmp_path):
    # two 3-cycles {0,1,2} and {10,11,12} bridged 2->10, plus a dangling
    # tail 12->20 and a self-loop: condensation = {(0,10), (10,20)}
    src = [0, 1, 2, 10, 11, 12, 2, 12, 5]
    dst = [1, 2, 0, 11, 12, 10, 10, 20, 5]
    d = _fake_sf_dir(tmp_path, src, dst)
    assert _got_pairs(d) == {(0, 10), (10, 20)} == serial_condensation(src, dst)


def test_condensation_strongly_connected_is_empty(tmp_path):
    # one big cycle: single SCC, edgeless condensation, schema intact
    n = 12
    src = list(range(n))
    dst = [(i + 1) % n for i in range(n)]
    d = _fake_sf_dir(tmp_path, src, dst)
    from everythinggraph_ray.pipelines.queries import q_rel_scc_condensation

    df = q_rel_scc_condensation(d)
    assert list(df.columns) == ["c_src", "c_dst"]
    assert len(df) == 0
    assert df["c_src"].dtype == np.int64


def test_condensation_matches_serial_on_testdata():
    from everythinggraph_ray.pipelines.queries import REL_V

    li = pq.read_table(
        os.path.join(SF_DIR, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"]
    )
    src = (li["l_orderkey"].to_numpy() % REL_V).astype(np.int64)
    dst = (li["l_partkey"].to_numpy() % REL_V).astype(np.int64)
    want = serial_condensation(src, dst)
    got = _got_pairs(SF_DIR)
    assert got == want
    # DAG sanity: no pair appears in both directions (condensation is acyclic)
    assert not any((b, a) in got for a, b in got)
