"""SCC (graph/scc.py) vs the serial Tarjan oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds(src, dst):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, np.int64), pa.int64()),
                "dst": pa.array(np.asarray(dst, np.int64), pa.int64()),
            }
        )
    )


def _run(src, dst, **kw):
    from everythinggraph_ray.graph.scc import scc

    out, rounds = scc(_ds(src, dst), num_partitions=4, **kw)
    return {int(r["vid"]): int(r["scc"]) for r in out.take_all()}, rounds


def test_scc_random_matches_tarjan():
    from everythinggraph_ray.graph.scc import scc_serial

    rng = np.random.default_rng(11)
    src = rng.integers(0, 40, 120)
    dst = rng.integers(0, 40, 120)
    got, _ = _run(src, dst)
    assert got == scc_serial(src, dst)


def test_scc_sparse_random_matches_tarjan():
    # sparse: many small SCCs + DAG tendrils (exercises trim + multi-round)
    from everythinggraph_ray.graph.scc import scc_serial

    rng = np.random.default_rng(7)
    src = rng.integers(0, 24, 30)
    dst = rng.integers(0, 24, 30)
    got, rounds = _run(src, dst)
    assert got == scc_serial(src, dst)
    assert rounds >= 1  # must exercise the F/B path, not just trim


def test_scc_chain_is_all_singletons_via_trim():
    # a pure DAG chain dissolves entirely in the iterated trim: zero F/B
    # engine rounds, every vertex its own component
    n = 12
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    got, rounds = _run(src, dst)
    assert rounds == 0
    assert got == {v: v for v in range(n)}


def test_scc_two_cycles_linked_takes_two_rounds():
    # cycle B {1,2,3} -> cycle A {10,11,12}: A's F label is polluted by
    # 1 until B is assigned and removed, so A lands in round 2
    src = [1, 2, 3, 10, 11, 12, 1]
    dst = [2, 3, 1, 11, 12, 10, 10]
    got, rounds = _run(src, dst)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
    assert rounds == 2


def test_scc_self_loop_only_vertex_is_singleton():
    got, _ = _run([5, 0, 1], [5, 1, 0])
    assert got == {5: 5, 0: 0, 1: 0}


def test_scc_one_big_cycle():
    n = 9
    src = np.arange(n)
    dst = (np.arange(n) + 1) % n
    got, rounds = _run(src, dst)
    assert got == {v: 0 for v in range(n)}
    assert rounds == 1


def test_scc_round_cap_raises():
    # two independent 2-cycles assign in ONE round (both have F==B);
    # force the cap with max_rounds=0 on a graph needing >=1 round
    with pytest.raises(RuntimeError):
        _run([0, 1], [1, 0], max_rounds=0)


# ---------------------------------------------------------------------------
# maximal independent set (graph/mis.py) — shares this file's Dataset-
# iteration test style
def _mis_df(sv, dv, **kw):
    from everythinggraph_ray.graph.mis import maximal_independent_set

    # tail_threshold=0 by default in tests: exercise the fully
    # distributed rounds, no serial tail
    kw.setdefault("tail_threshold", 0)
    res, rounds = maximal_independent_set(_ds(sv, dv), **kw)
    return res.to_pandas().sort_values("vid").reset_index(drop=True), rounds


def test_mis_distributed_matches_greedy_serial_oracle():
    """ONE fully-distributed run checked for oracle equality AND the
    independence + maximality invariants (sparse graph ⇒ several Luby
    rounds; the per-round shuffles make extra runs expensive)."""
    from everythinggraph_ray.graph.mis import mis_serial

    rng = np.random.default_rng(23)
    sv = rng.integers(0, 50, 140).astype(np.int64)
    dv = rng.integers(0, 50, 140).astype(np.int64)
    got, rounds = _mis_df(sv, dv)
    want = mis_serial(sv, dv)
    assert dict(zip(got["vid"].tolist(), got["in_mis"].tolist())) == want
    assert rounds >= 2  # must exercise multi-round shrink
    in_mis = set(got[got["in_mis"] == 1]["vid"].tolist())
    adj: dict[int, set[int]] = {}
    for a, b in zip(sv.tolist(), dv.tolist()):
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    for v in in_mis:  # independence
        assert not (adj.get(v, set()) & in_mis)
    for v in got[got["in_mis"] == 0]["vid"].tolist():  # maximality
        assert adj.get(v, set()) & in_mis, v


def test_mis_isolated_and_self_loop_vertices_join():
    # 0-1 edge, 2 self-loop only, 3-4 edge: 2 must join (no real nbrs);
    # semantics-only check ⇒ default (serial-tail) path is fine and fast
    from everythinggraph_ray.graph.mis import maximal_independent_set

    sv = np.array([0, 2, 3], dtype=np.int64)
    dv = np.array([1, 2, 4], dtype=np.int64)
    res, _ = maximal_independent_set(_ds(sv, dv))
    got = res.to_pandas()
    m = dict(zip(got["vid"].tolist(), got["in_mis"].tolist()))
    assert m[2] == 1
    assert m[0] + m[1] == 1 and m[3] + m[4] == 1


def test_mis_tail_with_no_edges():
    # self-loops only: the undirected simple edge set is EMPTY when the
    # serial tail engages (an empty Dataset's to_pandas() has no columns
    # — regression: KeyError 'src'); every vertex joins the MIS
    from everythinggraph_ray.graph.mis import maximal_independent_set

    sv = np.array([5, 7, 9], dtype=np.int64)
    dv = np.array([5, 7, 9], dtype=np.int64)
    res, _ = maximal_independent_set(_ds(sv, dv), tail_threshold=512)
    got = res.to_pandas().sort_values("vid").reset_index(drop=True)
    assert got["vid"].tolist() == [5, 7, 9]
    assert got["in_mis"].tolist() == [1, 1, 1]


def test_mis_serial_tail_path_matches_fully_distributed():
    """Mixed path (distributed rounds + serial tail) == tail-free run."""
    rng = np.random.default_rng(31)
    sv = rng.integers(0, 40, 110).astype(np.int64)
    dv = rng.integers(0, 40, 110).astype(np.int64)
    full, _ = _mis_df(sv, dv)  # tail_threshold=0
    mixed, r_mixed = _mis_df(sv, dv, tail_threshold=20)
    assert r_mixed >= 2  # at least one distributed round before the tail
    assert full.equals(mixed)
