"""Edge-table transform stages (SURVEY.md §2.b)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from everythinggraph_ray.stages.edges import (
    dedup_edges,
    filter_self_loops,
    out_degrees,
    reverse_edges,
    synthesize_weights,
    undirect_edges,
)


def _ds(sv, dv):
    return ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    )


def test_reverse_and_undirect():
    ds = _ds([1, 2], [2, 3])
    rev = reverse_edges(ds).to_pandas()
    assert rev["src"].tolist() == [2, 3] and rev["dst"].tolist() == [1, 2]
    und = undirect_edges(ds).to_pandas()
    assert len(und) == 4


def test_filter_self_loops():
    out = filter_self_loops(_ds([1, 2, 3], [1, 3, 3])).to_pandas()
    assert out["src"].tolist() == [2]


def test_synthesize_weights_matches_reference_rule():
    out = synthesize_weights(_ds([13, 27], [5, 31])).to_pandas()
    # w = src%10 + dst%10 (init_all.c:663-666)
    assert out["weight"].tolist() == [8.0, 8.0]


def test_dedup_edges():
    out = dedup_edges(_ds([1, 1, 2, 1], [2, 2, 3, 2])).to_pandas()
    got = sorted(map(tuple, out[["src", "dst"]].to_numpy()))
    assert got == [(1, 2), (2, 3)]


def test_out_degrees_includes_dst_only_vertices():
    out = out_degrees(_ds([1, 1, 2], [2, 3, 9])).to_pandas().sort_values("vid")
    assert out["vid"].tolist() == [1, 2, 3, 9]
    assert out["outdeg"].tolist() == [2, 1, 0, 0]


def test_neighbor_sample_matches_serial_oracle():
    import hashlib

    import pandas as pd

    from everythinggraph_ray.stages.edges import neighbor_sample

    rng = np.random.default_rng(7)
    sv = rng.integers(0, 12, 300)
    dv = rng.integers(0, 40, 300)
    k = 3
    out = (
        neighbor_sample(dedup_edges(_ds(sv, dv)), k)
        .to_pandas()
        .sort_values(["src", "rnk"])
        .reset_index(drop=True)
    )
    # serial oracle: per src, k smallest by (md5("{src}_{dst}"), dst)
    df = pd.DataFrame({"src": sv, "dst": dv}).drop_duplicates()
    df["h"] = [
        hashlib.md5(f"{a}_{b}".encode()).hexdigest() for a, b in zip(df["src"], df["dst"])
    ]
    df = df.sort_values(["src", "h", "dst"]).reset_index(drop=True)
    df["rnk"] = df.groupby("src").cumcount() + 1
    exp = df[df["rnk"] <= k][["src", "dst", "rnk"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype("int64"), exp.astype("int64"), check_like=False
    )
    # determinism: a second distributed run returns the identical sample
    out2 = (
        neighbor_sample(dedup_edges(_ds(sv, dv)), k)
        .to_pandas()
        .sort_values(["src", "rnk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out.astype("int64"), out2.astype("int64"))


def test_neighbor_sample_keeps_all_when_k_exceeds_degree():
    from everythinggraph_ray.stages.edges import neighbor_sample

    out = neighbor_sample(_ds([1, 1, 2], [5, 6, 7]), 10).to_pandas()
    assert len(out) == 3
    assert sorted(out[out["src"] == 1]["rnk"].tolist()) == [1, 2]


def test_empty_and_degenerate_graphs(tmp_path):
    """Empty edge tables, self-loop-only and single-edge graphs must build
    and run without errors."""
    from everythinggraph_ray.graph.build import build_graph
    from everythinggraph_ray.graph.engine import GraphEngine
    from everythinggraph_ray.graph.kernels import BFSKernel, PageRankKernel
    from everythinggraph_ray.graph.triangles import triangle_count

    empty = _ds([], [])
    assert triangle_count(empty) == 0
    build_graph(empty, str(tmp_path / "empty"), num_partitions=3)
    eng = GraphEngine(str(tmp_path / "empty"))
    try:
        r = eng.run(PageRankKernel(), n_iters=2)
        assert r["dataset"].count() == 0
    finally:
        eng.shutdown()

    build_graph(_ds([5], [5]), str(tmp_path / "loop"), num_partitions=3)
    eng2 = GraphEngine(str(tmp_path / "loop"))
    try:
        r2 = eng2.run(BFSKernel(5), max_iters=5)
        assert r2["dataset"].to_pandas()["bfs"].tolist() == [1]
    finally:
        eng2.shutdown()


def test_grouped_top_k():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from everythinggraph_ray.stages.agg import grouped_top_k

    rng = np.random.default_rng(2)
    n = 5000
    g = rng.integers(0, 7, n)
    val = rng.random(n)
    ids = np.arange(n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "grp": pa.array(g, pa.int64()),
                "val": pa.array(val, pa.float64()),
                "id": pa.array(ids, pa.int64()),
            }
        )
    ).repartition(9)  # several batches → exercises the partial combiner
    got = (
        grouped_top_k(ds, "grp", [("val", False), ("id", True)], 3, rank_col="rk")
        .to_pandas()
        .sort_values(["grp", "rk"])
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"grp": g, "val": val, "id": ids})
        .sort_values(["val", "id"], ascending=[False, True], kind="stable")
        .groupby("grp", as_index=False, sort=False)
        .head(3)
        .sort_values(["grp", "val"], ascending=[True, False])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 21
    for grp in range(7):
        a = got[got["grp"] == grp]
        b = want[want["grp"] == grp]
        assert a["id"].tolist() == b["id"].tolist()
        assert a["rk"].tolist() == [1, 2, 3]


def test_deterministic_walks_match_serial_replay():
    """Distributed walks == a serial replay of the identical md5 rule."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    from everythinggraph_ray.stages.walk import deterministic_walks

    rng = np.random.default_rng(3)
    sv = rng.integers(0, 40, 300).astype(np.int64)
    dv = rng.integers(0, 40, 300).astype(np.int64)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(sv, pa.int64()), "dst": pa.array(dv, pa.int64())})
    )
    seed_vids = [0, 7, 13]
    seeds = ray.data.from_arrow(pa.table({"vid": pa.array(seed_vids, pa.int64())}))
    L = 4
    got = (
        deterministic_walks(edges, seeds, L)
        .to_pandas()
        .sort_values(["walk", "step"])
        .reset_index(drop=True)
    )

    adj: dict[int, list[int]] = {}
    for a, b in zip(sv.tolist(), dv.tolist()):
        adj.setdefault(a, []).append(b)
    want = []
    for w in seed_vids:
        cur = w
        want.append((w, 0, cur))
        for t in range(L):
            nbs = adj.get(cur)
            if not nbs:
                break
            cur = min(nbs, key=lambda v: (hashlib.md5(f"{t}:{cur}:{v}".encode()).hexdigest(), v))
            want.append((w, t + 1, cur))
    want_df = (
        pd.DataFrame(want, columns=["walk", "step", "vid"])
        .sort_values(["walk", "step"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want_df.astype("int64"))


def test_deterministic_walks_stop_at_sink():
    import pyarrow as pa

    from everythinggraph_ray.stages.walk import deterministic_walks

    # 0 -> 1 -> 2, and 2 is a sink
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 2], pa.int64())})
    )
    seeds = ray.data.from_arrow(pa.table({"vid": pa.array([0], pa.int64())}))
    got = deterministic_walks(edges, seeds, 5).to_pandas().sort_values("step")
    assert got["vid"].tolist() == [0, 1, 2]
    assert got["step"].tolist() == [0, 1, 2]


def test_events_funnel_ordering_semantics(tmp_path):
    import os

    import numpy as np
    import pandas as pd

    from everythinggraph_ray.pipelines.queries import q_events_funnel

    # user 1: view -> click -> purchase (all stages)
    # user 2: click BEFORE its first view -> click doesn't count; later no click
    # user 3: view and click at the SAME ts (ties count) but no purchase
    # user 4: only purchases (stage 1 never reached)
    ts = pd.Timestamp("2024-01-01")
    rows = [
        (1, ts, "view"), (1, ts + pd.Timedelta("1h"), "click"), (1, ts + pd.Timedelta("2h"), "purchase"),
        (2, ts, "click"), (2, ts + pd.Timedelta("1h"), "view"),
        (3, ts, "view"), (3, ts, "click"),
        (4, ts, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["event_id"] = np.arange(len(df))
    df["value"] = 0.0
    df["props"] = '{"k": 1}'
    d = tmp_path / "ev"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    out = q_events_funnel(str(d))
    row = out.iloc[0]
    assert row["n_users"] == 4
    assert row["n_view"] == 3      # users 1, 2, 3
    assert row["n_click"] == 2     # user 1; user 3 (tie); NOT user 2
    assert row["n_purchase"] == 1  # user 1 only


def test_events_props_extraction(tmp_path):
    import numpy as np
    import pandas as pd

    from everythinggraph_ray.pipelines.queries import q_events_props_sum

    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "user_id": [1, 1, 2, 2],
            "ts": pd.Timestamp("2024-01-01"),
            "event_type": ["a", "a", "b", "b"],
            "value": 0.0,
            "props": ['{"k": 5}', '{"k": 37}', '{"nope": 1}', '{"k": 2}'],
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    out = q_events_props_sum(str(d)).to_pandas().set_index("event_type")
    assert out.loc["a", "k_sum"] == 42 and out.loc["a", "n_hits"] == 2
    assert out.loc["b", "k_sum"] == 2 and out.loc["b", "n_hits"] == 1


def test_events_retention_cohorts(tmp_path):
    import numpy as np
    import pandas as pd

    from everythinggraph_ray.pipelines.queries import q_events_retention

    d0 = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: first day 0, returns day 1 and day 3 (twice on day 1)
        (1, d0), (1, d0 + pd.Timedelta("1D")), (1, d0 + pd.Timedelta("1D2h")),
        (1, d0 + pd.Timedelta("3D")),
        # user 2: first day 1 only
        (2, d0 + pd.Timedelta("1D")),
        # user 3: first day 0, returns day 1
        (3, d0 + pd.Timedelta("5h")), (3, d0 + pd.Timedelta("1D1h")),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["event_id"] = np.arange(len(df))
    df["event_type"] = "view"
    df["value"] = 0.0
    df["props"] = "{}"
    d = tmp_path / "ev"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    out = q_events_retention(str(d)).to_pandas()
    day0 = int(d0.to_datetime64().astype("datetime64[D]").astype(np.int64))
    m = {(r.cohort_day - day0, r.day_offset): r.n_users for r in out.itertuples()}
    assert m == {
        (0, 0): 2,  # users 1, 3 on their cohort day
        (0, 1): 2,  # both return next day (user 1's two day-1 events count once)
        (0, 3): 1,  # user 1 only
        (1, 0): 1,  # user 2's cohort
    }


def test_events_outliers_median_mad(tmp_path):
    import numpy as np
    import pandas as pd

    from everythinggraph_ray.pipelines.queries import q_events_outliers

    vals = [1.0, 1.0, 1.0, 1.1, 0.9, 100.0]  # med=1.00, MAD=0 -> any dev>0 is an outlier? no: 3*0=0, d>0
    df = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "user_id": 1,
            "ts": pd.Timestamp("2024-01-01"),
            "event_type": "a",
            "value": vals,
            "props": "{}",
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    out = q_events_outliers(str(d)).to_pandas().iloc[0]
    # cents: [100,100,100,110,90,10000] sorted [90,100,100,100,110,10000]
    # quantile_disc(0.5) on n=6: index ceil(0.5*6)-1 = 2 -> 100
    assert out["med_c"] == 100
    # deviations [0,0,0,10,10,9900] sorted -> idx 2 -> 0; MAD=0
    assert out["mad_c"] == 0
    # outliers: d > 0 -> the three non-100 values
    assert out["n_outliers"] == 3 and out["n_events"] == 6


def test_salted_sum_by_key_exact_and_skew_spread():
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from everythinggraph_ray.stages.agg import mix64, sum_by_key

    rng = np.random.default_rng(6)
    # one pathological hot key (80% of rows) + a long tail
    keys = np.where(rng.random(20000) < 0.8, 7, rng.integers(0, 500, 20000))
    vals = rng.integers(0, 100, 20000)
    ds = ray.data.from_pandas(
        pd.DataFrame({"k": keys.astype(np.int64), "v": vals.astype(np.int64)})
    )
    want = pd.DataFrame({"k": keys, "v": vals}).groupby("k", as_index=False)["v"].sum()
    for salt in (1, 8):
        got = (
            sum_by_key(ds, "k", ["v"], salt=salt)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, want.sort_values("k").reset_index(drop=True), check_dtype=False
        )
    # the salted inner pass really spreads the hot key over >1 sub-bucket
    salts = mix64(np.arange(20000, dtype=np.int64) + np.int64(7) * 31) % np.int64(8)
    assert len(np.unique(salts)) > 1
