"""Snapshot-delta (daily recrawl diff) exactness vs a serial oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def serial_delta(docs: pd.DataFrame) -> pd.DataFrame:
    """Serial reference: build both snapshots literally, outer-join texts."""
    from everythinggraph_ray.pipelines.queries import (
        SNAP_ADD_MOD,
        SNAP_CHG_MOD,
        SNAP_DEL_MOD,
        SNAP_REV_SUFFIX,
    )

    a = docs[docs["doc_id"] % SNAP_ADD_MOD != 3][["doc_id", "text"]]
    b = docs[docs["doc_id"] % SNAP_DEL_MOD != 2][["doc_id", "text"]].copy()
    chg = b["doc_id"] % SNAP_CHG_MOD == 1
    b.loc[chg, "text"] = b.loc[chg, "text"] + SNAP_REV_SUFFIX
    m = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"))
    status = np.where(
        m["text_a"].isna(),
        "added",
        np.where(
            m["text_b"].isna(),
            "removed",
            np.where(m["text_a"] != m["text_b"], "changed", "unchanged"),
        ),
    )
    return pd.DataFrame({"doc_id": m["doc_id"].astype(np.int64), "status": status})


def test_snapshot_delta_matches_serial_oracle():
    import pyarrow.parquet as pq

    from everythinggraph_ray.pipelines.queries import q_docs_snapshot_delta

    docs = pq.read_table(
        SF_DIR + "/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = serial_delta(docs).sort_values("doc_id").reset_index(drop=True)
    got = (
        q_docs_snapshot_delta(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_snapshot_delta_invariants():
    """Statuses must partition by the defining id arithmetic: ids in
    neither snapshot are absent; added ⇔ B-only; removed ⇔ A-only;
    changed ⇔ both sides with the revision mod hitting."""
    import pyarrow.parquet as pq

    from everythinggraph_ray.pipelines.queries import (
        SNAP_ADD_MOD,
        SNAP_CHG_MOD,
        SNAP_DEL_MOD,
        q_docs_snapshot_delta,
    )

    ids = (
        pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])
        .to_pandas()["doc_id"]
        .to_numpy(np.int64)
    )
    got = q_docs_snapshot_delta(SF_DIR).to_pandas()
    by = dict(zip(got["doc_id"], got["status"]))
    assert len(by) == len(got)  # one row per doc_id
    for i in ids:
        in_a = i % SNAP_ADD_MOD != 3
        in_b = i % SNAP_DEL_MOD != 2
        if not in_a and not in_b:
            assert i not in by
        elif not in_a:
            assert by[i] == "added"
        elif not in_b:
            assert by[i] == "removed"
        elif i % SNAP_CHG_MOD == 1:
            assert by[i] == "changed"
        else:
            assert by[i] == "unchanged"
    # every doc in at least one snapshot is classified
    expected_n = sum(
        1 for i in ids if (i % SNAP_ADD_MOD != 3) or (i % SNAP_DEL_MOD != 2)
    )
    assert len(got) == expected_n
