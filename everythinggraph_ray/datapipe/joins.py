"""Temporal joins Ray Data lacks natively: the as-of join.

``asof_join(left, right, by, on, ...)`` attaches, to each left row, the
value columns of the LATEST right row whose ``on`` (timestamp) is ≤ the
left row's (or strictly < with ``strict=True``) within the same ``by``
key — the standard event-enrichment / feature-lookup join of
training-data and analytics pipelines.

Shape (one shuffle, no driver state): both sides are role-tagged and
UNIONED, rows co-locate by ``hash(by) % B`` (a key's full history lands
in one bucket), and each bucket resolves ALL its keys with one vectorized
``pandas.merge_asof`` over the sorted slab — never a per-key Python call
(the ~80x bucketed-reduce lesson, stages/agg.py). Only the right side's
(by, on, value) columns move; partitioning assumption: a single key's
rows fit one bucket's memory (same contract as every bucketed reduce
here — salt or range-split chronic hot keys upstream if not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    by: str,
    on: str,
    value_cols: list[str],
    strict: bool = False,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Left as-of join: every left row + the latest right ``value_cols``
    at-or-before (``strict=False``) / strictly-before (``strict=True``)
    its ``on`` within the same ``by``. Left rows with no match carry
    nulls. Right-side ties on (by, on) resolve to the row latest in
    (on, value_cols) sort order — deterministic under shuffle."""
    # schema probe via one Arrow batch: robust for Arrow- AND
    # pandas-backed datasets (base_schema of a pandas block has no Arrow
    # field types); costs one first-block read per side
    lschema = left.take_batch(1, batch_format="pyarrow").schema
    rschema = right.take_batch(1, batch_format="pyarrow").schema
    left_cols = lschema.names
    out_fields = [(c, lschema.field(c).type) for c in left_cols]
    out_fields += [(c, rschema.field(c).type) for c in value_cols]

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in left_cols}
        for c in value_cols:
            cols[c] = pa.nulls(batch.num_rows, rschema.field(c).type)
        cols["__role"] = pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            if c in (by, on):
                cols[c] = batch[c]
            else:
                cols[c] = pa.nulls(batch.num_rows, lschema.field(c).type)
        for c in value_cols:
            cols[c] = batch[c]
        cols["__role"] = pa.array(np.ones(batch.num_rows, np.int8), pa.int8())
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.select_columns(list(dict.fromkeys([by, on] + value_cols))).map_batches(
            tag_right, batch_format="pyarrow"
        )
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(
            batch[by].to_numpy(zero_copy_only=False).astype(np.uint64)
        ).astype(np.int64) & 0x7FFFFFFF

    def join(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        lf = df[df["__role"] == 0][left_cols].sort_values([on, by], kind="stable")
        rf = (
            df[df["__role"] == 1][[by, on] + value_cols]
            .sort_values([on] + value_cols, kind="stable")  # deterministic tie winner
        )
        m = pd.merge_asof(
            lf,
            rf,
            on=on,
            by=by,
            direction="backward",
            allow_exact_matches=not strict,
        )
        arrays = {}
        for c, t in out_fields:
            arrays[c] = pa.Array.from_pandas(m[c], type=t)
        return pa.table(arrays)

    return bucketed_reduce(unioned, bucket_of, join, num_buckets=num_buckets)
