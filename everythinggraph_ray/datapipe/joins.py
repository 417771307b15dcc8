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
import pyarrow.compute as pc

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
    lschema = _peek_schema(left)
    rschema = _peek_schema(right)
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


def _key_hash(batch: pa.Table, cols: list[str]) -> np.ndarray:
    """Combined bucket hash over one or more join-key columns (int64 via
    splitmix64, strings via pandas' deterministic siphash)."""
    from pandas.util import hash_pandas_object

    from everythinggraph_ray.stages.agg import mix64

    h: np.ndarray | None = None
    for c in cols:
        arr = batch[c]
        if pa.types.is_integer(arr.type) or pa.types.is_timestamp(arr.type):
            hc = mix64(pc.cast(arr, pa.int64()).to_numpy(zero_copy_only=False))
        else:
            hc = (
                hash_pandas_object(arr.to_pandas(), index=False)
                .to_numpy()
                .astype(np.uint64)
            )
        h = hc if h is None else mix64((h ^ hc).astype(np.int64))
    assert h is not None
    return h.astype(np.int64) & 0x7FFFFFFF


def _peek_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Arrow schema of ``ds``, tolerating EMPTY datasets: take_batch
    raises on zero rows, but block metadata still carries the schema
    (an iterative peel can legitimately hand either side an empty set —
    the densest-subgraph final round)."""
    try:
        return ds.take_batch(1, batch_format="pyarrow").schema
    except ValueError:
        sch = ds.schema()
        return pa.schema(
            [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
        )


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str | list[str],
    right_cols: list[str] | None = None,
    how: str = "inner",
    right_on: str | list[str] | None = None,
    num_buckets: int = 64,
    impl: str = "bucketed",
) -> ray.data.Dataset:
    """Distributed hash equi-join: ``inner`` / ``left`` / ``full`` (attach
    ``right_cols``; ``full`` keeps unmatched rows of BOTH sides with the
    join keys coalesced from whichever side is present), ``semi`` /
    ``anti`` (filter left by key existence — the blocklist/allowlist
    filters of corpus curation).

    ``impl='bucketed'`` (default) is this repo's bucketed co-group;
    ``impl='native'`` delegates to Ray Data 2.49's experimental
    ``Dataset.join`` (hash-shuffle aggregator actors) with the same
    output contract — both are exercised by the equivalence tests, and
    measured within noise of each other at sf0.1 (BASELINE.md). The
    bucketed form stays the default because it shares the repo's one
    partitioning convention (same `mix64` buckets as every other wide
    op, so joins can co-schedule with adjacent bucketed stages) and has
    no aggregator-actor warm-up; flip to native as it stabilizes.

    Shape (one shuffle, no driver or broadcast state — the BIG-side
    complement of the `ray.put` broadcast join in q_mktsegment_revenue):
    both sides are role-tagged and unioned, rows co-locate by
    ``hash(key) % B``, each bucket resolves with ONE vectorized
    ``pandas.merge`` — the bucketed-reduce contract (a bucket's rows fit
    a worker; pre-aggregate or salt chronic hot keys upstream).

    Null-key semantics are SQL's (NOT-EXISTS style): null keys never
    match — inner/semi drop them, left/anti keep them unmatched. Right
    key columns (``right_on``, default ``on``) are renamed to left's.
    ``semi`` emits each matching left row once (no multiplication)."""
    if how not in ("inner", "left", "full", "semi", "anti"):
        raise ValueError(f"how must be inner/left/full/semi/anti, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    r_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    if len(r_on) != len(on):
        raise ValueError("right_on must match on in length")
    right_cols = list(right_cols or [])
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"{how} join emits left columns only; right_cols must be empty")
    lschema = _peek_schema(left)
    rschema = _peek_schema(right)
    left_cols = lschema.names
    clash = set(right_cols) & set(left_cols)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    out_fields = [(c, lschema.field(c).type) for c in left_cols]
    out_fields += [(c, rschema.field(c).type) for c in right_cols]

    if impl == "native":
        if how == "full":
            # Ray's full_outer drops/nulls the right key cols for
            # unmatched-right rows; this contract COALESCES keys from
            # whichever side is present — bucketed impl only.
            raise ValueError("how='full' requires impl='bucketed'")
        # Dataset.join drops the right key cols when right_on is given and
        # emits left cols + right value cols — select down to the contract.
        jt = {"inner": "inner", "left": "left_outer", "semi": "left_semi", "anti": "left_anti"}[how]
        rsel = right.select_columns(list(dict.fromkeys(r_on + right_cols)))
        joined = left.join(
            rsel, jt, num_buckets, on=tuple(on), right_on=tuple(r_on)
        )
        return joined.select_columns([c for c, _ in out_fields])
    if impl != "bucketed":
        raise ValueError(f"impl must be bucketed/native, got {impl!r}")

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in left_cols}
        for c in right_cols:
            cols[c] = pa.nulls(batch.num_rows, rschema.field(c).type)
        cols["__role"] = pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        # only the key + value columns of the right side ever move
        n = batch.num_rows
        cols = {}
        for lc, rc in zip(on, r_on):
            cols[lc] = batch[rc]
        for c in left_cols:
            if c not in cols:
                cols[c] = pa.nulls(n, lschema.field(c).type)
        for c in right_cols:
            cols[c] = batch[c]
        cols["__role"] = pa.array(np.ones(n, np.int8), pa.int8())
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return _key_hash(batch, on)

    def join(g: pa.Table) -> pa.Table:
        # split by role in ARROW first: the role-tagged union holds nulls
        # in the OTHER side's columns, and a whole-table to_pandas would
        # coerce those int64 columns to float64 — silently corrupting
        # values above 2^53 (e.g. 63-bit url-hash vids). Each side's own
        # columns are null-free, so per-side conversion keeps exact int64.
        role = g["__role"]
        lf = g.filter(pc.equal(role, 0)).select(left_cols).to_pandas()
        rf = (
            g.filter(pc.equal(role, 1))
            .select(list(dict.fromkeys(on + right_cols)))
            .to_pandas()
            .dropna(subset=on)
        )
        if how in ("inner", "left", "full"):
            if how in ("left", "full"):
                # unmatched left rows put NA into right cols after the
                # merge — pre-cast int64 right cols to pandas nullable
                # Int64 so that NA doesn't float64-coerce (and corrupt)
                # large matched values
                for c in right_cols:
                    if pa.types.is_integer(rschema.field(c).type):
                        rf[c] = rf[c].astype("Int64")
            if how == "full":
                # full outer also NAs the LEFT columns on unmatched-right
                # rows — same nullable-Int64 guard on the left side; the
                # join keys themselves coalesce from whichever side exists
                for c in left_cols:
                    if pa.types.is_integer(lschema.field(c).type):
                        lf[c] = lf[c].astype("Int64")
            m = lf.merge(rf, on=on, how="outer" if how == "full" else how)
        else:
            keys = rf[on].drop_duplicates()
            if how == "semi":
                m = lf.merge(keys, on=on, how="inner")
            else:
                m = lf.merge(keys, on=on, how="left", indicator="__matched")
                m = m[m["__matched"] == "left_only"]
        arrays = {}
        for c, t in out_fields:
            arrays[c] = pa.Array.from_pandas(m[c], type=t)
        return pa.table(arrays)

    return bucketed_reduce(unioned, bucket_of, join, num_buckets=num_buckets)


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    by: str,
    left_on: str,
    right_start: str,
    right_end: str,
    right_cols: list[str],
    closed: str = "both",
    bucket_width_us: int = 3_600_000_000,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Interval (range) join: each left row × every right interval of the
    same ``by`` key that contains its ``left_on`` timestamp — the
    event-in-window join (sessions, promo windows, incident periods) Ray
    Data has no native operator for.

    Shape: time is tiled into ``bucket_width_us`` buckets. Each left row
    lands in exactly ONE bucket; each right interval is REPLICATED to
    every bucket it overlaps (replication factor ≈ interval_len/width + 1
    — size the width to the typical interval so it stays ~2). Rows then
    co-locate by ``hash(by, time_bucket)`` and each group resolves with
    one vectorized pandas merge + containment mask. Matching left and
    right rows always share a time bucket, and a left row has one bucket,
    so no pair is emitted twice — no dedup pass. Nothing touches the
    driver; the partitioning assumption is the usual bucketed-reduce
    contract (one (key, bucket)'s rows fit a worker).

    ``closed``: which interval bounds match — 'both' (default),
    'left', 'right', or 'neither'. Output: all left columns +
    ``right_cols`` (names must not collide with left's)."""
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"closed must be both/left/right/neither, got {closed!r}")
    W = np.int64(bucket_width_us)
    lschema = _peek_schema(left)
    rschema = _peek_schema(right)
    left_cols = lschema.names
    clash = set(right_cols) & set(left_cols)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    out_fields = [(c, lschema.field(c).type) for c in left_cols]
    out_fields += [(c, rschema.field(c).type) for c in right_cols]

    def _us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)

    def tag_left(batch: pa.Table) -> pa.Table:
        ts = _us(batch[left_on])
        cols = {c: batch[c] for c in left_cols}
        for c in right_cols:
            cols[c] = pa.nulls(batch.num_rows, rschema.field(c).type)
        cols["__ts"] = pa.array(ts, pa.int64())
        cols["__st"] = pa.nulls(batch.num_rows, pa.int64())
        cols["__en"] = pa.nulls(batch.num_rows, pa.int64())
        cols["__tb"] = pa.array(ts // W, pa.int64())
        cols["__role"] = pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        st = _us(batch[right_start])
        en = _us(batch[right_end])
        valid = np.flatnonzero(en >= st)  # drop inverted intervals
        st, en = st[valid], en[valid]
        reps = (en // W - st // W + 1).astype(np.int64)
        idx = np.repeat(valid, reps)
        starts = np.concatenate([[0], np.cumsum(reps)[:-1]]) if len(reps) else np.empty(0, np.int64)
        off = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(starts, reps)
        tb = np.repeat(st // W, reps) + off
        cols = {}
        byv = batch[by].take(pa.array(idx, pa.int64()))
        for c in left_cols:
            cols[c] = byv if c == by else pa.nulls(len(idx), lschema.field(c).type)
        for c in right_cols:
            cols[c] = batch[c].take(pa.array(idx, pa.int64()))
        cols["__ts"] = pa.nulls(len(idx), pa.int64())
        cols["__st"] = pa.array(np.repeat(st, reps), pa.int64())
        cols["__en"] = pa.array(np.repeat(en, reps), pa.int64())
        cols["__tb"] = pa.array(tb, pa.int64())
        cols["__role"] = pa.array(np.ones(len(idx), np.int8), pa.int8())
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        from everythinggraph_ray.stages.agg import mix64_pair

        return mix64_pair(
            batch[by].to_numpy(zero_copy_only=False),
            batch["__tb"].to_numpy(zero_copy_only=False),
        )

    lo_ok = np.greater_equal if closed in ("both", "left") else np.greater
    hi_ok = np.less_equal if closed in ("both", "right") else np.less

    def join(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        lf = df[df["__role"] == 0][left_cols + ["__ts", "__tb"]]
        rf = df[df["__role"] == 1][[by, "__st", "__en", "__tb"] + right_cols]
        m = lf.merge(rf, on=[by, "__tb"])
        m = m[lo_ok(m["__ts"], m["__st"]) & hi_ok(m["__ts"], m["__en"])]
        arrays = {}
        for c, t in out_fields:
            arrays[c] = pa.Array.from_pandas(m[c], type=t)
        return pa.table(arrays)

    return bucketed_reduce(unioned, bucket_of, join, num_buckets=num_buckets)
