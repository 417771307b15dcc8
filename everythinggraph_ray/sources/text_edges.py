"""Text edge-list sources: whitespace/CSV-delimited ``src dst [weight]``
lines — the format public graph corpora ship in (SNAP `.txt` edge lists,
Graph500 Kronecker dumps, `.csv` exports). The reference only reads its
packed binary (sources/binary_edges.py); this covers the other on-disk
format a user migrating real datasets needs.

Parsing is vectorized: ``ray.data.read_text`` streams line blocks, and
each batch is split with ONE pyarrow string kernel pass (split + cast) —
no per-line Python. ``#``/``%``-prefixed comment lines (SNAP headers) and
blank lines are dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def read_text_edges(
    paths: str | list[str],
    *,
    weighted: bool = False,
    delimiter: str | None = None,
) -> ray.data.Dataset:
    """Edge-list text file(s) → Dataset (src:int64, dst:int64
    [, weight:float64]). ``delimiter=None`` splits on any whitespace run
    (SNAP style); pass ``","`` for CSV."""

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"]
        keep = pc.and_(
            pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(lines)), 0),
            pc.invert(
                pc.or_(
                    pc.starts_with(pc.utf8_ltrim_whitespace(lines), "#"),
                    pc.starts_with(pc.utf8_ltrim_whitespace(lines), "%"),
                )
            ),
        )
        lines = pc.utf8_trim_whitespace(pc.filter(lines, keep))
        if delimiter is None:
            parts = pc.split_pattern_regex(lines, r"\s+")
        else:
            parts = pc.split_pattern(lines, delimiter)
        flat = pc.list_flatten(parts)
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        want = 3 if weighted else 2
        if len(counts) and (counts < want).any():
            bad = int((counts < want).sum())
            raise ValueError(
                f"malformed edge lines: {bad} line(s) with fewer than {want} fields"
            )
        offs = np.r_[0, np.cumsum(counts)]
        vals = flat.to_numpy(zero_copy_only=False)
        src = pa.array(vals[offs[:-1]].astype(np.int64), pa.int64()) if len(counts) else pa.array([], pa.int64())
        dst = pa.array(vals[offs[:-1] + 1].astype(np.int64), pa.int64()) if len(counts) else pa.array([], pa.int64())
        cols = {"src": src, "dst": dst}
        if weighted:
            w = vals[offs[:-1] + 2].astype(np.float64) if len(counts) else np.empty(0)
            cols["weight"] = pa.array(w, pa.float64())
        return pa.table(cols)

    return ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow")
