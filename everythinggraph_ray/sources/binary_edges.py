"""Reference-format binary edge files (SURVEY.md §2.a S1).

The reference's on-disk input is a packed little-endian record stream
``[src:u32][dst:u32]`` (plus ``[weight:f32]`` when compiled WEIGHTED) —
README.md:21-23, ``struct input`` init_all.h:8-14, ``item_size()``
init_all.c:43-49. These functions read that exact format into an edge
Dataset (and write it back, for round-trip compat with the reference
binaries).

Reading uses ``ray.data.read_binary_files`` (one row per file) and a
``map_batches`` record splitter — each file's bytes become an Arrow batch
of int64 src/dst. For multi-GB single files, split them beforehand at
record boundaries (item_size divides any offset you cut at); the record
format is offset-addressable by design (``get_input(pos)``,
init_all.c:76-78).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def item_size(weighted: bool) -> int:
    return 12 if weighted else 8


def read_binary_edges(paths: str | list[str], *, weighted: bool = False) -> ray.data.Dataset:
    """Packed [src:u32][dst:u32]([w:f32]) file(s) → Dataset
    (src:int64, dst:int64[, weight:float64])."""
    rec = item_size(weighted)

    def split(batch: pa.Table) -> pa.Table:
        out_s, out_d, out_w = [], [], []
        for blob in batch["bytes"].to_pylist():
            if len(blob) % rec:
                raise ValueError(
                    f"malformed edge file: {len(blob)} bytes is not a multiple "
                    f"of the {rec}-byte record (truncated file, or the wrong "
                    f"weighted= flag for this file's stride)"
                )
            n = len(blob) // rec
            if weighted:
                a = np.frombuffer(blob[: n * rec], dtype=np.dtype([("s", "<u4"), ("d", "<u4"), ("w", "<f4")]))
                out_s.append(a["s"].astype(np.int64))
                out_d.append(a["d"].astype(np.int64))
                out_w.append(a["w"].astype(np.float64))
            else:
                a = np.frombuffer(blob[: n * rec], dtype="<u4").reshape(-1, 2)
                out_s.append(a[:, 0].astype(np.int64))
                out_d.append(a[:, 1].astype(np.int64))
        cols = {
            "src": pa.array(np.concatenate(out_s) if out_s else np.empty(0, np.int64), pa.int64()),
            "dst": pa.array(np.concatenate(out_d) if out_d else np.empty(0, np.int64), pa.int64()),
        }
        if weighted:
            cols["weight"] = pa.array(
                np.concatenate(out_w) if out_w else np.empty(0, np.float64), pa.float64()
            )
        return pa.table(cols)

    return ray.data.read_binary_files(paths).map_batches(split, batch_format="pyarrow")


def write_binary_edges(edges: ray.data.Dataset, path: str, *, weighted: bool = False) -> int:
    """Edge Dataset → ONE packed file the reference binaries can mmap
    (small/medium graphs; ids must fit u32). Returns rows written."""
    n = 0
    with open(path, "wb") as fh:
        for batch in edges.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            if len(s) and not (
                0 <= int(s.min()) and int(s.max()) < 2**32
                and 0 <= int(d.min()) and int(d.max()) < 2**32
            ):
                raise ValueError(
                    "edge ids outside [0, 2^32): the reference u32 format "
                    "cannot represent them (negative or oversized vid)"
                )
            if weighted:
                w = batch["weight"].to_numpy(zero_copy_only=False)
                rec = np.empty(len(s), dtype=np.dtype([("s", "<u4"), ("d", "<u4"), ("w", "<f4")]))
                rec["s"], rec["d"], rec["w"] = s, d, w
            else:
                rec = np.empty((len(s), 2), dtype="<u4")
                rec[:, 0], rec[:, 1] = s, d
            fh.write(rec.tobytes())
            n += len(s)
    return n
