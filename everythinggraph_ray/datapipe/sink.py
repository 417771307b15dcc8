"""Resumable sharded parquet sink — the training-data output contract.

``write_sharded`` lands a Dataset as one directory per deterministic
md5 shard (``shard=K/part-000.parquet`` + ``manifest.json`` +
``_SUCCESS`` written LAST), so a failed or pre-empted run re-invoked on
the same input SKIPS every shard already marked complete and rewrites
only the missing ones — the never-one-giant-file / restart-cheap shape
the 100 TB deployment needs. All paths go through the
``pyarrow.fs`` seam (state/fs.py), so the same call lands on local
disk, NFS or s3://.

Shard rule is ``shard_assign``'s (md5(str(id))[:8] % S): deterministic,
RNG-free, independent of input partitioning — a resumed run or a
different cluster size produces byte-identical shard membership.

Scale shape: one pass — rows are shard-tagged in ``map_batches``,
co-located by shard via the bucketed co-group, and each shard's ONE
owning task writes its files then its marker (atomic-enough on object
stores: marker-less dirs are treated as absent by readers and
idempotently rewritten). Contract: one shard fits a worker — that is
what ``num_shards`` is for.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from everythinggraph_ray.stages.agg import bucketed_reduce, mix64
from everythinggraph_ray.state.fs import (
    fs_exists,
    fs_listdir,
    fs_mkdirs,
    read_json,
    resolve_fs,
    write_json,
    write_text,
)


def _shard_of(ids: list, num_shards: int) -> np.ndarray:
    return np.fromiter(
        (
            int(hashlib.md5(str(i).encode("utf-8")).hexdigest()[:8], 16) % num_shards
            for i in ids
        ),
        np.int64,
        count=len(ids),
    )


def completed_shards(out_dir: str, *, filesystem=None) -> set[int]:
    """Shard ids under ``out_dir`` already marked ``_SUCCESS``."""
    fs = resolve_fs(filesystem)
    done = set()
    for name in fs_listdir(fs, out_dir):
        if name.startswith("shard=") and fs_exists(fs, f"{out_dir}/{name}/_SUCCESS"):
            done.add(int(name.split("=", 1)[1]))
    return done


def write_sharded(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    num_shards: int = 16,
    filesystem=None,
    resume: bool = True,
    num_buckets: int = 64,
) -> dict[int, int]:
    """Write ``ds`` as ``out_dir/shard=K/`` parquet dirs; returns
    {shard: rows_written_this_run} (completed shards skipped under
    ``resume`` report no entry). Readers must treat ``_SUCCESS``-less
    dirs as absent (``read_sharded``)."""
    S = int(num_shards)
    fs = resolve_fs(filesystem)
    fs_mkdirs(fs, out_dir)
    done = completed_shards(out_dir, filesystem=fs) if resume else set()
    done_arr = np.zeros(S, bool)
    for s in done:
        done_arr[s] = True

    def tag(batch: pa.Table) -> pa.Table:
        sh = _shard_of(batch[id_col].to_pylist(), S)
        keep = ~done_arr[sh]
        return batch.append_column("__shard", pa.array(sh, pa.int64())).filter(
            pa.array(keep, pa.bool_())
        )

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["__shard"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def write_group(g: pa.Table) -> pa.Table:
        # a bucket may hold several whole shards; each is written + marked
        # independently so retries re-do complete shards only
        sh = g["__shard"].to_numpy(zero_copy_only=False)
        out_s, out_n = [], []
        for s in np.unique(sh):
            part = g.filter(pa.array(sh == s, pa.bool_())).drop_columns(["__shard"])
            sdir = f"{out_dir}/shard={int(s)}"
            fs_mkdirs(fs, sdir)
            fname = "part-000.parquet"
            with fs.open_output_stream(f"{sdir}/{fname}") as f:
                pq.write_table(part, f)
            write_json(fs, f"{sdir}/manifest.json", {"files": [fname], "rows": part.num_rows})
            write_text(fs, f"{sdir}/_SUCCESS", "")  # marker LAST
            out_s.append(int(s))
            out_n.append(part.num_rows)
        return pa.table(
            {"shard": pa.array(out_s, pa.int64()), "rows": pa.array(out_n, pa.int64())}
        )

    res = bucketed_reduce(
        ds.map_batches(tag, batch_format="pyarrow"),
        bucket_of,
        write_group,
        num_buckets=num_buckets,
    ).to_pandas()
    if res.empty:  # full resume / empty input: no groups reach the reducer
        return {}
    return dict(zip(res["shard"].astype(int), res["rows"].astype(int)))


def read_sharded(
    out_dir: str, *, filesystem=None, shards: list[int] | None = None
) -> ray.data.Dataset:
    """Read back a ``write_sharded`` directory — ONLY ``_SUCCESS``-marked
    shards, via their manifests (marker-less or orphan files are
    invisible, the build-spill convention)."""
    fs = resolve_fs(filesystem)
    done = sorted(completed_shards(out_dir, filesystem=fs))
    if shards is not None:
        done = [s for s in done if s in set(shards)]
    paths = []
    for s in done:
        sdir = f"{out_dir}/shard={s}"
        for fname in read_json(fs, f"{sdir}/manifest.json")["files"]:
            paths.append(f"{sdir}/{fname}")
    if not paths:
        raise FileNotFoundError(f"no completed shards under {out_dir}")
    # hive-style dir names make read_parquet infer a 'shard' partition
    # column; select back down to the written schema
    with fs.open_input_file(paths[0]) as f:
        cols = pq.read_schema(f).names
    return ray.data.read_parquet(paths, filesystem=fs).select_columns(cols)


def upsert_sharded(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    ts_col: str = "ts",
    num_shards: int = 16,
    filesystem=None,
    num_buckets: int = 64,
) -> dict[int, int]:
    """Keyed UPSERT into a ``write_sharded`` store — the incremental
    ingestion op: merge ``ds`` into the existing shards keeping, per id,
    the row with the greatest (``ts_col``, md5-of-row) — the
    dedup_keep_latest rule, so re-delivered and out-of-order batches
    converge to the same state.  Returns {shard: rows_after_merge} for
    the shards this run touched.

    Only AFFECTED shards are read+rewritten (one owning task each);
    untouched shards' files are not opened.  Rewrites are
    object-store-safe: the new generation file lands first
    (``part-NNN.parquet``, NNN bumped), then the manifest flips to list
    ONLY the new file (readers go through the manifest, so they see old
    or new, never a mix), then orphaned generations are deleted —
    the graph/build.py _publish_manifest convention, no renames."""
    S = int(num_shards)
    fs = resolve_fs(filesystem)
    fs_mkdirs(fs, out_dir)

    def tag(batch: pa.Table) -> pa.Table:
        sh = _shard_of(batch[id_col].to_pylist(), S)
        return batch.append_column("__shard", pa.array(sh, pa.int64()))

    def bucket_of(batch: pa.Table) -> np.ndarray:
        return mix64(batch["__shard"].to_numpy(zero_copy_only=False)).astype(np.int64) & 0x7FFFFFFF

    def keep_latest(df):
        import pandas as pd

        cols = [c for c in df.columns if c != "__shard"]
        other = [c for c in cols if c != id_col]
        key = df[other].astype(str).agg("|".join, axis=1) if other else ""
        df = df.assign(
            __h=[hashlib.md5(s.encode()).hexdigest() for s in key]
            if other
            else ""
        )
        df = df.sort_values([id_col, ts_col, "__h"], kind="mergesort")
        return df.drop_duplicates(id_col, keep="last").drop(columns="__h")[cols]

    def merge_group(g: pa.Table) -> pa.Table:
        sh = g["__shard"].to_numpy(zero_copy_only=False)
        out_s, out_n = [], []
        for s in np.unique(sh):
            new_part = g.filter(pa.array(sh == s, pa.bool_()))
            sdir = f"{out_dir}/shard={int(s)}"
            fs_mkdirs(fs, sdir)
            old_files: list[str] = []
            tables = [new_part.drop_columns(["__shard"])]
            if fs_exists(fs, f"{sdir}/_SUCCESS"):
                old_files = read_json(fs, f"{sdir}/manifest.json")["files"]
                for fname in old_files:
                    with fs.open_input_file(f"{sdir}/{fname}") as f:
                        tables.append(pq.read_table(f))
            merged_df = keep_latest(
                pa.concat_tables(tables, promote_options="default").to_pandas()
            )
            merged = pa.Table.from_pandas(merged_df, preserve_index=False)
            gen = 0
            for fname in old_files:
                try:
                    gen = max(gen, int(fname.split("-")[1].split(".")[0]) + 1)
                except (IndexError, ValueError):
                    gen = max(gen, 1)
            fname = f"part-{gen:03d}.parquet"
            with fs.open_output_stream(f"{sdir}/{fname}") as f:
                pq.write_table(merged, f)
            write_json(fs, f"{sdir}/manifest.json", {"files": [fname], "rows": merged.num_rows})
            write_text(fs, f"{sdir}/_SUCCESS", "")
            for old in old_files:  # orphan cleanup AFTER the manifest flip
                if old != fname:
                    try:
                        fs.delete_file(f"{sdir}/{old}")
                    except OSError:
                        pass
            out_s.append(int(s))
            out_n.append(merged.num_rows)
        return pa.table(
            {"shard": pa.array(out_s, pa.int64()), "rows": pa.array(out_n, pa.int64())}
        )

    res = bucketed_reduce(
        ds.map_batches(tag, batch_format="pyarrow"),
        bucket_of,
        merge_group,
        num_buckets=num_buckets,
    ).to_pandas()
    if res.empty:
        return {}
    return dict(zip(res["shard"].astype(int), res["rows"].astype(int)))
