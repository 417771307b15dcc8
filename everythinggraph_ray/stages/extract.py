"""Ray Data extraction stages: pages → (url, text, out-links) → edge table.

The distributed front end the reference lacks (SURVEY.md §2.a S4). All
stages are ``map_batches`` over Arrow batches; the per-row extraction calls
exactly the serial reference functions in :mod:`everythinggraph_ray.html`,
which is what makes the distributed text byte-identical to the serial
oracle (the north-rule per-row invariant).

The wide ``html`` binary column is projected away in the FIRST stage —
everything downstream moves only urls/links (SURVEY.md §7 hard part (e)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from everythinggraph_ray.hashing import urls_to_vids
from everythinggraph_ray.html import extract_links, extract_text


class ExtractPages:
    """Actor-pool stage: pages batch → (url, warc_ts, text, links:list<str>).

    A callable class so the (already module-level-compiled) regex machinery
    and any future parser state lives once per actor, not once per batch.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        texts = [extract_text(h) for h in htmls]
        links = [extract_links(h, u) for h, u in zip(htmls, urls)]
        return pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "lang": batch["lang"],
                "text": pa.array(texts, pa.string()),
                "links": pa.array(links, pa.list_(pa.string())),
            }
        )


def extract_pages(
    pages: ray.data.Dataset, *, batch_size: int = 1024, concurrency: int | None = None
) -> ray.data.Dataset:
    """pages → extracted dataset, html dropped. Small batches: html rows are
    wide (binary payload), so batch_size stays modest to bound heap use."""
    if concurrency is not None:
        # the CLASS form gives a real actor pool (parser state constructed
        # once per actor, not pickled per task)
        return pages.map_batches(
            ExtractPages,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return pages.map_batches(
        ExtractPages(), batch_format="pyarrow", batch_size=batch_size
    )


def dedup_keep_latest(ds: ray.data.Dataset, key: str = "url", ts: str = "warc_ts") -> ray.data.Dataset:
    """Keep the row with the max ``ts`` per ``key`` (crawl snapshots: the
    latest capture of a url wins).

    Bucketed grouped-reduce (stages/agg.py): rows co-locate by hash of the
    key and each bucket resolves ALL its keys with one vectorized pandas
    pass — never a per-key Python call. The shuffle on the key is
    unavoidable in general; upstream stages have already dropped the html
    payload, so only (url, ts, text, links) rows move.
    """
    from hashlib import blake2b

    import numpy as np

    from everythinggraph_ray.stages.agg import bucketed_reduce, string_buckets

    def bucket_of(batch: pa.Table) -> np.ndarray:
        # vectorized C siphash (co-location only — any deterministic
        # dispersal works); was a per-row blake2b loop on the flagship path
        return string_buckets(batch[key])

    def latest(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        # deterministic winner per key: max ts; ties (same key+ts) broken
        # by EVERY remaining column — row ORDER after a shuffle is not
        # deterministic, so the tiebreak must be content-based, never
        # positional (idxmax keeps the first occurrence, tail(1) the last;
        # either silently depends on arrival order). Unorderable columns
        # (lists, mixed objects) participate via a deterministic content
        # hash so two rows differing ONLY in, e.g., their links list still
        # resolve identically across runs.
        tiebreak: list[str] = []
        hashed_cols: list[str] = []
        for c in df.columns:
            if c in (key, ts):
                continue
            s = df[c]
            # direct sort only for a SINGLE uniform scalar type: a column
            # mixing e.g. str and int passes an isinstance-any check but
            # pandas sort_values raises TypeError on the cross-type
            # comparison (round-2 ADVICE) — mixed columns take the hash path
            kinds = {type(x) for x in s if x is not None} if s.dtype == object else set()
            if s.dtype != object or (
                len(kinds) <= 1 and kinds <= {str, bytes, int, float}
            ):
                tiebreak.append(c)
            else:
                hc = f"__tb_{c}"
                df[hc] = s.map(
                    lambda x: int.from_bytes(
                        blake2b(repr(x).encode(), digest_size=8).digest(), "little"
                    )
                )
                tiebreak.append(hc)
                hashed_cols.append(hc)
        df = df.sort_values([key, ts] + tiebreak, kind="stable")
        out = df.groupby(key, as_index=False).tail(1)
        if hashed_cols:
            out = out.drop(columns=hashed_cols)
        return pa.Table.from_pandas(out, preserve_index=False, schema=group.schema)

    return bucketed_reduce(ds, bucket_of, latest)


def explode_links(extracted: ray.data.Dataset) -> ray.data.Dataset:
    """(url, links:list<str>) → (src_url, dst_url), one row per out-link.
    Duplicate links kept (reference treats duplicate edges as multiplicity)."""

    def explode(batch: pa.Table) -> pa.Table:
        links = batch["links"]
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        flat = pc.list_flatten(links)
        # null links lists → length 0 (fill BEFORE the int cast: casting NaN
        # to int64 is undefined and list_flatten skips null lists entirely)
        counts = (
            pc.fill_null(pc.list_value_length(links), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        src = pc.take(batch["url"], pa.array(np.repeat(np.arange(len(counts)), counts)))
        return pa.table({"src_url": src, "dst_url": flat})

    return extracted.select_columns(["url", "links"]).map_batches(
        explode, batch_format="pyarrow"
    )


def urls_to_edge_ids(url_edges: ray.data.Dataset) -> ray.data.Dataset:
    """(src_url, dst_url) → (src:int64, dst:int64) via the stable 63-bit
    blake2b vid (hashing.py). Stateless, embarrassingly parallel."""

    def to_ids(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.array(urls_to_vids(batch["src_url"]), pa.int64()),
                "dst": pa.array(urls_to_vids(batch["dst_url"]), pa.int64()),
            }
        )

    return url_edges.map_batches(to_ids, batch_format="pyarrow")


def pages_to_edges(
    pages: ray.data.Dataset, *, keep_latest: bool = True, batch_size: int = 1024
) -> ray.data.Dataset:
    """Full front end: pages → (src, dst) int64 edge table."""
    ex = extract_pages(pages, batch_size=batch_size)
    if keep_latest:
        ex = dedup_keep_latest(ex)
    return urls_to_edge_ids(explode_links(ex))


def pages_to_text(pages: ray.data.Dataset, *, keep_latest: bool = True) -> ray.data.Dataset:
    """pages → (url, text): the byte-identity surface checked against the
    serial extractor."""
    ex = extract_pages(pages).select_columns(["url", "warc_ts", "text"])
    if keep_latest:
        ex = dedup_keep_latest(ex)
    return ex.select_columns(["url", "text"])
