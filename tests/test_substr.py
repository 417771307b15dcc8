"""duplicate_spans (datapipe/substr.py) vs a brute-force serial oracle."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

import ray.data

from everythinggraph_ray.datapipe.substr import duplicate_spans, window_rows

WORD = re.compile(r"[a-z0-9]+")


def _serial(docs: list[tuple[int, str]], n: int, min_docs: int = 2) -> pd.DataFrame:
    """Brute-force: explicit gram strings, explicit position sets."""
    grams: dict[str, set[int]] = {}
    toks = {d: WORD.findall((t or "").lower()) for d, t in docs}
    wins = {d: [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)] for d, ts in toks.items()}
    for d, ws in wins.items():
        for g in ws:
            grams.setdefault(g, set()).add(d)
    rows = []
    for d, ws in wins.items():
        if not ws:
            continue
        dup_pos = [i for i, g in enumerate(ws) if len(grams[g]) >= min_docs]
        covered = set()
        for i in dup_pos:
            covered.update(range(i, i + n))
        nt = len(toks[d])
        rows.append(
            {
                "doc_id": d,
                "n_tokens": nt,
                "n_windows": len(ws),
                "dup_windows": len(dup_pos),
                "covered_tokens": len(covered),
                "dup_frac": len(covered) / nt,
            }
        )
    return (
        pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)
        if rows
        else pd.DataFrame(
            columns=["doc_id", "n_tokens", "n_windows", "dup_windows", "covered_tokens", "dup_frac"]
        )
    )


def _run(docs: list[tuple[int, str]], n: int, **kw) -> pd.DataFrame:
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]})
    )
    out = duplicate_spans(ds, n=n, **kw).to_pandas()
    if out.empty:  # 0-row Datasets lose their schema in to_pandas
        return out
    return out.sort_values("doc_id").reset_index(drop=True)


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "a different opening then the quick brown fox jumps over the lazy dog closes it"),
    (3, "completely unrelated text with no shared runs of any meaningful length here at all"),
    (4, "short doc"),  # < n tokens: excluded
    (5, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 1
]


def test_matches_serial_oracle():
    for n in (3, 5, 8):
        got = _run(CORPUS, n)
        want = _serial(CORPUS, n)
        pd.testing.assert_frame_equal(
            got.astype({"dup_frac": float}), want.astype(got.dtypes.to_dict()), check_like=True
        )


def test_within_doc_repeats_do_not_count():
    # doc 10 repeats its own trigram; no OTHER doc shares it
    docs = [(10, "x y z x y z x y z"), (11, "totally different words entirely")]
    out = _run(docs, 3)
    row = out[out.doc_id == 10].iloc[0]
    assert row.dup_windows == 0 and row.covered_tokens == 0


def test_coverage_is_interval_union_not_sum():
    # docs 1 and 2 share a long run: overlapping dup windows must not
    # double-count covered tokens
    shared = " ".join(f"w{i}" for i in range(12))
    docs = [(1, shared), (2, "prefix " + shared + " suffix")]
    out = _run(docs, 4)
    r1 = out[out.doc_id == 1].iloc[0]
    assert r1.n_tokens == 12 and r1.dup_windows == 9
    assert r1.covered_tokens == 12  # union, not 9*4

    want = _serial(docs, 4)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want.astype(out.dtypes.to_dict()), check_like=True
    )


def test_short_docs_excluded_and_empty_input():
    out = _run([(1, "only three tokens"), (2, "")], 8)
    assert len(out) == 0


def test_min_docs_threshold():
    shared = "alpha beta gamma delta epsilon zeta"
    docs = [(1, shared), (2, shared), (3, shared)]
    all3 = _run(docs, 3, min_docs=3)
    assert (all3.dup_windows == all3.n_windows).all()
    four = _run(docs, 3, min_docs=4)
    assert (four.dup_windows == 0).all()


def test_gram_hash_md5_parity():
    duckdb = pytest.importorskip("duckdb")
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["aa bb cc dd"]}))
    got = window_rows(ds, n=2).to_pandas().sort_values("pos")
    con = duckdb.connect()
    want = con.execute(
        "SELECT CAST(CAST(md5_number_lower(g) AS HUGEINT) // 8 AS BIGINT) AS h "
        "FROM (VALUES ('aa_bb'), ('bb_cc'), ('cc_dd')) v(g)"
    ).fetchdf()
    assert list(got["h"]) == list(want["h"])
    # and the recipe really is md5[8:16] little-endian >> 3
    h0 = int.from_bytes(hashlib.md5(b"aa_bb").digest()[8:16], "little") >> 3
    assert got["h"].iloc[0] == h0


def test_partition_invariance():
    # same answer regardless of how input blocks split
    docs = CORPUS * 3
    docs = [(d * 100 + i, t) for i, (d, t) in enumerate(docs)]
    df = pd.DataFrame({"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]})
    a = (
        duplicate_spans(ray.data.from_pandas(df), n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        duplicate_spans(ray.data.from_pandas(df).repartition(7), n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    want = _serial(docs, 5)
    pd.testing.assert_frame_equal(a, want.astype(a.dtypes.to_dict()), check_like=True)
