"""Analytics batch (session 12, twenty-eighth wave): language-tag vs
script consistency.

Distributed shape:
- ``docs_lang_script_check``: label-noise detection for curation — a
  doc is INCONSISTENT when its lang tag disagrees with its dominant
  script (zh tagged but CJK < 10% of non-space codepoints, or a latin
  lang tagged but CJK > 50%). One vectorized codepoint pass per batch
  (the census device), per-lang (n_docs, n_inconsistent) partials
  fold. The validation rule that catches mislabeled corpus slices
  before they poison a language-filtered training mix.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

ANALYTICS44_QUERIES: dict = {}
ANALYTICS44_ORACLES: dict = {}

CJK_MIN_PCT_FOR_ZH = 10  # zh doc must be >= 10% CJK of non-space chars
CJK_MAX_PCT_FOR_LATIN = 50  # latin-lang doc must be <= 50% CJK


def q_docs_lang_script_check(sf_dir):
    """(lang, n_docs, n_inconsistent): script-vs-tag disagreement
    counts per language."""
    from everythinggraph_ray.pipelines.queries import _typed_collect

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        langs, bad = [], []
        for lg, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            cp = np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32)
            space = (cp == 32) | (cp == 9) | (cp == 10) | (cp == 13)
            n = int((~space).sum())
            cjk = int(((cp >= 0x4E00) & (cp <= 0x9FFF)).sum())
            if n == 0:
                inconsistent = 0
            elif lg == "zh":
                inconsistent = int(cjk * 100 < CJK_MIN_PCT_FOR_ZH * n)
            else:
                inconsistent = int(cjk * 100 > CJK_MAX_PCT_FOR_LATIN * n)
            langs.append(lg)
            bad.append(inconsistent)
        df = pd.DataFrame({"lang": langs, "inc": bad})
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("inc", "size"), n_inconsistent=("inc", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (
        docs.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("lang", as_index=False)[["n_docs", "n_inconsistent"]]
        .sum()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    df[["n_docs", "n_inconsistent"]] = df[["n_docs", "n_inconsistent"]].astype("int64")
    return _typed_collect(
        ray.data.from_pandas(df),
        {"lang": "object", "n_docs": "int64", "n_inconsistent": "int64"},
    )


ANALYTICS44_QUERIES["docs_lang_script_check"] = q_docs_lang_script_check

ANALYTICS44_ORACLES["docs_lang_script_check"] = (
    "WITH c AS (SELECT lang, "
    "length(regexp_replace(text, '[ \\t\\n\\r]', '', 'g')) AS n, "
    "length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk FROM documents), "
    "f AS (SELECT lang, CASE WHEN n = 0 THEN 0 "
    f"WHEN lang = 'zh' THEN CASE WHEN cjk * 100 < {CJK_MIN_PCT_FOR_ZH} * n "
    "THEN 1 ELSE 0 END "
    f"ELSE CASE WHEN cjk * 100 > {CJK_MAX_PCT_FOR_LATIN} * n THEN 1 ELSE 0 END "
    "END AS inc FROM c) "
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(inc) AS BIGINT) AS n_inconsistent FROM f GROUP BY 1"
)
