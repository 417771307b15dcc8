"""Session-12 twenty-eighth wave (lang-script consistency):
serial-replay exactness on adversarial fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from everythinggraph_ray.pipelines.analytics_extra44 import q_docs_lang_script_check


def _to_df(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_lang_script_check_flags_mislabels(tmp_path):
    rows = [
        ("zh", "中文内容完全正常的一段话"),        # consistent zh
        ("zh", "this is actually english text"),   # mislabeled zh -> flagged
        ("en", "plain english words here"),        # consistent en
        ("en", "中文中文中文中文中文"),            # mislabeled en -> flagged
        ("en", "mixed 中文 but mostly english words in here"),  # <50% cjk ok
        ("fr", ""),                                # empty -> never flagged
    ]
    docs = pd.DataFrame(rows, columns=["lang", "text"])
    docs["doc_id"] = np.arange(len(rows), dtype=np.int64)
    docs["source"] = "s0"
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")

    got = _to_df(q_docs_lang_script_check(str(tmp_path))).set_index("lang")
    assert got.loc["zh", "n_docs"] == 2 and got.loc["zh", "n_inconsistent"] == 1
    assert got.loc["en", "n_docs"] == 3 and got.loc["en", "n_inconsistent"] == 1
    assert got.loc["fr", "n_docs"] == 1 and got.loc["fr", "n_inconsistent"] == 0
