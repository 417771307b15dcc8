"""Datapipe CLI smoke tests: the ``python -m everythinggraph_ray.datapipe.cli``
surface routes each op to the library function and writes parquet the
user can read back (the reference's getopt-driver parity for the corpus
layer)."""

import json

import pandas as pd
import pytest
import ray.data

from everythinggraph_ray.datapipe.cli import main

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"
EMB = f"{SF}/embeddings.parquet"


def _run(argv, capsys):
    rc = main(argv)
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(line)


def test_cli_pii_matches_library(tmp_path, capsys):
    out = str(tmp_path / "pii")
    info = _run(["pii-redact", "--docs", DOCS, "--out", out], capsys)
    assert info["rows"] == 500
    back = ray.data.read_parquet(out).to_pandas().sort_values("doc_id")
    from everythinggraph_ray.datapipe.curate import pii_redact

    lib = (
        pii_redact(ray.data.read_parquet(DOCS))
        .to_pandas()
        .sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True), lib.reset_index(drop=True)
    )


def test_cli_knn_and_sharded_sink(tmp_path, capsys):
    out = str(tmp_path / "knn")
    info = _run(
        ["knn", "--embeddings", EMB, "--num-queries", "4", "--k", "3", "--out", out],
        capsys,
    )
    assert info["rows"] == 12  # 4 queries × k=3
    back = ray.data.read_parquet(out).to_pandas()
    assert set(back.columns) == {"query_id", "neighbor_id", "rank"}

    out2 = str(tmp_path / "dedup")
    info2 = _run(
        ["exact-dedup", "--docs", DOCS, "--out", out2, "--shards", "4"], capsys
    )
    assert info2["rows"] == 500
    from everythinggraph_ray.datapipe.sink import completed_shards, read_sharded

    assert completed_shards(out2) == {0, 1, 2, 3}
    assert read_sharded(out2).count() == 500
    # resume: a second run skips every completed shard
    info3 = _run(
        ["exact-dedup", "--docs", DOCS, "--out", out2, "--shards", "4"], capsys
    )
    assert info3["rows"] == 0


def test_cli_arg_errors(tmp_path, capsys):
    assert main(["decontaminate", "--docs", DOCS, "--out", str(tmp_path)]) == 2
    assert main(["knn", "--docs", DOCS, "--out", str(tmp_path)]) == 2
    with pytest.raises(SystemExit):
        main(["not-an-op", "--docs", DOCS, "--out", str(tmp_path)])


def test_cli_tfidf_and_inverted_index(tmp_path, capsys):
    out = str(tmp_path / "tfidf")
    info = _run(["tfidf", "--docs", DOCS, "--out", out, "--k", "2"], capsys)
    assert info["rows"] == 1000  # 500 docs x 2 terms
    back = ray.data.read_parquet(out).to_pandas()
    assert set(back.columns) == {"doc_id", "token", "score", "rnk"}
    assert back["rnk"].max() == 2

    out2 = str(tmp_path / "inv")
    info2 = _run(["inverted-index", "--docs", DOCS, "--out", out2, "--min-df", "3"], capsys)
    back2 = ray.data.read_parquet(out2).to_pandas()
    assert info2["rows"] == len(back2) and (back2["df"] >= 3).all()


def test_cli_vocab_hll(tmp_path, capsys):
    out = str(tmp_path / "hll")
    info = _run(["vocab-hll", "--docs", DOCS, "--out", out], capsys)
    assert info["rows"] == 1
    back = ray.data.read_parquet(out).to_pandas()
    assert back["estimate"].iloc[0] > 0 and back["p"].iloc[0] == 12


def test_cli_kmeans(tmp_path, capsys):
    out = str(tmp_path / "km")
    info = _run(["kmeans", "--embeddings", EMB, "--out", out, "--n-centroids", "4"], capsys)
    assert info["rows"] == 500
    back = ray.data.read_parquet(out).to_pandas()
    assert set(back.columns) == {"vec_id", "cluster"} and back["cluster"].nunique() <= 4


def test_cli_bigram_lm(tmp_path, capsys):
    out = str(tmp_path / "blm")
    info = _run(["bigram-lm", "--docs", DOCS, "--out", out], capsys)
    assert info["rows"] == 500
    back = ray.data.read_parquet(out).to_pandas().sort_values("doc_id")
    assert set(back.columns) == {"doc_id", "n_bigrams", "logprob"}
    assert (back["logprob"] <= 0).all() and (back["n_bigrams"] >= 0).all()


def test_cli_rank_matches_pandas_window(tmp_path, capsys):
    out = str(tmp_path / "rank")
    info = _run(
        ["rank", "--docs", DOCS, "--out", out, "--ntile", "4"], capsys
    )
    assert info["rows"] == 500
    back = (
        ray.data.read_parquet(out)
        .to_pandas()
        .sort_values(["lang", "rn"])
        .reset_index(drop=True)
    )
    import numpy as np

    df = pd.read_parquet(DOCS).sort_values(
        ["lang", "n_chars", "doc_id"], ascending=[True, False, True], kind="stable"
    )
    df["rn"] = df.groupby("lang", sort=False).cumcount() + 1
    exp = df.sort_values(["lang", "rn"]).reset_index(drop=True)
    assert back["doc_id"].tolist() == exp["doc_id"].tolist()
    assert back["rn"].tolist() == exp["rn"].tolist()
    # NTILE sizes: within each lang the 4 tiles differ by at most one row
    sizes = back.groupby(["lang", "tile"]).size()
    for lang, grp in sizes.groupby(level=0):
        assert grp.max() - grp.min() <= 1


def test_cli_jaccard_join_bpe_sq8(tmp_path, capsys):
    out = str(tmp_path / "jj")
    info = _run(
        ["jaccard-join", "--docs", DOCS, "--out", out, "--threshold-milli", "900"],
        capsys,
    )
    assert info["rows"] > 0
    back = ray.data.read_parquet(out).to_pandas()
    assert set(back.columns) == {"a", "b", "jac_milli"}
    assert (back["jac_milli"] >= 900).all()

    out2 = str(tmp_path / "bpe")
    info2 = _run(["bpe-train", "--docs", DOCS, "--out", out2, "--n-merges", "4"], capsys)
    assert info2["rows"] == 4
    merges = ray.data.read_parquet(out2).to_pandas()
    assert merges["rank"].tolist() == [0, 1, 2, 3]

    out3 = str(tmp_path / "sq8")
    info3 = _run(["sq8", "--embeddings", EMB, "--out", out3], capsys)
    assert info3["rows"] == 500
    codes = ray.data.read_parquet(out3).to_pandas()
    assert set(codes.columns) == {"vec_id", "code_md5", "code_sum"}


def test_cli_session6_ops(tmp_path, capsys):
    out1 = str(tmp_path / "pq")
    info1 = _run(["pq-codes", "--embeddings", EMB, "--out", out1], capsys)
    assert info1["rows"] == 500
    back = ray.data.read_parquet(out1).to_pandas()
    assert set(back.columns) == {"vec_id", "code_md5", "code_sum"}

    out2 = str(tmp_path / "knnpq")
    info2 = _run(
        ["knn-pq", "--embeddings", EMB, "--out", out2, "--num-queries", "3", "--k", "5"],
        capsys,
    )
    assert info2["rows"] == 15

    out3 = str(tmp_path / "ws")
    info3 = _run(["weighted-sample", "--docs", DOCS, "--out", out3, "--k", "20"], capsys)
    assert info3["rows"] == 20

    out4 = str(tmp_path / "snm")
    info4 = _run(["snm", "--docs", DOCS, "--out", out4, "--threshold-milli", "700"], capsys)
    assert info4["rows"] >= 0

    out5 = str(tmp_path / "gram")
    info5 = _run(["gram", "--embeddings", EMB, "--out", out5], capsys)
    d = len(ray.data.read_parquet(EMB).take(1)[0]["embedding"])
    assert info5["rows"] == d * (d + 1) // 2 + d


def test_cli_bm25(tmp_path, capsys):
    out = str(tmp_path / "bm25")
    info = _run(
        ["bm25", "--docs", DOCS, "--out", out, "--terms", "hash,join,stream", "--k", "5"],
        capsys,
    )
    assert info["rows"] == 5
    back = ray.data.read_parquet(out).to_pandas().sort_values("rank")
    assert back["rank"].tolist() == [1, 2, 3, 4, 5]
    assert (back["score"] > 0).all()
    # missing --terms is a usage error
    assert main(["bm25", "--docs", DOCS, "--out", out]) == 2
