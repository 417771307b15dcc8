"""CLI for the corpus/data-pipeline layer — the ``ray job submit``
surface for dedup, curation, text analysis and ANN:

    python -m everythinggraph_ray.datapipe.cli minhash-dedup \
        --docs /data/documents --out /data/clusters --threshold 0.8

    python -m everythinggraph_ray.datapipe.cli decontaminate \
        --docs /data/corpus --bench /data/benchmarks --out /data/hits

    python -m everythinggraph_ray.datapipe.cli knn-ivf \
        --embeddings /data/emb --num-queries 80 --k 10 --out /data/nn

Mirrors the graph CLI (everythinggraph_ray/cli.py), which replaces the
reference's per-binary getopt drivers (random.c:50-116); the reference
has no corpus layer, so this surface is the north-rule training-data
addition. Output is parquet under ``--out``; pass ``--shards N`` to
write through the resumable sharded sink (datapipe/sink.py) instead of
a flat ``write_parquet``.

Only this entry point owns the Ray session (guarded init, shutdown on
exit) — the library functions it calls never call ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys

OPS = [
    "stats",
    "quality",
    "langid",
    "fingerprint",
    "top-tokens",
    "tfidf",
    "bigram-lm",
    "inverted-index",
    "vocab-hll",
    "exact-dedup",
    "minhash-dedup",
    "simhash",
    "simhash-candidates",
    "pii-redact",
    "repetition",
    "decontaminate",
    "sample",
    "mix-weights",
    "shard-assign",
    "pack",
    "chunk",
    "kmeans",
    "knn",
    "knn-ivf",
    "knn-lsh",
    "emb-near-dup",
    "pca",
    "logreg",
    "dup-spans",
    "cms-heavy",
    "upsert",
    "rank",
    "dd-quantiles",
    "jaccard-join",
    "bpe-train",
    "sq8",
    "pq-codes",
    "knn-pq",
    "standardize",
    "gram",
    "snm",
    "containment",
    "weighted-sample",
    "bm25",
    "normalize",
    "lev-pairs",
]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="everythinggraph_ray.datapipe")
    p.add_argument("op", choices=OPS)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--docs", help="documents parquet dir (doc_id, text, lang, source, ...)")
    src.add_argument("--embeddings", help="embeddings parquet dir (vec_id, embedding)")
    p.add_argument("--out", required=True, help="output directory (parquet)")
    p.add_argument("--bench", help="benchmark parquet dir (decontaminate)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default=None, help="default: doc_id (docs) / vec_id (embeddings)")
    p.add_argument("--k", type=int, default=10, help="top-k (knn*, top-tokens)")
    p.add_argument("--threshold", type=float, default=0.8, help="jaccard/cosine threshold")
    p.add_argument("--num-perm", type=int, default=64)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--ngram", type=int, default=5, help="decontaminate n-gram size")
    p.add_argument("--min-df", type=int, default=1, help="inverted-index: prune tokens with df < N")
    p.add_argument("--hll-p", type=int, default=12, help="vocab-hll: 2^p registers")
    p.add_argument("--rate", type=float, default=0.1, help="sample keep rate (all strata)")
    p.add_argument("--strata-col", default="lang")
    p.add_argument("--bin-tokens", type=int, default=4096, help="pack bin capacity")
    p.add_argument("--queries", default=None, help="comma-separated query vec_ids (knn*)")
    p.add_argument("--num-queries", type=int, default=16, help="knn*: use the N smallest vec_ids")
    p.add_argument("--n-centroids", type=int, default=16)
    p.add_argument("--n-probe", type=int, default=4)
    p.add_argument("--n-planes", type=int, default=8)
    p.add_argument("--shards", type=int, default=0, help=">0: resumable sharded sink with N shards")
    p.add_argument("--keep-text", action="store_true", help="pii-redact: keep the redacted text column")
    p.add_argument("--ts-col", default="ts", help="upsert: keep-latest timestamp column")
    p.add_argument("--min-count", type=int, default=100, help="cms-heavy: report tokens with estimate >= N")
    p.add_argument("--rank-by", default="n_chars", help="rank: integer order column (desc)")
    p.add_argument("--group-col", default="lang", help="rank/dd-quantiles: group column ('' = global)")
    p.add_argument("--ntile", type=int, default=0, help="rank: also emit NTILE(N) when > 0")
    p.add_argument("--value-col", default="value", help="dd-quantiles: float value column")
    p.add_argument("--quantiles", default="0.5,0.95,0.99", help="dd-quantiles: comma list in (0,1]")
    p.add_argument("--alpha", type=float, default=0.01, help="dd-quantiles: relative error bound")
    p.add_argument("--threshold-milli", type=int, default=500, help="jaccard-join: integer tau*1000")
    p.add_argument("--n-merges", type=int, default=8, help="bpe-train: merges to learn")
    p.add_argument("--m-sub", type=int, default=4, help="pq: subspaces")
    p.add_argument("--n-codes", type=int, default=16, help="pq: codes per subspace")
    p.add_argument("--window", type=int, default=5, help="snm: comparison window")
    p.add_argument("--terms", default="", help="bm25: comma-separated query terms")
    args = p.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    try:
        return _run(args)
    finally:
        if owns:
            ray.shutdown()


def _run(args) -> int:
    import ray.data

    from everythinggraph_ray.datapipe import chunk, curate, dedup, knn, pack, text

    if args.op == "kmeans":
        if not args.embeddings:
            print("error: kmeans needs --embeddings", file=sys.stderr)
            return 2
        from everythinggraph_ray.datapipe.cluster import emb_kmeans

        emb = ray.data.read_parquet(args.embeddings, columns=[args.id_col or "vec_id", "embedding"])
        res = emb_kmeans(
            emb, n_clusters=args.n_centroids, id_col=args.id_col or "vec_id"
        )["assignments"]
        n = _write(res, args, args.id_col or "vec_id")
        print(json.dumps({"op": "kmeans", "out": args.out, "rows": n}))
        return 0

    if args.op in ("pca", "logreg"):
        if not args.embeddings:
            print("error: this op needs --embeddings", file=sys.stderr)
            return 2
        import numpy as np
        import pandas as pd

        from everythinggraph_ray.datapipe import cluster

        emb = ray.data.read_parquet(
            args.embeddings,
            # logreg trains on the label column; pca needs vectors only
            columns=[args.id_col or "vec_id", "embedding"]
            + (["label"] if args.op == "logreg" else []),
        )
        if args.op == "pca":
            r = cluster.emb_power_iteration(emb)
            res = pd.DataFrame(
                {
                    "dim": np.arange(len(r["component"]), dtype=np.int64),
                    "component": r["component"],
                    "eigenvalue": r["eigenvalue"],
                    "explained_ratio": r["explained_ratio"],
                }
            )
        else:
            r = cluster.emb_logreg(emb)
            res = pd.DataFrame(
                {
                    "dim": np.arange(len(r["weights"]), dtype=np.int64),
                    "weight": r["weights"],
                    "bias": r["bias"],
                    "loss": r["loss"],
                    "accuracy": r["accuracy"],
                }
            )
        n = _write(res, args, "dim")
        print(json.dumps({"op": args.op, "out": args.out, "rows": n}))
        return 0

    if args.op == "upsert":
        if not args.docs:
            print("error: upsert needs --docs (the new rows)", file=sys.stderr)
            return 2
        from everythinggraph_ray.datapipe.sink import upsert_sharded

        docs = ray.data.read_parquet(args.docs)
        touched = upsert_sharded(
            docs,
            args.out,
            id_col=args.id_col or "doc_id",
            ts_col=args.ts_col,
            num_shards=args.shards or 16,
        )
        print(json.dumps({"op": "upsert", "out": args.out, "shards_touched": len(touched), "rows": int(sum(touched.values()))}))
        return 0

    if args.op == "sq8":
        if not args.embeddings:
            print("error: sq8 needs --embeddings", file=sys.stderr)
            return 2
        from everythinggraph_ray.datapipe.quantize import sq8_quantize

        emb = ray.data.read_parquet(args.embeddings, columns=[args.id_col or "vec_id", "embedding"])
        res = sq8_quantize(emb, id_col=args.id_col or "vec_id")
        n = _write(res, args, args.id_col or "vec_id")
        print(json.dumps({"op": "sq8", "out": args.out, "rows": n}))
        return 0

    if args.op in ("pq-codes", "standardize", "gram"):
        if not args.embeddings:
            print("error: this op needs --embeddings", file=sys.stderr)
            return 2
        emb = ray.data.read_parquet(
            args.embeddings,
            # gram computes X'y from the label column; the others need vectors only
            columns=[args.id_col or "vec_id", "embedding"]
            + (["label"] if args.op == "gram" else []),
        )
        id_col = args.id_col or "vec_id"
        if args.op == "pq-codes":
            from everythinggraph_ray.datapipe.pq import pq_encode

            res = pq_encode(
                emb, m_sub=args.m_sub, n_codes=args.n_codes, id_col=id_col
            )
        elif args.op == "standardize":
            from everythinggraph_ray.datapipe.quantize import standardize

            res = standardize(emb, id_col=id_col)
        else:
            from everythinggraph_ray.datapipe.cluster import gram_matrix

            res = gram_matrix(emb)
        n = _write(res, args, id_col if args.op != "gram" else "i")
        print(json.dumps({"op": args.op, "out": args.out, "rows": n}))
        return 0

    if args.op == "knn-pq":
        if not args.embeddings:
            print("error: knn-pq needs --embeddings", file=sys.stderr)
            return 2
        from everythinggraph_ray.datapipe.pq import knn_pq

        emb = ray.data.read_parquet(args.embeddings, columns=[args.id_col or "vec_id", "embedding"])
        id_col = args.id_col or "vec_id"
        if args.queries:
            qids = [int(x) for x in args.queries.split(",")]
        else:
            qids = knn.smallest_ids(emb, id_col, args.num_queries)
        res = knn_pq(
            emb, qids, k=args.k, m_sub=args.m_sub, n_codes=args.n_codes, id_col=id_col
        )
        n = _write(res, args, "query_id")
        print(json.dumps({"op": "knn-pq", "out": args.out, "rows": n}))
        return 0

    if args.op in ("snm", "containment", "weighted-sample"):
        if not args.docs:
            print("error: this op needs --docs", file=sys.stderr)
            return 2
        docs = ray.data.read_parquet(
            args.docs, columns=[args.id_col or "doc_id", args.text_col]
        )
        if args.op == "snm":
            res = dedup.snm_near_duplicates(
                docs, window=args.window, threshold_milli=args.threshold_milli,
                text_col=args.text_col,
            )
            key = "a"
        elif args.op == "containment":
            res = dedup.containment_pairs(
                docs, threshold_milli=args.threshold_milli, text_col=args.text_col
            )
            key = "a"
        else:
            res = curate.weighted_sample(
                docs, args.k, id_col=args.id_col or "doc_id", text_col=args.text_col
            )
            key = args.id_col or "doc_id"
        n = _write(res, args, key)
        print(json.dumps({"op": args.op, "out": args.out, "rows": n}))
        return 0

    if args.op in ("knn", "knn-ivf", "knn-lsh", "emb-near-dup"):
        if not args.embeddings:
            print("error: this op needs --embeddings", file=sys.stderr)
            return 2
        emb = ray.data.read_parquet(args.embeddings, columns=[args.id_col or "vec_id", "embedding"])
        id_col = args.id_col or "vec_id"
        if args.op == "emb-near-dup":
            res = knn.embedding_near_duplicates(
                emb, threshold=args.threshold, n_planes=args.n_planes, id_col=id_col
            )
        else:
            if args.queries:
                qids = [int(x) for x in args.queries.split(",")]
            else:
                qids = knn.smallest_ids(emb, id_col, args.num_queries)
            if args.op == "knn":
                res = knn.knn_bruteforce(emb, qids, k=args.k, id_col=id_col)
            elif args.op == "knn-ivf":
                res = knn.knn_ivf(
                    emb,
                    qids,
                    k=args.k,
                    n_centroids=args.n_centroids,
                    n_probe=args.n_probe,
                    id_col=id_col,
                )
            else:
                res = knn.knn_lsh(
                    emb, qids, k=args.k, n_planes=args.n_planes, id_col=id_col
                )
    else:
        if not args.docs:
            print("error: this op needs --docs", file=sys.stderr)
            return 2
        docs = ray.data.read_parquet(args.docs)
        tc = args.text_col
        id_col = args.id_col or "doc_id"
        if args.op == "stats":
            res = text.doc_stats(docs, tc)
        elif args.op == "normalize":
            import pyarrow as pa
            import pyarrow.compute as pc2

            def _norm(batch: "pa.Table") -> "pa.Table":
                t = pc2.utf8_lower(batch[tc])
                t = pc2.replace_substring_regex(t, r"[.,;:!?]", "")
                t = pc2.replace_substring_regex(t, r"\s+", " ")
                t = pc2.utf8_trim_whitespace(t)
                return batch.set_column(
                    batch.schema.get_field_index(tc), tc, t
                )

            res = docs.map_batches(_norm, batch_format="pyarrow")
        elif args.op == "lev-pairs":
            from everythinggraph_ray.pipelines.analytics_extra2 import lev_pairs

            # blocked-candidate edit-distance verify (lang + prefix blocks)
            res = lev_pairs(docs)
        elif args.op == "quality":
            res = text.quality_score(docs, tc)
        elif args.op == "langid":
            res = text.lang_id(docs)
        elif args.op == "fingerprint":
            res = text.fingerprint(docs, tc)
        elif args.op == "top-tokens":
            res = text.top_tokens(docs, args.k, tc)
        elif args.op == "tfidf":
            res = text.tfidf_top_terms(
                docs, docs.count(), k=args.k, text_col=tc, id_col=id_col
            )
        elif args.op == "bigram-lm":
            from everythinggraph_ray.datapipe.lm import bigram_lm

            res = bigram_lm(docs, text_col=tc, id_col=id_col)
        elif args.op == "bm25":
            terms = tuple(t for t in args.terms.split(",") if t)
            if not terms:
                print("bm25 requires --terms t1,t2,...", file=sys.stderr)
                return 2
            res = text.bm25_topk(docs, terms, args.k, text_col=tc, id_col=id_col)
        elif args.op == "inverted-index":
            res = text.inverted_index(docs, text_col=tc, id_col=id_col, min_df=args.min_df)
        elif args.op == "vocab-hll":
            import pandas as _pd

            from everythinggraph_ray.datapipe.sketch import hll_distinct_tokens

            r = hll_distinct_tokens(docs, text_col=tc, p=args.hll_p)
            res = _pd.DataFrame([r])
        elif args.op == "rank":
            from everythinggraph_ray.stages.agg import grouped_row_number

            res = grouped_row_number(
                docs,
                args.group_col or None,
                args.rank_by,
                id_col,
                ascending=False,
                ntile=args.ntile or None,
            )
        elif args.op == "dd-quantiles":
            from everythinggraph_ray.datapipe.sketch import ddsketch_quantiles

            res = ddsketch_quantiles(
                docs,
                args.value_col,
                [float(x) for x in args.quantiles.split(",")],
                alpha=args.alpha,
                group_col=args.group_col or None,
            )
        elif args.op == "jaccard-join":
            from everythinggraph_ray.datapipe.setjoin import jaccard_join

            res = jaccard_join(
                docs, threshold_milli=args.threshold_milli, id_col=id_col, text_col=tc
            )
        elif args.op == "bpe-train":
            from everythinggraph_ray.datapipe.bpe import bpe_train

            res = bpe_train(docs, n_merges=args.n_merges, text_col=tc)
        elif args.op == "exact-dedup":
            res = dedup.exact_duplicates(docs, tc)
        elif args.op == "minhash-dedup":
            res = dedup.minhash_near_duplicates(
                docs, threshold=args.threshold, num_perm=args.num_perm, bands=args.bands
            )
        elif args.op == "simhash":
            res = dedup.simhash(docs)
        elif args.op == "simhash-candidates":
            res = dedup.simhash_candidates(docs)
        elif args.op == "pii-redact":
            res = curate.pii_redact(docs, tc, keep_text=args.keep_text)
        elif args.op == "repetition":
            res = curate.repetition_stats(docs, tc)
        elif args.op == "decontaminate":
            if not args.bench:
                print("error: decontaminate needs --bench", file=sys.stderr)
                return 2
            bench = ray.data.read_parquet(args.bench, columns=[tc])
            res = curate.decontaminate(
                docs, bench, ngram=args.ngram, text_col=tc, id_col=id_col
            )
        elif args.op == "sample":
            res = curate.stratified_sample(
                docs, {}, strata_col=args.strata_col, id_col=id_col, default_rate=args.rate
            )
        elif args.op == "mix-weights":
            res = curate.mix_weights(docs, text_col=tc)
        elif args.op == "shard-assign":
            res = curate.shard_assign(
                docs, id_col=id_col, num_shards=max(args.shards, 1) or 16
            )
        elif args.op == "dup-spans":
            from everythinggraph_ray.datapipe import substr

            res = substr.duplicate_spans(docs, n=max(args.ngram, 2), id_col=id_col, text_col=tc)
        elif args.op == "cms-heavy":
            from everythinggraph_ray.datapipe import sketch

            res = sketch.cms_heavy_hitters(docs, args.min_count, text_col=tc)
        elif args.op == "pack":
            res = pack.pack_sequences(docs, bin_tokens=args.bin_tokens, id_col=id_col, text_col=tc)
        else:  # chunk
            res = chunk.cdc_chunks(docs, text_col=tc, id_col=id_col)

    n = _write(res, args, id_col)
    print(json.dumps({"op": args.op, "out": args.out, "rows": n}))
    return 0


def _write(res, args, id_col: str) -> int:
    """Write a Dataset or small DataFrame result; return the row count."""
    import pandas as pd

    import ray.data

    if isinstance(res, pd.DataFrame):
        # small driver-side results (knn frames, mix-weights) — one file
        import pyarrow.parquet as pq
        import pyarrow as pa
        import os

        os.makedirs(args.out, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(res, preserve_index=False), f"{args.out}/part-0.parquet")
        return len(res)
    if args.shards > 0 and args.op not in ("mix-weights",):
        from everythinggraph_ray.datapipe.sink import write_sharded

        sid = id_col if id_col in res.schema().names else res.schema().names[0]
        written = write_sharded(res, args.out, id_col=sid, num_shards=args.shards)
        return int(sum(written.values()))
    res = res.materialize()  # count + write without re-executing the pipeline
    res.write_parquet(args.out)
    return res.count()


if __name__ == "__main__":
    sys.exit(main())
