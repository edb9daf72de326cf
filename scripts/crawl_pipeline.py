"""spark-submit entry point for the end-to-end web-corpus pipeline.

The full training-data path over a Common-Crawl-shaped table
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string),
each stage a declarative DataFrame transform the next stage composes on:

1. extract   — ``extract_text(html)`` Arrow UDF when the text column is
               absent/empty (byte-identical per url — the input_hint
               invariant, tested in test_index_build).
2. lang-id   — heuristic function-word vote; keep ``--langs`` (default en).
3. quality   — deterministic [0,1] score; keep ``score >= --min-quality``.
4. dedup     — exact (md5 group-min winner), then optional MinHash+LSH
               near-dup pruning (banded, candidate-verified — never
               all-pairs; ``--near-dup-threshold 0`` disables), then
               optional ExactSubstr span stripping (Lee et al. 2021,
               keep-first; ``--exact-substr-len 0`` disables).
5. doc ids   — dense deterministic ids by url order (resume-stable).
6. index     — ``build_index`` (salted (term, block) exchange, block-max
               varbyte postings, lineage manifests; ``--resume`` skips
               fingerprint-matched shards).
7. query     — optional smoke query via block-max WAND.

Cluster usage (north-rule deployment shape)::

    cd /root/repo && zip -r /tmp/miru_spark.zip miru_spark
    spark-submit --master <cluster> --py-files /tmp/miru_spark.zip \
        scripts/crawl_pipeline.py --input /path/to/pages --output /path/to/idx \
        --shards 64 --near-dup-threshold 0.8

Local smoke::

    python scripts/crawl_pipeline.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/crawl_idx --cores 8 --query "spark AND join"

Every stage stays JVM-or-Arrow-side (no per-row Python): the one shuffle
per stage is the groupBy/join that stage's semantics require, and the
final index build adds exactly one dominant exchange.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run_pipeline(spark, args) -> dict:
    from miru_spark.analysis.tokenizer import extract_text_udf
    from miru_spark.index.builder import assign_doc_ids, build_index
    from miru_spark.pipeline.dedup import exact_dedup, minhash_lsh_pairs
    from miru_spark.pipeline.text import lang_id, quality_score

    from miru_spark.sources import load_corpus

    pages = load_corpus(spark, args.input)
    cols = set(pages.columns)
    stats: dict[str, int | float] = {"input_rows": pages.count()}

    # 1. extract: trust a non-empty text column, else extract from html
    if "text" not in cols and "html" in cols:
        pages = pages.withColumn("text", extract_text_udf(F.col("html")))
    elif "html" in cols:
        pages = pages.withColumn(
            "text",
            F.when(
                F.col("text").isNull() | (F.length("text") == 0),
                extract_text_udf(F.col("html")),
            ).otherwise(F.col("text")),
        )
    pages = pages.filter(F.col("text").isNotNull() & (F.length("text") > 0))

    key = args.id_col if args.id_col in cols else "url"

    # 2. language filter (skip when the requested set is empty = keep all)
    langs = [x for x in (args.langs or "").split(",") if x]
    if langs:
        lid = lang_id(pages, key, "text").withColumnRenamed("id", key)
        pages = pages.join(lid, key).filter(F.col("lang_guess").isin(langs)).drop("lang_guess")

    # 3. quality gate
    if args.min_quality > 0:
        q = quality_score(pages, key, "text").withColumnRenamed("id", key)
        pages = (
            pages.join(q.select(key, "quality"), key)
            .filter(F.col("quality") >= args.min_quality)
            .drop("quality")
        )

    # 4a. exact dedup (md5 winner per digest)
    pages = exact_dedup(pages, key, "text")

    # the surviving set feeds BOTH the near-dup join and the index build —
    # materialize once (a written staging table at cluster scale)
    pages = pages.persist()
    stats["after_filters"] = pages.count()

    # 4b. near-dup pruning: banded MinHash LSH candidates, exact-verified;
    # drop the higher key of each surviving pair (deterministic winner)
    if args.near_dup_threshold > 0:
        pairs = minhash_lsh_pairs(
            pages, key, "text", verify_threshold=args.near_dup_threshold,
            locale=args.locale,
        )
        losers = pairs.select(F.col("id_b").alias(key)).distinct()
        pages = pages.join(losers, key, "left_anti")
        stats["after_near_dup"] = pages.count()

    # 4c. ExactSubstr span removal (Lee et al. 2021): strip every token
    # span >= --exact-substr-len that occurs twice anywhere in the
    # surviving corpus, keep docs that still have content
    if args.exact_substr_len > 0:
        from miru_spark.pipeline.dedup import strip_duplicate_spans

        # tokenize with the INDEX analyzer (args.locale), and only
        # rewrite docs that actually lost a span: the token-space
        # rejoin drops case/punctuation (documented trade-off of
        # ExactSubstr over the analyzed stream), so untouched docs —
        # the vast majority — must keep their original text
        stripped = strip_duplicate_spans(
            pages, key, "text", min_len=args.exact_substr_len,
            keep_first=True, locale=args.locale,
        ).withColumnRenamed("id", key)
        pages = (
            pages.join(
                stripped.select(key, "text_clean", "removed_tokens"), key
            )
            .withColumn(
                "text",
                F.when(F.col("removed_tokens") > 0, F.col("text_clean"))
                .otherwise(F.col("text")),
            )
            .drop("text_clean", "removed_tokens")
            .filter(F.length("text") > 0)
        )
        stats["after_exact_substr"] = pages.count()

    # 5. doc ids: reuse an existing numeric id column; otherwise assign
    # dense deterministic ids by url order (resume-stable)
    if args.id_col in cols:
        docs = pages.select(F.col(args.id_col).alias("doc_id"), "text")
        stored = []
    else:
        docs = assign_doc_ids(pages.select("url", "text"), order_col="url")
        stored = ["url"]

    # 6. index build (one dominant exchange; lineage manifests under output)
    t0 = time.monotonic()
    meta = build_index(
        spark,
        docs,
        args.output,
        id_col="doc_id",
        text_col="text",
        stored_cols=stored,
        n_shards=args.shards,
        locale=args.locale,
        overwrite=not args.resume,
    )
    stats.update(
        n_docs=meta.n_docs,
        n_terms=meta.n_terms,
        index_sec=round(time.monotonic() - t0, 2),
    )
    pages.unpersist()
    # assign_doc_ids pins its sorted input in cache (correctness of the
    # two-phase id assignment); the index is durable now — release it
    cached = getattr(docs, "_miru_cached_input", None)
    if cached is not None:
        cached.unpersist()

    # 7. smoke query through the block-max WAND path
    if args.query:
        from miru_spark.analysis.tokenizer import tokenize
        from miru_spark.index.reader import IndexReader
        from miru_spark.query.bm25 import search_wand

        reader = IndexReader(spark, args.output)
        terms = tokenize(args.query, locale=reader.stats.get("locale"))
        hits = search_wand(reader, terms, k=args.k).collect()
        stats["query_hits"] = [(r["doc_id"], round(r["score"], 4)) for r in hits]
    return stats


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--langs", default="en", help="comma list; empty = keep all")
    p.add_argument("--locale", default=None,
                   help="index analyzer locale (TermAnalyzers registry code, "
                        "e.g. de/ja/th); default = frozen ASCII en. Also drives "
                        "ExactSubstr tokenization")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--near-dup-threshold", type=float, default=0.0,
                   help="MinHash-verified Jaccard cutoff; 0 disables near-dup pruning")
    p.add_argument("--exact-substr-len", type=int, default=0,
                   help="strip token spans >= this length occurring twice corpus-wide "
                        "(ExactSubstr, keep-first); 0 disables")
    p.add_argument("--shards", type=int, default=4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--query", default=None)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--cores", default=None)
    args = p.parse_args()

    from miru_spark.session import get_spark

    spark = get_spark("crawl_pipeline", cores=args.cores)
    print(json.dumps(run_pipeline(spark, args)))


if __name__ == "__main__":
    main()
