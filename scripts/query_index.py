"""spark-submit entry point for serving BM25 top-k queries over a built index.

Usage::

    spark-submit --py-files /tmp/miru_spark.zip scripts/query_index.py \
        --index /path/to/index --query "spark AND query" -k 10
    python scripts/query_index.py --index /tmp/idx --query "quer*" --cores 8 --wand
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--wand", action="store_true", help="block-max WAND path (flat term list)")
    ap.add_argument("--or", dest="use_or", action="store_true",
                    help="with --wand: disjunctive (OR) scoring instead of AND")
    ap.add_argument("--after", default=None, metavar="SCORE,DOC_ID",
                    help="keyset continuation cursor: last hit of the previous page")
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search, search_wand
    from miru_spark.session import get_spark

    if args.cores is not None:
        spark = get_spark("miru_spark_query", cores=args.cores)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("miru_spark_query").getOrCreate()

    reader = IndexReader(spark, args.index)
    after = None
    if args.after:
        s, d = args.after.split(",")
        after = (float(s), int(d))
    t0 = time.monotonic()
    if args.wand:
        from miru_spark.analysis.tokenizer import tokenize

        terms = tokenize(args.query, locale=reader.stats.get("locale"))
        out = search_wand(reader, terms, k=args.k,
                          mode="or" if args.use_or else "and", after=after)
    else:
        out = search(reader, args.query, k=args.k, after=after)
    rows = out.collect()
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "query": args.query,
                "k": args.k,
                "latency_sec": round(dt, 4),
                "hits": [{"doc_id": r["doc_id"], "score": round(r["score"], 6)} for r in rows],
            }
        )
    )


if __name__ == "__main__":
    main()
