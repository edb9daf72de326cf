"""spark-submit entry point for index lifecycle compaction.

Usage::

    # LSM segment merge: coalesce small (micro-batch) shards
    python scripts/compact_index.py --index /tmp/idx --target-docs 1000000 --cores 8

    # fold the removal log into the physical index as well
    python scripts/compact_index.py --index /tmp/idx --target-docs 1000000 --removals
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--target-docs", type=int, default=None,
                    help="merge adjacent shards up to this many docs each")
    ap.add_argument("--removals", action="store_true",
                    help="also fold the removal log into affected shards")
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()
    if args.target_docs is None and not args.removals:
        ap.error("nothing to do: pass --target-docs and/or --removals")

    from miru_spark.index.builder import compact_removals, compact_shards
    from miru_spark.session import get_spark

    if args.cores is not None:
        spark = get_spark("miru_spark_compact", cores=args.cores)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("miru_spark_compact").getOrCreate()

    report: dict = {}
    if args.removals:
        # removals first: fewer docs -> smaller shards -> better packing
        report["removals"] = compact_removals(spark, args.index)
    if args.target_docs is not None:
        report["shards"] = compact_shards(
            spark, args.index, target_docs=args.target_docs)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
