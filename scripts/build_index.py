"""spark-submit entry point for the distributed index build.

Cluster usage (the north-rule deployment shape)::

    cd /root/repo && zip -r /tmp/miru_spark.zip miru_spark
    spark-submit --master <cluster> --py-files /tmp/miru_spark.zip \
        scripts/build_index.py \
        --input /path/to/pages_table --output /path/to/index \
        --id-col doc_id --text-col text --shards 64 [--resume]

Local smoke::

    python scripts/build_index.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/idx --cores 8

When ``--id-col`` is absent from the input schema, dense deterministic
docIds are assigned by global ``--order-col`` order (never
monotonically_increasing_id — resume-stable). ``--resume`` (default) skips
shards whose lineage manifest is ``done`` with a matching input
fingerprint; ``--overwrite`` wipes and rebuilds.
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
    ap.add_argument("--input", required=True,
                    help="pages/documents source: a parquet path, or a catalog "
                         "table identifier (e.g. an Iceberg table 'wh.db.pages')")
    ap.add_argument("--snapshot-id", type=int, default=None,
                    help="Iceberg time travel: build from this exact snapshot")
    ap.add_argument("--start-snapshot-id", type=int, default=None,
                    help="Iceberg incremental: index only rows appended after this snapshot")
    ap.add_argument("--end-snapshot-id", type=int, default=None,
                    help="Iceberg incremental: upper snapshot bound (pairs with --start-snapshot-id)")
    ap.add_argument("--output", required=True, help="index output directory")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--order-col", default="url", help="docId assignment order when id-col missing")
    ap.add_argument("--stored-cols", default="", help="comma-separated forward-index columns")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument(
        "--shard-span-blocks", type=int, default=None,
        help="fixed blocks per shard anchored at doc_id 0 (stable under "
             "corpus growth: re-runs after an append build only new shards; "
             "overrides --shards)",
    )
    ap.add_argument("--block-bits", type=int, default=13)
    ap.add_argument("--max-wave-shards", type=int, default=None,
                    help="cap shards per Spark job (bounded, resumable waves)")
    ap.add_argument("--stopwords", action="store_true")
    ap.add_argument("--locale", default=None,
                    help="analyzer locale (e.g. de, fr, de_DE); default = frozen ASCII en")
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--cores", default=None, help="local[N] override; omit under spark-submit")
    args = ap.parse_args()

    from miru_spark.index.builder import assign_doc_ids, build_index
    from miru_spark.session import get_spark

    if args.cores is not None:
        spark = get_spark("miru_spark_build", cores=args.cores)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("miru_spark_build").getOrCreate()

    from miru_spark.sources import (current_snapshot_id, is_table_identifier,
                                    load_corpus)

    # pin the snapshot BEFORE reading and make the READ use the pin: an
    # explicit --snapshot-id / --end-snapshot-id is the pin; otherwise
    # the table's current snapshot is resolved once and passed as the
    # read's snapshot bound (time travel for full builds, the
    # end-snapshot-id for incremental ones), so the data actually read
    # and the recorded lineage can never diverge — not even when a
    # concurrent append lands between resolution and scan planning
    pinned_snapshot = args.snapshot_id or args.end_snapshot_id
    if pinned_snapshot is None and is_table_identifier(args.input):
        pinned_snapshot = current_snapshot_id(spark, args.input)
    end_id = args.end_snapshot_id
    if args.start_snapshot_id is not None and end_id is None:
        end_id = pinned_snapshot  # bound the delta at the pin
    docs = load_corpus(
        spark, args.input,
        snapshot_id=args.snapshot_id if args.snapshot_id is not None
        else (pinned_snapshot if args.start_snapshot_id is None else None),
        start_snapshot_id=args.start_snapshot_id,
        end_snapshot_id=end_id)
    if args.id_col not in docs.columns:
        docs = assign_doc_ids(docs, order_col=args.order_col)
        id_col = "doc_id"
    else:
        id_col = args.id_col

    stored = [c for c in args.stored_cols.split(",") if c]
    t0 = time.monotonic()
    meta = build_index(
        spark,
        docs,
        args.output,
        id_col=id_col,
        text_col=args.text_col,
        stored_cols=stored,
        n_shards=args.shards,
        block_bits=args.block_bits,
        use_stopwords=args.stopwords,
        locale=args.locale,
        overwrite=args.overwrite,
        shard_span_blocks=args.shard_span_blocks,
        max_wave_shards=args.max_wave_shards,
    )
    dt = time.monotonic() - t0
    # release assign_doc_ids' correctness cache now the index is durable
    cached = getattr(docs, "_miru_cached_input", None)
    if cached is not None:
        cached.unpersist()
    # pin the source snapshot into stats.json (lineage: which Iceberg
    # snapshot this index was built from; a resume or audit reads it
    # back, and an incremental build passes it as --start-snapshot-id)
    if pinned_snapshot is not None:
        stats_path = os.path.join(args.output, "stats.json")
        with open(stats_path) as f:
            stats = json.load(f)
        stats["source_table"] = args.input
        stats["snapshot_id"] = int(pinned_snapshot)
        if args.start_snapshot_id is not None:
            stats["start_snapshot_id"] = int(args.start_snapshot_id)
        tmp = stats_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(stats, f, indent=1, sort_keys=True)
        os.replace(tmp, stats_path)
    print(
        json.dumps(
            {
                "n_docs": meta.n_docs,
                "n_terms": meta.n_terms,
                "total_tokens": meta.total_tokens,
                "avgdl": meta.avgdl,
                "n_shards": meta.n_shards,
                "build_sec": round(dt, 3),
                "docs_per_sec": round(meta.n_docs / dt, 1) if dt > 0 else None,
                "index_dir": meta.index_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
