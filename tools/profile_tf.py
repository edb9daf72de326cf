"""Isolate the tf-groupBy inversion: python-UDF vs JVM tokenize, repeats.

Usage: python tools/profile_tf.py CORES
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1])

from pyspark.sql import functions as F

from miru_spark.analysis.tokenizer import tokenize_udf
from miru_spark.session import get_spark

spark = get_spark(f"prof_tf_{cores}", cores=cores, shuffle_partitions=cores)
docs = spark.read.parquet("/tmp/prof_corpus")
tok = tokenize_udf()
out = {"cores": cores, "n_parts": docs.rdd.getNumPartitions()}


def timeit(label, fn):
    t0 = time.monotonic()
    fn()
    out[label] = round(time.monotonic() - t0, 2)


jvm_toks = F.filter(
    F.split(F.lower(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9]+", " ")), r"\s+"),
    lambda x: x != "",
)

# A: python-UDF tokenize + explode + groupBy (run twice)
for i in (1, 2):
    timeit(
        f"udf_tf_{i}",
        lambda: docs.select("doc_id", F.explode(tok(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id").count().count(),
    )

# B: JVM tokenize + explode + groupBy
timeit(
    "jvm_tf",
    lambda: docs.select("doc_id", F.explode(jvm_toks).alias("term"))
    .groupBy("term", "doc_id").count().count(),
)

# C: UDF tokenize only (no shuffle)
timeit("udf_only", lambda: docs.select(F.size(tok(F.col("text"))).alias("n")).agg(F.sum("n")).collect())

# D: explode + count, no groupBy (shuffle-free)
timeit("udf_explode_count", lambda: docs.select(F.explode(tok(F.col("text"))).alias("t")).count())

print(json.dumps(out))
