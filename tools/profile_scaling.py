"""Phase-level scaling profiler: where does local[32] lose vs local[8]?

Usage: python tools/profile_scaling.py CORES NDOCS
Prints per-phase seconds for: corpus gen (count), tokenize+explode+tf,
posting-group+compress+write, full build_index.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores, n_docs = int(sys.argv[1]), int(sys.argv[2])

from pyspark.sql import functions as F

from bench import synth_corpus
from miru_spark.analysis.tokenizer import tokenize_udf
from miru_spark.session import get_spark

spark = get_spark(f"profile_{cores}", cores=cores, shuffle_partitions=cores)
out = {"cores": cores, "n_docs": n_docs}

t0 = time.monotonic()
docs = synth_corpus(spark, n_docs)
docs.write.mode("overwrite").parquet("/tmp/prof_corpus")
out["gen_write"] = round(time.monotonic() - t0, 2)

docs = spark.read.parquet("/tmp/prof_corpus")
tok = tokenize_udf()

t0 = time.monotonic()
n = docs.select(F.size(tok(F.col("text"))).alias("n")).agg(F.sum("n")).collect()[0][0]
out["tokenize_only"] = round(time.monotonic() - t0, 2)
out["total_tokens"] = int(n)

t0 = time.monotonic()
tf = (
    docs.select(F.col("doc_id"), tok(F.col("text")).alias("toks"))
    .select("doc_id", F.explode("toks").alias("term"))
    .groupBy("term", "doc_id")
    .agg(F.count(F.lit(1)).alias("tf"))
)
out["n_postings"] = tf.count()
out["tf_groupby"] = round(time.monotonic() - t0, 2)

t0 = time.monotonic()
grouped = (
    docs.select(F.col("doc_id"), tok(F.col("text")).alias("toks"))
    .withColumn("doclen", F.size("toks"))
    .select("doc_id", "doclen", F.explode("toks").alias("term"))
    .groupBy("term", "doc_id", "doclen")
    .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    .withColumn("block_key", F.shiftright("doc_id", 13))
    .groupBy("term", "block_key")
    .agg(F.sort_array(F.collect_list(F.struct("doc_id", "tf", "doclen"))).alias("p"))
)
out["collect_list_groups"] = grouped.count()
out["posting_group"] = round(time.monotonic() - t0, 2)

from miru_spark.index.builder import build_index

t0 = time.monotonic()
idx = os.path.join(tempfile.mkdtemp(prefix=f"prof_{cores}_"), "idx")
meta = build_index(spark, docs, idx, n_shards=4, overwrite=True)
out["full_build"] = round(time.monotonic() - t0, 2)
out["docs_per_sec"] = round(meta.n_docs / out["full_build"], 1)

print(json.dumps(out))
