"""Sweep core counts / configs for the index build on a fixed corpus.

Usage: python tools/sweep_build.py CORES [driver_mem] [shuffle_parts] [ndocs]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1])
mem = sys.argv[2] if len(sys.argv) > 2 else "32g"
parts = int(sys.argv[3]) if len(sys.argv) > 3 else cores
n_docs = int(sys.argv[4]) if len(sys.argv) > 4 else 240000

os.environ["MIRU_SPARK_DRIVER_MEM"] = mem

from bench import synth_corpus
from miru_spark.index.builder import build_index
from miru_spark.session import get_spark

spark = get_spark(f"sweep_{cores}_{mem}_{parts}", cores=cores, shuffle_partitions=parts)
corpus_dir = f"/tmp/bench_scaling_corpus_{n_docs}"
if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
    synth_corpus(spark, n_docs).repartition(32).write.mode("overwrite").parquet(corpus_dir)
docs = spark.read.parquet(corpus_dir)

out = os.path.join(tempfile.mkdtemp(prefix=f"sweep_{cores}_"), "idx")
t0 = time.monotonic()
meta = build_index(spark, docs, out, n_shards=4, overwrite=True)
dt = time.monotonic() - t0
print(json.dumps({"cores": cores, "mem": mem, "parts": parts,
                  "sec": round(dt, 2), "docs_per_sec": round(meta.n_docs / dt, 1)}))
