"""Inverted-index build: documents -> block-max posting lists + stats.

Reference pipeline being re-expressed (Spark-first, not a port):
ingest batch -> per-field compose of (term -> docIds[], tfs[]) work units ->
parallel posting appends -> global cardinality row (reference:
miru-service ``.../stream/MiruIndexer.java:47-126``,
``MiruIndexPrimaryFields.java:37-136`` (tf extraction 62-75),
``.../index/lab/LabFieldIndex.java:478-541`` (global Σtf row)).

Spark design:

- **One declarative pass per shard**: read only the shard's doc-id slice
  (parquet predicate pushdown), tokenize with an Arrow UDF, ``explode`` ->
  ``groupBy(term, doc_id)`` -> tf. doclen rides along in the groupBy key
  (functionally dependent on doc_id) so no extra join.
- **Skew-safe by construction**: postings group by ``(term, block_key)``
  where ``block_key = doc_id >> block_bits``. A head term ("the") is split
  across every doc-range block, so no single reducer ever materializes a
  full head-term posting list — the same reason the reference atomizes
  bitmaps into 64Ki-docId Roaring containers
  (``LabInvertedIndex.java:268-292``).
- **Blocks carry doclen** so BM25 scoring needs no doc-side join at query
  time; block headers keep (max_doc_id, n, max_tf, min_doclen) for
  block-max pruning — the reference's lastId zone-map skip
  (``LabFieldIndex.multiTxIndex:371-383``), upgraded per block.
- **Global stats are additive across disjoint shards**: per-shard
  (term, df, cf) and (n_docs, sum_doclen) partials are merged by a small
  finalize job into the dictionary + stats.json; df/cf/N/avgdl therefore
  stay exact under incremental/resumed builds (the reference updates the
  global cardinality row transactionally, ``LabFieldIndex.java:510-536``).
- **Resume**: each shard writes a lineage manifest; re-runs skip ``done``
  shards with a matching input fingerprint (sip-cursor analogue,
  ``AmzaSipCursor.java:14-47``).

At cluster scale each shard is an independent bounded job over an input
slice, so a 10^12-doc build is a sequence (or DAG) of shard jobs, each of
which shuffles only its slice; nothing in the plan holds global state
except the tiny finalize merge.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from miru_spark.analysis.tokenizer import tokenize_udf
from miru_spark.index import codec
from miru_spark.index.manifest import ShardManifest, read_manifest, shard_is_done, write_manifest

BLOCK_BITS_DEFAULT = 13  # 8192-doc ranges per block (Roaring container analogue)

_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("block_key", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("sum_tf", T.LongType()),
        T.StructField("max_doc_id", T.LongType()),
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("min_doclen", T.IntegerType()),
        T.StructField("doc_ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("doclens", T.BinaryType()),
    ]
)


@dataclass
class IndexMeta:
    index_dir: str
    n_docs: int
    total_tokens: int
    avgdl: float
    n_terms: int
    n_shards: int
    block_bits: int
    use_stopwords: bool
    input_fingerprint: str

    @property
    def stats_path(self) -> str:
        return os.path.join(self.index_dir, "stats.json")


def _make_compressor(block_bits: int):
    """mapInPandas kernel factory: (term, block_key, id/tf/doclen arrays) ->
    compressed block rows. numpy-vectorized per block; no per-posting Python."""

    def _compress(pdf_iter):
        for pdf in pdf_iter:
            out = {k: [] for k in _POSTINGS_SCHEMA.fieldNames()}
            for term, block_key, ids, tfs, dls in zip(
                pdf["term"], pdf["block_key"], pdf["ids"], pdf["tfs_arr"], pdf["dls"]
            ):
                ids = np.asarray(ids, dtype=np.int64)
                tfs = np.asarray(tfs, dtype=np.int64)
                dls = np.asarray(dls, dtype=np.int64)
                base = int(block_key) << block_bits
                out["term"].append(term)
                out["block_key"].append(int(block_key))
                out["n"].append(ids.size)
                out["sum_tf"].append(int(tfs.sum()))
                out["max_doc_id"].append(int(ids[-1]))
                out["max_tf"].append(int(tfs.max()))
                out["min_doclen"].append(int(dls.min()))
                out["doc_ids"].append(codec.encode_block_docids(ids, base))
                out["tfs"].append(codec.encode_counts(tfs))
                out["doclens"].append(codec.encode_counts(dls))
            yield pd.DataFrame(out)

    return _compress


def assign_doc_ids(df: DataFrame, order_col: str = "url", partitions: int = 64) -> DataFrame:
    """Assign dense, deterministic docIds by global order of ``order_col``.

    The reference gives docs dense per-partition ids in arrival order
    (README.md:12; writer cursor ``MiruPartitioner.java:106-165``); we make
    ids deterministic by deriving them from a stable global sort — never
    ``monotonically_increasing_id`` (which depends on task layout).

    Scalable two-phase zipWithIndex: range-partition on the key, count per
    partition, broadcast cumulative offsets, then local rank + offset.
    """
    from pyspark import TaskContext

    parted = df.repartitionByRange(partitions, order_col).sortWithinPartitions(order_col)
    parted = parted.cache()
    counts = parted.select(F.spark_partition_id().alias("pid")).groupBy("pid").count().collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += row["count"]

    out_schema = T.StructType(df.schema.fields + [T.StructField("doc_id", T.LongType(), False)])

    def _assign(pdf_iter):
        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in pdf_iter:
            pdf = pdf.copy()
            pdf["doc_id"] = offsets.get(pid, 0) + seen + np.arange(len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    return parted.mapInPandas(_assign, schema=out_schema)


def _input_fingerprint(docs: DataFrame, id_col: str, text_col: str) -> str:
    """Cheap deterministic fingerprint of the input snapshot for lineage."""
    row = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
        F.sum(F.length(text_col)).alias("chars"),
    ).collect()[0]
    return f"n={row['n']};lo={row['lo']};hi={row['hi']};chars={row['chars']}"


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    stored_cols: list[str] | None = None,
    n_shards: int = 4,
    block_bits: int = BLOCK_BITS_DEFAULT,
    use_stopwords: bool = False,
    overwrite: bool = False,
    fail_after_shard: int | None = None,  # test hook: simulate a crash between shards
) -> IndexMeta:
    """Build (or resume) the inverted index for ``docs`` under ``index_dir``."""
    if overwrite and os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    fingerprint = _input_fingerprint(docs, id_col, text_col)
    bounds = docs.select(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).collect()[0]
    doc_lo, doc_hi = int(bounds["lo"]), int(bounds["hi"])
    block_size = 1 << block_bits
    # align shard boundaries to block boundaries so no block straddles shards
    span = doc_hi - doc_lo + 1
    blocks_total = math.ceil(span / block_size)
    blocks_per_shard = max(1, math.ceil(blocks_total / n_shards))
    shard_span = blocks_per_shard * block_size
    shard_base = (doc_lo >> block_bits) << block_bits  # block-aligned origin

    tok = tokenize_udf(use_stopwords=use_stopwords)
    stored = [c for c in (stored_cols or []) if c != id_col]

    for shard in range(n_shards):
        lo = shard_base + shard * shard_span
        hi = lo + shard_span - 1
        if shard_is_done(index_dir, shard, fingerprint):
            continue
        t0 = time.monotonic()
        if lo > doc_hi:
            write_manifest(
                index_dir,
                ShardManifest(shard, lo, hi, status="done", input_fingerprint=fingerprint),
            )
            continue
        _build_shard(
            spark, docs, index_dir, shard, lo, hi,
            id_col=id_col, text_col=text_col, stored=stored,
            block_bits=block_bits, tok=tok, fingerprint=fingerprint, wall_start=t0,
        )
        if fail_after_shard is not None and shard >= fail_after_shard:
            raise RuntimeError(f"simulated crash after shard {shard}")

    return _finalize(spark, index_dir, n_shards, block_bits, use_stopwords, fingerprint)


def _build_shard(
    spark, docs, index_dir, shard, lo, hi, *, id_col, text_col, stored,
    block_bits, tok, fingerprint, wall_start,
) -> None:
    slice_df = docs.filter((F.col(id_col) >= lo) & (F.col(id_col) <= hi))

    tokens = (
        slice_df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            tok(F.col(text_col)).alias("tokens"),
            *[F.col(c) for c in stored],
        )
        .withColumn("doclen", F.size("tokens"))
        .persist()  # one tokenize pass feeds both the doc store and postings
    )
    try:
        docs_out = os.path.join(index_dir, "docs", f"shard={shard}")
        tokens.select("doc_id", "doclen", *stored).write.mode("overwrite").parquet(docs_out)

        tf = (
            tokens.select("doc_id", "doclen", F.explode("tokens").alias("term"))
            .groupBy("term", "doc_id", "doclen")  # doclen is FD on doc_id: no join needed
            .agg(F.count(F.lit(1)).cast("int").alias("tf"))
        )
        grouped = (
            tf.withColumn("block_key", F.shiftright("doc_id", block_bits))
            .groupBy("term", "block_key")
            .agg(
                F.sort_array(F.collect_list(F.struct("doc_id", "tf", "doclen"))).alias("p")
            )
            # JVM-side struct-field extraction: array<struct>.field -> array
            .select(
                "term",
                "block_key",
                F.col("p.doc_id").alias("ids"),
                F.col("p.tf").alias("tfs_arr"),
                F.col("p.doclen").alias("dls"),
            )
        )
        blocks = grouped.mapInPandas(_make_compressor(block_bits), schema=_POSTINGS_SCHEMA)
        post_out = os.path.join(index_dir, "postings", f"shard={shard}")
        # sorting by term within files -> parquet row-group min/max stats prune term lookups
        blocks.sortWithinPartitions("term", "block_key").write.mode("overwrite").parquet(post_out)
    finally:
        tokens.unpersist()

    # stats derived from the *written* blocks: no re-tokenize, resume-consistent
    written = spark.read.parquet(post_out)
    term_stats = written.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("sum_tf").alias("cf")
    )
    stats_out = os.path.join(index_dir, "shard_stats", f"shard={shard}")
    term_stats.write.mode("overwrite").parquet(stats_out)

    agg = written.select(
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_postings"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.countDistinct("term").alias("n_terms"),
        F.coalesce(
            F.sum(F.pmod(F.xxhash64("term", "block_key", "max_doc_id"), F.lit(2**31))),
            F.lit(0),
        ).alias("checksum"),
    ).collect()[0]
    doc_agg = spark.read.parquet(docs_out).select(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("doclen"), F.lit(0)).alias("sum_doclen"),
    ).collect()[0]

    write_manifest(
        index_dir,
        ShardManifest(
            shard=shard, doc_lo=lo, doc_hi=hi, status="done",
            n_docs=int(doc_agg["n_docs"]), n_postings=int(agg["n_postings"]),
            n_blocks=int(agg["n_blocks"]), n_terms=int(agg["n_terms"]),
            sum_doclen=int(doc_agg["sum_doclen"]),
            checksum=int(agg["checksum"]), input_fingerprint=fingerprint,
            wall_sec=time.monotonic() - wall_start,
        ),
    )


def _finalize(spark, index_dir, n_shards, block_bits, use_stopwords, fingerprint) -> IndexMeta:
    """Merge per-shard partials into the global dictionary + stats.json.

    df/cf are additive across disjoint doc shards, so the merge is a tiny
    groupBy over (vocab x shards) rows — the global Σtf row of the
    reference (``LabFieldIndex.java:510-536``) generalized.
    """
    shard_stats = spark.read.parquet(os.path.join(index_dir, "shard_stats"))
    dictionary = shard_stats.groupBy("term").agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    dict_out = os.path.join(index_dir, "dictionary")
    dictionary.write.mode("overwrite").parquet(dict_out)

    n_docs = 0
    total_tokens = 0
    for shard in range(n_shards):
        m = read_manifest(index_dir, shard)
        if m is None or m.status != "done":
            raise RuntimeError(f"finalize with incomplete shard {shard}")
        n_docs += m.n_docs
        total_tokens += m.sum_doclen
    n_terms = spark.read.parquet(dict_out).count()
    meta = IndexMeta(
        index_dir=index_dir, n_docs=n_docs, total_tokens=total_tokens,
        avgdl=(total_tokens / n_docs) if n_docs else 0.0,
        n_terms=n_terms, n_shards=n_shards, block_bits=block_bits,
        use_stopwords=use_stopwords, input_fingerprint=fingerprint,
    )
    with open(meta.stats_path, "w") as f:
        json.dump(
            {
                k: getattr(meta, k)
                for k in (
                    "n_docs", "total_tokens", "avgdl", "n_terms", "n_shards",
                    "block_bits", "use_stopwords", "input_fingerprint",
                )
            },
            f, indent=1, sort_keys=True,
        )
    return meta
