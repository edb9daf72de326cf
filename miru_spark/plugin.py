"""The plugin protocol — miru's extension surface, Spark-shaped.

Reference: a miru plugin packages a per-partition ``Question.askLocal``
(bitmap algebra over one partition's indexes), an ``MiruAnswerMerger``
(cross-partition fold of partial answers) and an ``MiruAnswerEvaluator``
(early termination), wired by ``MiruPlugin`` (reference: miru-plugin
``.../plugin/MiruPlugin.java``; ``.../solution/Question.java``;
``MiruAnswerMerger.java``; ``MiruAnswerEvaluator.java``;
``Miru.askAndMerge`` loop ``MiruService.java:101-194``).

Spark mapping (SURVEY §2.12): a partition's askLocal becomes
``build_fragment(df) -> DataFrame`` (a declarative partial-answer
relation over one input slice), the answer merger becomes
``merge(fragments) -> DataFrame`` (a fold over the union of partials),
and the evaluator becomes ``is_done(merged) -> bool``. ``solve`` is the
askAndMerge driver loop: newest-first over slices, merging as it goes,
stopping early when the evaluator says the answer is complete —
e.g. a top-k fulltext answer already holding k results with exhausted
time range (``FullTextAnswerEvaluator.java:19-30``).

Because fragments are DataFrames, Catalyst still fuses fragment + merge
into one distributed plan per wave — the protocol adds composition, not
materialization barriers.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@runtime_checkable
class Plugin(Protocol):
    def build_fragment(self, df: DataFrame) -> DataFrame:
        """Partial answer over ONE input slice (a partition's askLocal)."""
        ...

    def merge(self, fragments: DataFrame) -> DataFrame:
        """Fold the union of partial answers into the final answer."""
        ...

    def is_done(self, merged: DataFrame) -> bool:  # pragma: no cover - default
        """Answer evaluator: True stops the solve loop early."""
        return False


def solve(plugin: Plugin, slices: list[DataFrame], *, check_done_each: bool = False) -> DataFrame:
    """The askAndMerge loop (``MiruService.java:101-194``): fragments per
    slice, merged into a running answer; ``check_done_each`` evaluates
    the early-termination predicate after each slice (costs one action
    per slice — leave off unless slices are expensive and ordered
    newest-first so early exit pays, the reference's serial-per-partition
    mode vs ``useParallelSolver``)."""
    if not slices:
        raise ValueError("no input slices")
    fragments = plugin.build_fragment(slices[0])
    if check_done_each:
        merged = plugin.merge(fragments)
        if plugin.is_done(merged):
            return merged
    for s in slices[1:]:
        fragments = fragments.unionByName(plugin.build_fragment(s))
        if check_done_each:
            merged = plugin.merge(fragments)
            if plugin.is_done(merged):
                return merged
    return plugin.merge(fragments)


class DistinctCountPlugin:
    """DistinctCount as a plugin: per-slice distinct terms (the
    reference's resumable report {aggregateTerms, collectedDistincts},
    ``DistinctCount.java:30-113``), merged by a global distinct count."""

    def __init__(self, fld: str, flt=None):
        self.fld = fld
        self.flt = flt

    def build_fragment(self, df: DataFrame) -> DataFrame:
        from miru_spark.query.filters import apply_filter

        return (
            apply_filter(df, self.flt)
            .select(F.col(self.fld).alias("value"))
            .distinct()
        )

    def merge(self, fragments: DataFrame) -> DataFrame:
        return fragments.agg(F.countDistinct("value").alias("n_distinct"))

    def is_done(self, merged: DataFrame) -> bool:
        return False


class TrendingPlugin:
    """Trending waveforms as a plugin: per-slice bucket counts
    (``TrendingQuestion.java:65-181`` per-partition waveforms), merged by
    summing buckets and ranking terms by total volume (LEADER strategy)."""

    def __init__(self, term_col: str, ts_col: str, lo: str, hi: str, n_buckets: int, k: int = 10):
        self.term_col, self.ts_col = term_col, ts_col
        self.lo, self.hi, self.n_buckets, self.k = lo, hi, n_buckets, k

    def build_fragment(self, df: DataFrame) -> DataFrame:
        lo_us = F.unix_micros(F.lit(self.lo).cast("timestamp"))
        hi_us = F.unix_micros(F.lit(self.hi).cast("timestamp"))
        width = (hi_us - lo_us) / self.n_buckets
        ts = F.col(self.ts_col).cast("timestamp")  # NTZ parquet cols -> TZ for unix_micros
        bucket = F.least(
            F.greatest(
                F.floor((F.unix_micros(ts) - lo_us) / width), F.lit(0)
            ),
            F.lit(self.n_buckets - 1),
        ).cast("int")
        return (
            df.filter((ts >= F.lit(self.lo).cast("timestamp")) & (ts < F.lit(self.hi).cast("timestamp")))
            .select(F.col(self.term_col).alias("term"), bucket.alias("bucket"))
            .groupBy("term", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def merge(self, fragments: DataFrame) -> DataFrame:
        totals = (
            fragments.groupBy("term", "bucket").agg(F.sum("n").alias("n"))
            .groupBy("term").agg(F.sum("n").alias("total"))
        )
        w = Window.orderBy(F.col("total").desc(), "term")
        return (
            totals.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .orderBy("rank")
        )

    def is_done(self, merged: DataFrame) -> bool:
        return False


class TopKSearchPlugin:
    """Per-shard fulltext top-k merged by union + re-limit — the
    reference's sorted two-pointer answer merge capped at k
    (``FullTextAnswerMerger.java:31-68``). ``build_fragment`` receives a
    (doc_id, score) relation for one shard (e.g. a ``search_wand`` run
    over that shard's reader); the evaluator stops once k results exist
    (``FullTextAnswerEvaluator.java:19-30`` resultsExhausted)."""

    def __init__(self, k: int):
        self.k = k

    def build_fragment(self, df: DataFrame) -> DataFrame:
        return df.orderBy(F.col("score").desc(), F.col("doc_id").desc()).limit(self.k)

    def merge(self, fragments: DataFrame) -> DataFrame:
        return fragments.orderBy(F.col("score").desc(), F.col("doc_id").desc()).limit(self.k)

    def is_done(self, merged: DataFrame) -> bool:
        return merged.count() >= self.k
