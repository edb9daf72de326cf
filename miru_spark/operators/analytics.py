"""Time-bucketed analytics: waveforms, metrics, anomaly, stumptown tail.

Reference operators re-expressed (SURVEY §2.10):
- Analytics waveform: counts per N equal time segments over matching docs
  (reference: miru-analytics-plugins ``.../analytics/Analytics.java:142-199``
  driving ``MiruBitmaps.boundedCardinalities:65-73``). Spark recipe:
  ``width_bucket``-style bucket id + groupBy(bucket).count.
- Metrics: sum/avg per bucket — the reference bit-slices numerics into
  power-bit fields and sums by weighted cardinality
  (``.../metrics/Metrics.java:82-97``); native numeric columns make that
  a plain agg (SURVEY §2.4 MiruIndexValueBits -> unneeded).
- Anomaly: bucketed sums flagged against the global dispersion
  (``.../anomaly/Anomaly.java:30-115``).
- Stumptown: last-N matching events + bucket counts
  (``.../stumptown/Stumptown.java:37-71``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.query.filters import Filter, apply_filter


def _bucket_col(time_col: str, lo: str, hi: str, n_buckets: int):
    """0-based equal-width bucket over [lo, hi); clamped into range."""
    t = F.unix_micros(F.col(time_col).cast("timestamp")).cast("double")
    lo_s = F.unix_micros(F.to_timestamp(F.lit(lo))).cast("double")
    hi_s = F.unix_micros(F.to_timestamp(F.lit(hi))).cast("double")
    raw = F.floor((t - lo_s) / ((hi_s - lo_s) / n_buckets))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)).cast("int")


def waveform(
    df: DataFrame,
    time_col: str,
    lo: str,
    hi: str,
    n_buckets: int,
    *,
    flt: Filter | None = None,
    group_by: str | None = None,
) -> DataFrame:
    """Counts per equal time segment (dense: empty buckets -> 0).

    Columns: [group,] bucket, n.
    """
    src = apply_filter(df, flt).filter(
        (F.col(time_col) >= F.to_timestamp(F.lit(lo)))
        & (F.col(time_col) < F.to_timestamp(F.lit(hi)))
    )
    bucketed = src.withColumn("bucket", _bucket_col(time_col, lo, hi, n_buckets))
    spark = df.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    if group_by:
        counts = bucketed.groupBy(group_by, "bucket").agg(F.count(F.lit(1)).alias("n"))
        groups = src.select(group_by).distinct()
        dense = groups.crossJoin(buckets)
        return (
            dense.join(counts, [group_by, "bucket"], "left")
            .withColumn("n", F.coalesce("n", F.lit(0)))
            .orderBy(group_by, "bucket")
        )
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    return (
        buckets.join(counts, "bucket", "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .orderBy("bucket")
    )


def waveforms(
    df: DataFrame,
    time_col: str,
    lo: str,
    hi: str,
    n_buckets: int,
    named_filters: dict[str, Filter],
    *,
    constraint: Filter | None = None,
) -> DataFrame:
    """Many named waveforms in ONE scan (dense). Columns: name, bucket, n.

    The reference Analytics query carries a MAP of named filters and
    answers one waveform per name over the same answer mask
    (``AnalyticsQuery.analyticsFilters``; ``Analytics.java:142-199``
    loops the names). Spark recipe: conditional aggregation — one
    ``sum(when(filter, 1))`` column per name in a single
    groupBy(bucket), then melt — N waveforms cost one scan + one
    shuffle, not N of either. ``constraint`` is the shared answer mask.
    """
    from miru_spark.query.filters import to_column

    src = apply_filter(df, constraint).filter(
        (F.col(time_col) >= F.to_timestamp(F.lit(lo)))
        & (F.col(time_col) < F.to_timestamp(F.lit(hi)))
    )
    bucketed = src.withColumn("bucket", _bucket_col(time_col, lo, hi, n_buckets))
    names = sorted(named_filters)
    aggs = [
        F.sum(F.when(to_column(df, named_filters[nm]), 1).otherwise(0)).alias(nm)
        for nm in names
    ]
    per_bucket = bucketed.groupBy("bucket").agg(*aggs)
    melted = per_bucket.select(
        "bucket",
        F.explode(
            F.array(*[
                F.struct(F.lit(nm).alias("name"), F.col(nm).cast("long").alias("n"))
                for nm in names
            ])
        ).alias("wf"),
    ).select(F.col("wf.name").alias("name"), "bucket", F.col("wf.n").alias("n"))
    spark = df.sparkSession
    dense = (
        spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
        .crossJoin(spark.createDataFrame([(nm,) for nm in names], "name string"))
    )
    return (
        dense.join(melted, ["name", "bucket"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .orderBy("name", "bucket")
    )


def metrics(
    df: DataFrame,
    time_col: str,
    value_col: str,
    *,
    bucket: str = "day",
    flt: Filter | None = None,
) -> DataFrame:
    """sum/avg/count of a numeric column per calendar bucket.

    Columns: bucket_ts, sum_value, avg_value, n."""
    src = apply_filter(df, flt)
    return (
        src.groupBy(F.date_trunc(bucket, F.col(time_col)).alias("bucket_ts"))
        .agg(
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("bucket_ts")
    )


def anomaly(
    df: DataFrame,
    time_col: str,
    value_col: str,
    *,
    bucket: str = "day",
    sigma: float = 2.0,
    flt: Filter | None = None,
) -> DataFrame:
    """Buckets whose sum deviates from the mean by > sigma stddevs.

    Columns: bucket_ts, sum_value, zscore, is_anomaly."""
    sums = metrics(df, time_col, value_col, bucket=bucket, flt=flt).select(
        "bucket_ts", "sum_value"
    )
    stats = sums.select(
        F.avg("sum_value").alias("mu"), F.stddev_pop("sum_value").alias("sd")
    )
    return (
        sums.crossJoin(F.broadcast(stats))
        .withColumn(
            "zscore",
            F.when(F.col("sd") > 0, (F.col("sum_value") - F.col("mu")) / F.col("sd")).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn("is_anomaly", F.abs(F.col("zscore")) > sigma)
        .select("bucket_ts", "sum_value", "zscore", "is_anomaly")
        .orderBy("bucket_ts")
    )


def stumptown_tail(
    df: DataFrame,
    time_col: str,
    id_col: str,
    n: int,
    *,
    flt: Filter | None = None,
) -> DataFrame:
    """Last-N matching events, newest first (log-tail view)."""
    return apply_filter(df, flt).orderBy(
        F.col(time_col).desc(), F.col(id_col).desc()
    ).limit(n)
