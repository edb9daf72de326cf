"""Trending: per-term waveforms + peak detection / recency ranking.

Reference: miru-reco-plugins ``.../trending/TrendingQuestion.java:65-181``
builds per-distinct-term waveforms (boundedCardinalities) and the client
runs Billauer peak detection (``.../PeakDet.java:9-117``). Here:
- ``trending``: rank terms by recent-window share vs their total — a pure
  DataFrame recipe (two conditional counts, one shuffle).
- ``peakdet``: a faithful reimplementation of the Billauer algorithm
  (pure function), applied per-term over waveforms with ``applyInPandas``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.query.filters import Filter, apply_filter


def trending(
    df: DataFrame,
    term_col: str,
    time_col: str,
    recent_lo: str,
    *,
    flt: Filter | None = None,
    k: int = 10,
    min_total: int = 1,
) -> DataFrame:
    """Terms ranked by activity in the recent window relative to total.

    Columns: term, recent_n, total_n, ratio. Deterministic tie-break
    (ratio desc, recent_n desc, term asc)."""
    src = apply_filter(df, flt)
    recent = F.col(time_col) >= F.to_timestamp(F.lit(recent_lo))
    return (
        src.groupBy(F.col(term_col).alias("term"))
        .agg(
            F.sum(F.when(recent, 1).otherwise(0)).alias("recent_n"),
            F.count(F.lit(1)).alias("total_n"),
        )
        .filter(F.col("total_n") >= min_total)
        .withColumn("ratio", F.col("recent_n") / F.col("total_n"))
        .orderBy(F.col("ratio").desc(), F.col("recent_n").desc(), F.col("term"))
        .limit(k)
    )


def peakdet(series: list[float], delta: float) -> tuple[list[tuple[int, float]], list[tuple[int, float]]]:
    """Billauer peak detection: returns (maxima, minima) as (index, value).

    Pure-function reimplementation of the algorithm the reference vendors
    (``PeakDet.java:9-117``): a point is a maximum if followed by a drop
    of at least ``delta`` since the running max, symmetric for minima.
    """
    maxtab: list[tuple[int, float]] = []
    mintab: list[tuple[int, float]] = []
    mn, mx = float("inf"), float("-inf")
    mnpos = mxpos = -1
    lookformax = True
    for i, v in enumerate(series):
        if v > mx:
            mx, mxpos = v, i
        if v < mn:
            mn, mnpos = v, i
        if lookformax:
            if v < mx - delta:
                maxtab.append((mxpos, mx))
                mn, mnpos = v, i
                lookformax = False
        else:
            if v > mn + delta:
                mintab.append((mnpos, mn))
                mx, mxpos = v, i
                lookformax = True
    return maxtab, mintab


def waveform_peaks(
    waveforms: DataFrame, term_col: str, bucket_col: str, n_col: str, delta: float
) -> DataFrame:
    """Per-term peak extraction over bucketed waveforms.

    Input: (term, bucket, n) rows; output: (term, peak_bucket, peak_n).
    Grouped Arrow execution (``applyInPandas``) — each term's waveform is
    tiny, so the Python hop is off the hot path by construction."""

    def _peaks(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col)
        maxtab, _ = peakdet(pdf[n_col].tolist(), delta)
        buckets = pdf[bucket_col].tolist()
        return pd.DataFrame(
            {
                "term": pdf[term_col].iloc[0] if len(pdf) else None,
                "peak_bucket": [buckets[i] for i, _ in maxtab],
                "peak_n": [v for _, v in maxtab],
            }
        )

    return waveforms.groupBy(term_col).applyInPandas(
        _peaks, schema="term string, peak_bucket int, peak_n double"
    )


def trending_strategies(
    df: DataFrame,
    term_col: str,
    time_col: str,
    lo: str,
    hi: str,
    n_buckets: int,
    *,
    flt: Filter | None = None,
    k: int = 10,
    strategies: tuple[str, ...] = ("LINEAR_REGRESSION", "LEADER", "HIGHEST_PEAK", "PEAKS"),
) -> DataFrame:
    """The reference's four trending strategies over per-term waveforms.

    Reference (``TrendingQuery.Strategy`` + scoring loop,
    ``TrendingInjectable.java:140-180``): per term waveform of
    ``n_buckets`` equal segments —
    - LINEAR_REGRESSION: slope of the least-squares fit over the dense
      waveform (empty buckets count as 0);
    - LEADER: total count;
    - HIGHEST_PEAK: max bucket;
    - PEAKS: number of Billauer peaks at threshold
      ``max/6 + bucket95/100`` where bucket95 is the 95th percentile of
      the per-bucket maxima across all terms (``TrendingInjectable.java:
      113-127, 167-170``; percentile estimator differs slightly from
      commons-math — peak *counts* are insensitive to that).

    One scan + one (term, bucket) groupBy feeds every strategy; the
    closed-form slope uses dense-bucket constants, so zeros never
    materialize. PEAKS adds one grouped-Arrow pass over the (tiny)
    per-term waveforms. Columns: strategy, term, score, rank — top-k per
    strategy, ties (score desc, term asc).
    """
    import numpy as np
    from pyspark.sql import Window

    from miru_spark.operators.analytics import _bucket_col

    src = apply_filter(df, flt).filter(
        (F.col(time_col) >= F.to_timestamp(F.lit(lo)))
        & (F.col(time_col) < F.to_timestamp(F.lit(hi)))
    )
    counts = (
        src.select(
            F.col(term_col).alias("term"),
            _bucket_col(time_col, lo, hi, n_buckets).alias("bucket"),
        )
        .groupBy("term", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    # dense-waveform regression constants: x = 0..N-1 including zeros
    N = float(n_buckets)
    sx = N * (N - 1.0) / 2.0
    sxx = (N - 1.0) * N * (2.0 * N - 1.0) / 6.0
    denom = N * sxx - sx * sx

    per_term = counts.groupBy("term").agg(
        F.sum("n").alias("leader"),
        F.max("n").cast("double").alias("highest_peak"),
        F.sum(F.col("bucket").cast("double") * F.col("n")).alias("sxy"),
    )
    score_cols = {
        "LEADER": F.col("leader").cast("double"),
        "HIGHEST_PEAK": F.col("highest_peak"),
        "LINEAR_REGRESSION": (
            (F.lit(N) * F.col("sxy") - F.lit(sx) * F.col("leader")) / F.lit(denom)
        ),
    }
    legs = []
    wanted = [s for s in strategies if s in score_cols]
    if wanted:
        melted = per_term.select(
            "term",
            F.explode(
                F.array(*[
                    F.struct(F.lit(s).alias("strategy"), score_cols[s].alias("score"))
                    for s in wanted
                ])
            ).alias("sc"),
        ).select(F.col("sc.strategy").alias("strategy"), "term", F.col("sc.score").alias("score"))
        legs.append(melted)

    if "PEAKS" in strategies:
        # bucket95: p95 of the per-bucket maxima across terms (dense)
        maxima = {
            int(r["bucket"]): int(r["mx"])
            for r in counts.groupBy("bucket").agg(F.max("n").alias("mx")).collect()
        }
        dense_max = np.array([maxima.get(b, 0) for b in range(n_buckets)], dtype=np.float64)
        bucket95 = float(np.percentile(dense_max, 95)) if dense_max.size else 0.0

        def _peak_count(pdf: pd.DataFrame) -> pd.DataFrame:
            wave = np.zeros(n_buckets, dtype=np.float64)
            wave[pdf["bucket"].to_numpy()] = pdf["n"].to_numpy(dtype=np.float64)
            threshold = wave.max() / 6.0 + bucket95 / 100.0
            maxtab, _ = peakdet(wave.tolist(), threshold)
            return pd.DataFrame(
                {"strategy": ["PEAKS"], "term": [pdf["term"].iloc[0]],
                 "score": [float(len(maxtab))]}
            )

        legs.append(
            counts.groupBy("term").applyInPandas(
                _peak_count, schema="strategy string, term string, score double"
            )
        )

    out = legs[0]
    for leg in legs[1:]:
        out = out.union(leg)
    w = Window.partitionBy("strategy").orderBy(F.col("score").desc(), F.col("term"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("strategy", "rank")
    )
