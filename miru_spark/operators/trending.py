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
