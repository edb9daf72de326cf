"""Latest-per-key views — miru's *IndexLatest / pairedLatest features.

Reference: write-time "latest id per distinct field value" bitmaps
(miru-service ``.../stream/MiruIndexLatest.java:26-77`` — andNot the old
id, set the new; paired variant ``MiruIndexPairedLatest.java``). In Spark
this is a read-time window: ``row_number() over (partition by key order
by time desc, id desc) == 1`` — no write-time state to maintain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miru_spark.query.filters import Filter, apply_filter


def latest_by(
    df: DataFrame,
    key_cols: list[str] | str,
    time_col: str,
    id_col: str,
    *,
    flt: Filter | None = None,
) -> DataFrame:
    """Newest row per key (single key = IndexLatest; multiple =
    pairedLatest). Preserves all input columns."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    src = apply_filter(df, flt)
    w = Window.partitionBy(*keys).orderBy(F.col(time_col).desc(), F.col(id_col).desc())
    return src.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
