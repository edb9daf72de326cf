"""Collaborative-filtering recommendation — miru's 3-hop graph join.

Reference: miru-reco-plugins ``.../reco/CollaborativeFiltering.java:55-213``:
(1) gather the seed's items; (2) OR those item bitmaps, AND NOT mine ->
contributor users scored by shared-item count, top-N heap (129-131);
(3) gather contributors' other items, score = Σ contributor counts,
top-N (177-212). Spark recipe: the same three hops as two self-joins +
two groupBys; the small seed-item and contributor sets are broadcast so
only the activity table is scanned distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.query.filters import Filter, apply_filter


def collaborative_filter(
    df: DataFrame,
    user_col: str,
    item_col: str,
    seed_user,
    *,
    flt: Filter | None = None,
    n_contributors: int = 100,
    k: int = 10,
) -> DataFrame:
    """Items recommended for ``seed_user``. Columns: item, score.

    score(item) = Σ over contributing users of their shared-item count
    with the seed; deterministic tie-break (score desc, item asc).
    """
    src = apply_filter(df, flt).select(
        F.col(user_col).alias("user"), F.col(item_col).alias("item")
    ).distinct()

    mine = src.filter(F.col("user") == seed_user).select("item")

    # hop 2: users sharing my items, scored by number of shared items
    contributors = (
        src.join(F.broadcast(mine), "item", "left_semi")
        .filter(F.col("user") != seed_user)
        .groupBy("user")
        .agg(F.count(F.lit(1)).alias("shared"))
        .orderBy(F.col("shared").desc(), F.col("user"))
        .limit(n_contributors)
    )

    # hop 3: contributors' other items, weighted by contributor score
    return (
        src.join(F.broadcast(contributors), "user")
        .join(F.broadcast(mine), "item", "left_anti")  # exclude already-seen
        .groupBy("item")
        .agg(F.sum("shared").alias("score"))
        .orderBy(F.col("score").desc(), F.col("item"))
        .limit(k)
    )
