"""miru's gather/distinct/count query family as DataFrame recipes.

Reference operators re-expressed (SURVEY §2.5):
- Distincts: distinct values of a field among matching docs, optional
  prefix filter (reference: miru-reco-plugins
  ``.../distincts/Distincts.java:41-157``, dictionary fast path 85-97).
- DistinctCount / Uniques: number of distinct values
  (``DistinctCount.java:30-113``, ``UniquesInjectable.java:34-58``).
- AggregateCounts: stream-view rollup — per distinct pivot value the
  number of collapsed docs, newest/oldest timestamps, newest doc
  (``AggregateCounts.java:90-376``: dedup loop 260-373). The reference
  walks the answer bitmap newest-first collapsing repeats; the Spark
  recipe is a window ``row_number()==1`` + per-group aggregates — same
  result, one shuffle.
- gather: distinct terms of a pivot field over matching docs, optionally
  with counts (``MiruAggregateUtil.java:654-768``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miru_spark.query.filters import Filter, apply_filter


def distincts(
    df: DataFrame, fld: str, *, flt: Filter | None = None, prefix: str | None = None
) -> DataFrame:
    """Distinct values of ``fld`` among matching rows, sorted. Columns: value."""
    out = apply_filter(df, flt).select(F.col(fld).alias("value"))
    if prefix:
        out = out.filter(F.col("value").startswith(prefix))
    return out.distinct().orderBy("value")


def distinct_count(df: DataFrame, fld: str, *, flt: Filter | None = None, approx: bool = False) -> DataFrame:
    """Exact (or HLL-approx) distinct count. Columns: n_distinct."""
    src = apply_filter(df, flt)
    agg = F.approx_count_distinct(fld) if approx else F.countDistinct(fld)
    return src.select(agg.alias("n_distinct"))


def uniques(df: DataFrame, fld: str, by: str, *, flt: Filter | None = None) -> DataFrame:
    """Distinct count of ``fld`` per ``by`` group. Columns: by, n_distinct."""
    return (
        apply_filter(df, flt)
        .groupBy(by)
        .agg(F.countDistinct(fld).alias("n_distinct"))
        .orderBy(by)
    )


def gather(
    df: DataFrame, pivot: str, *, flt: Filter | None = None, with_counts: bool = True,
    id_col: str | None = None,
) -> DataFrame:
    """Distinct pivot terms over matching rows (+counts, min/max doc ids).

    ``id_col``: also emit min_id/max_id per term — the reference's gather
    streams (firstId, termId, count) and tracks the id range per term
    (``MiruAggregateUtil.java:654-768``). For multi-valued pivots pass an
    exploded column upstream."""
    src = apply_filter(df, flt)
    if with_counts:
        aggs = [F.count(F.lit(1)).alias("n")]
        if id_col:
            aggs += [F.min(id_col).alias("min_id"), F.max(id_col).alias("max_id")]
        return src.groupBy(F.col(pivot).alias("term")).agg(*aggs).orderBy("term")
    return src.select(F.col(pivot).alias("term")).distinct().orderBy("term")


def gather_features(
    df: DataFrame,
    pivot: str,
    feature_cols: list[str],
    *,
    flt: Filter | None = None,
    k: int = 10,
) -> DataFrame:
    """Top-k feature-value tuples per pivot value by multiset count.

    Reference: ``MiruAggregateUtil.gatherFeatures`` (miru-plugin
    ``.../solution/MiruAggregateUtil.java:75-447``, permutation emit
    408-439) — per answer term, count feature-field term tuples and keep
    the top-N per feature via a bounded heap. Spark recipe: one
    groupBy(pivot, features) + one window rank — the heap is the rank
    filter. For multi-valued feature columns pass exploded columns
    upstream. Columns: <pivot>, <features...>, n, rank.
    """
    src = apply_filter(df, flt)
    counts = src.groupBy(pivot, *feature_cols).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(pivot).orderBy(F.col("n").desc(), *[F.col(c) for c in feature_cols])
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(pivot, "rank")
    )


def catwalk_fit(
    df: DataFrame,
    feature_cols: list[str],
    positive,
    *,
    flt: Filter | None = None,
    min_denominator: int = 1,
) -> DataFrame:
    """Build a Strut/Catwalk-style model from feature counts.

    Reference: the catwalk service computes, per feature value, a
    numerator (matching docs that are also in the positive answer set)
    over a denominator (all matching docs with that value) — the
    ``FeatureScore{numerators, denominator}`` rows of
    ``miru-catwalk-shared/.../FeatureScore.java:15-18``, consumed by
    ``StrutModelScorer``. Spark recipe: melt the feature columns into
    (feature, value) pairs with ONE scan (explode of a struct array,
    not one pass per feature), then a single groupBy computing both
    counts; weight = numerator / denominator.

    ``positive``: a Column predicate marking the positive set (the
    reference's gatherFilter answer). Columns: feature, value,
    numerator, denominator, weight — feed ``weights_dict`` of the
    result straight into ``strut_score``.
    """
    src = apply_filter(df, flt)
    pairs = F.explode(
        F.array(*[
            F.struct(F.lit(c).alias("feature"), F.col(c).cast("string").alias("value"))
            for c in feature_cols
        ])
    )
    melted = src.select(pairs.alias("fv"), F.when(positive, 1).otherwise(0).alias("pos"))
    return (
        melted.select(F.col("fv.feature").alias("feature"), F.col("fv.value").alias("value"), "pos")
        .groupBy("feature", "value")
        .agg(F.sum("pos").alias("numerator"), F.count(F.lit(1)).alias("denominator"))
        .filter(F.col("denominator") >= min_denominator)
        .withColumn("weight", F.col("numerator") / F.col("denominator"))
        .orderBy("feature", "value")
    )


def catwalk_fit_incremental(
    df: DataFrame,
    feature_cols: list[str],
    positive,
    cache_dir: str,
    *,
    id_col: str = "doc_id",
    flt: Filter | None = None,
    min_denominator: int = 1,
) -> DataFrame:
    """Incrementally maintained Catwalk model — the reference's
    lastId-versioned Strut model cache (``StrutModelScorer.java:208-238``
    scores carry a per-term lastId; terms whose lastId trails the
    activity index are rescored over only the NEW activity,
    ``MiruAggregateUtil.java:109-247``), re-expressed as a watermarked
    additive materialized view.

    The model's per-(feature, value) ``numerator``/``denominator`` are
    pure sums, so the delta fit over ``id_col > last_doc_id`` rows (a
    pushed-down scan predicate — at 100 TB the delta touches only new
    partitions) merges with the cached counts by one tiny groupBy-sum
    over (cached model ∪ delta model). Commit protocol: the merged
    model is written to a fresh epoch directory, then ``meta.json`` —
    carrying the model pointer, the ``last_doc_id`` watermark, and a
    config fingerprint in ONE document — is swapped in with a single
    atomic ``os.replace``. A crash anywhere before that replace leaves
    the old meta pointing at the old epoch (orphaned epoch dirs are
    swept on the next refresh), and a replayed refresh re-reads the
    committed watermark, so it recomputes the same delta instead of
    double-counting it.

    Returns the refreshed model with the same columns/order as
    :func:`catwalk_fit`; repeated calls with an unchanged corpus return
    the cache without any aggregation job. Calling with a different
    ``feature_cols``/``positive``/``flt`` than the cache was built with
    raises (mixing partial sums from different configs would silently
    corrupt the weights) — use a fresh ``cache_dir`` per model config.

    Assumes an append-only corpus (miru's activity index is append-only;
    removals there version-bump rather than mutate) and row-local
    ``positive``/``flt`` predicates — a predicate over global state
    would make the cached partial sums unmergeable.
    """
    import hashlib
    import json
    import shutil

    spark = df.sparkSession
    meta_path = os.path.join(cache_dir, "meta.json")
    fingerprint = hashlib.md5(
        repr((sorted(feature_cols), str(positive), str(flt), id_col)).encode()
    ).hexdigest()
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        cached_fp = meta.get("fingerprint")
        if cached_fp is not None and cached_fp != fingerprint:
            raise ValueError(
                "catwalk_fit_incremental: cache at %r was built with a different "
                "feature_cols/positive/flt config; partial sums are unmergeable — "
                "use a fresh cache_dir" % cache_dir
            )
    last_id = int(meta["last_doc_id"]) if meta else -1
    model_dir = os.path.join(cache_dir, meta["model_rel"]) if meta else None

    new_max = df.agg(F.max(F.col(id_col).cast("long")).alias("m")).collect()[0]["m"]
    new_max = -1 if new_max is None else int(new_max)
    if new_max > last_id:
        delta = df.filter(F.col(id_col).cast("long") > last_id)
        delta_model = catwalk_fit(
            delta, feature_cols, positive, flt=flt, min_denominator=1
        ).select("feature", "value", "numerator", "denominator")
        if model_dir is not None:
            merged = (
                spark.read.parquet(model_dir)
                .select("feature", "value", "numerator", "denominator")
                .unionByName(delta_model)
                .groupBy("feature", "value")
                .agg(
                    F.sum("numerator").alias("numerator"),
                    F.sum("denominator").alias("denominator"),
                )
            )
        else:
            merged = delta_model
        epoch = (int(meta["epoch"]) if meta else 0) + 1
        next_rel = "model-%06d" % epoch
        next_dir = os.path.join(cache_dir, next_rel)
        shutil.rmtree(next_dir, ignore_errors=True)
        merged.write.mode("overwrite").parquet(next_dir)
        os.makedirs(cache_dir, exist_ok=True)
        tmp_meta = meta_path + ".tmp"
        with open(tmp_meta, "w") as f:
            json.dump(
                {
                    "last_doc_id": new_max,
                    "model_rel": next_rel,
                    "epoch": epoch,
                    "fingerprint": fingerprint,
                },
                f,
            )
        os.replace(tmp_meta, meta_path)  # the commit point
        for name in os.listdir(cache_dir):  # sweep pre-commit orphans + old epochs
            if name.startswith("model-") and name != next_rel:
                shutil.rmtree(os.path.join(cache_dir, name), ignore_errors=True)
        model_dir = next_dir

    if model_dir is None:
        return spark.createDataFrame(
            [],
            "feature string, value string, numerator bigint, "
            "denominator bigint, weight double",
        )
    return (
        spark.read.parquet(model_dir)
        .filter(F.col("denominator") >= min_denominator)
        .withColumn("weight", F.col("numerator") / F.col("denominator"))
        .select("feature", "value", "numerator", "denominator", "weight")
        .orderBy("feature", "value")
    )


def catwalk_weights(model_df: DataFrame) -> dict[str, dict[str, float]]:
    """Collect a (small) fitted model into the broadcastable nested-dict
    shape ``strut_score`` consumes: {feature_col: {value: weight}}."""
    out: dict[str, dict[str, float]] = {}
    for r in model_df.collect():
        out.setdefault(r["feature"], {})[r["value"]] = float(r["weight"])
    return out


def strut_score(
    df: DataFrame,
    id_col: str,
    feature_weights: dict[str, dict[str, float]],
    *,
    flt: Filter | None = None,
    strategy: str = "sum",  # sum (REGRESSION_WEIGHTED) | max (MAX) | unit_weighted
    k: int = 10,
) -> DataFrame:
    """Model-based scoring: broadcast feature->weight maps, score rows.

    Reference: Strut scoring multiplies gathered feature counts by a
    cached model's weights with UNIT_WEIGHTED/REGRESSION_WEIGHTED/MAX
    strategies (miru-stream-plugins ``.../strut/Strut.java:367-397``
    ``finalizeScore``: REGRESSION_WEIGHTED = Σ positive legs,
    UNIT_WEIGHTED = Σ positive legs / number of legs, MAX = max positive
    leg; model ``StrutModelScorer``). Spark recipe: the (small) model
    becomes literal map lookups folded into one JVM expression — the
    broadcast model cache without a join. Non-matching legs resolve to 0,
    which matches the reference's scores[i] > 0 guard for all three
    strategies since model weights are non-negative.
    Columns: <id_col>, score (desc, id asc).
    """
    src = apply_filter(df, flt)
    legs = []
    for col, weights in feature_weights.items():
        if not weights:
            continue
        pairs = []
        for value, weight in sorted(weights.items()):
            pairs.extend([F.lit(value), F.lit(float(weight))])
        legs.append(F.coalesce(F.create_map(*pairs)[F.col(col)], F.lit(0.0)))
    if not legs:
        score = F.lit(0.0)
    elif strategy in ("sum", "unit_weighted"):
        score = legs[0]
        for leg in legs[1:]:
            score = score + leg
        if strategy == "unit_weighted":
            score = score / F.lit(float(len(legs)))
    elif strategy == "max":
        score = F.greatest(*legs) if len(legs) > 1 else legs[0]
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return (
        src.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def aggregate_counts(
    df: DataFrame,
    pivot: str,
    time_col: str,
    id_col: str,
    *,
    flt: Filter | None = None,
    k: int | None = None,
    start_from: int = 0,
    after: tuple | None = None,
    read_state: DataFrame | None = None,
) -> DataFrame:
    """Stream-view rollup: newest doc per distinct pivot value + collapse
    stats, newest-first — one window + one aggregate, vs the reference's
    descending bitmap walk with a dedup set (AggregateCounts.java:260-373).

    Columns: <pivot>, n_collapsed, latest_time, oldest_time, latest_id.
    ``k`` = desiredNumberOfDistincts, ``start_from`` = startFromDistinctN
    (``AggregateCountsQueryConstraint.java:16-17`` paging pair): rows
    ranked [start_from, start_from+k) in the newest-first total order.

    Paging is KEYSET-based, like ``search``'s ``after=``: pass the last
    row's ``after=(latest_time, pivot)`` to get the next page as a pure
    filter + top-k (no global ranking anywhere in the plan). A numeric
    ``start_from`` is honored for reference-API parity by deriving that
    cursor from a bounded TakeOrderedAndProject over ``start_from`` slim
    rows — never an unpartitioned row_number window, whose single-task
    sort would serialize the whole relation at corpus scale.

    ``read_state``: optional (<id_col>, read boolean) relation — e.g.
    ``inbox.resolve_read_state`` output — adding per-pivot ``n_unread``
    and ``any_unread``, the reference's unread flags computed against the
    unread bitmap (``AggregateCounts.java:194-201, 315-322``). Docs
    absent from the relation count as unread (the default state).
    """
    src = apply_filter(df, flt)
    unread_aggs = []
    if read_state is not None:
        rs = read_state.select(F.col(id_col), F.col("read").alias("_read"))
        src = src.join(rs, id_col, "left").withColumn(
            "_unread", ~F.coalesce(F.col("_read"), F.lit(False))
        )
        unread_aggs = [
            F.sum(F.when(F.col("_unread"), 1).otherwise(0)).alias("n_unread"),
            F.bool_or(F.col("_unread")).alias("any_unread"),
        ]
    w = Window.partitionBy(pivot).orderBy(F.col(time_col).desc(), F.col(id_col).desc())
    rolled = (
        src.withColumn("_rn", F.row_number().over(w))
        .groupBy(pivot)
        .agg(
            F.count(F.lit(1)).alias("n_collapsed"),
            F.max(time_col).alias("latest_time"),
            F.min(time_col).alias("oldest_time"),
            F.max(F.when(F.col("_rn") == 1, F.col(id_col))).alias("latest_id"),
            *unread_aggs,
        )
        .orderBy(F.col("latest_time").desc(), F.col(pivot))
    )
    if after is None and start_from:
        # derive the keyset cursor: the start_from-th row's sort key, via
        # a bounded distributed top-N heap (TakeOrderedAndProject) over
        # two slim columns — the page offset never forces a global sort
        edge = (
            rolled.select("latest_time", F.col(pivot).alias("_p"))
            .orderBy(F.col("latest_time").desc(), F.col("_p"))
            .limit(start_from)
            .orderBy(F.col("latest_time").asc(), F.col("_p").desc())
            .limit(1)
            .collect()
        )
        if not edge:  # fewer than start_from rows exist -> empty page
            return rolled.limit(0)
        after = (edge[0]["latest_time"], edge[0]["_p"])
    if after is not None:
        a_time, a_pivot = after
        rolled = rolled.filter(
            (F.col("latest_time") < F.lit(a_time))
            | ((F.col("latest_time") == F.lit(a_time)) & (F.col(pivot) > F.lit(a_pivot)))
        )
    return rolled.limit(k) if k else rolled
