"""Deterministic corpus sampling / per-source caps for training-data
pipelines.

Web-scale corpora are never consumed whole: pipelines take reproducible
subsamples (ablations, mixture weights) and cap per-domain document
counts (a few hosts dominate any crawl — the Zipf tail of the web).
Both ops here are pure functions of the data, so results are identical
across runs, partitionings, and cluster sizes:

- ``sample_by_hash`` thresholds an md5-derived uniform hash of the key
  (md5 is engine-stable: Spark, DuckDB, and Python agree byte-for-byte,
  unlike xxhash64/DuckDB-hash which differ across engines) — the
  standard "hash-mod sampling" that composes: a 10% sample of a 50%
  sample with different seeds behaves like independent draws.
- ``cap_per_key`` keeps the first ``n`` rows per key under a
  deterministic order — one shuffle on the key; the per-key state is a
  bounded window, never a collected list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^32 buckets from the first 8 hex digits of md5 — uniform enough for
# sampling, cheap to reproduce in ANSI SQL
_BUCKETS = 1 << 32


def hash_bucket(key_col, seed: int = 0, *, salt: str = ""):
    """Uniform int bucket in [0, 2^32) from md5(key || ':' || seed || salt).

    ``salt`` appends extra derivation context (e.g. ``":{epoch}"``) so
    every hash-keyed op in this module derives buckets through the ONE
    expression — a change to the bucketing (hash, width) lands everywhere
    at once instead of silently diverging between copies."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}{salt}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def sample_by_hash(
    df: DataFrame, key_col: str, rate: float, *, seed: int = 0
) -> DataFrame:
    """Deterministic ``rate``-fraction subsample keyed on ``key_col``.

    Same key -> same verdict everywhere, so joins between independently
    sampled relations stay consistent (sample docs and their features
    with the same key/seed and the subsets align)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thresh = int(rate * _BUCKETS)
    return df.filter(hash_bucket(key_col, seed) < F.lit(thresh))


def cap_per_key(
    df: DataFrame, key_col: str, n: int, *, order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep at most ``n`` rows per key, lowest ``order_col`` first (the
    per-domain cap of crawl pipelines). Determinism requires the order
    to be TOTAL within each key: pass a unique ``order_col`` (e.g. a
    doc id) or add ``tiebreak_col`` — with a non-unique order alone,
    tied rows are kept/dropped by shuffle arrival order, which varies
    across runs and partitionings."""
    from pyspark.sql import Window

    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def temperature_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    *,
    alpha: float = 0.5,
    total_rate: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based source re-mixing: sample so the kept corpus's
    source shares follow ``count_s^alpha`` (normalized) instead of the
    raw counts — the multilingual/multi-source mixing rule of
    mBERT/XLM-R/T5-style pipelines (alpha < 1 flattens the source
    distribution, boosting tail sources relative to head ones).

    Per-source keep rate: ``min(1, total_rate * N * p_target(s) /
    count_s)`` with ``p_target(s) = count_s^alpha / sum_t count_t^alpha``;
    the doc-level keep decision is the same deterministic md5-bucket
    threshold as :func:`sample_by_hash`, so results are identical across
    runs, partitionings, and cluster sizes, and compose with the other
    hash-keyed sampling ops (independent seeds -> independent draws).

    Head sources may be unable to donate enough mass for small alpha
    (rate caps at 1); the realized total is then below ``total_rate`` —
    the standard behavior of mixing-by-downsampling (no upsampling).

    Plan: one groupBy for source counts (tiny relation) -> rates as a
    single declarative expression -> broadcast-join back -> hash-filter.
    No collect, no window over the corpus; one small shuffle.
    """
    if not 0.0 < total_rate <= 1.0:
        raise ValueError(f"total_rate must be in (0, 1], got {total_rate}")
    cnt = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__c"))
    tot = cnt.agg(
        F.sum("__c").alias("__n"),
        F.sum(F.pow("__c", F.lit(alpha))).alias("__z"),
    )
    rates = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                F.lit(total_rate) * F.col("__n")
                * F.pow("__c", F.lit(alpha)) / F.col("__z") / F.col("__c"),
            ).alias("__rate"),
        )
    )
    out = (
        df.join(F.broadcast(rates), source_col)
        # floor, not cast: SQL engines round on double->int casts while
        # Spark truncates — floor() agrees everywhere, keeping the
        # threshold reproducible in ANSI-SQL oracles
        .filter(hash_bucket(key_col, seed) < F.floor(F.col("__rate") * _BUCKETS))
        .drop("__rate")
    )
    return out


def split_corpus(
    df: DataFrame, key_col: str, weights: dict[str, float], *, seed: int = 0
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment: adds a
    ``split`` column by consecutive hash-bucket ranges in the dict's
    insertion order. ``weights`` must sum to 1 (within 1e-9) so the
    assignment is total — every row lands in exactly one split, the
    same one on every run, partitioning, and cluster size, and (unlike
    ``randomSplit``) membership is a pure function of the KEY: a doc
    keeps its split across reprocessing runs and across relations keyed
    the same way (features, embeddings, labels stay on the same side of
    the wall — no train/test leakage through re-randomization).

    Plan: one narrow projection, no shuffle; the bucket expression is
    ANSI-SQL-reproducible (md5, like :func:`sample_by_hash`).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    bucket = hash_bucket(key_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < F.lit(int(acc * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def epoch_shuffle(
    df: DataFrame, key_col: str, *, epoch: int = 0, seed: int = 0
) -> DataFrame:
    """Deterministic global training order for one epoch: adds a
    ``shuffle_key`` column (md5 bucket of ``key:seed:epoch``) and
    returns the frame ordered by ``(shuffle_key, key)`` — a total order,
    reproducible across runs and cluster sizes, different per epoch.

    This is the corpus-shuffle step of a training-data pipeline (docs
    must arrive in a different, but reproducible, order each epoch).
    Spark executes the orderBy as a range-partitioned sort (sampled
    range exchange + per-partition sort) — the scale shape; no global
    single-partition window, no driver collect. Writers persist the
    order with ``df.write`` after this (parquet part files preserve
    within-partition order and the range partitioner makes part file
    order = global order).
    """
    # fold the epoch into the hashed key (via the shared hash_bucket
    # salt), not into a post-hash arithmetic tweak: independent epochs
    # need independent permutations
    bucket = hash_bucket(key_col, seed, salt=f":{epoch}")
    return (
        df.withColumn("shuffle_key", bucket)
        .orderBy(F.col("shuffle_key"), F.col(key_col))
    )
