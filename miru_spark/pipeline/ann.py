"""Approximate-nearest-neighbor similarity search over embedding columns.

Part of the training-pipeline operator set (no reference analogue; the
reference's nearest relative is its bloom candidate pruning). Two paths:

- ``cosine_topk`` — exact brute-force baseline: query vectors broadcast,
  dot products computed JVM-side with ``zip_with``/``aggregate`` (no
  Python in the scan), per-query top-k via window rank. At cluster scale
  this is one full scan per query batch — correct-first baseline and
  verification oracle for the bucketed path.
- ``lsh_topk`` — sign-random-projection LSH: deterministic hyperplanes
  (seeded numpy), per-vector bit signature -> bucket; candidates probe
  only matching buckets (optionally multi-probe by flipping bits), then
  exact re-rank within candidates. The scan is pruned by the bucket
  equi-join; work scales with bucket occupancy, not corpus size.

Also ``cosine_pairs`` — embedding near-duplicate pairs above a cosine
threshold (the embedding leg of the dedup suite).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _f64(col):
    # promote array<float> -> array<double> BEFORE multiplying so products
    # are full-precision (and bit-identical to a float64 oracle)
    return col.cast(T.ArrayType(T.DoubleType()))


def _norm_col(vec_col: str):
    v = _f64(F.col(vec_col))
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(_f64(a), _f64(b), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query. Columns: query_id, vec_id, cos, rank.

    ``queries``: (query_id, embedding). Broadcast-joined against the
    corpus so the big side never shuffles; tie-break (cos desc, vec_id asc).
    """
    from pyspark.sql import Window

    # norms are projected ONCE PER ROW before the join — inside the
    # post-join projection each O(dim) norm aggregate would re-evaluate
    # per (vector, query) pair, tripling the dominant kernel cost
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        _norm_col(vec_col).alias("q_norm"),
    )
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v_vec"),
        _norm_col(vec_col).alias("v_norm"),
    )
    joined = v.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("q_vec"), F.col("v_vec"))
            / (F.col("q_norm") * F.col("v_norm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float64)


def srp_signatures(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_bits: int = 16,
    seed: int = 11,
    n_tables: int = 1,
) -> DataFrame:
    """Sign-random-projection signatures. Columns: id, table, bucket.

    ALL ``n_tables`` tables are computed in ONE pass over the vectors —
    the plane matrices are stacked into one (n_tables*n_bits, dim) GEMM
    per Arrow batch, then split per table. One corpus scan regardless of
    table count (scanning once per table multiplies the dominant cost at
    cluster scale)."""
    planes = np.vstack([_hyperplanes(dim, n_bits, seed + t) for t in range(n_tables)])
    weights = 1 << np.arange(n_bits, dtype=np.int64)

    def _sig(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            bits = (mat @ planes.T) > 0  # (rows, n_tables*n_bits)
            ids = pdf["id"].to_numpy()
            out_ids = np.repeat(ids, n_tables)
            out_tbl = np.tile(np.arange(n_tables, dtype=np.int32), len(ids))
            bt = bits.reshape(len(ids), n_tables, n_bits).astype(np.int64)
            buckets = (bt * weights[None, None, :]).sum(axis=2).reshape(-1)
            yield pd.DataFrame({"id": out_ids, "table": out_tbl, "bucket": buckets})
        yield pd.DataFrame(
            {"id": pd.Series([], dtype="int64"), "table": pd.Series([], dtype="int32"),
             "bucket": pd.Series([], dtype="int64")}
        )

    src = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return src.mapInPandas(_sig, schema="id long, table int, bucket long")


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int,
    n_bits: int = 12,
    n_tables: int = 4,
    seed: int = 11,
    exclude_self: bool = True,
) -> DataFrame:
    """LSH-bucketed cosine top-k: candidates = vectors sharing any of the
    query's ``n_tables`` SRP buckets, exact re-rank within candidates.

    Recall < 1 by design; verified in tests against ``cosine_topk``.
    Columns: query_id, vec_id, cos, rank.
    """
    vs = srp_signatures(vectors, id_col=id_col, vec_col=vec_col, dim=dim,
                        n_bits=n_bits, seed=seed, n_tables=n_tables
                        ).withColumnRenamed("id", "vec_id")
    qs = srp_signatures(queries, id_col=query_id_col, vec_col=vec_col, dim=dim,
                        n_bits=n_bits, seed=seed, n_tables=n_tables
                        ).withColumnRenamed("id", "query_id")
    cands = (
        vs.join(F.broadcast(qs), ["table", "bucket"])
        .select("query_id", "vec_id")
        .distinct()
    )
    if exclude_self:
        cands = cands.filter(F.col("vec_id") != F.col("query_id"))
    # same exact re-rank as the IVF probe path — one implementation
    return _exact_rerank(cands, vectors, queries, k, id_col=id_col,
                         vec_col=vec_col, query_id_col=query_id_col)


def _cosine_pairs_exact(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: int = 4,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via blocked matrix multiply.

    TEST ORACLE ONLY (private since round 5): the ``toPandas`` corpus
    collect runs on the driver, so this shape must never be wired into a
    production path at scale — use ``cosine_pairs`` (LSH-blocked) or
    ``cosine_pairs_blocked`` (block-pair GEMM) instead.

    The full (normalized) corpus matrix is broadcast to executors and each
    Arrow batch computes ``batch @ corpus.T`` in one BLAS call — the exact
    verification oracle for the LSH-blocked ``cosine_pairs``. Feasible up
    to ~1M x low-dim (broadcast size) — beyond that use ``cosine_pairs``.
    Columns: id_a, id_b, cos (id_a < id_b).
    """
    src = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    pdf = src.toPandas()
    all_ids = pdf["id"].to_numpy(np.int64)
    all_mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
    all_norms = np.sqrt((all_mat * all_mat).sum(axis=1))
    bc = vectors.sparkSession.sparkContext.broadcast((all_ids, all_mat, all_norms))

    def _pairs(pdf_iter):
        ids_b, mat_b, norms_b = bc.value
        for batch in pdf_iter:
            if len(batch) == 0:
                continue
            a_ids = batch["id"].to_numpy(np.int64)
            a_mat = np.vstack([np.asarray(v, dtype=np.float64) for v in batch["vec"]])
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            cos = (a_mat @ mat_b.T) / (a_norms[:, None] * norms_b[None, :])
            keep = (cos >= threshold) & (a_ids[:, None] < ids_b[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": a_ids[ai], "id_b": ids_b[bi], "cos": np.round(cos[ai, bi], round_to)}
            )
        yield pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64"),
             "cos": pd.Series([], dtype="float64")}
        )

    return (
        src.mapInPandas(_pairs, schema="id_a long, id_b long, cos double")
        .orderBy("id_a", "id_b")
    )


def cosine_pairs_exact(*args, **kwargs) -> DataFrame:
    """Deprecated public alias of :func:`_cosine_pairs_exact`.

    Kept one release so external callers get a pointer to the scale-safe
    replacements instead of an AttributeError; emits DeprecationWarning.
    """
    import warnings

    warnings.warn(
        "cosine_pairs_exact is a driver-collect test oracle; use "
        "cosine_pairs (LSH) or cosine_pairs_blocked (block-pair GEMM) "
        "at scale. It is now private (_cosine_pairs_exact).",
        DeprecationWarning,
        stacklevel=2,
    )
    return _cosine_pairs_exact(*args, **kwargs)


def cosine_pairs_blocked(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold, fully distributed.

    Classic block-pair decomposition: each vector lands in block
    ``xxhash64(id) % n_blocks``; every unordered block pair (i <= j)
    becomes one task whose Arrow batches compute ``A @ B.T`` with BLAS.
    Rows are replicated ~n_blocks times (each block participates in
    n_blocks pairs), but no corpus-sized driver collect or broadcast —
    the n²  work spreads over n_blocks*(n_blocks+1)/2 independent tasks,
    so the shape survives a 100x scale-up (cost is inherently n², which
    is why the LSH-blocked ``cosine_pairs`` is the default at corpus
    scale; this is the exact verifier/backstop).
    Columns: id_a, id_b, cos (id_a < id_b).
    """
    spark = vectors.sparkSession
    src = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "blk_a int, blk_b int",
    )
    # replicate: side A carries rows for every pair where its block is blk_a,
    # side B likewise; same-block pairs handled once (i == j) with id_a < id_b.
    a = src.join(F.broadcast(pairs), src["blk"] == pairs["blk_a"]).select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "blk_a", "blk_b"
    )
    b = src.join(F.broadcast(pairs), src["blk"] == pairs["blk_b"]).select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "blk_a", "blk_b"
    )

    def _gemm(key, pdf: pd.DataFrame) -> pd.DataFrame:
        a_rows = pdf[pdf["side"] == 0]
        b_rows = pdf[pdf["side"] == 1]
        if len(a_rows) == 0 or len(b_rows) == 0:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64"),
                 "cos": pd.Series([], dtype="float64")}
            )
        a_ids = a_rows["id"].to_numpy(np.int64)
        b_ids = b_rows["id"].to_numpy(np.int64)
        a_mat = np.vstack([np.asarray(v, dtype=np.float64) for v in a_rows["vec"]])
        b_mat = np.vstack([np.asarray(v, dtype=np.float64) for v in b_rows["vec"]])
        a_mat /= np.sqrt((a_mat * a_mat).sum(axis=1))[:, None]
        b_mat /= np.sqrt((b_mat * b_mat).sum(axis=1))[:, None]
        cos = a_mat @ b_mat.T
        keep = cos >= threshold
        if key[0] == key[1]:
            # same block: both sides hold the same rows; id_a < id_b dedups
            keep &= a_ids[:, None] < b_ids[None, :]
        else:
            # cross block: each unordered pair appears exactly once here —
            # canonicalize ids instead of masking (ids aren't ordered by block)
            keep &= a_ids[:, None] != b_ids[None, :]
        ai, bi = np.nonzero(keep)
        lo = np.minimum(a_ids[ai], b_ids[bi])
        hi = np.maximum(a_ids[ai], b_ids[bi])
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cos": np.round(cos[ai, bi], round_to)}
        )

    stacked = (
        a.select("blk_a", "blk_b", F.lit(0).alias("side"),
                 F.col("id_a").alias("id"), F.col("vec_a").alias("vec"))
        .unionByName(
            b.select("blk_a", "blk_b", F.lit(1).alias("side"),
                     F.col("id_b").alias("id"), F.col("vec_b").alias("vec"))
        )
    )
    return (
        stacked.groupBy("blk_a", "blk_b")
        .applyInPandas(_gemm, schema="id_a long, id_b long, cos double")
        .orderBy("id_a", "id_b")
    )


def cosine_pairs(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 8,
    n_tables: int = 6,
    seed: int = 23,
) -> DataFrame:
    """Embedding near-duplicate pairs (cos >= threshold), LSH-blocked.

    Columns: id_a, id_b, cos. High-cosine pairs collide in at least one
    low-bit SRP table with high probability; exact cosine verifies."""
    sig = srp_signatures(vectors, id_col=id_col, vec_col=vec_col, dim=dim,
                         n_bits=n_bits, seed=seed, n_tables=n_tables)
    a = sig.alias("a")
    b = sig.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    v_a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
                         _norm_col(vec_col).alias("norm_a"))
    v_b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
                         _norm_col(vec_col).alias("norm_b"))
    return (
        cands.join(v_a, "id_a")
        .join(v_b, "id_b")
        .withColumn(
            "cos",
            _dot(F.col("vec_a"), F.col("vec_b")) / (F.col("norm_a") * F.col("norm_b")),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        .orderBy("id_a", "id_b")
    )


def _exact_rerank(cands, vectors, queries, k, *, id_col, vec_col, query_id_col):
    """Exact cosine re-rank of (query_id, vec_id) candidates; shared by
    the LSH and IVF probe paths. Norms are projected once per row before
    the join (per-pair re-evaluation would triple the kernel cost)."""
    from pyspark.sql import Window

    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"),
                       _norm_col(vec_col).alias("v_norm"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"),
                       _norm_col(vec_col).alias("q_norm"))
    scored = (
        cands.join(v, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("q_vec"), F.col("v_vec"))
                / (F.col("q_norm") * F.col("v_norm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
        .orderBy("query_id", "rank")
    )


def ivf_train(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    n_centroids: int = 64,
    iters: int = 5,
    seed: int = 11,
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer (the IVF training
    step): seeded unit-vector init, Lloyd's iterations where each
    executor emits only per-partition partial sums ``(centroid, n,
    Σvec)`` — k rows per partition — and the driver reduces a k×dim
    matrix. No iteration ever shuffles the corpus; per-iteration cost is
    one scan + one tiny collect, and driver state is k×dim regardless of
    corpus size. Assignment is one GEMM per Arrow batch."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_centroids, dim)).astype(np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    src = vectors.select(F.col(vec_col).alias("vec"))
    for _ in range(iters):
        c = cents  # close over this iteration's matrix

        def _partials(pdf_iter, c=c):
            agg_n = np.zeros(len(c), dtype=np.int64)
            agg_s = np.zeros_like(c)
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
                mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                a = np.argmax(mat @ c.T, axis=1)
                agg_n += np.bincount(a, minlength=len(c))
                np.add.at(agg_s, a, mat)
            nz = np.flatnonzero(agg_n)
            yield pd.DataFrame(
                {"cid": nz.astype(np.int32), "n": agg_n[nz],
                 "s": [agg_s[i].tolist() for i in nz]}
            )

        rows = src.mapInPandas(
            _partials, schema="cid int, n long, s array<double>"
        ).collect()
        n = np.zeros(len(cents), dtype=np.int64)
        s = np.zeros_like(cents)
        for r in rows:
            n[r["cid"]] += r["n"]
            s[r["cid"]] += np.asarray(r["s"], dtype=np.float64)
        upd = np.flatnonzero(n)
        new = cents.copy()
        new[upd] = s[upd] / np.maximum(
            np.linalg.norm(s[upd], axis=1, keepdims=True), 1e-12
        )
        cents = new
    return cents


def _ivf_assign(df: DataFrame, cents: np.ndarray, id_col: str, vec_col: str,
                nprobe: int, out_id: str) -> DataFrame:
    """Top-``nprobe`` nearest centroids per vector (one GEMM per batch)."""

    def _assign(pdf_iter):
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ cents.T
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {"id": np.repeat(ids, nprobe),
                 "centroid": top.reshape(-1).astype(np.int32)}
            )
        yield pd.DataFrame(
            {"id": pd.Series([], dtype="int64"),
             "centroid": pd.Series([], dtype="int32")}
        )

    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return src.mapInPandas(_assign, schema="id long, centroid int").withColumnRenamed(
        "id", out_id
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int,
    n_centroids: int = 32,
    nprobe: int = 4,
    iters: int = 5,
    seed: int = 11,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-flat ANN: spherical-k-means coarse quantizer, corpus vectors
    inverted by nearest centroid, queries probe their ``nprobe`` nearest
    lists, exact cosine re-rank within the probed lists. Work per query
    scales with probed-list occupancy (~nprobe/k of the corpus), not
    corpus size; recall < 1 by design (tested against ``cosine_topk``).
    Columns: query_id, vec_id, cos, rank."""
    # probing more lists than exist is just "probe everything" — clamp
    # instead of letting the assign kernel crash on mismatched arrays
    nprobe = min(nprobe, n_centroids)
    cents = ivf_train(
        vectors, vec_col=vec_col, dim=dim, n_centroids=n_centroids,
        iters=iters, seed=seed,
    )
    inv = _ivf_assign(vectors, cents, id_col, vec_col, 1, "vec_id")
    probes = _ivf_assign(queries, cents, query_id_col, vec_col, nprobe, "query_id")
    cands = inv.join(F.broadcast(probes), "centroid").select("query_id", "vec_id").distinct()
    if exclude_self:
        cands = cands.filter(F.col("vec_id") != F.col("query_id"))
    return _exact_rerank(
        cands, vectors, queries, k,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )
