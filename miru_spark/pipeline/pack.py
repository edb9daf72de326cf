"""Sequence packing for LLM-pretraining pipelines.

Pretraining consumes fixed-length token sequences; feeding one (short)
web document per sequence wastes most of the context window as padding.
The standard fix is *packing*: concatenate documents until a token
budget fills, then start the next sequence. A truly greedy global pack
is inherently sequential — useless at 100 TB — so this operator uses
the standard distributed formulation:

1. docs are hashed into ``n_buckets`` independent buckets (md5-derived,
   engine-stable and deterministic — same trick as
   :mod:`miru_spark.pipeline.sampling`), one shuffle;
2. within each bucket, docs pack greedily in ``id`` order (first-fit in
   deterministic order), entirely bucket-local.

Every bucket packs in parallel; determinism holds across runs,
partitionings, and cluster sizes because bucket membership and
intra-bucket order are pure functions of the ids. Padding waste only
concentrates at the (one) tail sequence per bucket, so larger corpora
amortize it away; skew is impossible because buckets are hash-uniform
in doc count.

The per-bucket kernel is vectorized: one cumsum + one
``searchsorted`` per emitted sequence (O(sequences · log docs) numpy
ops, no per-row Python). A doc longer than the budget still gets a
sequence of its own (overflow allowed, flagged by its token count —
callers chunk oversized docs upstream if they care).

No reference counterpart (miru is a query engine, not a training-data
pipeline); this belongs to the beyond-the-reference operator set the
engine ships for web-corpus preparation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.pipeline.sampling import hash_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    budget: int,
    n_buckets: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Assign every doc a (bucket, seq, tok_offset) packing slot.

    Returns DataFrame(id long, n_tokens long, bucket int, seq long,
    tok_offset long): doc ``id`` lands in packed sequence ``seq`` of
    ``bucket`` starting at token position ``tok_offset``. Sequences are
    numbered 0.. within each bucket in pack order; ``tok_offset +
    n_tokens <= budget`` for every doc except oversized ones (which sit
    alone at offset 0).

    ``n_buckets`` trades parallelism against tail waste: each bucket is
    an independent pack stream with at most one under-filled tail
    sequence. Size it ~2-4x the executor-core count, as with any
    shuffle width.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        (hash_bucket(id_col, seed) % n_buckets).cast("int").alias("bucket"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="stable").reset_index(drop=True)
        toks = pdf["n_tokens"].to_numpy(dtype=np.int64)
        n = len(toks)
        cum = np.cumsum(toks)
        seq = np.empty(n, dtype=np.int64)
        off = np.empty(n, dtype=np.int64)
        i, s, base = 0, 0, 0
        while i < n:
            # last doc that still fits: largest j with cum[j] - base <= budget;
            # always take at least doc i (oversized docs pack alone)
            j = int(np.searchsorted(cum, base + budget, side="right")) - 1
            j = max(j, i)
            seq[i : j + 1] = s
            off[i : j + 1] = cum[i : j + 1] - toks[i : j + 1] - base
            base = int(cum[j])
            i = j + 1
            s += 1
        pdf["seq"] = seq
        pdf["tok_offset"] = off
        return pdf

    return src.groupBy("bucket").applyInPandas(
        _pack, schema="id long, n_tokens long, bucket int, seq long, tok_offset long"
    )
