"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All computed with built-in ``pyspark.sql.functions`` over JVM codegen —
no Python in these paths at all (the tokenizer regexes are evaluated by
Spark's regexp engine; semantics match ``miru_spark.analysis.tokenizer``
for the [a-z0-9]+ word-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.analysis.tokenizer import STOPWORDS_EN

# Small function-word lists per language for the n-gram/stopword-hit
# language heuristic. Deterministic and tiny by design.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es": ("el", "la", "los", "las", "es", "una", "para", "con", "por", "se"),
}


def _tokens_col(text_col: str):
    toks = F.split(F.lower(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9]+", " ")), r"\s+")
    return F.filter(toks, lambda x: x != "")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc token statistics + BPE-ish subword estimate.

    Columns: id, n_tokens, n_chars, avg_token_len, stopword_ratio,
    bpe_tokens (Σ ceil(len(token)/4) — the ~4-chars-per-token heuristic).
    """
    toks = _tokens_col(text_col)
    stop_arr = F.array(*[F.lit(s) for s in sorted(STOPWORDS_EN)])
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("double")
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("stopword_ratio"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.ceil(F.length(x) / 4.0)
        ).alias("bpe_tokens"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic document quality score in [0,1].

    Components (web-text quality heuristics):
    - length_ok: 10 <= n_tokens <= 10000
    - stopword_ok: stopword_ratio >= 0.05 (natural prose has function words)
    - alpha_ratio: alphabetic chars / all chars >= 0.6
    - avg token length in [2, 12]
    score = mean of the four indicator/ratio components.
    Columns: id, n_tokens, alpha_ratio, stopword_ratio, quality.
    """
    stats = token_stats(df, id_col, text_col)
    alpha = df.select(
        F.col(id_col).alias("id"),
        F.round(
            F.when(
                F.length(text_col) > 0,
                (
                    F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
                ).cast("double")
                / F.length(text_col),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("alpha_ratio"),
    )
    joined = stats.join(alpha, "id")
    comp = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 10000), 1.0).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.05, 1.0).otherwise(0.0)
        + F.when(F.col("alpha_ratio") >= 0.6, 1.0).otherwise(0.0)
        + F.when((F.col("avg_token_len") >= 2) & (F.col("avg_token_len") <= 12), 1.0).otherwise(0.0)
    ) / 4.0
    return joined.select(
        "id", "n_tokens", "alpha_ratio", "stopword_ratio", F.round(comp, 6).alias("quality")
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language guess from function-word hits.

    For each language, count tokens in its marker list; argmax wins,
    ties broken by language code order; no hits -> 'und'.
    Columns: id, lang_guess.
    """
    toks = _tokens_col(text_col)
    hit_cols = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        hit_cols.append(
            F.struct(
                F.size(F.filter(toks, lambda x: F.array_contains(markers, x))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # deterministic argmax: max hits, then lexicographically-first lang among maxima
    arr = F.array(*hit_cols)
    max_hits = F.array_max(F.transform(arr, lambda s: s["hits"]))
    winner = F.array_min(
        F.transform(F.filter(arr, lambda s: s["hits"] == max_hits), lambda s: s["lang"])
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.when(max_hits > 0, winner).otherwise(F.lit("und")).alias("lang_guess"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: full-text md5 + normalized-token md5.

    The normalized fingerprint (md5 of space-joined lowercase tokens)
    identifies docs equal up to whitespace/punctuation — the cheap
    near-exact tier of the dedup ladder. Columns: id, digest, norm_digest.
    """
    toks = _tokens_col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("digest"),
        F.md5(F.concat_ws(" ", toks)).alias("norm_digest"),
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 5, window: int = 4
) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: the minimum xxhash64 of each
    k-gram window — standard local document fingerprinting for plagiarism/
    overlap detection. Columns: id, fp (exploded, distinct per doc).

    k-gram hashing stays JVM-side (xxhash64 over token slices); the
    rolling window-min runs as a vectorized numpy kernel per Arrow batch
    (``sliding_window_view``) — composing both stages as nested Catalyst
    array expressions explodes codegen size and is ~100x slower.
    """
    import numpy as np
    import pandas as pd

    toks = _tokens_col(text_col)
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks))))
    src = df.select(F.col(id_col).alias("id"), grams.alias("grams"))

    def _win(pdf_iter):
        for pdf in pdf_iter:
            ids_out, fps_out = [], []
            for doc_id, g in zip(pdf["id"], pdf["grams"]):
                arr = np.asarray(g, dtype=np.int64)
                if arr.size >= window:
                    mins = np.lib.stride_tricks.sliding_window_view(arr, window).min(axis=1)
                else:
                    mins = arr.min(keepdims=True)
                fps = np.unique(mins)
                ids_out.append(np.full(fps.size, doc_id, dtype=np.int64))
                fps_out.append(fps)
            if ids_out:
                yield pd.DataFrame({"id": np.concatenate(ids_out), "fp": np.concatenate(fps_out)})
            else:
                yield pd.DataFrame(
                    {"id": pd.Series([], dtype="int64"), "fp": pd.Series([], dtype="int64")}
                )

    return src.mapInPandas(_win, schema="id long, fp long").distinct()
