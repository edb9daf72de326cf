"""Deterministic text extraction + tokenization.

This is the engine's analyzer layer. The reference engine delegates to
Lucene analyzers per locale (reference: miru-stream-plugins
``.../fulltext/TermAnalyzers.java:45-138``, ``TermTokenizer.java:34-54``);
we use a single pure-Python, regex-word-break + lowercase + optional
stopword analyzer so that tokenization is a **pure function of the input
bytes** — the byte-identical-per-url invariant required by the build
pipeline. All Spark entry points are Arrow-vectorized pandas UDFs
(no per-row Python).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A compact English stopword set (reference keeps per-locale stopword lists,
# e.g. .../fulltext/EnStopwords.java). Frozen: changing it changes the index.
STOPWORDS_EN = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html: bytes | None) -> str:
    """Extract visible text from an HTML byte payload, deterministically.

    Byte-identical per input: strip tags with a single regex pass, decode
    utf-8 (replacement for invalid bytes), collapse whitespace. This is the
    invariant surface — given the same ``html`` bytes it always returns the
    same string, on any executor.
    """
    if html is None:
        return ""
    stripped = _TAG_RE.sub(b" ", html)
    text = stripped.decode("utf-8", errors="replace")
    return _WS_RE.sub(" ", text).strip()


def tokenize(text: str | None, *, use_stopwords: bool = False) -> list[str]:
    """Lowercase word-break tokenization; optionally drop English stopwords.

    Mirrors the reference default analyzer semantics (StandardAnalyzer-like
    lowercase word tokens; stopwords only when the query asks,
    ``TermAnalyzers.findAnalyzer`` en/en_"useStopWords" variants).
    """
    if not text:
        return []
    toks = _TOKEN_RE.findall(text.lower())
    if use_stopwords:
        toks = [t for t in toks if t not in STOPWORDS_EN]
    return toks


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def tokenize_udf(use_stopwords: bool = False):
    """Factory for an Arrow-vectorized tokenizer column function."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(text: pd.Series) -> pd.Series:
        return text.map(lambda s: tokenize(s, use_stopwords=use_stopwords))

    return _tok


def tokens_col(col, use_stopwords: bool = False):
    """JVM-codegen twin of :func:`tokenize` (split/lower/regexp — no
    Python). Token-identical to the UDF for ASCII inputs; used where only
    counts/sets are needed (doclen, text stats) so the hot path stays in
    whole-stage codegen. Tests assert parity against the Python tokenizer
    on the fixture corpora."""
    toks = F.filter(
        F.split(F.lower(F.regexp_replace(col, r"[^A-Za-z0-9]+", " ")), r"\s+"),
        lambda x: x != "",
    )
    if use_stopwords:
        stop = F.array(*[F.lit(s) for s in sorted(STOPWORDS_EN)])
        toks = F.filter(toks, lambda x: ~F.array_contains(stop, x))
    return toks
