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

# ---------------------------------------------------------------------
# Locale-aware analyzer registry — the reference keeps per-locale Lucene
# analyzers and resolves them by exact code, then progressively stripped
# "_"-suffixes, then a default (``miru-plugin/.../query/
# TermAnalyzers.java:119-138``). Here an analyzer = (token regex,
# stopword set). The engine DEFAULT stays the frozen ASCII "en" analyzer:
# it is the cross-engine byte-identity surface (Python re / JVM regexp /
# DuckDB RE2 all agree on [a-z0-9]+), and changing it changes every
# index. Non-"en" locales use a Unicode word tokenizer (any-script
# letters+digits, lowercased) plus their stopword list.
# ---------------------------------------------------------------------

_UNICODE_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

STOPWORDS_DE = frozenset(
    """aber als am an auch auf aus bei bin bis da das dass dem den der des
    die dir du ein eine einem einen einer es für hat hatte ich ihr im in
    ist ja kann mein mich mit nach nicht noch nur oder sein sich sie sind
    so über um und uns von war was wenn wie wir zu zum zur""".split()
)

STOPWORDS_FR = frozenset(
    """au aux avec ce ces dans de des du elle en et eux il je la le les
    leur lui ma mais me même mes moi mon ne nos notre nous on ou par pas
    pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos
    votre vous""".split()
)


class _Analyzer:
    __slots__ = ("token_re", "stopwords")

    def __init__(self, token_re: re.Pattern, stopwords: frozenset):
        self.token_re = token_re
        self.stopwords = stopwords


_ANALYZERS: dict[str, _Analyzer] = {
    "en": _Analyzer(_TOKEN_RE, STOPWORDS_EN),
    "de": _Analyzer(_UNICODE_TOKEN_RE, STOPWORDS_DE),
    "fr": _Analyzer(_UNICODE_TOKEN_RE, STOPWORDS_FR),
    "unicode": _Analyzer(_UNICODE_TOKEN_RE, frozenset()),
}
_DEFAULT_ANALYZER = _ANALYZERS["en"]


def find_analyzer(locale: str | None) -> _Analyzer:
    """Resolve a locale code to its analyzer, with the reference's
    fallback chain: exact code, then strip trailing ``_``-suffixes
    ("de_DE" -> "de"), then the default."""
    code = locale or ""
    while code:
        a = _ANALYZERS.get(code)
        if a is not None:
            return a
        if "_" not in code:
            break
        code = code.rsplit("_", 1)[0]
    return _DEFAULT_ANALYZER


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


def tokenize(
    text: str | None, *, use_stopwords: bool = False, locale: str | None = None
) -> list[str]:
    """Lowercase word-break tokenization; optionally drop the locale's
    stopwords.

    Mirrors the reference analyzer semantics (StandardAnalyzer-like
    lowercase word tokens; per-locale analyzer + stopword variants via
    ``TermAnalyzers.findAnalyzer``). ``locale=None`` is the frozen ASCII
    "en" analyzer (the engine default and byte-identity surface).
    """
    if not text:
        return []
    analyzer = find_analyzer(locale)
    toks = analyzer.token_re.findall(text.lower())
    if use_stopwords:
        toks = [t for t in toks if t not in analyzer.stopwords]
    return toks


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def tokenize_udf(use_stopwords: bool = False, locale: str | None = None):
    """Factory for an Arrow-vectorized tokenizer column function."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(text: pd.Series) -> pd.Series:
        return text.map(lambda s: tokenize(s, use_stopwords=use_stopwords, locale=locale))

    return _tok


def term_counts_udf(use_stopwords: bool = False, locale: str | None = None):
    """Arrow UDF: text -> struct(terms array<string>, tfs array<int>).

    Per-doc tf is a pure function of the doc's own token stream, so it is
    counted HERE — map-side, before any shuffle. The index build then
    ships one row per *distinct* (term, doc) instead of one per token
    occurrence, cutting the dominant shuffle's row count by the corpus'
    occurrences/distinct ratio with zero extra exchanges (the map-side
    combine the reference gets from its per-activity tf extraction,
    ``MiruIndexPrimaryFields.java:62-75``).
    """
    from collections import Counter

    ret = T.StructType(
        [
            T.StructField("terms", T.ArrayType(T.StringType())),
            T.StructField("tfs", T.ArrayType(T.IntegerType())),
        ]
    )

    @F.pandas_udf(ret)
    def _tc(text: pd.Series) -> pd.DataFrame:
        terms_out: list[list[str]] = []
        tfs_out: list[list[int]] = []
        for s in text:
            c = Counter(tokenize(s, use_stopwords=use_stopwords, locale=locale))
            terms_out.append(list(c.keys()))
            tfs_out.append(list(c.values()))
        return pd.DataFrame({"terms": terms_out, "tfs": tfs_out})

    return _tc


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
