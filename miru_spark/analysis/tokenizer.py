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

STOPWORDS_ES = frozenset(
    """a al algo antes como con contra cual cuando de del desde donde
    durante e el ella ellas ellos en entre era es esa ese eso esta este
    esto fue ha han hasta la las le les lo los me mi mis muy más ni no
    nos o os otra otro para pero por porque que quien se ser si sin sobre
    son su sus también te tu tus un una uno unos y ya yo""".split()
)

STOPWORDS_IT = frozenset(
    """a ad agli ai al alla alle allo anche che chi ci come con contro da
    dal dalla de degli dei del della delle dello di dove e ed era fra gli
    ha hanno il in io la le lei lo loro lui ma mi ne nei nel nella no noi
    non o per perché più quella quelle quello questa queste questo se sei
    si sono su sua sue sui sul sulla suo tra tu un una uno vi voi è""".split()
)

STOPWORDS_PT = frozenset(
    """a ao aos as até com como da das de dela dele deles dem depois do
    dos e ela elas ele eles em entre era essa esse esta este eu foi for
    há isso isto já lhe lhes mais mas me mesmo meu minha muito na nas não
    nem no nos nossa nosso num numa o os ou para pela pelo por qual quando
    que quem se sem ser seu sua são só também te tem teu tu tua um uma
    você vocês à às""".split()
)

STOPWORDS_NL = frozenset(
    """aan al alles als altijd andere ben bij daar dan dat de der deze die
    dit doch doen door dus een en er ge geen geweest haar had heb hebben
    heeft hem het hier hij hoe hun iemand iets ik in is ja je kan kon kunnen
    maar me meer men met mij mijn moet na naar niet niets nog nu of om omdat
    onder ons ook op over reeds te tegen toch toen tot u uit uw van veel
    voor want waren was wat werd wezen wie wil worden wordt zal ze zelf zich
    zij zijn zo zonder zou""".split()
)

STOPWORDS_RU = frozenset(
    """а без более бы был была были было быть в вам вас весь во вот все
    всего всех вы где да даже для до его ее ей ею если есть еще же за здесь
    и из или им их к как ко когда кто ли либо мне может мы на надо наш не
    него нее нет ни них но ну о об однако он она они оно от очень по под
    при с со так также такой там те тем то того тоже той только том ты у
    уже хотя чего чей чем что чтобы чье чья эта эти это я""".split()
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
    "es": _Analyzer(_UNICODE_TOKEN_RE, STOPWORDS_ES),
    "it": _Analyzer(_UNICODE_TOKEN_RE, STOPWORDS_IT),
    "pt": _Analyzer(_UNICODE_TOKEN_RE, STOPWORDS_PT),
    # pt_br resolves to "pt" via the fallback chain, as the reference
    # registers BrazilianAnalyzer separately but we share one Portuguese
    # stopword analyzer (no stemming on either branch here)
    "nl": _Analyzer(_UNICODE_TOKEN_RE, STOPWORDS_NL),
    "ru": _Analyzer(_UNICODE_TOKEN_RE, STOPWORDS_RU),
    "unicode": _Analyzer(_UNICODE_TOKEN_RE, frozenset()),
}
_DEFAULT_ANALYZER = _ANALYZERS["en"]


def find_analyzer(locale: str | None) -> _Analyzer:
    """Resolve a locale code to its analyzer, with the reference's
    fallback chain (``TermAnalyzers.findAnalyzer:124-138``): exact code,
    then strip at the FIRST ``_`` ("de_DE_bavaria" -> "de" in one step —
    the reference's ``code.substring(0, indexOf('_'))``), then default."""
    code = locale or ""
    while code:
        a = _ANALYZERS.get(code)
        if a is not None:
            return a
        if "_" not in code:
            break
        code = code.split("_", 1)[0]
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


def tokens_col(col, use_stopwords: bool = False, locale: str | None = None):
    """JVM-codegen twin of :func:`tokenize` (split/lower/regexp — no
    Python). Token-identical to the UDF on the supported alphabets; used
    where only counts/sets/adjacency are needed (doclen, text stats,
    phrase verification) so the hot path stays in whole-stage codegen.
    Tests assert parity against the Python tokenizer on the fixture
    corpora, including non-ASCII (Latin-accented / Cyrillic / Greek)
    samples for the unicode analyzers.

    ``locale`` resolves through the same :func:`find_analyzer` chain:
    the frozen ASCII analyzer keeps the ASCII regex; every other analyzer
    maps to the Unicode word twin — Java's ``(?U)\\W`` and Python's
    ``re.UNICODE \\W`` agree on letters/digits of every script (exotic
    numeral-category codepoints are the only divergence surface, and the
    parity test pins the alphabets we claim)."""
    analyzer = find_analyzer(locale)
    if analyzer.token_re is _TOKEN_RE:
        lowered = F.lower(F.regexp_replace(col, r"[^A-Za-z0-9]+", " "))
    else:
        # lower BEFORE word-breaking, as the Python twin does — case
        # folding may rewrite codepoints, so the order is part of parity
        lowered = F.regexp_replace(F.lower(col), r"(?U)[\W_]+", " ")
    toks = F.filter(F.split(lowered, r"\s+"), lambda x: x != "")
    if use_stopwords:
        stop = F.array(*[F.lit(s) for s in sorted(analyzer.stopwords)])
        toks = F.filter(toks, lambda x: ~F.array_contains(stop, x))
    return toks
