"""Light suffix stemmers for en/de/fr/es — the reference's stemming
analyzer tier, re-expressed as fixed rule tables.

Reference analogue: the per-locale analyzers the reference binds are
Lucene STEMMING analyzers (``/root/reference/miru-plugin/src/main/java/
com/jivesoftware/os/miru/plugin/query/TermAnalyzers.java:52-84`` binds
EnglishAnalyzer, GermanAnalyzer, FrenchAnalyzer, SpanishAnalyzer — all
stem), so "running" matches an indexed "run" there. The base analyzers
here are deliberately frozen tokenize+stopword functions; this module
adds the stemming tier as NEW analyzer codes (``en_stem`` …) under a
new ``ANALYZER_VERSION`` generation, so existing indexes keep their
pinned token streams.

The stemmers are the public "light/minimal stemmer" family (Harman's
S-stemmer, 1991; Savoy's light stemmers for European languages, 1999;
the Lucene ``*MinimalStemmer``/``*LightStemmer`` line), encoded as
ORDERED ANCHORED REGEX RULES rather than procedural code, because the
same rule must execute IDENTICALLY in three engines:

- Python ``re``       (the analyzer / Arrow packer hot path),
- Java regex          (``F.regexp_replace`` in the ``tokens_col`` twin),
- RE2 in DuckDB       (the correctness oracle).

All three give anchored patterns with a lazy prefix the same semantics
(leftmost-first: the SHORTEST prefix wins, i.e. the LONGEST suffix is
stripped, with the ``{n,}`` bound enforcing a minimum stem length), and
none of the rules uses lookaround (absent from RE2) or multiple capture
groups (unmatched-group replacement differs across engines). Rules are
applied IN ORDER, each at most once (anchoring makes a second match
impossible) — e.g. English strips a minimal plural first, then one
derivational suffix: "meetings" -> "meeting" -> "meet".
"""

from __future__ import annotations

import functools
import re

# lang -> ordered list of (pattern, replacement) rules. Replacement is
# always the single capture group; stored in Python spelling (r"\1") —
# use jvm_repl()/sql snippets below for the other engines.
RULES: dict[str, list[tuple[str, str]]] = {
    "en": [
        # minimal plural (Lucene EnglishMinimalStemmer shape): strip a
        # final -s unless the word ends in -ss or -us; >= 3 chars remain
        (r"^(.{2,}[^su])s$", r"\1"),
        # one derivational strip, longest suffix first, >= 3-char stem
        (r"^(.{3,}?)(?:ational|ization|ousness|iveness|fulness|ements|"
         r"ations|ement|ation|ness|ment|able|ible|ing|ed|ly)$", r"\1"),
    ],
    "de": [
        # declension/plural endings (GermanLightStemmer shape), >= 4-char
        # stem: -ern/-en/-em/-er/-es/-e/-s/-n
        (r"^(.{4,}?)(?:ern|en|em|er|es|e|s|n)$", r"\1"),
    ],
    "fr": [
        # plural/feminine/derivational endings (FrenchLightStemmer
        # shape), >= 4-char stem; -eaux/-aux before shorter strips
        (r"^(.{4,}?)(?:issements|issement|issantes|issante|issants|"
         r"issant|ements|ement|euses|euse|eaux|aux|eux|es|e|s|x)$", r"\1"),
    ],
    "es": [
        # SpanishLightStemmer shape, >= 4-char stem
        (r"^(.{4,}?)(?:amientos|imientos|amiento|imiento|aciones|"
         r"uciones|adoras|adores|ación|ición|adora|ador|antes|"
         r"ante|mente|ables|able|ibles|ible|istas|ista|anza|osos|osas|"
         r"oso|osa|ivos|ivas|ivo|iva|es|s|a|o|e)$", r"\1"),
    ],
}

_COMPILED: dict[str, list[tuple[re.Pattern, str]]] = {
    lang: [(re.compile(p), r) for p, r in rules] for lang, rules in RULES.items()
}


@functools.lru_cache(maxsize=262144)
def stem(token: str, lang: str) -> str:
    """Apply ``lang``'s rules to one token, in order, each at most once.

    Memoized: the Arrow packer and tokenizer call this per token
    occurrence, but the distinct-token count per batch is small (the
    cache turns per-occurrence regex work into per-distinct work).
    """
    for pat, repl in _COMPILED[lang]:
        token = pat.sub(repl, token)
    return token


def jvm_rules(lang: str) -> list[tuple[str, str]]:
    """The same rules with Java-regex replacement spelling ($1)."""
    return [(p, "$1") for p, _ in RULES[lang]]


def sql_stem_expr(col: str, lang: str) -> str:
    """DuckDB expression applying ``lang``'s rules to ``col`` — the
    oracle twin (RE2 replacement spelling is \\1, like Python)."""
    expr = col
    for p, _ in RULES[lang]:
        pat = p.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '\\1')"
    return expr
