"""Light suffix stemmers — the reference's stemming analyzer tier,
re-expressed as fixed rule tables (round 5: the full locale registry).

Reference analogue: the per-locale analyzers the reference binds are
Lucene STEMMING analyzers (``/root/reference/miru-plugin/src/main/java/
com/jivesoftware/os/miru/plugin/query/TermAnalyzers.java:52-84`` binds
EnglishAnalyzer, GermanAnalyzer, … TurkishAnalyzer — all stem), so
"running" matches an indexed "run" there. The base analyzers here are
deliberately frozen tokenize+stopword functions; this module adds the
stemming tier as NEW analyzer codes (``en_stem`` …) under a new
``ANALYZER_VERSION`` generation, so existing indexes keep their pinned
token streams. Round 4 shipped en/de/fr/es; round 5 extends the table
to every locale the reference's map binds a stemming analyzer for
(it, pt/pt_br, nl, ru, sv, da, nb/nn, fi, cs, ro, ca, gl, id, hi, bg,
gr, tr, lv, eu, hy, ar, ku, ga for en_ie). ``fa`` (PersianAnalyzer) and
``th`` (ThaiAnalyzer) do NOT stem in Lucene — normalization /
segmentation only — so they rightfully have no table here.

The stemmers are the public "light/minimal stemmer" family (Harman's
S-stemmer, 1991; Savoy's light stemmers for European languages, 1999;
Larkey's Arabic light10, 2002; the Lucene ``*MinimalStemmer``/
``*LightStemmer`` line), encoded as ORDERED ANCHORED REGEX RULES rather
than procedural code, because the same rule must execute IDENTICALLY in
three engines:

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
# the single capture group, optionally followed by a LITERAL tail
# (suffix-fold rules like pt "-ões" -> "-ão"); stored in Python
# spelling (r"\1", r"\1ão") — jvm_rules()/sql_stem_expr() below respell
# the backreference for the other engines.
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
    # ----- round 5: the rest of the reference's stemming locales -----
    "it": [
        # ItalianLightStemmer shape (Savoy): one derivational /
        # inflectional strip incl. the final vowel, >= 3-char stem
        (r"^(.{3,}?)(?:azioni|azione|uzioni|uzione|amenti|amento|"
         r"imenti|imento|amente|mente|atore|atori|abile|abili|ibile|"
         r"ibili|anza|anze|enza|enze|ismo|ismi|ista|iste|isti|ità|"
         r"ivo|ivi|iva|ive|i|e|a|o|à|è|ì|ò|ù)$", r"\1"),
    ],
    "pt": [
        # RSLP-light / PortugueseLightStemmer shape, staged so inflected
        # and base forms MEET (each rule fires at most once, so the
        # stages mirror the procedural stemmer's strip order): nasal-
        # plural folds, one derivational strip, plural -s, final vowel
        (r"^(.{1,}?)ões$", r"\1ão"),
        (r"^(.{1,}?)ães$", r"\1ão"),
        (r"^(.{3,}?)(?:amentos|imentos|amento|imento|adoras|adores|"
         r"ísticas|ístico|idades|idade|mente|ância|ências|"
         r"ência|ista|istas|áveis|ável|íveis|"
         r"ível|osos|osas|oso|osa|eza|ezas|ando|endo|indo|"
         r"ar|er|ir)$", r"\1"),
        (r"^(.{3,}?)(?:es|s)$", r"\1"),
        (r"^(.{3,})[aoe]$", r"\1"),
    ],
    "nl": [
        # DutchAnalyzer stems (Snowball); light shape: -heden -> -heid
        # fold, then plural/diminutive/inflection strip, >= 3-char stem
        (r"^(.{2,}?)heden$", r"\1heid"),
        (r"^(.{3,}?)(?:eren|ende|tjes|tje|jes|je|en|e|s)$", r"\1"),
    ],
    "ru": [
        # RussianLightStemmer shape: one adjectival/nominal ending
        # strip, >= 3-char (Cyrillic) stem
        (r"^(.{3,}?)(?:иями|ями|ами|иях|ией|иям|ием|ого|его|ому|"
         r"ему|ыми|ими|ейш|ее|ие|ые|ое|ей|ий|ый|ой|ем|им|ым|ом|их|"
         r"ых|ую|юю|ая|яя|ою|ею|ия|а|я|о|е|ы|и|ь|у|ю)$", r"\1"),
    ],
    "sv": [
        # SwedishLightStemmer shape: definite/plural/superlative
        # endings, >= 3-char stem
        (r"^(.{3,}?)(?:heterna|heten|heter|arnas|ernas|ornas|andet|"
         r"ande|arne|aste|orna|erna|arna|ades|ade|are|ern|ens|het|"
         r"ast|ad|en|ar|er|or|as|es|et|at|a|e|s|t)$", r"\1"),
    ],
    "da": [
        # DanishAnalyzer stems (Snowball); light shape: definite/plural
        # endings, >= 3-char stem
        (r"^(.{3,}?)(?:erendes|erende|ernes|erens|erne|eres|erer|"
         r"ede|ets|ene|ens|et|er|es|en|e|s)$", r"\1"),
    ],
    "no": [
        # NorwegianMinimalStemmer shape (nb and nn bind here), >= 3-char
        # stem
        (r"^(.{3,}?)(?:ene|ane|er|en|et|a|e|s)$", r"\1"),
    ],
    "fi": [
        # FinnishLightStemmer shape: one case/possessive ending strip,
        # >= 3-char stem (agglutination means one strip is "light" by
        # construction)
        (r"^(.{3,}?)(?:issa|issä|ista|istä|illa|illä|ilta|iltä|ille|"
         r"ssa|ssä|sta|stä|lla|llä|lta|ltä|lle|ksi|ine|iin|aan|een|"
         r"uun|na|nä|in|an|en|un|yn|t|a|ä|n)$", r"\1"),
    ],
    "cs": [
        # CzechStemmer (light) shape: one case-ending strip, >= 3-char
        # stem
        (r"^(.{3,}?)(?:atech|ětem|atům|ech|ich|ích|ého|ěmi|emi|ému|"
         r"ete|eti|iho|ině|ími|ímu|ách|ata|aty|ých|ama|ami|ové|ovi|"
         r"ými|em|es|ém|ím|ům|at|ám|os|us|ým|mi|ou|a|e|i|o|u|y|ů)$",
         r"\1"),
    ],
    "ro": [
        # RomanianAnalyzer stems (Snowball); light shape: article/plural
        # endings, >= 3-char stem
        (r"^(.{3,}?)(?:iilor|ilor|elor|ului|iile|atei|aua|ele|eau|"
         r"iua|ii|ul|ă|a|e|i)$", r"\1"),
    ],
    "ca": [
        # CatalanAnalyzer stems (Snowball); light shape: derivational /
        # plural endings, >= 3-char stem
        (r"^(.{3,}?)(?:aments|ament|cions|ció|ments|ment|ístic|isme|"
         r"ista|dors|dora|dor|ants|ant|es|ns|s|a|o|e)$", r"\1"),
    ],
    "gl": [
        # GalicianMinimalStemmer shape: plural only — -ns -> -n, then a
        # bare -s strip, >= 3-char stem
        (r"^(.{2,}?n)s$", r"\1"),
        (r"^(.{3,}?)(?:es|s)$", r"\1"),
    ],
    "id": [
        # IndonesianStemmer shape: particle/possessive suffixes, one
        # derivational suffix, and one derivational PREFIX (the regex
        # family's only prefix rules), >= 3-char stem
        (r"^(.{3,}?)(?:lah|kah|tah|pun|nya|ku|mu)$", r"\1"),
        (r"^(.{3,}?)(?:kan|an|i)$", r"\1"),
        (r"^(?:meng|meny|men|mem|me|peng|peny|pen|pem|di|ke|se|ber|"
         r"ter)(.{3,})$", r"\1"),
    ],
    "hi": [
        # Lucene HindiStemmer (light) shape: one Devanagari
        # matra/plural ending strip, >= 2-char stem
        (r"^(.{2,}?)(?:ाएं|ुओं|ुएं|ुआं|ों|ें|ौं|ां|ीं|ुं|ो|े|ी|ि|ा|ू|ु|ौ|ै)$", r"\1"),
    ],
    "bg": [
        # BulgarianStemmer (light) shape: definite-article / plural
        # endings, >= 3-char stem
        (r"^(.{3,}?)(?:овете|овци|ината|ите|ове|ът|та|то|те|ия|"
         r"ят|а|я|о|е|и|ю)$", r"\1"),
    ],
    "gr": [
        # GreekStemmer (light) shape: one nominal ending strip, accented
        # and unaccented spellings both listed (the analyzer lowercases
        # but does not de-accent), >= 3-char stem
        (r"^(.{3,}?)(?:ματα|ματων|ος|ός|ου|ού|ων|ών|ες|ές|ας|άς|ης|"
         r"ής|οι|οί|α|ά|η|ή|ο|ό|ι|ί|ε|έ)$", r"\1"),
    ],
    "tr": [
        # TurkishAnalyzer stems (Snowball); light shape: one
        # plural/possessive strip then one case ending, vowel-harmony
        # variants listed explicitly, >= 3-char stem
        (r"^(.{2,}?)(?:larının|lerinin|larını|lerini|larına|lerine|"
         r"ların|lerin|ları|leri|lar|ler|ınız|iniz|unuz|ünüz|sı|si|"
         r"su|sü)$", r"\1"),
        (r"^(.{2,}?)(?:dan|den|tan|ten|nın|nin|nun|nün|da|de|ta|te|"
         r"ın|in|un|ün|ı|i|u|ü|a|e)$", r"\1"),
    ],
    "lv": [
        # LatvianStemmer (light) shape: one declension ending strip,
        # >= 3-char stem
        (r"^(.{3,}?)(?:ajiem|ajām|iem|ais|ai|am|ām|as|os|us|es|em|"
         r"im|a|e|i|s|š|u)$", r"\1"),
    ],
    "eu": [
        # BasqueAnalyzer stems (Snowball); light shape: one
        # article/case ending strip, >= 3-char stem
        (r"^(.{3,}?)(?:arekin|aren|etan|etik|ari|ak|ek|en|an|a|k)$",
         r"\1"),
    ],
    "hy": [
        # ArmenianAnalyzer stems (Snowball); light shape: one
        # plural/article/case ending strip, >= 3-char stem
        (r"^(.{3,}?)(?:ները|ների|երը|երի|ում|ով|եր|ը|ի|ն)$", r"\1"),
    ],
    "ar": [
        # Larkey's light10 shape: one definite-article PREFIX strip
        # (>= 2-char remainder) then one suffix strip, >= 2-char stem
        (r"^(?:وال|بال|كال|فال|ال|لل)(.{2,})$", r"\1"),
        (r"^(.{2,}?)(?:ها|ان|ات|ون|ين|يه|ية|ه|ة|ي)$", r"\1"),
    ],
    "ku": [
        # SoraniStemmer (light) shape: definite/plural endings (Sorani
        # Arabic script), >= 2-char stem
        (r"^(.{2,}?)(?:ەکان|ەکە|کان|ان|ێک|ە)$", r"\1"),
    ],
    "ga": [
        # IrishAnalyzer stems (Snowball); light shape: the
        # mutation-prefix strip (t/n/h before a vowel) then one
        # plural/derivational ending, >= 3-char stem. Bound under the
        # reference's "en_ie" code. (Hyphenated mutation spellings like
        # "n-athair" are already split by the word-break tokenizer.)
        (r"^[tnh]([aeiouáéíóú].{2,})$", r"\1"),
        (r"^(.{3,}?)(?:eanna|anna|acht|aí|ín)$", r"\1"),
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
    """The same rules with Java-regex replacement spelling ($1 + any
    literal fold tail, e.g. pt "-ões" -> "$1ão")."""
    return [(p, r.replace("\\1", "$1")) for p, r in RULES[lang]]


def sql_stem_expr(col: str, lang: str) -> str:
    """DuckDB expression applying ``lang``'s rules to ``col`` — the
    oracle twin (RE2 replacement spelling is \\1 + literal tail, like
    Python)."""
    expr = col
    for p, r in RULES[lang]:
        pat = p.replace("'", "''")
        repl = r.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}')"
    return expr
