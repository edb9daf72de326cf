"""Per-locale analyzer resolution (reference: miru-plugin
``.../query/TermAnalyzers.java:119-138`` — exact code, then stripped
"_"-suffixes, then default) and its end-to-end effect on index + query.
"""

from miru_spark.analysis.tokenizer import (
    STOPWORDS_DE,
    STOPWORDS_EN,
    find_analyzer,
    tokenize,
)


def test_find_analyzer_fallback_chain():
    assert find_analyzer("de").stopwords is STOPWORDS_DE
    # de_DE -> de (strip one suffix), de_DE_bavaria -> de (strip two)
    assert find_analyzer("de_DE").stopwords is STOPWORDS_DE
    assert find_analyzer("de_DE_bavaria").stopwords is STOPWORDS_DE
    # unknown / empty / None -> frozen default ("en")
    assert find_analyzer("xx").stopwords is STOPWORDS_EN
    assert find_analyzer(None).stopwords is STOPWORDS_EN
    assert find_analyzer("").stopwords is STOPWORDS_EN


def test_unicode_tokenizer_keeps_non_ascii_letters():
    # default analyzer is frozen ASCII: umlauts split tokens
    assert tokenize("Über Größe") == ["ber", "gr", "e"]
    # the de analyzer tokenizes any-script letters+digits
    assert tokenize("Über Größe", locale="de") == ["über", "größe"]
    # underscores are not letters
    assert tokenize("a_b", locale="de") == ["a", "b"]


def test_locale_stopwords_applied_only_on_request():
    s = "die Katze und der Hund"
    assert tokenize(s, locale="de") == ["die", "katze", "und", "der", "hund"]
    assert tokenize(s, locale="de", use_stopwords=True) == ["katze", "hund"]
    # en stopwords are NOT the de set
    assert tokenize("the und", locale="de", use_stopwords=True) == ["the"]


def test_german_index_end_to_end(spark, tmp_path):
    """Build a de-locale stopword index; query-side analyzer must match:
    unicode terms are searchable, German stopwords vanish from queries."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search, search_wand

    rows = [
        (0, "die Straße über der Brücke und die Katze"),
        (1, "der Hund und die Katze spielen"),
        (2, "über die Brücke fährt der Zug"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "idx_de")
    meta = build_index(
        spark, docs, out, n_shards=2, block_bits=7,
        use_stopwords=True, locale="de", overwrite=True,
    )
    assert meta.locale == "de"

    reader = IndexReader(spark, out)
    assert reader.stats["locale"] == "de"
    # "Brücke"/"Straße" indexed as single unicode tokens (the ASCII
    # analyzer would have split them); "über" itself is a de stopword
    got = {r["doc_id"] for r in search(reader, "Brücke", k=10).collect()}
    assert got == {0, 2}
    got = {r["doc_id"] for r in search(reader, "straße", k=10).collect()}
    assert got == {0}
    # German stopwords are stripped at query time (und/die/der), so this
    # AND query reduces to katze and matches docs 0 and 1
    got = {r["doc_id"] for r in search(reader, "und die Katze", k=10).collect()}
    assert got == {0, 1}
    # all-stopword query -> empty, not a crash
    assert search(reader, "und der die", k=10).count() == 0
    # WAND path drops the locale's stopwords too
    got = {r["doc_id"] for r in search_wand(reader, ["und", "brücke"], k=10).collect()}
    assert got == {0, 2}


def test_per_query_use_stopwords_override(spark, tmp_path):
    """The reference carries useStopWords on the QUERY
    (``FullTextQuery.java:22-44``): a stopword-keeping index must answer
    a stopword-stripping query by pruning the query side only."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search

    rows = [(0, "the quick fox"), (1, "a slow dog"), (2, "the dog barks")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "idx_en")
    build_index(spark, docs, out, n_shards=1, block_bits=7, overwrite=True)
    reader = IndexReader(spark, out)

    # default: "the" is a real indexed term -> AND restricts to docs 0, 2
    got = {r["doc_id"] for r in search(reader, "the dog", k=10).collect()}
    assert got == {2}
    # per-query stopword stripping: "the" vanishes -> plain "dog" query
    got = {
        r["doc_id"]
        for r in search(reader, "the dog", k=10, use_stopwords=True).collect()
    }
    assert got == {1, 2}
    # all-stopword query vanishes entirely
    assert search(reader, "the a", k=10, use_stopwords=True).count() == 0


def test_stats_json_records_locale(spark, tmp_path):
    import json
    import os

    from miru_spark.index.builder import build_index

    docs = spark.createDataFrame([(0, "hello world")], "doc_id long, text string")
    out = str(tmp_path / "idx_loc")
    build_index(spark, docs, out, n_shards=1, block_bits=7,
                locale="fr", overwrite=True)
    with open(os.path.join(out, "stats.json")) as f:
        assert json.load(f)["locale"] == "fr"


def test_new_locale_analyzers_resolve():
    """es/it/pt/nl/ru analyzers exist with their own stopword sets;
    pt_br falls back to pt at the FIRST underscore (the reference's
    ``code.substring(0, indexOf('_'))`` — TermAnalyzers.java:124-138)."""
    from miru_spark.analysis.tokenizer import (
        STOPWORDS_ES,
        STOPWORDS_IT,
        STOPWORDS_NL,
        STOPWORDS_PT,
        STOPWORDS_RU,
    )

    assert find_analyzer("es").stopwords is STOPWORDS_ES
    assert find_analyzer("it").stopwords is STOPWORDS_IT
    assert find_analyzer("pt").stopwords is STOPWORDS_PT
    assert find_analyzer("pt_br").stopwords is STOPWORDS_PT
    assert find_analyzer("nl").stopwords is STOPWORDS_NL
    assert find_analyzer("ru").stopwords is STOPWORDS_RU
    # first-underscore strip in ONE step: es_MX_slang -> es, not es_MX
    assert find_analyzer("es_MX_slang").stopwords is STOPWORDS_ES

    assert tokenize("el niño pequeño", locale="es", use_stopwords=True) == ["niño", "pequeño"]
    assert tokenize("Это новый дом", locale="ru", use_stopwords=True) == ["новый", "дом"]


def test_jvm_tokens_col_parity_unicode(spark):
    """tokens_col(locale=...) (whole-stage-codegen) must produce the same
    token stream as the Python analyzer on non-ASCII text — the contract
    that lets phrase verification run JVM-side on non-en indexes."""
    from pyspark.sql import functions as F

    from miru_spark.analysis.tokenizer import tokens_col

    samples = [
        "Die Straße über der Brücke — und die Größe!",
        "El niño comió mañana; ¿qué pasó?",
        "Это новый дом, а это — старый.",
        "Ελληνικά κείμενα με τόνους.",
        "mixed ASCII and ümlauts côte-à-côte 42 times_underscored",
        "",
        "   ",
        "123 αβγ один_two",
    ]
    for locale in ("de", "es", "ru", "unicode"):
        df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, t string")
        for use_stop in (False, True):
            got = {
                r["i"]: r["toks"]
                for r in df.select(
                    "i", tokens_col(F.col("t"), use_stopwords=use_stop, locale=locale).alias("toks")
                ).collect()
            }
            want = {
                i: tokenize(s, use_stopwords=use_stop, locale=locale)
                for i, s in enumerate(samples)
            }
            assert got == want, (locale, use_stop)


def test_phrase_search_on_de_locale_index(spark, tmp_path):
    """Quoted phrases now verify on non-en indexes: the JVM unicode twin
    tokenizes the text exactly as the index's analyzer did."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search

    rows = [
        (0, "die große Brücke über den Fluss"),
        (1, "die Brücke große ist nicht hier"),   # both terms, wrong order
        (2, "eine große neue Brücke"),            # not adjacent
        (3, "große brücke am Abend"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "idx_de_phrase")
    build_index(spark, docs, out, n_shards=1, block_bits=7, locale="de", overwrite=True)
    reader = IndexReader(spark, out)

    got = {r["doc_id"] for r in
           search(reader, '"große Brücke"', k=10, text_df=docs).collect()}
    assert got == {0, 3}
    # sloppy phrase: one intervening token allowed -> doc 2 joins
    got = {r["doc_id"] for r in
           search(reader, '"große Brücke"~1', k=10, text_df=docs).collect()}
    assert got == {0, 2, 3}


def test_full_reference_registry_resolves():
    """Every code the reference registers (TermAnalyzers.java:52-84, the
    31-analyzer map) resolves to its OWN analyzer here, not the default —
    plus ja/zh/ko/th, which the reference serves through its
    StandardAnalyzer fallback (CJK unigrams) / ThaiAnalyzer."""
    from miru_spark.analysis.tokenizer import _ANALYZERS

    reference_codes = [
        "ar", "bg", "ca", "cs", "en", "en_ie", "es", "eu", "da", "de",
        "fa", "fi", "fr", "gl", "gr", "hi", "hy", "id", "it", "ku",
        "lv", "nl", "nb", "nn", "pt", "pt_br", "ro", "ru", "sv", "th",
        "tr",
    ]
    assert len(reference_codes) == 31
    for code in reference_codes:
        assert code in _ANALYZERS, code
    # nb and nn share one stopword set, like the reference binding
    # NorwegianAnalyzer to both codes
    assert find_analyzer("nb").stopwords is find_analyzer("nn").stopwords
    # stopword sets are per-locale, not shared with the default
    assert find_analyzer("sv").stopwords is not STOPWORDS_EN
    assert "och" in find_analyzer("sv").stopwords
    assert "ve" in find_analyzer("tr").stopwords


def test_cjk_segmentation_semantics():
    """ja/zh/ko: UAX#29-style — Han + Hiragana emit per-char unigrams,
    Katakana and Hangul runs stay whole, Latin/digits are words
    (what the reference's StandardAnalyzer fallback produces for CJK)."""
    assert tokenize("漢字", locale="ja") == ["漢", "字"]
    assert tokenize("ひらがな", locale="ja") == ["ひ", "ら", "が", "な"]
    assert tokenize("カタカナ", locale="ja") == ["カタカナ"]
    assert tokenize("한국어 분석", locale="ko") == ["한국어", "분석"]
    assert tokenize("自然语言", locale="zh") == ["自", "然", "语", "言"]
    assert tokenize("Tokyo 2020 東京", locale="ja") == ["tokyo", "2020", "東", "京"]
    # the frozen ASCII default drops CJK entirely — the cjk analyzers exist
    # precisely so a ja corpus is not indexed as empty docs
    assert tokenize("漢字") == []


def test_thai_bigram_segmentation():
    """th: character bigrams over all-Thai tokens (the deterministic
    substitute for ThaiAnalyzer's dictionary segmentation), combining
    vowels/tones INCLUDED as word chars (U+0E31 etc.); non-Thai tokens
    keep word semantics."""
    toks = tokenize("สวัสดี", locale="th")
    assert toks == ["สว", "วั", "ัส", "สด", "ดี"]
    assert tokenize("ก x7", locale="th") == ["ก", "x7"]


def test_jvm_tokens_col_parity_cjk_thai_marks(spark):
    """Parity of the JVM twin across the mark-bearing and CJK alphabets:
    Thai vowels/tones, Devanagari matras, Arabic diacritics, Persian
    ZWNJ, Han/Hiragana/Katakana/Hangul — the alphabets where Python \\w
    and Java (?U)\\w disagree without the explicit mark-class union."""
    from pyspark.sql import functions as F

    from miru_spark.analysis.tokenizer import tokens_col

    samples = {
        "ja": ["東京タワーはにほんのランドマークです Tokyo 2020",
               "カタカナとひらがなと漢字"],
        "zh": ["自然语言处理很有趣"],
        "ko": ["한국어 형태소 분석은 재미있다"],
        "th": ["ภาษาไทยนั้นสนุก test123", "สวัสดีครับ"],
        "hi": ["यह नहीं की किताब है"],
        "ar": ["هذا كتابٌ جميلٌ جدًا"],
        "fa": ["این می‌شود فارسی"],
        "tr": ["bu bir türkçe testi İIıi"],
    }
    for locale, texts in samples.items():
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(texts)], "i long, t string")
        got = {
            r["i"]: r["toks"]
            for r in df.select(
                "i", tokens_col(F.col("t"), locale=locale).alias("toks")
            ).collect()
        }
        want = {i: tokenize(s, locale=locale) for i, s in enumerate(texts)}
        assert got == want, locale


def test_japanese_index_end_to_end(spark, tmp_path):
    """ja-locale index: unigram Han terms are searchable, Katakana runs
    match whole, and quoted phrases verify through the JVM twin
    (adjacent unigrams = substring match, the CJK phrase semantics)."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search

    rows = [
        (0, "東京タワーは東京の名所です"),
        (1, "京都は古い都です"),
        (2, "タワーから東京を見る"),
        (3, "大阪の名所はお城です"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "idx_ja")
    meta = build_index(spark, docs, out, n_shards=1, block_bits=7,
                       locale="ja", overwrite=True)
    assert meta.locale == "ja"
    reader = IndexReader(spark, out)

    # unigram term: 京 appears in docs 0 (東京 x2), 1 (京都), 2 (東京)
    got = {r["doc_id"] for r in search(reader, "京", k=10).collect()}
    assert got == {0, 1, 2}
    # Katakana run is one whole term
    got = {r["doc_id"] for r in search(reader, "タワー", k=10).collect()}
    assert got == {0, 2}
    # phrase = adjacency of unigrams: "東京" as a phrase needs 東 then 京
    got = {r["doc_id"] for r in
           search(reader, '"東京"', k=10, text_df=docs).collect()}
    assert got == {0, 2}
    # AND of unigrams without adjacency also matches 京都...の都 order swaps
    got = {r["doc_id"] for r in search(reader, "東 AND 京", k=10).collect()}
    assert got == {0, 2}


def test_japanese_wand_and_inline_paths_agree(spark, tmp_path):
    """The block-max WAND scale path and the exact search path return
    rank-identical results on a ja-locale index (same contract the en
    entries pin), and per-query stopword stripping uses the cjk
    analyzer's set (the StandardAnalyzer-fallback EN set)."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search, search_wand

    rows = [
        (0, "東京タワーは東京の名所です"),
        (1, "京都は古い都で名所が多い"),
        (2, "タワーから東京の街を見る"),
        (3, "大阪の名所はお城です"),
        (4, "東京と京都を結ぶ新幹線"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "idx_ja_wand")
    build_index(spark, docs, out, n_shards=2, block_bits=6,
                locale="ja", overwrite=True)
    reader = IndexReader(spark, out)

    exact = [(r["doc_id"], round(r["score"], 6))
             for r in search(reader, "東 AND 京", k=5).collect()]
    wand = [(r["doc_id"], round(r["score"], 6))
            for r in search_wand(reader, ["東", "京"], k=5).collect()]
    assert exact == wand and len(exact) >= 2


def test_thai_stopwords_filtered_at_word_level(spark):
    """STOPWORDS_TH entries are whole Thai WORDS: they must be dropped
    before bigram expansion (a post-expansion filter could never match
    the >2-char majority), and a 2-char stopword must NOT delete equal
    interior bigrams of unrelated longer words. Python and JVM twins
    must agree under use_stopwords."""
    from pyspark.sql import functions as F

    from miru_spark.analysis.tokenizer import STOPWORDS_TH, tokens_col

    two_char = sorted(w for w in STOPWORDS_TH if len(w) == 2)
    assert two_char, "fixture expects at least one 2-char th stopword"
    inner = two_char[0]  # e.g. 'มา'
    # a 4-char word containing the stopword as an INTERIOR bigram
    word = "ส" + inner + "ส"
    long_stop = sorted(w for w in STOPWORDS_TH if len(w) > 2)[0]
    text = f"{long_stop} {word} {inner}"
    got = tokenize(text, locale="th", use_stopwords=True)
    # the whole-word stopwords vanish; the longer word keeps ALL its
    # bigrams, including the one equal to the 2-char stopword
    want_bigrams = [word[i:i + 2] for i in range(len(word) - 1)]
    assert got == want_bigrams
    assert inner in got
    # JVM twin parity under use_stopwords
    df = spark.createDataFrame([(0, text)], "i long, t string")
    jvm = df.select(
        tokens_col(F.col("t"), use_stopwords=True, locale="th").alias("toks")
    ).collect()[0]["toks"]
    assert jvm == got


# ---------------------------------------------------------------------
# Stemming tier (ANALYZER_VERSION 3): light suffix stemmers en/de/fr/es
# ---------------------------------------------------------------------

def test_light_stemmer_rules():
    """Rule semantics: minimal plural then ONE derivational strip (en);
    single ordered strip with a minimum-stem guard elsewhere. The rules
    are anchored lazy-prefix regexes (longest suffix wins, min stem
    enforced by the {n,} bound)."""
    from miru_spark.analysis.stem import stem

    cases = {
        "en": [("meetings", "meet"),      # plural strip THEN -ing strip
               ("running", "runn"),
               ("glass", "glass"),        # -ss protected
               ("bus", "bus"),            # -us protected
               ("cats", "cat"),
               ("nation", "nation"),      # -ation needs a 3-char stem
               ("statements", "stat"),    # plural then -ement
               ("red", "red"),            # too short for -ed
               ("quickly", "quick")],
        "de": [("häuser", "häus"), ("haben", "habe"),
               ("tags", "tags"),          # min stem 4: unchanged
               ("rot", "rot")],
        "fr": [("chevaux", "chev"), ("heureuses", "heur"), ("chats", "chat")],
        "es": [("canciones", "cancion"), ("gatos", "gato"),
               ("rojo", "rojo")],      # min stem 4: unchanged
        # --- round 5: the rest of the reference's stemming locales ---
        "it": [("amministrazione", "amministr"), ("libri", "libr"),
               ("bella", "bell")],
        "pt": [("livros", "livr"), ("correndo", "corr"),
               ("cães", "cão"), ("cão", "cão")],  # -ães -> -ão fold
        "nl": [("mogelijkheden", "mogelijkheid"),  # -heden -> -heid fold
               ("boeken", "boek"), ("huisje", "huis")],
        "ru": [("книгами", "книг"), ("красивый", "красив"), ("окно", "окн")],
        "sv": [("flickorna", "flick"), ("starkaste", "stark"),
               ("huset", "hus")],
        "da": [("bilerne", "bil"), ("huset", "hus"), ("piger", "pig")],
        "no": [("guttene", "gutt"), ("huset", "hus")],
        "fi": [("talossa", "talo"), ("autolla", "auto"), ("kirjat", "kirja")],
        "cs": [("hradech", "hrad"), ("ženami", "žen"), ("mladého", "mlad")],
        "ro": [("copiilor", "cop"), ("orașul", "oraș")],
        "ca": [("cases", "cas"), ("pagaments", "pag")],
        "gl": [("camións", "camión"), ("libros", "libro")],
        "id": [("bukunya", "buku"), ("makanan", "makan"),
               ("membaca", "baca")],   # prefix rule
        "hi": [("लड़कों", "लड़क"), ("किताबें", "किताब")],
        "bg": [("книгите", "книг"), ("градовете", "град")],
        "gr": [("ανθρώπων", "ανθρώπ"), ("καλός", "καλ")],
        "tr": [("kitapları", "kitap"), ("evlerin", "ev"), ("okulda", "okul")],
        "lv": [("grāmatas", "grāmat"), ("bērniem", "bērn")],
        "eu": [("etxearen", "etxe"), ("liburuak", "liburu")],
        "hy": [("գրքերը", "գրք")],
        "ar": [("الكتاب", "كتاب"),     # definite-article prefix strip
               ("مدرسة", "مدرس"), ("معلمون", "معلم")],
        "ku": [("کتێبەکان", "کتێب")],
        "ga": [("scoileanna", "scoil"), ("hathair", "athair")],
    }
    for lang, cs in cases.items():
        for tok, want in cs:
            assert stem(tok, lang) == want, (lang, tok, stem(tok, lang))
    # confluence: inflected and base forms MEET (the property queries
    # rely on; exact stem spelling is secondary for a light stemmer)
    pairs = [("pt", "nações", "nação"), ("pt", "livros", "livro"),
             ("pt", "correndo", "correr"), ("pt", "cães", "cão"),
             ("nl", "mogelijkheden", "mogelijkheid"),
             ("tr", "kitapları", "kitap"), ("ca", "pagaments", "pagament")]
    for lang, a, b in pairs:
        assert stem(a, lang) == stem(b, lang), (lang, a, b)


def test_stem_locale_tokenize_and_jvm_parity(spark):
    """en_stem/de_stem/fr_stem/es_stem resolve; tokenize() stems after
    the stop filter; the JVM tokens_col twin is token-identical
    (chained regexp_replace, Java $1 spelling)."""
    from pyspark.sql import functions as F

    from miru_spark.analysis.tokenizer import tokens_col

    assert find_analyzer("en_stem").stem_lang == "en"
    # base locales are untouched (frozen generations)
    assert find_analyzer("en").stem_lang is None
    assert tokenize("the meetings were running", locale="en_stem") == \
        ["the", "meet", "were", "runn"]
    # stopword filter runs BEFORE the stemmer (Lucene analyzer order)
    assert tokenize("the meetings", locale="en_stem", use_stopwords=True) == ["meet"]

    texts = ["The meetings were running smoothly",
             "Nations and nationalization statements",
             "glass buses pass axes", "Häuser haben viele Tage",
             "chevaux heureuses", "canciones de gatos"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")
    for loc in ("en_stem", "de_stem", "fr_stem", "es_stem"):
        for use_stop in (False, True):
            rows = df.select(
                "id",
                tokens_col(F.col("text"), use_stopwords=use_stop,
                           locale=loc).alias("toks"),
            ).collect()
            for r in rows:
                want = tokenize(texts[r["id"]], use_stopwords=use_stop, locale=loc)
                assert r["toks"] == want, (loc, use_stop, texts[r["id"]])


def test_stem_locale_round5_jvm_parity(spark):
    """The round-5 stem locales (full reference stemming map) run the
    same rule tables through Java regexp_replace (tokens_col) as through
    Python re (tokenize) — token-identical across scripts (Latin with
    diacritics, Cyrillic, Greek, Devanagari, Armenian, Arabic/Sorani)."""
    from pyspark.sql import functions as F

    from miru_spark.analysis.tokenizer import find_analyzer, tokens_col

    texts = [
        "as nações discutem correndo os relatórios",
        "mogelijkheden voor boeken en huisje",
        "книгами на красивый окно",
        "flickorna huset bilerne guttene",
        "talossa autolla kirjat",
        "hradech ženami mladého copiilor",
        "bukunya makanan membaca",
        "लड़कों और किताबें",
        "книгите градовете ανθρώπων καλός",
        "kitapları evlerin okulda grāmatas",
        "etxearen liburuak գրքերը",
        "الكتاب مدرسة معلمون کتێبەکان",
        "scoileanna hathair amministrazione cases camións",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")
    locs = ["it_stem", "pt_stem", "pt_br_stem", "nl_stem", "ru_stem",
            "sv_stem", "da_stem", "nb_stem", "nn_stem", "fi_stem",
            "cs_stem", "ro_stem", "ca_stem", "gl_stem", "id_stem",
            "hi_stem", "bg_stem", "gr_stem", "tr_stem", "lv_stem",
            "eu_stem", "hy_stem", "ar_stem", "ku_stem", "en_ie_stem"]
    for loc in locs:
        assert find_analyzer(loc).stem_lang is not None, loc
    for loc in locs:
        rows = df.select(
            "id", tokens_col(F.col("text"), locale=loc).alias("toks"),
        ).collect()
        for r in rows:
            want = tokenize(texts[r["id"]], locale=loc)
            assert r["toks"] == want, (loc, texts[r["id"]], r["toks"], want)


def test_stem_sql_expr_matches_python():
    """The DuckDB oracle twin (sql_stem_expr) is character-identical to
    the Python stemmer on every rule path + fuzz tokens — the 3-engine
    parity that lets bm25_stemmed carry a value oracle."""
    import random

    import duckdb

    from miru_spark.analysis.stem import RULES, sql_stem_expr, stem

    con = duckdb.connect()
    random.seed(7)
    alpha = "abcdefghilmnorstuvxyz"
    toks = ["".join(random.choice(alpha) for _ in range(random.randint(1, 12)))
            for _ in range(300)]
    toks += ["nations", "nationalization", "usefulness", "ss", "uss",
             "axes", "eaux", "issements", "meetings", "glass"]
    # round-5 locales: non-Latin + fold-rule (\1<tail> replacement) words
    toks += ["nações", "cães", "mogelijkheden", "книгами", "окно",
             "красивый", "ανθρώπων", "लड़कों", "किताबें", "الكتاب",
             "کتێبەکان", "գրքերը", "kitapları", "grāmatas", "hradech",
             "ženami", "camións", "bukunya", "membaca", "scoileanna",
             "hathair", "huset", "copiilor"]
    for lang in RULES:
        sql = sql_stem_expr("t", lang)
        rows = con.execute(
            f"SELECT t, {sql} FROM (SELECT unnest(?) AS t)", [toks]).fetchall()
        for t, s in rows:
            assert stem(t, lang) == s, (lang, t, stem(t, lang), s)


def test_stemmed_index_end_to_end_round5_locales(spark, tmp_path):
    """Round-5 stem locales end-to-end: an inflected query matches docs
    holding other inflections of the same lemma, exact and WAND paths
    rank-identically — the cross-inflection behavior the reference's
    stemming analyzers give pt/ru/tr users."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search, search_wand_query

    cases = {
        "pt_stem": (
            [(0, "as nações aprovaram"), (1, "uma nação unida"),
             (2, "os livros da nação"), (3, "nada relevante")],
            "nações", {0, 1, 2}),
        "ru_stem": (
            [(0, "красивый дом"), (1, "очень красивая река"),
             (2, "дом у реки"), (3, "ничего здесь")],
            "красивая", {0, 1}),
        "tr_stem": (
            [(0, "kitaplar masada"), (1, "bir kitap okudum"),
             (2, "masada kalem var"), (3, "alakasız metin")],
            "kitapları", {0, 1}),
    }
    for loc, (rows, q, want) in cases.items():
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        idx = str(tmp_path / f"idx_{loc}")
        build_index(spark, docs, idx, n_shards=1, block_bits=6, locale=loc)
        r = IndexReader(spark, idx)
        exact = search(r, q, k=10).collect()
        assert {h["doc_id"] for h in exact} == want, (loc, q, exact)
        wand = search_wand_query(r, q, k=10).collect()
        assert [(h["doc_id"], round(h["score"], 9)) for h in wand] == \
            [(h["doc_id"], round(h["score"], 9)) for h in exact], loc


def test_stemmed_index_end_to_end(spark, tmp_path):
    """An en_stem index matches across inflections ('meetings' query
    hits docs containing meeting/meet/meetings) on BOTH the inline and
    disk-index paths, and the schema pins the analyzer generation."""
    from miru_spark.analysis.tokenizer import ANALYZER_VERSION
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.schema import read_schema
    from miru_spark.query.bm25 import search, search_wand

    docs = spark.createDataFrame(
        [(0, "the team meeting ran long"),
         (1, "we meet on mondays"),
         (2, "meetings about meetings"),
         (3, "nothing relevant here")],
        "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, n_shards=1, block_bits=6, locale="en_stem")
    assert read_schema(idx).analyzer_version == ANALYZER_VERSION
    r = IndexReader(spark, idx)
    exact = search(r, "meetings", k=10).collect()
    assert {h["doc_id"] for h in exact} == {0, 1, 2}
    wand = search_wand(r, ["meetings"], k=10).collect()
    assert [(h["doc_id"], round(h["score"], 9)) for h in wand] == \
        [(h["doc_id"], round(h["score"], 9)) for h in exact]


def test_schema_guard_accepts_compatible_analyzer_generation(tmp_path):
    """Generation 2 -> 3 only ADDED locale codes (*_stem): appends to a
    gen-2 index are additive and re-pin the schema at the new
    generation; gen 1 -> 3 stays rejected."""
    from miru_spark.analysis.tokenizer import ANALYZER_VERSION
    from miru_spark.index.schema import IndexSchema, check_additive

    mk = lambda gen: IndexSchema(  # noqa: E731
        id_col="doc_id", text_col="text", locale="de",
        use_stopwords=False, block_bits=13, analyzer_version=gen)
    assert check_additive(mk(2), mk(ANALYZER_VERSION)) == []
    assert any("analyzer_version" in p
               for p in check_additive(mk(1), mk(ANALYZER_VERSION)))


def test_stemmed_phrase_positions_and_text_parity(spark, tmp_path):
    """Phrase adjacency on a stemming index: both physical phrase plans
    (positions sidecar / text re-analysis) stem identically — the
    sidecar's position stream comes from the same tokenize(), so a
    quoted inflected phrase matches stem-adjacent docs on either plan."""
    from miru_spark.index import positions as pos
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search_wand_query

    docs = spark.createDataFrame(
        [(0, "the team meeting reports arrived"),
         (1, "meetings report nothing new"),
         (2, "meeting of quarterly reporting"),   # meet..report NOT adjacent
         (3, "no relevant words here")],
        "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, n_shards=1, block_bits=6, locale="en_stem")
    pos.build_positions(spark, docs, idx)
    r = IndexReader(spark, idx)
    via_pos = search_wand_query(
        r, '"meetings reported"', k=10, phrase_via="positions").collect()
    via_text = search_wand_query(
        r, '"meetings reported"', k=10, phrase_via="text",
        text_df=docs).collect()
    assert {h["doc_id"] for h in via_pos} == {0, 1}
    assert [tuple(x) for x in via_pos] == [tuple(x) for x in via_text]


def test_stemmed_router_no_double_stem(spark, tmp_path):
    """The light stemmers are NOT idempotent ("fitting" -> "fitt"): the
    WAND router must not re-stem parser-analyzed terms, or the scale
    path looks up the wrong dictionary entries (round-4 review fix)."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search, search_wand, search_wand_query

    docs = spark.createDataFrame(
        [(0, "a fittingly good outcome"), (1, "the fitting room"),
         (2, "nothing here")],
        "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, n_shards=1, block_bits=6, locale="en_stem")
    r = IndexReader(spark, idx)
    exact = search(r, "fittingly", k=10).collect()
    assert {h["doc_id"] for h in exact} == {0}  # 'fittingly' -> 'fitting'
    wand = search_wand_query(r, "fittingly", k=10).collect()
    assert [tuple(x) for x in wand] == [tuple(x) for x in exact]
    # the raw-term API analyzes exactly ONCE
    raw = search_wand(r, ["fittingly"], k=10).collect()
    assert [tuple(x) for x in raw] == [tuple(x) for x in exact]
