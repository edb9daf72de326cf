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
