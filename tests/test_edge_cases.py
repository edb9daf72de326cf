"""Edge-case corpus through the full build + query pipeline.

Covers: empty text, null text, single-token docs, a huge doc (10k
tokens), unicode/punctuation-only docs, byte-identical duplicate texts,
and only-stopword queries — each verified against the pure-Python oracle
(nulls/empties normalize to zero-length docs that still count toward
N/avgdl, as in the doc store).
"""

import pytest
from pyspark.sql import functions as F

from miru_spark.query import bm25


@pytest.fixture(scope="module")
def edge_corpus():
    docs = {
        0: "",  # empty
        1: None,  # null text
        2: "solo",  # single token
        3: "alpha beta " * 5000,  # huge doc (10k tokens)
        4: "ÉMOJI 🎈 — punctuation!!! …",  # non-ascii mostly stripped
        5: "alpha beta gamma",
        6: "alpha beta gamma",  # exact duplicate of 5
        7: "The AND or NOT operators as words",
        8: "42 7 42 numbers 42",
    }
    return docs


@pytest.fixture(scope="module")
def edge_index(spark, edge_corpus, tmp_path_factory):
    from miru_spark.index.builder import build_index

    df = spark.createDataFrame(
        [(i, t) for i, t in edge_corpus.items()], "doc_id long, text string"
    )
    out = str(tmp_path_factory.mktemp("edge") / "idx")
    meta = build_index(spark, df, out, n_shards=2, block_bits=3, overwrite=True)
    return meta


@pytest.fixture(scope="module")
def edge_oracle(edge_corpus):
    from tests.oracle import OracleIndex

    return OracleIndex({i: (t or "") for i, t in edge_corpus.items()})


def test_stats_include_empty_docs(edge_index, edge_oracle):
    assert edge_index.n_docs == edge_oracle.n_docs  # empties/nulls count
    assert edge_index.total_tokens == sum(edge_oracle.doclen.values())
    assert abs(edge_index.avgdl - edge_oracle.avgdl) < 1e-9


def test_dictionary_exact(spark, edge_index, edge_oracle):
    from miru_spark.index.reader import IndexReader

    reader = IndexReader(spark, edge_index.index_dir)
    df_rows = {r["term"]: r["df"] for r in reader.dictionary().collect()}
    assert df_rows == dict(edge_oracle.df)
    # unicode doc: lowercased ascii token survives, emoji/punct stripped
    assert "moji" in df_rows or "emoji" not in df_rows


def test_huge_doc_and_duplicates_score(spark, edge_index, edge_oracle):
    from miru_spark.index.reader import IndexReader

    reader = IndexReader(spark, edge_index.index_dir)
    terms = ["alpha", "beta"]
    expected = edge_oracle.topk(edge_oracle.candidates_and(terms), terms, 10)
    got = [(r["doc_id"], r["score"]) for r in bm25.search(reader, "alpha AND beta", k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (gd, gs), (ed, es) in zip(got, expected):
        assert abs(gs - es) < 1e-9
    # exact duplicates tie on score -> higher doc_id first (FullText.java:295-303)
    dup_pair = [d for d, _ in got if d in (5, 6)]
    assert dup_pair == [6, 5]


def test_numeric_tokens(spark, edge_index, edge_oracle):
    from miru_spark.index.reader import IndexReader

    reader = IndexReader(spark, edge_index.index_dir)
    expected = edge_oracle.topk(edge_oracle.candidates_and(["42"]), ["42"], 5)
    got = [(r["doc_id"], r["score"]) for r in bm25.search(reader, "42", k=5).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected]


def test_operator_words_as_terms(spark, edge_index, edge_oracle):
    from miru_spark.index.reader import IndexReader

    reader = IndexReader(spark, edge_index.index_dir)
    # quoted-less parser: "operators AND words" -> both must match doc 7
    got = bm25.search(reader, "operators AND words", k=5).collect()
    assert [r["doc_id"] for r in got] == [7]


def test_only_stopword_query_on_stopword_index(spark, tmp_path):
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader

    df = spark.createDataFrame(
        [(0, "the quick fox"), (1, "a lazy dog")], "doc_id long, text string"
    )
    idx = str(tmp_path / "sw")
    build_index(spark, df, idx, n_shards=1, block_bits=3, use_stopwords=True, overwrite=True)
    reader = IndexReader(spark, idx)
    assert bm25.search(reader, "the", k=5).count() == 0
    assert bm25.search(reader, "the AND a", k=5).count() == 0


def test_empty_corpus_builds_empty_index(spark, tmp_path):
    """Zero input docs -> a valid empty index; queries return nothing."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.query import bm25

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = str(tmp_path / "idx_empty")
    meta = build_index(spark, empty, out, n_shards=2, block_bits=6, overwrite=True)
    assert meta.n_docs == 0 and meta.n_terms == 0 and meta.avgdl == 0.0
    r = IndexReader(spark, out)
    assert bm25.search(r, "anything", k=5).count() == 0
    assert bm25.search_wand(r, ["anything"], k=5).count() == 0
    assert bm25.search_wand(r, ["anything"], k=5, mode="or").count() == 0
    assert r.dictionary().count() == 0


def test_wand_k_zero(spark, tmp_path):
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader
    from miru_spark.query import bm25

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(10)], "doc_id long, text string"
    )
    out = str(tmp_path / "idx_k0")
    build_index(spark, docs, out, n_shards=1, block_bits=5, overwrite=True)
    r = IndexReader(spark, out)
    assert bm25.search_wand(r, ["alpha"], k=0).count() == 0
    assert bm25.search(r, "alpha", k=0).count() == 0
