import pytest

from miru_spark.query import bm25
from miru_spark.query.parser import parse_query


@pytest.fixture(scope="module")
def reader(spark, built_index):
    from miru_spark.index.reader import IndexReader

    return IndexReader(spark, built_index.index_dir)


@pytest.fixture(scope="module")
def oracle(corpus):
    from tests.oracle import OracleIndex

    docs = {r["doc_id"]: r["text"] for r in corpus.select("doc_id", "text").collect()}
    return OracleIndex(docs)


def _assert_rank_identical(got_rows, expected, tol=1e-9):
    got = [(r["doc_id"], r["score"]) for r in got_rows]
    assert len(got) == len(expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed, (got, expected)
        assert abs(gs - es) < tol, (gd, gs, es)


@pytest.mark.parametrize(
    "terms,k",
    [(["w00000"], 10), (["w00001", "w00004"], 10), (["the0", "w00002"], 25),
     (["w00010", "w00020", "w00030"], 100)],
)
def test_bm25_and_matches_oracle(reader, oracle, terms, k):
    expected = oracle.topk(oracle.candidates_and(terms), terms, k)
    got = bm25.search(reader, " AND ".join(terms), k=k).collect()
    _assert_rank_identical(got, expected)


def test_bm25_or_matches_oracle(reader, oracle):
    terms = ["w00050", "w00003"]
    expected = oracle.topk(oracle.candidates_or(terms), terms, 15)
    got = bm25.search(reader, " OR ".join(terms), k=15).collect()
    _assert_rank_identical(got, expected)


def test_bm25_not(reader, oracle):
    cands = oracle.candidates_and(["w00001"]) - oracle.postings("w00000")
    expected = oracle.topk(cands, ["w00001"], 20)
    got = bm25.search(reader, "w00001 NOT w00000", k=20).collect()
    _assert_rank_identical(got, expected)


def test_bm25_prefix(reader, oracle):
    exp_terms = oracle.expand_prefix("w0000")
    cands = oracle.candidates_or(exp_terms)
    expected = oracle.topk(cands, exp_terms, 10)
    got = bm25.search(reader, "w0000*", k=10, max_expansion=1000).collect()
    _assert_rank_identical(got, expected)


def test_bm25_nested(reader, oracle):
    # (a OR b) AND c
    a, b, c = "w00005", "w00006", "w00001"
    cands = (oracle.postings(a) | oracle.postings(b)) & oracle.postings(c)
    expected = oracle.topk(cands, [a, b, c], 10)
    got = bm25.search(reader, f"({a} OR {b}) AND {c}", k=10).collect()
    _assert_rank_identical(got, expected)


def test_wand_matches_exact(reader, oracle):
    for terms, k in [(["w00001", "w00004"], 10), (["the0", "w00002"], 5),
                     (["w00000"], 50)]:
        exact = bm25.search(reader, " AND ".join(terms), k=k).collect()
        wand = bm25.search_wand(reader, terms, k=k).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in exact] == [
            (r["doc_id"], round(r["score"], 9)) for r in wand
        ]


def test_wand_missing_term_empty(reader):
    assert bm25.search_wand(reader, ["w00001", "zzznope"], k=5).count() == 0


def test_time_strategy_newest_first(reader, oracle):
    got = bm25.search_time_newest(reader, "w00001", k=8).collect()
    cands = sorted(oracle.postings("w00001"), reverse=True)[:8]
    assert [r["doc_id"] for r in got] == cands
    assert all(r["score"] == 0.0 for r in got)


def test_parser():
    from miru_spark.query import parser as qp

    ast = parse_query("a b OR c")
    assert isinstance(ast, qp.Or)
    ast2 = parse_query("Hello AND NOT world")
    assert isinstance(ast2, qp.And)
    assert isinstance(ast2.children[1], qp.Not)
    ast3 = parse_query("pre*")
    assert ast3 == qp.Prefix("pre")
    with pytest.raises(qp.QueryParseError):
        parse_query("(a OR b")


def test_search_with_constraint_mask(spark, corpus, built_index):
    """Constraint mask (lang='en') = reference's constraints/authz AND."""
    from pyspark.sql import functions as F

    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search

    reader = IndexReader(spark, built_index.index_dir)
    full = {r["doc_id"]: r["score"] for r in search(reader, "w00000 w00001", k=1000).collect()}
    constrained = search(
        reader, "w00000 w00001", k=1000, constraint=F.col("lang") == "en"
    ).collect()
    en_docs = {r["doc_id"] for r in corpus.filter(F.col("lang") == "en").collect()}
    assert constrained, "constraint query returned nothing"
    for r in constrained:
        assert r["doc_id"] in en_docs          # mask applied
        assert r["score"] == full[r["doc_id"]]  # scores unchanged (global stats)
    assert {r["doc_id"] for r in constrained} == set(full) & en_docs
