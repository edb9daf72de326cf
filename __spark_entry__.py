"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k query at sf0.001.
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2 (fulltext/BM25 index + query, miru's secondary query
families over the `events` stream table, and the training-pipeline ops
over `documents`/`embeddings`).  ``oracle_sql()`` carries the DuckDB
equivalent for every SQL-expressible entry; approximate/seeded/regex-
windowing ops (MinHash-LSH, SimHash, SRP-LSH, winnowing, multimodal
stubs, snippet highlighting) are rows-only by design and documented as
such on each callable.

Column names and float rounding are aligned on both sides so the
driver's order-insensitive value-hash comparison is meaningful.
"""

from __future__ import annotations

import math
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miru_spark.analysis.tokenizer import STOPWORDS_EN, tokenize_udf

K1, B = 1.2, 0.75

# ---------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------

def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


_INDEX_CACHE: dict[str, str] = {}
_INDEX_LOCK = __import__("threading").Lock()


def _reader(spark: SparkSession, sf_dir: str, locale: str | None = None):
    """Build (once per process per (sf_dir, locale)) and open the on-disk
    inverted index over the `documents` table. Lock: a driver running
    queries() callables concurrently must not double-build."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader

    with _INDEX_LOCK:
        return _reader_locked(spark, sf_dir, build_index, IndexReader, locale)


_READER_CACHE: dict[str, object] = {}


def _reader_locked(spark, sf_dir, build_index, IndexReader, locale=None):
    key = sf_dir if locale is None else f"{sf_dir}\x00{locale}"
    if key not in _INDEX_CACHE:
        d = os.path.join(tempfile.mkdtemp(prefix="miru_entry_"), "idx")
        build_index(
            spark,
            _read(spark, sf_dir, "documents"),
            d,
            id_col="doc_id",
            text_col="text",
            stored_cols=["lang", "source"],
            keyword_fields={"lang": "lang", "source": "source"},
            n_shards=4,
            locale=locale,
            overwrite=True,
        )
        _INDEX_CACHE[key] = d
    # reuse the reader INSTANCE: its memoized base relations save the
    # per-query spark.read.parquet driver round-trips (IndexReader is a
    # read-only snapshot handle; the entry context never mutates a built
    # index). Invalidated when the index dir changes (e.g. bench injects
    # its own freshly built index into _INDEX_CACHE) or the SparkSession
    # differs (a stale session's plans are unusable).
    r = _READER_CACHE.get(key)
    if r is None or r.index_dir != _INDEX_CACHE[key] or r.spark is not spark:
        r = IndexReader(spark, _INDEX_CACHE[key])
        _READER_CACHE[key] = r
    return r


_TOKS_CACHE: dict[str, DataFrame] = {}
# Bounded cache lifecycle: a long driver session iterating many sf dirs
# must not accumulate persisted relations (executor storage memory) —
# entries past the bound are unpersisted LRU-style. Two is enough for the
# driver's pattern (one sf dir per round, occasionally two when comparing).
_TOKS_CACHE_MAX = 2


def clear_entry_caches() -> None:
    """Unpersist + drop every cached relation this module holds (tokenized
    corpora; the built on-disk indexes stay — they are temp dirs, not
    executor memory). For drivers embedding the entry across many sf dirs."""
    with _INDEX_LOCK:
        for df in _TOKS_CACHE.values():
            df.unpersist()
        _TOKS_CACHE.clear()


def _toks_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenized relation, persisted once per sf_dir (not once per call):
    it feeds three consumers per query (corpus stats, tf extraction, df
    counts) — one Arrow-UDF pass instead of three — and repeated entry
    calls in one session reuse the same cache entry instead of leaking."""
    with _INDEX_LOCK:
        if sf_dir in _TOKS_CACHE:
            # true LRU: refresh recency on hit, else round-robin access
            # over N>max dirs would evict exactly the dir needed next
            _TOKS_CACHE[sf_dir] = _TOKS_CACHE.pop(sf_dir)
        else:
            while len(_TOKS_CACHE) >= _TOKS_CACHE_MAX:
                old_key = next(iter(_TOKS_CACHE))
                _TOKS_CACHE.pop(old_key).unpersist()
            docs = _read(spark, sf_dir, "documents")
            tok = tokenize_udf()
            _TOKS_CACHE[sf_dir] = (
                docs.select(
                    F.col("doc_id").cast("long").alias("doc_id"),
                    tok(F.col("text")).alias("toks"),
                )
                .withColumn("doclen", F.size("toks"))
                .persist()
            )
        return _TOKS_CACHE[sf_dir]


def _bm25_inline(spark: SparkSession, sf_dir: str, terms: list[str], k: int, mode: str) -> DataFrame:
    """Single-pass declarative BM25 (no persisted index): tokenize ->
    tf/doclen -> broadcast idf -> score -> distributed top-k. The logical
    plan the index build/query pipeline factors into stages."""
    toks = _toks_cached(spark, sf_dir)
    g = toks.agg(F.count(F.lit(1)).alias("n"), F.sum("doclen").alias("s")).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["s"]) / int(g["n"])

    tf = (
        toks.select("doc_id", "doclen", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "doclen", "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )
    dfc = {
        r["term"]: r["df"]
        for r in tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df")).collect()
    }
    if mode == "and" and any(dfc.get(t, 0) == 0 for t in terms):
        return spark.createDataFrame([], "doc_id long, score double")
    idf_rows = [
        (t, math.log(1.0 + (n_docs - dfc[t] + 0.5) / (dfc[t] + 0.5))) for t in terms if t in dfc
    ]
    idf_df = spark.createDataFrame(idf_rows, "term string, idf double")
    scored = (
        tf.join(F.broadcast(idf_df), "term")
        .withColumn(
            "contrib",
            F.col("idf") * F.col("tf") * F.lit(K1 + 1.0)
            / (F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("doclen") / F.lit(avgdl))),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"), F.countDistinct("term").alias("nt"))
    )
    if mode == "and":
        scored = scored.filter(F.col("nt") == len(terms))
    return (
        scored.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").desc())
        .limit(k)
    )


# DuckDB-side tokenizer expression (same semantics as analysis.tokenizer)
_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS_EN)) + "]"


def _bm25_sql(
    terms: list[str], k: int, mode: str, offset: int = 0,
    boosts: dict[str, float] | None = None,
    exclude: list[str] | None = None,
) -> str:
    boosts = boosts or {}
    vals = ", ".join(f"('{t}', {float(boosts.get(t, 1.0))})" for t in terms)
    having = f"WHERE nt = {len(terms)}" if mode == "and" else ""
    if exclude:
        # NOT terms: docs containing any excluded term never answer
        ex_vals = ", ".join(f"('{t}')" for t in exclude)
        anti = (f" AND doc_id NOT IN (SELECT DISTINCT tk.doc_id FROM tk "
                f"JOIN (VALUES {ex_vals}) ex(term) USING (term))")
        having = (having + anti) if having else ("WHERE true" + anti)
    off = f" OFFSET {offset}" if offset else ""
    return f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term, boost) AS (VALUES {vals}),
tf AS (SELECT tk.doc_id, tk.term, any_value(q.boost) AS boost, count(*) AS tf
       FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( tf.boost * ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) ) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT doc_id, round(score, 4) AS score FROM scored {having}
ORDER BY score DESC, doc_id DESC LIMIT {k}{off}
"""


_BM25_TERMS = ["spark", "query", "data"]
_OR_TERMS = ["merge", "window"]

_PHRASE_SQL = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
ph AS (SELECT doc_id FROM base
       WHERE len(list_filter(generate_series(1, len(toks) - 1),
                             i -> toks[i] = 'table' AND toks[i + 1] = 'hash')) > 0),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES ('data'), ('table'), ('hash')),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) ) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT s.doc_id, round(s.score, 4) AS score FROM scored s JOIN ph USING (doc_id)
WHERE nt = 3 ORDER BY score DESC, doc_id DESC LIMIT 10
"""


# ---------------------------------------------------------------------
# fulltext / index family
# ---------------------------------------------------------------------

def q_bm25_and(spark, sf_dir):
    return _bm25_inline(spark, sf_dir, _BM25_TERMS, 10, "and")


def q_bm25_or(spark, sf_dir):
    return _bm25_inline(spark, sf_dir, _OR_TERMS, 10, "or")


def q_bm25_index_search(spark, sf_dir):
    """Disk-index path: parser -> candidates -> BM25 (must equal q_bm25_and)."""
    from miru_spark.query.bm25 import search

    return search(_reader(spark, sf_dir), " AND ".join(_BM25_TERMS), k=10, round_to=4)


def q_bm25_index_wand(spark, sf_dir):
    """Block-max WAND scale path (must equal q_bm25_and)."""
    from miru_spark.query.bm25 import search_wand

    r = _reader(spark, sf_dir)
    out = search_wand(r, _BM25_TERMS, k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_boost(spark, sf_dir):
    """Lucene `term^N` boost: the clause weight scales the term's BM25
    contribution (reference parses queries through Lucene's classic
    QueryParser, ``LuceneBackedQueryParser.java:47-53``, whose grammar
    carries boosts into BoostQuery clause weights). Includes a
    fractional down-boost (`query^0.5`): the clause weight applies with
    no 1.0 floor, so N < 1 genuinely down-weights the term."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir), "spark^2 AND query^0.5 AND data", k=10, round_to=4)


def q_bm25_batch(spark, sf_dir):
    """Shared-scan batch serving: four queries answered from ONE
    postings decode — the union of their terms prunes the scan, each
    posting row fans out through a broadcast (query_id, term,
    boost-weighted idf) map, and one groupBy(query_id, doc_id) both
    sums BM25 and checks AND coverage; top-k per query is a window
    partitioned by query_id. Per-query rank-identical to search()
    (the reference's solver answers many concurrent queries per
    partition — MiruLowestLatencySolver; this is that amortization,
    declaratively)."""
    from miru_spark.query.bm25 import search_batch

    qs = {
        "and3": " AND ".join(_BM25_TERMS),
        "or2": " OR ".join(_OR_TERMS),
        "boosted": "spark^2 AND query^0.5 AND data",
        "boost_or": "data^1.5 OR scan",
        # round 5: non-flat shapes ride the SAME shared decode — the
        # phrase's constituent terms score through the union-term scan
        # with adjacency enforced by the shared phrase-match relation,
        # and the fielded conjunct joins the coverage count as a
        # zero-weight composite posting mask
        "ph": 'data AND "table hash"',
        "fld": "lang:en AND spark AND query",
        # negated term as a pos=0 row in the same coverage aggregation
        "notq": "spark AND query NOT merge",
    }
    return search_batch(_reader(spark, sf_dir), qs, k=10, round_to=4,
                        text_df=_read(spark, sf_dir, "documents"))


def q_bm25_page2(spark, sf_dir):
    """Second page via keyset continuation (report.lowestScore paging):
    page 1's last (score, doc_id) is the cursor for page 2."""
    from miru_spark.query.bm25 import search

    r = _reader(spark, sf_dir)
    q = " AND ".join(_BM25_TERMS)
    page1 = search(r, q, k=10, round_to=4).collect()
    cur = (page1[-1]["score"], page1[-1]["doc_id"])
    return search(r, q, k=10, round_to=4, after=cur)


def q_bm25_index_wand_or(spark, sf_dir):
    """Disjunctive block-max WAND (must equal q_bm25_or)."""
    from miru_spark.query.bm25 import search_wand

    r = _reader(spark, sf_dir)
    out = search_wand(r, _OR_TERMS, k=10, mode="or")
    return out.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_query_stopwords(spark, sf_dir):
    """Per-query useStopWords (reference FullTextQuery.java:22-44): 'the'
    is pruned from the query side on a stopword-keeping index, so this
    equals a plain scan AND merge query."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir), "the scan merge", k=10, round_to=4,
        use_stopwords=True,
    )


def q_bm25_prefix(spark, sf_dir):
    """Wildcard query `quer*` expanded against the dictionary (OR scoring)."""
    from miru_spark.query.bm25 import search

    return search(_reader(spark, sf_dir), "quer*", k=10, max_expansion=100000, round_to=4)


def q_bm25_lang_constraint(spark, sf_dir):
    """BM25 with a constraint mask (lang = 'en') semi-joined from the doc
    store — the reference's constraintsFilter/authz/time masks."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir), "spark AND query", k=10, round_to=4,
        constraint=F.col("lang") == "en",
    )


def q_bm25_authz(spark, sf_dir):
    """Composite authz mask: doc survives if any of its authz labels is in
    the caller's list — the union of the labels' composite-term posting
    lists resolved INDEX-side (MiruAuthzIndex.getCompositeAuthz: OR of the
    per-label bitmaps, MiruAuthzIndex.java:13; MiruAuthzExpression is a
    flat value list). Here the label field is `source`."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir), "spark AND query", k=10, round_to=4,
        authz=["src3", "src7", "src11", "src15"], authz_field="source",
    )


def q_bm25_fielded(spark, sf_dir):
    """Fielded query `lang:en AND spark AND query`: the keyword-field
    composite term (LuceneBackedQueryParser.java:76-144 TermQuery.field;
    MiruFieldDefinition feature lattice) is an exact-match candidate mask;
    the text terms BM25-score. Must equal the constraint-mask variant."""
    from miru_spark.query.bm25 import search

    return search(_reader(spark, sf_dir), "lang:en AND spark AND query", k=10, round_to=4)


def q_bm25_wand_fielded(spark, sf_dir):
    """The same fielded query on the SCALE path: block-max WAND over the
    scoring terms, then the `lang:en` composite posting list masks the
    bounded candidate heap (non-scoring, iterative deepening) — rank-
    identical to `bm25_fielded`, so it shares that oracle. Overfetch +
    rounded re-rank for the oracle's tie order, as bm25_wand_phrase."""
    from miru_spark.query.bm25 import search_wand_query

    out = search_wand_query(
        _reader(spark, sf_dir), "lang:en AND spark AND query", k=30)
    return (
        out.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").desc())
        .limit(10)
    )


def q_bm25_wand_not(spark, sf_dir):
    """`NOT term` clauses on the SCALE path: negated postings anti-mask
    the bounded WAND heap (non-scoring, intersect-then-anti so the
    unbounded posting list streams against the broadcast heap) — the
    exact path's negative anti-join semantics, block-pruned."""
    from miru_spark.query.bm25 import search_wand_query

    out = search_wand_query(
        _reader(spark, sf_dir), "spark AND query NOT merge", k=30)
    return (
        out.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").desc())
        .limit(10)
    )


def q_bm25_wand_or_fielded(spark, sf_dir):
    """Fielded disjunct on the SCALE path (round-4 router widening): in
    `spark OR lang:de`, the `lang:de` composite posting list QUALIFIES
    docs that carry no scoring term at all — search_wand_query runs the
    OR-WAND over the scoring terms and completes the answer with
    zero-score members of the composite postings (postings-scan union,
    doc_id desc), exactly search()'s _or_admits_nonscoring semantics.
    'dup' is the rarest term at sf0.01 (df=25), so k=30 genuinely
    crosses into the zero-score admission region."""
    from miru_spark.query.bm25 import search_wand_query

    out = search_wand_query(_reader(spark, sf_dir), "dup OR lang:de", k=30)
    return (
        out.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").desc())
        .limit(30)
    )


def q_bm25_wand_not_phrase(spark, sf_dir):
    """`NOT "a b"` on the SCALE path (round-4 router widening): the
    negated phrase's match relation anti-masks the bounded WAND heap
    (intersect-then-anti, the neg_masks shape with adjacency as the
    mask) — rank-identical to the exact path's phrase anti-join."""
    from miru_spark.query.bm25 import search_wand_query

    out = search_wand_query(
        _reader(spark, sf_dir), 'spark AND query NOT "data scan"', k=30,
        text_df=_read(spark, sf_dir, "documents"),
    )
    return (
        out.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").desc())
        .limit(10)
    )


def q_bm25_wand_nested(spark, sf_dir):
    """Nested boolean on the SCALE path: ((spark AND query) OR scan)
    NOT merge is not a flat WAND shape, so the router answers it through
    the coverage verifier — disjunctive block-max WAND over the positive
    terms + the fused plan's leaf-coverage bits evaluated over the
    broadcast heap (query/bm25.py::_search_wand_coverage). Rank-identical
    to the exact path by construction."""
    from miru_spark.query.bm25 import search_wand_query

    out = search_wand_query(
        _reader(spark, sf_dir), "((spark AND query) OR scan) NOT merge", k=30)
    return (
        out.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").desc())
        .limit(10)
    )


def q_bm25_gather_fields(spark, sf_dir):
    """Display-field gather AFTER top-k (the reference's lazy Promise
    gather, FullText.java:204-217): (doc_id, score, lang, source)."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir), " AND ".join(_BM25_TERMS), k=10, round_to=4,
        gather_fields=["lang", "source"],
    )


def q_bm25_phrase(spark, sf_dir):
    """Quoted-phrase query: posting-list AND candidates + one JVM
    adjacency-verify expression against the source table (no positional
    index, no Python in the verify path). Phrase terms score like
    ordinary BM25 terms; the oracle reproduces both the adjacency
    predicate and the scoring in SQL."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir), 'data AND "table hash"', k=10, round_to=4,
        text_df=_read(spark, sf_dir, "documents"),
    )


def q_bm25_wand_phrase(spark, sf_dir):
    """Quoted phrase on the SCALE path: ``search_wand_query`` parses the
    query, runs block-max WAND over the constituent terms (phrase terms
    score like ordinary terms), and adjacency-verifies the bounded
    candidate heap with iterative deepening — rank-identical to
    ``q_bm25_phrase`` by construction, so it shares that oracle."""
    from miru_spark.query.bm25 import search_wand_query

    # the oracle (and q_bm25_phrase's round_to=4) breaks ties on the
    # 4-decimal ROUNDED score; search_wand_query orders on raw scores.
    # Overfetch 3x, then re-rank in the rounded total order, so a
    # raw-vs-rounded tie at the rank-10 boundary picks the same docs.
    out = search_wand_query(
        _reader(spark, sf_dir), 'data AND "table hash"', k=30,
        text_df=_read(spark, sf_dir, "documents"),
    )
    return (
        out.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").desc())
        .limit(10)
    )


_POSITIONS_BUILT: set[str] = set()


def _reader_with_positions(spark, sf_dir, locale=None):
    """Like :func:`_reader`, plus the positional-postings sidecar — built
    lazily, once per cached index (only the positional entries pay for
    it; the core index entries keep their plans untouched)."""
    from miru_spark.index.positions import build_positions

    r = _reader(spark, sf_dir, locale=locale)
    with _INDEX_LOCK:
        if r.index_dir not in _POSITIONS_BUILT:
            build_positions(spark, _read(spark, sf_dir, "documents"), r.index_dir)
            _POSITIONS_BUILT.add(r.index_dir)
    return r


def q_bm25_phrase_positional(spark, sf_dir):
    """Quoted phrase answered from the POSITIONAL sidecar: adjacency is
    decided index-side by the greedy-chain kernel over per-term position
    blocks (miru_spark/index/positions.py) — no doc-text relation in the
    verify plan at all (the Lucene positional plan; the reference itself
    re-parses text, LuceneBackedQueryParser.java:56-74). Rank-identical
    to ``q_bm25_phrase`` by construction, so it shares that oracle."""
    from miru_spark.query.bm25 import search

    return search(
        _reader_with_positions(spark, sf_dir), 'data AND "table hash"',
        k=10, round_to=4, phrase_via="positions",
    )


def q_bm25_slop_positional(spark, sf_dir):
    """Ordered sloppy phrase `"table hash"~2` via the positional sidecar:
    the greedy chain admits any in-order occurrence spanning <= n+slop
    tokens — exactly the text automaton's window rule. Shares
    ``bm25_slop``'s oracle."""
    from miru_spark.query.bm25 import search

    return search(
        _reader_with_positions(spark, sf_dir), '"table hash"~2',
        k=10, round_to=4, phrase_via="positions",
    )


def q_bm25_wand_phrase_positional(spark, sf_dir):
    """Phrase on the SCALE path with positional verification: block-max
    WAND ranks the constituent terms, then the bounded heap is filtered
    by a semi-join against the positional phrase-match relation — the
    whole phrase plan is index-only (no text scan even for verify).
    Rank-identical to ``q_bm25_phrase``, so it shares that oracle."""
    from miru_spark.query.bm25 import search_wand_query

    out = search_wand_query(
        _reader_with_positions(spark, sf_dir), 'data AND "table hash"',
        k=30, phrase_via="positions",
    )
    return (
        out.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").desc())
        .limit(10)
    )


def q_bm25_phrase_de(spark, sf_dir):
    """Phrase verification over a NON-en-locale index: the unicode
    analyzer has a JVM ``tokens_col`` twin (parity-tested), so quoted
    phrases no longer refuse non-ASCII analyzers (round 2 raised here).
    The documents corpus is ASCII, where the de/unicode token stream
    equals the frozen ASCII stream, so the SQL oracle carries over
    unchanged; non-ASCII adjacency is pytest-covered (test_locale)."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir, locale="de"), 'data AND "table hash"', k=10,
        round_to=4, text_df=_read(spark, sf_dir, "documents"),
    )


# Deterministic synthetic Japanese corpus for the CJK-analyzer entry.
# The driver's DuckDB side sees only the fixed testdata views, so the
# SAME literals are embedded in the oracle SQL as a VALUES relation —
# no external data, identical on both sides by construction. Pure
# Han/Hiragana/Katakana + spaces (no ASCII / punctuation), so the
# oracle tokenizer needs only the unigram-spacing rule.
_JA_DOCS: list[tuple[int, str]] = [
    (0, "東京タワーは東京の名所です"),
    (1, "京都は古い都で名所が多い"),
    (2, "タワーから東京の街を見る"),
    (3, "大阪の名所はお城です"),
    (4, "東京と京都を結ぶ新幹線"),
    (5, "名所めぐりはたのしい"),
    (6, "タワーのある街の夜景"),
    (7, "東の空と京の街なみ"),
    (8, "城と寺は京都の名所です"),
    (9, "東京タワーと京都タワーをくらべる"),
    (10, "街の名所を歩いてまわる"),
    (11, "新幹線で東へむかう"),
]


# Deterministic synthetic English corpus with inflected forms for the
# stemming-analyzer entry (same VALUES-literal contract as _JA_DOCS).
_STEM_DOCS: list[tuple[int, str]] = [
    (0, "The weekly meetings were running long"),
    (1, "We meet to discuss the reports"),
    (2, "A meeting about quarterly reporting"),
    (3, "She reported the statement quickly"),
    (4, "Useful statements from the managers"),
    (5, "The manager manages many meetings"),
    (6, "Nothing relevant in this document"),
    (7, "Reports of glass buses passing"),
    (8, "Management reported the meeting notes"),
    (9, "Quick discussion with no relevant terms"),
]


def _sql_stem(col: str) -> str:
    """DuckDB twin of the en light stemmer (oracle side)."""
    from miru_spark.analysis.stem import sql_stem_expr

    return sql_stem_expr(col, "en")


# Deterministic synthetic Portuguese corpus for the round-5 stemming
# breadth entry (same VALUES-literal contract as _STEM_DOCS). Pure
# lowercase-able words + single spaces — the oracle then tokenizes with
# a whitespace split, which equals the unicode word-break stream on
# punctuation-free text (accented letters survive both).
_STEM_PT_DOCS: list[tuple[int, str]] = [
    (0, "as nações discutem correndo os relatórios"),
    (1, "uma nação aprovou o relatório"),
    (2, "o cão corre no parque da nação"),
    (3, "ela está correndo na praia"),
    (4, "os livros falam de nações"),
    (5, "cães estão a correr juntos"),
    (6, "nada de relevante neste documento"),
    (7, "relatórios importantes da nação unida"),
    (8, "o atleta corre e a nação observa"),
    (9, "discussão rápida sem termos"),
]


def _sql_stem_pt(col: str) -> str:
    """DuckDB twin of the pt light stemmer (oracle side)."""
    from miru_spark.analysis.stem import sql_stem_expr

    return sql_stem_expr(col, "pt")


def _stem_reader(spark):
    """en_stem-locale index over the synthetic corpus (once per process)."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader

    with _INDEX_LOCK:
        key = "\x00stem_synth"
        if key not in _INDEX_CACHE:
            d = os.path.join(tempfile.mkdtemp(prefix="miru_entry_stem_"), "idx")
            docs = spark.createDataFrame(_STEM_DOCS, "doc_id long, text string")
            build_index(spark, docs, d, id_col="doc_id", text_col="text",
                        n_shards=1, block_bits=7, locale="en_stem",
                        overwrite=True)
            _INDEX_CACHE[key] = d
        return IndexReader(spark, _INDEX_CACHE[key])


def q_bm25_stemmed(spark, sf_dir):
    """Stemming analyzer tier end-to-end: the reference's per-locale
    analyzers are Lucene STEMMING analyzers (TermAnalyzers.java:52-84
    binds EnglishAnalyzer etc.), so "meetings" matches an indexed
    "meeting"/"meet" there — round 3's last analyzer-behavior gap. The
    en_stem index stems at build AND query time (light suffix rules,
    analysis/stem.py); the oracle replicates the exact rule regexes in
    DuckDB (RE2 and Java regex agree on the anchored lazy-prefix form —
    parity pytest-pinned) over the identical VALUES corpus. (sf_dir
    unused: module-literal corpus, like bm25_cjk.)"""
    from miru_spark.query.bm25 import search

    return search(_stem_reader(spark), "meetings AND reports", k=10, round_to=4)


def _stem_pt_reader(spark):
    """pt_stem-locale index over the synthetic corpus (once per process)."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader

    with _INDEX_LOCK:
        key = "\x00stem_pt_synth"
        if key not in _INDEX_CACHE:
            d = os.path.join(tempfile.mkdtemp(prefix="miru_entry_stempt_"), "idx")
            docs = spark.createDataFrame(_STEM_PT_DOCS, "doc_id long, text string")
            build_index(spark, docs, d, id_col="doc_id", text_col="text",
                        n_shards=1, block_bits=7, locale="pt_stem",
                        overwrite=True)
            _INDEX_CACHE[key] = d
        return IndexReader(spark, _INDEX_CACHE[key])


def q_bm25_stemmed_pt(spark, sf_dir):
    """Round-5 stemming breadth: the reference binds a STEMMING analyzer
    for ~31 locales (TermAnalyzers.java:52-84 — PortugueseAnalyzer among
    them), and round 4 covered only en/de/fr/es; this entry exercises
    one of the 23 locales round 5 added (analysis/stem.py rule tables,
    generation 4). "nações" and "correndo" stem to "naçã"/"corr" at
    query time and match indexed "nação"/"corre"/"correr" — the
    cross-inflection behavior a pt user of the reference gets. Oracle:
    identical VALUES corpus, whitespace tokens, the exact pt rule
    regexes via sql_stem_expr (3-engine parity pytest-pinned), pre-
    stemmed query literals. (sf_dir unused: module-literal corpus.)"""
    from miru_spark.query.bm25 import search

    return search(_stem_pt_reader(spark), "nações AND correndo", k=10, round_to=4)


def _ja_reader(spark):
    """ja-locale index over the synthetic corpus (once per process)."""
    from miru_spark.index.builder import build_index
    from miru_spark.index.reader import IndexReader

    with _INDEX_LOCK:
        key = "\x00ja_synth"
        if key not in _INDEX_CACHE:
            d = os.path.join(tempfile.mkdtemp(prefix="miru_entry_ja_"), "idx")
            docs = spark.createDataFrame(_JA_DOCS, "doc_id long, text string")
            build_index(spark, docs, d, id_col="doc_id", text_col="text",
                        n_shards=1, block_bits=7, locale="ja", overwrite=True)
            _INDEX_CACHE[key] = d
        return IndexReader(spark, _INDEX_CACHE[key])


def q_bm25_cjk(spark, sf_dir):
    """CJK analyzer end-to-end over a ja-locale index: the reference
    serves ja/zh/ko through its StandardAnalyzer fallback
    (TermAnalyzers.java:119-138), whose UAX#29 tokenizer emits Han and
    Hiragana as single-character tokens and keeps Katakana runs whole —
    so the quoted phrase "東京" is adjacency of the 東,京 unigrams and
    タワー is one term. Same BM25 scoring as every fulltext entry; the
    oracle reproduces segmentation, adjacency, and scoring in SQL over
    the identical VALUES corpus. (sf_dir is unused: the corpus is the
    module literal — the driver compares like-for-like.)"""
    from miru_spark.query.bm25 import search

    docs = spark.createDataFrame(_JA_DOCS, "doc_id long, text string")
    return search(_ja_reader(spark), '"東京" AND タワー', k=10, round_to=4,
                  text_df=docs)


def q_bm25_fuzzy(spark, sf_dir):
    """Lucene `term~N` fuzzy query: the misspelling 'qery' expands to
    dictionary terms within Levenshtein distance 1 (JVM levenshtein over
    a length-banded dictionary slice, capped like wildcards); each
    expansion scores with its own idf, exactly like prefix expansion.
    Reference grammar: classic QueryParser FuzzyQuery
    (``LuceneBackedQueryParser.java:47-53``)."""
    from miru_spark.query.bm25 import search

    return search(_reader(spark, sf_dir), "qery~1 AND data", k=10, round_to=4)


def q_bm25_wildcard(spark, sf_dir):
    """Lucene WildcardQuery `te?t` / `s*rk`: the pattern expands against
    the dictionary with one JVM LIKE scan (`?`->_, `*`->%), pruned by
    the literal prefix before the first wildcard; expansions score with
    their own idf, exactly like prefix/fuzzy expansion. Reference
    grammar: classic QueryParser WildcardQuery
    (``LuceneBackedQueryParser.java:47-53``)."""
    from miru_spark.query.bm25 import search

    return search(_reader(spark, sf_dir), "s?ark AND d*ta", k=10, round_to=4)


def q_bm25_regexp(spark, sf_dir):
    """Lucene RegexpQuery `/qu.ry|t.ble/`: the anchored pattern expands
    against the dictionary with one JVM rlike scan (literal-prefix
    pruned where possible); expansions score with their own idf like
    prefix/wildcard/fuzzy expansion. Dialect: Java regex (a documented
    deviation from Lucene's own regexp operators)."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir), "/qu.ry|t.ble/ AND spark", k=10, round_to=4)


def q_bm25_field_group(spark, sf_dir):
    """Lucene field-grouped clause `lang:(de OR fr)`: classic
    QueryParser distributes the field over the group, so the group is
    the OR of the composite keyword masks — semantically the constraint
    `lang IN (de, fr)`; only the text term scores."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir), "spark AND lang:(de OR fr)", k=10, round_to=4)


def q_bm25_range(spark, sf_dir):
    """Lucene `field:[lo TO hi]` range query: a lexicographic slice of
    the field's keyword vocabulary becomes a candidate mask (composite
    posting-term union, no doc-store scan), ANDed like any fielded
    filter; only text terms score. src1..src2 covers src1, src10..src19,
    src2 lexicographically — a deliberately non-trivial slice."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir), "spark AND source:[src1 TO src2]", k=10,
        round_to=4)


def q_bm25_slop(spark, sf_dir):
    """Ordered sloppy phrase `"table hash"~2`: terms in order within a
    len(terms)+slop token window, verified by one JVM subsequence-
    automaton expression over the candidates (same plan as the exact
    phrase, wider window)."""
    from miru_spark.query.bm25 import search

    return search(
        _reader(spark, sf_dir), '"table hash"~2', k=10, round_to=4,
        text_df=_read(spark, sf_dir, "documents"),
    )


def q_bm25_facets(spark, sf_dir):
    """Faceting over a fulltext answer: top lang values + counts across
    the docs matching `spark AND data` (candidate evaluation -> doc
    store semi-join -> one partial-agg groupBy; AggregateCounts answer
    shape over a fulltext bitmap)."""
    from miru_spark.query.bm25 import facet_counts

    return facet_counts(_reader(spark, sf_dir), "spark AND data", "lang", k=10)


def q_fulltext_match_all(spark, sf_dir):
    """`*:* -spark` — MatchAllDocsQuery anchoring a pure negation: every
    doc WITHOUT the term, TIME-ordered (pure-mask fallback, score 0)."""
    from miru_spark.query.bm25 import search

    return search(_reader(spark, sf_dir), "*:* -spark", k=20)


def q_fulltext_time_newest(spark, sf_dir):
    """TIME strategy: newest-k matching docs, score = 0."""
    from miru_spark.query.bm25 import search_time_newest

    return search_time_newest(_reader(spark, sf_dir), "spark AND query", k=20)


def q_fulltext_highlight(spark, sf_dir):
    """Top-5 BM25 hits with <b>-tagged snippet fragments. Token-level
    greedy windowing (query/highlight.py::token_fragments): the rule is
    a pure codegen expression AND exactly SQL-expressible, so the oracle
    reproduces the fragment strings byte-for-byte (the char-level
    highlighter's lookaround windows stay pytest-covered)."""
    from miru_spark.query.bm25 import search
    from miru_spark.query.highlight import token_fragments

    r = _reader(spark, sf_dir)
    hits = search(r, "spark AND query", k=5, round_to=4)
    docs = _read(spark, sf_dir, "documents")
    out = token_fragments(hits, docs, ["spark", "query"])
    return out.select("doc_id", "score", "fragments").orderBy(
        F.col("score").desc(), F.col("doc_id").desc())


def q_index_dictionary(spark, sf_dir):
    """Top-50 dictionary terms by document frequency (df desc, term)."""
    r = _reader(spark, sf_dir)
    return (
        r.dictionary()
        .select("term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf"))
        .orderBy(F.col("df").desc(), "term")
        .limit(50)
    )


def q_index_doc_stats(spark, sf_dir):
    """Global collection stats the BM25 scorer broadcasts (N, Σdoclen, avgdl)."""
    r = _reader(spark, sf_dir)
    return spark.createDataFrame(
        [(int(r.n_docs), int(r.stats["total_tokens"]), float(r.avgdl))],
        "n_docs long, total_tokens long, avgdl double",
    ).withColumn("avgdl", F.round("avgdl", 6))


# ---------------------------------------------------------------------
# relational / stream query families (events, lineitem, orders)
# ---------------------------------------------------------------------

def q_q1_pricing(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_q3_shipping(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + top-k (customer segment fixed
    via status filter). Shows join reordering / broadcast of small dims."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = _read(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(20)
    )


def q_filter_tree(spark, sf_dir):
    """miru filter AST: pButNotQ((click|purchase|sign*), purchase)."""
    from miru_spark.query.filters import FieldFilter, Filter, apply_filter

    flt = Filter(
        op="pButNotQ",
        field_filters=[
            FieldFilter("event_type", values=["click", "purchase"], prefixes=["sign"]),
            FieldFilter("event_type", values=["purchase"]),
        ],
    )
    ev = _read(spark, sf_dir, "events")
    return apply_filter(ev, flt).select("event_id", "user_id", "event_type").orderBy("event_id")


def q_distincts(spark, sf_dir):
    from miru_spark.operators.aggregates import distincts

    return distincts(_read(spark, sf_dir, "events"), "event_type", prefix="s")


def q_distinct_count(spark, sf_dir):
    from miru_spark.operators.aggregates import distinct_count
    from miru_spark.query.filters import FieldFilter, Filter

    flt = Filter(field_filters=[FieldFilter("event_type", values=["click", "view"])])
    return distinct_count(_read(spark, sf_dir, "events"), "user_id", flt=flt)


def q_distinct_count_approx(spark, sf_dir):
    """HLL approx distinct (rows-only: estimator, not SQL-reproducible)."""
    from miru_spark.operators.aggregates import distinct_count

    return distinct_count(_read(spark, sf_dir, "events"), "user_id", approx=True)


def q_uniques(spark, sf_dir):
    from miru_spark.operators.aggregates import uniques

    return uniques(_read(spark, sf_dir, "events"), "user_id", "event_type")


def q_gather(spark, sf_dir):
    from miru_spark.operators.aggregates import gather

    return gather(
        _read(spark, sf_dir, "events"), "event_type", with_counts=True,
        id_col="event_id",
    )


def q_aggregate_counts(spark, sf_dir):
    from miru_spark.operators.aggregates import aggregate_counts

    return aggregate_counts(_read(spark, sf_dir, "events"), "user_id", "ts", "event_id")


def q_latest_by_user(spark, sf_dir):
    from miru_spark.operators.latest import latest_by

    out = latest_by(_read(spark, sf_dir, "events"), "user_id", "ts", "event_id")
    return out.select("event_id", "user_id", "ts", "event_type", "value").orderBy("user_id")


_WF_LO, _WF_HI, _WF_N = "2024-01-01 00:00:00", "2024-01-31 00:00:00", 30


def q_waveform(spark, sf_dir):
    from miru_spark.operators.analytics import waveform

    out = waveform(_read(spark, sf_dir, "events"), "ts", _WF_LO, _WF_HI, _WF_N)
    return out.select("bucket", F.col("n").cast("long").alias("n"))


def q_waveforms_named(spark, sf_dir):
    """Multi-filter analytics: one waveform per named filter in a single
    scan (conditional aggregation), the AnalyticsQuery map shape."""
    from miru_spark.operators.analytics import waveforms
    from miru_spark.query.filters import FieldFilter, Filter

    named = {
        "clicks": Filter("and", [FieldFilter("event_type", values=["click"])]),
        "errors": Filter("and", [FieldFilter("event_type", values=["error"])]),
        "purchases": Filter("and", [FieldFilter("event_type", values=["purchase"])]),
    }
    out = waveforms(_read(spark, sf_dir, "events"), "ts", _WF_LO, _WF_HI, _WF_N, named)
    return out.select("name", "bucket", F.col("n").cast("long").alias("n"))


_STREAM_DIR_CACHE: dict[str, str] = {}


def _stream_dir(sf_dir: str, table: str) -> str:
    """FileStreamSource wants a DIRECTORY; the testdata tables are flat
    files (read-only). Symlink the file into a temp dir once per
    process — on a cluster the source would already be a directory of
    parts and this shim disappears."""
    key = f"{sf_dir}:{table}"
    if key not in _STREAM_DIR_CACHE:
        d = tempfile.mkdtemp(prefix=f"miru_stream_{table}_")
        os.symlink(
            os.path.join(sf_dir, f"{table}.parquet"),
            os.path.join(d, f"{table}.parquet"),
        )
        _STREAM_DIR_CACHE[key] = d
    return _STREAM_DIR_CACHE[key]


def q_repetition_signals(spark, sf_dir):
    """Gopher-family per-doc repetition filters: duplicate 2/3-gram
    fractions + top-2-gram token fraction, one Arrow-batched kernel
    pass (measured 6.6x over the Catalyst lambda chain — higher-order
    array functions are interpreted, not codegen), no shuffle — the
    repetition half of the Gopher quality rules (the
    length/punct/stopword half is the `quality` entry)."""
    from miru_spark.pipeline.text import repetition_signals

    out = repetition_signals(_read(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(
        F.col("id").alias("doc_id"), "n_tokens",
        "dup_3gram_frac", "dup_2gram_frac", "top_2gram_frac")


def q_boilerplate_ngrams(spark, sf_dir):
    """Corpus-frequent 5-grams (boilerplate/template chrome detector):
    distinct grams per doc -> one partial-aggregated groupBy — the same
    single-shuffle shape as the dictionary build."""
    from miru_spark.pipeline.text import boilerplate_ngrams

    return boilerplate_ngrams(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        n=5, min_doc_frac=0.002, limit=50)


def q_temperature_sample(spark, sf_dir):
    """Temperature source re-mixing (alpha=0.5 flattening over lang,
    half-budget): per-source keep rates from count^alpha shares, doc
    verdicts by the deterministic md5 threshold — the multilingual
    mixing rule, downsampling-only."""
    from miru_spark.pipeline.sampling import temperature_sample

    out = temperature_sample(
        _read(spark, sf_dir, "documents"), "doc_id", "lang",
        alpha=0.5, total_rate=0.5, seed=3)
    return out.select("doc_id", "lang", "source")


def q_corpus_split(spark, sf_dir):
    """Deterministic train/val/test wall (98/1/1 by md5 bucket of the
    key): membership is a pure function of doc_id, so reprocessing runs
    and same-keyed sibling relations (features, embeddings) stay on the
    same side of the wall — no leakage through re-randomization. One
    narrow projection, no shuffle; aggregated per split for a robust
    value oracle."""
    from miru_spark.pipeline.sampling import split_corpus

    out = split_corpus(
        _read(spark, sf_dir, "documents"), "doc_id",
        {"train": 0.98, "val": 0.01, "test": 0.01}, seed=11)
    return (
        out.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
        .orderBy("split")
    )


def q_epoch_shuffle(spark, sf_dir):
    """Head of the epoch-3 training order: per-epoch deterministic md5
    shuffle key; the orderBy+limit plans as TakeOrderedAndProject (no
    global single-partition sort), and a full-corpus writer would use
    the same range-partitioned sort shape."""
    from miru_spark.pipeline.sampling import epoch_shuffle

    out = epoch_shuffle(_read(spark, sf_dir, "documents"), "doc_id",
                        epoch=3, seed=5)
    return out.select("doc_id", "shuffle_key").limit(50)


def q_lm_score(spark, sf_dir):
    """CCNet-family LM quality filter, unigram member: per-doc
    cross-entropy under the corpus's own unigram LM (broadcast model
    join + one groupBy; spammy outliers score high)."""
    from miru_spark.pipeline.text import lm_score

    out = lm_score(_read(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(F.col("id").alias("doc_id"), "n_tokens", "cross_entropy")


def q_pack_sequences(spark, sf_dir):
    """Sequence packing for pretraining: docs hash into 16 independent
    buckets (md5, engine-stable) and pack greedily in doc_id order
    against a 512-token budget — each doc gets (bucket, seq,
    tok_offset). Distributed formulation: buckets pack in parallel;
    exact greedy only ever runs bucket-locally. Oracle: the same greedy
    fold as a DuckDB recursive CTE."""
    from miru_spark.analysis.tokenizer import tokens_col
    from miru_spark.pipeline.pack import pack_sequences

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens_col(F.col("text"), use_stopwords=False)).alias("n_tokens"),
    )
    out = pack_sequences(docs, "doc_id", "n_tokens", budget=512, n_buckets=16)
    return out.select(
        F.col("id").alias("doc_id"), "n_tokens", "bucket", "seq", "tok_offset")


def q_streaming_window_counts(spark, sf_dir):
    """A REAL Structured Streaming run, bounded: the events table read as
    a file stream (availableNow trigger), tumbling 1-day windows per
    event_type through the same `windowed_event_counts` operator the
    live ingest path uses (watermark + windowed agg — the streaming twin
    of the batch waveform, Analytics.java:142-199), into a complete-mode
    memory sink. Spark's unified batch/stream semantics make the batch
    GROUP BY the exact oracle."""
    import uuid

    from miru_spark.streaming.ingest import windowed_event_counts

    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(_stream_dir(sf_dir, "events"))
    agg = windowed_event_counts(stream, "ts", window="1 day", group_by="event_type")
    name = "stream_wc_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window_start").alias("bucket_ts"),
        "event_type",
        F.col("n").cast("long").alias("n"),
    )


def q_streaming_unread(spark, sf_dir):
    """The custom stateful streaming operator, bounded and
    oracle-checked: per-user unread counters folded by
    `applyInPandasWithState` (view = +1 activity, click = read -1
    floored at 0, error = mark-all-read reset — the reference's
    realtime read-tracking, AmzaInboxReadTracker.java:60-98) over the
    events table as an availableNow file stream. The SQL twin uses the
    clamped-running-sum identity n_t = S_t - least(0, min_prefix(S)),
    segmented at resets — an exact closed form for the max(0, n+d)
    fold, so even this non-relational operator gets a value-hash
    oracle."""
    import uuid

    from miru_spark.streaming.ingest import streaming_unread_counts

    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema).parquet(_stream_dir(sf_dir, "events"))
        .filter(F.col("event_type").isin("view", "click", "error"))
        .select(
            "user_id",
            F.when(F.col("event_type") == "view", "activity")
            .when(F.col("event_type") == "click", "read")
            .otherwise("mark_all_read")
            .alias("kind"),
            "ts",
            "event_id",
        )
    )
    # event_id tie-break totalizes the fold order (matches the oracle's
    # ORDER BY ts, event_id even if timestamps ever collide)
    out = streaming_unread_counts(stream, user_col="user_id", tiebreak_col="event_id")
    name = "stream_unread_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one source file -> one micro-batch -> one update row per user
    return spark.table(name).select("user", F.col("n_unread").cast("long").alias("n_unread"))


def q_metrics_daily(spark, sf_dir):
    from miru_spark.operators.analytics import metrics

    out = metrics(_read(spark, sf_dir, "events"), "ts", "value", bucket="day")
    return out.select(
        "bucket_ts",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("avg_value", 6).alias("avg_value"),
        "n",
    )


def q_anomaly_daily(spark, sf_dir):
    from miru_spark.operators.analytics import anomaly

    out = anomaly(_read(spark, sf_dir, "events"), "ts", "value", bucket="day", sigma=1.5)
    return out.select(
        "bucket_ts",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("zscore", 6).alias("zscore"),
        "is_anomaly",
    )


def q_stumptown_tail(spark, sf_dir):
    from miru_spark.operators.analytics import stumptown_tail

    out = stumptown_tail(_read(spark, sf_dir, "events"), "ts", "event_id", 15)
    return out.select("event_id", "ts", "user_id", "event_type", "value")


def q_trending(spark, sf_dir):
    from miru_spark.operators.trending import trending

    return trending(
        _read(spark, sf_dir, "events"), "event_type", "ts", "2024-01-24 00:00:00", k=5
    ).withColumn("ratio", F.round("ratio", 6))


def q_gather_features(spark, sf_dir):
    """Top-3 event types per user by count (gatherFeatures recipe)."""
    from miru_spark.operators.aggregates import gather_features

    return gather_features(
        _read(spark, sf_dir, "events"), "user_id", ["event_type"], k=3
    ).withColumn("rank", F.col("rank").cast("long"))


_STRUT_MODEL = {"event_type": {"purchase": 3.0, "signup": 2.0, "click": 0.5}}


def q_strut_score(spark, sf_dir):
    """Broadcast-model scoring of events, top-25 (Strut recipe)."""
    from miru_spark.operators.aggregates import strut_score

    return strut_score(
        _read(spark, sf_dir, "events"), "event_id", _STRUT_MODEL, strategy="sum", k=25
    )


def q_strut_unit_weighted(spark, sf_dir):
    """UNIT_WEIGHTED Strut strategy (Strut.java:367-377): mean of positive
    legs over the number of model features."""
    from miru_spark.operators.aggregates import strut_score

    model = dict(_STRUT_MODEL)
    model["user_id"] = {"1": 1.0, "2": 0.5}
    out = strut_score(
        _read(spark, sf_dir, "events").withColumn(
            "user_id", F.col("user_id").cast("string")
        ),
        "event_id", model, strategy="unit_weighted", k=25,
    )
    return out.withColumn("score", F.round("score", 6))


def q_catwalk_model(spark, sf_dir):
    """Catwalk model build: per feature value, positives/total + weight
    (the FeatureScore numerator/denominator rows the Strut scorer
    consumes)."""
    from miru_spark.operators.aggregates import catwalk_fit

    return catwalk_fit(
        _read(spark, sf_dir, "events"),
        ["event_type", "user_id"],
        F.col("value") > 10,
    ).withColumn("weight", F.round("weight", 6))


def q_catwalk_incremental(spark, sf_dir):
    """Incrementally maintained Catwalk model (the reference's
    lastId-versioned Strut model cache, StrutModelScorer.java:208-238):
    fit the first half of events, then refresh with the full table — the
    refresh aggregates ONLY rows past the watermark and merges additive
    (numerator, denominator) partials. Oracle = one-shot full fit."""
    from miru_spark.operators.aggregates import catwalk_fit_incremental

    events = _read(spark, sf_dir, "events")
    cache = os.path.join(tempfile.mkdtemp(prefix="miru_catwalk_"), "cache")
    mid = events.agg(F.expr("percentile_approx(event_id, 0.5)").alias("m")).collect()[0]["m"]
    catwalk_fit_incremental(
        events.filter(F.col("event_id") <= mid), ["event_type", "user_id"],
        F.col("value") > 10, cache, id_col="event_id",
    )
    out = catwalk_fit_incremental(
        events, ["event_type", "user_id"], F.col("value") > 10, cache,
        id_col="event_id",
    )
    return out.withColumn("weight", F.round("weight", 6))


def q_trending_strategies(spark, sf_dir):
    """Reference trending strategies (slope / total / max) over per-term
    waveforms, top-5 per strategy. PEAKS (peakdet-based) is covered by
    unit tests against the Python oracle — not SQL-expressible."""
    from miru_spark.operators.trending import trending_strategies

    out = trending_strategies(
        _read(spark, sf_dir, "events"), "event_type", "ts", _WF_LO, _WF_HI, _WF_N,
        k=5, strategies=("LINEAR_REGRESSION", "LEADER", "HIGHEST_PEAK"),
    )
    return out.select(
        "strategy", "term", F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_inbox_unread(spark, sf_dir):
    """Per-user unread counts after folding READ/UNREAD/MARK_ALL_READ
    marks (derived deterministically from the event stream: click =
    read-mark of the user's previous event, signup = unread-mark of it,
    error = mark-all-read watermark)."""
    from pyspark.sql import Window

    from miru_spark.operators.inbox import unread_counts

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    prev = ev.withColumn("prev_id", F.lag("event_id").over(w))

    def _targeted(ev_type: str, mark: str) -> DataFrame:
        return prev.filter(
            (F.col("event_type") == ev_type) & F.col("prev_id").isNotNull()
        ).select(
            F.col("user_id").alias("user"),
            F.lit(mark).alias("mark"),
            F.col("prev_id").alias("target_id"),
            F.lit(None).cast("timestamp").alias("up_to_ts"),
            F.col("ts").alias("mark_ts"),
        )

    all_read = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("user"),
        F.lit("mark_all_read").alias("mark"),
        F.lit(None).cast("long").alias("target_id"),
        F.col("ts").alias("up_to_ts"),
        F.col("ts").alias("mark_ts"),
    )
    marks = _targeted("click", "read").union(_targeted("signup", "unread")).union(all_read)
    return unread_counts(ev, marks)


_RECO_SEED = 19


def q_reco_cf(spark, sf_dir):
    from miru_spark.operators.reco import collaborative_filter

    src = (
        _read(spark, sf_dir, "orders")
        .join(_read(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item"))
    )
    return collaborative_filter(src, "user", "item", _RECO_SEED, n_contributors=50, k=10)


# ---------------------------------------------------------------------
# training-pipeline family (documents, embeddings)
# ---------------------------------------------------------------------

def q_token_stats(spark, sf_dir):
    from miru_spark.pipeline.text import token_stats

    out = token_stats(_read(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        "avg_token_len",
        "stopword_ratio",
        "bpe_tokens",
    )


def q_quality(spark, sf_dir):
    from miru_spark.pipeline.text import quality_score

    out = quality_score(_read(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select("id", F.col("n_tokens").cast("long").alias("n_tokens"),
                      "alpha_ratio", "stopword_ratio", "quality")


def q_lang_id(spark, sf_dir):
    from miru_spark.pipeline.text import lang_id

    return lang_id(_read(spark, sf_dir, "documents"), "doc_id", "text")


def q_fingerprint(spark, sf_dir):
    from miru_spark.pipeline.text import fingerprint

    return fingerprint(_read(spark, sf_dir, "documents"), "doc_id", "text")


def q_dedup_exact(spark, sf_dir):
    from miru_spark.pipeline.dedup import exact_dedup

    out = exact_dedup(_read(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select("doc_id").orderBy("doc_id")


def q_substring_dedup(spark, sf_dir):
    """ExactSubstr dedup (Lee et al. 2021): maximal token spans whose
    sequence occurs >= 2x anywhere in the corpus. Distributed shape: one
    occurrence-scale gram-hash relation (128-bit double xxhash64 keys),
    one co-partitioned count>=2 self-join, per-doc gaps-and-islands span
    merge — no suffix array, no global sort. The oracle reproduces the
    gram/count/island pipeline over the literal gram STRINGS (DuckDB has
    no xxhash64; equality of the underlying strings is the semantics the
    hashes stand in for)."""
    from miru_spark.pipeline.dedup import duplicate_spans

    out = duplicate_spans(
        _read(spark, sf_dir, "documents"), "doc_id", "text", min_len=8)
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("n_grams"),
    )


def q_substring_strip(spark, sf_dir):
    """Token-space removal companion of `substring_dedup`: corpus with
    every duplicated span's tokens dropped; value-oracled via the same
    islands CTE + per-token span-coverage filter in SQL."""
    from miru_spark.pipeline.dedup import strip_duplicate_spans

    return strip_duplicate_spans(
        _read(spark, sf_dir, "documents"), "doc_id", "text", min_len=8
    ).select(
        F.col("id").alias("doc_id"), "text_clean",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("removed_tokens").cast("long").alias("removed_tokens"),
    )


def q_ngram_jaccard(spark, sf_dir):
    """Exact Jaccard pairs, AllPairs/PPJoin prefix-filtered: candidates
    join only on each doc's rarest ``sz - ceil(t*sz) + 1`` shingles
    (provably no recall loss), then verify exactly via sorted-set
    intersection — candidate cost is Σ df² over PREFIX occurrences, not
    all shingles. Hot-shingle pruning (df > 100 dropped on BOTH sides)
    additionally bounds skew, mirrored in the oracle."""
    from miru_spark.pipeline.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.8,
        max_shingle_df=100,
    )


def q_sample_hash(spark, sf_dir):
    """Deterministic md5-bucket subsample (25% of documents by doc_id):
    same key -> same verdict on any engine, so the DuckDB twin
    reproduces the exact row set."""
    from miru_spark.pipeline.sampling import sample_by_hash

    return (
        sample_by_hash(_read(spark, sf_dir, "documents"), "doc_id", 0.25, seed=7)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def q_domain_cap(spark, sf_dir):
    """Per-source document cap (crawl per-domain downsampling): keep the
    10 lowest-doc_id docs per source."""
    from miru_spark.pipeline.sampling import cap_per_key

    return (
        cap_per_key(_read(spark, sf_dir, "documents"), "source", 10, order_col="doc_id")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def q_corpus_clean(spark, sf_dir):
    """Composed training-data prep: quality gate (>= 0.75) -> language
    gate (en) -> near-dup canonicalization (keep min-id per Jaccard>=0.8
    component). One row per surviving doc. The oracle composes the
    quality, lang_id, and recursive-CTE component oracles."""
    from miru_spark.pipeline.text import clean_corpus

    return clean_corpus(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        min_quality=0.75, langs=("en",), dedup_threshold=0.8, max_shingle_df=100,
    )


def q_url_canonical(spark, sf_dir):
    """URL canonicalization (pipeline/web.py::canonical_url): the corpus
    has no url column, so a noisy URL is synthesized deterministically
    per doc on the Spark side ONLY — upper-cased scheme/host, scheme-
    default :443 port, trailing slash, unsorted params, utm_/gclid
    tracking params, fragment — and the op must strip ALL of it; the
    oracle states the clean canonical form directly from the same doc
    fields, so any rule the op misses hash-mismatches."""
    from miru_spark.pipeline.web import canonical_url

    docs = _read(spark, sf_dir, "documents")
    noisy = docs.select(
        "doc_id", "lang", "source",
        F.concat(
            F.lit("HTTPS://WWW."), F.col("source"), F.lit(".Example.COM"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/p/"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
            F.lit("?utm_source=feed&b="), F.col("lang"), F.lit("&a=1"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("&gclid=x")).otherwise(F.lit("")),
            F.lit("#frag"),
        ).alias("url"),
    )
    return canonical_url(noisy, "url").select("doc_id", "url_canon", "host")


def q_paragraph_dedup(spark, sf_dir):
    """Corpus-wide duplicated-paragraph removal, keep-first (CCNet's
    dedup unit; pipeline/web.py::paragraph_dedup). The synthetic corpus
    has no newlines, so the entry splits on the corpus's most common
    token (' the ') to induce multi-paragraph structure — the oracle
    splits identically and replays the keep-first rule with a window."""
    from miru_spark.pipeline.web import paragraph_dedup

    docs = _read(spark, sf_dir, "documents")
    return paragraph_dedup(docs, "doc_id", "text", sep_re=" the ")


def q_pii_scrub(spark, sf_dir):
    """PII redaction (emails / phones / IPv4 -> typed placeholders). The
    synthetic corpus carries no natural PII, so deterministic PII derived
    from doc_id is appended to every text on BOTH sides — the oracle
    re-runs the identical (RE2-compatible) regex chain in DuckDB and
    hash-compares the scrubbed text md5 plus per-class counts."""
    from miru_spark.pipeline.text import pii_scrub

    docs = _read(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" at 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
        ).alias("text"),
    )
    out = pii_scrub(aug, "doc_id", "text")
    return (
        out.select(
            F.col("id").alias("doc_id"), F.md5("text").alias("text_md5"),
            "n_email", "n_phone", "n_ipv4",
        ).orderBy("doc_id")
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: drop corpus docs sharing any analyzed
    5-gram with the benchmark set (docs with doc_id % 97 == 0 stand in
    for an eval set). Benchmark grams broadcast; the corpus side is a
    map-only scan + broadcast semi probe — no corpus shuffle."""
    from miru_spark.pipeline.text import decontaminate

    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return (
        decontaminate(docs, "doc_id", "text", bench, n=5)
        .select("doc_id").orderBy("doc_id")
    )


def q_dedup_components(spark, sf_dir):
    """Near-dup clustering: exact Jaccard pairs -> connected components
    (alternating large-star/small-star, Kiveris et al. SoCC'14 — two
    bounded shuffles per round, O(log^2 n) rounds on chains), singleton
    docs labeled by their own id. The oracle computes the same
    components via a recursive transitive-closure CTE."""
    from miru_spark.pipeline.dedup import dedup_components

    return dedup_components(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold=0.8, max_shingle_df=100,
    )


def q_dedup_canonical(spark, sf_dir):
    """Keep-one-per-cluster reduction over the near-dup components:
    (component, keep_doc=min id, n_docs) for clusters of size >= 2."""
    from miru_spark.pipeline.dedup import dedup_canonical

    return dedup_canonical(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold=0.8, max_shingle_df=100,
    )


def q_minhash_lsh(spark, sf_dir):
    """Approximate (seeded MinHash) — rows-only check by design."""
    from miru_spark.pipeline.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text", n=3, num_perm=64, bands=16,
        verify_threshold=0.5,
    )


def q_simhash(spark, sf_dir):
    """Approximate (SimHash banding) — rows-only check by design."""
    from miru_spark.pipeline.dedup import simhash_pairs

    return simhash_pairs(_read(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=6)


def q_winnow(spark, sf_dir):
    """xxhash64 winnowing fingerprints — rows-only (no xxhash64 in DuckDB)."""
    from miru_spark.pipeline.text import winnow_fingerprints

    return winnow_fingerprints(_read(spark, sf_dir, "documents"), "doc_id", "text")


def q_ann_cosine_topk(spark, sf_dir):
    from miru_spark.pipeline.ann import cosine_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, queries, k=10, query_id_col="query_id")
    return out.select("query_id", "vec_id", "cos", F.col("rank").cast("long").alias("rank"))


def q_ann_lsh_topk(spark, sf_dir):
    """Approximate (SRP-LSH buckets, recall<1) — rows-only check by design."""
    from miru_spark.pipeline.ann import lsh_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(emb, queries, k=10, query_id_col="query_id", dim=64, n_bits=10, n_tables=6)
    return out.select("query_id", "vec_id", "cos", F.col("rank").cast("long").alias("rank"))


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-flat ANN (rows-only by design: the spherical-k-means coarse
    quantizer is iterative, not SQL-expressible; recall vs the exact
    scan + full-probe == exact equivalence are pytest-asserted)."""
    from miru_spark.pipeline.ann import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, q, k=10, query_id_col="vec_id", dim=dim,
                    n_centroids=32, nprobe=8, iters=4)


def q_cosine_pairs(spark, sf_dir):
    """Exact embedding near-dup pairs (cos >= 0.45) — distributed
    block-pair GEMM (no driver collect / corpus broadcast in the plan)."""
    from miru_spark.pipeline.ann import cosine_pairs_blocked

    emb = _read(spark, sf_dir, "embeddings")
    return cosine_pairs_blocked(emb, threshold=0.45, n_blocks=8, round_to=4)


def q_cosine_pairs_lsh(spark, sf_dir):
    """LSH-blocked near-dup pairs — the 100 TB-scale path (candidates
    from SRP bucket collisions, exact cosine verify); approximate
    (recall < 1), rows-only by design. Threshold matches the synthetic
    corpus's cosine range (max pair cos ~0.51)."""
    from miru_spark.pipeline.ann import cosine_pairs

    emb = _read(spark, sf_dir, "embeddings")
    return cosine_pairs(emb, dim=64, threshold=0.45, n_bits=6, n_tables=12)


def q_rollup_pricing(spark, sf_dir):
    """ROLLUP aggregation (free in Spark; absent in the reference)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_multimodal_features(spark, sf_dir):
    """Decode-stub feature extraction (deterministic fake decoder) over a
    binary media column — rows-only (Python byte-histogram kernel)."""
    from miru_spark.pipeline.multimodal import decode_features

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    out = decode_features(docs, "doc_id", "payload", decoder="fake")
    # driver canonicalizer can't hash array columns — explode to scalar rows
    return out.select(
        "id", F.posexplode(F.transform("features", lambda x: F.round(x, 6)))
    ).toDF("id", "feature_no", "feature")


def q_multimodal_frames(spark, sf_dir):
    """Deterministic frame sampling over a binary 'video' column —
    rows-only (one row per sampled fixed-size frame)."""
    from miru_spark.pipeline.multimodal import frame_sample

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    out = frame_sample(docs, "doc_id", "payload", frame_bytes=64, every=2)
    return out.select(
        "id",
        F.col("frame_no").cast("long").alias("frame_no"),
        F.length("frame").cast("long").alias("frame_len"),
    )


def q_multimodal_meta(spark, sf_dir):
    """Binary-column plumbing: typed metadata (length, content hash,
    magic-byte sniff) over an opaque payload column. Oracle-checkable:
    DuckDB's sha256(varchar) hashes the same UTF-8 bytes the entry's
    encode(text,'utf-8') payload carries."""
    from miru_spark.pipeline.multimodal import binary_meta

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return binary_meta(docs, "doc_id", "payload").select(
        "id", "n_bytes", "sha256", "sniffed_type"
    )


# ---------------------------------------------------------------------
# driver surface
# ---------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 AND top-10."""
    return q_bm25_and(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict ORDER is deliberate: the driver correctness-checks a 50-entry
    # window per round. Round-5 policy (VERDICT r4 next#4): the window =
    # {entries NEW or CHANGED this round} ∪ {oracled entries whose last
    # driver-green row is OLDEST} — so every oracled entry gets a
    # driver row at most ~2 rounds old. Rows-only (no-oracle) entries
    # always sit PAST slot 50 (they can never go hash-green; in-window
    # they waste a slot — VERDICT r3 wrong#1). The literal below keeps
    # its historical grouping; _WINDOW_R5 reorders it.
    base = {
        # --- oracled, never driver-green (fell past the r1-r3 windows;
        # all pass locally via tools/check_entry.py) ---
        "fulltext_highlight": q_fulltext_highlight,
        "multimodal_features": q_multimodal_features,
        "multimodal_frames": q_multimodal_frames,
        # --- new in round 5 ---
        "bm25_stemmed_pt": q_bm25_stemmed_pt,
        # --- new in round 4 ---
        "bm25_stemmed": q_bm25_stemmed,
        "bm25_wand_or_fielded": q_bm25_wand_or_fielded,
        "bm25_wand_not_phrase": q_bm25_wand_not_phrase,
        # --- driver-green in r3; keep a representative spread in-window ---
        "bm25_wand_nested": q_bm25_wand_nested,
        "reco_cf": q_reco_cf,
        "sample_hash": q_sample_hash,
        "pack_sequences": q_pack_sequences,
        "repetition_signals": q_repetition_signals,
        "lm_score": q_lm_score,
        "temperature_sample": q_temperature_sample,
        "boilerplate_ngrams": q_boilerplate_ngrams,
        "domain_cap": q_domain_cap,
        "corpus_clean": q_corpus_clean,
        "dedup_components": q_dedup_components,
        "dedup_canonical": q_dedup_canonical,
        "multimodal_meta": q_multimodal_meta,
        "catwalk_incremental": q_catwalk_incremental,
        "pii_scrub": q_pii_scrub,
        "decontaminate": q_decontaminate,
        "url_canonical": q_url_canonical,
        "paragraph_dedup": q_paragraph_dedup,
        "bm25_cjk": q_bm25_cjk,
        "substring_dedup": q_substring_dedup,
        "substring_strip": q_substring_strip,
        "bm25_wand_phrase": q_bm25_wand_phrase,
        "bm25_wand_fielded": q_bm25_wand_fielded,
        "bm25_wand_not": q_bm25_wand_not,
        "corpus_split": q_corpus_split,
        "epoch_shuffle": q_epoch_shuffle,
        "bm25_phrase_positional": q_bm25_phrase_positional,
        "bm25_wand_phrase_positional": q_bm25_wand_phrase_positional,
        "bm25_batch": q_bm25_batch,
        # fulltext / index
        "bm25_and": q_bm25_and,
        "bm25_or": q_bm25_or,
        "bm25_index_search": q_bm25_index_search,
        "bm25_index_wand": q_bm25_index_wand,
        "bm25_index_wand_or": q_bm25_index_wand_or,
        "bm25_page2": q_bm25_page2,
        "bm25_boost": q_bm25_boost,
        "bm25_query_stopwords": q_bm25_query_stopwords,
        "bm25_prefix": q_bm25_prefix,
        "bm25_lang_constraint": q_bm25_lang_constraint,
        "bm25_authz": q_bm25_authz,
        "bm25_fielded": q_bm25_fielded,
        "bm25_gather_fields": q_bm25_gather_fields,
        "bm25_phrase": q_bm25_phrase,
        "bm25_phrase_de": q_bm25_phrase_de,
        "bm25_fuzzy": q_bm25_fuzzy,
        "bm25_wildcard": q_bm25_wildcard,
        "bm25_regexp": q_bm25_regexp,
        "bm25_field_group": q_bm25_field_group,
        "bm25_range": q_bm25_range,
        "bm25_slop": q_bm25_slop,
        "fulltext_time_newest": q_fulltext_time_newest,
        "fulltext_match_all": q_fulltext_match_all,
        "bm25_facets": q_bm25_facets,
        "index_dictionary": q_index_dictionary,
        "index_doc_stats": q_index_doc_stats,
        # relational / stream query families
        "q1_pricing": q_q1_pricing,
        "q3_shipping": q_q3_shipping,
        "filter_tree": q_filter_tree,
        "distincts": q_distincts,
        "distinct_count": q_distinct_count,
        "uniques": q_uniques,
        "gather": q_gather,
        "aggregate_counts": q_aggregate_counts,
        "gather_features": q_gather_features,
        "strut_score": q_strut_score,
        "strut_unit_weighted": q_strut_unit_weighted,
        "catwalk_model": q_catwalk_model,
        "inbox_unread": q_inbox_unread,
        "trending_strategies": q_trending_strategies,
        "latest_by_user": q_latest_by_user,
        "waveform": q_waveform,
        "waveforms_named": q_waveforms_named,
        "streaming_window_counts": q_streaming_window_counts,
        "streaming_unread": q_streaming_unread,
        "metrics_daily": q_metrics_daily,
        "anomaly_daily": q_anomaly_daily,
        "stumptown_tail": q_stumptown_tail,
        "trending": q_trending,
        # training-pipeline ops
        "token_stats": q_token_stats,
        "quality": q_quality,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_cosine_topk": q_ann_cosine_topk,
        "cosine_pairs": q_cosine_pairs,
        "rollup_pricing": q_rollup_pricing,
        # --- rows-only (no oracle by design: seeded randomness /
        # approximate structures / xxhash64 not in DuckDB). ALWAYS last —
        # these can never go hash-green, so they must never occupy one of
        # the driver's 50 oracle-check slots. ---
        "ann_ivf_topk": q_ann_ivf_topk,
        "cosine_pairs_lsh": q_cosine_pairs_lsh,
        "bm25_slop_positional": q_bm25_slop_positional,
        "distinct_count_approx": q_distinct_count_approx,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "winnow": q_winnow,
        "ann_lsh_topk": q_ann_lsh_topk,
    }
    # Round-5 window (slots 1-50): new/changed entries, then the 43
    # oracled entries whose last driver-green row was r3 or older
    # (CORRECTNESS_r01..r04 audit), then 5 re-verify picks covering the
    # subsystems round 5 touched (analyzer generation bump, dedup
    # fan-out, connected components). Everything else keeps its base
    # order; rows-only entries remain last by construction.
    window = [
        # new / changed in round 5
        "bm25_stemmed_pt", "bm25_batch",
        # stale oracled (last driver row <= r3)
        "q1_pricing", "q3_shipping", "rollup_pricing", "filter_tree",
        "distincts", "distinct_count", "uniques", "gather",
        "aggregate_counts", "gather_features", "strut_score",
        "strut_unit_weighted", "catwalk_model", "inbox_unread",
        "trending_strategies", "latest_by_user", "waveform",
        "waveforms_named", "streaming_window_counts", "streaming_unread",
        "metrics_daily", "anomaly_daily", "stumptown_tail", "trending",
        "token_stats", "quality", "lang_id", "fingerprint", "dedup_exact",
        "ngram_jaccard", "ann_cosine_topk", "cosine_pairs", "bm25_facets",
        "bm25_field_group", "bm25_fuzzy", "bm25_range", "bm25_regexp",
        "bm25_slop", "bm25_wildcard", "fulltext_match_all",
        "fulltext_time_newest", "index_dictionary", "index_doc_stats",
        # re-verify picks for round-5-touched subsystems
        "bm25_stemmed", "bm25_cjk", "dedup_components", "dedup_canonical",
        "substring_dedup",
    ]
    assert len(window) == 50 and all(k in base for k in window)
    return {**{k: base[k] for k in window},
            **{k: v for k, v in base.items() if k not in window}}


def oracle_sql() -> dict[str, str]:
    # built as a literal then aliased: the positional sloppy-phrase entry
    # is rank-identical to bm25_slop by construction and shares its SQL
    toks_base = f"SELECT doc_id, {_TOKS} AS toks FROM documents"
    lang_en_sql = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES ('spark'), ('query')),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) ) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT s.doc_id, round(s.score, 4) AS score
FROM scored s JOIN documents d ON s.doc_id = d.doc_id
WHERE s.nt = 2 AND d.lang = 'en'
ORDER BY score DESC, s.doc_id DESC LIMIT 10
"""
    out = {
        "bm25_and": _bm25_sql(_BM25_TERMS, 10, "and"),
        "bm25_or": _bm25_sql(_OR_TERMS, 10, "or"),
        "bm25_index_search": _bm25_sql(_BM25_TERMS, 10, "and"),
        "bm25_index_wand": _bm25_sql(_BM25_TERMS, 10, "and"),
        "bm25_index_wand_or": _bm25_sql(_OR_TERMS, 10, "or"),
        "bm25_page2": _bm25_sql(_BM25_TERMS, 10, "and", offset=10),
        "bm25_boost": _bm25_sql(
            _BM25_TERMS, 10, "and", boosts={"spark": 2.0, "query": 0.5}),
        # batch = UNION ALL of the per-query oracles, re-ranked per query
        # on the rounded scores (the Spark side rounds before its window
        # too, so tie-breaks agree)
        "bm25_batch": "\nSELECT query_id, row_number() OVER ("
        "PARTITION BY query_id ORDER BY score DESC, doc_id DESC) AS rank, "
        "doc_id, score FROM (\n"
        + "\nUNION ALL\n".join(
            f"SELECT '{qid}' AS query_id, doc_id, score FROM ({sql})"
            for qid, sql in [
                ("and3", _bm25_sql(_BM25_TERMS, 10, "and")),
                ("or2", _bm25_sql(_OR_TERMS, 10, "or")),
                ("boosted", _bm25_sql(
                    _BM25_TERMS, 10, "and",
                    boosts={"spark": 2.0, "query": 0.5})),
                ("boost_or", _bm25_sql(
                    ["data", "scan"], 10, "or", boosts={"data": 1.5})),
                # round 5: non-flat shapes on the shared scan — the
                # phrase and fielded queries reuse their standalone
                # oracles verbatim (per-query rank identity)
                ("ph", _PHRASE_SQL),
                ("fld", lang_en_sql),
                ("notq", _bm25_sql(["spark", "query"], 10, "and",
                                   exclude=["merge"])),
            ]
        )
        + "\n) ORDER BY query_id, rank\n",
        "bm25_wand_not": _bm25_sql(["spark", "query"], 10, "and",
                                   exclude=["merge"]),
        # fielded disjunct with zero-score admission: docs containing the
        # rare scoring term 'dup' score normally; lang='de' docs without
        # it are admitted at score 0, ordered doc_id desc after every
        # scored doc in the (score desc, doc_id desc) total order
        "bm25_wand_or_fielded": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
tf AS (SELECT doc_id, count(*) AS tf FROM tk WHERE term = 'dup' GROUP BY 1),
dft AS (SELECT count(*)::DOUBLE AS df FROM tf),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
           / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) AS score
  FROM tf CROSS JOIN dft JOIN dl USING (doc_id) CROSS JOIN st),
qual AS (
  SELECT doc_id, round(score, 4) AS score FROM scored
  UNION ALL
  SELECT d.doc_id, 0.0 FROM documents d
  WHERE d.lang = 'de' AND d.doc_id NOT IN (SELECT doc_id FROM scored))
SELECT doc_id::BIGINT AS doc_id, score FROM qual
ORDER BY score DESC, doc_id DESC LIMIT 30
""",
        # negated phrase on the WAND path: spark&query docs minus
        # "data scan" adjacency — the exact path's phrase anti-join
        "bm25_wand_not_phrase": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
ph AS (SELECT doc_id FROM base
       WHERE len(list_filter(generate_series(1, len(toks) - 1),
                             i -> toks[i] = 'data' AND toks[i + 1] = 'scan')) > 0),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES ('spark'), ('query')),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) ) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT doc_id::BIGINT AS doc_id, round(score, 4) AS score
FROM scored WHERE nt = 2 AND doc_id NOT IN (SELECT doc_id FROM ph)
ORDER BY score DESC, doc_id DESC LIMIT 10
""",
        "bm25_wand_nested": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
hits AS (
  SELECT doc_id,
         max(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS h_spark,
         max(CASE WHEN term = 'query' THEN 1 ELSE 0 END) AS h_query,
         max(CASE WHEN term = 'scan'  THEN 1 ELSE 0 END) AS h_scan,
         max(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS h_merge
  FROM tk WHERE term IN ('spark', 'query', 'scan', 'merge') GROUP BY doc_id),
cand AS (SELECT doc_id FROM hits
         WHERE ((h_spark = 1 AND h_query = 1) OR h_scan = 1) AND h_merge = 0),
q(term) AS (VALUES ('spark'), ('query'), ('scan')),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) ) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT s.doc_id, round(s.score, 4) AS score FROM scored s JOIN cand USING (doc_id)
ORDER BY score DESC, doc_id DESC LIMIT 10
""",
        "bm25_query_stopwords": _bm25_sql(["scan", "merge"], 10, "and"),
        "bm25_prefix": f"""
WITH base AS ({toks_base}),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q AS (SELECT DISTINCT term FROM tk WHERE term LIKE 'quer%'),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) ) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st GROUP BY tf.doc_id)
SELECT doc_id, round(score, 4) AS score FROM scored ORDER BY score DESC, doc_id DESC LIMIT 10
""",
        "bm25_lang_constraint": lang_en_sql,
        # composite authz = OR of per-label posting lists; labels here are
        # `source` values, so the oracle predicate is source IN (...)
        "bm25_authz": lang_en_sql.replace(
            "d.lang = 'en'",
            "d.source IN ('src3', 'src7', 'src11', 'src15')",
        ),
        # the fielded query `lang:en AND spark AND query` is semantically
        # the constraint-mask query — same oracle
        "bm25_fielded": lang_en_sql,
        # scale-path twin is rank-identical by construction; same oracle
        "bm25_wand_fielded": lang_en_sql,
        "bm25_gather_fields": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES {", ".join(f"('{t}')" for t in _BM25_TERMS)}),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) ) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scored WHERE nt = {len(_BM25_TERMS)}
         ORDER BY score DESC, doc_id DESC LIMIT 10)
SELECT t.doc_id, t.score, d.lang, d.source
FROM topk t JOIN documents d USING (doc_id)
ORDER BY t.score DESC, t.doc_id DESC
""",
        # phrase semantics: doc contains the consecutive token pair AND
        # the other terms; scoring = BM25 over all three terms (phrase
        # terms weigh like ordinary terms)
        "bm25_fuzzy": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
fq AS (SELECT DISTINCT term FROM tk WHERE levenshtein(term, 'qery') <= 1),
q AS (SELECT term FROM fq UNION SELECT 'data'),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
cand AS (SELECT doc_id FROM tf WHERE term IN (SELECT term FROM fq)
         INTERSECT SELECT doc_id FROM tf WHERE term = 'data'),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * 2.2 
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl)) ) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  JOIN cand USING (doc_id)
  GROUP BY tf.doc_id)
SELECT doc_id, round(score, 4) AS score FROM scored
ORDER BY score DESC, doc_id DESC LIMIT 10
""",
        "bm25_wildcard": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
w1 AS (SELECT DISTINCT term FROM tk WHERE term LIKE 's_ark'),
w2 AS (SELECT DISTINCT term FROM tk WHERE term LIKE 'd%ta'),
q AS (SELECT term FROM w1 UNION SELECT term FROM w2),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
cand AS (SELECT doc_id FROM tf WHERE term IN (SELECT term FROM w1)
         INTERSECT SELECT doc_id FROM tf WHERE term IN (SELECT term FROM w2)),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl)) ) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  JOIN cand USING (doc_id)
  GROUP BY tf.doc_id)
SELECT doc_id, round(score, 4) AS score FROM scored
ORDER BY score DESC, doc_id DESC LIMIT 10
""",
        "bm25_regexp": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
rq AS (SELECT DISTINCT term FROM tk WHERE regexp_matches(term, '^(?:qu.ry|t.ble)$')),
q AS (SELECT term FROM rq UNION SELECT 'spark'),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
cand AS (SELECT doc_id FROM tf WHERE term IN (SELECT term FROM rq)
         INTERSECT SELECT doc_id FROM tf WHERE term = 'spark'),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl)) ) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  JOIN cand USING (doc_id)
  GROUP BY tf.doc_id)
SELECT doc_id, round(score, 4) AS score FROM scored
ORDER BY score DESC, doc_id DESC LIMIT 10
""",
        "bm25_field_group": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES ('spark')),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl)) ) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT s.doc_id, round(s.score, 4) AS score
FROM scored s JOIN documents d ON s.doc_id = d.doc_id
WHERE d.lang IN ('de', 'fr')
ORDER BY score DESC, s.doc_id DESC LIMIT 10
""",
        "bm25_range": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES ('spark')),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * 2.2 
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl)) ) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT s.doc_id, round(s.score, 4) AS score
FROM scored s JOIN documents d ON s.doc_id = d.doc_id
WHERE d.source >= 'src1' AND d.source <= 'src2'
ORDER BY score DESC, s.doc_id DESC LIMIT 10
""",
        "bm25_slop": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
ph AS (SELECT doc_id FROM base
       WHERE len(list_filter(generate_series(1, len(toks) - 1),
             i -> toks[i] = 'table' AND len(list_filter(
                  generate_series(i + 1, least(i + 3, len(toks))),
                  j -> toks[j] = 'hash')) > 0)) > 0),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES ('table'), ('hash')),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * 2.2 
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl)) ) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT s.doc_id, round(s.score, 4) AS score FROM scored s JOIN ph USING (doc_id)
WHERE nt = 2 ORDER BY score DESC, doc_id DESC LIMIT 10
""",
        "bm25_phrase": _PHRASE_SQL,
        "bm25_wand_phrase": _PHRASE_SQL,
        "bm25_phrase_positional": _PHRASE_SQL,
        "bm25_wand_phrase_positional": _PHRASE_SQL,
        # CJK entry: identical VALUES corpus as the Spark side (_JA_DOCS);
        # segmentation = space out each Han/Hiragana char (UAX#29 unigram
        # rule), split on whitespace; Katakana runs survive whole. Phrase
        # "東京" = adjacency of the 東,京 unigrams; scoring is the same
        # BM25 CTE as _PHRASE_SQL with nt = 3 terms.
        # stemmed entry: identical VALUES corpus (_STEM_DOCS); tokens =
        # ASCII word-break then the exact light-stemmer rule regexes
        # (miru_spark.analysis.stem.sql_stem_expr — RE2/Java/Python
        # anchored-lazy-prefix parity is pytest-pinned); query terms are
        # pre-stemmed literals (meetings->meet, reports->report)
        "bm25_stemmed": f"""
WITH docs(doc_id, text) AS (VALUES {", ".join(f"({i}, '{t}')" for i, t in _STEM_DOCS)}),
base AS (SELECT doc_id,
    list_transform(
        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''),
        t -> {_sql_stem('t')}) AS toks FROM docs),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES ('meet'), ('report')),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) ) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT doc_id::BIGINT AS doc_id, round(score, 4) AS score
FROM scored WHERE nt = 2 ORDER BY score DESC, doc_id DESC LIMIT 10
""",
        # pt stemming-breadth entry: identical VALUES corpus
        # (_STEM_PT_DOCS, punctuation-free so whitespace split == the
        # unicode word-break); tokens run through the exact pt rule
        # regexes (sql_stem_expr — 3-engine parity pytest-pinned);
        # query terms are pre-stemmed literals (nações->naçã,
        # correndo->corr)
        "bm25_stemmed_pt": f"""
WITH docs(doc_id, text) AS (VALUES {", ".join(f"({i}, '{t}')" for i, t in _STEM_PT_DOCS)}),
base AS (SELECT doc_id,
    list_transform(
        list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''),
        t -> {_sql_stem_pt('t')}) AS toks FROM docs),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES ('naçã'), ('corr')),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) ) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT doc_id::BIGINT AS doc_id, round(score, 4) AS score
FROM scored WHERE nt = 2 ORDER BY score DESC, doc_id DESC LIMIT 10
""",
        "bm25_cjk": f"""
WITH docs(doc_id, text) AS (VALUES {", ".join(f"({i}, '{t}')" for i, t in _JA_DOCS)}),
base AS (SELECT doc_id,
    list_filter(regexp_split_to_array(
        regexp_replace(text, '([㐀-䶿一-鿿豈-﫿぀-ゟ])', ' \\1 ', 'g'),
        '\\s+'), x -> x <> '') AS toks FROM docs),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base),
st AS (SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl FROM dl),
ph AS (SELECT doc_id FROM base
       WHERE len(list_filter(generate_series(1, len(toks) - 1),
                             i -> toks[i] = '東' AND toks[i + 1] = '京')) > 0),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base),
q(term) AS (VALUES ('東'), ('京'), ('タワー')),
tf AS (SELECT tk.doc_id, tk.term, count(*) AS tf FROM tk JOIN q USING (term) GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.doclen / st.avgdl)) ) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY tf.doc_id)
SELECT s.doc_id::BIGINT AS doc_id, round(s.score, 4) AS score
FROM scored s JOIN ph USING (doc_id)
WHERE nt = 3 ORDER BY score DESC, doc_id DESC LIMIT 10
""",
        # same oracle by design: the corpus is ASCII, where the de/unicode
        # analyzer's token stream equals the frozen ASCII stream — the
        # entry exercises the non-en-locale phrase PATH, not new semantics
        "bm25_phrase_de": _PHRASE_SQL,
        "fulltext_time_newest": f"""
WITH base AS ({toks_base}),
tk AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM base),
cand AS (SELECT doc_id FROM tk WHERE term IN ('spark','query') GROUP BY 1 HAVING count(*) = 2)
SELECT doc_id, 0.0::DOUBLE AS score FROM cand ORDER BY doc_id DESC LIMIT 20
""",
        "bm25_facets": f"""
WITH base AS ({toks_base}),
tk AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM base),
cand AS (SELECT doc_id FROM tk WHERE term IN ('spark', 'data')
         GROUP BY 1 HAVING count(*) = 2)
SELECT d.lang AS value, count(*) AS n
FROM documents d JOIN cand USING (doc_id)
WHERE d.lang IS NOT NULL
GROUP BY 1 ORDER BY n DESC, value LIMIT 10
""",
        "fulltext_match_all": f"""
WITH base AS ({toks_base}),
hit AS (SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(toks) AS term FROM base) WHERE term = 'spark')
SELECT b.doc_id, 0.0::DOUBLE AS score FROM base b ANTI JOIN hit h ON b.doc_id = h.doc_id
ORDER BY b.doc_id DESC LIMIT 20
""",
        "fulltext_highlight": f"""
WITH topk AS ({_bm25_sql(["spark", "query"], 5, "and")}),
base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
hp AS (
  SELECT t.doc_id, t.score, b.toks,
         list_filter(range(1, len(b.toks) + 1),
                     i -> list_contains(['query','spark'], b.toks[i])) AS hits
  FROM topk t JOIN base b USING (doc_id)),
sel AS (
  SELECT doc_id, score, toks, hits, hits[1] AS h1,
         list_min(list_filter(hits, p -> p > hits[1] + 5)) AS h2
  FROM hp),
sel2 AS (SELECT *, list_min(list_filter(hits, p -> p > h2 + 5)) AS h3 FROM sel)
SELECT doc_id, score,
  concat_ws(' … ',
    CASE WHEN h1 IS NOT NULL THEN array_to_string(list_transform(
      toks[greatest(1, h1 - 5):least(len(toks), h1 + 5)],
      t -> CASE WHEN list_contains(['query','spark'], t)
                THEN '<b>' || t || '</b>' ELSE t END), ' ') END,
    CASE WHEN h2 IS NOT NULL THEN array_to_string(list_transform(
      toks[greatest(1, h2 - 5):least(len(toks), h2 + 5)],
      t -> CASE WHEN list_contains(['query','spark'], t)
                THEN '<b>' || t || '</b>' ELSE t END), ' ') END,
    CASE WHEN h3 IS NOT NULL THEN array_to_string(list_transform(
      toks[greatest(1, h3 - 5):least(len(toks), h3 + 5)],
      t -> CASE WHEN list_contains(['query','spark'], t)
                THEN '<b>' || t || '</b>' ELSE t END), ' ') END
  ) AS fragments
FROM sel2 ORDER BY score DESC, doc_id DESC
""",
        "index_dictionary": f"""
WITH base AS ({toks_base}),
tk AS (SELECT doc_id, unnest(toks) AS term FROM base
       UNION ALL SELECT doc_id, 'lang:' || lang FROM documents WHERE lang IS NOT NULL
       UNION ALL SELECT doc_id, 'source:' || source FROM documents WHERE source IS NOT NULL)
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM tk GROUP BY term ORDER BY df DESC, term LIMIT 50
""",
        "index_doc_stats": f"""
WITH base AS ({toks_base}),
dl AS (SELECT doc_id, len(toks) AS doclen FROM base)
SELECT count(*)::BIGINT AS n_docs, sum(doclen)::BIGINT AS total_tokens,
       round(sum(doclen)::DOUBLE / count(*), 6) AS avgdl FROM dl
""",
        "q1_pricing": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""",
        "rollup_pricing": """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
""",
        "q3_shipping": """
SELECT o_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM customer
JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'O'
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey LIMIT 20
""",
        "filter_tree": """
SELECT event_id, user_id, event_type FROM events
WHERE (event_type IN ('click','purchase') OR event_type LIKE 'sign%')
  AND NOT (event_type IN ('purchase'))
ORDER BY event_id
""",
        "distincts": "SELECT DISTINCT event_type AS value FROM events WHERE event_type LIKE 's%' ORDER BY 1",
        "distinct_count": "SELECT count(DISTINCT user_id) AS n_distinct FROM events WHERE event_type IN ('click','view')",
        "uniques": """
SELECT event_type, count(DISTINCT user_id) AS n_distinct FROM events GROUP BY event_type ORDER BY event_type
""",
        "gather": """
SELECT event_type AS term, count(*) AS n,
       min(event_id) AS min_id, max(event_id) AS max_id
FROM events GROUP BY 1 ORDER BY 1
""",
        "aggregate_counts": """
WITH r AS (SELECT user_id, ts, event_id,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
SELECT user_id, count(*) AS n_collapsed, max(ts) AS latest_time, min(ts) AS oldest_time,
       max(CASE WHEN rn = 1 THEN event_id END) AS latest_id
FROM r GROUP BY user_id ORDER BY latest_time DESC, user_id
""",
        "gather_features": """
WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
r AS (SELECT user_id, event_type, n,
        row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rank
      FROM c)
SELECT user_id, event_type, n, rank FROM r WHERE rank <= 3 ORDER BY user_id, rank
""",
        "strut_score": """
SELECT event_id,
       (CASE event_type WHEN 'purchase' THEN 3.0 WHEN 'signup' THEN 2.0
             WHEN 'click' THEN 0.5 ELSE 0.0 END)::DOUBLE AS score
FROM events ORDER BY score DESC, event_id LIMIT 25
""",
        "strut_unit_weighted": """
SELECT event_id,
       round(((CASE event_type WHEN 'purchase' THEN 3.0 WHEN 'signup' THEN 2.0
                    WHEN 'click' THEN 0.5 ELSE 0.0 END)
            + (CASE user_id::VARCHAR WHEN '1' THEN 1.0 WHEN '2' THEN 0.5
                    ELSE 0.0 END)) / 2.0, 6)::DOUBLE AS score
FROM events ORDER BY score DESC, event_id LIMIT 25
""",
        "catwalk_model": """
WITH melted AS (
  SELECT 'event_type' AS feature, event_type AS val,
         CASE WHEN value > 10 THEN 1 ELSE 0 END AS pos FROM events
  UNION ALL
  SELECT 'user_id', user_id::VARCHAR, CASE WHEN value > 10 THEN 1 ELSE 0 END FROM events
)
SELECT feature, val AS value, sum(pos)::BIGINT AS numerator, count(*) AS denominator,
       round(sum(pos)::DOUBLE / count(*), 6) AS weight
FROM melted GROUP BY 1, 2 ORDER BY feature, value
""",
        # the op must strip every piece of injected noise; the oracle
        # states the clean form directly (doc_id%2 trailing slash,
        # %3 default port, %5 gclid, utm_, fragment, case all vanish;
        # surviving params sort: 'a=1' < 'b=<lang>')
        "url_canonical": """
SELECT doc_id,
       'https://www.' || source || '.example.com/p/' || doc_id
         || '?a=1&b=' || lang AS url_canon,
       'www.' || source || '.example.com' AS host
FROM documents
""",
        "paragraph_dedup": """
WITH base AS (
  SELECT doc_id AS id,
         list_filter(list_transform(string_split_regex(text, ' the '),
                                    x -> trim(x)), x -> x <> '') AS ps
  FROM documents),
px AS (
  SELECT id,
         unnest(generate_series(1, len(ps))) - 1 AS pos,
         unnest(ps) AS para
  FROM base),
kept AS (
  SELECT id, pos, para,
         row_number() OVER (PARTITION BY para ORDER BY id, pos) AS rn
  FROM px),
agg AS (
  SELECT id, string_agg(para, chr(10) ORDER BY pos) AS text_clean,
         count(*) AS n_kept
  FROM kept WHERE rn = 1 GROUP BY id)
SELECT b.id,
       coalesce(a.text_clean, '') AS text_clean,
       len(b.ps) AS n_paragraphs,
       (len(b.ps) - coalesce(a.n_kept, 0))::BIGINT AS removed_paragraphs
FROM base b LEFT JOIN agg a USING (id)
""",
        "pii_scrub": """
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '@example.com or +1 (555) 010-'
              || lpad((doc_id % 10000)::VARCHAR, 4, '0')
              || ' at 10.0.' || (doc_id % 256)::VARCHAR || '.7' AS t0
  FROM documents),
s1 AS (SELECT doc_id,
         len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_email,
         regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
       FROM aug),
s2 AS (SELECT doc_id, n_email,
         len(regexp_extract_all(t1, '\\+?[0-9][0-9()\\- ]{6,14}[0-9]'))::BIGINT AS n_phone,
         regexp_replace(t1, '\\+?[0-9][0-9()\\- ]{6,14}[0-9]', '[PHONE]', 'g') AS t2
       FROM s1),
s3 AS (SELECT doc_id, n_email, n_phone,
         len(regexp_extract_all(t2, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))::BIGINT AS n_ipv4,
         regexp_replace(t2, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[IP]', 'g') AS t3
       FROM s2)
SELECT doc_id, md5(t3) AS text_md5, n_email, n_phone, n_ipv4
FROM s3 ORDER BY doc_id
""",
        "decontaminate": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
grams AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 5
              THEN list_transform(range(1, len(toks) - 3), i -> array_to_string(toks[i:i+4], ' '))
              ELSE [array_to_string(toks, ' ')] END AS gs
  FROM toks),
bg AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 97 = 0),
contaminated AS (
  SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(gs) AS g FROM grams) dg
  JOIN bg USING (g))
SELECT d.doc_id FROM documents d ANTI JOIN contaminated c ON d.doc_id = c.doc_id
ORDER BY d.doc_id
""",
        "catwalk_incremental": """
WITH melted AS (
  SELECT 'event_type' AS feature, event_type AS val,
         CASE WHEN value > 10 THEN 1 ELSE 0 END AS pos FROM events
  UNION ALL
  SELECT 'user_id', user_id::VARCHAR, CASE WHEN value > 10 THEN 1 ELSE 0 END FROM events
)
SELECT feature, val AS value, sum(pos)::BIGINT AS numerator, count(*) AS denominator,
       round(sum(pos)::DOUBLE / count(*), 6) AS weight
FROM melted GROUP BY 1, 2 ORDER BY feature, value
""",
        "trending_strategies": f"""
WITH e AS (
  SELECT event_type AS term, least(greatest(
    floor((epoch_us(ts)::DOUBLE - epoch_us(TIMESTAMP '{_WF_LO}')::DOUBLE)
          / ((epoch_us(TIMESTAMP '{_WF_HI}')::DOUBLE - epoch_us(TIMESTAMP '{_WF_LO}')::DOUBLE) / {_WF_N})),
    0), {_WF_N - 1})::INT AS bucket
  FROM events WHERE ts >= TIMESTAMP '{_WF_LO}' AND ts < TIMESTAMP '{_WF_HI}'),
c AS (SELECT term, bucket, count(*) AS n FROM e GROUP BY 1, 2),
p AS (SELECT term, sum(n) AS leader, max(n)::DOUBLE AS hp,
             sum(bucket::DOUBLE * n) AS sxy
      FROM c GROUP BY 1),
m AS (
  SELECT 'LEADER' AS strategy, term, leader::DOUBLE AS score FROM p
  UNION ALL SELECT 'HIGHEST_PEAK', term, hp FROM p
  UNION ALL SELECT 'LINEAR_REGRESSION', term,
    ({float(_WF_N)} * sxy - {_WF_N * (_WF_N - 1) / 2.0} * leader)
      / ({float(_WF_N)} * {(_WF_N - 1) * _WF_N * (2 * _WF_N - 1) / 6.0}
         - {_WF_N * (_WF_N - 1) / 2.0} * {_WF_N * (_WF_N - 1) / 2.0}) FROM p),
r AS (SELECT *, row_number() OVER (PARTITION BY strategy ORDER BY score DESC, term) AS rank FROM m)
SELECT strategy, term, round(score, 6) AS score, rank
FROM r WHERE rank <= 5 ORDER BY strategy, rank
""",
        "inbox_unread": """
WITH prev AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id
  FROM events),
marks AS (
  SELECT user_id AS mu, 'read' AS mark, prev_id AS target_id,
         NULL::TIMESTAMP AS up_to_ts, ts AS mark_ts
  FROM prev WHERE event_type = 'click' AND prev_id IS NOT NULL
  UNION ALL
  SELECT user_id, 'unread', prev_id, NULL, ts
  FROM prev WHERE event_type = 'signup' AND prev_id IS NOT NULL
  UNION ALL
  SELECT user_id, 'mark_all_read', NULL, ts, ts FROM events WHERE event_type = 'error'),
keyed AS (
  SELECT mu, mark, target_id, coalesce(up_to_ts, mark_ts) AS up_to_ts,
         epoch_us(mark_ts) * 4
           + (CASE mark WHEN 'mark_all_read' THEN 0 WHEN 'read' THEN 1 ELSE 2 END) AS k
  FROM marks),
state AS (
  SELECT e.user_id, e.event_id, arg_max(m.mark, m.k) AS wmark
  FROM events e LEFT JOIN keyed m
    ON e.user_id = m.mu AND ((m.target_id IS NOT NULL AND m.target_id = e.event_id)
        OR (m.target_id IS NULL AND e.ts <= m.up_to_ts))
  GROUP BY 1, 2)
SELECT user_id, count(*) AS n_unread
FROM state WHERE wmark IS NULL OR wmark = 'unread'
GROUP BY 1 ORDER BY user_id
""",
        "latest_by_user": """
SELECT event_id, user_id, ts, event_type, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1 ORDER BY user_id
""",
        "waveforms_named": f"""
WITH names(name, et) AS (VALUES ('clicks', 'click'), ('errors', 'error'),
                                ('purchases', 'purchase')),
b AS (SELECT unnest(generate_series(0, {_WF_N - 1}))::INT AS bucket),
e AS (SELECT event_type, least(greatest(
        floor((epoch_us(ts)::DOUBLE - epoch_us(TIMESTAMP '{_WF_LO}')::DOUBLE)
              / ((epoch_us(TIMESTAMP '{_WF_HI}')::DOUBLE - epoch_us(TIMESTAMP '{_WF_LO}')::DOUBLE) / {_WF_N})),
        0), {_WF_N - 1})::INT AS bucket
      FROM events
      WHERE ts >= TIMESTAMP '{_WF_LO}' AND ts < TIMESTAMP '{_WF_HI}'),
c AS (SELECT n.name, e.bucket, count(*) AS cnt
      FROM e JOIN names n ON e.event_type = n.et GROUP BY 1, 2)
SELECT n.name AS name, b.bucket, coalesce(c.cnt, 0)::BIGINT AS n
FROM names n CROSS JOIN b LEFT JOIN c ON c.name = n.name AND c.bucket = b.bucket
ORDER BY n.name, b.bucket
""",
        "waveform": f"""
WITH b AS (SELECT unnest(generate_series(0, {_WF_N - 1}))::INT AS bucket),
e AS (SELECT least(greatest(
        floor((epoch_us(ts)::DOUBLE - epoch_us(TIMESTAMP '{_WF_LO}')::DOUBLE)
              / ((epoch_us(TIMESTAMP '{_WF_HI}')::DOUBLE - epoch_us(TIMESTAMP '{_WF_LO}')::DOUBLE) / {_WF_N})),
        0), {_WF_N - 1})::INT AS bucket
      FROM events
      WHERE ts >= TIMESTAMP '{_WF_LO}' AND ts < TIMESTAMP '{_WF_HI}'),
c AS (SELECT bucket, count(*) AS n FROM e GROUP BY 1)
SELECT b.bucket, coalesce(c.n, 0)::BIGINT AS n FROM b LEFT JOIN c USING (bucket) ORDER BY bucket
""",
        # the streaming windowed agg must equal the batch GROUP BY
        # (Spark's unified semantics; complete-mode sink emits every window)
        "streaming_window_counts": """
SELECT date_trunc('day', ts) AS bucket_ts, event_type, count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        # closed form of the clamped fold n = max(0, n + delta) with
        # resets: n_t = S_t - least(0, min_prefix(S_t)), per (user,
        # reset-segment); the last row per user is the final counter
        "streaming_unread": """
WITH ev AS (
  SELECT user_id AS "user", ts, event_id,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN -1 ELSE 0 END AS delta,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_reset
  FROM events WHERE event_type IN ('view', 'click', 'error')),
seg AS (
  SELECT *, sum(is_reset) OVER (PARTITION BY "user" ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS seg
  FROM ev),
run AS (
  SELECT *, sum(delta) OVER (PARTITION BY "user", seg ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS s
  FROM seg),
clamp AS (
  SELECT *, least(0, min(s) OVER (PARTITION BY "user", seg ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING)) AS m
  FROM run),
fin AS (
  SELECT "user", (s - m)::BIGINT AS n_unread,
         row_number() OVER (PARTITION BY "user" ORDER BY ts DESC, event_id DESC) AS rn
  FROM clamp)
SELECT "user", n_unread FROM fin WHERE rn = 1 ORDER BY "user"
""",
        "metrics_daily": """
SELECT date_trunc('day', ts) AS bucket_ts, round(sum(value), 4) AS sum_value,
       round(avg(value), 6) AS avg_value, count(*) AS n
FROM events GROUP BY 1 ORDER BY 1
""",
        "anomaly_daily": """
WITH s AS (SELECT date_trunc('day', ts) AS bucket_ts, sum(value) AS sum_value FROM events GROUP BY 1),
st AS (SELECT avg(sum_value) AS mu, stddev_pop(sum_value) AS sd FROM s)
SELECT bucket_ts, round(sum_value, 4) AS sum_value,
       round(CASE WHEN sd > 0 THEN (sum_value - mu) / sd ELSE 0.0 END, 6) AS zscore,
       abs(CASE WHEN sd > 0 THEN (sum_value - mu) / sd ELSE 0.0 END) > 1.5 AS is_anomaly
FROM s CROSS JOIN st ORDER BY bucket_ts
""",
        "stumptown_tail": """
SELECT event_id, ts, user_id, event_type, value FROM events
ORDER BY ts DESC, event_id DESC LIMIT 15
""",
        "trending": """
SELECT event_type AS term,
       sum(CASE WHEN ts >= TIMESTAMP '2024-01-24 00:00:00' THEN 1 ELSE 0 END)::BIGINT AS recent_n,
       count(*) AS total_n,
       round(sum(CASE WHEN ts >= TIMESTAMP '2024-01-24 00:00:00' THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS ratio
FROM events GROUP BY 1 ORDER BY ratio DESC, recent_n DESC, term LIMIT 5
""",
        "reco_cf": f"""
WITH src AS (SELECT DISTINCT o_custkey AS u, l_partkey AS i
             FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
mine AS (SELECT i FROM src WHERE u = {_RECO_SEED}),
contrib AS (SELECT u, count(*) AS shared FROM src
            WHERE u <> {_RECO_SEED} AND i IN (SELECT i FROM mine)
            GROUP BY u ORDER BY shared DESC, u LIMIT 50)
SELECT i AS item, sum(shared)::BIGINT AS score FROM src JOIN contrib USING (u)
WHERE i NOT IN (SELECT i FROM mine)
GROUP BY i ORDER BY score DESC, item LIMIT 10
""",
        "token_stats": f"""
WITH base AS ({toks_base})
SELECT doc_id AS id, len(toks)::BIGINT AS n_tokens,
       length((SELECT text FROM documents d WHERE d.doc_id = base.doc_id))::BIGINT AS n_chars,
       round(CASE WHEN len(toks) > 0
             THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
             ELSE 0.0 END, 6) AS avg_token_len,
       round(CASE WHEN len(toks) > 0
             THEN len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(toks)
             ELSE 0.0 END, 6) AS stopword_ratio,
       coalesce(list_sum(list_transform(toks, x -> ceil(length(x) / 4.0)::BIGINT)), 0)::BIGINT AS bpe_tokens
FROM base
""",
        "quality": f"""
WITH base AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id AS id, len(toks) AS n_tokens,
        CASE WHEN len(toks) > 0
             THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) ELSE 0.0 END AS atl,
        round(CASE WHEN len(toks) > 0
             THEN len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(toks)
             ELSE 0.0 END, 6) AS stopword_ratio,
        round(CASE WHEN length(text) > 0
             THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)
             ELSE 0.0 END, 6) AS alpha_ratio
      FROM base)
SELECT id, n_tokens::BIGINT AS n_tokens, alpha_ratio, stopword_ratio,
       round(((CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN alpha_ratio >= 0.6 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN round(atl, 6) BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END)) / 4.0, 6) AS quality
FROM s
""",
        "lang_id": f"""
WITH base AS ({toks_base}),
h AS (SELECT doc_id AS id,
  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','sich','auf'], x))) AS de,
  len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','that','it','was','for'], x))) AS en,
  len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','para','con','por','se'], x))) AS es,
  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','dans','que','pour','pas'], x))) AS fr
FROM base)
SELECT id, CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
  WHEN de >= en AND de >= es AND de >= fr THEN 'de'
  WHEN en >= es AND en >= fr THEN 'en'
  WHEN es >= fr THEN 'es' ELSE 'fr' END AS lang_guess
FROM h
""",
        "fingerprint": f"""
SELECT doc_id AS id, md5(text) AS digest,
       md5(array_to_string({_TOKS}, ' ')) AS norm_digest
FROM documents
""",
        "dedup_exact": """
SELECT doc_id FROM (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep FROM documents)
WHERE doc_id = keep ORDER BY doc_id
""",
        # ExactSubstr spans: grams over the literal strings (the Spark
        # side's 128-bit hash pair stands in for string equality), global
        # count >= 2, then per-doc gaps-and-islands with the same merge
        # rule (gap <= min_len merges)
        "substring_dedup": f"""
WITH base AS ({toks_base}),
g AS (SELECT doc_id, unnest([{{'pos': i - 1, 'gram': array_to_string(toks[i:i+7], ' ')}}
                             for i in range(1, len(toks) - 6)]) AS gr FROM base),
gg AS (SELECT doc_id, gr.pos AS pos, gr.gram AS gram FROM g),
dup AS (SELECT gram FROM gg GROUP BY gram HAVING count(*) >= 2),
cand AS (SELECT doc_id, pos FROM gg JOIN dup USING (gram)),
flg AS (SELECT doc_id, pos,
        CASE WHEN pos - lag(pos, 1, -8) OVER (PARTITION BY doc_id ORDER BY pos) > 8
             THEN 1 ELSE 0 END AS brk FROM cand),
isl AS (SELECT doc_id, pos,
        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM flg)
SELECT doc_id, min(pos)::BIGINT AS span_start, (max(pos) + 8)::BIGINT AS span_end,
       count(*)::BIGINT AS n_grams
FROM isl GROUP BY doc_id, island
""",
        "substring_strip": f"""
WITH base AS ({toks_base}),
g AS (SELECT doc_id, unnest([{{'pos': i - 1, 'gram': array_to_string(toks[i:i+7], ' ')}}
                             for i in range(1, len(toks) - 6)]) AS gr FROM base),
gg AS (SELECT doc_id, gr.pos AS pos, gr.gram AS gram FROM g),
dup AS (SELECT gram FROM gg GROUP BY gram HAVING count(*) >= 2),
cand AS (SELECT doc_id, pos FROM gg JOIN dup USING (gram)),
flg AS (SELECT doc_id, pos,
        CASE WHEN pos - lag(pos, 1, -8) OVER (PARTITION BY doc_id ORDER BY pos) > 8
             THEN 1 ELSE 0 END AS brk FROM cand),
isl AS (SELECT doc_id, pos,
        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM flg),
spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e FROM isl GROUP BY doc_id, island),
sp AS (SELECT doc_id, list({{'s': s, 'e': e}}) AS spans FROM spans GROUP BY doc_id)
SELECT b.doc_id,
  coalesce(array_to_string([b.toks[i] for i in range(1, len(b.toks) + 1)
    if len(list_filter(coalesce(sp.spans, []), x -> i - 1 >= x.s AND i - 1 < x.e)) = 0],
    ' '), '') AS text_clean,
  len(b.toks)::BIGINT AS n_tokens,
  (len(b.toks) - len([b.toks[i] for i in range(1, len(b.toks) + 1)
    if len(list_filter(coalesce(sp.spans, []), x -> i - 1 >= x.s AND i - 1 < x.e)) = 0]
  ))::BIGINT AS removed_tokens
FROM base b LEFT JOIN sp ON b.doc_id = sp.doc_id
""",
        "ngram_jaccard": f"""
WITH base AS ({toks_base}),
sh0 AS (SELECT doc_id AS id, unnest(list_distinct(
         CASE WHEN len(toks) >= 3
              THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
              ELSE [array_to_string(toks, ' ')] END)) AS s
       FROM base),
hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 100),
sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n
          FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2)
SELECT id_a, id_b, round(n::DOUBLE / (x.sz + y.sz - n), 6) AS jaccard
FROM inter JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
WHERE n::DOUBLE / (x.sz + y.sz - n) >= 0.8
ORDER BY id_a, id_b
""",
        "temperature_sample": """
WITH cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
tot AS (SELECT sum(c)::DOUBLE AS n, sum(pow(c, 0.5)) AS z FROM cnt),
rates AS (SELECT lang, least(1.0, 0.5 * n * pow(c, 0.5) / z / c) AS rate
          FROM cnt CROSS JOIN tot)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN rates r USING (lang)
WHERE CAST(('0x' || substring(md5(d.doc_id::VARCHAR || ':3'), 1, 8))::UBIGINT AS BIGINT)
      < floor(r.rate * 4294967296)::BIGINT
ORDER BY d.doc_id
""",
        "lm_score": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tk AS (SELECT doc_id, len(toks) AS n_tokens, unnest(toks) AS term FROM base),
lm AS (SELECT term, count(*) AS cf FROM tk GROUP BY 1),
st AS (SELECT sum(cf)::DOUBLE AS total, count(*)::DOUBLE AS vocab FROM lm)
SELECT tk.doc_id, tk.n_tokens::BIGINT AS n_tokens,
  round(avg(-log2((cf + 0.5) / (total + 0.5 * (vocab + 1)))), 6) AS cross_entropy
FROM tk JOIN lm USING (term) CROSS JOIN st
GROUP BY 1, 2 ORDER BY 1
""",
        "repetition_signals": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
b2 AS (SELECT doc_id, toks[i] || chr(31) || toks[i+1] AS g
       FROM base, unnest(generate_series(1, len(toks) - 1)) AS t(i)),
b3 AS (SELECT doc_id, toks[i] || chr(31) || toks[i+1] || chr(31) || toks[i+2] AS g
       FROM base, unnest(generate_series(1, len(toks) - 2)) AS t(i)),
c2 AS (SELECT doc_id, g, count(*) AS c FROM b2 GROUP BY 1, 2),
c3 AS (SELECT doc_id, g, count(*) AS c FROM b3 GROUP BY 1, 2),
a2 AS (SELECT doc_id, sum(c) AS total, count(*) AS dist, max(c) AS top FROM c2 GROUP BY 1),
a3 AS (SELECT doc_id, sum(c) AS total, count(*) AS dist FROM c3 GROUP BY 1)
SELECT b.doc_id, len(b.toks)::BIGINT AS n_tokens,
  round(CASE WHEN coalesce(a3.total, 0) > 0 THEN 1.0 - a3.dist::DOUBLE / a3.total ELSE 0.0 END, 6) AS dup_3gram_frac,
  round(CASE WHEN coalesce(a2.total, 0) > 0 THEN 1.0 - a2.dist::DOUBLE / a2.total ELSE 0.0 END, 6) AS dup_2gram_frac,
  round(CASE WHEN coalesce(a2.total, 0) > 0 THEN a2.top::DOUBLE / a2.total ELSE 0.0 END, 6) AS top_2gram_frac
FROM base b LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
ORDER BY doc_id
""",
        "boilerplate_ngrams": f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) < 5 THEN [] ELSE
       list_transform(generate_series(1, len(toks) - 4),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]) END)) AS ngram
     FROM base)
SELECT ngram, count(*) AS df FROM g GROUP BY 1
HAVING count(*) > 0.002 * (SELECT count(*) FROM documents)
ORDER BY df DESC, ngram LIMIT 50
""",
        # greedy first-fit pack as a recursive fold per (md5) bucket —
        # the exact sequential semantics the engine runs bucket-locally
        "pack_sequences": f"""
WITH RECURSIVE t AS (
  SELECT doc_id, len({_TOKS}) AS n_tokens,
         (CAST(('0x' || substring(md5(doc_id::VARCHAR || ':0'), 1, 8))::UBIGINT AS BIGINT)
          % 16)::INT AS bucket
  FROM documents),
ord AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM t),
pack AS (
  SELECT bucket, rn, doc_id, n_tokens,
         0::BIGINT AS seq, 0::BIGINT AS tok_offset, n_tokens::BIGINT AS acc
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN p.acc + o.n_tokens <= 512 THEN p.seq ELSE p.seq + 1 END,
         CASE WHEN p.acc + o.n_tokens <= 512 THEN p.acc ELSE 0::BIGINT END,
         CASE WHEN p.acc + o.n_tokens <= 512 THEN p.acc + o.n_tokens ELSE o.n_tokens::BIGINT END
  FROM pack p JOIN ord o ON o.bucket = p.bucket AND o.rn = p.rn + 1)
SELECT doc_id, n_tokens::BIGINT AS n_tokens, bucket, seq, tok_offset
FROM pack ORDER BY doc_id
""",
        "sample_hash": """
SELECT doc_id, lang, source FROM documents
WHERE CAST(('0x' || substring(md5(doc_id::VARCHAR || ':7'), 1, 8))::UBIGINT AS BIGINT)
      < CAST(0.25 * 4294967296 AS BIGINT)
ORDER BY doc_id
""",
        # thresholds f-stringed from the SAME float accumulation the
        # Spark side uses (int() truncation, not SQL round-on-cast)
        "corpus_split": f"""
WITH b AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(doc_id::VARCHAR || ':11'), 1, 8))::UBIGINT AS BIGINT) AS bk
  FROM documents)
SELECT CASE WHEN bk < {int(0.98 * 4294967296)} THEN 'train'
            WHEN bk < {int((0.98 + 0.01) * 4294967296)} THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
FROM b GROUP BY 1 ORDER BY split
""",
        "epoch_shuffle": """
SELECT doc_id,
       CAST(('0x' || substring(md5(doc_id::VARCHAR || ':5:3'), 1, 8))::UBIGINT AS BIGINT) AS shuffle_key
FROM documents ORDER BY shuffle_key, doc_id LIMIT 50
""",
        "domain_cap": """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents) WHERE rn <= 10
ORDER BY doc_id
""",
        "corpus_clean": f"""
WITH RECURSIVE base AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id AS id, len(toks) AS n_tokens,
        CASE WHEN len(toks) > 0
             THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) ELSE 0.0 END AS atl,
        round(CASE WHEN len(toks) > 0
             THEN len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(toks)
             ELSE 0.0 END, 6) AS stopword_ratio,
        round(CASE WHEN length(text) > 0
             THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)
             ELSE 0.0 END, 6) AS alpha_ratio
      FROM base),
qual AS (SELECT id, n_tokens,
       round(((CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN alpha_ratio >= 0.6 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN round(atl, 6) BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END)) / 4.0, 6) AS quality
       FROM s),
h AS (SELECT doc_id AS id,
  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','sich','auf'], x))) AS de,
  len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','that','it','was','for'], x))) AS en,
  len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','para','con','por','se'], x))) AS es,
  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','dans','que','pour','pas'], x))) AS fr
  FROM base),
lng AS (SELECT id, CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
  WHEN de >= en AND de >= es AND de >= fr THEN 'de'
  WHEN en >= es AND en >= fr THEN 'en'
  WHEN es >= fr THEN 'es' ELSE 'fr' END AS lang FROM h),
kept AS (SELECT q.id, l.lang, q.quality, q.n_tokens
         FROM qual q JOIN lng l USING (id)
         WHERE q.quality >= 0.75 AND l.lang = 'en'),
sh0 AS (SELECT b.doc_id AS id, unnest(list_distinct(
         CASE WHEN len(b.toks) >= 3
              THEN [array_to_string(b.toks[i:i+2], ' ') for i in range(1, len(b.toks) - 1)]
              ELSE [array_to_string(b.toks, ' ')] END)) AS sg
       FROM base b JOIN kept k ON b.doc_id = k.id),
hot AS (SELECT sg FROM sh0 GROUP BY sg HAVING count(*) > 100),
sh AS (SELECT * FROM sh0 WHERE sg NOT IN (SELECT sg FROM hot)),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n
          FROM sh a JOIN sh b ON a.sg = b.sg AND a.id < b.id GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b
          FROM inter JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
          WHERE n::DOUBLE / (x.sz + y.sz - n) >= 0.8),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (SELECT u, v FROM edges
                UNION
                SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
                WHERE e.v <> r.a),
lbl AS (SELECT a AS id, min(b) AS mn FROM reach GROUP BY a)
SELECT k.id AS doc_id, k.lang, k.quality, k.n_tokens::INT AS n_tokens
FROM kept k LEFT JOIN lbl l ON l.id = k.id
WHERE coalesce(least(l.mn, k.id), k.id) = k.id
ORDER BY doc_id
""",
        "dedup_components": f"""
WITH RECURSIVE base AS ({toks_base}),
sh0 AS (SELECT doc_id AS id, unnest(list_distinct(
         CASE WHEN len(toks) >= 3
              THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
              ELSE [array_to_string(toks, ' ')] END)) AS s
       FROM base),
hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 100),
sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n
          FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b
          FROM inter JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
          WHERE n::DOUBLE / (x.sz + y.sz - n) >= 0.8),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (SELECT u, v FROM edges
                UNION
                SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
                WHERE e.v <> r.a),
lbl AS (SELECT a AS id, min(b) AS mn FROM reach GROUP BY a)
SELECT d.doc_id, coalesce(least(l.mn, d.doc_id), d.doc_id) AS component
FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id
ORDER BY d.doc_id
""",
        "dedup_canonical": f"""
WITH RECURSIVE base AS ({toks_base}),
sh0 AS (SELECT doc_id AS id, unnest(list_distinct(
         CASE WHEN len(toks) >= 3
              THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
              ELSE [array_to_string(toks, ' ')] END)) AS s
       FROM base),
hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 100),
sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n
          FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b
          FROM inter JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
          WHERE n::DOUBLE / (x.sz + y.sz - n) >= 0.8),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (SELECT u, v FROM edges
                UNION
                SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
                WHERE e.v <> r.a),
lbl AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)
SELECT component, min(id) AS keep_doc, count(*) AS n_docs
FROM lbl GROUP BY component HAVING count(*) >= 2
ORDER BY component
""",
        "ann_cosine_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
v AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
s AS (SELECT query_id, vec_id,
        list_dot_product(qv, vv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(vv, vv))) AS cos
      FROM v CROSS JOIN q WHERE vec_id <> query_id),
r AS (SELECT query_id, vec_id, cos,
        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM s)
SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank
""",
        "cosine_pairs": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.45
ORDER BY id_a, id_b
""",
        # payload = encode(text,'utf-8'): octet_length(encode(..)) and
        # sha256(varchar) in DuckDB operate on the same UTF-8 bytes.
        # sniff_type for string payloads can only hit the printable magic
        # prefixes (GIF8/RIFF/ID3) or the defaults — spelled out here.
        "multimodal_meta": """
SELECT doc_id AS id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       CASE WHEN text IS NULL OR text = '' THEN '' ELSE sha256(text) END AS sha256,
       CASE WHEN text IS NULL OR text = '' THEN 'empty'
            WHEN starts_with(text, 'GIF8') THEN 'image/gif'
            WHEN starts_with(text, 'RIFF') THEN 'audio/wav-or-avi'
            WHEN starts_with(text, 'ID3') THEN 'audio/mp3'
            ELSE 'application/octet-stream' END AS sniffed_type
FROM documents
""",
        # frame_sample(frame_bytes=64, every=2): frames fno=0,2,4,... of
        # ceil(n_bytes/64) total; each frame is min(64, n_bytes - fno*64)
        # bytes — pure byte-slicing arithmetic, exactly SQL-expressible.
        "multimodal_frames": """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents WHERE text IS NOT NULL)
SELECT doc_id AS id, fno AS frame_no,
       least(64, n - fno * 64)::BIGINT AS frame_len
FROM b, LATERAL unnest(generate_series(0, ((n + 63) // 64 - 1)::BIGINT, 2)) AS t(fno)
WHERE n > 0
""",
        # decode_features(decoder="fake"): normalized histogram of
        # (byte >> 5) over 8 bins. The corpus text is pure ASCII (verified:
        # length == octet_length for every row), so ascii(char) // 32
        # reproduces the byte-level bins exactly.
        "multimodal_features": """
WITH chars AS (
  SELECT doc_id, (ascii(substr(text, CAST(i AS INT), 1)) // 32)::BIGINT AS feature_no
  FROM documents, LATERAL unnest(generate_series(1, length(text))) AS t(i)
),
hist AS (
  SELECT doc_id, feature_no, count(*)::DOUBLE AS c FROM chars GROUP BY 1, 2
),
tot AS (SELECT doc_id, sum(c) AS s FROM hist GROUP BY 1),
bins AS (SELECT unnest(generate_series(0, 7)) AS feature_no)
SELECT d.doc_id AS id, b.feature_no::BIGINT AS feature_no,
       round(coalesce(h.c / t.s, 0.0), 6) AS feature
FROM documents d CROSS JOIN bins b
LEFT JOIN tot t ON t.doc_id = d.doc_id
LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.feature_no = b.feature_no
""",
    }
    out["bm25_slop_positional"] = out["bm25_slop"]
    return out
