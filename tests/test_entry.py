"""Driver-contract guard: queries()/oracle_sql() wiring + a cheap
spot-check of Spark-vs-DuckDB value equality at sf0.001.

The full sweep lives in tools/check_entry.py (run at sf0.001/sf0.01);
this keeps the contract from drifting between those runs.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_oracle_keys_subset_of_queries(entry):
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs)
    # the rows-only set is intentional and documented — keep it small
    rows_only = set(qs) - set(osql)
    # fulltext_highlight left this set in round 3: the token-level
    # fragment rule is exactly SQL-expressible, so it carries a value
    # oracle now
    assert rows_only == {
        "minhash_lsh", "simhash", "winnow", "ann_lsh_topk",
        "ann_ivf_topk",
        "cosine_pairs_lsh",
        "distinct_count_approx",
    }


@pytest.mark.parametrize(
    "name",
    ["filter_tree", "gather", "fingerprint", "trending",
     "streaming_window_counts", "streaming_unread"])
def test_query_matches_oracle(entry, duck, spark, name):
    got = entry.queries()[name](spark, SF).toPandas()
    exp = duck.sql(entry.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp)
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_entry_returns_rows(entry, spark):
    df = entry.entry(spark)
    assert df.columns == ["doc_id", "score"]
    assert df.count() >= 0


def test_toks_cache_bounded_and_clearable(entry, spark):
    """A long driver session over many sf dirs must not accumulate
    persisted relations: the tokenized-corpus cache is LRU-bounded and
    clear_entry_caches() unpersists everything it holds."""
    entry.clear_entry_caches()
    assert entry._TOKS_CACHE == {}
    a = entry._toks_cached(spark, SF)
    assert a.storageLevel.useMemory  # persisted
    # same dir -> same cached object, no growth
    assert entry._toks_cached(spark, SF) is a
    assert len(entry._TOKS_CACHE) == 1
    # pushing more dirs past the bound evicts (and unpersists) the oldest
    entry._TOKS_CACHE["fake1"] = spark.range(2).persist()
    entry._toks_cached(spark, "/root/testdata/sf0.01")  # triggers eviction
    assert len(entry._TOKS_CACHE) <= entry._TOKS_CACHE_MAX
    assert SF not in entry._TOKS_CACHE  # oldest evicted
    assert not a.storageLevel.useMemory  # ...and unpersisted
    entry.clear_entry_caches()
    assert entry._TOKS_CACHE == {}
