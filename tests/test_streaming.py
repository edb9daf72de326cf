"""Structured-Streaming ingest tests: micro-batch shard builds, sip-style
cursor/resume, and watermarked window counts."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def paged_corpus(tmp_path_factory):
    """Three parquet 'WAL segments' with url-sorted disjoint ranges."""
    import time as _t

    root = tmp_path_factory.mktemp("stream_src")
    texts = {}
    n_per, words = 10, ["spark", "join", "scan", "merge", "sort", "hash"]
    for seg in range(3):
        rows = []
        for i in range(n_per):
            gid = seg * n_per + i
            body = " ".join(words[(gid + j) % len(words)] for j in range(5 + gid % 7))
            url = f"https://ex.com/p/{gid:04d}"
            texts[url] = body
            rows.append({"url": url, "text": body})
        pd.DataFrame(rows).to_parquet(root / f"seg{seg}.parquet")
        _t.sleep(0.05)  # distinct mtimes -> deterministic file order
    return str(root), texts


def test_streaming_index_build(spark, paged_corpus, tmp_path):
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search, search_wand
    from miru_spark.streaming import StreamingIndexer

    src, texts = paged_corpus
    idx_dir = str(tmp_path / "idx")
    indexer = StreamingIndexer(idx_dir, block_bits=4, stored_cols=["url"])

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        indexer.attach(stream)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    meta = indexer.finalize(spark)

    assert meta.n_docs == len(texts)
    assert indexer.read_cursor()["n_shards"] == 3

    reader = IndexReader(spark, idx_dir)
    # global stats equal a pure-Python recount over the corpus
    from miru_spark.analysis.tokenizer import tokenize

    doclens = {u: len(tokenize(t)) for u, t in texts.items()}
    assert meta.total_tokens == sum(doclens.values())
    # df from the merged dictionary equals corpus-wide doc frequency
    df_rows = {r["term"]: r["df"] for r in reader.dictionary().collect()}
    for term in ["spark", "join"]:
        expect = sum(1 for t in texts.values() if term in tokenize(t))
        assert df_rows[term] == expect

    # exact path and block-max WAND agree on the streamed (multi-shard) index
    exact = [(r["doc_id"], round(r["score"], 9)) for r in search(reader, "spark AND join", k=8).collect()]
    wand = [(r["doc_id"], round(r["score"], 9)) for r in search_wand(reader, ["spark", "join"], k=8).collect()]
    assert exact == wand
    assert len(exact) == 8


def test_streaming_replay_is_idempotent(spark, paged_corpus, tmp_path):
    from miru_spark.streaming import StreamingIndexer

    src, texts = paged_corpus
    idx_dir = str(tmp_path / "idx2")
    indexer = StreamingIndexer(idx_dir, block_bits=4)

    batch = spark.read.parquet(os.path.join(src, "seg0.parquet"))
    indexer.process_batch(batch, 0)
    cur1 = indexer.read_cursor()
    # replayed micro-batch (same batch id + content) must be a no-op…
    indexer.process_batch(batch, 0)
    assert indexer.read_cursor() == cur1
    # …while new content becomes the next shard
    batch2 = spark.read.parquet(os.path.join(src, "seg1.parquet"))
    indexer.process_batch(batch2, 1)
    assert indexer.read_cursor()["n_shards"] == 2


def test_windowed_event_counts(spark, tmp_path):
    from miru_spark.streaming import windowed_event_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev_src")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = windowed_event_counts(stream, "ts", window="1 day", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ev_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["n"])
        for r in spark.sql("select * from win_counts").collect()
    }
    expect = {
        (r["ws"], r["n"])
        for r in ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .collect()
    }
    # append mode only emits windows the watermark has closed; with
    # availableNow the final watermark closes all but the last window(s)
    assert got.issubset(expect)
    assert len(got) >= len(expect) - 2


def test_streaming_unread_counts_stateful(spark, tmp_path):
    """applyInPandasWithState fold: state carries across micro-batches
    (activity +1, read -1 floor 0, mark_all_read reset)."""
    from datetime import datetime

    from miru_spark.streaming import streaming_unread_counts

    src = str(tmp_path / "marks_src")
    ckpt = str(tmp_path / "marks_ckpt")
    schema = "user_id long, kind string, ts timestamp"
    t = lambda m: datetime.fromisoformat(f"2024-01-01 00:{m:02d}:00")

    collected: list[dict] = []

    def run_once():
        sink = lambda batch_df, _bid: collected.extend(
            r.asDict() for r in batch_df.collect()
        )
        q = (
            streaming_unread_counts(spark.readStream.schema(schema).parquet(src))
            .writeStream.foreachBatch(sink)
            .outputMode("update").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "activity", t(1)), (1, "activity", t(2)), (1, "read", t(3)),
         (2, "activity", t(1))], schema,
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got1 = {r["user"]: r["n_unread"] for r in collected}
    assert got1 == {1: 1, 2: 1}

    # second micro-batch: state must carry (user 1 resets, user 2 grows)
    collected.clear()
    spark.createDataFrame(
        [(1, "mark_all_read", t(4)), (2, "activity", t(5))], schema,
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got2 = {r["user"]: r["n_unread"] for r in collected}
    assert got2 == {1: 0, 2: 2}


def test_compact_shards_preserves_results_and_replay(spark, paged_corpus, tmp_path):
    """LSM segment merge: 3 micro-batch shards -> 1 compacted shard with
    byte-identical query results, identical global stats, and replayed
    micro-batches still no-op against the merged manifest."""
    from miru_spark.index.builder import compact_shards
    from miru_spark.index.manifest import read_manifest
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search, search_wand
    from miru_spark.streaming import StreamingIndexer

    src, texts = paged_corpus
    idx_dir = str(tmp_path / "idx")
    indexer = StreamingIndexer(idx_dir, block_bits=4, stored_cols=["url"])
    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        indexer.attach(stream)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    meta_before = indexer.finalize(spark)
    r = IndexReader(spark, idx_dir)
    before = [(x["doc_id"], round(x["score"], 9))
              for x in search(r, "spark AND join", k=30).collect()]
    dict_before = sorted(
        (x["term"], x["df"], x["cf"]) for x in r.dictionary().collect())

    out = compact_shards(spark, idx_dir, target_docs=1000)
    assert out["n_shards"] == 1 and out["groups"] == [[0, 1, 2]]
    assert os.path.isdir(os.path.join(idx_dir, "postings", "shard=0"))
    assert not os.path.isdir(os.path.join(idx_dir, "postings", "shard=1"))

    r2 = IndexReader(spark, idx_dir)
    assert r2.n_docs == meta_before.n_docs and r2.avgdl == meta_before.avgdl
    after = [(x["doc_id"], round(x["score"], 9))
             for x in search(r2, "spark AND join", k=30).collect()]
    wand = [(x["doc_id"], round(x["score"], 9))
            for x in search_wand(r2, ["spark", "join"], k=30).collect()]
    assert after == before and wand == before
    assert sorted((x["term"], x["df"], x["cf"])
                  for x in r2.dictionary().collect()) == dict_before

    # merged manifest carries the children's lineage
    m = read_manifest(idx_dir, 0)
    assert m.n_docs == len(texts) and len(m.extra["merged_fingerprints"]) == 3

    # a replayed stream (fresh checkpoint => every batch re-delivered)
    # must not index anything twice against the compacted index
    q2 = (
        indexer.attach(
            spark.readStream.schema("url string, text string")
            .option("maxFilesPerTrigger", "1").parquet(src)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    assert indexer.read_cursor()["n_shards"] == 1
    meta_after = indexer.finalize(spark)
    assert meta_after.n_docs == meta_before.n_docs
    r3 = IndexReader(spark, idx_dir)
    again = [(x["doc_id"], round(x["score"], 9))
             for x in search(r3, "spark AND join", k=30).collect()]
    assert again == before


def test_compact_shards_partial_groups_renumber(spark, paged_corpus, tmp_path):
    """target_docs=20 over 3x10-doc shards -> groups [[0,1],[2]]: the
    tail shard is renumbered (2 -> 1) and results stay identical."""
    from miru_spark.index.builder import compact_shards
    from miru_spark.index.manifest import read_manifest
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search
    from miru_spark.streaming import StreamingIndexer

    src, _texts = paged_corpus
    idx_dir = str(tmp_path / "idx")
    indexer = StreamingIndexer(idx_dir, block_bits=4, stored_cols=["url"])
    q = (
        indexer.attach(
            spark.readStream.schema("url string, text string")
            .option("maxFilesPerTrigger", "1").parquet(src)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    indexer.finalize(spark)
    r = IndexReader(spark, idx_dir)
    before = [(x["doc_id"], round(x["score"], 9))
              for x in search(r, "scan OR hash", k=30).collect()]

    out = compact_shards(spark, idx_dir, target_docs=20)
    assert out["groups"] == [[0, 1], [2]] and out["n_shards"] == 2
    assert os.path.isdir(os.path.join(idx_dir, "postings", "shard=1"))
    assert not os.path.isdir(os.path.join(idx_dir, "postings", "shard=2"))
    m0, m1 = read_manifest(idx_dir, 0), read_manifest(idx_dir, 1)
    assert m0.n_docs == 20 and m1.n_docs == 10
    # singleton group keeps its original fingerprint (replay-safe)
    assert not m1.input_fingerprint.startswith("compact:")

    r2 = IndexReader(spark, idx_dir)
    after = [(x["doc_id"], round(x["score"], 9))
             for x in search(r2, "scan OR hash", k=30).collect()]
    assert after == before


def test_compact_crash_recovery(spark, paged_corpus, tmp_path, monkeypatch):
    """Two-phase crash safety: a crash AFTER the commit marker rolls
    forward on the next recover; before it, the live index is untouched
    (hardlink staging) and stale stages are discarded."""
    import miru_spark.index.builder as B
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search
    from miru_spark.streaming import StreamingIndexer

    src, _texts = paged_corpus
    idx_dir = str(tmp_path / "idx")
    indexer = StreamingIndexer(idx_dir, block_bits=4, stored_cols=["url"])
    q = (
        indexer.attach(
            spark.readStream.schema("url string, text string")
            .option("maxFilesPerTrigger", "1").parquet(src)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    indexer.finalize(spark)
    before = [(x["doc_id"], round(x["score"], 9))
              for x in search(IndexReader(spark, idx_dir), "spark AND join", k=30).collect()]

    # stale stage without a marker (crash during phase 1) is discarded
    os.makedirs(os.path.join(idx_dir, ".compact_stage", "postings"), exist_ok=True)
    assert B.recover_compaction(spark, idx_dir) is False
    assert not os.path.exists(os.path.join(idx_dir, ".compact_stage"))

    # crash at commit time: marker written, swap never ran
    real = B.recover_compaction
    calls = {"n": 0}

    def flaky(spark_, d):
        calls["n"] += 1
        if calls["n"] == 2:  # the commit-phase invocation
            raise RuntimeError("simulated crash at commit")
        return real(spark_, d)

    monkeypatch.setattr(B, "recover_compaction", flaky)
    with pytest.raises(RuntimeError, match="simulated crash"):
        B.compact_shards(spark, idx_dir, target_docs=1000)
    monkeypatch.setattr(B, "recover_compaction", real)

    # live index is fully intact mid-crash (staging is hardlinks)
    mid = [(x["doc_id"], round(x["score"], 9))
           for x in search(IndexReader(spark, idx_dir), "spark AND join", k=30).collect()]
    assert mid == before
    assert os.path.exists(os.path.join(idx_dir, ".compact_commit.json"))

    # roll forward completes the compaction with identical results
    assert B.recover_compaction(spark, idx_dir) is True
    assert not os.path.exists(os.path.join(idx_dir, ".compact_commit.json"))
    r = IndexReader(spark, idx_dir)
    assert r.stats["n_shards"] == 1
    after = [(x["doc_id"], round(x["score"], 9))
             for x in search(r, "spark AND join", k=30).collect()]
    assert after == before
    assert not os.path.isdir(os.path.join(idx_dir, "postings", "shard=1"))


def test_sip_snapshots_cursor_and_passthrough(spark, paged_corpus, tmp_path, monkeypatch):
    """Snapshot sip lifecycle (Iceberg options faked — no catalog in the
    sandbox): the first sip pins the current snapshot via time travel,
    later sips pass start/end-snapshot-id so only the delta is read, an
    unchanged snapshot no-ops, and the cursor records the pin."""
    from miru_spark import sources
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search_wand
    from miru_spark.streaming.ingest import StreamingIndexer

    root, texts = paged_corpus
    segs = sorted(os.listdir(root))
    state = {"latest": 101}
    calls = []

    def fake_current(spark_, table):
        assert table == "wh.db.pages"
        return state["latest"]

    def fake_load(spark_, table, **kw):
        calls.append(kw)
        if kw.get("snapshot_id") is not None:
            # full table as of the pinned snapshot = first segment
            return spark_.read.parquet(os.path.join(root, segs[0]))
        # incremental: the delta appended after start_snapshot_id
        assert kw["start_snapshot_id"] == 101 and kw["end_snapshot_id"] == 102
        return spark_.read.parquet(os.path.join(root, segs[1]))

    monkeypatch.setattr(sources, "current_snapshot_id", fake_current)
    monkeypatch.setattr(sources, "load_corpus", fake_load)

    idx = str(tmp_path / "idx")
    indexer = StreamingIndexer(idx, block_bits=6)
    r1 = indexer.sip_snapshots(spark, "wh.db.pages")
    assert r1 == {"status": "indexed", "snapshot_id": 101,
                  "start_snapshot_id": None}
    assert calls[-1]["snapshot_id"] == 101
    assert indexer.read_cursor()["last_snapshot_id"] == 101

    # unchanged table: no-op, no read
    n_calls = len(calls)
    assert indexer.sip_snapshots(spark, "wh.db.pages")["status"] == "no-op"
    assert len(calls) == n_calls

    # table advances: delta-only read with the cursor as start
    state["latest"] = 102
    r2 = indexer.sip_snapshots(spark, "wh.db.pages")
    assert r2 == {"status": "indexed", "snapshot_id": 102,
                  "start_snapshot_id": 101}
    assert indexer.read_cursor()["last_snapshot_id"] == 102

    meta = indexer.finalize(spark)
    assert meta.n_docs == 20  # both segments indexed, once each
    hits = search_wand(IndexReader(spark, idx), ["spark"], k=25).collect()
    assert len(hits) > 0


def test_sip_snapshots_inflight_crash_replay(spark, paged_corpus, tmp_path, monkeypatch):
    """WAL discipline: a crash between the index commit and the cursor
    restamp leaves sip_inflight behind; the next sip replays the EXACT
    same delta bounds (a committed shard no-ops via its fingerprint, an
    uncommitted one builds), so already-indexed ranges are never
    re-read under widened bounds as duplicates."""
    import json

    from miru_spark import sources
    from miru_spark.streaming.ingest import StreamingIndexer

    root, _texts = paged_corpus
    segs = sorted(os.listdir(root))
    state = {"latest": 101}
    loads = []

    def fake_current(spark_, table):
        return state["latest"]

    def fake_load(spark_, table, **kw):
        loads.append(kw)
        if kw.get("snapshot_id") is not None:
            return spark_.read.parquet(os.path.join(root, segs[0]))
        assert (kw["start_snapshot_id"], kw["end_snapshot_id"]) == (101, 102)
        return spark_.read.parquet(os.path.join(root, segs[1]))

    monkeypatch.setattr(sources, "current_snapshot_id", fake_current)
    monkeypatch.setattr(sources, "load_corpus", fake_load)

    idx = str(tmp_path / "idx")
    indexer = StreamingIndexer(idx, block_bits=6)
    indexer.sip_snapshots(spark, "wh.db.pages")  # snapshot 101 indexed

    # CRASH SIMULATION A: inflight written, batch NOT committed — the
    # next sip must build exactly (101, 102], not a widened delta
    cur = indexer.read_cursor()
    cur["sip_inflight"] = [101, 102]
    indexer._write_cursor(cur)
    state["latest"] = 102
    indexer.sip_snapshots(spark, "wh.db.pages")
    assert indexer.read_cursor()["last_snapshot_id"] == 102
    assert "sip_inflight" not in indexer.read_cursor()
    assert indexer.finalize(spark).n_docs == 20  # both segs, once each

    # CRASH SIMULATION B: batch committed, restamp lost — the replay's
    # identical fingerprint makes it a no-op (still 20 docs, 2 shards)
    cur = indexer.read_cursor()
    cur["sip_inflight"] = [101, 102]
    cur["last_snapshot_id"] = 101
    indexer._write_cursor(cur)
    indexer.sip_snapshots(spark, "wh.db.pages")
    assert indexer.read_cursor()["last_snapshot_id"] == 102
    meta = indexer.finalize(spark)
    assert meta.n_docs == 20
    assert meta.n_shards == 2

    # micro-batch cursor writes preserve the sip pin (review fix)
    with open(indexer.cursor_path) as f:
        assert json.load(f)["last_snapshot_id"] == 102


def test_load_corpus_session_catalog_table(spark, paged_corpus):
    """The TABLE branch of load_corpus resolves through the real session
    catalog (``spark.read.table``) — exercised here with a temp view, the
    catalog surface that exists without any Iceberg jar. The snapshot
    options are Iceberg-only and must be rejected for parquet paths but
    pass through .table() untouched."""
    import pytest as _pytest

    from miru_spark import sources

    root, texts = paged_corpus
    seg0 = os.path.join(root, sorted(os.listdir(root))[0])
    spark.read.parquet(seg0).createOrReplaceTempView("pages_view")
    try:
        got = sources.load_corpus(spark, "pages_view")
        assert got.count() == 10
        assert sources.is_table_identifier("pages_view")
        assert not sources.is_table_identifier(seg0)
        # snapshot options demand the table branch
        with _pytest.raises(ValueError, match="catalog table"):
            sources.load_corpus(spark, seg0, snapshot_id=1)
        # non-Iceberg relation: snapshot-capability probe answers None,
        # never raises (callers treat it as "not snapshot-capable")
        assert sources.current_snapshot_id(spark, "pages_view") is None
    finally:
        spark.catalog.dropTempView("pages_view")


def _iceberg_catalog_name(spark):
    """First configured Iceberg catalog (spark.sql.catalog.<name> set to
    an Iceberg SparkCatalog class), or None — the runtime-detection gate
    (same pattern as the Pillow decoder: the capability is probed, never
    assumed; the sandbox ships no Iceberg jar so this test skips there
    and runs fully on a real cluster)."""
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3 \
                and "iceberg" in str(v).lower():
            return k.rsplit(".", 1)[1]
    return None


def test_sip_snapshots_real_iceberg_catalog(spark, tmp_path):
    """END-TO-END snapshot sip against a REAL Iceberg catalog when one
    is configured (skip-clean otherwise): two commits produce two
    snapshots; the first sip pins snapshot 1, the second reads ONLY the
    appended delta via start/end-snapshot-id, and the cursor tracks the
    pins — the same lifecycle the fake-based tests pin, with Iceberg's
    actual snapshot metadata and incremental read path."""
    import pytest as _pytest

    from miru_spark import sources
    from miru_spark.streaming.ingest import StreamingIndexer

    cat = _iceberg_catalog_name(spark)
    if cat is None:
        _pytest.skip("no Iceberg catalog configured (spark.sql.catalog.*)")
    tbl = f"{cat}.default.miru_sip_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"CREATE TABLE {tbl} (url STRING, text STRING) USING iceberg")
    try:
        spark.sql(
            f"INSERT INTO {tbl} VALUES ('u1', 'spark join'), ('u2', 'scan merge')")
        s1 = sources.current_snapshot_id(spark, tbl)
        assert s1 is not None
        idx = str(tmp_path / "idx")
        indexer = StreamingIndexer(idx, block_bits=6)
        r1 = indexer.sip_snapshots(spark, tbl)
        assert r1["status"] == "indexed" and r1["snapshot_id"] == s1
        assert indexer.sip_snapshots(spark, tbl)["status"] == "no-op"
        spark.sql(f"INSERT INTO {tbl} VALUES ('u3', 'spark sort')")
        s2 = sources.current_snapshot_id(spark, tbl)
        r2 = indexer.sip_snapshots(spark, tbl)
        assert r2 == {"status": "indexed", "snapshot_id": s2,
                      "start_snapshot_id": s1}
        assert indexer.finalize(spark).n_docs == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
