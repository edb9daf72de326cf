"""Structured-Streaming ingest: micro-batch incremental index shards.

Reference analogue: miru tails its activity WAL from a persisted sip
cursor in micro-batches and appends postings to the live partition
(reference: miru-service ``.../partition/MiruLocalHostedPartition.java:
304-312`` SipMigrateIndexRunnable; cursor ``miru-api/.../wal/
AmzaSipCursor.java:14-47``; BEGIN/END boundary records
``MiruPartitioner.java:145-151``).

Spark-first shape: ``readStream`` on the ingest table -> ``foreachBatch``
-> each micro-batch becomes ONE new index shard (built by the same
code path as the bulk builder), with

- deterministic dense docIds: the persisted cursor's next block-aligned
  base + ``row_number() over (order by url)`` within the batch — ids are
  stable under replay;
- block alignment: each batch starts at a fresh posting-block boundary so
  no block straddles shards (the bulk builder guarantees the same);
- idempotent replay: a shard manifest whose input fingerprint matches is
  skipped, so foreachBatch retries / restarts never double-index (the sip
  cursor semantic);
- additive stats: df/cf/N/avgdl merge across shards in ``finalize()``
  exactly as in the bulk build (disjoint doc ranges keep them exact).

At cluster scale each micro-batch is a bounded job over the new slice;
the cursor file is tiny driver-side state next to the index (on a real
deployment it lives with the checkpoint dir / Iceberg snapshot id).
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index.builder import BLOCK_BITS_DEFAULT, _build_wave, _finalize
from miru_spark.index.manifest import shard_is_done
from miru_spark.analysis.tokenizer import ANALYZER_VERSION
from miru_spark.index.schema import IndexSchema, enforce_additive


class StreamingIndexer:
    """foreachBatch sink that appends one index shard per micro-batch."""

    def __init__(
        self,
        index_dir: str,
        *,
        id_col: str = "doc_id",
        order_col: str = "url",
        text_col: str = "text",
        stored_cols: list[str] | None = None,
        block_bits: int = BLOCK_BITS_DEFAULT,
        use_stopwords: bool = False,
    ):
        self.index_dir = index_dir
        self.id_col = id_col
        self.order_col = order_col
        self.text_col = text_col
        self.stored_cols = stored_cols or []
        self.block_bits = block_bits
        self.use_stopwords = use_stopwords
        os.makedirs(index_dir, exist_ok=True)
        # additive-evolution guard (MiruSchema.checkAdditive analogue):
        # attaching a differently-configured indexer to an existing index
        # fails HERE, before the first micro-batch touches it
        enforce_additive(index_dir, IndexSchema(
            id_col=id_col, text_col=text_col, locale=None,
            use_stopwords=use_stopwords, block_bits=block_bits,
            keyword_fields={},
            stored_cols=sorted(c for c in self.stored_cols if c != id_col),
            analyzer_version=ANALYZER_VERSION,
        ))

    # -- cursor (sip analogue) -----------------------------------------
    @property
    def cursor_path(self) -> str:
        return os.path.join(self.index_dir, "cursor.json")

    def read_cursor(self) -> dict:
        if not os.path.exists(self.cursor_path):
            return {"n_shards": 0, "next_doc_id": 0}
        with open(self.cursor_path) as f:
            return json.load(f)

    def _write_cursor(self, cur: dict) -> None:
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
        os.replace(tmp, self.cursor_path)

    # -- foreachBatch --------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Index one micro-batch as a new shard. Safe under replay."""
        spark = batch_df.sparkSession
        n = batch_df.count()
        if n == 0:
            return
        cur = self.read_cursor()
        shard = cur["n_shards"]
        block_size = 1 << self.block_bits
        base = ((cur["next_doc_id"] + block_size - 1) // block_size) * block_size

        has_ids = self.id_col in batch_df.columns
        # fingerprint over the INPUT content (never over cursor-derived ids,
        # which shift between original run and replay)
        from miru_spark.index.builder import _input_fingerprint

        fp_key = self.id_col if has_ids else self.order_col
        fingerprint = f"batch={batch_id};" + _input_fingerprint(batch_df, fp_key, self.text_col)
        # sip-cursor semantics: a replayed micro-batch matches the manifest
        # of whichever shard it already became, regardless of position
        for done in range(cur["n_shards"]):
            if shard_is_done(self.index_dir, done, fingerprint):
                return

        if has_ids:
            docs = batch_df
        else:
            # deterministic dense ids within the batch: stable order_col sort
            from pyspark.sql import Window

            w = Window.orderBy(self.order_col)
            docs = batch_df.withColumn(
                self.id_col, (F.row_number().over(w) - 1 + F.lit(base)).cast("long")
            )
        bounds = docs.select(
            F.min(self.id_col).alias("lo"), F.max(self.id_col).alias("hi")
        ).collect()[0]
        lo, hi = int(bounds["lo"]), int(bounds["hi"])

        _build_wave(
            spark, docs, self.index_dir, {shard: (lo, hi)},
            id_col=self.id_col, text_col=self.text_col,
            stored=[c for c in self.stored_cols if c != self.id_col],
            block_bits=self.block_bits, use_stopwords=self.use_stopwords,
            fingerprints={shard: fingerprint},
        )
        # PRESERVE unknown cursor keys (e.g. sip_snapshots' pins): a
        # fresh dict here would drop last_snapshot_id on every
        # micro-batch, and a crash before the sip restamp would make
        # the next sip re-index the full snapshot as duplicates
        self._write_cursor({**cur, "n_shards": shard + 1,
                            "next_doc_id": hi + 1,
                            "last_batch_id": batch_id})

    def sip_snapshots(self, spark, table: str) -> dict:
        """Pull-based sip over Iceberg snapshots: index the delta between
        the cursor's last indexed snapshot and the table's current one,
        then advance the cursor (the reference's WAL sip cursor,
        ``AmzaSipCursor.java:14-47``, with the snapshot id as the
        cursor). First call (no pinned snapshot) indexes the current
        snapshot in full via time travel, so the pin is exact even if
        the table advances mid-build; later calls pass
        ``start-snapshot-id``/``end-snapshot-id`` so Iceberg reads ONLY
        the appended files. Idempotent: an unchanged snapshot no-ops.

        Crash-safe WAL discipline: the (start, end] delta is persisted
        as ``sip_inflight`` in the cursor BEFORE the batch runs, and a
        later sip REPLAYS a pending inflight delta with the exact same
        bounds first (the micro-batch fingerprint makes the replay a
        no-op when the shard already committed) — without this, a crash
        between the index commit and the cursor restamp would widen the
        next delta and re-index the already-committed range as
        duplicate docs.
        """
        from miru_spark import sources

        def _load(s0, e0):
            if s0 is None:
                return sources.load_corpus(spark, table, snapshot_id=int(e0))
            return sources.load_corpus(
                spark, table,
                start_snapshot_id=int(s0), end_snapshot_id=int(e0))

        def _commit(s0, e0):
            self.process_batch(_load(s0, e0), batch_id=int(e0))
            c = self.read_cursor()
            c["last_snapshot_id"] = int(e0)
            c.pop("sip_inflight", None)
            self._write_cursor(c)

        cur = self.read_cursor()
        if cur.get("sip_inflight"):
            s0, e0 = cur["sip_inflight"]
            _commit(s0, e0)
            cur = self.read_cursor()
        last = cur.get("last_snapshot_id")
        latest = sources.current_snapshot_id(spark, table)
        if latest is None:
            raise ValueError(
                f"{table!r} exposes no snapshots metadata table — "
                "snapshot sip needs an Iceberg(-like) catalog table")
        if last is not None and int(latest) == int(last):
            return {"status": "no-op", "snapshot_id": int(latest)}
        cur["sip_inflight"] = [
            int(last) if last is not None else None, int(latest)]
        self._write_cursor(cur)
        _commit(cur["sip_inflight"][0], latest)
        return {"status": "indexed", "snapshot_id": int(latest),
                "start_snapshot_id": int(last) if last is not None else None}

    def finalize(self, spark) -> "object":
        """Merge per-shard stats into the global dictionary + stats.json.

        Call after the stream drains (or periodically): queries see the
        index as of the last finalize — miru's ready-watermark semantic
        (``MiruIndexer.java:122-123``)."""
        cur = self.read_cursor()
        return _finalize(
            spark, self.index_dir, cur["n_shards"], self.block_bits,
            self.use_stopwords, f"streaming:{cur['n_shards']}",
        )

    def attach(self, stream_df: DataFrame):
        """``writeStream.foreachBatch`` wiring (caller starts/awaits)."""
        return stream_df.writeStream.foreachBatch(self.process_batch)


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_by: str | None = None,
) -> DataFrame:
    """Streaming tumbling-window counts with late-data watermarking — the
    streaming twin of the batch ``analytics.waveform`` (reference:
    ``Analytics.java:142-199`` bounded cardinalities per time segment;
    late/out-of-order input tolerated as in ``MiruTimeIndex.
    TimeOrderAnomalyStream:59-65``)."""
    # watermarking requires TIMESTAMP (tz-aware); NTZ sources cast in UTC
    src = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    )
    keys = [F.window(F.col(ts_col), window).alias("win")]
    if group_by:
        keys.append(F.col(group_by))
    return (
        src.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *([F.col(group_by)] if group_by else []),
            "n",
        )
    )


def streaming_unread_counts(
    stream_df: DataFrame,
    *,
    user_col: str = "user_id",
    kind_col: str = "kind",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Live per-user unread counters — the reference's realtime
    read-tracking as a custom stateful streaming operator.

    Reference: READ/UNREAD/MARK_ALL_READ records fold into per-stream
    unread bitmaps as they arrive (``AmzaInboxReadTracker.java:60-98``
    replays the read WAL; realtime delivery pushes ids,
    ``miru-api/.../realtime/MiruRealtimeDelivery.java``). The batch twin
    is ``operators/inbox.py``; here the fold is kept as *state* via
    ``applyInPandasWithState`` so each micro-batch updates counters
    instead of recomputing them.

    ``kind_col`` values: ``activity`` (+1 unread), ``read`` (-1, floor
    0), ``mark_all_read`` (reset to 0). Rows fold in ``ts_col`` order
    within each micro-batch (cross-batch order is arrival order, exactly
    the reference's WAL-replay discipline); pass ``tiebreak_col`` (e.g.
    an event id) to make the order total when timestamps can collide —
    without it, same-ts rows fold in post-shuffle arrival order, which
    Spark does not guarantee stable. Emits one row per user per
    micro-batch: (user, n_unread) in update mode.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdf_iter, state):
        (user,) = key
        n = state.get[0] if state.exists else 0
        frames = [pdf for pdf in pdf_iter if len(pdf)]
        if frames:
            whole = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
            sort_keys = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            whole = whole.sort_values(sort_keys, kind="stable")
            for kind in whole[kind_col]:
                if kind == "activity":
                    n += 1
                elif kind == "read":
                    n = max(0, n - 1)
                elif kind == "mark_all_read":
                    n = 0
        state.update((int(n),))
        yield pd.DataFrame({"user": [user], "n_unread": [int(n)]})

    return (
        stream_df.select(
            F.col(user_col).alias("user"), F.col(kind_col).alias(kind_col),
            F.col(ts_col).alias(ts_col),
            *([F.col(tiebreak_col)] if tiebreak_col else []),
        )
        .groupBy("user")
        .applyInPandasWithState(
            _update,
            outputStructType="user long, n_unread long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
