"""Inbox read/unread tracking — miru's per-stream unread bitmaps as a
DataFrame recipe.

Reference: READ/UNREAD/MARK_ALL_READ records in the read WAL fold
sequentially into a per-stream unread bitmap
(``miru-api/.../activity/MiruPartitionedActivity.java:17-19``;
``miru-plugin/.../backfill/MiruReadTracker.java:21-76`` — read/unread
apply ``filter AND ts <= markTime`` masks, markAllRead applies the pure
time mask; ``AmzaInboxReadTracker.java:60-98`` replays marks in WAL
order). Docs are unread by default (JIT backfill ORs new activity into
the unread bitmap, ``MiruJustInTimeBackfillerizer.java``).

Spark recipe: the sequential fold is order-free once restated per doc —
the doc's read state is decided by the **latest mark covering it**
(marks later in the WAL overwrite earlier ones for the docs they cover).
So: broadcast-join events to their covering marks, take the argmax by
(mark_ts, priority), default unread. One shuffle (the groupBy); the
marks side is a per-user trickle, always broadcastable.

Mark rows: ``(user, mark ∈ read|unread|mark_all_read, target_id
nullable, up_to_ts nullable, mark_ts)``. A mark covers an event of the
same user when ``target_id == event_id`` (targeted) or, for untargeted
marks, when ``event_ts <= up_to_ts`` (the reference's time mask;
``up_to_ts`` null means mark_ts — "everything so far").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tie-break at equal mark_ts: unread wins over read wins over
# mark_all_read (conservative: a simultaneous explicit unread survives)
_PRIORITY = {"mark_all_read": 0, "read": 1, "unread": 2}


def resolve_read_state(
    events: DataFrame,
    marks: DataFrame,
    *,
    user_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-event read state. Columns: <user_col>, <id_col>, <ts_col>, read.

    ``read`` is true iff the latest covering mark is read/mark_all_read;
    events no mark covers are unread (the reference's default state).
    """
    ev = events.select(
        F.col(user_col).alias("user"), F.col(id_col).alias("eid"), F.col(ts_col).alias("ets")
    )
    mk = marks.select(
        F.col("user"),
        F.col("mark"),
        F.col("target_id"),
        F.coalesce(F.col("up_to_ts"), F.col("mark_ts")).alias("up_to_ts"),
        F.col("mark_ts"),
    )
    prio = F.create_map(
        *[x for k, v in sorted(_PRIORITY.items()) for x in (F.lit(k), F.lit(v))]
    )[F.col("mark")]
    covers = (
        (F.col("m.target_id").isNotNull() & (F.col("m.target_id") == F.col("e.eid")))
        | (F.col("m.target_id").isNull() & (F.col("e.ets") <= F.col("m.up_to_ts")))
    )
    joined = (
        ev.alias("e")
        .join(F.broadcast(mk.alias("m")), (F.col("e.user") == F.col("m.user")) & covers, "left")
        .select(
            F.col("e.user").alias("user"),
            F.col("e.eid").alias("eid"),
            F.col("e.ets").alias("ets"),
            F.when(
                F.col("m.mark").isNotNull(),
                F.struct(F.col("m.mark_ts").alias("mts"), prio.alias("prio"), F.col("m.mark").alias("mark")),
            ).alias("applied"),
        )
    )
    winner = (
        joined.groupBy("user", "eid", "ets")
        .agg(F.max("applied").alias("w"))
        .select(
            F.col("user").alias(user_col),
            F.col("eid").alias(id_col),
            F.col("ets").alias(ts_col),
            (F.col("w").isNotNull() & F.col("w.mark").isin("read", "mark_all_read")).alias("read"),
        )
    )
    return winner


def unread_counts(
    events: DataFrame,
    marks: DataFrame,
    *,
    user_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Unread events per user (the inbox badge). Columns: <user_col>,
    n_unread — ordered by user."""
    state = resolve_read_state(events, marks, user_col=user_col, id_col=id_col, ts_col=ts_col)
    return (
        state.filter(~F.col("read"))
        .groupBy(user_col)
        .agg(F.count(F.lit(1)).alias("n_unread"))
        .orderBy(user_col)
    )
