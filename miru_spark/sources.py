"""Corpus source resolution — paths and catalog tables behind one call.

The north-star deployment reads Common-Crawl-style pages from an ICEBERG
table (url, warc_ts, html, text, lang) and writes index shards next to
it; this sandbox has no Iceberg runtime, so the layer is deliberately
catalog-AGNOSTIC: a table identifier resolves through the session
catalog (``spark.read.options(...).table(name)``), which is exactly how
Iceberg tables are consumed on a real cluster once
``spark.sql.catalog.<name>`` is configured — the snapshot options below
are Iceberg's own read options and pass through the catalog untouched
(other catalogs ignore them). Nothing in the engine depends on the
storage format beyond this module.

Iceberg mapping used by the build (reference lifecycle analogue:
miru's WAL sip cursor — ``AmzaSipCursor.java:14-47``):

- full rebuild: ``load_corpus(spark, "warehouse.db.pages")`` — the
  current snapshot; the per-shard manifest ``input_fingerprint`` pins
  the snapshot id, so a resume after a crash re-reads the SAME data.
- time travel: ``snapshot_id=`` / ``as_of_timestamp=`` reproduce any
  historical build bit-for-bit.
- incremental sip: ``start_snapshot_id=`` / ``end_snapshot_id=`` read
  only appended files between two snapshots; the streaming indexer's
  cursor is then the last indexed snapshot id (checkpointed with the
  shard manifests), and each micro-batch indexes one snapshot delta.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Iceberg read options (https://iceberg.apache.org/docs/latest/spark-queries/)
_SNAPSHOT_OPTS = {
    "snapshot_id": "snapshot-id",
    "as_of_timestamp": "as-of-timestamp",
    "start_snapshot_id": "start-snapshot-id",
    "end_snapshot_id": "end-snapshot-id",
}


def is_table_identifier(source: str) -> bool:
    """A catalog table name (``pages``, ``db.pages``,
    ``catalog.db.pages``) vs a filesystem path. Anything that exists on
    the local filesystem is a path (a bare relative parquet directory
    name carries no separator — existence, not shape, disambiguates);
    otherwise paths carry a separator or a parquet suffix and table
    identifiers never do."""
    if os.path.exists(source):
        return False
    return (
        os.sep not in source
        and "/" not in source
        and not source.lower().endswith(".parquet")
    )


def load_corpus(
    spark: SparkSession,
    source: str,
    *,
    fmt: str = "auto",
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
    start_snapshot_id: int | None = None,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """Resolve the input pages relation.

    ``fmt="auto"``: table identifiers go through the session catalog,
    anything path-like is read as parquet. ``fmt="table"`` /
    ``fmt="parquet"`` force either branch. Snapshot options require the
    table branch (they are meaningless for raw parquet and raise)."""
    if fmt == "auto":
        fmt = "table" if is_table_identifier(source) else "parquet"
    given = {
        "snapshot_id": snapshot_id,
        "as_of_timestamp": as_of_timestamp,
        "start_snapshot_id": start_snapshot_id,
        "end_snapshot_id": end_snapshot_id,
    }
    opts = {
        _SNAPSHOT_OPTS[name]: str(val)
        for name, val in given.items() if val is not None
    }
    if fmt == "parquet":
        if opts:
            raise ValueError(
                f"snapshot options {sorted(opts)} need a catalog table, "
                f"not a parquet path: {source!r}"
            )
        if os.path.exists(source):
            # the JVM resolves relative paths against ITS cwd, which can
            # differ from the Python driver's — absolutize local paths
            source = os.path.abspath(source)
        return spark.read.parquet(source)
    if fmt != "table":
        raise ValueError(f"unknown corpus format {fmt!r}")
    return spark.read.options(**opts).table(source)


def current_snapshot_id(spark: SparkSession, table: str) -> int | None:
    """Latest snapshot id of an Iceberg table, via its ``.snapshots``
    metadata table — the value the build lifecycle PINS (stats.json for
    bulk builds, cursor.json for snapshot sips) so a resume re-reads the
    same data and the next sip knows its ``start-snapshot-id``.

    Returns None when the catalog exposes no snapshots metadata (plain
    parquet, non-Iceberg tables) — callers treat that as
    "not snapshot-capable", never as an error."""
    try:
        rows = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows else None
    except Exception:  # noqa: BLE001 - no catalog / not Iceberg
        return None
