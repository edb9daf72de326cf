from miru_spark.streaming.ingest import StreamingIndexer, windowed_event_counts

__all__ = ["StreamingIndexer", "windowed_event_counts"]
