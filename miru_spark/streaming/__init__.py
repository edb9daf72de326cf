from miru_spark.streaming.ingest import (
    StreamingIndexer,
    streaming_unread_counts,
    windowed_event_counts,
)

__all__ = ["StreamingIndexer", "streaming_unread_counts", "windowed_event_counts"]
