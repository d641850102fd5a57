"""Structured Streaming layer.

The reference has no streaming subsystem (SURVEY.md §2.13); its
closest analogs are the revision diff/DiffObserver change feed and
jn:open-revisions. Here:
- change_feed: batch CDC between revisions (parity);
- stream_ingest: readStream → foreachBatch commits into the
  VersionedStore (idiomatic Spark extra);
- windowed_event_counts: watermarked tumbling-window aggregation
  over an event stream (idiomatic extra).
"""

from sirix_spark.streaming.cdc import change_feed, stream_ingest, windowed_event_counts

__all__ = ["change_feed", "stream_ingest", "windowed_event_counts"]
