"""Streaming deduplication — the pipeline-facing extension of the
batch dedup family (queries/dedup.py) for continuous ingest.

Two shapes, both state-bounded by a watermark so the dedup state
can't grow without limit on an unbounded stream (the property that
matters at 100 TB/day ingest):

- `dedup_stream_exact`: drop exact re-deliveries of the same record
  key within the watermark horizon (dropDuplicatesWithinWatermark —
  state is evicted once the watermark passes, unlike plain
  dropDuplicates whose state grows forever).
- `dedup_stream_content`: fingerprint the payload (xxhash64 of
  normalized text) and drop rows whose CONTENT was already seen in
  the horizon — near-real-time exact-dedup over document streams;
  the content hash is the same normalization the batch exact_dedup
  oracle pins.

Both are pure built-ins (no Python state), so the streaming plan
stays JVM-side with RocksDB/HDFS-backed keyed state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_text(col):
    # mirror queries/dedup.py exact_dedup normalization: lowercase,
    # collapse whitespace
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def dedup_stream_exact(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first delivery of each key within the watermark
    horizon; re-deliveries (at-least-once sources) are dropped.
    State per key is evicted at the watermark — bounded memory."""
    key_cols = key_cols or ["event_id"]
    out = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    if out.isStreaming:
        return out.dropDuplicatesWithinWatermark(key_cols)
    return out.dropDuplicates(key_cols)


def dedup_stream_content(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-level streaming dedup: normalized-text fingerprint,
    first-seen wins inside the watermark horizon."""
    out = docs.withColumn("_fp", F.xxhash64(_norm_text(F.col(text_col))))
    if out.isStreaming:
        out = out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["_fp"])
    else:
        out = out.dropDuplicates(["_fp"])
    return out.drop("_fp")
