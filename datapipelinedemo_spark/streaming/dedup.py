"""Streaming deduplication with bounded state.

Exactly-once-style ingest dedup for a training-data firehose: drop
repeats of the same key arriving within the watermark delay. Plain
``dropDuplicates`` on a stream keeps EVERY key forever — unbounded
state, guaranteed OOM on a 100 TB firehose;
``dropDuplicatesWithinWatermark`` expires each key's entry once the
watermark passes it, so state is bounded by (arrival rate × delay).

The contract (and why it is the right one for ingest): duplicates
arriving within ``delay`` of the first copy are dropped; a copy
arriving later than the watermark may be re-emitted — late-duplicate
suppression beyond the horizon belongs to a batch compaction pass
(operators/dedup.py), not to stream state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    delay: str = "2 hours",
) -> DataFrame:
    """Keep the first arrival per key; state for a key is dropped once
    the event-time watermark moves ``delay`` past it."""
    keys = keys or ["user_id", "event_type", ts_col]
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        keys
    )
