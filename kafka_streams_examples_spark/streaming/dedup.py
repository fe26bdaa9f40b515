"""Streaming event deduplication (SURVEY §2.6 T2).

Reference: EventDeduplicationLambdaIntegrationTest.java:84-158 — a
transformer with a WindowStore keyed by event id, TTL-purged. Spark ships
this natively: dropDuplicatesWithinWatermark keeps the first occurrence per
key and evicts state once the watermark passes the key's event time + the
watermark delay — the same TTL semantics, with state cleanup handled by the
engine instead of a manual punctuator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(events: DataFrame, keys: Sequence[str], ttl: str = "10 minutes",
                 ts_col: str = "ts") -> DataFrame:
    return (events.withWatermark(ts_col, ttl)
                  .dropDuplicatesWithinWatermark(list(keys)))
