"""Streaming topologies mirroring the reference examples.

Each function takes a streaming DataFrame and returns the transformed
streaming DataFrame; sinks/output modes are chosen by the caller (tests use
memory sinks; production would use Kafka/parquet sinks).

Emission-mode contract (SURVEY §4.2): Kafka Streams with cache disabled
emits every update (update mode here); `suppress(untilWindowCloses)` emits
final results only (append mode + watermark here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tokens


def streaming_wordcount(lines: DataFrame, text_col: str = "text") -> DataFrame:
    """WordCountLambdaExample.java:185-208 — running counts, update mode."""
    return (lines.select(F.explode(tokens(text_col)).alias("word"))
                 .filter(F.col("word") != "")
                 .groupBy("word").count())


def windowed_counts(events: DataFrame, size: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """W1 tumbling counts with grace period = watermark (late rows beyond
    the watermark are dropped — TimeWindows grace semantics)."""
    return (events.withWatermark("ts", watermark)
                  .groupBy(F.window("ts", size), F.col("event_type"))
                  .agg(F.count("*").alias("n"))
                  .select(F.col("window.start").alias("window_start"),
                          "event_type", "n"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """W3 session windows with inactivity gap; append mode emits only the
    final merged session per key (SessionWindowsExample.java:163-171 —
    Spark's native merge behavior matches the reference's session merging)."""
    return (events.withWatermark("ts", watermark)
                  .groupBy(F.session_window("ts", gap), F.col("user_id"))
                  .agg(F.count("*").alias("n_events"),
                       F.round(F.sum("value"), 2).alias("session_value"))
                  .select(F.col("session_window.start").alias("session_start"),
                          "user_id", "n_events", "session_value"))


def interval_join_stream(left: DataFrame, right: DataFrame,
                         key: str, delta: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """J3 stream-stream windowed inner join with watermarks both sides.

    State size is bounded by the watermark: each side buffers only rows
    newer than (max event time - watermark) — identical to the reference's
    JoinWindows retention.
    """
    l = left.withWatermark("l_ts", watermark)
    r = right.withWatermark("r_ts", watermark)
    cond = ((l["l_key"] == r["r_key"])
            & (r["r_ts"] >= l["l_ts"])
            & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {delta}")))
    return l.join(r, cond, "inner")
