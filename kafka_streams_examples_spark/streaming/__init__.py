"""Structured Streaming counterparts of the batch operators.

Every reference topology runs in two modes (SURVEY §7.1): batch (parquet →
DataFrame, DuckDB-verified) and streaming (file/Kafka stream → sink). This
package holds the streaming halves: watermarked windows, stateful
processors (applyInPandasWithState), dedup-within-watermark, and the
foreachBatch KTable upsert.
"""
