"""Batch operator library (SURVEY.md §2).

Each module re-expresses a family of Kafka Streams DSL operators as
idiomatic Spark DataFrame compositions. Streaming counterparts live in
``kafka_streams_examples_spark.streaming``.
"""
