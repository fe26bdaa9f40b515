"""PySpark-native analytics engine with the query/data-processing surface of
Confluent's kafka-streams-examples (see SURVEY.md), rebuilt Spark-first.

Layout:
  session    — SparkSession factory tuned for local[32] and cluster scale
  catalog    — testdata table loaders (parquet)
  functions  — reusable Column expression helpers (tokenize, hashes, ...)
  operators  — batch operator library (ktable, windows, joins, topk, dedup,
               similarity, text, multimodal)
  streaming  — Structured Streaming counterparts (watermarks, stateful ops)
  registry   — the query registry: every SURVEY §2 operator as a
               (spark fn, duckdb oracle SQL) pair consumed by
               __spark_entry__.py, tests/ and bench.py
"""

__version__ = "0.1.0"
