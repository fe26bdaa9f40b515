"""Source/sink builders (SURVEY §2.1).

Batch/test mode reads parquet (catalog.py); streaming mode reads file
streams (streaming/core.py) or Kafka. Kafka itself is absent from this
environment, so the Kafka builders produce fully-configured reader/writer
plans that are exercised only up to .load()/.start() wiring in tests.
"""

from .kafka import kafka_sink_options, kafka_source, kafka_source_options  # noqa: F401
from .files import read_csv_catalog, read_json_stream  # noqa: F401
