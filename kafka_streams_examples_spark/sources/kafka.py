"""Kafka source/sink configuration (SURVEY §2.1 S1/S5/S6/S12).

The reference consumes/produces Kafka topics with Avro payloads and SSL
options (SecureKafkaStreamsExample.java:166-175). Spark's Kafka connector
takes the same client configs under the `kafka.` prefix. Payload decoding
(S8) uses from_avro/from_json on the `value` column; per-record dynamic
topic routing (S6, EmailService.java:113-116) is a `topic` column on the
sink side — both expressed here as plan builders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source_options(bootstrap_servers: str, topics: str,
                         starting_offsets: str = "earliest",
                         ssl: dict | None = None) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
    }
    if ssl:
        # SecureKafkaStreamsExample.java:166-175 — same keys, kafka. prefix
        opts.update({
            "kafka.security.protocol": ssl.get("security.protocol", "SSL"),
            "kafka.ssl.truststore.location": ssl.get("ssl.truststore.location", ""),
            "kafka.ssl.truststore.password": ssl.get("ssl.truststore.password", ""),
            "kafka.ssl.keystore.location": ssl.get("ssl.keystore.location", ""),
            "kafka.ssl.keystore.password": ssl.get("ssl.keystore.password", ""),
            "kafka.ssl.key.password": ssl.get("ssl.key.password", ""),
        })
    return opts


def kafka_source(spark: SparkSession, bootstrap_servers: str, topics: str,
                 value_schema: str | None = None,
                 streaming: bool = True, **kw) -> DataFrame:
    """Kafka records as (key string, value..., ts timestamp).

    With value_schema (a DDL string), the JSON payload is parsed into typed
    columns (S9); corrupt rows yield nulls and are dropped (S11).
    """
    reader = spark.readStream if streaming else spark.read
    reader = reader.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topics, **kw).items():
        reader = reader.option(k, v)
    raw = reader.load()
    out = raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("ts"),
    )
    if value_schema is not None:
        out = (out.withColumn("v", F.from_json("value", value_schema))
                  .filter(F.col("v").isNotNull())
                  .select("key", "v.*", "ts"))
    return out


def decode_kafka_avro_batch(df: DataFrame, avsc: str | dict,
                            confluent_framing: bool = True,
                            on_error: str = "fail",
                            schema_resolver=None) -> DataFrame:
    """Typed rows from a Kafka-source-shaped DataFrame (S1+S8 runtime path,
    broker-independent): `value` is (Confluent-framed) binary Avro, decoded
    by the pure-Python codec; Kafka metadata columns that exist on the
    input (key/topic/partition/offset/timestamp) ride along unchanged.

    schema_resolver (``schema_id -> avsc``) makes the frame header's
    schema id actually select the writer schema — the Schema Registry
    lookup path for topics carrying mixed schema versions; records are
    then projected onto `avsc` as the reader schema (see
    avro_codec.decode_avro_rows).

    This is the decode half of SpecificAvroIntegrationTest.java — the same
    DataFrame shape `spark.read.format("kafka")` produces, so it applies
    unmodified to a real source once a broker exists.
    """
    from .avro_codec import decode_avro_rows

    keep = tuple(c for c in ("key", "topic", "partition", "offset", "timestamp")
                 if c in df.columns)
    return decode_avro_rows(df, avsc, payload_col="value",
                            confluent_framing=confluent_framing,
                            keep_cols=keep, on_error=on_error,
                            schema_resolver=schema_resolver)


def encode_kafka_avro_batch(df: DataFrame, avsc: str | dict,
                            schema_id: int,
                            key_col: str | None = "key") -> DataFrame:
    """Kafka-sink-shaped (key, value) frame from typed rows: the value
    column is Confluent-framed binary Avro (S5 produce path,
    SpecificAvroIntegrationTest.java's write half). Feed the result to
    `writeStream.format("kafka")` with :func:`kafka_sink_options`; a
    `topic` column present on the input rides along for dynamic routing
    (S6)."""
    from .avro_codec import encode_avro_rows

    keep = tuple(c for c in (key_col, "topic")
                 if c is not None and c in df.columns)
    return encode_avro_rows(df, avsc, schema_id=schema_id, keep_cols=keep)


def kafka_sink_options(bootstrap_servers: str,
                       topic: str | None = None) -> dict[str, str]:
    """Sink options; omit `topic` when the DataFrame carries a per-row
    `topic` column (dynamic routing, S6)."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if topic is not None:
        opts["topic"] = topic
    return opts
