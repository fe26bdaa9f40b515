"""Source builders: CSV catalog, JSON-with-poison-pills, Kafka plan wiring."""

from __future__ import annotations

from kafka_streams_examples_spark.sources import (
    kafka_sink_options, kafka_source_options, read_csv_catalog,
    read_json_stream,
)


def test_csv_catalog(spark, tmp_path):
    p = tmp_path / "songs.csv"
    p.write_text(
        "id,album,artist,name,genre\n"
        "1,First,The Alphas,Opening,rock\n"
        "2,Second,Beta Band,Closing,jazz\n")
    df = read_csv_catalog(spark, str(p))
    rows = {r["id"]: r["genre"] for r in df.collect()}
    assert rows == {1: "rock", 2: "jazz"}
    assert dict(df.dtypes)["id"] == "bigint"


def test_json_poison_pills_dropped(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"user": "alice", "is_new": true}\n'
        'this is not json\n'
        '{"user": "bob", "is_new": false}\n')
    df = read_json_stream(spark, str(p), "user string, is_new boolean")
    rows = sorted(r["user"] for r in df.collect())
    assert rows == ["alice", "bob"]


def test_kafka_option_builders():
    src = kafka_source_options("broker:9092", "orders",
                               ssl={"ssl.truststore.location": "/tmp/ts.jks"})
    assert src["kafka.bootstrap.servers"] == "broker:9092"
    assert src["subscribe"] == "orders"
    assert src["kafka.security.protocol"] == "SSL"
    sink = kafka_sink_options("broker:9092", topic="out")
    assert sink["topic"] == "out"
    assert "topic" not in kafka_sink_options("broker:9092")


def test_avro_schema_mapping(spark):
    """S8: every Avro feature the reference's schemas use (SURVEY §1.2) —
    enums, nested records, nullable unions, field defaults — maps to the
    documented StructType shape, and data conforming to the schema loads."""
    from pyspark.sql import types as T
    from kafka_streams_examples_spark.sources.avro_schema import avro_to_struct

    avsc = """
    {"type": "record", "name": "EnrichedOrder", "fields": [
      {"name": "id", "type": "long"},
      {"name": "state", "type": {"type": "enum", "name": "OrderState",
                                 "symbols": ["CREATED", "VALIDATED", "FAILED"]}},
      {"name": "content", "type": ["string", "null"]},
      {"name": "flags", "type": ["null", "string"], "default": null},
      {"name": "level", "type": "string", "default": "bronze"},
      {"name": "product", "type": {"type": "record", "name": "Product", "fields": [
        {"name": "sku", "type": "string"},
        {"name": "price", "type": "double"}]}},
      {"name": "qty", "type": "int"}
    ]}"""
    st = avro_to_struct(avsc)
    assert st["state"].dataType == T.StringType()          # enum -> string
    assert st["content"].nullable and st["content"].dataType == T.StringType()
    assert st["flags"].nullable
    assert st["level"].metadata["avro_default"] == "bronze"
    assert isinstance(st["product"].dataType, T.StructType)
    assert st["product"].dataType["price"].dataType == T.DoubleType()
    assert st["qty"].dataType == T.IntegerType()
    # the derived schema is usable end-to-end
    row = (1, "VALIDATED", "ok", None, "gold", ("sku-1", 9.99), 2)
    df = spark.createDataFrame([row], st)
    got = df.collect()[0]
    assert got["state"] == "VALIDATED" and got["product"]["price"] == 9.99


def test_dynamic_routing_partitioned_sink(spark, tmp_path):
    """S6 dynamic topic routing (EmailService.java:113-116 routes per
    customer level): the Spark shape is a destination column + partitioned
    write — each branch lands in its own directory (= topic), one pass."""
    import os

    from pyspark.sql import functions as F

    out = str(tmp_path / "routed")
    df = spark.createDataFrame(
        [(1, "gold"), (2, "bronze"), (3, "gold"), (4, "silver")],
        "id long, level string")

    def route(batch, _epoch):
        batch.write.mode("append").partitionBy("level").parquet(out)

    src = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema("id long, level string").parquet(str(src))
    q = stream.writeStream.foreachBatch(route).start()
    q.processAllAvailable()
    q.stop()
    dirs = {d for d in os.listdir(out) if d.startswith("level=")}
    assert dirs == {"level=gold", "level=bronze", "level=silver"}
    gold = spark.read.parquet(out).filter(F.col("level") == "gold")
    assert {r["id"] for r in gold.collect()} == {1, 3}
