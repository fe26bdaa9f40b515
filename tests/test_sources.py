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
