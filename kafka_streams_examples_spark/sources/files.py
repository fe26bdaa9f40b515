"""File-based ingest (SURVEY §2.1 S9/S10).

S10: the reference loads a CSV song catalog line-by-line
(KafkaMusicExampleDriver.java:69-77); here an explicit-schema CSV read.
S9: JSON lines parsed permissively; invalid rows dropped
(JsonToAvroExample.java:115-126).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SONG_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("album", T.StringType()),
    T.StructField("artist", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("genre", T.StringType()),
])


def read_csv_catalog(spark: SparkSession, path: str) -> DataFrame:
    """Explicit schema — never inferSchema in a production scan."""
    return spark.read.schema(SONG_SCHEMA).option("header", "true").csv(path)


def read_json_stream(spark: SparkSession, path: str, schema_ddl: str,
                     streaming: bool = False) -> DataFrame:
    """JSON lines with corrupt-record tolerance: parse each line with
    from_json; unparseable rows become null structs and are dropped (the
    poison-pill pattern, HandlingCorruptedInputRecordsIntegrationTest.java:79-99)."""
    reader = spark.readStream if streaming else spark.read
    raw = reader.text(path).select(F.col("value").alias("line"))
    # permissive from_json yields all-null structs for garbage; route the
    # raw line into a corrupt-record column and filter on it instead
    parsed = raw.withColumn(
        "v", F.from_json("line", schema_ddl + ", _corrupt string",
                         {"columnNameOfCorruptRecord": "_corrupt"}))
    return (parsed.filter(F.col("v._corrupt").isNull())
                  .select("v.*").drop("_corrupt"))
