"""Testdata catalog: the driver's synthetic tables (TESTDATA.md).

Every loader is a plain ``spark.read.parquet`` — column pruning and filter
pushdown reach the scan because callers express projections declaratively on
the returned DataFrame (verify with ``df.explain``: ``ReadSchema`` /
``PushedFilters``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (region and
# nation are bounded by geography; in the reference these are the
# GlobalKTable sides — SURVEY §2.1 S3).
BROADCAST_TABLES = frozenset({"region", "nation"})


def _normalize_ntz(df: DataFrame) -> DataFrame:
    # The driver's vanilla session keeps Spark 4's default
    # spark.sql.parquet.inferTimestampNTZ.enabled=true, so parquet
    # timestamps (written without UTC adjustment) surface as TIMESTAMP_NTZ,
    # which time functions like unix_micros() reject. The engine's contract
    # is instant semantics in a UTC session, so the cast is value-exact.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Depending on session confs
        # Spark reads it either as int64 nanos (legacy.parquet.nanosAsLong,
        # honored only when set before the first parquet read) or natively
        # as TIMESTAMP_NTZ with nanos truncated to micros. Both paths below
        # end at a plain TIMESTAMP truncated exactly like DuckDB's
        # TIMESTAMP_NS -> TIMESTAMP coercion. The int64 `div` stays in
        # int64 — a double cast would lose precision above 2^53.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_ntz(df)
    return _normalize_ntz(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
