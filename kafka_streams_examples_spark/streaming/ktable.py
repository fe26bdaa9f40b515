"""Streaming KTable materialization (SURVEY §2.1 S2, §4.2 item 1).

A KTable is latest-value-per-key with tombstone deletes. In streaming mode
we materialize it with foreachBatch MERGE-style upserts into a parquet state
table: per micro-batch, reduce the batch to its latest row per key, then
merge with the existing state (anti-join + union — the Delta-less MERGE,
SURVEY §7.2). The state table doubles as the interactive-query surface
(§2.7): point/range/window reads are plain Spark SQL against it.

At scale the state table would be a Delta/Iceberg table with MERGE INTO and
the upsert would be a shuffle on the key only for the (small) batch side.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ktable import latest_per_key


class KTableMaterializer:
    """foreachBatch sink maintaining latest-per-key state in parquet."""

    def __init__(self, spark: SparkSession, path: str, keys: Sequence[str],
                 ts_col: str = "ts", tiebreak: Sequence[str] = (),
                 tombstone_col: str | None = None):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.ts_col = ts_col
        self.tiebreak = list(tiebreak)
        self.tombstone_col = tombstone_col

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        # collapse the batch to latest-per-key first: shrinks the merge input
        latest = latest_per_key(batch, self.keys, self.ts_col, self.tiebreak)
        if os.path.exists(self.path):
            prev = self.spark.read.parquet(self.path)
            merged = latest_per_key(prev.unionByName(latest), self.keys,
                                    self.ts_col, self.tiebreak)
        else:
            merged = latest
        if self.tombstone_col is not None:
            merged = merged.filter(F.col(self.tombstone_col).isNotNull())
        # write-then-swap would be used on object stores; local overwrite ok
        merged.write.mode("overwrite").parquet(self.path + ".tmp")
        tmp = self.spark.read.parquet(self.path + ".tmp")
        tmp.write.mode("overwrite").parquet(self.path)

    # ---- interactive query surface (§2.7 Q1-Q3) ----

    def state(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def get(self, **key_values) -> list:
        df = self.state()
        for k, v in key_values.items():
            df = df.filter(F.col(k) == v)
        return df.collect()

    def range(self, key: str, lo, hi) -> DataFrame:
        return self.state().filter(F.col(key).between(lo, hi))
