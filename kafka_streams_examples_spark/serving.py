"""Interactive query layer (SURVEY §2.7 Q1-Q5).

The reference serves point/range/window lookups from RocksDB state stores
over REST, with cross-instance discovery (Q6). In a Spark engine the
materialized state IS a table (parquet/Delta sink or an in-memory view), so
the whole read path is Spark SQL — no store-location protocol needed.

StateStore wraps a materialized DataFrame with the store API the
reference's REST layer exposes (WordCountInteractiveQueriesRestService.java:83-172):
get / all / range / windowed fetch / session fetch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StateStore:
    def __init__(self, df: DataFrame, key_col: str):
        self.df = df
        self.key_col = key_col

    def get(self, key):  # Q1 store.get(key)
        return self.df.filter(F.col(self.key_col) == key).collect()

    def all(self) -> DataFrame:  # Q2 store.all()
        return self.df

    def range(self, lo, hi) -> DataFrame:  # Q3 store.range(from,to)
        return self.df.filter(F.col(self.key_col).between(lo, hi))

    def fetch_window(self, key, start, end,
                     window_col: str = "window_start") -> DataFrame:  # Q4
        return self.df.filter((F.col(self.key_col) == key)
                              & F.col(window_col).between(start, end))

    def fetch_sessions(self, key) -> DataFrame:  # Q5 session fetch per key
        return self.df.filter(F.col(self.key_col) == key)
