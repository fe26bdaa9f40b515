"""KTable semantics: latest-value-per-key over a changelog stream.

Reference: `builder.table(topic)` — UserRegionLambdaExample.java:125,
KafkaMusicExample.java:304-308 (SURVEY §2.1 S2). A KTable is "latest value
per key; null value = delete (tombstone)".

Spark-first design: a ranking window over (key) ordered by event time
descending. At 100 TB this is ONE hash shuffle on the key — the same cost
Kafka Streams pays via its repartition+changelog topics — and Spark's
window ranking is codegen'd. Skewed keys are handled by AQE skew-join
splitting downstream; the rank itself uses a partial top-1 per partition
(`row_number` + filter rn=1 is rewritten by Catalyst into a
WindowGroupLimit partial rank pushdown in Spark 3.5+, so each map task
pre-prunes to one candidate row per key before the shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame,
                   keys: Sequence[str],
                   ts_col: str = "ts",
                   tiebreak: Sequence[str] = (),
                   tombstone_col: str | None = None) -> DataFrame:
    """Materialize the latest row per key (the KTable view).

    tiebreak: extra columns to order by (desc) after ts for determinism.
    tombstone_col: if given, rows whose latest value IS NULL in this column
    are treated as deletes and dropped (Kafka Streams tombstone semantics,
    e.g. UserRegionLambdaExample.java:148).
    """
    order: list[Column] = [F.col(ts_col).desc()]
    order += [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if tombstone_col is not None:
        out = out.filter(F.col(tombstone_col).isNotNull())
    return out
