"""Co-located bucketed joins: the write-once-shuffle-never path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.sinks import write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", ["l_orderkey"], buckets=8,
                   path=str(tmp_path / "li_b"))
    write_bucketed(orders, "orders_b", ["o_orderkey"], buckets=8,
                   path=str(tmp_path / "orders_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join down the sort-merge path so bucketing is what's
        # being tested, not broadcast selection
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (spark.table("li_b")
                  .join(spark.table("orders_b"),
                        F.col("l_orderkey") == F.col("o_orderkey")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # and the result is still correct
        n = joined.count()
        want = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
                  .count())
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")
