"""Skew mitigation: salted join equivalence, hot-key capping."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.operators.skew import (
    drop_hot_keys, key_frequencies, salted_join,
)


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = (table(spark, sf_dir, "part")
            .select(F.col("p_partkey").alias("l_partkey"), "p_brand"))
    plain = li.join(part, ["l_partkey"]).groupBy("p_brand") \
              .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    salted = salted_join(li, part, ["l_partkey"], salt=8) \
        .groupBy("p_brand") \
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k int, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    out = salted_join(big, small, ["k"], how="left", salt=4).collect()
    got = {(r["k"], r["w"]) for r in out}
    assert got == {(1, "x"), (2, "y"), (99, None)}


def test_drop_hot_keys_bounds_df(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("user_id")
    capped = drop_hot_keys(ev, ["user_id"], max_df=30)
    freqs = key_frequencies(capped, ["user_id"]).agg(F.max("df")).first()[0]
    assert freqs is None or freqs <= 30
    # hot keys are removed entirely, not truncated
    hot_before = key_frequencies(ev, ["user_id"]).filter(F.col("df") > 30).count()
    assert hot_before > 0  # fixture actually exercises the path
