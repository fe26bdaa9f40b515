"""Round-14: stage breakdown of ingest_funnel (guide §1 — find where the
17s actually goes). Each stage is timed with the noop sink on a warm
session, independently from parquet (no cross-stage caching), so the
numbers decompose the inline funnel's cost."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.operators import retrieval as R
from kafka_streams_examples_spark.operators import text as TX
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark


def t(spark, name, df_fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.time()
        spark.sparkContext.setJobDescription(name)
        df_fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.2f}  {name}", flush=True)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("funnel-breakdown", cpus=32, shuffle_partitions=32)
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()
    for _ in range(3):
        QUERIES["tpch_q1"].spark(spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()

    docs = table(spark, sf_dir, "documents")
    arriving = docs.filter(F.col("doc_id") % 10 == 7)
    existing = docs.filter(F.col("doc_id") % 10 != 7)

    t(spark, "full ingest_funnel",
      lambda: QUERIES["ingest_funnel"].spark(spark, sf_dir))
    t(spark, "boiler_codec(existing)",
      lambda: TX.boiler_codec(existing))
    t(spark, "nb_model(existing)",
      lambda: TX.nb_model(existing))
    t(spark, "bm25_gate_index(existing)",
      lambda: R.bm25_gate_index(existing, r_floor=128, keep_denom=None))
    t(spark, "postings(existing) only",
      lambda: R.postings(existing))

    boiler = TX.boiler_codec(existing).localCheckpoint(eager=True)
    model = TX.nb_model(existing).localCheckpoint(eager=True)
    index = R.bm25_gate_index(existing, r_floor=128,
                              keep_denom=None).localCheckpoint(eager=True)
    t(spark, "ingest_chain(arriving) [artifacts precomputed]",
      lambda: TX.ingest_chain(arriving, boiler, model))
    chain = TX.ingest_chain(arriving, boiler, model).localCheckpoint(eager=True)
    from kafka_streams_examples_spark.operators.retrieval import bm25_gate
    t(spark, "bm25_gate probe [chain precomputed]",
      lambda: bm25_gate(chain.select(F.col("doc_id"), "clean_text"),
                        index, 5.5, text_col="clean_text"))
    t(spark, "_gate_flags_with [artifacts precomputed]",
      lambda: TX._gate_flags_with(arriving, boiler, model, index, 5.5))
    t(spark, "tokenize existing (ws only)",
      lambda: existing.select(
          F.col("doc_id"),
          F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                   lambda x: x != "").alias("ws")))


if __name__ == "__main__":
    main()
