"""Interleaved A/B: inline ingest_funnel probing the map-form
bm25_gate_index (r14) vs the narrow bm25_gate_postings (r15).
Also asserts row equality of the two funnel reports."""
import os, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
import kafka_streams_examples_spark.operators.text as TX
from kafka_streams_examples_spark.operators.retrieval import (
    bm25_gate_index, bm25_gate_postings,
)
from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark


def build(spark, sf_dir, narrow):
    docs = table(spark, sf_dir, "documents")
    arriving = docs.filter(F.col("doc_id") % 10 == 7)
    existing = docs.filter(F.col("doc_id") % 10 != 7)
    boiler = TX.boiler_codec(existing)
    model = TX.nb_model(existing)
    mk = bm25_gate_postings if narrow else bm25_gate_index
    index = mk(existing, r_floor=128, keep_denom=None)
    return TX._funnel_agg(TX._gate_flags_with(
        arriving, boiler, model, index, 5.5))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-funnel", cpus=32, shuffle_partitions=32)
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()
    for _ in range(2):
        QUERIES["tpch_q1"].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    a = [tuple(r) for r in build(spark, sf_dir, False).collect()]
    b = [tuple(r) for r in build(spark, sf_dir, True).collect()]
    assert a == b, f"MISMATCH {a} vs {b}"
    print(f"parity ok: {a}", flush=True)
    walls = {"old": [], "new": []}
    for rep in range(4):
        for arm, narrow in (("old", False), ("new", True)):
            t0 = time.time()
            build(spark, sf_dir, narrow).write.format("noop").mode("overwrite").save()
            walls[arm].append(time.time() - t0)
    o, n = min(walls["old"]), min(walls["new"])
    print(f"ingest_funnel: old={['%.2f' % w for w in walls['old']]} "
          f"new={['%.2f' % w for w in walls['new']]} "
          f"min old={o:.2f} new={n:.2f} speedup={o/n:.2f}x", flush=True)


if __name__ == "__main__":
    main()
