"""Interleaved A/B: dedup_recall with three independent tokenizes (r14
form, reconstructed inline) vs the shared materialized token relation
(r15). ABAB, min-of-4 noop walls, one session. Also settles VERDICT
item 2's 'did dedup_recall really regress' question in-session."""
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import kafka_streams_examples_spark.operators.dedup as D
from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.functions import stable_round
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark


def old_form(spark, sf):
    docs = table(spark, sf, "documents")
    truth = (D.ngram_jaccard_pairs(docs, n=3, threshold=0.2)
              .select("d1", "d2").localCheckpoint(eager=False))
    detectors = [
        ("exact", truth),
        ("minhash_lsh", D.minhash_lsh_pairs(
            docs, num_hashes=8, bands=4,
            jaccard_threshold=0.2).select("d1", "d2")),
        ("simhash", D.simhash_hamming_pairs(
            docs, bits=32, bands=4, max_hamming=3).select("d1", "d2")),
    ]
    det = None
    for name, df in detectors:
        lab = df.select(F.lit(name).alias("detector"), "d1", "d2")
        det = lab if det is None else det.unionByName(lab)
    nt = truth.count()
    hits = det.join(truth.withColumn("__t", F.lit(1)), ["d1", "d2"], "left")
    recall = (F.lit(0.0) if nt == 0 else
              stable_round(F.col("n_hits") / F.lit(nt).cast("double"), 4))
    return (hits.groupBy("detector")
                .agg(F.count("*").cast("long").alias("n_detected"),
                     F.sum(F.coalesce(F.col("__t"), F.lit(0)))
                      .cast("long").alias("n_hits"))
                .select("detector",
                        F.lit(nt).cast("long").alias("n_truth"),
                        "n_detected", "n_hits",
                        recall.alias("recall")))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-recall", cpus=32, shuffle_partitions=32)
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()
    for _ in range(2):
        QUERIES["tpch_q1"].spark(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
    walls = {"old": [], "new": []}
    for rep in range(4):
        for arm in ("old", "new"):
            t0 = time.time()
            df = (old_form(spark, sf_dir) if arm == "old"
                  else QUERIES["dedup_recall"].spark(spark, sf_dir))
            df.write.format("noop").mode("overwrite").save()
            walls[arm].append(time.time() - t0)
    o, n = min(walls["old"]), min(walls["new"])
    print(f"dedup_recall: old={['%.2f' % w for w in walls['old']]} "
          f"new={['%.2f' % w for w in walls['new']]} "
          f"min old={o:.2f} new={n:.2f} speedup={o / n:.2f}x", flush=True)


if __name__ == "__main__":
    main()
