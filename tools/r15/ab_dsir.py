"""Interleaved A/B: dsir_score occurrence-stream form (r14,
reconstructed inline) vs per-(doc,source,bucket)-count form (r15).
ABAB, min-of-4 noop walls, one session; also asserts row parity."""
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.functions import (
    md5_hash64, stable_round, tokens, word_shingles,
)
from kafka_streams_examples_spark.operators.text import dsir_score
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark


def old_form(docs, target_sources=("src0", "src1", "src2", "src3", "src4"),
             buckets=4096, text_col="text", id_col="doc_id",
             group_col="source"):
    toks = F.filter(tokens(text_col), lambda x: x != "")
    bg = (docs.select(F.col(id_col), F.col(group_col).alias("__g"),
                      toks.alias("__toks"))
              .filter(F.size("__toks") >= 2)
              .select(F.col(id_col), "__g",
                      F.explode(word_shingles(F.col("__toks"), 2)).alias("b"))
              .select(F.col(id_col), "__g",
                      (md5_hash64(F.col("b")) % buckets).alias("__bk")))
    tgt = [str(s) for s in target_sources]
    per_bucket = (bg.groupBy("__bk")
                    .agg(F.count("*").alias("__r"),
                         F.sum(F.when(F.col("__g").isin(tgt), 1)
                                .otherwise(0)).alias("__t")))
    totals = per_bucket.agg(F.sum("__r").alias("__nr"),
                            F.sum("__t").alias("__nt"))
    B = float(buckets)
    ratio = (((F.col("__t") + 1).cast("double")
              * (F.col("__nr") + F.lit(B)))
             / ((F.col("__r") + 1).cast("double")
                * (F.col("__nt") + F.lit(B))))
    lr = (per_bucket.join(F.broadcast(totals), F.lit(True))
                    .select("__bk",
                            F.floor(F.log(ratio) * 1e6 + F.lit(0.5))
                             .cast("long").alias("__s6")))
    per_doc = (bg.join(F.broadcast(lr), "__bk")
                 .groupBy(id_col)
                 .agg(F.count("*").cast("long").alias("n_bigrams"),
                      stable_round(F.sum("__s6").cast("double")
                                   / (F.count("*") * 1e6), 4).alias("dsir")))
    return (docs.select(F.col(id_col))
                .join(per_doc, id_col, "left")
                .select(F.col(id_col),
                        F.coalesce("n_bigrams", F.lit(0)).cast("long")
                         .alias("n_bigrams"),
                        F.coalesce("dsir", F.lit(0.0)).alias("dsir")))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-dsir", cpus=32, shuffle_partitions=32)
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()
    for _ in range(2):
        QUERIES["tpch_q1"].spark(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
    docs = table(spark, sf_dir, "documents")
    a = {tuple(r) for r in old_form(docs).collect()}
    b = {tuple(r) for r in dsir_score(docs).collect()}
    assert a == b, f"ROW MISMATCH: {len(a)} vs {len(b)}"
    print(f"parity ok ({len(a)} rows)", flush=True)
    walls = {"old": [], "new": []}
    for rep in range(4):
        for arm in ("old", "new"):
            t0 = time.time()
            df = (old_form(table(spark, sf_dir, "documents"))
                  if arm == "old"
                  else QUERIES["dsir_score"].spark(spark, sf_dir))
            df.write.format("noop").mode("overwrite").save()
            walls[arm].append(time.time() - t0)
    o, n = min(walls["old"]), min(walls["new"])
    print(f"dsir_score: old={['%.2f' % w for w in walls['old']]} "
          f"new={['%.2f' % w for w in walls['new']]} "
          f"min old={o:.2f} new={n:.2f} speedup={o / n:.2f}x", flush=True)


if __name__ == "__main__":
    main()
