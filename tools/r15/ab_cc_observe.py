"""Interleaved A/B: old CC loop (lazy ckpt + separate agg-collect per
round) vs new (observe-fused eager ckpt, one job per round). Same
session, ABAB order, min-of-N per arm — the only wall comparison this
box's noise floor respects. Old implementation is reconstructed here
verbatim from r14 HEAD (f95beb4)."""
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import kafka_streams_examples_spark.operators.dedup as D
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark

NEW_CC = D.connected_components


def old_cc(edges, nodes, src_col="d1", dst_col="d2", id_col="doc_id",
           max_iterations=50, algorithm="propagation"):
    if algorithm == "star":
        return D.connected_components_star(edges, nodes, src_col, dst_col,
                                           id_col, max_iterations)
    sym = (edges.select(F.col(src_col).alias("src"),
                        F.col(dst_col).alias("dst"))
                .union(edges.select(F.col(dst_col).alias("src"),
                                    F.col(src_col).alias("dst")))
                .localCheckpoint(eager=False))
    labels = (sym.select(F.col("src").alias("node"))
                 .distinct()
                 .select("node", F.col("node").cast("long").alias("lbl")))
    labels = labels.localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    for _ in range(max_iterations):
        msgs = (sym.join(labels, sym["src"] == labels["node"])
                   .select(F.col("dst").alias("node"), F.col("lbl")))
        new_labels = (labels.union(msgs)
                            .groupBy("node").agg(F.min("lbl").alias("lbl"))
                            .localCheckpoint(eager=False))
        new_sum = new_labels.agg(F.sum("lbl")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return (nodes.select(F.col(id_col))
                 .join(labels, nodes[id_col] == labels["node"], "left")
                 .select(F.col(id_col),
                         F.coalesce(F.col("lbl"), F.col(id_col).cast("long"))
                          .alias("cluster_id")))


def main():
    names = sys.argv[1:] or ["dedup_clusters", "soft_dedup", "semantic_prune"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-cc", cpus=32, shuffle_partitions=32)
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()
    for _ in range(2):
        QUERIES["tpch_q1"].spark(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
    for name in names:
        walls = {"old": [], "new": []}
        for rep in range(4):
            for arm, impl in (("old", old_cc), ("new", NEW_CC)):
                D.connected_components = impl
                t0 = time.time()
                df = QUERIES[name].spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                walls[arm].append(time.time() - t0)
        D.connected_components = NEW_CC
        o, n = min(walls["old"]), min(walls["new"])
        print(f"{name}: old={['%.2f' % w for w in walls['old']]} "
              f"new={['%.2f' % w for w in walls['new']]} "
              f"min old={o:.2f} new={n:.2f} speedup={o / n:.2f}x", flush=True)


if __name__ == "__main__":
    main()
