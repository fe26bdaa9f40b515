"""Interleaved A/B: r14-HEAD similarity.py (loaded as a sibling module)
vs the r15 selectExpr-construction rewrite. ABAB, min-of-4 noop walls."""
import os, sys, time
sys.path.insert(0, ".")
import kafka_streams_examples_spark.operators.similarity as NEW
import kafka_streams_examples_spark.operators._old_sim_r15ab as OLD
import kafka_streams_examples_spark.operators.similarity as S
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark

SWAP = [n for n in dir(NEW) if not n.startswith("__") and callable(getattr(NEW, n))
        and n in dir(OLD) and getattr(getattr(OLD, n), "__module__", "").endswith("_old_sim_r15ab")]
NEW_ATTRS = {n: getattr(NEW, n) for n in SWAP}
OLD_ATTRS = {n: getattr(OLD, n) for n in SWAP}

def set_arm(arm):
    src = OLD_ATTRS if arm == "old" else NEW_ATTRS
    for n, fn in src.items():
        setattr(S, n, fn)

def main():
    names = sys.argv[1:] or ["kmeans_train", "pq_knn", "knn_ivfpq",
                             "knn_ivf_trained", "cluster_sample",
                             "semantic_dedup"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-trainers", cpus=32, shuffle_partitions=32)
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()
    for _ in range(2):
        QUERIES["tpch_q1"].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"swapping {len(SWAP)} symbols", flush=True)
    for name in names:
        walls = {"old": [], "new": []}
        for rep in range(4):
            for arm in ("old", "new"):
                set_arm(arm)
                t0 = time.time()
                QUERIES[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
                walls[arm].append(time.time() - t0)
        set_arm("new")
        o, n = min(walls["old"]), min(walls["new"])
        print(f"{name}: old={['%.2f' % w for w in walls['old']]} "
              f"new={['%.2f' % w for w in walls['new']]} "
              f"min old={o:.2f} new={n:.2f} speedup={o/n:.2f}x", flush=True)

if __name__ == "__main__":
    main()
