"""Interleaved A/B: _pq_fit_encode codes checkpoint on vs off, same
session, ABAB, min-of-4 noop walls for pq_knn and knn_ivfpq."""
import os
import sys
import time

sys.path.insert(0, ".")

import kafka_streams_examples_spark.operators.similarity as S
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-codes", cpus=32, shuffle_partitions=32)
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()
    for _ in range(2):
        QUERIES["tpch_q1"].spark(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
    for name in ("pq_knn", "knn_ivfpq"):
        walls = {"ckpt": [], "nockpt": []}
        for rep in range(4):
            for arm, flag in (("ckpt", True), ("nockpt", False)):
                S._CKPT_CODES = flag
                t0 = time.time()
                df = QUERIES[name].spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                walls[arm].append(time.time() - t0)
        S._CKPT_CODES = True
        a, b = min(walls["ckpt"]), min(walls["nockpt"])
        print(f"{name}: ckpt={['%.2f' % w for w in walls['ckpt']]} "
              f"nockpt={['%.2f' % w for w in walls['nockpt']]} "
              f"min ckpt={a:.2f} nockpt={b:.2f}", flush=True)


if __name__ == "__main__":
    main()
