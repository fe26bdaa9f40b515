"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once with a count-style action so the full plan runs
but collection overhead stays constant. A warmup query first absorbs JVM/
codegen startup so per-query numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark

# Headline set: one representative per operator family, weighted toward the
# scale-sensitive ones (joins, windows, dedup, ANN).
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "music_charts",
    "pageview_region",
    "order_validation",
    "wordcount",
    "fk_chain",
    "ktable_latest",
    "stream_stream_join",
    "asof_join",
    "session_windows",
    "hopping_6h",
    "topk_revenue",
    "dedup_ttl",
    "exact_dedup",
    "minhash_signature",
    "ngram_jaccard",
    "simhash",
    "knn_cosine",
    "embedding_near_dup",
    "quality_score",
    "media_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)

    # warmup: JVM + codegen + parquet footer caches
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()

    # two runs per query, keep the min: the second run hits warm parquet
    # footers/codegen caches, and min-of-2 strips machine-load spikes that
    # otherwise dominate run-to-run variance (~±40% observed)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = QUERIES[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
