"""Streaming micro-batch throughput for the smoke pipelines (BASELINE.md's
'record once implemented' item). Separate from bench.py — the driver
contract there is batch wall-clock; this reports streaming rows/sec.

Usage: python tools/stream_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.session import get_spark
from kafka_streams_examples_spark.streaming.core import run_to_memory, stream_table
from kafka_streams_examples_spark.streaming.pipelines import (
    session_counts, streaming_wordcount, windowed_counts,
)


def run(name, build, spark, sf_dir, rows_in):
    t0 = time.time()
    mode = "complete" if name == "wordcount" else "append"
    tbl, q = run_to_memory(build(), mode=mode)
    wall = time.time() - t0
    q.stop()
    return {"wall_sec": round(wall, 3),
            "rows_per_sec": round(rows_in / wall, 1)}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream-bench")
    n_docs = table(spark, sf_dir, "documents").count()
    n_events = table(spark, sf_dir, "events").count()
    out = {
        "wordcount": run("wordcount",
                         lambda: streaming_wordcount(stream_table(spark, sf_dir, "documents")),
                         spark, sf_dir, n_docs),
        "windowed_counts": run("windowed_counts",
                               lambda: windowed_counts(stream_table(spark, sf_dir, "events")),
                               spark, sf_dir, n_events),
        "session_counts": run("session_counts",
                              lambda: session_counts(stream_table(spark, sf_dir, "events")),
                              spark, sf_dir, n_events),
    }
    print(json.dumps({"metric": "streaming_smoke", "sf_dir": sf_dir, "pipelines": out}))


if __name__ == "__main__":
    main()
