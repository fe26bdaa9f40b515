"""Standalone streaming-throughput run — the same pipelines bench.py times
in its "streaming" section (wordcount / windows / sessions / dedup /
stream-stream join replayed as file-stream micro-batches), runnable on its
own for quick iteration.

Usage: python tools/stream_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from bench import stream_bench
from kafka_streams_examples_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream-bench")
    out = stream_bench(spark, sf_dir)
    print(json.dumps({"metric": "streaming_smoke", "sf_dir": sf_dir,
                      "pipelines": out}))


if __name__ == "__main__":
    main()
