"""Round-15 optimization helper: capture `.explain("formatted")` for a
query list to plans/r15/<query>_<tag>.txt, plus a noop-sink timing per
query (guide §1.4) so plan capture and wall numbers come from the same
session. Usage:

    python tools/r14/capture_plans.py <tag> [query ...]

With no query list, captures the full bench HEADLINE set.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE
        names = list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("capture-plans", cpus=cpus, shuffle_partitions=cpus)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "plans", "r15")
    # warmup (JIT, committer) — the bench methodology
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()
    for _ in range(2):
        df = QUERIES["tpch_q1"].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
    timings = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"plan+time: {name}")
        df = QUERIES[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        best = None
        for _ in range(2):
            t0 = time.time()
            df = QUERIES[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"{name}\t{timings[name]}", flush=True)
    print("TOTAL", round(sum(timings.values()), 3))


if __name__ == "__main__":
    main()
