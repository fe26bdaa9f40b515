"""Round-15 optimization profiler: for each query, a noop-sink timing
(guide §1.4) plus the driver-side action trace that the r14 round showed
dominates the trainer/CC chains — every DataFrame.localCheckpoint /
collect / count call is timed and attributed to its caller file:line,
and the Spark job count per query is read from the status tracker via a
per-query job group. Usage:

    python tools/r15/profile_query.py <query> [query ...]

Prints one block per query: wall (min of N), job count, and the action
trace of the FIRST (cold-ish) run sorted by cost.
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from collections import defaultdict

sys.path.insert(0, ".")

try:  # Spark 4: classic instances shadow the pyspark.sql.DataFrame ABC
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:
    from pyspark.sql import DataFrame

from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark

TRACE: list[tuple[str, str, float]] = []
TRACING = False


def _wrap(name, fn):
    def wrapped(self, *a, **kw):
        if not TRACING:
            return fn(self, *a, **kw)
        t0 = time.time()
        out = fn(self, *a, **kw)
        dt = time.time() - t0
        # walk up past pyspark frames to the package caller
        site = "?"
        for fr in reversed(traceback.extract_stack()[:-1]):
            fp = fr.filename
            if "/pyspark/" not in fp and fp != __file__:
                site = f"{os.path.basename(fp)}:{fr.lineno}"
                break
        TRACE.append((name, site, dt))
        return out
    return wrapped


for _n in ("localCheckpoint", "collect", "count"):
    setattr(DataFrame, _n, _wrap(_n, getattr(DataFrame, _n)))


def main() -> None:
    global TRACING
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    spark = get_spark("profile-r15", cpus=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext
    # warmup — bench methodology
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()
    for _ in range(3):
        df = QUERIES["tpch_q1"].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
    for name in names:
        walls = []
        for i in range(reps):
            TRACE.clear()
            TRACING = True
            sc.setJobGroup(f"{name}#{i}", name)
            t0 = time.time()
            df = QUERIES[name].spark(spark, sf_dir)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            TRACING = False
            sc.setJobGroup(None, None)
            walls.append(wall)
            if i == 1:  # report the first WARM run (cold run is JIT-noisy)
                trace = list(TRACE)
                build = t_build
            jobs = len(sc.statusTracker().getJobIdsForGroup(f"{name}#{i}"))
            if i == 1:
                njobs = jobs
        agg = defaultdict(lambda: [0, 0.0])
        for op, site, dt in trace:
            agg[(op, site)][0] += 1
            agg[(op, site)][1] += dt
        print(f"\n=== {name}: wall={['%.2f' % w for w in walls]} "
              f"min={min(walls):.2f} build={build:.2f} jobs(warm)={njobs}")
        for (op, site), (n, tot) in sorted(agg.items(), key=lambda x: -x[1][1]):
            print(f"  {tot:6.2f}s  n={n:<3d} {op:16s} {site}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
