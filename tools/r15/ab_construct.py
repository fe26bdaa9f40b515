"""Interleaved A/B for the r15 construction rewrites (gopher/NB/line
filter/boiler/postings as selectExpr parses): old modules loaded as
siblings (_old_text_r15ab/_old_ret_r15ab, git show dc69da6), the
touched symbols swapped into the LIVE modules per arm, ABAB min-of-4
noop walls. Same methodology as tools/r15/ab_trainers.py."""
import os
import sys
import time

sys.path.insert(0, ".")

import kafka_streams_examples_spark.operators.text as TX
import kafka_streams_examples_spark.operators.retrieval as RET
import kafka_streams_examples_spark.operators._old_text_r15ab as OT
import kafka_streams_examples_spark.operators._old_ret_r15ab as ORT
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark

TX_SYMS = ["gopher_rules", "_nb_base_tk", "_nb_weights",
           "apply_line_filter_chained", "apply_nb_chained", "boiler_codec"]
RET_SYMS = ["postings"]
NEW = {("tx", s): getattr(TX, s) for s in TX_SYMS}
NEW.update({("ret", s): getattr(RET, s) for s in RET_SYMS})
OLD = {("tx", s): getattr(OT, s) for s in TX_SYMS}
OLD.update({("ret", s): getattr(ORT, s) for s in RET_SYMS})


def set_arm(arm):
    src = OLD if arm == "old" else NEW
    for (mod, s), fn in src.items():
        setattr(TX if mod == "tx" else RET, s, fn)


def main():
    names = sys.argv[1:] or ["ingest_funnel", "bm25_topk"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-construct", cpus=32, shuffle_partitions=32)
    QUERIES["tpch_q1"].spark(spark, sf_dir).count()
    for _ in range(2):
        QUERIES["tpch_q1"].spark(spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()
    for name in names:
        walls = {"old": [], "new": []}
        for rep in range(4):
            for arm in ("old", "new") if rep % 2 == 0 else ("new", "old"):
                set_arm(arm)
                spark.sparkContext.setJobDescription(f"{name}:{arm}:{rep}")
                t0 = time.time()
                df = QUERIES[name].spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                walls[arm].append(time.time() - t0)
        set_arm("new")
        o, n = min(walls["old"]), min(walls["new"])
        print(f"{name}: old={[f'{w:.2f}' for w in walls['old']]} "
              f"new={[f'{w:.2f}' for w in walls['new']]} "
              f"min old={o:.2f} new={n:.2f} speedup={o / n:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
