"""Interleaved A/B: unigram construction rewrites (backtrack/apply
selectExpr parses) vs the committed module."""
import os, sys, time
sys.path.insert(0, ".")
import kafka_streams_examples_spark.operators.unigram as U
import kafka_streams_examples_spark.operators._old_uni_r15ab as OU
from kafka_streams_examples_spark.registry import QUERIES
from kafka_streams_examples_spark.session import get_spark

SYMS = ["_backtrack", "segment_words", "unigram_word_table", "apply_unigram"]
NEW = {s: getattr(U, s) for s in SYMS}
OLD = {s: getattr(OU, s) for s in SYMS}

def set_arm(arm):
    for s, fn in (OLD if arm == "old" else NEW).items():
        setattr(U, s, fn)

names = sys.argv[1:] or ["unigram_encode"]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-uni", cpus=32, shuffle_partitions=32)
QUERIES["tpch_q1"].spark(spark, sf_dir).count()
for _ in range(2):
    QUERIES["tpch_q1"].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
for name in names:
    walls = {"old": [], "new": []}
    for rep in range(4):
        for arm in ("old", "new") if rep % 2 == 0 else ("new", "old"):
            set_arm(arm)
            t0 = time.time()
            QUERIES[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls[arm].append(time.time() - t0)
    set_arm("new")
    o, n = min(walls["old"]), min(walls["new"])
    print(f"{name}: old={[f'{w:.2f}' for w in walls['old']]} new={[f'{w:.2f}' for w in walls['new']]} min old={o:.2f} new={n:.2f} speedup={o/n:.2f}x", flush=True)

