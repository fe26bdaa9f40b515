"""Feasibility probe: do Observation metrics fire when the observed
DataFrame is materialized by localCheckpoint(eager=True)?  If yes, the CC
loop can fuse its per-round convergence aggregate into the round's
checkpoint materialization: ONE job per round instead of ckpt+collect.
Also times both forms over the semantic_prune-like edge shape."""
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Observation
from pyspark.sql import functions as F

from kafka_streams_examples_spark.session import get_spark

spark = get_spark("observe-probe", cpus=32, shuffle_partitions=32)

df = spark.range(0, 100000).select(
    (F.col("id") % 1000).alias("node"),
    (F.col("id") % 97).cast("long").alias("lbl"))

# --- probe 1: does Observation fire on eager localCheckpoint?
obs = Observation("probe")
d2 = df.groupBy("node").agg(F.min("lbl").alias("lbl")).observe(
    obs, F.sum("lbl").alias("s"))
t0 = time.time()
d3 = d2.localCheckpoint(eager=True)
t_ck = time.time() - t0
try:
    t0 = time.time()
    got = obs.get
    t_get = time.time() - t0
    print(f"OBSERVE-ON-CKPT OK: {got} ckpt={t_ck:.3f}s get={t_get:.3f}s")
except Exception as e:  # noqa: BLE001
    print(f"OBSERVE-ON-CKPT FAILED: {type(e).__name__}: {e}")

# cross-check value
truth = d3.agg(F.sum("lbl")).collect()[0][0]
print(f"truth={truth}")

# --- probe 2: per-round cost, old form vs fused form, 10 rounds each
sc = spark.sparkContext


def old_round(labels):
    new_labels = labels.groupBy("node").agg(
        F.min("lbl").alias("lbl")).localCheckpoint(eager=False)
    s = new_labels.agg(F.sum("lbl")).collect()[0][0]
    return new_labels, s


def fused_round(labels):
    ob = Observation()
    new_labels = (labels.groupBy("node").agg(F.min("lbl").alias("lbl"))
                  .observe(ob, F.sum("lbl").alias("s"))
                  .localCheckpoint(eager=True))
    return new_labels, ob.get["s"]


base = df.localCheckpoint(eager=False)
base.count()

for name, fn in (("old", old_round), ("fused", fused_round)):
    lab = base
    t0 = time.time()
    for _ in range(10):
        lab, s = fn(lab)
    dt = time.time() - t0
    print(f"{name}: 10 rounds in {dt:.2f}s  ({dt/10*1000:.0f} ms/round) sum={s}")

spark.stop()
