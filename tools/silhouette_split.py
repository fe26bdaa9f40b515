"""Stage-split decade instrumentation for label_silhouette (r10 verdict
task 4): the 4.19-4.33x sf1->sf10 step was consistent across two
artifacts, and SCALE10's sf10 row read 38.9x — explain which stage
grows and why, in fresh sessions per cell like tools/dedup_split.py.

The operator is two stages:

  centroids  centroids_from_labels — posexplode + (label, dim) regroup;
             O(n*dim), independent of k. Expected <=10x per 10x data.
  score      the scan-side fold: every vector scores all k centroids
             from a 1-row broadcast array; O(n*k*dim). The SCALE
             fixture grows k 10x PER DECADE (scale_data offsets labels
             per replica: k = 100 at sf1, 1000 at sf10), so this stage
             does 100x the work per decade BY FIXTURE CONSTRUCTION —
             a super-10x wall here is the fixture's k-growth, not a
             plan defect.
  score_fixed_k  the control that separates the two: both corpora
             scored against the SAME fixed taxonomy (labels mod 100 —
             the fixture's replica offsets are multiples of 100, so
             both SFs collapse to the identical 10 original labels).
             10x the data at the same k; the linear-plan hypothesis
             predicts ~10x of sf1's wall, not ~100x. MEASURED r11:
             2.86x per 10x — confirmed (SILSPLIT_r11.json).

Usage:  python tools/silhouette_split.py          # -> SILSPLIT_r11.json
        python tools/silhouette_split.py --sf1-only
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.operators.similarity import (
    centroids_from_labels, label_silhouette,
)
from kafka_streams_examples_spark.session import get_spark

SFS = [("sf1", ".scale/sf1"), ("sf10", ".scale/sf10")]


def _noop_count(df) -> tuple[float, int]:
    t0 = time.monotonic()
    n = df.count()
    return round(time.monotonic() - t0, 2), n


def split_silhouette(spark, sf_dir: str) -> dict:
    emb = table(spark, sf_dir, "embeddings")
    row: dict = {}

    # stage 1: centroid build, materialized eagerly so the score stage
    # reads blocks, not lineage
    t0 = time.monotonic()
    cents = centroids_from_labels(emb).localCheckpoint(eager=True)
    k = cents.count()
    row["centroids_sec"] = round(time.monotonic() - t0, 2)
    row["k"] = k

    # stage 2: scoring at the fixture's native k
    sec, n = _noop_count(label_silhouette(emb, cents=cents))
    row["score_sec"], row["rows"] = sec, n

    # control: same corpus, FIXED k=100 taxonomy (labels mod 100) —
    # separates data growth from the fixture's label-count growth
    fixed = emb.withColumn("label", F.col("label") % 100)
    t0 = time.monotonic()
    fcents = centroids_from_labels(fixed).localCheckpoint(eager=True)
    fk = fcents.count()
    row["fixed_centroids_sec"] = round(time.monotonic() - t0, 2)
    sec, n = _noop_count(label_silhouette(fixed, cents=fcents))
    row["score_fixed_k_sec"], row["fixed_k"] = sec, fk
    return row


def main() -> None:
    sfs = SFS[:1] if "--sf1-only" in sys.argv else SFS
    out = "SILSPLIT_r11.json"
    report: dict = {}
    if os.path.exists(out):
        with open(out) as f:
            report = json.load(f)
    report.setdefault(
        "method",
        "fresh session per (query, sf); stage 1 eager-localCheckpoints "
        "the centroid table so stage 2 times the broadcast+scan fold "
        "alone; score_fixed_k re-labels the same corpus mod 100 so both "
        "SFs score against the SAME k (the production fixed-taxonomy "
        "shape)")
    report.setdefault("loadavg_start", list(os.getloadavg()))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    report.setdefault("label_silhouette", {})
    for sf_name, sf_dir in sfs:
        spark = get_spark("silhouette-split")
        row = split_silhouette(spark, sf_dir)
        row["loadavg"] = list(os.getloadavg())
        report["label_silhouette"][sf_name] = row
        print(f"label_silhouette {sf_name}: {row}", flush=True)
        spark.stop()
    both = report["label_silhouette"]
    if "sf1" in both and "sf10" in both:
        r = {s: round(both["sf10"][f"{s}_sec"] / max(both["sf1"][f"{s}_sec"],
                                                     0.01), 2)
             for s in ("centroids", "score", "score_fixed_k")}
        report["ratios_sf1_to_sf10"] = r
        print("ratios:", r, flush=True)
    report["loadavg_end"] = list(os.getloadavg())
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
