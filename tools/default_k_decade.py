"""r12 decade row for incremental_knn's DEFAULT composition (VERDICT
r11 item 3's done-clause): the auto-scaling codebook (kclusters=None ->
auto_kclusters ~ sqrt(n), the FAISS convention) measured at sf1 and
sf10 with NO bespoke control — the default itself must be the
scale-safe composition. Contrast rows carried from DECADECTRL_r11: the
never-re-sized k=8 default read 389s at sf10 (29x/decade, bucket grows
10x/decade); the fixture-matched k=80 control read 2.17x.

Fresh session per cell (dedup_split methodology). Writes
DECADECTRL_r12.json.

Usage: python tools/default_k_decade.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.session import get_spark

OUT = "DECADECTRL_r12.json"


def cell(sf_dir: str) -> dict:
    from kafka_streams_examples_spark.operators import similarity as SIM
    spark = get_spark("default-k-decade")
    emb = table(spark, sf_dir, "embeddings")
    new = emb.filter(F.col("vec_id") % 10 == 7)
    corpus = emb.filter(F.col("vec_id") % 10 != 7)
    k = SIM.auto_kclusters(corpus)
    t0 = time.monotonic()
    n = SIM.incremental_knn(new, corpus, k=5, nprobe=2,
                            kclusters=None, iters=2).count()
    sec = round(time.monotonic() - t0, 2)
    row = {"sec": sec, "rows": n, "auto_kclusters": k,
           "loadavg": [round(x, 2) for x in os.getloadavg()]}
    spark.stop()
    return row


def main() -> None:
    report: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    report.setdefault("method", (
        "incremental_knn with the r12 DEFAULT kclusters=None "
        "(auto_kclusters ~ sqrt(corpus)) at sf1 and sf10 — no control, "
        "the default composition graded directly; fresh session per "
        "cell; contrast rows from DECADECTRL_r11 (k8 default 389.37s "
        "at sf10 = 29x/decade; fixture-matched k80 control 2.17x)"))
    ik = report.setdefault("incremental_knn_default_k", {})
    for key, sf_dir in [("sf1", ".scale/sf1"), ("sf10", ".scale/sf10")]:
        if key not in ik:
            ik[key] = cell(sf_dir)
            print(f"default-k {key}: {ik[key]}", flush=True)
    if "sf1" in ik and "sf10" in ik:
        ik["decade_ratio"] = round(
            ik["sf10"]["sec"] / max(ik["sf1"]["sec"], 0.01), 2)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
