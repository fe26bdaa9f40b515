"""Decade controls for the two super-10x sf1->sf10 rows in
SCALE10_r11.json — prove each is fixture construction, not a plan
defect, with the fixed-parameter control measured in fresh sessions
(the silhouette_split / dedup_split methodology).

incremental_knn (29.3x, 389s at sf10)
--------------------------------------
The registry query's "new day" batch is vec_id % 10 == 7 — 10% OF THE
CORPUS by design (day-over-day semantics: tomorrow's data scales with
the corpus). At fixed kclusters=8 the probed bucket also grows 10x per
decade, so serving flops = |new| * bucket = n^2 * nprobe / k — the
decade wall is the FIXED-k fixture parameter, chosen to keep the
recursive oracle tractable, not the plan (knn_ivf_trained, the
bounded-20-query shape on the same index code, reads 2.26x in the same
artifact). Production scales k with the corpus so buckets stay
constant-size (the cluster_sample doc's contract). Control:
``k_scaled`` re-runs sf10 with kclusters=80 — same bucket size as
sf1's k=8 — and the linear hypothesis predicts ~10x of sf1's wall
(10x queries x constant bucket), not ~30x.

unigram_encode (16.7x, 181s at sf10)
-------------------------------------
scale_data renames every token per replica (the injective suffix that
keeps dedup densities constant), so the VOCABULARY grows 10x per
decade — and the unigram trainer + word-memoized encoder are
vocabulary-scale by design (seed substring explosion, per-EM-round
Viterbi over distinct words, the per-word id map). A real corpus's
vocabulary grows far sublinearly (zipf). Controls: (a) stage split —
train (unigram_codec) vs encode (apply_unigram) at sf1/sf10; (b)
``fixed_vocab`` — an sf10-sized corpus built by replicating sf0.1
documents 100x WITHOUT the token rename (same 31-word vocabulary at
10x sf1's volume; generated into .scale/sf10_fv on first run), where
the linear hypothesis predicts ~10x of sf1's *corpus-scan* share and a
flat train share.

Usage: python tools/decade_controls.py    # -> DECADECTRL_r11.json
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

OUT = "DECADECTRL_r11.json"
FV_DIR = ".scale/sf10_fv"


def _timed(df) -> tuple[float, int]:
    t0 = time.monotonic()
    n = df.count()
    return round(time.monotonic() - t0, 2), n


def ensure_fixed_vocab_corpus(spark) -> None:
    if os.path.exists(os.path.join(FV_DIR, "documents.parquet")):
        return
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(100).select(F.col("id").alias("__r"))
    out = (base.crossJoin(reps)
               .select((F.col("doc_id") + F.col("__r") * 10_000_000)
                       .alias("doc_id"),
                       "text", "lang", "source", "n_chars"))
    out.write.mode("overwrite").parquet(
        os.path.join(FV_DIR, "documents.parquet"))
    print("built", FV_DIR, flush=True)


def split_incremental(sf_dir: str, kclusters: int) -> dict:
    from kafka_streams_examples_spark.operators import similarity as SIM
    spark = get_spark("decade-ctrl-knn")
    emb = table(spark, sf_dir, "embeddings")
    new = emb.filter(F.col("vec_id") % 10 == 7)
    corpus = emb.filter(F.col("vec_id") % 10 != 7)
    sec, n = _timed(SIM.incremental_knn(new, corpus, k=5, nprobe=2,
                                        kclusters=kclusters, iters=2))
    row = {"sec": sec, "rows": n, "kclusters": kclusters,
           "loadavg": list(os.getloadavg())}
    spark.stop()
    return row


def split_unigram(sf_dir: str) -> dict:
    from kafka_streams_examples_spark.operators import unigram as UNI
    spark = get_spark("decade-ctrl-uni")
    docs = table(spark, sf_dir, "documents")
    t0 = time.monotonic()
    codec = UNI.unigram_codec(docs).localCheckpoint(eager=True)
    train_sec = round(time.monotonic() - t0, 2)
    enc_sec, n = _timed(UNI.apply_unigram(docs, codec))
    vocab = (docs.select(F.explode(F.split(F.lower("text"), r"\s+"))
                         .alias("w"))
                 .filter(F.col("w") != "").distinct().count())
    row = {"train_sec": train_sec, "encode_sec": enc_sec, "rows": n,
           "distinct_words": vocab, "loadavg": list(os.getloadavg())}
    spark.stop()
    return row


def main() -> None:
    report: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    report.setdefault("method", (
        "fresh session per cell (dedup_split methodology); "
        "incremental_knn control scales kclusters with the corpus so "
        "bucket size matches sf1; unigram control replays sf10 volume "
        "at sf0.1's fixed 31-word vocabulary (.scale/sf10_fv)"))
    report.setdefault("loadavg_start", list(os.getloadavg()))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

    spark = get_spark("decade-ctrl-gen")
    ensure_fixed_vocab_corpus(spark)
    spark.stop()

    ik = report.setdefault("incremental_knn", {})
    for key, sf_dir, k in [("sf1_k8", ".scale/sf1", 8),
                           ("sf10_k80", ".scale/sf10", 80)]:
        if key not in ik:
            ik[key] = split_incremental(sf_dir, k)
            print(f"incremental_knn {key}: {ik[key]}", flush=True)
    ik.setdefault("sf10_k8_committed_sec", 389.37)   # SCALE10_r11.json
    if "sf1_k8" in ik and "sf10_k80" in ik:
        ik["ratio_const_bucket"] = round(
            ik["sf10_k80"]["sec"] / max(ik["sf1_k8"]["sec"], 0.01), 2)

    ug = report.setdefault("unigram_encode", {})
    for key, sf_dir in [("sf1", ".scale/sf1"), ("sf10", ".scale/sf10"),
                        ("sf10_fixed_vocab", FV_DIR)]:
        if key not in ug:
            ug[key] = split_unigram(sf_dir)
            print(f"unigram_encode {key}: {ug[key]}", flush=True)
    if "sf1" in ug and "sf10_fixed_vocab" in ug:
        ug["ratio_fixed_vocab_total"] = round(
            (ug["sf10_fixed_vocab"]["train_sec"]
             + ug["sf10_fixed_vocab"]["encode_sec"])
            / max(ug["sf1"]["train_sec"] + ug["sf1"]["encode_sec"], 0.01), 2)

    report["loadavg_end"] = list(os.getloadavg())
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
