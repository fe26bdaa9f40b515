"""Stage-split decade instrumentation for the three >=11x SCALE10 rows
(r9 verdict task 1): dedup_clusters, dedup_clusters_star, dedup_recall.

SCALE10_r09.json recorded 11.08x / 12.7x / 11.36x per 10x for these on a
loadavg-15 box; LEAKSPLIT_r09.json proved leakage_split's identical-looking
12.39x was a linear pair stage composed with cold-path CC. This tool does
the same for the remaining three: each composed query is broken into its
stages, each stage is materialized (eager localCheckpoint) and timed
separately at sf1 and sf10, so a super-linear STAGE — the only thing that
would threaten the 100 TB story — cannot hide inside a composed wall
number polluted by co-tenant load.

Stages:
  dedup_clusters       pairs (minhash LSH) | cc (min-label propagation)
  dedup_clusters_star  pairs (minhash LSH) | cc_star (large/small-star)
  dedup_recall         truth (exact n-gram Jaccard) | mh (minhash LSH)
                       | sim (simhash bit-band) | overlay (union+join+agg)

Usage:  python tools/dedup_split.py            # sf1 + sf10 -> DEDUPSPLIT_r10.json
        python tools/dedup_split.py --sf1-only # quick sanity pass
        python tools/dedup_split.py dedup_recall   # subset; merges into
                                                   # an existing artifact
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.operators import dedup as D
from kafka_streams_examples_spark.session import get_spark

SFS = [("sf1", ".scale/sf1"), ("sf10", ".scale/sf10")]


def _timed(df):
    """Materialize df (eager localCheckpoint) and return (checkpointed, sec,
    rows). Eager checkpoint = the stage's full compute happens HERE; the
    next stage reads the materialized blocks, not the lineage."""
    t0 = time.monotonic()
    cp = df.localCheckpoint(eager=True)
    n = cp.count()
    return cp, round(time.monotonic() - t0, 2), n


def split_clusters(spark, sf_dir: str, star: bool) -> dict:
    docs = table(spark, sf_dir, "documents")
    nodes, _, n_docs = _timed(docs.select("doc_id"))
    pairs_df = D.minhash_lsh_pairs(docs, num_hashes=8, bands=4,
                                   jaccard_threshold=0.2).select("d1", "d2")
    pairs, t_pairs, n_pairs = _timed(pairs_df)
    t0 = time.monotonic()
    cc = (D.connected_components_star(pairs, nodes) if star
          else D.connected_components(pairs, nodes))
    n_rows = cc.count()
    t_cc = round(time.monotonic() - t0, 2)
    return {"pairs_sec": t_pairs, "cc_sec": t_cc,
            "rows": n_docs, "n_pairs": n_pairs, "cc_rows": n_rows}


def split_recall(spark, sf_dir: str) -> dict:
    docs = table(spark, sf_dir, "documents")
    truth_df = D.ngram_jaccard_pairs(docs, n=3, threshold=0.2).select("d1", "d2")
    truth, t_truth, n_truth = _timed(truth_df)
    mh_df = D.minhash_lsh_pairs(docs, num_hashes=8, bands=4,
                                jaccard_threshold=0.2).select("d1", "d2")
    mh, t_mh, n_mh = _timed(mh_df)
    sim_df = D.simhash_hamming_pairs(docs, bits=32, bands=4,
                                     max_hamming=3).select("d1", "d2")
    sim, t_sim, n_sim = _timed(sim_df)
    t0 = time.monotonic()
    det = None
    for name, df in [("exact", truth), ("minhash_lsh", mh), ("simhash", sim)]:
        lab = df.select(F.lit(name).alias("detector"), "d1", "d2")
        det = lab if det is None else det.unionByName(lab)
    hits = det.join(truth.withColumn("__t", F.lit(1)), ["d1", "d2"], "left")
    out = (hits.groupBy("detector")
               .agg(F.count("*").alias("n_detected"),
                    F.sum(F.coalesce(F.col("__t"), F.lit(0))).alias("n_hits"))
               .collect())
    t_overlay = round(time.monotonic() - t0, 2)
    return {"truth_sec": t_truth, "mh_sec": t_mh, "sim_sec": t_sim,
            "overlay_sec": t_overlay, "n_truth": n_truth, "n_mh": n_mh,
            "n_sim": n_sim, "detectors": len(out)}


def main() -> None:
    sfs = SFS[:1] if "--sf1-only" in sys.argv else SFS
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = "DEDUPSPLIT_r10.json"
    report: dict = {}
    if wanted and os.path.exists(out):
        with open(out) as f:
            report = json.load(f)
    report.setdefault("method", "per-stage wall via eager localCheckpoint; "
                                "next stage reads materialized blocks; "
                                "fresh session per (query, sf) so checkpoint "
                                "blocks never crowd a later measurement")
    # setdefault: a subset re-run into an existing artifact must not
    # re-stamp the original queries' timings with the NEW run's start
    # load (per-run load lives in each row's "loadavg" anyway)
    report.setdefault("loadavg_start", list(os.getloadavg()))
    # the sf10 sim/truth pair tables checkpoint hundreds of MB; a shared
    # 8g-driver session OOM'd a later stage's broadcast build, so each
    # cell gets a fresh JVM-lite session (same app reuses the JVM via
    # getOrCreate only within a cell)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    for q, fn in [("dedup_clusters", lambda s, d: split_clusters(s, d, False)),
                  ("dedup_clusters_star", lambda s, d: split_clusters(s, d, True)),
                  ("dedup_recall", split_recall)]:
        if wanted and q not in wanted:
            continue
        report.setdefault(q, {})
        for sf_name, sf_dir in sfs:
            spark = get_spark("dedup-split")
            row = fn(spark, sf_dir)
            row["loadavg"] = list(os.getloadavg())
            report[q][sf_name] = row
            print(f"{q} {sf_name}: {row}", flush=True)
            spark.stop()
    report["loadavg_end"] = list(os.getloadavg())
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
