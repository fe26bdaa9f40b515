"""Cross-checks for the approximate operators that have no SQL oracle:
MinHash-LSH against exact Jaccard, and IVF ANN recall against brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.operators.dedup import (
    minhash_lsh_pairs, ngram_jaccard_pairs,
)
from kafka_streams_examples_spark.operators.similarity import (
    brute_force_knn, ivf_knn,
)


def test_lsh_pairs_subset_of_exact_with_high_recall(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    exact = {(r["d1"], r["d2"]) for r in
             ngram_jaccard_pairs(docs, n=3, threshold=0.2).collect()}
    lsh = {(r["d1"], r["d2"]) for r in
           minhash_lsh_pairs(docs, num_hashes=8, bands=4,
                             jaccard_threshold=0.2).collect()}
    # verification step guarantees precision: every LSH pair is a real pair
    assert lsh <= exact
    # banding (2 rows x 4 bands) at jac>=0.2 — recall is probabilistic but
    # must catch the clear duplicates (jac >= 0.5)
    strong = {(r["d1"], r["d2"]) for r in
              ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert strong <= lsh or len(strong) == 0


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    bf = brute_force_knn(queries, emb, k=5).collect()
    ivf = ivf_knn(queries, emb, k=5, nprobe=3).collect()
    bf_set = {(r["q_id"], r["c_id"]) for r in bf}
    ivf_set = {(r["q_id"], r["c_id"]) for r in ivf}
    recall = len(bf_set & ivf_set) / len(bf_set)
    # labels are weak clusters; nprobe=3/10 should still catch most true
    # neighbors — this guards against routing bugs, not ANN quality
    assert recall >= 0.3, f"recall {recall}"
    # exact self-consistency: ivf scores must equal brute-force scores for
    # overlapping pairs
    bf_scores = {(r["q_id"], r["c_id"]): r["cos_sim"] for r in bf}
    for r in ivf:
        k = (r["q_id"], r["c_id"])
        if k in bf_scores:
            assert abs(bf_scores[k] - r["cos_sim"]) < 1e-9


def test_ivf_partitioned_corpus_prunes_on_disk(spark, sf_dir, tmp_path):
    """The IVF scale path: corpus written partitioned by centroid id; a
    probe of 2 buckets must show partition pruning at the scan (only the
    probed directories are read) — this is what makes IVF skip >90% of a
    100 TB corpus on disk."""
    from kafka_streams_examples_spark.catalog import table

    emb = table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "corpus_by_centroid")
    emb.write.partitionBy("label").parquet(path)
    corpus = spark.read.parquet(path)
    probed = corpus.filter(F.col("label").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(label" in plan or "label#" in plan.split("PartitionFilters")[1][:80]
    # pruning is real: scanned row count equals the two buckets' rows
    want = emb.filter(F.col("label").isin([0, 1])).count()
    assert probed.count() == want


def test_simhash_hamming_pairs_pigeonhole_recall(spark, sf_dir):
    """Band-LSH must find EVERY pair within max_hamming (pigeonhole is a
    guarantee, not a probability): compare against the all-pairs truth on
    the real corpus, and check precision (no pair beyond the threshold)."""
    from kafka_streams_examples_spark.operators.dedup import (
        simhash, simhash_hamming_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    got = {(r["d1"], r["d2"]): r["hamming"]
           for r in simhash_hamming_pairs(docs, bits=32, bands=4,
                                          max_hamming=3).collect()}
    fps = {r["doc_id"]: r["simhash"]
           for r in simhash(docs, bits=32).collect()}
    ids = sorted(fps)
    truth = {}
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            h = bin(fps[d1] ^ fps[d2]).count("1")
            if h <= 3:
                truth[(d1, d2)] = h
    assert got == truth  # exact recall AND precision, distances included


def test_simhash_hamming_pairs_rejects_bad_banding(spark):
    import pytest as _pytest

    from kafka_streams_examples_spark.operators.dedup import simhash_hamming_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with _pytest.raises(ValueError):
        simhash_hamming_pairs(docs, bits=30, bands=4)
    with _pytest.raises(ValueError):
        simhash_hamming_pairs(docs, bits=32, bands=4, max_hamming=4)
