"""Degenerate-input hardening: empty text, docs shorter than the shingle
width, unicode, single-row tables — the inputs that crash naive pipelines."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_examples_spark.operators import dedup as D
from kafka_streams_examples_spark.operators import text as TX
from kafka_streams_examples_spark.operators.similarity import brute_force_knn


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_and_empty_docs_survive_dedup_ops(spark):
    d = docs_df(spark, [
        (1, ""),                       # empty
        (2, "one"),                    # below shingle width
        (3, "two words"),              # still below n=3
        (4, "exactly three words"),    # one shingle
        (5, "exactly three words"),    # its exact dup
    ])
    sh = D.doc_shingles(d, n=3)
    assert {r["doc_id"] for r in sh.select("doc_id").distinct().collect()} == {4, 5}
    sigs = D.minhash_signatures(d, num_hashes=8, n=3)
    assert sigs.count() == 2
    # identical docs -> identical signatures
    vals = {tuple(r)[1:] for r in sigs.collect()}
    assert len(vals) == 1
    pairs = D.ngram_jaccard_pairs(d, n=3, threshold=0.5)
    got = [(r["d1"], r["d2"], r["jac"]) for r in pairs.collect()]
    assert got == [(4, 5, 1.0)]
    exact = D.exact_dedup_groups(d)
    dup_group = exact.filter(F.col("n_dupes") == 2).collect()
    assert len(dup_group) == 1 and dup_group[0]["keeper"] == 4


def test_unicode_tokenization_and_fingerprint(spark):
    d = docs_df(spark, [(1, "Grüße   aus   Köln"), (2, "grüße aus köln")])
    tc = TX.token_counts(d)
    assert {r["n_tokens"] for r in tc.collect()} == {3}
    # fingerprint normalizes case + whitespace -> the two rows collide
    fps = TX.fingerprint(d).select("fp").distinct()
    assert fps.count() == 1


def test_knn_single_row_corpus(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    out = brute_force_knn(emb.filter(F.col("vec_id") == 1), emb, k=5)
    rows = out.collect()
    assert len(rows) == 1  # self excluded, one candidate left
    assert rows[0]["c_id"] == 2 and abs(rows[0]["cos_sim"]) < 1e-9


def test_lang_id_handles_empty_text(spark):
    d = docs_df(spark, [(1, ""), (2, "the cat and the dog")])
    out = {r["doc_id"]: r["pred_lang"] for r in TX.with_lang_pred(d).collect()}
    assert out[1] == "en" and out[2] == "en"  # empty falls back to default
