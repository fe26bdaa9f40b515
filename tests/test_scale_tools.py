"""Guards for the sf1 scale harness (tools/scale_data.py): the curve in
SCALE_r{N}.json only measures the PLAN if the construction really is
density-preserving — these pin the three properties that make it so."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.fixture(scope="module")
def replica():
    from scale_data import _replica
    return _replica


def test_key_offsets_are_fk_consistent(spark, replica):
    from scale_data import STRIDE
    orders = spark.createDataFrame([(1, 10), (2, 11)],
                                   "o_orderkey long, o_custkey long")
    cust = spark.createDataFrame([(10,), (11,)], "c_custkey long")
    o2 = replica(orders, "orders", 3)
    c2 = replica(cust, "customer", 3)
    # replica 3's orders still join replica 3's customers 1:1
    assert o2.join(c2, o2.o_custkey == c2.c_custkey).count() == 2
    assert o2.agg({"o_orderkey": "min"}).first()[0] == 1 + 3 * STRIDE


def test_token_rename_preserves_within_replica_similarity(spark, replica):
    from kafka_streams_examples_spark.operators.dedup import minhash_lsh_pairs
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again today"),
         (2, "the quick brown fox jumps over the lazy dog again tomorrow"),
         (3, "completely unrelated text with different words entirely here")],
        "doc_id long, text string")
    base = {(r["d1"], r["d2"]) for r in minhash_lsh_pairs(
        docs, num_hashes=8, bands=4, jaccard_threshold=0.5).collect()}
    rep = replica(docs, "documents", 2)
    from scale_data import STRIDE
    got = {(r["d1"] - 2 * STRIDE, r["d2"] - 2 * STRIDE)
           for r in minhash_lsh_pairs(
               rep, num_hashes=8, bands=4, jaccard_threshold=0.5).collect()}
    # injective token rename: the renamed replica has EXACTLY the original
    # pair structure (shifted ids)
    assert got == base and (1, 2) in base
    # and cross-replica the near-dup pair does NOT appear (disjoint tokens)
    both = docs.unionByName(rep)
    cross = {(r["d1"], r["d2"]) for r in minhash_lsh_pairs(
        both, num_hashes=8, bands=4, jaccard_threshold=0.5).collect()}
    assert not any((a < STRIDE) != (b < STRIDE) for a, b in cross)


def test_embedding_shift_is_orthogonal(spark, replica):
    import numpy as np
    vecs = [(1, [float(i) for i in range(8)], 0),
            (2, [float(7 - i) for i in range(8)], 0)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>, label int")
    rep = replica(emb, "embeddings", 3)
    got = {r["vec_id"]: np.array(r["embedding"]) for r in rep.collect()}
    orig = {v[0]: np.array(v[1]) for v in vecs}
    from scale_data import STRIDE
    # circular shift: norms and pairwise dots preserved (orthogonal map)
    a, b = got[1 + 3 * STRIDE], got[2 + 3 * STRIDE]
    assert np.allclose(np.dot(a, b), np.dot(orig[1], orig[2]))
    assert np.allclose(np.linalg.norm(a), np.linalg.norm(orig[1]))
    # labels moved to a fresh block
    assert {r["label"] for r in rep.collect()} == {3000}


def test_token_rename_vocabulary_grows_sublinearly(spark, replica):
    """The r12 zipf-fixture property: replicas draw token tags from the
    SHARED ceil(R^(2/3)) pool, so the union vocabulary is bounded by
    V * (S + 1) — not the V * (R + 1) of the old per-replica rename —
    while still minting genuinely new words per decade."""
    from pyspark.sql import functions as F
    from scale_data import tag_pool_size
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")
    v0 = 8
    replicas = 10
    pool = tag_pool_size(replicas)
    union = replica(docs, "documents", 0, pool)
    for k in range(1, replicas):
        union = union.unionByName(replica(docs, "documents", k, pool))
    vocab = (union.select(F.explode(F.split("text", r"\s+")).alias("w"))
                  .filter(F.col("w") != "").distinct().count())
    assert vocab <= v0 * (pool + 1)      # bounded by the shared pool
    assert vocab > v0 * 2                # but genuinely grows
    # and the decade pool itself grows ~R^(2/3): 5 at R=10, 22 at R=100
    assert tag_pool_size(10) == 5 and tag_pool_size(100) == 22
