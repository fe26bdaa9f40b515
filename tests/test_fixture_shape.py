"""Fixture-shape guards for bench safety.

The UNCAPPED exact ngram_jaccard in bench.py's HEADLINE is quadratic in
the longest shingle posting list (cost ~ sum over shingles of df^2). At
the shipped sf0.1 fixture the max df is 25 (measured; df^2 = 625 pairs
for the hottest shingle), so the exact variant is safe to bench — but a
fixture regeneration that introduced one boilerplate shingle (e.g. a
shared header) would silently turn the bench into an O(n^2) self-join.
This test pins the posting-list ceiling so that failure is loud and
points here instead of showing up as a mystery bench blowup.

At 100 TB the cap is not a fixture property but an operator parameter:
ngram_jaccard_capped (max_df via operators/skew.drop_hot_keys) and the
MinHash-LSH family are the declared scale paths.
"""


import os

import pyspark.sql.functions as F

from kafka_streams_examples_spark.catalog import table
from kafka_streams_examples_spark.operators.dedup import doc_shingle_hashes

# Same env var + default bench.py reads, so the guard covers whatever
# fixture the bench will actually run against (not just the shipped one).
BENCH_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Measured max df at sf0.1 is 25; the bound leaves headroom for benign
# fixture drift while keeping the worst shingle's pair fan-out <= 10^4.
MAX_POSTING_LIST = 100


def test_bench_fixture_posting_lists_stay_bounded(spark):
    docs = table(spark, BENCH_SF_DIR, "documents")
    df_max = (doc_shingle_hashes(docs)
              .groupBy("shingle").count()
              .agg(F.max("count").alias("mx")).collect()[0].mx)
    assert df_max <= MAX_POSTING_LIST, (
        f"hottest shingle appears in {df_max} docs (> {MAX_POSTING_LIST}); "
        "the uncapped ngram_jaccard HEADLINE entry would go quadratic — "
        "bench the capped variant or fix the fixture")
