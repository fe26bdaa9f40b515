"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``kafka_streams_examples_spark.registry`` —
one entry per implemented operator from SURVEY.md §2 plus the
training-data pipeline operators (dedup / similarity / text analysis).

Ordering policy (signature freshness, NOT hide-the-greens)
----------------------------------------------------------
The driver hash-checks only the first 50 registry entries per round (118
entries as of round 5), so full coverage takes three rounds per cycle.
Queries are ordered by how STALE their latest driver signature is:

1. queries whose implementation (or a shared code path under them) changed
   AFTER their latest signature (``_CODE_CHANGED_SINCE_SIGNATURE``) — these
   are exactly the rows where a regression could hide, so they go first;
2. never-signed queries (new this round);
3. ascending by latest signed round (``_SIGNED_ROUND``) — oldest
   signatures refresh first;
4. registry order as the stable tie-break.

Every signed query is ALSO re-verified locally each round with the
driver-identical ``tools/check_parity.py`` gate regardless of window
position, so nothing is ever "rotated out" of verification — only out of
this round's external signature. Update ``_SIGNED_ROUND`` from
CORRECTNESS_r{N}.json each round and clear/refill
``_CODE_CHANGED_SINCE_SIGNATURE`` from the round's diff.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_examples_spark.registry import QUERIES

# Latest round with a driver hash signature, per query (CORRECTNESS_r01/
# r03/r04.json). Queries absent here have never been driver-signed.
_R04 = (
    "token_count", "corpus_prep", "fingerprint", "inventory_reservation",
    "running_counts_trace", "salted_join_skew", "music_charts",
    "pageview_region", "order_validation", "corrupt_skip", "distinct_users",
    "approx_distinct", "rollup_sales", "media_features", "frame_sample",
    "tpch_q3", "tpch_q5", "top_articles_windowed", "daily_1800_nyc",
    "cube_sales", "tpch_q10", "tpch_q4", "tpch_q6", "tpch_q7", "tpch_q14",
    "tpch_q18", "tpch_q19", "tpch_q2", "tpch_q13", "tpch_q15", "tpch_q21",
    "tpch_q22", "dedup_clusters_star", "doc_chunks", "bigram_novelty",
    "global_shuffle", "tpch_q8", "tpch_q9", "tpch_q11", "tpch_q12",
    "tpch_q16", "tpch_q17", "tpch_q20", "quality_deciles",
    "funnel_conversion", "retention_cohorts", "wordcount",
    "filter_transform", "sum_odd", "branch_counts",
)
_R03 = (
    "merge_union", "anonymize_props", "having_count", "json_extract",
    "ktable_latest", "ktable_reagg", "table_table_join", "stream_table_join",
    "fk_chain", "stream_stream_join", "stream_stream_outer_join", "asof_join",
    "reduce_concat", "reduce_keep_first", "fold_letters", "agg_max",
    "anomaly_daily", "tumbling_hourly", "hopping_6h", "session_windows",
    "daily_1800", "windowed_max", "dedup_ttl", "topk_revenue", "tpch_q1",
    "exact_dedup", "minhash_signature", "minhash_lsh_pairs", "ngram_jaccard",
    "ngram_jaccard_capped", "simhash", "simhash_hamming_pairs",
    "dedup_clusters", "cms_estimate", "stratified_sample", "shard_pack",
    "quality_filter_median", "reservoir_per_stratum", "tfidf_top_terms",
    "knn_cosine", "knn_ivf", "embedding_near_dup", "embedding_lsh_pairs",
    "winnow_fingerprints", "lang_id", "quality_score",
)
_SIGNED_ROUND: dict[str, int] = {**{n: 3 for n in _R03}, **{n: 4 for n in _R04}}

# Queries whose code (or a shared operator/catalog path specific to them)
# changed after their latest driver signature — front of the window.
# Round-5 diff: dedup_clusters (CC rework a853267, signed r03);
# session_windows/dedup_ttl (catalog NTZ normalization, signed r03);
# text.py/sampling.py changes after r03 signatures; tpch_q17 plan rewrite
# and funnel_conversion aggregate rewrite happen THIS round (signed r04).
_CODE_CHANGED_SINCE_SIGNATURE: tuple[str, ...] = (
    "dedup_clusters", "session_windows", "dedup_ttl", "tfidf_top_terms",
    "quality_filter_median", "stratified_sample", "reservoir_per_stratum",
    "lang_id", "quality_score", "tpch_q17", "funnel_conversion",
    # r5 late: the similarity family moved to engine-portable rounding
    # (stable_round both sides) after knn_cosine/knn_ivf's r03 signatures;
    # the sign-LSH bucket/cos rounding migration then reached the
    # embedding pair operators too
    "knn_cosine", "knn_ivf", "embedding_near_dup", "embedding_lsh_pairs",
)


def _ordered_names() -> list[str]:
    names = list(QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    prio = {n: i for i, n in enumerate(_CODE_CHANGED_SINCE_SIGNATURE)}
    return sorted(names, key=lambda n: (prio.get(n, len(prio)),
                                        _SIGNED_ROUND.get(n, 0), pos[n]))


def stale_names() -> list[str]:
    """Queries whose latest signature does not postdate their code —
    the set the driver window must cover this round (contract-tested)."""
    newest = max(_SIGNED_ROUND.values(), default=0)
    return [n for n in QUERIES
            if n in _CODE_CHANGED_SINCE_SIGNATURE
            or _SIGNED_ROUND.get(n, 0) < newest]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {name: QUERIES[name].oracle for name in _ordered_names()
            if QUERIES[name].oracle is not None}
