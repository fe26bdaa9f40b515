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
The driver hash-checks only the first 50 registry entries per round (121
entries as of round 7), so full coverage takes three rounds per cycle.
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

# Latest round with a driver hash signature, per query — derived
# mechanically from CORRECTNESS_r01..r13.json by
# `tools/update_window.py --emit` (r14 refresh: CORRECTNESS_r13 absorbed,
# 50/50 green; every registry query remains signed, all r10+ — the r14
# window fronts the full 24-query r10 tier, the only staleness left
# (VERDICT r13 item 1: the 22 outstanding TPC-H shapes + bigram_novelty,
# curriculum_order, doc_chunks, exact_substring_apply/dedup,
# global_shuffle, quality_deciles, retention_cohorts, source_mixture).
_R10 = ("bigram_novelty", "curriculum_order", "doc_chunks", "exact_substring_apply", "exact_substring_dedup", "global_shuffle", "quality_deciles", "retention_cohorts", "source_mixture", "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q18", "tpch_q19", "tpch_q2", "tpch_q20", "tpch_q21", "tpch_q22", "tpch_q7", "tpch_q8", "tpch_q9",)
_R11 = ("agg_max", "anomaly_daily", "bigram_surprisal", "bm25_topk", "bpe_fertility", "bpe_train", "branch_counts", "daily_1800", "decontaminate", "dsir_resample", "dsir_score", "embedding_lsh_pairs", "embedding_near_dup", "exact_dedup", "filter_transform", "fold_letters", "funnel_conversion", "hopping_6h", "hybrid_rrf", "label_silhouette", "lang_id", "line_dedup", "minhash_signature", "pii_redact", "pipeline_funnel", "quality_score", "quantile_sketch", "reduce_keep_first", "repetition_stats", "simhash_hamming_pairs", "sum_odd", "topk_revenue", "tpch_q1", "tpch_q17", "tumbling_hourly", "unigram_lm_train", "unigram_surprisal", "value_percentiles", "windowed_max", "wordcount",)
_R12 = ("approx_distinct", "bm25_pruned", "bm25_recall", "bpe_encode", "bpe_encode_join", "cms_estimate", "corpus_prep", "corpus_report", "corrupt_skip", "dedup_clusters", "dedup_keep_best", "dedup_recall", "distinct_users", "epoch_mixture", "fingerprint", "gopher_rules", "incremental_dedup", "inventory_reservation", "kmeans_train", "knn_graph", "knn_hard_negatives", "knn_ivf_trained", "knn_multiprobe", "leakage_split", "max_dup_spans", "minhash_lsh_pairs", "music_charts", "ngram_jaccard", "ngram_jaccard_capped", "order_validation", "pack_sequences_bpe", "pageview_region", "rollup_sales", "running_counts_trace", "salted_join_skew", "shard_pack", "simhash", "soft_dedup", "token_count", "unigram_encode", "unigram_encode_join", "vocab_stats", "winnow_fingerprints",)
_R13 = ("anonymize_props", "asof_join", "bm25_gate", "cluster_sample", "cube_sales", "daily_1800_nyc", "dedup_clusters_star", "dedup_ttl", "fk_chain", "frame_sample", "having_count", "incremental_knn", "ingest_funnel", "json_extract", "kn3_surprisal", "kn5_surprisal", "kn_surprisal", "knn_cosine", "knn_ivf", "knn_ivfpq", "knn_recall", "knn_recall_clustered", "ktable_latest", "ktable_reagg", "media_features", "merge_union", "nb_filter_hashed", "nb_filter_join", "nb_quality_filter", "pack_sequences", "pq_knn", "quality_filter_median", "reduce_concat", "reservoir_per_stratum", "semantic_dedup", "semantic_prune", "session_windows", "source_overlap", "stratified_sample", "stream_stream_join", "stream_stream_outer_join", "stream_table_join", "table_table_join", "tfidf_top_terms", "top_articles_windowed", "tpch_q10", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",)
_SIGNED_ROUND: dict[str, int] = {**{n: 10 for n in _R10},
                                 **{n: 11 for n in _R11},
                                 **{n: 12 for n in _R12},
                                 **{n: 13 for n in _R13}}

# Queries whose code (or a shared operator/catalog path specific to them)
# changed after their latest driver signature — front of the window.
# Round-14 diff (ADVICE r13): incremental_knn's routed-training gate now
# evaluates ONLY on the auto-k path — the registry query pins k=8, so its
# plan is byte-identical (the pinned path always took the exact assign at
# oracle SFs), but the operator code moved under it; the √n sizing
# formula was single-sourced as auto_kclusters_from_count. ingest_funnel's
# artifact build/serve path gained the {path}/meta n_buckets row (the
# registry query runs the inline form — untouched composition — but the
# shared module changed). New r14 queries auto-front via the
# never-signed rule.
_CODE_CHANGED_SINCE_SIGNATURE: tuple[str, ...] = (
    "incremental_knn", "ingest_funnel")


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
