"""Approximate & exact nearest-neighbor search over embedding columns.

Beyond-reference operators for training-data pipelines. Two tiers:

- brute_force_knn: exact cosine top-k. The query set is broadcast (it is
  small by construction); candidates stream through a codegen'd array fold;
  rank prune via WindowGroupLimit keeps only k rows per query per task
  before the shuffle. This is the correctness baseline and is itself
  scan-bound at scale (one pass over the corpus per query batch).

- ivf_knn: IVF-style two-stage search. A deterministic coarse quantizer
  (here: the provided `label` column, or any cluster assignment) routes
  each query to its nprobe nearest centroids; only those partitions are
  scanned. At 100 TB the corpus would be written partitioned by the
  centroid id so partition pruning skips >90% of the data on disk.

Norms are precomputed once per vector (O(n)) rather than per pair (O(n^2))
— see functions.cosine_similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import dot_product, l2_norm


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(F.col("__sim").desc(), F.col("c_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .filter(F.col("rnk") <= k)
                  .select("q_id", "c_id",
                          F.round(F.col("__sim"), 4).alias("cos_sim"),
                          F.col("rnk").cast("long").alias("rnk")))


def brute_force_knn(queries: DataFrame, corpus: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k: (q_id, c_id, cos_sim, rnk)."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
                       l2_norm(F.col(vec_col)).alias("q_norm"))
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"),
                      l2_norm(F.col(vec_col)).alias("c_norm"))
    pairs = c.join(F.broadcast(q), F.lit(True))
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("c_id"))
    sim = dot_product(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    return _rank_topk(pairs.select("q_id", "c_id", F.round(sim, 6).alias("__sim")), k)


def centroids_from_labels(corpus: DataFrame, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          label_col: str = "label") -> DataFrame:
    """Mean vector per label — a deterministic coarse quantizer.

    Element-wise sums via posexplode + pivot-free regroup: one shuffle
    keyed by (label, dim), then array reassembly — scales to any dim
    without a per-dimension aggregate expression explosion.
    """
    parts = corpus.select(F.col(label_col).alias("centroid_id"),
                          F.posexplode(F.col(vec_col)).alias("dim", "x"))
    sums = (parts.groupBy("centroid_id", "dim")
                 .agg(F.sum(F.col("x").cast("double")).alias("s"),
                      F.count("*").alias("n")))
    return (sums.groupBy("centroid_id")
                .agg(F.array_sort(F.collect_list(F.struct("dim", (F.col("s") / F.col("n")).alias("m"))))
                      .alias("__dm"))
                .select("centroid_id",
                        F.transform(F.col("__dm"), lambda s: s["m"]).alias("centroid")))


def ivf_knn(queries: DataFrame, corpus: DataFrame, k: int = 5, nprobe: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding",
            label_col: str = "label", exclude_self: bool = True) -> DataFrame:
    """Two-stage ANN: route each query to nprobe nearest centroids, scan only
    those buckets, exact-rerank within the candidates."""
    cents = centroids_from_labels(corpus, id_col, vec_col, label_col)
    cents = cents.withColumn("cent_norm", l2_norm(F.col("centroid")))
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
                       l2_norm(F.col(vec_col)).alias("q_norm"))
    qc = q.join(F.broadcast(cents), F.lit(True))
    csim = (dot_product(F.col("q_vec"), F.col("centroid"))
            / (F.col("q_norm") * F.col("cent_norm")))
    wq = Window.partitionBy("q_id").orderBy(F.col("__cs").desc(), F.col("centroid_id"))
    routed = (qc.select("q_id", "q_vec", "q_norm", "centroid_id",
                        F.round(csim, 6).alias("__cs"))
                .withColumn("__r", F.row_number().over(wq))
                .filter(F.col("__r") <= nprobe)
                .select("q_id", "q_vec", "q_norm",
                        F.col("centroid_id").alias(label_col)))
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"),
                      l2_norm(F.col(vec_col)).alias("c_norm"), label_col)
    cand = c.join(F.broadcast(routed), [label_col])
    if exclude_self:
        cand = cand.filter(F.col("q_id") != F.col("c_id"))
    sim = dot_product(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    return _rank_topk(cand.select("q_id", "c_id", F.round(sim, 6).alias("__sim")), k)
