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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine_similarity


def brute_force_knn(queries: DataFrame, corpus: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k: (q_id, c_id, cos_sim, rnk)."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    pairs = c.join(F.broadcast(q), F.lit(True))
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("c_id"))
    sim = cosine_similarity(F.col("q_vec"), F.col("c_vec"))
    scored = pairs.select("q_id", "c_id", F.round(sim, 6).alias("__sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("__sim").desc(), F.col("c_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .filter(F.col("rnk") <= k)
                  .select("q_id", "c_id", F.round(F.col("__sim"), 4).alias("cos_sim"), "rnk"))


def centroids_from_labels(corpus: DataFrame, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          label_col: str = "label") -> DataFrame:
    """Mean vector per label — a deterministic coarse quantizer."""
    dim_probe = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    sums = corpus.groupBy(label_col).agg(
        F.count("*").alias("n"),
        *[F.sum(F.get(F.col(vec_col), i).cast("double")).alias(f"s{i}") for i in range(dim_probe)],
    )
    centroid = F.array(*[(F.col(f"s{i}") / F.col("n")) for i in range(dim_probe)])
    return sums.select(F.col(label_col).alias("centroid_id"), centroid.alias("centroid"))


def ivf_knn(queries: DataFrame, corpus: DataFrame, k: int = 5, nprobe: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding",
            label_col: str = "label", exclude_self: bool = True) -> DataFrame:
    """Two-stage ANN: route each query to nprobe nearest centroids, scan only
    those buckets, exact-rerank within the candidates."""
    cents = centroids_from_labels(corpus, id_col, vec_col, label_col)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    qc = q.join(F.broadcast(cents), F.lit(True))
    csim = cosine_similarity(F.col("q_vec"), F.col("centroid"))
    wq = Window.partitionBy("q_id").orderBy(F.col("__cs").desc(), F.col("centroid_id"))
    routed = (qc.select("q_id", "q_vec", "centroid_id", F.round(csim, 6).alias("__cs"))
                .withColumn("__r", F.row_number().over(wq))
                .filter(F.col("__r") <= nprobe)
                .select("q_id", "q_vec", F.col("centroid_id").alias(label_col)))
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"), label_col)
    cand = c.join(F.broadcast(routed), [label_col])
    if exclude_self:
        cand = cand.filter(F.col("q_id") != F.col("c_id"))
    sim = cosine_similarity(F.col("q_vec"), F.col("c_vec"))
    scored = cand.select("q_id", "c_id", F.round(sim, 6).alias("__sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("__sim").desc(), F.col("c_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .filter(F.col("rnk") <= k)
                  .select("q_id", "c_id", F.round(F.col("__sim"), 4).alias("cos_sim"), "rnk"))
