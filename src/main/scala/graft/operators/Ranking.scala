package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Candidate ranking — the set-based form of the reference RankingModel
 * (reference: ea/sim/main/methods/ranking_model.py:15-101): per-anchor
 * candidate scores are attributed to clusters, reduced per cluster
 * (max or avg — issue_scorer/max.py:7-16, avg.py:7-14), ranked, truncated.
 */
object Ranking {

  /**
   * @param pairScores  (query_id, item_id, score) — scored candidates per anchor
   * @param assignments (item_id -> cluster_id); broadcast when small
   * @param k           output truncation (reference top-10, eval_fast.py:95-96)
   * @param useMax      max (default) or avg per-cluster reduction
   * @return (query_id, cluster_id, cluster_score, rank) with rank <= k
   */
  def rankClusters(pairScores: DataFrame, assignments: DataFrame, k: Int,
      useMax: Boolean = true): DataFrame = {
    val reduceFn = if (useMax) max(col("score")) else avg(col("score"))
    pairScores
      .join(assignments, "item_id")
      .groupBy("query_id", "cluster_id")
      .agg(reduceFn.as("cluster_score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cluster_score").desc, col("cluster_id"))))
      .where(col("rank") <= k)
  }

  /** Per-query top-k items (reference retrieval top-n = 50,
    * ea/sim/main/methods/retrieval_model.py:15-21). */
  def topKItems(pairScores: DataFrame, k: Int): DataFrame =
    pairScores
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("item_id"))))
      .where(col("rank") <= k)
}
