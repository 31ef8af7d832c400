package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-set mining over cluster assignments — the Spark form of the
 * reference's pair/triplet dataset generators
 * (reference: ea/sim/dev/scripts/data/datasets/pair.py:22-57 all-with-all
 * positive pairs within an issue, capped with sampling;
 * triplet.py:23-62 adds a negative from another issue).
 *
 * The reference samples with a seeded RNG (random_seed=42); here the sample
 * order is a deterministic arithmetic key of the pair ids, so results are
 * reproducible across engines AND expressible in the DuckDB oracle (a seeded
 * `rand()` would be engine-specific). Distribution-wise both are arbitrary
 * fixed orders over the pair space.
 */
object TrainingData {

  /** Pseudo-random but engine-portable ordering key for a pair. */
  private def pairKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    (a * 1000003L + b) % 999983L

  /**
   * Positive pairs: all (a, b) with a < b inside one cluster, keeping at most
   * `maxPerCluster` pairs per cluster in pairKey order.
   * @param assignments (`id` LONG-like, `cluster` any equatable)
   */
  def pairs(assignments: DataFrame, idCol: String, clusterCol: String,
      maxPerCluster: Int): DataFrame = {
    val x = assignments.select(col(idCol).as("id"), col(clusterCol).as("c"))
    val joined = x.as("l").join(x.as("r"),
        col("l.c") === col("r.c") && col("l.id") < col("r.id"))
      .select(col("l.c").as("cluster_id"),
        col("l.id").as("a"), col("r.id").as("b"))
    joined
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster_id")
          .orderBy(pairKey(col("a"), col("b")), col("a"), col("b"))))
      .where(col("rn") <= maxPerCluster)
      .drop("rn")
  }

  /**
   * Triplets: each positive pair plus a deterministic negative — the minimum
   * id of the cluster whose min-id is the smallest strictly greater than this
   * cluster's min-id (cyclic: the largest cluster wraps to the smallest).
   * A fixed, portable stand-in for the reference's seeded random negative.
   */
  def triplets(assignments: DataFrame, idCol: String, clusterCol: String,
      maxPerCluster: Int): DataFrame = {
    val x = assignments.select(col(idCol).as("id"), col(clusterCol).as("c"))
    val reps = x.groupBy("c").agg(min("id").as("rep"))
    // cyclic successor of each cluster's rep in global rep order — at web
    // scale cluster count ~ row count, so this runs through
    // OrderedScan.cyclicLead (value-bucketed lead + boundary stitch),
    // never an unpartitioned global window
    val nextRep = OrderedScan.cyclicLead(reps, "rep", "neg")
      .select(col("c").as("cluster_id"), col("neg"))
    pairs(assignments, idCol, clusterCol, maxPerCluster)
      .join(nextRep, "cluster_id")
      .select(col("cluster_id"), col("a"), col("b"), col("neg"))
  }
}
