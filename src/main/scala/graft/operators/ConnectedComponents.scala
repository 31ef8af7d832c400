package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an undirected edge list, as an iterative
 * DataFrame program — the Spark-native replacement for the reference's
 * driver-side union-find chain resolution
 * (reference: helpers/so/steps/merge_issues_duplicates.py:10-50) and the
 * mutable `Issue` membership model (ea/sim/main/data/objects/issue.py:25-90).
 *
 * Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
 * Components in MapReduce and Beyond", SoCC'14) — O(log n) rounds regardless
 * of component diameter, each round a pair of shuffles. Per-round
 * `localCheckpoint` cuts the lineage so plans stay flat (SURVEY.md section 4).
 *
 * Input: edges with two LongType columns `src`, `dst` (any direction, dups ok).
 * Output: (`id`, `component`) for every node that appears in an edge, where
 * `component` is the minimum node id reachable — deterministic, independent of
 * input partitioning and row order.
 */
object ConnectedComponents {

  /** One large-star round: every node points its larger neighbors at the
    * minimum of its closed neighborhood. */
  private def largeStar(e: DataFrame): DataFrame = {
    val bidir = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
    val mins = bidir.groupBy("u")
      .agg(min("v").as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    bidir.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** One small-star round: orient edges large->small, point each node and its
    * smaller neighbors at the neighborhood minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
    val mins = oriented.groupBy("u").agg(min("v").as("m"))
    val fromNeighbors = oriented.join(mins, "u")
      .select(col("v").as("src"), col("m").as("dst"))
    val fromCenters = mins.select(col("u").as("src"), col("m").as("dst"))
    fromNeighbors.union(fromCenters)
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  private def checksum(e: DataFrame): (Long, Long) = {
    // bit_xor (not sum): order-insensitive and immune to ANSI overflow
    val row = e.agg(
      count(lit(1)).as("c"),
      coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)).as("h")
    ).head()
    (row.getLong(0), row.getLong(1))
  }

  /**
   * Returns (id LONG, component LONG). Nodes not present in any edge are the
   * caller's responsibility (singletons keep their own id).
   */
  def run(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    // the loop is many tiny stages: AQE's per-stage re-planning jobs cost
    // more latency than they save here — disable for the loop's duration
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // lazy localCheckpoint: the checksum action both materializes the
      // iteration (cutting lineage) and tests convergence — one job per
      // round instead of two
      var e = edges
        .select(col("src").cast("long"), col("dst").cast("long"))
        .where(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("src"),
          greatest(col("src"), col("dst")).as("dst"))
        .distinct()
        .localCheckpoint(false)

      var prev = checksum(e)
      var converged = prev._1 == 0L
      var iter = 0
      while (!converged && iter < maxIter) {
        e = smallStar(largeStar(e)).localCheckpoint(false)
        val cur = checksum(e)
        converged = cur == prev
        prev = cur
        iter += 1
      }
      result(e)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    }
  }

  private def result(e: DataFrame): DataFrame = {

    // At the fixpoint the edge set is a star per component: (member -> root).
    // Guard against hitting maxIter pre-fixpoint with a min-per-src reduce.
    val members = e.groupBy(col("src").as("id")).agg(min("dst").as("component"))
    val roots = e.select(col("dst").as("id")).distinct()
      .join(members.select(col("id")), Seq("id"), "left_anti")
      .withColumn("component", col("id"))
    members.union(roots)
  }
}
