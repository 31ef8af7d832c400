package graft.operators

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column — the Spark
 * replacement for the reference's FAISS flat-IP index
 * (reference: ea/sim/main/methods/index/faiss.py:10-83): a broadcast
 * brute-force exact baseline and an LSH-bucketed scale path.
 */
object Ann {

  /**
   * Exact cosine top-k: the query side is broadcast (queries are the small
   * dimension by design — reference anchors per event), the corpus streams;
   * per-query top-k via window rank. One shuffle (the rank).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("item_id"))
      .withColumn("cosine", cosine_sim(col("qv"), col("cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id"))))
      .where(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  /**
   * LSH-bucketed top-k: multi-table sign-random-projection buckets restrict
   * the scored candidates to colliding (query, item) pairs — candidate count
   * scales with bucket occupancy, not corpus size. Recall is tunable via
   * (srpBits down, tables up).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      srpBits: Int = 10, tables: Int = 8, seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // bucket rows carry ONLY (id, key): the multi-table union and the
    // distinct over colliding pairs shuffle ids, never the vectors
    def buckets(df: DataFrame, idc: String, vc: String): DataFrame =
      (0 until tables).map { t =>
        df.select(col(idc),
          xxhash64(lit(t), srp_bucket(col(vc), srpBits, seed + t)).as("key"))
      }.reduce(_ union _)
    val candIds = buckets(c, "item_id", "cv").join(buckets(q, "query_id", "qv"), "key")
      .where(col("query_id") =!= col("item_id"))
      .select("query_id", "item_id")
      .distinct() // a pair may collide in several tables
    // vectors join back exactly once per distinct candidate pair
    val cand = candIds.join(q, "query_id").join(c, "item_id")
    cand
      .withColumn("cosine", cosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id"))))
      .where(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }
}
