package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * LSH candidate-pair generation: band-key explode + self-equi-join — the
 * set-based Spark replacement for the reference's per-anchor retrieval
 * (FAISS top-k, reference: ea/sim/main/methods/index/faiss.py:63-77, and the
 * marker-set duplicate join, helpers/so/steps/merge_issues_duplicates.py:28-50).
 *
 * Skew handling (SURVEY.md section 4): bucket sizes are counted first; buckets
 * up to `maxBucketSize` produce all intra-bucket pairs (exact LSH semantics);
 * oversized buckets (degenerate band keys — boilerplate/empty content) fall
 * back to sorted-neighborhood pairing (each member pairs with its `window`
 * successors in id order), which bounds work at O(m*window) per bucket while
 * preserving connectivity of true duplicate groups for the downstream
 * connected-components stage. AQE skew-join splitting handles the residual
 * imbalance at runtime.
 */
object CandidateGen {

  /**
   * @param keyed   DataFrame with columns (`id`: any orderable type, `key`: Long)
   *                — one row per (row, bucket-key); callers produce it by
   *                exploding band keys or simhash chunks.
   * @return distinct candidate pairs (`a`, `b`) with a < b.
   */
  def pairsFromBuckets(keyed: DataFrame, maxBucketSize: Int = 4096,
      neighborhood: Int = 8): DataFrame = {
    val counts = keyed.groupBy("key").agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > 1) // singleton buckets generate nothing

    val sized = keyed.join(counts, "key")

    val small = sized.where(col("bucket_n") <= maxBucketSize)
      .select(col("key"), col("id"))
    val allPairs = small.as("x").join(small.as("y"),
        col("x.key") === col("y.key") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))

    val big = sized.where(col("bucket_n") > maxBucketSize)
      .select(col("key"), col("id"))
    val rn = big.withColumn("rn",
      row_number().over(Window.partitionBy("key").orderBy("id")))
    val neighborPairs = rn.as("x").join(rn.as("y"),
        col("x.key") === col("y.key") &&
        col("y.rn") > col("x.rn") && col("y.rn") <= col("x.rn") + neighborhood)
      .select(col("x.id").as("a"), col("y.id").as("b"))

    allPairs.union(neighborPairs).distinct()
  }

  /**
   * Explode an array-of-band-keys column into (`id`, `key`) bucket rows.
   * Rows with an empty feature set (signature of all-EMPTY_MIN sentinels hash
   * to a shared key) still collide only with other empties — callers that
   * must exclude them filter on `n_shingles > 0` upstream.
   */
  def explodeBands(df: DataFrame, idCol: String, bandKeysCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(col(bandKeysCol)).as("key"))

  /**
   * Multi-table sign-random-projection bucket rows for an embedding column:
   * one row per (id, table-key), one generator pass over the vectors. Shared
   * by the embedding near-dup and LSH top-k paths so the key scheme (table
   * index mixed into the hash) cannot silently diverge between them.
   */
  def srpBuckets(df: DataFrame, idCol: String, vecCol: String,
      srpBits: Int, tables: Int, seed: Long): DataFrame =
    df.select(col(idCol).as("id"), explode(array((0 until tables).map(t =>
      xxhash64(lit(t), graft.functions.srp_bucket(col(vecCol), srpBits, seed + t))): _*))
      .as("key"))

  /**
   * Hamming-LSH bucket rows for a 64-bit simhash: split into `chunks` equal
   * bit-ranges; by pigeonhole, two hashes within Hamming distance
   * `chunks - 1` share at least one exact chunk — so chunks = hammingMax + 1
   * gives guaranteed candidate recall for the Hamming verify threshold.
   */
  def simhashChunkBuckets(df: DataFrame, idCol: String, simhashCol: String,
      chunks: Int): DataFrame = {
    require(chunks >= 2 && 64 % chunks == 0, s"chunks($chunks) must divide 64 and be >= 2")
    val width = 64 / chunks
    val keys = (0 until chunks).map { c =>
      val chunkVal = shiftrightunsigned(col(simhashCol), c * width)
        .bitwiseAND(lit((1L << width) - 1))
      // mix chunk index into the key so chunk 0 and chunk 1 never collide
      xxhash64(lit(c), chunkVal)
    }
    // one generator pass over the source instead of a `chunks`-way union
    // (a union is shuffle-free but re-reads/recomputes the child per leg)
    df.select(col(idCol).as("id"), explode(array(keys: _*)).as("key"))
  }
}
