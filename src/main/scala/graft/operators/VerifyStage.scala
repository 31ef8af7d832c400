package graft.operators

import graft.config.DedupConfig
import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact verification of LSH candidate pairs — the Spark replacement for the
 * reference's scoring stage (reference: ea/sim/main/methods/scoring_model.py:9-57):
 * exact Jaccard on caption shingles (replaces FaST/Lerch scores), Hamming on
 * the phash-derived SimHash (replaces the S3M neural scorer), and an optional
 * longest-common-substring pass for exact long matches.
 *
 * A pair is a verified duplicate when ANY detector clears its threshold
 * (the three signature methods of the north rule are independent evidence).
 */
object VerifyStage {

  /**
   * @param pairs    (`a`, `b`) candidate pairs, a < b
   * @param features (`id`, `shingles` array<long>, `simhash` long,
   *                 `norm_text` string) — one row per record
   * @return pairs with `jaccard`, `hamming`, `lcs`, `is_dup`
   */
  def verify(pairs: DataFrame, features: DataFrame, cfg: DedupConfig): DataFrame = {
    val fa = features.select(
      col("id").as("a"), col("shingles").as("sh_a"),
      col("simhash").as("sim_a"), col("norm_text").as("txt_a"))
    val fb = features.select(
      col("id").as("b"), col("shingles").as("sh_b"),
      col("simhash").as("sim_b"), col("norm_text").as("txt_b"))

    val joined = pairs.join(fa, "a").join(fb, "b")
      .withColumn("jaccard", jaccard_sim(col("sh_a"), col("sh_b")))
      .withColumn("hamming", hamming64(col("sim_a"), col("sim_b")).cast("int"))

    // LCS is the expensive detector: compute it only when enabled and only on
    // pairs the cheap detectors did not already settle.
    val withLcs =
      if (cfg.lcsMin > 0)
        joined.withColumn("lcs",
          when(col("jaccard") >= cfg.jaccardMin || col("hamming") <= cfg.hammingMax,
            lit(0))
            .otherwise(lcs_length(col("txt_a"), col("txt_b"), cfg.lcsCap)))
      else joined.withColumn("lcs", lit(0))

    withLcs
      .withColumn("is_dup",
        col("jaccard") >= cfg.jaccardMin ||
        col("hamming") <= cfg.hammingMax ||
        (lit(cfg.lcsMin) > 0 && col("lcs") >= cfg.lcsMin))
      .select("a", "b", "jaccard", "hamming", "lcs", "is_dup")
  }
}
