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
    // mirrorDups: the image distance is the MIN of the raw and the
    // orbit-canonical simhash Hamming — the raw leg keeps ordinary
    // near-dups exactly as without the flag (the canonical argmin can flip
    // under small phash noise), the canonical leg catches mirrored copies
    val mirrorCols =
      if (cfg.mirrorDups) Seq("simhash_m") else Seq.empty[String]
    def side(tag: String, idAs: String) = features.select(
      (Seq(col("id").as(idAs), col("shingles").as(s"sh_$tag"),
        col("simhash").as(s"sim_$tag"), col("norm_text").as(s"txt_$tag")) ++
        mirrorCols.map(c => col(c).as(s"${c}_$tag"))): _*)
    val fa = side("a", "a")
    val fb = side("b", "b")

    val joined = pairs.join(fa, "a").join(fb, "b")
      .withColumn("jaccard", jaccard_sim(col("sh_a"), col("sh_b")))
      .withColumn("hamming",
        (if (cfg.mirrorDups)
          least(hamming64(col("sim_a"), col("sim_b")),
            hamming64(col("simhash_m_a"), col("simhash_m_b")))
        else hamming64(col("sim_a"), col("sim_b"))).cast("int"))

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
