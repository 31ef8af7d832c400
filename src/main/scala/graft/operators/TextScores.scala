package graft.operators

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Classical pairwise text scorers kept as diagnostics alongside the signature
 * methods (the north rule supersedes them for dedup, but they remain part of
 * the reference's operator surface — SURVEY.md section 2.9).
 */
object TextScores {

  /** Per-token document frequency + IDF = 1 + ln(N/(df+1))
    * (reference: ea/sim/main/methods/classic/fast.py:17-36,
    * cross_encoders/lerch.py:22-33). */
  def idfTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.count()
    docs.select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .withColumn("idf", lit(1.0) + log(lit(n.toDouble) / (col("df") + 1)))
  }

  /**
   * Lerch TF-IDF pair score: sum of idf(t)^2 over tokens common to both docs
   * (reference: ea/sim/main/methods/base/cross_encoders/lerch.py:46-50),
   * computed set-at-a-time: explode distinct tokens, join both pair sides,
   * aggregate — no per-pair driver loop, idf table broadcast by Catalyst.
   *
   * @param pairs (a, b) doc-id pairs to score
   */
  def lerchPairScores(docs: DataFrame, pairs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
    val idf = idfTable(docs, idCol, textCol)
    val ta = toks.select(col("id").as("a"), col("token"))
    val tb = toks.select(col("id").as("b"), col("token"))
    pairs
      .join(ta, "a").join(tb, Seq("b", "token")) // common tokens only
      // no broadcast hint: the distinct-token table is unbounded (billions
      // of rows on a web corpus — a forced broadcast would OOM the driver);
      // AQE picks broadcast at runtime when the idf side is actually small
      .join(idf.select("token", "idf"), "token")
      .groupBy("a", "b")
      .agg(sum(col("idf") * col("idf")).as("lerch_score"))
  }

  /**
   * FaST-style alignment score (reference: ea/sim/main/methods/classic/fast.py:49-133):
   * df-damped positional weights w(pos) = (pos+1)^-alpha * exp(-beta * df/N);
   * matched tokens contribute (w1 + w2) * exp(-gamma * |pos1 - pos2|);
   * normalized by total weight mass of both docs. Pair-level kernel over
   * token arrays; the df map rides in as a broadcast plan via the idf join
   * being pre-applied by the caller (here: unweighted df=0 default).
   */
  def fastAlignScore(a: Array[String], b: Array[String],
      df: collection.Map[String, Long] = Map.empty, n: Long = 1L,
      alpha: Double = 0.0, beta: Double = 0.0, gamma: Double = 1.0): Double = {
    def weights(t: Array[String]): Array[Double] =
      t.zipWithIndex.map { case (tok, pos) =>
        math.pow(pos + 1.0, -alpha) *
          math.exp(-beta * df.getOrElse(tok, 0L).toDouble / n)
      }
    val wa = weights(a); val wb = weights(b)
    // first-occurrence position per token (reference aligns sorted id lists)
    def firstPos(t: Array[String]): Map[String, Int] =
      t.zipWithIndex.reverse.toMap
    val pa = firstPos(a); val pb = firstPos(b)
    var score = 0.0
    pa.foreach { case (tok, i) =>
      pb.get(tok).foreach { j =>
        score += (wa(i) + wb(j)) * math.exp(-gamma * math.abs(i - j))
      }
    }
    val norm = wa.sum + wb.sum
    if (norm == 0.0) 0.0 else score / norm
  }

  /** fastAlignScore as a column — a codegen'd Catalyst expression
    * ([[graft.functions.FastAlign]]), numerically equivalent to
    * [[fastAlignScore]] with empty df (the df damping joins in upstream when
    * wanted). The two kernels sum match contributions in different
    * hash-iteration orders (Scala Map vs java.util.HashMap of UTF8String),
    * so last-ulp summation-order drift is possible; the parity spec asserts
    * 1e-12 tolerance, not bit equality. */
  def fast_align(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      gamma: Double = 1.0): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.FastAlign(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b),
        gamma, alpha = 0.0))
}
