package graft.operators

import graft.SparkSpec
import graft.eval.Metrics
import org.apache.spark.sql.functions._

class TextScoresSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "red fox jumps"), (2L, "red fox sleeps"), (3L, "blue whale sings"))
    .toDF("doc_id", "text")

  test("idf table: df counts and idf formula") {
    val idf = TextScores.idfTable(docs, "doc_id", "text")
      .as[(String, Long, Double)].collect()
      .map { case (t, df, i) => t -> ((df, i)) }.toMap
    assert(idf("red")._1 == 2 && idf("blue")._1 == 1)
    assert(math.abs(idf("red")._2 - (1.0 + math.log(3.0 / 3))) < 1e-9)
    assert(math.abs(idf("blue")._2 - (1.0 + math.log(3.0 / 2))) < 1e-9)
  }

  test("lerch pair score = sum of idf^2 over common tokens") {
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val got = TextScores.lerchPairScores(docs, pairs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val idfRed = 1.0 + math.log(3.0 / 3)   // df=2
    val idfFox = 1.0 + math.log(3.0 / 3)
    assert(math.abs(got((1L, 2L)) - (idfRed * idfRed + idfFox * idfFox)) < 1e-9)
    assert(!got.contains((1L, 3L))) // no common tokens -> no row
  }

  test("fast align: identical docs score high, disjoint score zero, shift decays") {
    val same = TextScores.fastAlignScore(Array("a", "b", "c"), Array("a", "b", "c"))
    assert(math.abs(same - 1.0) < 1e-9) // every token matches at distance 0
    val disjoint = TextScores.fastAlignScore(Array("a", "b"), Array("x", "y"))
    assert(disjoint == 0.0)
    val shifted = TextScores.fastAlignScore(Array("a", "b", "c"), Array("x", "a", "b"))
    assert(shifted > 0.0 && shifted < same)
  }

  test("fast_align column (codegen'd expression) matches the driver kernel") {
    val cases = Seq(
      (Array("a", "b", "c"), Array("a", "b", "c")),
      (Array("a", "b"), Array("x", "y")),
      (Array("a", "b", "c"), Array("x", "a", "b")),
      (Array("a", "a", "b"), Array("b", "a")), // repeated tokens: first pos wins
      (Array.empty[String], Array("z")))
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i, a.toSeq, b.toSeq) }.toDF("i", "ta", "tb")
    val got = df.select($"i", TextScores.fast_align($"ta", $"tb").as("s"))
      .as[(Int, Double)].collect().toMap
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(got(i) - TextScores.fastAlignScore(a, b)) < 1e-12,
        s"case $i: got=${got(i)} want=${TextScores.fastAlignScore(a, b)}")
    }
  }

  test("bootstrap CI: deterministic, brackets the mean, partitioning-independent") {
    val scores = (1 to 200).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "s")
    val r1 = Metrics.bootstrapCI(scores, "s", "id").head()
    val r2 = Metrics.bootstrapCI(scores.repartition(7), "s", "id").head()
    assert(r1 == r2, "bootstrap not partitioning-independent")
    val (m, lo, hi) = (r1.getDouble(0), r1.getDouble(1), r1.getDouble(2))
    assert(lo <= m && m <= hi)
    assert(math.abs(m - 4.5) < 0.5) // population mean 4.5
  }
}
