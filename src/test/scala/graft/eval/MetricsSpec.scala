package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("accuracy@k and MRR: hand case") {
    // q1: truth at rank 1; q2: truth at rank 3; q3: truth absent
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1))
      .toDF("query_id", "cluster_id", "rank")
    val truth = Seq((1L, 10L), (2L, 22L), (3L, 99L))
      .toDF("query_id", "true_cluster_id")
    val m = Metrics.accuracyAndMrr(ranked, truth, Seq(1, 3)).head()
    assert(math.abs(m.getAs[Double]("acc_at_1") - 1.0 / 3) < 1e-9)
    assert(math.abs(m.getAs[Double]("acc_at_3") - 2.0 / 3) < 1e-9)
    assert(math.abs(m.getAs[Double]("mrr") - (1.0 + 1.0 / 3) / 3) < 1e-9)
  }

  test("pair recall/precision: hand case") {
    val pred = Seq(("a", "b"), ("c", "b"), ("x", "y")).toDF("a", "b")
    val oracle = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("a", "b")
    val m = Metrics.pairRecallPrecision(pred, oracle).head()
    assert(math.abs(m.getAs[Double]("recall") - 2.0 / 3) < 1e-9)   // (a,b),(b,c) hit
    assert(math.abs(m.getAs[Double]("precision") - 2.0 / 3) < 1e-9)
  }

  test("rocAuc: perfect, inverted, and known-AUC case") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("score", "label")
    assert(math.abs(Metrics.rocAuc(perfect, "score", "label") - 1.0) < 1e-9)
    val inverted = Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false))
      .toDF("score", "label")
    assert(math.abs(Metrics.rocAuc(inverted, "score", "label")) < 1e-9)
    // one discordant pair of 4: AUC = 3/4
    val mixed = Seq((0.9, true), (0.4, true), (0.5, false), (0.1, false))
      .toDF("score", "label")
    assert(math.abs(Metrics.rocAuc(mixed, "score", "label") - 0.75) < 1e-9)
  }

  test("fBeta sweep finds the separating threshold") {
    // scores: new issues have low max-similarity
    val scored = Seq((0.1, true), (0.2, true), (0.7, false), (0.9, false))
      .toDF("score", "is_new")
    val best = Metrics.fBetaSweep(scored, "score", "is_new", beta = 1.0).head()
    assert(math.abs(best.getAs[Double]("fbeta") - 1.0) < 1e-9)
    assert(best.getAs[Double]("threshold") == 0.2)
  }

  test("clusterPairs emits all intra-cluster pairs") {
    val asg = Seq(("a", 1L), ("b", 1L), ("c", 1L), ("d", 2L)).toDF("id", "cluster")
    val pairs = Metrics.clusterPairs(asg, "id", "cluster")
      .as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}
