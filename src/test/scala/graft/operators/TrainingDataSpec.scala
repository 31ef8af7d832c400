package graft.operators

import graft.SparkSpec

/** Pair/triplet mining semantics (reference datasets/pair.py, triplet.py):
  * positives stay within a cluster, the cap holds per cluster, the negative
  * always comes from a different cluster, and results are deterministic. */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private def asg = Seq(
    (1L, "x"), (2L, "x"), (3L, "x"), (4L, "x"),
    (10L, "y"), (11L, "y"),
    (20L, "z")).toDF("id", "c")

  test("pairs: within-cluster, a < b, capped per cluster") {
    val got = TrainingData.pairs(asg, "id", "c", maxPerCluster = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.forall { case (_, a, b) => a < b })
    // cluster x has C(4,2)=6 candidate pairs -> capped to 3; y has 1; z has 0
    val byCluster = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byCluster == Map("x" -> 3, "y" -> 1))
    // within-cluster membership
    val members = Map("x" -> Set(1L, 2L, 3L, 4L), "y" -> Set(10L, 11L))
    assert(got.forall { case (c, a, b) => members(c)(a) && members(c)(b) })
  }

  test("pairs: deterministic across reruns and partitioning") {
    val a = TrainingData.pairs(asg, "id", "c", 3).collect().toSet
    val b = TrainingData.pairs(asg.repartition(7), "id", "c", 3).collect().toSet
    assert(a == b)
  }

  test("triplets: negative from a different cluster, cyclic next-rep rule") {
    val got = TrainingData.triplets(asg, "id", "c", maxPerCluster = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    val members = Map("x" -> Set(1L, 2L, 3L, 4L), "y" -> Set(10L, 11L),
      "z" -> Set(20L))
    assert(got.forall { case (c, _, _, neg) => !members(c)(neg) })
    // reps: x->1, y->10, z->20; next-rep rule: x's neg=10, y's neg=20
    assert(got.filter(_._1 == "x").forall(_._4 == 10L))
    assert(got.filter(_._1 == "y").forall(_._4 == 20L))
  }
}
