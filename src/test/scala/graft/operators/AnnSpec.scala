package graft.operators

import graft.SparkSpec
import graft.functions.HashKernels

class AnnSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered vectors (20 centers + small noise): the realistic ANN regime —
    * true neighbors are materially closer than the bulk. Uniform-random
    * vectors have no neighborhood structure for any LSH to exploit. */
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(5)
    val centers = Array.fill(20)(Array.fill(32)(rng.nextFloat() - 0.5f))
    (0L until 200L).map { i =>
      val c = centers((i % 20).toInt)
      (i, c.map(_ + (rng.nextFloat() - 0.5f) * 0.1f))
    }
  }

  test("brute-force top-k matches driver-side oracle") {
    val df = vecs.toDF("vec_id", "embedding")
    val got = Ann.bruteForceTopK(df, df.where($"vec_id" < 5), "vec_id", "embedding", 10)
      .select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val byId = vecs.toMap
    (0L until 5L).foreach { q =>
      val expect = vecs.filter(_._1 != q)
        .map { case (i, v) => (i, HashKernels.cosine(byId(q), v)) }
        .sortBy { case (i, c) => (-c, i) }.take(10).map(_._1)
      assert(got(q) == expect, s"query $q")
    }
  }

  test("lsh top-k achieves decent recall@10 vs exact") {
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 20)
    val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(df, queries, "vec_id", "embedding", 10,
      srpBits = 8, tables = 16)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
  }
}
