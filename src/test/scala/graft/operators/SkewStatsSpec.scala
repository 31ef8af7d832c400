package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewStatsSpec extends SparkSpec {
  import spark.implicits._

  private val keyed = (
    (0L until 100L).map(i => (i, 1L)) ++   // size 100 -> class 7
      (0L until 8L).map(i => (i, 2L)) ++   // size 8   -> class 4
      (0L until 8L).map(i => (i, 3L)) ++   // size 8   -> class 4
      Seq((42L, 4L))                       // singleton -> class 1
    ).toDF("id", "key")

  test("bucketHistogram: classes, counts, rows, pairs are exact") {
    val h = keyed.transform(SkewStats.bucketHistogram)
      .as[(Int, Long, Long, Long, Long)].collect().toList
    assert(h == List(
      (1, 1L, 1L, 1L, 0L),
      (4, 2L, 16L, 8L, 56L),       // 2 * C(8,2)
      (7, 1L, 100L, 100L, 4950L))) // C(100,2)
    // conservation: histogram rows sum to the keyed frame size
    assert(h.map(_._3).sum == keyed.count())
  }

  test("heavyKeys: only over-cap keys, with the announced grid shape") {
    val hk = SkewStats.heavyKeys(keyed, cap = 8)
      .as[(Long, Long, Long, Long)].collect().toList
    // only the size-100 bucket exceeds cap 8: g = ceil(100/8) = 13 groups,
    // 13 * 14 / 2 = 91 grid cells
    assert(hk == List((1L, 100L, 13L, 91L)))
    // the announced shape matches what saltedAllPairs actually does: the
    // pair count of the salted plan equals the exact all-pairs count
    val sized = keyed.where($"key" === 1L)
      .withColumn("bucket_n", lit(100L))
    assert(CandidateGen.saltedAllPairs(sized, 8).count() == 4950L)
  }

  test("heavyKeys rejects a non-positive cap") {
    intercept[IllegalArgumentException] {
      SkewStats.heavyKeys(keyed, 0)
    }
  }

  test("exactQuantiles: PERCENTILE_DISC semantics vs a sorted-array reference, " +
    "partitioning-independent") {
    // values with heavy ties and a skewed tail, deliberately mis-partitioned
    val vals = ((1 to 400).map(_ % 7) ++ (1 to 40).map(i => 100 + i)).map(_.toDouble)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_)), 13),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0)
    val got = SkewStats.exactQuantiles(df, "v", qs)
      .as[(Double, Double)].collect().toMap
    val sorted = vals.sorted
    val n = sorted.length
    qs.foreach { q =>
      // reference: smallest value whose cumulative count reaches q*n
      val want = sorted(math.max(0, math.ceil(q * n).toInt - 1))
      assert(got(q) == want, s"q=$q: got ${got(q)}, want $want")
    }
    assert(got(0.0) == sorted.head && got(1.0) == sorted.last)
  }

  test("exactQuantiles: nulls excluded, probe validation") {
    val df = Seq(Some(1.0), None, Some(3.0), Some(2.0)).toDF("v")
    val got = SkewStats.exactQuantiles(df, "v", Seq(0.5))
      .as[(Double, Double)].collect().toMap
    assert(got(0.5) == 2.0)
    intercept[IllegalArgumentException] {
      SkewStats.exactQuantiles(df, "v", Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      SkewStats.exactQuantiles(df, "v", Seq.empty)
    }
  }

  test("exactQuantilesByGroup: PERCENTILE_DISC per stratum, hand values, " +
    "guards") {
    // group a: {1, 2, 3, 4} -> p50 = 2 (cum 2 >= 0.5*4), p100 = 4
    // group b: {10, 10, 30}  -> p50 = 10, p100 = 30 (ties collapse)
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4),
      ("b", 10), ("b", 10), ("b", 30)).toDF("g", "v")
    val got = SkewStats.exactQuantilesByGroup(df, "g", "v", Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(got == Map(("a", 0.5) -> 2.0, ("a", 1.0) -> 4.0,
      ("b", 0.5) -> 10.0, ("b", 1.0) -> 30.0))
    intercept[IllegalArgumentException] {
      SkewStats.exactQuantilesByGroup(df, "g", "v", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      SkewStats.exactQuantilesByGroup(df, "g", "v", Seq(-0.1))
    }
  }

  test("numericHistogram: dense zero-filled bins, edge ownership, " +
    "under/overflow rows, null exclusion") {
    // [0, 10) x 2 bins of width 5: -3 underflows, 0 and 4.9 -> bin 0,
    // 5 (left edge ownership) -> bin 1, 10 and 12 overflow, null dropped
    val df = Seq(Some(-3.0), Some(0.0), Some(4.9), Some(5.0), Some(10.0),
      Some(12.0), None).toDF("v")
    val rows = SkewStats.numericHistogram(df, "v", 0.0, 10.0, 2)
      .collect().map(r => r.getAs[Long]("bin") ->
        ((Option(r.get(1)), Option(r.get(2)), r.getAs[Long]("n")))).toMap
    assert(rows.keySet == Set(-1L, 0L, 1L, 2L))
    assert(rows(-1L) == ((None, Some(0.0), 1L)))       // open lo edge
    assert(rows(0L) == ((Some(0.0), Some(5.0), 2L)))
    assert(rows(1L) == ((Some(5.0), Some(10.0), 1L)))  // 5.0 owned left
    assert(rows(2L) == ((Some(10.0), None, 2L)))       // open hi edge
    // an empty bin still appears, zero-filled
    val sparse = SkewStats.numericHistogram(
      Seq(1.0).toDF("v"), "v", 0.0, 10.0, 2).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n")).toMap
    assert(sparse == Map(-1L -> 0L, 0L -> 1L, 1L -> 0L, 2L -> 0L))
    intercept[IllegalArgumentException] {
      SkewStats.numericHistogram(df, "v", 5.0, 5.0, 2)
    }
    intercept[IllegalArgumentException] {
      SkewStats.numericHistogram(df, "v", 0.0, 10.0, 0)
    }
    // FP edge: the largest double below hi has (v-lo)/w rounding UP to
    // nBins for many (hi, nBins); the clamp must keep it in the last
    // REAL bin, never the overflow row
    val edge = Seq(Math.nextDown(0.1)).toDF("v")
    val eRows = SkewStats.numericHistogram(edge, "v", 0.0, 0.1, 3)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n")).toMap
    assert(eRows(2L) == 1L && eRows(3L) == 0L,
      s"in-range edge value leaked into overflow: $eRows")
  }
}
