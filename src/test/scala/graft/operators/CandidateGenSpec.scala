package graft.operators

import graft.SparkSpec

class CandidateGenSpec extends SparkSpec {
  import spark.implicits._

  test("small buckets emit all intra-bucket pairs, across-bucket none") {
    val keyed = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 200L), (5L, 200L),
      (6L, 300L)).toDF("id", "key")
    val pairs = CandidateGen.pairsFromBuckets(keyed)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("pairs are distinct even when a pair shares several buckets") {
    val keyed = Seq((1L, 100L), (2L, 100L), (1L, 200L), (2L, 200L)).toDF("id", "key")
    val pairs = CandidateGen.pairsFromBuckets(keyed).as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("oversized buckets fall back to sorted-neighborhood but stay connected") {
    val big = (0L until 100L).map(i => (i, 7L)).toDF("id", "key")
    val pairs = CandidateGen.pairsFromBuckets(big, maxBucketSize = 10,
      neighborhood = 4).as[(Long, Long)].collect().toSet
    // bounded: at most n * w pairs, far below n^2/2
    assert(pairs.size <= 100 * 4)
    assert(pairs.size >= 99) // connectivity: consecutive ids always paired
    assert((0L until 99L).forall(i => pairs.contains((i, i + 1))))
    // a single connected component results
    val cc = ConnectedComponents.run(
      pairs.toSeq.toDF("src", "dst")).select("component").distinct().count()
    assert(cc == 1L)
  }

  test("simhash chunk buckets guarantee candidates within hamming chunks-1") {
    val rng = new scala.util.Random(9)
    val base = rng.nextLong()
    // flip exactly 3 bits -> with 4 chunks, must share >= 1 chunk
    val flipped = base ^ (1L << 3) ^ (1L << 20) ^ (1L << 63)
    val df = Seq((1L, base), (2L, flipped)).toDF("id", "simhash")
    val buckets = CandidateGen.simhashChunkBuckets(df, "id", "simhash", 4)
    val pairs = CandidateGen.pairsFromBuckets(buckets).as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }
}
