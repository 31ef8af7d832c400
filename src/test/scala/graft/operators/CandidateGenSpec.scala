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

  test("salted oversized buckets produce EXACTLY the brute-force pair set") {
    // mixed sizes: one bucket far over the cap, one at the boundary, one
    // under, plus ids shared across buckets (the final distinct must dedup)
    val rng = new scala.util.Random(7)
    val keyed = ((0L until 97L).map(i => (i, 11L)) ++        // 97 > cap
      (0L until 10L).map(i => (i, 22L)) ++                   // 10 = cap
      (200L until 203L).map(i => (i, 33L)) ++                // under cap
      (0L until 50L).map(_ => (rng.nextInt(97).toLong, 11L)) // dup bucket rows
      ).toDF("id", "key")
    val got = CandidateGen.pairsFromBuckets(keyed, maxBucketSize = 10,
      saltOversized = true).as[(Long, Long)].collect().toSet
    val rows = keyed.as[(Long, Long)].collect().toSet
    val brute = (for {
      (a, k1) <- rows; (b, k2) <- rows if k1 == k2 && a < b
    } yield (a, b)).toSet
    assert(got == brute)
  }

  test("salted exact pairs match brute force on a randomized skewed keyspace") {
    // zipf-ish key mass (floor(sqrt(uniform)) puts ~10% of all rows on the
    // heaviest key) — every bucket size regime from singleton to ~12x cap
    val rng = new scala.util.Random(99)
    val rows = (0 until 3000).map { i =>
      (i.toLong, math.floor(math.sqrt(rng.nextInt(400).toDouble)).toLong)
    }
    val got = CandidateGen.pairsFromBuckets(rows.toDF("id", "key"),
      maxBucketSize = 25, saltOversized = true)
      .as[(Long, Long)].collect().toSet
    val brute = rows.groupBy(_._2).values.flatMap { g =>
      val ids = g.map(_._1)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    assert(got == brute)
  }

  test("salted pairs survive string ids and a group size of 1") {
    val keyed = Seq("d", "a", "c", "b", "e").map((_, 5L)).toDF("id", "key")
    val got = CandidateGen.pairsFromBuckets(keyed, maxBucketSize = 1,
      saltOversized = true).as[(String, String)].collect().toSet
    val ids = Seq("a", "b", "c", "d", "e")
    val brute = (for (a <- ids; b <- ids if a < b) yield (a, b)).toSet
    assert(got == brute)
  }

  test("simhash subset buckets guarantee a candidate at hamming <= hammingMax") {
    val df = Seq((1L, 0x0123456789ABCDEFL),
      (2L, 0x0123456789ABCDEFL ^ (1L << 3) ^ (1L << 20) ^ (1L << 63)))
      .toDF("id", "simhash")
    val buckets = CandidateGen.simhashChunkBuckets(df, "id", "simhash", 3)
    val pairs = CandidateGen.pairsFromBuckets(buckets).as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("subset-key recall property: every planted pair within hammingMax collides") {
    // 100 random bases per d; partner flips EXACTLY d random bit positions
    // (worst case: <= d corrupts fewer chunks). Guarantee: >= 1 shared key —
    // under BOTH the scale-safe scheme (no hint) and the corpus-sized one.
    val rng = new scala.util.Random(1234)
    for (d <- Seq(0, 1, 2, 3, 4, 6); nRows <- Seq(0L, 200L)) {
      val rows = (0 until 100).flatMap { i =>
        val base = rng.nextLong()
        val positions = rng.shuffle((0 until 64).toList).take(d)
        val flipped = positions.foldLeft(base)((h, p) => h ^ (1L << p))
        Seq((i.toLong * 2, base), (i.toLong * 2 + 1, flipped))
      }
      val buckets = CandidateGen.simhashChunkBuckets(
        rows.toDF("id", "simhash"), "id", "simhash", d, nRows)
      // direct key-collision check (not pairsFromBuckets: its skew fallback
      // is a separate concern) — partner pairs differ by exactly 1 in id
      val collided = buckets.as("x").join(buckets.as("y"),
          $"x.key" === $"y.key" && $"x.id" + 1 === $"y.id" && $"x.id" % 2 === 0)
        .select($"x.id").distinct().count()
      assert(collided == 100L,
        s"d=$d nRows=$nRows: only $collided/100 planted pairs collided")
    }
  }

  test("subset scheme sizes to the corpus when a row-count hint is given") {
    // guarantee is scheme-independent; the hint only tunes occupancy/cost —
    // small corpora keep the classic cheap layout
    assert(CandidateGen.subsetScheme(3, 1000L) == (4, 1))
    assert(CandidateGen.subsetScheme(3, 4L << 20) == (4, 1)) // 64 * 2^16 boundary
    // past the occupancy budget (expected rows/bucket > 64) the wide
    // key-space scheme takes over; no hint -> conservative scale-safe
    assert(CandidateGen.subsetScheme(3, 100L * 1000 * 1000) == (8, 5))
    assert(CandidateGen.subsetScheme(3, 0L) == (8, 5))
    // d=1's classic scheme already has 32 content bits — fine at 10^9 rows
    assert(CandidateGen.subsetScheme(1, 1000L * 1000 * 1000) == (2, 1))
  }

  test("subset scheme picks >= 32 content bits per key where affordable") {
    assert(CandidateGen.subsetScheme(0) == (2, 2))  // 1 key, full 64 bits
    assert(CandidateGen.subsetScheme(1) == (2, 1))  // 2 keys, 32 bits
    assert(CandidateGen.subsetScheme(2) == (4, 2))  // 6 keys, 32 bits
    assert(CandidateGen.subsetScheme(3) == (8, 5))  // 56 keys, 40 bits
    assert(CandidateGen.subsetScheme(4) == (8, 4))  // 70 keys, 32 bits
    // d >= 5: no affordable >= 32-bit scheme; degrade to widest keys
    assert(CandidateGen.subsetScheme(5) == (8, 3))
    // keys-per-row stays bounded and the pigeonhole precondition (s <= c - d)
    // holds for every supported d
    for (d <- 0 to 15) {
      val (c, s) = CandidateGen.subsetScheme(d)
      assert(c > d && s >= 1 && s <= c - d, s"d=$d -> ($c, $s)")
      assert((0 until c).combinations(s).size <= 256)
    }
  }
}
