package graft.operators

import graft.SparkSpec
import graft.functions.HashKernels

/** Winnowed-anchor exact long-match detection ([[Dedup.longMatchPairs]]). */
class LongMatchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val MIN_LEN = 24 // w = MIN_LEN - K + 1 = 17

  private def randStr(rng: scala.util.Random, n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  test("winnowing guarantee: strings sharing a >= w+k-1 run share an anchor") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 200) {
      val w = 2 + rng.nextInt(40)
      val k = 2 + rng.nextInt(12)
      val run = randStr(rng, w + k - 1 + rng.nextInt(30))
      val a = randStr(rng, rng.nextInt(50)) + run + randStr(rng, rng.nextInt(50))
      val b = randStr(rng, rng.nextInt(50)) + run + randStr(rng, rng.nextInt(50))
      val aa = HashKernels.winnowAnchorsFromChars(a, k, w, 42L).toSet
      val ab = HashKernels.winnowAnchorsFromChars(b, k, w, 42L).toSet
      assert((aa intersect ab).nonEmpty,
        s"trial $trial (k=$k w=$w): no shared anchor despite ${run.length}-char shared run")
    }
  }

  test("anchor kernel: edge cases, determinism, density") {
    assert(HashKernels.winnowAnchorsFromChars(null, 4, 8, 1L).isEmpty)
    assert(HashKernels.winnowAnchorsFromChars("abc", 4, 8, 1L).isEmpty) // < k
    assert(HashKernels.winnowAnchorsFromChars("abcd", 4, 8, 1L).length == 1) // m <= w
    val rng = new scala.util.Random(11)
    val s = randStr(rng, 5000)
    val a1 = HashKernels.winnowAnchorsFromChars(s, K, 17, 42L)
    val a2 = HashKernels.winnowAnchorsFromChars(s, K, 17, 42L)
    assert(a1.toSeq == a2.toSeq, "not deterministic")
    assert(a1.toSeq == a1.toSeq.sorted && a1.distinct.length == a1.length,
      "anchors must be value-sorted and distinct")
    // expected density ~ 2/(w+1) per gram; allow generous slack both ways
    val m = s.length - K + 1
    assert(a1.length <= m && a1.length >= m / (17 * 4),
      s"density off: ${a1.length} anchors for $m grams at w=17")
    // seed changes the anchor set
    assert(HashKernels.winnowAnchorsFromChars(s, K, 17, 43L).toSet != a1.toSet)
  }

  test("longMatchPairs == brute-force all-pairs LCS filter, exactly") {
    val rng = new scala.util.Random(13)
    // corpus: random docs; some pairs share planted runs of varying length —
    // above, at, and below the MIN_LEN threshold
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var id = 0L
    for (_ <- 0 until 12) {
      val runLen = MIN_LEN - 6 + rng.nextInt(14) // straddles the threshold
      val run = randStr(rng, runLen)
      docs += ((id, randStr(rng, 10 + rng.nextInt(30)) + run + randStr(rng, rng.nextInt(20))))
      id += 1
      docs += ((id, randStr(rng, rng.nextInt(25)) + run + randStr(rng, 5 + rng.nextInt(25))))
      id += 1
    }
    for (_ <- 0 until 16) { docs += ((id, randStr(rng, 30 + rng.nextInt(60)))); id += 1 }
    val df = docs.toSeq.toDF("doc_id", "text")

    val got = Dedup.longMatchPairs(df, "doc_id", "text", MIN_LEN, K)
      .select("a", "b", "lcs").as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      l = HashKernels.lcsLength(ta, tb, 2000) if l >= MIN_LEN
    } yield (ia, ib, l)).toSet
    assert(brute.nonEmpty, "no qualifying pair planted — test corpus broken")
    assert(got == brute, s"missing=${(brute diff got).take(5)} extra=${(got diff brute).take(5)}")
  }

  test("recall does not depend on set similarity (the q40 gap)") {
    // one shared 40-char run inside otherwise fully disjoint 400-char docs:
    // trigram Jaccard ~ 0.05 — far below any LSH band regime
    val rng = new scala.util.Random(17)
    val run = randStr(rng, 40)
    val a = randStr(rng, 200) + run + randStr(rng, 200)
    val b = randStr(rng, 200) + run + randStr(rng, 200)
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Dedup.longMatchPairs(df, "doc_id", "text", minLen = 32, k = 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }
}
