package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0 until 2000)
    .map(i => (i.toLong, s"stratum${i % 4}", s"host${i % 37}", 1 + (i * 7) % 90))
    .toDF("doc_id", "lang", "source", "n_tokens")

  test("deterministicSample: reproducible, rate-accurate, nested across rates") {
    val s20 = Curation.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val s20b = Curation.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(s20 == s20b)
    assert(math.abs(s20.size / 2000.0 - 0.2) < 0.05, s"rate off: ${s20.size}")
    // threshold monotonicity: a lower rate is a SUBSET of a higher one
    val s50 = Curation.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s20.subsetOf(s50))
    // different salt = a different (still rate-accurate) sample
    val alt = Curation.deterministicSample(docs, "doc_id", 0.2, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(alt != s20)
    // boundary rates
    assert(Curation.deterministicSample(docs, "doc_id", 1.0).count() == 2000)
    assert(Curation.deterministicSample(docs, "doc_id", 0.0).count() == 0)
  }

  test("deterministicSample keeps duplicate keys together") {
    val dup = docs.union(docs) // every key twice
    val n = Curation.deterministicSample(dup, "doc_id", 0.3)
      .groupBy("doc_id").count().select("count").as[Long].collect()
    assert(n.nonEmpty && n.forall(_ == 2), "a key was split by sampling")
  }

  test("stratifiedSample: per-stratum rates hold, absent strata use default") {
    val rates = Map("stratum0" -> 0.8, "stratum1" -> 0.1)
    val got = Curation.stratifiedSample(docs, "doc_id", "lang", rates, 0.4)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // each stratum has 500 rows
    assert(math.abs(got("stratum0") / 500.0 - 0.8) < 0.08, got.toString)
    assert(math.abs(got("stratum1") / 500.0 - 0.1) < 0.08, got.toString)
    assert(math.abs(got("stratum2") / 500.0 - 0.4) < 0.08, got.toString)
    assert(math.abs(got("stratum3") / 500.0 - 0.4) < 0.08, got.toString)
    // membership within a stratum matches the plain sampler at that rate
    // (same salt, same key -> same hash -> same decision)
    val plain = Curation.deterministicSample(
        docs.where(col("lang") === "stratum0"), "doc_id", 0.8)
      .select("doc_id").as[Long].collect().toSet
    val strat = Curation.stratifiedSample(docs, "doc_id", "lang", rates, 0.4)
      .where(col("lang") === "stratum0")
      .select("doc_id").as[Long].collect().toSet
    assert(strat == plain)
  }

  test("capPerKey: at most n per key, best-first, deterministic") {
    val capped = Curation.capPerKey(docs, "source", 10,
      Seq(col("n_tokens").desc, col("doc_id").asc))
    val perKey = capped.groupBy("source").count().select("count").as[Long].collect()
    assert(perKey.forall(_ <= 10))
    assert(perKey.count(_ == 10) == 37) // every host has > 10 rows
    // kept rows are exactly the top-10 by (n_tokens desc, doc_id asc)
    val gotHost0 = capped.where(col("source") === "host0")
      .select("doc_id").as[Long].collect().toSet
    val expectHost0 = docs.where(col("source") === "host0")
      .select("doc_id", "n_tokens").as[(Long, Int)].collect()
      .sortBy { case (id, t) => (-t, id) }.take(10).map(_._1).toSet
    assert(gotHost0 == expectHost0)
  }

  test("packAssignments equals the sequential fold, straddles boundaries") {
    val budget = 512L
    val got = Curation.packAssignments(docs, "doc_id", "n_tokens", budget)
      .select("doc_id", "start_offset", "bin_first", "bin_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // driver-side sequential oracle
    var off = 0L
    val rows = docs.select("doc_id", "n_tokens").as[(Long, Int)].collect().sortBy(_._1)
    rows.zip(got).foreach { case ((id, n), (gid, gOff, gFirst, gLast)) =>
      assert(gid == id)
      assert(gOff == off, s"offset at $id")
      assert(gFirst == off / budget, s"bin_first at $id")
      val last = if (n > 0) (off + n - 1) / budget else off / budget
      assert(gLast == last, s"bin_last at $id")
      off += n
    }
    // the layout genuinely straddles window boundaries somewhere
    assert(got.exists { case (_, _, f, l) => l > f })
    // zero-token docs take no space and stay in one bin
    val withEmpty = docs.union(Seq((9999L, "x", "h", 0)).toDF(docs.columns: _*))
    val e = Curation.packAssignments(withEmpty, "doc_id", "n_tokens", budget)
      .where(col("doc_id") === 9999L)
      .select("bin_first", "bin_last").as[(Long, Long)].head()
    assert(e._1 == e._2)
  }
}
