package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.config.DedupConfig
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

final case class StreamDoc(doc_id: Long, text: String, ts: Timestamp)

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private type Doc = StreamDoc
  private def Doc(id: Long, text: String, ts: Timestamp) = StreamDoc(id, text, ts)

  test("exact streaming dedup drops same-content arrivals within the horizon") {
    val input = MemoryStream[Doc](spark)
    val out = StreamingDedup.exactWithinWatermark(input.toDF(), "text", "ts", "1 day")
    val q = out.writeStream.format("memory").queryName("sd_exact")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        Doc(1L, "the quick brown fox", ts("2024-01-01 00:00:00")),
        Doc(2L, "a completely different doc", ts("2024-01-01 00:01:00"))))
      q.processAllAvailable()
      // second micro-batch: same content (different id + punctuation — the
      // content hash normalizes), plus one novel doc
      input.addData(Seq(
        Doc(3L, "The quick brown fox!", ts("2024-01-01 00:02:00")),
        Doc(4L, "yet another novel doc", ts("2024-01-01 00:03:00"))))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM sd_exact").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L), s"kept=$kept")
    } finally q.stop()
  }

  test("stream-static band join flags near-dups of the corpus exactly once") {
    val cfg = DedupConfig.default
    val corpus = Seq(
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12",
      "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12").toDF("text")
    val bands = StreamingDedup.corpusBands(corpus, "text", cfg)

    val input = MemoryStream[Doc](spark)
    val flagged = StreamingDedup.flagKnownNearDups(
      input.toDF(), bands, "doc_id", "text", "ts", cfg, "1 day")
    val q = flagged.writeStream.format("memory").queryName("sd_flagged")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        // near-dup of corpus doc 1 (one token changed) -> must flag
        Doc(10L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 zz", ts("2024-01-01 00:00:00")),
        // unrelated -> must pass silently
        Doc(11L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12", ts("2024-01-01 00:01:00"))))
      q.processAllAvailable()
      // exact copy of corpus doc 2 arriving twice -> flagged once
      input.addData(Seq(
        Doc(12L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12", ts("2024-01-01 00:02:00")),
        Doc(12L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12", ts("2024-01-01 00:03:00"))))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM sd_flagged").as[Long].collect().toSeq
      assert(got.sorted == Seq(10L, 12L), s"flagged=$got")
    } finally q.stop()
  }
}
