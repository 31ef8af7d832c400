package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.AttachEvent

class StreamingAttachSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState replays attach/detach transitions over a stream") {
    implicit val s = spark
    val events = Seq(
      AttachEvent(1L, "x", 10L, ts("2024-01-01 00:00:00"), label = true),
      AttachEvent(2L, "x", 20L, ts("2024-01-03 00:00:00"), label = true),
      AttachEvent(3L, "y", 10L, ts("2024-01-02 00:00:00"), label = false))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AttachEvent](spark)
    val changes = StreamingAttach.updates(input.toDS())
    val q = changes.writeStream.format("memory").queryName("attach_changes")
      .outputMode("append").start()
    try {
      input.addData(events.take(1))
      q.processAllAvailable()
      input.addData(events.drop(1)) // second micro-batch: re-attach + new image
      q.processAllAvailable()
      val out = spark.sql("SELECT image_id, prev_cluster, cluster_id FROM attach_changes")
        .as[(String, Long, Long)].collect().toSet
      assert(out == Set(("x", -1L, 10L), ("x", 10L, 20L), ("y", -1L, 10L)))
    } finally q.stop()
  }

  test("daily windowed attach counts with watermark") {
    implicit val s = spark
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AttachEvent](spark)
    val agg = StreamingAttach.dailyAttachCounts(input.toDS())
    val q = agg.toDF().writeStream.format("memory").queryName("daily_counts")
      .outputMode("complete").start()
    try {
      input.addData(Seq(
        AttachEvent(1L, "a", 1L, ts("2024-01-01 05:00:00"), label = true),
        AttachEvent(2L, "b", 1L, ts("2024-01-01 07:00:00"), label = true),
        AttachEvent(3L, "c", 2L, ts("2024-01-02 01:00:00"), label = true)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT cluster_id, n_attaches FROM daily_counts")
        .as[(Long, Long)].collect().toMap
      assert(rows == Map(1L -> 2L, 2L -> 1L))
    } finally q.stop()
  }
}
