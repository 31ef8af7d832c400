package graft.io

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.EventReplay
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EventStateCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 0): Timestamp =
    new Timestamp((day * 86400L + h * 3600L) * 1000L)

  // (event_id, image_id, cluster_id, ts)
  private def events(): DataFrame = Seq(
    (1L, "a", 10L, ts(1)),
    (2L, "b", 10L, ts(2)),
    (3L, "a", 20L, ts(3)), // a re-attaches
    (4L, "c", 30L, ts(6)),
    (5L, "b", 40L, ts(7))  // b re-attaches after the snapshot day
  ).toDF("event_id", "image_id", "cluster_id", "ts")

  private def store() = new CheckpointStore(spark,
    Files.createTempDirectory("graft-esc").toString, "run1")

  private def asMap(df: DataFrame): Map[String, Long] =
    df.select("image_id", "cluster_id").as[(String, Long)].collect().toMap

  test("stateAsOf equals full replay, with and without a snapshot") {
    val ckpt = new EventStateCheckpoint(store())
    val ev = events()
    val fullReplay = asMap(EventReplay.currentAssignments(
      ev.where(col("ts") < timestamp_seconds(lit(8 * 86400L)))))
    // no snapshot yet: full replay path
    assert(asMap(ckpt.stateAsOf(ev, 8)) == fullReplay)
    // snapshot day 5, then warm-up + tail replay must give the same state
    ckpt.snapshot(ev, 5)
    assert(ckpt.snapshotDays(8) == Seq(5))
    assert(asMap(ckpt.stateAsOf(ev, 8)) == fullReplay)
    assert(fullReplay == Map("a" -> 20L, "b" -> 40L, "c" -> 30L))
  }

  test("warm-up really reads the snapshot, not the pre-snapshot log") {
    val ckpt = new EventStateCheckpoint(store())
    ckpt.snapshot(events(), 5)
    // corrupt the pre-day-5 log: if stateAsOf replayed it, 'a' would be 99
    val corrupted = events()
      .withColumn("cluster_id",
        when(col("ts") < timestamp_seconds(lit(5 * 86400L)), lit(99L))
          .otherwise(col("cluster_id")))
    val got = asMap(ckpt.stateAsOf(corrupted, 8))
    assert(got("a") == 20L, "pre-snapshot events must come from the snapshot")
    assert(got("b") == 40L, "tail events must still replay")
    assert(got("c") == 30L)
  }

  test("snapshot at the exact query day returns the snapshot itself") {
    val ckpt = new EventStateCheckpoint(store())
    val ev = events()
    ckpt.snapshot(ev, 4)
    val want = asMap(EventReplay.currentAssignments(
      ev.where(col("ts") < timestamp_seconds(lit(4 * 86400L)))))
    assert(asMap(ckpt.stateAsOf(ev, 4)) == want)
  }
}
