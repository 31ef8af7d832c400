package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventReplaySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // (event_id, image_id, cluster_id, ts, label)
    (1L, "x", 10L, ts("2024-01-01 00:00:00"), true),
    (2L, "x", 20L, ts("2024-01-03 00:00:00"), true),   // re-attach x: 10 -> 20
    (3L, "y", 10L, ts("2024-01-02 00:00:00"), false),
    (4L, "z", -1L, ts("2024-01-02 12:00:00"), true),   // new-issue event
    (5L, "w", 30L, ts("2024-01-04 00:00:00"), true)
  ).toDF("event_id", "image_id", "cluster_id", "ts", "label")

  test("currentAssignments keeps the last attach per entity") {
    val cur = EventReplay.currentAssignments(events)
      .select("image_id", "cluster_id").as[(String, Long)].collect().toMap
    assert(cur == Map("x" -> 20L, "y" -> 10L, "z" -> -1L, "w" -> 30L))
  }

  test("admitted: only assigned + labeled when onlyLabeled") {
    val adm = EventReplay.admitted(events,
        contentHashes = Seq.empty[(String, Long)].toDF("image_id", "content_hash"),
        onlyLabeled = true, dupAttach = true)
      .select("event_id").as[Long].collect().toSet
    assert(adm == Set(1L, 2L, 5L)) // 3 unlabeled, 4 unassigned
  }

  test("admitted with dupAttach=false keeps first event per content hash") {
    val hashes = Seq(("x", 100L), ("y", 100L), ("w", 200L))
      .toDF("image_id", "content_hash")
    val adm = EventReplay.admitted(events, hashes,
        onlyLabeled = false, dupAttach = false)
      .select("event_id").as[Long].collect().toSet
    // hash 100: first chronologically is event 1 (x@01-01); events 2,3 dropped
    assert(adm == Set(1L, 5L))
  }

  test("priorEventsWithin counts events inside the retention window only") {
    val got = EventReplay.priorEventsWithin(events, forgetDays = 1,
        partitionCol = "image_id")
      .select("event_id", "prior_in_window").as[(Long, Long)].collect().toMap
    // x@01-03 has a prior x event at 01-01 — outside 1 day; all counts 0
    assert(got.values.forall(_ == 0L))
    val got7 = EventReplay.priorEventsWithin(events, forgetDays = 7,
        partitionCol = "image_id")
      .select("event_id", "prior_in_window").as[(Long, Long)].collect().toMap
    assert(got7(2L) == 1L && got7(1L) == 0L)
  }

  test("timeSlice is a half-open interval") {
    val sliced = EventReplay.timeSlice(events, "ts",
        lit("2024-01-02").cast("timestamp"), lit("2024-01-03").cast("timestamp"))
      .select("event_id").as[Long].collect().toSet
    assert(sliced == Set(3L, 4L)) // event 2 at exactly 01-03 excluded
  }

  test("sessionize: gap splits, boundary gap stays, per-key indexing, " +
    "durations") {
    // user 1: events at t=0, 100, 1900 with gap 1000 -> sessions
    // {0,100} (gap 1800 > 1000 splits) and {1900}; a gap of EXACTLY 1000
    // must NOT split (strict >): user 2 at t=0, 1000
    def ts(s: Long) = new Timestamp(s * 1000L)
    val events = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(100)), (3L, 1L, ts(1900)),
      (4L, 2L, ts(0)), (5L, 2L, ts(1000)))
      .toDF("event_id", "user_id", "ts")
    val out = EventReplay.sessionize(events, "user_id", "ts", 1000L,
        tieCol = Some("event_id"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("start_ts"),
          r.getAs[Long]("duration_s")))).toMap
    assert(out.keySet == Set((1L, 0L), (1L, 1L), (2L, 0L)))
    assert(out((1L, 0L)) == ((2L, 0L, 100L)))
    assert(out((1L, 1L)) == ((1L, 1900L, 0L)))
    assert(out((2L, 0L)) == ((2L, 0L, 1000L))) // boundary gap: one session
    // deterministic under equal timestamps: tie-broken by event_id, the
    // session structure is identical however ties land
    val tied = Seq((10L, 3L, ts(5)), (11L, 3L, ts(5)), (12L, 3L, ts(5000)))
      .toDF("event_id", "user_id", "ts")
    val t3 = EventReplay.sessionize(tied, "user_id", "ts", 1000L,
      tieCol = Some("event_id")).collect()
    assert(t3.length == 2 &&
      t3.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      EventReplay.sessionize(events, "user_id", "ts", 0L)
    }
    // null timestamps are dropped, not phantom sessions shifting indices
    val withNull = Seq((20L, 4L, Option.empty[Timestamp]),
      (21L, 4L, Some(ts(100))), (22L, 4L, Some(ts(5000))))
      .toDF("event_id", "user_id", "ts")
    val s4 = EventReplay.sessionize(withNull, "user_id", "ts", 1000L,
        tieCol = Some("event_id"))
      .select("session_idx", "n_events").as[(Long, Long)].collect().toSet
    assert(s4 == Set((0L, 1L), (1L, 1L)),
      s"null ts must vanish, real sessions keep 0-based indices: $s4")
  }
}
