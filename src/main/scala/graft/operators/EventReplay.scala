package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch replay of the attach-event log — the declarative equivalent of the
 * reference's event-sourced StateModel
 * (reference: ea/sim/main/data/buckets/event_state_model.py:37-121):
 * mutable per-event state becomes window functions over the ordered log.
 *
 * Expected schema: (event_id LONG, image_id/any id, cluster_id LONG,
 * ts TIMESTAMP, label BOOLEAN) — FIXTURES.md section 2.
 */
object EventReplay {

  /** Time-slice selector: start <= ts < end
    * (reference DataSegment, ea/sim/main/data/buckets/bucket_data.py:43-47). */
  def timeSlice(events: DataFrame, tsCol: String, start: Column, end: Column): DataFrame =
    events.where(col(tsCol) >= start && col(tsCol) < end)

  /**
   * Current assignment per entity = last attach event in ts order
   * (reference attach/detach replay, event_state_model.py:45-62; batch form
   * is the window-last pattern from SURVEY.md section 2.8).
   */
  def currentAssignments(events: DataFrame, idCol: String = "image_id",
      clusterCol: String = "cluster_id", tsCol: String = "ts",
      evIdCol: String = "event_id"): DataFrame =
    events
      .withColumn("__rn", row_number().over(
        Window.partitionBy(idCol).orderBy(col(tsCol).desc, col(evIdCol).desc)))
      .where(col("__rn") === 1)
      .drop("__rn")

  /**
   * Event admission predicate (reference event_state_model.py:81-104):
   * assigned (cluster != -1), optionally labeled-only, and optionally
   * first-of-content-hash only (the `with_dup_attach=false` anti-join path —
   * event_state_model.py:94-101). `contentHashes` maps id -> content hash.
   */
  def admitted(events: DataFrame, contentHashes: DataFrame,
      onlyLabeled: Boolean, dupAttach: Boolean,
      idCol: String = "image_id", clusterCol: String = "cluster_id",
      tsCol: String = "ts", evIdCol: String = "event_id"): DataFrame = {
    val base0 = events.where(col(clusterCol) =!= -1L)
    val base = if (onlyLabeled) base0.where(col("label")) else base0
    if (dupAttach) base
    else {
      // keep only the chronologically-first event per content hash
      val withHash = base.join(contentHashes, idCol)
      withHash
        .withColumn("__rn", row_number().over(
          Window.partitionBy("content_hash")
            .orderBy(col(tsCol), col(evIdCol))))
        .where(col("__rn") === 1)
        .drop("__rn", "content_hash")
    }
  }

  /**
   * Cross-issue unique member listing, prefix semantics: per (issue, content
   * hash), only the chronologically-first member is listed — later events
   * with an already-seen hash inside the same issue are suppressed
   * (reference: ea/sim/main/data/buckets/stack_state_model.py:25-47, the
   * `unique=True` hash dedup of issue members).
   */
  def uniqueMembers(events: DataFrame, issueCol: String, hashCol: String,
      orderCol: String): DataFrame =
    events.withColumn("__mn",
        min(col(orderCol)).over(Window.partitionBy(issueCol, hashCol)))
      .where(col(orderCol) === col("__mn"))
      .drop("__mn")

  /**
   * As-of candidate counts under the retention window: for each admitted
   * event, how many prior events fall within `forgetDays`
   * (reference forget_days retention, ea/sim/main/data/buckets/issues_selector.py:17-48,
   * and per-event pre-state snapshots, event_state_model.py:106-121).
   * Expressed as a range-frame window — no self-join.
   */
  def priorEventsWithin(events: DataFrame, forgetDays: Int,
      partitionCol: String, tsCol: String = "ts"): DataFrame =
    events.withColumn("prior_in_window",
      count(lit(1)).over(
        Window.partitionBy(partitionCol)
          .orderBy(col(tsCol).cast("timestamp").cast("long"))
          .rangeBetween(-forgetDays.toLong * 86400L, -1)))

  /**
   * Gap-based sessionization — split each key's event stream wherever
   * consecutive events are more than `gapSeconds` apart, and roll each
   * session up to one row. The burst/bot-detection primitive of a crawl
   * pipeline (a "user" hammering ingestion with near-identical uploads
   * shows up as one long dense session long before content signals fire)
   * and the classic warm-up for per-entity rate caps ([[Curation]]'s
   * capPerKey consumes the session counts).
   *
   * Scale: both windows partition BY KEY (never unpartitioned) — one
   * shuffle on the key, then per-partition sorts; ties on ts break by a
   * second sort column when provided so session indexing is deterministic
   * under concurrent-equal timestamps.
   *
   * @param tieCol optional deterministic tie-break within equal timestamps
   *               (e.g. the event id)
   * @return one row per session: (key, session_idx — 0-based per key in
   *         time order, n_events, start_ts, end_ts, duration_s). Rows
   *         whose timestamp casts to null are dropped (no position on the
   *         time axis — they must not become phantom sessions).
   */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tieCol: Option[String] = None): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    // rows whose timestamp casts to null carry no position on the time
    // axis: dropped here rather than becoming phantom null-bounded
    // sessions that would shift every real session's index
    val prepared = events.select(
        col(keyCol) +: col(tsCol).cast("timestamp").cast("long").as("__ts") +:
          tieCol.map(c => col(c).as("__tie")).toSeq: _*)
      .where(col("__ts").isNotNull)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts") +: tieCol.map(_ => col("__tie")).toSeq: _*)
    val prevTs = lag(col("__ts"), 1).over(w)
    val flagged = prepared
      .withColumn("__new_session",
        when(prevTs.isNull || col("__ts") - prevTs > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("__session_idx",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
    flagged.groupBy(col(keyCol), col("__session_idx").as("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__ts")).as("start_ts"),
        max(col("__ts")).as("end_ts"))
      .withColumn("duration_s", col("end_ts") - col("start_ts"))
  }
}
