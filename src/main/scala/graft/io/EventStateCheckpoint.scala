package graft.io

import graft.operators.EventReplay
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Day-keyed event-state snapshots with tail replay — the Spark analogue of
 * the reference's `StateModel` checkpointing: state is pickled per day and a
 * later day warms up from the nearest earlier snapshot, replaying only the
 * tail of the log (reference: ea/sim/main/data/buckets/bucket_data.py:49-69,
 * event_state_model.py:137-152).
 *
 * State here is the assignment table (one row per entity: its last attach as
 * of the day boundary). Correctness of warm-up rests on "last event per key"
 * being associative: last(last(prefix) ∪ tail) = last(prefix ∪ tail).
 *
 * Day `d` covers events with `ts < epochDay(d)` — snapshots are half-open
 * like the reference's DataSegment.
 */
final class EventStateCheckpoint(store: CheckpointStore,
    idCol: String = "image_id", clusterCol: String = "cluster_id",
    tsCol: String = "ts", evIdCol: String = "event_id") {

  private def stageName(day: Int) = s"state_day_$day"

  private def dayBound(day: Int) =
    timestamp_seconds(lit(day * 86400L)) // epoch-day boundary, UTC

  /** Replay the full log up to `day` and persist it as that day's snapshot
    * (no-op if the snapshot exists — CheckpointStore presence semantics). */
  def snapshot(events: DataFrame, day: Int): DataFrame =
    store.stage(stageName(day)) {
      EventReplay.currentAssignments(
        events.where(col(tsCol) < dayBound(day)),
        idCol, clusterCol, tsCol, evIdCol)
    }

  /** Days with an existing snapshot, ascending. */
  def snapshotDays(maxDay: Int): Seq[Int] =
    (0 to maxDay).filter(d => store.exists(stageName(d)))

  /**
   * Assignment state as of `day`: load the nearest snapshot <= day and
   * replay only the tail `[snapDay, day)`; with no snapshot, full replay.
   * Produces exactly `snapshot(events, day)`'s frame (spec-asserted).
   */
  def stateAsOf(events: DataFrame, day: Int): DataFrame = {
    val upTo = events.where(col(tsCol) < dayBound(day))
    snapshotDays(day).lastOption match {
      case None => EventReplay.currentAssignments(upTo, idCol, clusterCol, tsCol, evIdCol)
      case Some(snapDay) =>
        val warm = store.stage(stageName(snapDay))(
          sys.error("snapshot listed but missing")) // exists => reads
        val tail = upTo.where(col(tsCol) >= dayBound(snapDay))
          .select(warm.columns.map(col): _*)
        EventReplay.currentAssignments(
          warm.unionByName(tail), idCol, clusterCol, tsCol, evIdCol)
    }
  }
}
