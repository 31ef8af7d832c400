package graft.streaming

import java.sql.Timestamp

import graft.model.AttachEvent
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming form of the reference's event-sourced StateModel
 * (reference: ea/sim/main/data/buckets/event_state_model.py:37-62): the
 * attach/detach log becomes a stream; per-image cluster membership is
 * flatMapGroupsWithState state; re-attach transitions emit change records.
 *
 * The batch pipeline stays the primary path (SURVEY.md section 2.8) — this
 * operator is the incremental mode for tailing a live attach log.
 */
object StreamingAttach {

  /** Emitted on every membership change: previous cluster (-1 if none) -> new. */
  final case class AttachChange(
      image_id: String,
      prev_cluster: Long,
      cluster_id: Long,
      ts: Timestamp)

  /** Running per-image state: the current cluster + last update time. */
  final case class AttachState(cluster_id: Long, last_ts: Timestamp)

  /** Latest-attach-wins state update, idempotent per (image, ts):
    * out-of-order events older than the current state are ignored
    * (reference replays chronologically; a stream cannot assume that). */
  def updates(events: Dataset[AttachEvent])(
      implicit spark: SparkSession): Dataset[AttachChange] = {
    import spark.implicits._
    events
      .groupByKey(_.image_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: String, evs: Iterator[AttachEvent], state: GroupState[AttachState]) => {
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[AttachChange]()
          sorted.foreach { e =>
            val newer = cur.forall(s => e.ts.getTime >= s.last_ts.getTime)
            if (newer && cur.forall(_.cluster_id != e.cluster_id)) {
              out += AttachChange(id, cur.map(_.cluster_id).getOrElse(-1L),
                e.cluster_id, e.ts)
              cur = Some(AttachState(e.cluster_id, e.ts))
            } else if (newer) {
              cur = Some(AttachState(e.cluster_id, e.ts))
            }
          }
          cur.foreach(state.update)
          out.iterator
        })
  }

  /** Tumbling per-day attach counts with a watermark for late events —
    * the streaming analogue of the reference's day-granular snapshots
    * (ea/sim/main/data/buckets/bucket_data.py:49-69). */
  def dailyAttachCounts(events: Dataset[AttachEvent]): Dataset[_] =
    events.toDF()
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("cluster_id"))
      .agg(count(lit(1)).as("n_attaches"),
        approx_count_distinct("image_id").as("n_images"))
}
