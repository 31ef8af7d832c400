package graft.io

import graft.model.StageMetric
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Per-stage parquet checkpointing with a lineage/metrics side table — the
 * Spark analogue of the reference's day-granular state snapshots + tail replay
 * (reference: ea/sim/main/data/buckets/bucket_data.py:49-69) and its
 * retrieval/scoring caches (ea/sim/main/methods/retrieval_model.py:39-47).
 *
 * A stage is resumable iff its parquet directory exists with a _SUCCESS
 * marker: `stage(name)(compute)` either reads the checkpoint or computes,
 * writes, and records a StageMetric row (run id, stage, rows, wall ms) to the
 * `_metrics` table — mirroring time_info.json
 * (ea/sim/dev/scripts/training/evaluating/eval_fast.py:112-120).
 */
final class CheckpointStore(spark: SparkSession, root: String, runId: String) {

  private def path(stage: String) = s"$root/$runId/$stage"
  private def metricsPath = s"$root/$runId/_metrics"

  def exists(stage: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(stage), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def stage(name: String)(compute: => DataFrame): DataFrame = {
    if (exists(name)) {
      spark.read.parquet(path(name))
    } else {
      val t0 = System.nanoTime()
      compute.write.mode(SaveMode.Overwrite).parquet(path(name))
      val out = spark.read.parquet(path(name))
      val rows = out.count()
      val ms = (System.nanoTime() - t0) / 1000000
      import spark.implicits._
      Seq(StageMetric(runId, name, rows, ms)).toDS().write
        .mode(SaveMode.Append).parquet(metricsPath)
      out
    }
  }

  def metrics(): DataFrame =
    if (exists("_metrics") || {
      val p = new org.apache.hadoop.fs.Path(metricsPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }) spark.read.parquet(metricsPath)
    else spark.emptyDataset(org.apache.spark.sql.Encoders.product[StageMetric]).toDF()
}
