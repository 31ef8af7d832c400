package graft.io

import graft.model.StageMetric
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, udf}

/**
 * Per-stage checkpointing with a lineage/metrics side table — the Spark
 * analogue of the reference's day-granular state snapshots + tail replay
 * (reference: ea/sim/main/data/buckets/bucket_data.py:49-69) and its
 * retrieval/scoring caches (ea/sim/main/methods/retrieval_model.py:39-47).
 *
 * A stage is resumable iff its directory exists with a _SUCCESS marker:
 * `stage(name)(compute)` either reads the checkpoint or computes, writes,
 * and records a StageMetric row (run id, stage, rows, wall ms) to the
 * `_metrics` table — mirroring time_info.json
 * (ea/sim/dev/scripts/training/evaluating/eval_fast.py:112-120).
 *
 * Storage goes through [[TableIO]] (parquet fallback here; Iceberg snapshots
 * on a catalog-configured cluster). Row counts come from an accumulator fed
 * during the write itself — never a second read of the stage output.
 */
final class CheckpointStore(spark: SparkSession, root: String, runId: String,
    io: TableIO = null) {

  private val tio: TableIO =
    Option(io).getOrElse(new ParquetTableIO(spark, s"$root/$runId"))

  private def path(stage: String) = s"$root/$runId/$stage"
  private def metricsPath = s"$root/$runId/_metrics"

  def exists(stage: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(stage), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def stage(name: String)(compute: => DataFrame): DataFrame = {
    if (exists(name)) {
      tio.read(path(name))
    } else {
      val t0 = System.nanoTime()
      // row count rides the write as an accumulator behind an always-true
      // non-deterministic filter — counting during the single pass instead
      // of re-scanning the written table afterwards
      val acc = spark.sparkContext.longAccumulator(s"graft.stage.$name.rows")
      val tick = udf { () => acc.add(1L); true }.asNondeterministic()
      tio.write(compute.filter(tick()), path(name))
      val ms = (System.nanoTime() - t0) / 1000000
      import spark.implicits._
      Seq(StageMetric(runId, name, acc.value, ms)).toDS().write
        .mode(org.apache.spark.sql.SaveMode.Append).parquet(metricsPath)
      tio.read(path(name))
    }
  }

  def metrics(): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(metricsPath)
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.parquet(metricsPath)
    else spark.emptyDataset(org.apache.spark.sql.Encoders.product[StageMetric]).toDF()
  }
}
