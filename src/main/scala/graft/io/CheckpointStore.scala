package graft.io

import graft.model.{FileLineage, StageMetric}
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.udf

/**
 * Per-stage checkpointing with lineage + metrics side tables — the Spark
 * analogue of the reference's day-granular state snapshots + tail replay
 * (reference: ea/sim/main/data/buckets/bucket_data.py:49-69) and its
 * retrieval/scoring caches (ea/sim/main/methods/retrieval_model.py:39-47).
 *
 * A stage is resumable iff its directory exists with a _SUCCESS marker:
 * `stage(name)(compute)` either reads the checkpoint or computes, writes, and
 * records
 *
 *  - one `StageMetric` row (run id, stage, rows, wall ms) in `_metrics` —
 *    mirroring time_info.json
 *    (ea/sim/dev/scripts/training/evaluating/eval_fast.py:112-120), and
 *  - one `FileLineage` row PER OUTPUT FILE (run id, stage, file, bytes, rows)
 *    in `_lineage` — the per-partition lineage that lets a resumed run audit
 *    exactly which partition produced what without re-scanning the stage.
 *
 * On the parquet backend both come from the written files' FOOTERS: a
 * driver-side metadata read (O(files), the same listing Spark does to plan a
 * scan), exact row counts with zero per-row work and no task-retry
 * double-count risk. A non-parquet [[TableIO]] (Iceberg) falls back to an
 * accumulator riding the write itself — Iceberg's own snapshot summary
 * already carries per-file stats, so no `_lineage` rows are duplicated for
 * it.
 */
final class CheckpointStore(spark: SparkSession, root: String, runId: String,
    io: TableIO = null) {

  private val tio: TableIO =
    Option(io).getOrElse(new ParquetTableIO(spark, s"$root/$runId"))

  private def path(stage: String) = s"$root/$runId/$stage"
  private def metricsPath = s"$root/$runId/_metrics"
  private def lineagePath = s"$root/$runId/_lineage"

  def exists(stage: String): Boolean = {
    val p = new Path(path(stage), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def stage(name: String)(compute: => DataFrame): DataFrame = {
    if (exists(name)) {
      tio.read(path(name))
    } else {
      import spark.implicits._
      val t0 = System.nanoTime()
      // wall_ms covers compute + write only — lineage bookkeeping (the
      // driver-side footer reads and the _lineage append) is timed out of
      // it, so stage timings stay comparable across backends and runs
      val (rows, ms) = tio match {
        case _: ParquetTableIO =>
          // pure write — the plan stays whole-stage codegen end to end;
          // row counts come from the footers afterwards
          tio.write(compute, path(name))
          val wall = (System.nanoTime() - t0) / 1000000
          val files = fileLineage(name)
          files.toDS().write.mode(SaveMode.Append).parquet(lineagePath)
          (files.map(_.rows).sum, wall)
        case _ =>
          // catalog-table backend: no listable directory — count during the
          // single write pass (accumulator; task retries can overcount, the
          // backend's own snapshot metadata is the authoritative figure)
          val acc = spark.sparkContext.longAccumulator(s"graft.stage.$name.rows")
          val tick = udf { () => acc.add(1L); true }.asNondeterministic()
          tio.write(compute.filter(tick()), path(name))
          (acc.value.toLong, (System.nanoTime() - t0) / 1000000)
      }
      Seq(StageMetric(runId, name, rows, ms)).toDS().write
        .mode(SaveMode.Append).parquet(metricsPath)
      tio.read(path(name))
    }
  }

  /** Per-file lineage of a just-written parquet stage, from footers only.
   * Listing is RECURSIVE so a partitioned write (part files nested under
   * `key=value/` subdirectories) is fully covered; the lineage `file` field
   * is the path relative to the stage directory so partition values stay
   * auditable. A parquet write always leaves at least one data file, so an
   * empty listing means the layout was not understood — fail loudly rather
   * than record a silent rows=0. */
  private def fileLineage(stage: String): Seq[FileLineage] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path(stage))
    val fs = dir.getFileSystem(conf)
    val it = fs.listFiles(dir, /* recursive = */ true)
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next()).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty,
      s"stage '$stage' wrote no parquet data files under $dir — " +
        "unrecognized layout; refusing to record empty lineage")
    // qualify the base first: listFiles returns fully-qualified (file:/...)
    // paths, and URI.relativize against a schemeless base silently returns
    // the child unchanged instead of the relative path
    val base = fs.makeQualified(dir).toUri
    files
      .map(f => (base.relativize(f.getPath.toUri).getPath, f))
      .sortBy(_._1)
      .map { case (rel, f) =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
        val n = try reader.getRecordCount finally reader.close()
        FileLineage(runId, stage, rel, f.getLen, n)
      }
  }

  def metrics(): DataFrame = sideTable(metricsPath,
    org.apache.spark.sql.Encoders.product[StageMetric].schema)

  /** The `_lineage` table: one row per (stage, output file). */
  def lineage(): DataFrame = sideTable(lineagePath,
    org.apache.spark.sql.Encoders.product[FileLineage].schema)

  private def sideTable(p: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val hp = new Path(p)
    if (hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp))
      spark.read.parquet(p)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
