package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/**
 * Distributed globally-ordered scans — the scale-safe replacement for
 * `Window.orderBy(...)` with no `partitionBy` (which funnels the entire
 * input through ONE task; the round-1 `WindowExec: No Partition Defined`
 * warnings all came from that pattern).
 *
 * Shape: range-repartition on the order column (equal keys always land in
 * one partition — Spark's RangePartitioner assigns by value comparison), run
 * the window PER PARTITION in parallel, then stitch partitions together with
 * per-partition boundary values. The boundary set has at most
 * `spark.sql.shuffle.partitions` rows — a config-bounded scalar-scale
 * driver action, independent of data size — so collecting it is the same
 * class of driver action as a global `count()`.
 *
 * Works on any input size: 10^12 rows cost two parallel passes + one
 * O(partitions) collect, vs. the single-task O(n) sort the naive window pays.
 */
object OrderedScan {

  /**
   * Cumulative sums over a global ordering, fully distributed.
   *
   * For each `(valueCol -> outCol)` adds `outCol` = sum of `valueCol` over
   * all rows with `orderCol` <= this row's (rows-between semantics within
   * ties: callers must pre-aggregate tie groups to one row per distinct
   * `orderCol` — the same contract the reference sweep has).
   */
  def cumSums(df: DataFrame, orderCol: String,
      sums: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df.repartitionByRange(nPart, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-partition totals: <= nPart rows, safe to bring to the driver
    val totalAggs = sums.map { case (v, _) => sum(col(v)).as(s"__t_$v") }
    val totals = parted.groupBy("__pid").agg(totalAggs.head, totalAggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> sums.indices.map(i =>
        Option(r.get(i + 1)).map(x => BigDecimal(x.toString)).getOrElse(BigDecimal(0))))
      .sortBy(_._1)

    // running offset per partition = sum of all earlier partitions' totals
    var acc = sums.map(_ => BigDecimal(0))
    val offsetRows = totals.map { case (pid, ts) =>
      val row = Row.fromSeq(pid +: acc.map(_.toDouble))
      acc = acc.zip(ts).map { case (a, t) => a + t }
      row
    }
    val offSchema = StructType(StructField("__pid", IntegerType, nullable = false) +:
      sums.map { case (v, _) =>
        StructField(s"__off_$v", org.apache.spark.sql.types.DoubleType, nullable = false)
      })
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows.toSeq, 1), offSchema)

    val w = Window.partitionBy("__pid").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = sums.foldLeft(parted) { case (d, (v, out)) =>
      d.withColumn(out, sum(col(v)).over(w))
    }
    val joined = withLocal.join(broadcast(offsets), "__pid")
    val stitched = sums.foldLeft(joined) { case (d, (v, out)) =>
      d.withColumn(out, col(out) + col(s"__off_$v"))
    }
    stitched.drop("__pid" +: sums.map { case (v, _) => s"__off_$v" }: _*)
  }

  /**
   * Cyclic global successor: adds `outCol` = the next distinct-row value of
   * `orderCol` in ascending order; the globally-largest row wraps around to
   * the globally-smallest value. Distributed via the same range-partition +
   * per-partition `lead` + boundary-stitch shape as [[cumSums]].
   */
  def cyclicLead(df: DataFrame, orderCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df.repartitionByRange(nPart, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-partition minima (<= nPart rows): partition i's last row leads
    // into the min of the next non-empty partition; the last wraps to the
    // global min
    val minsRaw = parted.groupBy("__pid").agg(min(col(orderCol)).as("__mn")).collect()
    if (minsRaw.isEmpty) return df.withColumn(outCol, lit(null))
    val mins = minsRaw.map(r => r.getInt(0) -> r.get(1)).sortBy(_._1)
    val globalMin = mins.head._2
    val nextOf: Map[Int, Any] = mins.indices.map { i =>
      val next = if (i + 1 < mins.length) mins(i + 1)._2 else globalMin
      mins(i)._1 -> next
    }.toMap

    val orderField = df.schema(orderCol)
    val nextSchema = StructType(Seq(
      StructField("__pid", IntegerType, nullable = false),
      StructField("__next", orderField.dataType, nullable = true)))
    val nextDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        nextOf.toSeq.map { case (p, v) => Row(p, v) }, 1), nextSchema)

    val w = Window.partitionBy("__pid").orderBy(col(orderCol))
    parted
      .withColumn(outCol, lead(col(orderCol), 1).over(w))
      .join(broadcast(nextDf), "__pid")
      .withColumn(outCol, coalesce(col(outCol), col("__next")))
      .drop("__pid", "__next")
  }

  /** Convenience: single cumulative sum. */
  def cumSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame =
    cumSums(df, orderCol, Seq(valueCol -> outCol))
}
