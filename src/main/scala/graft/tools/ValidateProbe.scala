package graft.tools

import graft.operators.Validate
import org.apache.spark.sql.SparkSession

/** Validate-stage-only scaling probe with GC accounting:
  * `runMain graft.tools.ValidateProbe <inputDir> <cpus> [rounds=3]`. */
object ValidateProbe {
  def main(args: Array[String]): Unit = {
    val inputDir = args(0)
    val cpus = args(1).toInt
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MPB", "128m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var t = 0L; gcBeans.forEach(b => t += b.getCollectionTime); t
    }
    val images = spark.read.parquet(inputDir)
    for (r <- 1 to rounds) {
      val g0 = gcMs
      val t0 = System.nanoTime()
      Validate.perRow(spark, images).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[vprobe] cpus=$cpus round $r: wall=$wall%.2f s gc=${(gcMs - g0) / 1000.0}%.2f s")
    }
    spark.stop()
  }
}
