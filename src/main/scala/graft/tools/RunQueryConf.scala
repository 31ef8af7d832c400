package graft.tools

import org.apache.spark.sql.SparkSession

/** [[RunQuery]] with extra session confs — the guide §1 A/B harness for
  * config hypotheses (e.g. "is AQE partition coalescing serializing this
  * query's reduce stage?") WITHOUT touching the frozen bench session:
  * `runMain graft.tools.RunQueryConf <name> <sfDir> <reps> <cpus> [k=v ...]`. */
object RunQueryConf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val reps = args(2).toInt
    val cpus = args(3).toInt
    val confs = args.drop(4).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[q] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
