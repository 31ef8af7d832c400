package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one SparkEntry query by name with timing, repeated, optionally with
  * extra session confs — the guide §1 A/B harness for config hypotheses
  * (e.g. "is AQE partition coalescing serializing this query's reduce?")
  * WITHOUT touching the frozen bench session:
  * `runMain graft.tools.RunQuery <name> [sfDir] [reps] [cpus] [k=v ...]`. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = if (args.length > 3) args(3).toInt else 32
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
