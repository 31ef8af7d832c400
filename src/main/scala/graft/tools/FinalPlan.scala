package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Materialize one SparkEntry query, then print the FINAL (AQE-re-optimized)
  * physical plan — the runtime truth the initial `explain` hides
  * (AQEShuffleRead coalescing, runtime join rewrites, ReusedExchange):
  * `runMain graft.tools.FinalPlan <name> [sfDir] [cpus] [k=v ...]`. */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val confs = args.drop(3).map { kv =>
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
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // execute df's OWN QueryExecution (a noop write would spawn a separate
    // one and leave this plan un-adapted — isFinalPlan=false), then print:
    // the AdaptiveSparkPlan is now the re-optimized final plan
    df.queryExecution.toRdd.count()
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
