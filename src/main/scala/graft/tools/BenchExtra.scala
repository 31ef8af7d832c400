package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Subset bench runner for optimization iteration (guide §1.4): times ONLY the
 * named SparkEntry queries with the exact Bench methodology — same session
 * config, one untimed sf0.001 warm-up pass, min of two timed passes at the
 * target sf, noop-sink materialization — so per-query numbers are comparable
 * with bench.json without paying the full 125-query suite plus scaling probe.
 *
 * {{{
 * runMain graft.tools.BenchExtra q98_bm25_index_topk,q125_filter_stack \
 *   [sfDir=/root/testdata/sf0.1] [cpus=32] [passes=2]
 * }}}
 *
 * `all` as the name list runs the whole suite (still without the probe).
 * Results append one JSON line per run to bench_extra.jsonl.
 */
object BenchExtra {

  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchExtra <q1,q2,...|all> [sfDir] [cpus] [passes]")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val passes = if (args.length > 3) args(3).toInt else 2
    val names =
      if (args(0) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val missing = names.filterNot(graft.SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val smallDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try materialize(graft.SparkEntry.queries(n)(spark, smallDir))
      catch { case _: Throwable => () }
    }
    val clearCache = sys.env.get("BENCH_EXTRA_CLEAR_CACHE").contains("1")
    val times = names.map { n =>
      if (clearCache) spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(n)
      val ts = (1 to passes).flatMap { _ =>
        try Some(timed(materialize(graft.SparkEntry.queries(n)(spark, sfDir))))
        catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $n failed: ${e.getMessage}"); None }
      }
      val best = if (ts.isEmpty) -1.0 else ts.min
      println(f"[bench-extra] $n min=$best%.3f s passes=${ts.map(t => f"$t%.3f").mkString(",")}")
      n -> best
    }
    spark.sparkContext.setJobDescription(null)
    val qs = times.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", "}")
    val total = times.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"subset","value":${"%.3f".format(total)},""" +
      s""""unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus}"""
    println(line)
    Files.writeString(Paths.get("bench_extra.jsonl"), line + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
