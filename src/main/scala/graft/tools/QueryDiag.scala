package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job/stage wall-time breakdown of one SparkEntry query:
  * `runMain graft.tools.QueryDiag <name> [sfDir] [cpus] [reps=2]`.
  * [[measure]] is the reusable core ([[MoverDiag]] drives it over every
  * round-over-round wall mover). */
object QueryDiag {

  /** Warm (last-rep) wall + task-cpu seconds for one query. task_cpu is the
    * steal-immune cost figure — wall moves with hypervisor windows, summed
    * executor cpu does not (the round-2 protocol lesson). `verbose` prints
    * per-rep lines and the warm rep's job/stage breakdown. */
  def measure(spark: SparkSession, name: String, sfDir: String,
      reps: Int = 2, verbose: Boolean = true): (Double, Double) = {
    @volatile var report = false
    val repCpuNs = new java.util.concurrent.atomic.AtomicLong()
    val repRunNs = new java.util.concurrent.atomic.AtomicLong()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?")
            .take(60) + s" [stages=${j.stageIds.size}]"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        Option(jobStart.get(j.jobId)).foreach { case (t0, d) =>
          val w = (System.nanoTime() - t0) / 1e9
          if (report && w > 0.05) println(f"[job] id=${j.jobId}%3d wall=$w%6.2f s  $d")
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for (s <- i.submissionTime; e <- i.completionTime)
          yield (e - s) / 1000.0).getOrElse(-1.0)
        val m = i.taskMetrics
        // per-rep TOTALS across every stage (incl. sub-0.1s ones)
        repCpuNs.addAndGet(m.executorCpuTime)
        repRunNs.addAndGet(m.executorRunTime * 1000000L)
        if (report && wall > 0.1)
          println(f"  [stage] ${i.stageId}%4d wall=$wall%6.2f cpu=${m.executorCpuTime / 1e9}%6.2f " +
            f"gc=${m.jvmGCTime / 1e3}%5.2f tasks=${i.numTasks}%4d ${i.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = graft.SparkEntry.queries(name)
    var warm = (0.0, 0.0)
    try {
      for (r <- 1 to reps) {
        report = verbose && r == reps // only the last (warm) rep is reported
        val t0 = System.nanoTime()
        repCpuNs.set(0); repRunNs.set(0)
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9 // BEFORE the drain sleep
        // listener events are async — give the bus a moment to drain
        Thread.sleep(1000)
        warm = (wall, repCpuNs.get / 1e9)
        if (verbose)
          println(f"[rep] $name rep $r: wall=$wall%.2f s " +
            f"task_cpu=${repCpuNs.get / 1e9}%.2f s task_run=${repRunNs.get / 1e9}%.2f s")
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    warm
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 2
    val spark = session(cpus)
    measure(spark, name, sfDir, reps)
    spark.stop()
  }

  private[tools] def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
