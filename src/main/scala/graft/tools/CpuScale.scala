package graft.tools

import java.util.concurrent.Executors

/** Pure-CPU thread-scaling calibration for the scaling probe: measures the
  * machine's (hypervisor's) effective core budget independent of Spark.
  * Result on the bench guest (32 "cores", Firecracker): linear to 16
  * threads (3.93x from 4->16), only ~1.5x from 16->32 — which (with the
  * memory-bandwidth inflation measured by ProbeDiag) is why the north-rule
  * probe compares local[2] vs local[8] (see Bench.scala).
  * `runMain graft.tools.CpuScale` */
object CpuScale {
  private def spin(iters: Long): Long = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < iters) { h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= i; i += 1 }
    h
  }

  def main(args: Array[String]): Unit = {
    val iters = 800000000L
    spin(iters / 4) // JIT warm-up
    for (threads <- Seq(1, 2, 4, 8, 16, 32)) {
      val ex = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val fs = (0 until threads).map(_ => ex.submit(new Runnable {
        def run(): Unit = spin(iters)
      }))
      fs.foreach(_.get())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads%2d wall=$sec%6.2f s  work/sec=${threads / sec}%.2f units")
      ex.shutdown()
    }
  }
}
