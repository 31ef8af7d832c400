package graft.tools

import java.lang.management.ManagementFactory
import java.util.concurrent.{Callable, Executors, TimeUnit}

import graft.synth.{ImageCodec, ImageGen}

/**
 * Spark-free decode-scaling calibration: decode the same synthesized PNG/JPEG
 * payloads on T threads and report wall + process-cpu per T. Separates the
 * guest's memory-bandwidth ceiling from engine/scheduler effects in the
 * north-rule probe: if plain threads already scale < 4x from 2->8 on pure
 * decode, the loss is the box, not the pipeline.
 * `runMain graft.tools.DecodeScale [imagesPerThreadSet=4000] [threadsCsv=2,8]`
 */
object DecodeScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 4000
    val threads = (if (args.length > 1) args(1) else "2,8").split(",").map(_.toInt)
    val os = ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    // fixed corpus of payload byte arrays — the REAL generator mix (PNG
    // originals + JPEG re-encodes + resizes), same bytes for every T
    val payloads: Array[Array[Byte]] =
      (0 until 48).flatMap(b => ImageGen.cluster(42L, b.toLong, 64).map(_.bytes))
        .filter(_.nonEmpty).toArray
    // JIT + page warm
    (0 until 500).foreach(i => ImageCodec.decode(payloads(i % payloads.length)))

    val results = threads.map { t =>
      val pool = Executors.newFixedThreadPool(t)
      val cpu0 = os.getProcessCpuTime
      val t0 = System.nanoTime()
      val tasks = (0 until t).map { w =>
        new Callable[Long] {
          override def call(): Long = {
            var acc = 0L
            var i = 0
            while (i < n) {
              val img = ImageCodec.decode(payloads((w * n + i) % payloads.length))
              acc += img.getWidth + ImageCodec.averageHash(img)
              i += 1
            }
            acc
          }
        }
      }
      import scala.jdk.CollectionConverters._
      pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (os.getProcessCpuTime - cpu0) / 1e9
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      val thr = t.toLong * n / wall
      println(f"[decode] threads=$t%2d wall=$wall%7.2f s cpu=$cpu%7.2f s " +
        f"decodes/s=$thr%8.1f per-thread=$thr/t: ${thr / t}%7.1f")
      t -> (wall, thr / t)
    }
    results.sortBy(_._1).sliding(2).foreach {
      case Array((tLo, (_, perLo)), (tHi, (_, perHi))) =>
        println(f"[decode] per-thread efficiency $tLo%d->$tHi%d: ${perHi / perLo}%.3f")
      case _ => ()
    }
  }
}
