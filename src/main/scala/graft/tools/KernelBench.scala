package graft.tools

import graft.functions.HashKernels

/**
 * Single-thread micro-benchmark of the two MinHash signature kernels —
 * the measured basis for the OPH claim (SURVEY q74): signatures/sec for
 * the classic Carter–Wegman kernel (numHashes multiply-adds per shingle)
 * vs one-permutation hashing with optimal densification (one mix per
 * shingle + a densification sweep). Pure JVM loops over pre-generated
 * shingle arrays, no Spark — this isolates the kernel cost the q74-vs-q15
 * bench walls dilute with join/shuffle overhead.
 *
 * `runMain graft.tools.KernelBench [shinglesPerDoc] [numHashes]`
 */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val perDoc = if (args.length > 0) args(0).toInt else 200
    val numHashes = if (args.length > 1) args(1).toInt else 128
    val nDocs = 20000
    val rng = new scala.util.Random(HashKernels.mix64(42L))
    val docs = Array.fill(nDocs)(Array.fill(perDoc)(rng.nextLong()))

    def time(label: String, f: Array[Long] => Array[Long]): Double = {
      // warm-up pass for JIT, then two measured passes; report the faster
      // (steal windows only inflate)
      docs.foreach(f)
      val secs = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        var acc = 0L
        docs.foreach { d => acc ^= f(d)(0) }
        val s = (System.nanoTime() - t0) / 1e9
        if (acc == 42L) println("") // keep the loop un-eliminable
        s
      }
      val best = secs.min
      println(f"$label%-10s ${nDocs / best}%,.0f docs/sec  (${best}%.3f s / $nDocs docs)")
      nDocs / best
    }

    println(s"shinglesPerDoc=$perDoc numHashes=$numHashes nDocs=$nDocs")
    val classic = time("classic", HashKernels.minhashArray(_, numHashes, 42L))
    val oph = time("oph", HashKernels.ophArray(_, numHashes, 42L))
    println(f"speedup: ${oph / classic}%.1fx")
  }
}
