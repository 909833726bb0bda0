package graft.tools

/** Single-thread microbenchmark of the BQ coarse kernel's inner loop,
  * outside Spark: separates kernel arithmetic cost from job/GC overhead
  * for the nq10k coarse-pass adjudication. */
object KernelMicro {
  def main(args: Array[String]): Unit = {
    val words = 15
    val rows = 31250
    val nq = 5000
    val k = 2000
    val rnd = new java.util.Random(7)
    val base = Array.fill(rows)(Array.fill(words)(rnd.nextLong()))
    val qs = Array.fill(nq)(Array.fill(words)(rnd.nextLong()))
    // (a) raw hamming sum — arithmetic floor
    var sink = 0L
    for (rep <- 0 until 3) {
      val t0 = System.nanoTime()
      var r = 0
      while (r < rows) {
        val b = base(r)
        var qi = 0
        while (qi < nq) {
          sink += graft.functions.BqKernel.hamming(qs(qi), b)
          qi += 1
        }
        r += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[micro] raw_hamming rep$rep: $sec%.2f s (${rows.toLong * nq / sec / 1e6}%.0f Mpairs/s, ${sec * 1e9 / (rows.toLong * nq)}%.1f ns/pair)")
    }
    // (b) hamming + dense bound + TopBuffer offers — the kernel shape
    for (rep <- 0 until 3) {
      val bufs = Array.fill(nq)(new graft.index.TopBuffer(k))
      val bounds = Array.fill(nq)(Double.PositiveInfinity)
      val t0 = System.nanoTime()
      var r = 0
      while (r < rows) {
        val b = base(r)
        var qi = 0
        while (qi < nq) {
          val d = graft.functions.BqKernel.hamming(qs(qi), b).toDouble
          if (d <= bounds(qi)) {
            val buf = bufs(qi)
            buf.offer(d, r.toLong)
            bounds(qi) = buf.bound
          }
          qi += 1
        }
        r += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[micro] kernel rep$rep: $sec%.2f s (${sec * 1e9 / (rows.toLong * nq)}%.1f ns/pair)")
    }
    println(s"[micro] sink=$sink")
  }
}
