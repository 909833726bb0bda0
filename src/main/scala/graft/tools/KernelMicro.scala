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
    // (c) flattened query words + inline hamming, double gate
    val qflat = new Array[Long](nq * words)
    for (qi <- 0 until nq; w <- 0 until words) qflat(qi * words + w) = qs(qi)(w)
    for (rep <- 0 until 3) {
      val bufs = Array.fill(nq)(new graft.index.TopBuffer(k))
      val bounds = Array.fill(nq)(Double.PositiveInfinity)
      val t0 = System.nanoTime()
      var r = 0
      while (r < rows) {
        val b = base(r)
        var qi = 0
        var off = 0
        while (qi < nq) {
          var acc = 0
          var w = 0
          while (w < words) {
            acc += java.lang.Long.bitCount(qflat(off + w) ^ b(w)); w += 1
          }
          val d = acc.toDouble
          if (d <= bounds(qi)) {
            val buf = bufs(qi)
            buf.offer(d, r.toLong)
            bounds(qi) = buf.bound
          }
          qi += 1; off += words
        }
        r += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[micro] kernel_flat rep$rep: $sec%.2f s (${sec * 1e9 / (rows.toLong * nq)}%.1f ns/pair)")
    }
    // (d) flattened + INT bounds gate (no FP in the reject path)
    for (rep <- 0 until 3) {
      val bufs = Array.fill(nq)(new graft.index.TopBuffer(k))
      val boundsI = Array.fill(nq)(Int.MaxValue)
      val t0 = System.nanoTime()
      var r = 0
      while (r < rows) {
        val b = base(r)
        var qi = 0
        var off = 0
        while (qi < nq) {
          var acc = 0
          var w = 0
          while (w < words) {
            acc += java.lang.Long.bitCount(qflat(off + w) ^ b(w)); w += 1
          }
          if (acc <= boundsI(qi)) {
            val buf = bufs(qi)
            buf.offer(acc.toDouble, r.toLong)
            val bb = buf.bound
            boundsI(qi) = if (bb >= Int.MaxValue.toDouble) Int.MaxValue else bb.toInt
          }
          qi += 1; off += words
        }
        r += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[micro] kernel_flat_int rep$rep: $sec%.2f s (${sec * 1e9 / (rows.toLong * nq)}%.1f ns/pair)")
    }
    // (e) transposed: queries OUTER in blocks, rows inner — the row block
    // streams from L2 while one query's words sit in registers
    val rowsFlat = new Array[Long](rows * words)
    for (r <- 0 until rows; w <- 0 until words) rowsFlat(r * words + w) = base(r)(w)
    for (rep <- 0 until 3) {
      val bufs = Array.fill(nq)(new graft.index.TopBuffer(k))
      val t0 = System.nanoTime()
      var qi = 0
      while (qi < nq) {
        val buf = bufs(qi)
        val q0 = qflat(qi * words); val q1 = qflat(qi * words + 1)
        val q2 = qflat(qi * words + 2); val q3 = qflat(qi * words + 3)
        val q4 = qflat(qi * words + 4); val q5 = qflat(qi * words + 5)
        val q6 = qflat(qi * words + 6); val q7 = qflat(qi * words + 7)
        val q8 = qflat(qi * words + 8); val q9 = qflat(qi * words + 9)
        val q10 = qflat(qi * words + 10); val q11 = qflat(qi * words + 11)
        val q12 = qflat(qi * words + 12); val q13 = qflat(qi * words + 13)
        val q14 = qflat(qi * words + 14)
        var bound = Int.MaxValue
        var r = 0
        var ro = 0
        while (r < rows) {
          import java.lang.Long.bitCount
          val acc = bitCount(rowsFlat(ro) ^ q0) + bitCount(rowsFlat(ro + 1) ^ q1) +
            bitCount(rowsFlat(ro + 2) ^ q2) + bitCount(rowsFlat(ro + 3) ^ q3) +
            bitCount(rowsFlat(ro + 4) ^ q4) + bitCount(rowsFlat(ro + 5) ^ q5) +
            bitCount(rowsFlat(ro + 6) ^ q6) + bitCount(rowsFlat(ro + 7) ^ q7) +
            bitCount(rowsFlat(ro + 8) ^ q8) + bitCount(rowsFlat(ro + 9) ^ q9) +
            bitCount(rowsFlat(ro + 10) ^ q10) + bitCount(rowsFlat(ro + 11) ^ q11) +
            bitCount(rowsFlat(ro + 12) ^ q12) + bitCount(rowsFlat(ro + 13) ^ q13) +
            bitCount(rowsFlat(ro + 14) ^ q14)
          if (acc <= bound) {
            buf.offer(acc.toDouble, r.toLong)
            val bb = buf.bound
            bound = if (bb >= Int.MaxValue.toDouble) Int.MaxValue else bb.toInt
          }
          r += 1; ro += words
        }
        qi += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[micro] kernel_qouter rep$rep: $sec%.2f s (${sec * 1e9 / (rows.toLong * nq)}%.1f ns/pair)")
    }
    // (f) query-outer with a GENERIC word loop (no 15-word unroll) — the
    // shape a dim-agnostic kernel can actually ship
    for (rep <- 0 until 3) {
      val bufs = Array.fill(nq)(new graft.index.TopBuffer(k))
      val t0 = System.nanoTime()
      var qi = 0
      while (qi < nq) {
        val buf = bufs(qi)
        val qoff = qi * words
        var bound = Int.MaxValue
        var r = 0
        var ro = 0
        while (r < rows) {
          var acc = 0
          var w = 0
          while (w < words) {
            acc += java.lang.Long.bitCount(rowsFlat(ro + w) ^ qflat(qoff + w))
            w += 1
          }
          if (acc <= bound) {
            buf.offer(acc.toDouble, r.toLong)
            val bb = buf.bound
            bound = if (bb >= Int.MaxValue.toDouble) Int.MaxValue else bb.toInt
          }
          r += 1; ro += words
        }
        qi += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[micro] kernel_qouter_gen rep$rep: $sec%.2f s (${sec * 1e9 / (rows.toLong * nq)}%.1f ns/pair)")
    }
    println(s"[micro] sink=$sink")
  }
}
