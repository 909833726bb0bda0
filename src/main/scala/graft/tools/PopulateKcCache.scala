package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.{Ivf, IvfHnsw}

/** One-time out-of-band population of a kc-scaled bench_cache entry —
  * `bench<label>_<n>_<kc>` at kc = max(16, n/8000) (~8k rows/cell, the
  * BuildKcProbe knee) — with the SAME atomic publication protocol the bench
  * uses (build into `<dir>.tmp`, `_done` written inside, whole-dir atomic
  * rename): a kill at any point leaves no half-populated key (the r20
  * failure mode). The bench itself never attempts this build in-run (it is
  * gated on predicted seconds + free disk); it reports the `_done` seconds
  * with `cached:true` on every later run.
  *
  * Usage: runMain graft.tools.PopulateKcCache <label> <n>
  *   e.g.  runMain graft.tools.PopulateKcCache 4m 4000000
  */
object PopulateKcCache {
  def main(args: Array[String]): Unit = {
    val label = args(0)
    val n = args(1).toLong
    val kc = math.max(16L, n / 8000L).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cacheDir = java.nio.file.Paths.get("bench_cache", s"bench${label}_${n}_$kc")
    if (java.nio.file.Files.exists(cacheDir.resolve("_done"))) {
      println(s"already populated: $cacheDir")
      spark.stop(); return
    }
    def deleteRec(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally s.close()
      }
    deleteRec(cacheDir)
    val tmp = cacheDir.resolveSibling(cacheDir.getFileName.toString + ".tmp")
    deleteRec(tmp)
    java.nio.file.Files.createDirectories(tmp)
    // same fixture family as the bench's 4M/2M/1M sections
    val vec =
      if (label == "1mlr") graft.Bench.synthLowRankVectors(spark, n, 960, 48, 1000, 0.5)
      else graft.Bench.synthClusteredVectors(spark, n, 960, 1000, 0.3)
    val t0 = System.nanoTime()
    val (model, idx) = IvfHnsw.buildIndex(vec, kc,
      trainFraction = Some(math.min(0.5, 20000.0 / n)))
    val tRoute = (System.nanoTime() - t0) / 1e9
    idx.write.mode("overwrite").parquet(tmp.resolve("idx").toString)
    Ivf.centroidsDf(spark, model).write.mode("overwrite")
      .parquet(tmp.resolve("centroids").toString)
    val total = (System.nanoTime() - t0) / 1e9
    java.nio.file.Files.write(tmp.resolve("_done"),
      s"$total $tRoute ${total - tRoute}".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, cacheDir,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    println(f"populated $cacheDir: total $total%.1f s (route $tRoute%.1f, " +
      f"graphs ${total - tRoute}%.1f), ${n / total}%.0f rows/s")
    spark.stop()
  }
}
