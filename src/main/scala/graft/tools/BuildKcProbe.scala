package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** kc-sizing probe for the routed HNSW build (r19 verdict, next-round #1):
  * InsertProbe attributed the 4M build's per-insert cost growth to CELL
  * DENSITY — at the fixed ~31k rows/cell sizing, growing n packs more rows
  * per natural data center into every k-means cell, and the insert beam
  * scores through denser neighborhoods (beam 650 → 1471 µs/insert at
  * 1M → 4M, same 31k-row blocks). This probe tests the named fix — scale
  * kc with n so dense regions SPLIT across cells — on a 1M proxy carrying
  * the 4M fixture's density (250 synthetic centers ⇒ 4000 rows/center,
  * exactly the 4M regime) so a kc sweep costs minutes, not 15-minute 4M
  * builds per point.
  *
  * Per kc: build wall split route/graphs (graphs materialized via count,
  * no IO in the timing), then served recall@10 + batch seconds at
  * np ∈ {1, 2, 4, 8} over nq=1000 — the probe-geometry compensation the
  * verdict asks to sweep (smaller cells ⇒ np must grow to cover the same
  * neighborhood mass).
  *
  * Run: `PROBE_KCS=32,128,250,500,1000 sbt "runMain graft.tools.BuildKcProbe"`
  */
object BuildKcProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-build-kc-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("PROBE_N", "1000000").toLong
    val centers = sys.env.getOrElse("PROBE_CENTERS", "250").toInt
    val dim = sys.env.getOrElse("PROBE_DIM", "960").toInt
    val nq = sys.env.getOrElse("PROBE_NQ", "1000").toInt
    val kcs = sys.env.getOrElse("PROBE_KCS", "32,250,500,1000")
      .split(",").map(_.trim.toInt).toSeq
    val vec = graft.Bench.synthClusteredVectors(spark, n, dim, centers, 0.3)
      .repartition(cpus.toInt).cache()
    vec.count()
    val q = vec.filter(col("id") < nq)
      .select(col("id").as("query_id"), col("vec").as("query_vec")).cache()
    q.count()
    println(s"[kcprobe] n=$n dim=$dim centers=$centers " +
      s"(rows/center=${n / centers}) nq=$nq")
    // ground truth once (exact broadcast KNN)
    val truth = graft.operators.Knn.exactBroadcast(vec, q, k = 10)
      .select(col("query_id").cast("long"), col("id").cast("long"))
      .collect().groupBy(_.getLong(0))
      .map { case (qq, rows) => qq -> rows.map(_.getLong(1)).toSet }
    for (kc <- kcs) {
      val t0 = System.nanoTime()
      val (model, idx) = graft.operators.IvfHnsw.buildIndex(vec, kc,
        trainFraction = Some(math.min(0.5, 20000.0 / n)))
      val tRoute = (System.nanoTime() - t0) / 1e9
      idx.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      idx.count()
      val tTotal = (System.nanoTime() - t0) / 1e9
      val rowsPerS = n / tTotal
      println(f"[kcprobe] kc=$kc%5d rows/cell=${n / kc}%7d " +
        f"route=$tRoute%.1f s graphs=${tTotal - tRoute}%.1f s " +
        f"total=$tTotal%.1f s rows/s=$rowsPerS%.0f")
      val ck = Some(s"kcprobe_${n}_$kc")
      for (np <- Seq(1, 2, 4, 8)) {
        def mk() = graft.operators.IvfHnsw.searchPinned(idx, model, q,
          k = 10, ef = Some(120), nProbes = Some(np), cacheKey = ck)
        mk().count() // warm (pin + decode)
        mk().count()
        val s0 = System.nanoTime()
        val res = mk()
        val got = res.select(col("query_id").cast("long"),
            col("id").cast("long")).collect()
        val sec = (System.nanoTime() - s0) / 1e9
        val byQ = got.groupBy(_.getLong(0))
          .map { case (qq, rows) => qq -> rows.map(_.getLong(1)).toSet }
        val recall = truth.keys.toSeq.map { qq =>
          (byQ.getOrElse(qq, Set.empty) & truth(qq)).size.toDouble / 10
        }.sum / truth.size
        println(f"[kcprobe] kc=$kc%5d np=$np%2d batch=$sec%.3f s " +
          f"qps=${nq / sec}%.0f recall@10=$recall%.4f")
      }
      graft.operators.Hnsw.invalidateCaches(s"kcprobe_${n}_$kc")
      idx.unpersist()
      System.gc()
    }
    spark.stop()
  }
}
