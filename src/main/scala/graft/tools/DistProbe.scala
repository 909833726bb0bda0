package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-split probe for the big-batch two-stage BQ row
  * (`bq_rerank_1m_d960_nq10k_batch`): times the coarse pass alone (dist
  * merge ON vs OFF) and the full two-stage search, so the 92 s row's cost
  * lands on a named stage instead of a guess. Reads the 1M float fixture
  * from the bench cache (run a full bench first). */
object DistProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // NOTE: heap must come from the LAUNCHING JVM (SBT_OPTS/JAVA_OPTS
    // -Xmx, as the bench scripts set it) — spark.driver.memory set
    // programmatically in local mode is a no-op because the driver JVM
    // has already started. The probe reproduces a multi-GB per-task
    // working set; run it under the same -Xmx as the bench.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dist-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecPath = args.headOption.getOrElse(
      "bench_cache/bench1m_1000000_32/vec")
    val vec = spark.read.parquet(vecPath)
    val n = vec.count()
    val nq = sys.env.getOrElse("PROBE_NQ", "10000").toInt
    val cand = graft.operators.Bq.autoCandidates(n, 10)
    println(s"[probe] n=$n nq=$nq candidates=$cand")
    val model = graft.operators.Bq.train(vec)
    val packed = graft.operators.Bq.encodeCentered(vec, model)
      .select("id", "bq").repartition(cpus).cache()
    packed.count()
    val q = vec.filter(col("id") < nq)
      .select(col("id").as("query_id"), col("vec").as("query_vec")).cache()
    q.count()
    def time(name: String)(f: => Long): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name rep$i: $sec%.2f s ($rows rows, path=${graft.operators.CoarseMerge.lastPath})")
      }
    }
    // coarse only, dist ON
    graft.operators.CoarseMerge.distMerge = true
    time("coarse_dist")(graft.operators.Bq.hammingBroadcastPacked(
      packed, q, k = cand, model = Some(model)).count())
    // coarse only, dist OFF (row-aggregate path)
    graft.operators.CoarseMerge.distMerge = false
    time("coarse_agg")(graft.operators.Bq.hammingBroadcastPacked(
      packed, q, k = cand, model = Some(model)).count())
    graft.operators.CoarseMerge.distMerge = true
    // full two-stage (coarse dist + gated rerank)
    time("two_stage")(graft.operators.Bq.searchRerankPacked(
      packed, vec, q, k = 10, candidates = cand, model = Some(model)).count())
    println(s"[probe] rerank join shape: ${graft.operators.Rerank.lastJoin}")
    spark.stop()
  }
}
