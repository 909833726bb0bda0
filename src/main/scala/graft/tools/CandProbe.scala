package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rerank-budget calibration for the ROUTED BQ arms (r17 verdict Missing
  * #3): under IVF routing the scored pool is only ~np·N/kc rows, yet
  * `Bq.autoCandidates` scales the budget with corpus N — at kc=512, np=1
  * the arm reranks c=2000 of a ~1953-row pool, i.e. the sketch prunes
  * nothing and the rerank join dominates all comparators equally. This
  * probe measures recall + batch seconds as a function of the POOL
  * FRACTION reranked, over the kc512 bench-cache fixtures, so the
  * pool-aware budget's constant is a measurement, not a guess.
  * Run after a full bench (fixtures cached): `runMain graft.tools.CandProbe`. */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cand-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n1m = 1000000L
    val dir512 = java.nio.file.Paths.get("bench_cache", s"bench1m_sq512_$n1m")
    val vecPath = java.nio.file.Paths.get("bench_cache", s"bench1m_${n1m}_32", "vec")
    val vec = spark.read.parquet(vecPath.toString)
    val model512 = graft.operators.Ivf.readModel(
      spark, dir512.resolve("vec_ivf").toString, "l2sqr", 1)
    val kc = model512.centroids.length
    val bqModel = graft.operators.Bq.train(vec)
    val bq512Df = spark.read.parquet(dir512.resolve("bq_ivf").resolve("data").toString)
    val float512Df = spark.read.parquet(dir512.resolve("vec_ivf").resolve("data").toString)
    val nq = sys.env.getOrElse("PROBE_NQ", "100").toInt
    val q = vec.filter(col("id") < nq)
      .select(col("id").as("query_id"), col("vec").as("query_vec")).cache()
    q.count()
    // exact top-10 ground truth (one brute-force batch)
    val truth = graft.operators.Knn.exactBroadcast(vec, q, 10)
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (k2, v) => k2 -> v.map(_._2).toSet }
    def recallOf(df: DataFrame): Double = {
      val got = df.select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .map { case (k2, v) => k2 -> v.map(_._2).toSet }
      val per = truth.map { case (qid, t) =>
        got.get(qid).fold(0.0)(g => (g & t).size.toDouble / t.size) }
      per.sum / per.size
    }
    val pool = n1m / kc
    println(s"[probe] kc=$kc pool~$pool nq=$nq auto=${graft.operators.Bq.autoCandidates(n1m, 10)}")
    val cands = sys.env.get("PROBE_CANDS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(100, 250, 500, 1000, 2000))
    for (c <- cands) {
      def mk() = graft.operators.Bq.searchIvfPartitionedDf(bq512Df, float512Df,
        model512, Some(bqModel), q, k = 10, candidates = c,
        nProbes = Some(1), baseClusterCol = Some("cluster"))
      val r = recallOf(mk())
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); mk().count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] c=$c%5d frac=${c.toDouble / pool}%.2f recall=$r%.4f sec=${ts(1)}%.3f qps=${nq / ts(1)}%.1f")
    }
    spark.stop()
  }
}
