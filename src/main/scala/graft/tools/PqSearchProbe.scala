package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway margin probe: per-query overlap of the modest-ef PQ search vs
  * exact KNN at each shipped SF, across ef — sets q_pq_search's bound. */
object PqSearchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("pq-search-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val b = graft.Tables.vectors(spark, dir).select(col("id"), col("vec"))
      val q = b.filter(col("id") < 8)
        .select(col("id").as("query_id"), col("vec").as("query_vec"))
      val model = graft.operators.Pq.train(b, m = 8, nBits = 4)
      val enc = graft.operators.Pq.encode(b, model).cache()
      val exact = graft.operators.Knn.exact(b, q, k = 5)
        .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (ef <- Seq(40, 64, 80, 120)) {
        val ap = graft.operators.Pq.searchFlat(enc, model, q, k = 5, ef = ef)
          .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val overlap = (0L until 8L).map(qi =>
          ap.filter(_._1 == qi).count(exact.contains))
        println(s"PROBE $sf ef=$ef overlap=${overlap.mkString(",")}")
      }
    } finally spark.stop()
  }
}
