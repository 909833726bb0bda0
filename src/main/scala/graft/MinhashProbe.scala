package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Bench.synthDocs(spark, 100000, 60).repartition(32).cache()
    docs.count()
    // warmup
    Dedup.minhashLshJoin(docs.limit(5000), n = 3, numHashes = 32, bands = 8, threshold = 0.5).count()
    spark.catalog.clearCache(); docs.cache(); docs.count()
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = Dedup.minhashLshJoin(docs, n = 3, numHashes = 32, bands = 8, threshold = 0.5).count()
      println(f"rep$r full ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$c")
    }
    spark.stop()
  }
}
