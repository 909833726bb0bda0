package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage profile of [[Dedup.duplicateComponents]] on the bench fixture. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("cc-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Bench.synthDocs(spark, 100000, 60).repartition(32).cache()
    docs.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def pairs() = Dedup.minhashLshJoin(docs, n = 3, numHashes = 32,
      bands = 8, threshold = 0.5)
    t("minhash_warm")(pairs().count())
    t("minhash")(pairs().count())
    for (_ <- 0 until 2)
      t("cc_full") {
        Dedup.duplicateComponents(docs, pairs())
          .filter(col("is_canonical")).count()
      }
    spark.stop()
  }
}
