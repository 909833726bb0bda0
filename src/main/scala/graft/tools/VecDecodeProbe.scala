package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rerank float-decode A/B (r19 verdict, next-round #2): CandProbe proved
  * the kc512 quantized rows are bound by decoding the rerank base's float
  * vectors from parquet (q/s flat across candidate budgets 900-1302), not
  * by selection. The named fix is a fixed-width BinaryType vector layout —
  * one blob decode + direct byte scoring per row instead of per-element
  * `array<float>` assembly. This probe prices exactly that swap, isolated
  * from everything else: the same rows written both ways, the same
  * scan + distance + aggregate plan over each, interleaved reps in one
  * JVM.
  *
  * Run: `sbt "runMain graft.tools.VecDecodeProbe"` (knobs: PROBE_N,
  * PROBE_DIM, PROBE_REPS).
  */
object VecDecodeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-vec-decode-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("PROBE_N", "1000000").toLong
    val dim = sys.env.getOrElse("PROBE_DIM", "960").toInt
    val reps = sys.env.getOrElse("PROBE_REPS", "5").toInt
    val vec = graft.Bench.synthClusteredVectors(spark, n, dim, 1000, 0.3)
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "decode_probe").toString
    vec.write.mode("overwrite").parquet(s"$dir/float")
    vec.select(col("id"),
        graft.functions.VectorFunctions.vecToBinary(col("vec")).as("vecb"))
      .write.mode("overwrite").parquet(s"$dir/bin")
    val q = vec.filter(col("id") === 0).select("vec").head.getSeq[Float](0).toArray
    val fDf = spark.read.parquet(s"$dir/float")
    val bDf = spark.read.parquet(s"$dir/bin")
    def scoreFloat(): Double = fDf.select(
        graft.functions.VectorFunctions.distance(col("vec"),
          typedLit(q), "l2sqr").as("d"))
      .agg(sum(col("d"))).head.getDouble(0)
    def scoreBin(): Double = bDf.select(
        graft.functions.VectorFunctions.distance(col("vecb"),
          typedLit(q), "l2sqr").as("d"))
      .agg(sum(col("d"))).head.getDouble(0)
    // correctness first: identical sums (same doubles, same order per row)
    val sf = scoreFloat(); val sb = scoreBin()
    println(f"[decode] sum(float)=$sf%.6f sum(bin)=$sb%.6f match=${sf == sb}")
    // interleaved timed reps (one JVM — the only adjudicable A/B shape)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime(); scoreFloat()
      val tf = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); scoreBin()
      val tb = (System.nanoTime() - t1) / 1e9
      println(f"[decode] rep$r float=$tf%.3f s bin=$tb%.3f s speedup=${tf / tb}%.2fx")
    }
    // the rerank's actual shape: candidate-pruned scan (id IN winners) —
    // the decode bound shows up against a PRUNED read too (row-group skip
    // still decodes whole pages of the vector column for surviving rows)
    val ids = (0L until 20000L).map(i => i * (n / 20000L))
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      fDf.filter(col("id").isInCollection(ids))
        .select(graft.functions.VectorFunctions.distance(col("vec"),
          typedLit(q), "l2sqr").as("d")).agg(sum(col("d"))).head
      val tf = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      bDf.filter(col("id").isInCollection(ids))
        .select(graft.functions.VectorFunctions.distance(col("vecb"),
          typedLit(q), "l2sqr").as("d")).agg(sum(col("d"))).head
      val tb = (System.nanoTime() - t1) / 1e9
      println(f"[decode] pruned rep$r float=$tf%.3f s bin=$tb%.3f s speedup=${tf / tb}%.2fx")
    }
    spark.stop()
  }
}
