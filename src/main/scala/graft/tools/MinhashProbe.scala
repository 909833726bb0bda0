package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-level profile of [[Dedup.minhashLshJoin]] on the bench fixture
  * (r12 verdict item 4: `dedup_minhash_100k` at 18.2 s is an outlier among
  * the dedup arms — attribute the time before optimizing it). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("minhash-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // heap comes from the launching JVM (SBT_OPTS -Xmx) — programmatic
      // spark.driver.memory is a no-op once the local-mode JVM is up
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Bench.synthDocs(spark, 100000, 60).repartition(32).cache()
    docs.count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[minhashprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // one warm full run, then timed full runs
    t("full_warm") { Dedup.minhashLshJoin(docs, n = 3, numHashes = 32,
      bands = 8, threshold = 0.5).count() }
    for (_ <- 0 until 2)
      t("full") { Dedup.minhashLshJoin(docs, n = 3, numHashes = 32,
        bands = 8, threshold = 0.5).count() }

    // stage decomposition (mirrors minhashLshJoin's internals)
    val sh0 = docs.select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.TextFunctions.ngramHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    t("shingles_only")(sh0.count())
    val prime = (1L << 31) - 1
    val rnd = new scala.util.Random(42L)
    val coeffs = Array.fill(32)(
      (1 + rnd.nextLong(prime - 1), rnd.nextLong(prime)))
    val sh = sh0.withColumn("sig",
      graft.functions.TextFunctions.minhashSignature(
        transform(col("sh"), x => pmod(x, lit(prime))),
        coeffs.map(_._1), coeffs.map(_._2), prime))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("shingle+sig persist")(sh.count())
    val banded = sh.select(col("doc_id"),
      posexplode(array((0 until 8).map(i =>
        hash(slice(col("sig"), i * 4 + 1, 4))): _*)).as(Seq("band", "bk")))
    t("banded")(banded.count())
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    t("cand join+distinct")(cand.count())
    val sigs = sh.select(col("doc_id"), col("sig"))
    val pre = cand
      .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("siga")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("sigb")), "b_id")
      .filter(
        aggregate(zip_with(col("siga"), col("sigb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / 32
          >= 0.5 - 3.0 * 0.5 / math.sqrt(32.0))
      .select(col("a_id"), col("b_id"))
    t("prefilter")(pre.count())
    val sets = sh.select(col("doc_id"), col("sh"))
    val fin = pre
      .join(sets.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    t("verify")(fin.count())
    spark.stop()
  }
}
