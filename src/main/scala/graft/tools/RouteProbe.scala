package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the ROUTE stage of the IVF-HNSW build (r17
  * verdict Wrong #1): `build_scale` measured route_s 23.0 → 176.8 for
  * 2M → 4M rows (7.7× for 2× rows, kc 64 → 128) while the graphs stage
  * scaled mildly. The route stage is `Ivf.build` + the skew-count pass
  * inside `IvfHnsw.buildIndex`; this probe times its sub-stages
  * separately at each scale point so the superlinearity lands on a named
  * stage:
  *   sample_s  — trainFraction sample + limit collect (one synth scan)
  *   kmeans_s  — LocalKMeans.fit over the 20k sample (driver-side)
  *   assign_s  — nearest-centroid pass + cluster histogram collect
  * Scales via PROBE_NS (comma list, default "1000000,2000000,4000000"). */
object RouteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-route-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ns = sys.env.getOrElse("PROBE_NS", "1000000,2000000,4000000")
      .split(",").map(_.trim.toLong).toSeq
    for (n <- ns) {
      val kc = math.max(4, (n / 31250).toInt) // the bench's 4M sizing rule
      val vec = graft.Bench.synthClusteredVectors(spark, n, 960, 1000, 0.3)
      def sec[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      // Ivf.train's exact shape: sample + limit-collect, then local fit
      val frac = math.min(0.5, 20000.0 / n)
      val (head, tSample) = sec {
        vec.sample(frac, 42L).select(col("vec"))
          .limit(200001).collect().map(_.getSeq[Float](0).toArray)
      }
      val (cents, tKmeans) = sec {
        graft.index.LocalKMeans.fit(head, kc, "l2sqr", 20, 1e-6, 42L)
      }
      val model = graft.operators.IvfModel(cents, "l2sqr")
      val (counts, tAssign) = sec {
        graft.operators.Ivf.assign(vec.select(col("id"), col("vec")), model)
          .groupBy("cluster").count().collect()
      }
      val over = counts.map(_.getLong(1)).count(_ > 500000L)
      println(f"[probe] n=$n kc=$kc sample_s=$tSample%.1f (rows=${head.length}) " +
        f"kmeans_s=$tKmeans%.1f assign_s=$tAssign%.1f over_cap=$over " +
        f"route_s=${tSample + tKmeans + tAssign}%.1f")
    }
    spark.stop()
  }
}
