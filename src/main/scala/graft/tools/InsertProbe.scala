package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the GRAPHS stage of the IVF-HNSW build (r18
  * verdict #5): with the route stage flattened (21 s at 4M), graphs_s is
  * 98% of the 1067 s 4M build — 3,750 rows/s vs 9,869 for 1mLR at the
  * SAME ~31k-rows/cluster block size and the same 32 threads, i.e. each
  * 31k-row block builds ~2.7× slower at 4M than at 1M. Same algorithm,
  * same block shape — so the thief is environmental to the stage
  * (shuffle-read stalls, GC under a 15.4 GB resident input, memory
  * bandwidth), or the per-insert arithmetic got slower (cache/TLB
  * pressure). This probe replays `IvfHnsw.buildIndex`'s exact
  * groupByKey→flatMapGroups stage at each scale and splits every
  * cluster's wall into:
  *   gather_ns  — `it.toArray` (shuffle read + row decode)
  *   beam_ns    — greedy descent + per-level ef_c beam (HnswGraph stat)
  *   connect_ns — heuristic + bidirectional fix-up (HnswGraph stat)
  *   export_ns  — node export into output rows
  *   other_ns   — wall − the above (allocation, level draws, appendVec)
  * plus executor GC delta across the stage. If beam_ns/insert itself
  * grows with scale, the fix is kernel-side (e.g. the reference's
  * cached-norm build identity, hnsw_index.rs:136-141); if gather/GC
  * grows, the fix is stage plumbing (pre-partitioned spill-free input,
  * heap sizing).
  *
  * Scales via PROBE_NS (default "1000000,4000000"); M/EF via PROBE_M /
  * PROBE_EFC (default 16/200 — the bench's own knobs). */
object InsertProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-insert-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ns = sys.env.getOrElse("PROBE_NS", "1000000,4000000")
      .split(",").map(_.trim.toLong).toSeq
    val mP = sys.env.getOrElse("PROBE_M", "16").toInt
    val efc = sys.env.getOrElse("PROBE_EFC", "200").toInt
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    for (n <- ns) {
      val kc = math.max(4, (n / 31250).toInt) // the bench 31k-rows/cluster rule
      val vec = graft.Bench.synthClusteredVectors(spark, n, 960, 1000, 0.3)
      val (model, assigned) = graft.operators.Ivf.build(
        vec.select(col("id"), col("vec")), kc,
        trainFraction = Some(math.min(0.5, 20000.0 / n)))
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val stats = assigned
        .select(col("cluster").cast("int"), col("id").cast("long"), col("vec"))
        .as[(Int, Long, Array[Float])]
        .groupByKey(_._1)
        .mapGroups { (cl, it) =>
          val w0 = System.nanoTime()
          val rows = it.toArray
          val w1 = System.nanoTime()
          val g = new graft.index.HnswGraph(rows(0)._3.length, "l2sqr",
            mP, efc, 42L + cl)
          rows.foreach(r => g.add(r._3))
          val w2 = System.nanoTime()
          // export pass identical to buildIndex's output mapping
          var exported = 0L
          var i = 0
          while (i < rows.length) {
            val (v, lvl, ls) = g.exportNode(i)
            exported += v.length + lvl + ls.length
            i += 1
          }
          val w3 = System.nanoTime()
          (cl, rows.length.toLong, w1 - w0, g.statBeamNs, g.statConnectNs,
            (w2 - w1) - g.statBeamNs - g.statConnectNs, w3 - w2, exported)
        }
        .collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val gcS = (gcMillis() - g0) / 1e3
      val rows = stats.map(_._2).sum
      def s(f: ((Int, Long, Long, Long, Long, Long, Long, Long)) => Long) =
        stats.map(f).sum / 1e9
      println(f"[probe] n=$n kc=$kc blocks=${stats.length} rows=$rows " +
        f"wall_s=$wall%.1f rows_per_s=${rows / wall}%.0f gc_s=$gcS%.1f " +
        f"gather_s=${s(_._3)}%.1f beam_s=${s(_._4)}%.1f " +
        f"connect_s=${s(_._5)}%.1f other_s=${s(_._6)}%.1f " +
        f"export_s=${s(_._7)}%.1f (sums are cpu-seconds across $cpus threads)")
      // per-insert beam cost is THE scale comparator: same block size ⇒
      // a flat value names the environment, a rising value names the kernel
      println(f"[probe] n=$n beam_us_per_insert=${s(_._4) * 1e6 / rows}%.1f " +
        f"connect_us_per_insert=${s(_._5) * 1e6 / rows}%.1f " +
        f"gather_us_per_row=${s(_._3) * 1e6 / rows}%.1f")
    }
    spark.stop()
  }
}
