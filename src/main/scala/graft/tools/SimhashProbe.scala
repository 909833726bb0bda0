package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SimHash recall attribution (r17 verdict item 8): the q_dedup_simhash
  * health boolean pins recall ≥ 0.5 of the exact 3-gram near-dup universe
  * (measured 0.6). Recall is bounded by TWO stages — the banding (which
  * exact pairs ever become candidates) and the Hamming cutoff (which
  * candidates survive `hamming <= maxHamming`). This probe separates
  * them: the Hamming histogram of the exact near-dup pairs says what any
  * cutoff can reach; the 4×16 block-collision test says what the banding
  * already surfaces at each distance. Run on the driver test data:
  * `PROBE_SF_DIR=/root/testdata/sf0.01 runMain graft.tools.SimhashProbe`. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-simhash-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.01")
    val docs = graft.Tables.docs(spark, dir)
    val sk = docs.select(col("doc_id").cast("long").as("doc_id"),
      graft.operators.Dedup.simhash(col("text")).as("sk"))
    val exact = graft.operators.Dedup.ngramJaccardJoin(docs, n = 3, threshold = 0.5)
      .select("a_id", "b_id")
    val withH = exact
      .join(sk.select(col("doc_id").as("a_id"), col("sk").as("ska")), "a_id")
      .join(sk.select(col("doc_id").as("b_id"), col("sk").as("skb")), "b_id")
      .select(col("a_id"), col("b_id"),
        bit_count(col("ska").bitwiseXOR(col("skb"))).as("h"),
        // does ANY of the 4 16-bit blocks agree? (the banding candidate test)
        (0 until 4).map(i =>
          (shiftright(col("ska"), i * 16).bitwiseAND(lit(0xFFFFL)) ===
           shiftright(col("skb"), i * 16).bitwiseAND(lit(0xFFFFL))).cast("int"))
          .reduce(_ + _).gt(lit(0)).as("banded4x16"))
    val rows = withH.collect()
    val total = rows.length
    println(s"[probe] exact near-dup pairs: $total")
    val hs = rows.map(_.getInt(2))
    (0 to 16).foreach { h =>
      val le = hs.count(_ <= h)
      val bandedLe = rows.count(r => r.getInt(2) <= h && r.getBoolean(3))
      println(f"[probe] hamming<=$h%2d: pairs=$le (recall=${le.toDouble / total}%.3f) banded4x16=$bandedLe")
    }
    println(f"[probe] max hamming among exact pairs: ${hs.max}")
    // false-candidate pressure of the PRODUCTION banding (r19 ADVICE: the
    // old maxHamming=64 call degenerated to a near cross-join and measured
    // nothing about the default banding): candidate pairs the default
    // maxHamming=4 pigeonhole bands emit BEFORE the Hamming filter —
    // banding join cost per true pair at this SF
    val candDefault =
      graft.operators.Dedup.simhashCandidates(docs, maxHamming = 4).count()
    println(s"[probe] banded candidate pairs (maxH=4 banding, pre-filter): " +
      s"$candDefault")
    // production defaults: measured recall + angle floors + exact-dup
    // subset (the graded booleans' actual values at this SF)
    val maxH = sys.env.getOrElse("PROBE_MAXH", "5").toInt
    val sim = graft.operators.Dedup.simhashPairs(docs, maxHamming = maxH)
      .select("a_id", "b_id").cache()
    val emitted = sim.count()
    val caught = exact.join(sim, Seq("a_id", "b_id"), "left_semi").count()
    val tok = docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).cast("double").as("c"))
    val nrm = tok.groupBy("doc_id").agg(sqrt(sum(col("c") * col("c"))).as("nrm"))
    val dots = sim
      .join(tok.as("ta"), col("a_id") === col("ta.doc_id"))
      .join(tok.as("tb"),
        col("b_id") === col("tb.doc_id") && col("ta.w") === col("tb.w"))
      .groupBy("a_id", "b_id").agg(sum(col("ta.c") * col("tb.c")).as("dot"))
    val cosStats = sim.join(dots, Seq("a_id", "b_id"), "left")
      .join(nrm.as("na"), col("a_id") === col("na.doc_id"))
      .join(nrm.as("nb"), col("b_id") === col("nb.doc_id"))
      .select((coalesce(col("dot"), lit(0.0)) /
        (col("na.nrm") * col("nb.nrm"))).as("cos"))
      .agg(min(col("cos")).as("mn"), avg(col("cos")).as("av"),
        expr("percentile(cos, 0.1)").as("p10"),
        expr("percentile(cos, 0.05)").as("p05")).head()
    // token-MULTISET identity (sorted full token list): multiset-equal ⇒
    // identical simhash ⇒ hamming 0 ⇒ structurally guaranteed emission
    val fp = docs.select(col("doc_id").cast("long").as("doc_id"),
      md5(concat_ws(" ", array_sort(split(col("text"), " ")))
        .cast("binary")).as("fp"))
    val dupPairs = fp.as("x").join(fp.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    val dupTotal = dupPairs.count()
    val dupMissed = dupPairs.join(sim, Seq("a_id", "b_id"), "left_anti").count()
    println(f"[probe] DEFAULTS: emitted=$emitted recall=${caught.toDouble / math.max(1, total)}%.3f " +
      f"min_cos=${cosStats.getDouble(0)}%.3f mean_cos=${cosStats.getDouble(1)}%.3f " +
      f"p10_cos=${cosStats.getDouble(2)}%.3f p05_cos=${cosStats.getDouble(3)}%.3f " +
      f"exactdup_pairs=$dupTotal missed=$dupMissed")
    spark.stop()
  }
}
