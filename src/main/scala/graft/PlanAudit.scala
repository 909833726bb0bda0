package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Knn, Search}

/** Prints the physical plans of the core read paths for audit (pushdown,
  * codegen spans, shuffle count). Not part of the driver contract. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.vectors(spark, dir).select(col("id"), col("vec"))
    val qs = base.filter(col("id") < 8)
      .select(col("id").as("query_id"), col("vec").as("query_vec"))

    println("=== Knn.exact ===")
    Knn.exact(base, qs, k = 5).explain("formatted")

    println("=== Search.flat with pattern ===")
    Search.flat(Tables.vectorsMeta(spark, dir), qs, k = 5,
      pattern = Map("parity" -> "even")).explain("formatted")

    println("=== Ivf.search ===")
    val (model, assigned) = Ivf.build(base, k = 16)
    Ivf.search(assigned, model, qs, k = 5).explain("formatted")

    println("=== Bq.hammingTopK (codegen pack + XOR/popcount) ===")
    graft.operators.Bq.hammingTopK(base, qs, k = 5).explain("formatted")

    println("=== Sq.coarseTopK (codegen asymmetric decode-and-score) ===")
    val sqModel = graft.operators.Sq.train(base)
    graft.operators.Sq.coarseTopK(
      graft.operators.Sq.encode(base, sqModel)
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("sq")),
      qs, sqModel, k = 5).explain("formatted")

    println("=== SQL top-k rewrite (id IN prune above the scan) ===")
    graft.functions.VectorFunctions.register(spark)
    graft.plans.GraftSqlTopK.enable(spark)
    val emb = Tables.vectors(spark, dir)
    graft.plans.GraftSqlTopK.registerDataFrame("audit_topk", emb, "l2sqr")
    emb.createOrReplaceTempView("audit_topk_v")
    val qv = emb.filter(col("id") === 0)
      .head.getAs[scala.collection.Seq[Float]]("vec")
    val lits = qv.map(f => f.toString + "F").mkString("array(", ", ", ")")
    spark.sql(s"SELECT id, vec_l2sq(vec, $lits) AS d FROM audit_topk_v " +
      "ORDER BY d LIMIT 10").explain("formatted")
    graft.plans.GraftSqlTopK.unregisterAll()
    spark.stop()
  }
}
