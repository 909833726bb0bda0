package graft

import org.apache.spark.sql.catalyst.expressions.{In, InSet}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import graft.catalog.VecDB
import graft.functions.VectorFunctions
import graft.plans.GraftSqlTopK

/** SURVEY §7.3 — index-backed SQL top-k rewrite: `ORDER BY vec_l2sq(vec,
  * lit) LIMIT k` over a registered table runs the engine's search and
  * prunes the scan to the k winners. Asserts the rewrite fires (plan
  * carries the spliced id IN filter), matches the unrewritten results
  * exactly, dispatches through the catalog's index arms for registered
  * VecDB tables, and declines out-of-scope shapes (WHERE, DESC, k > maxK). */
class SqlTopKSpec extends SparkTestBase {

  private def litVec(v: scala.collection.Seq[Float]): String =
    v.map(f => f.toString + "F").mkString("array(", ", ", ")")

  /** the spliced prune: a Filter whose condition holds an IN of exactly k
    * ids (a user WHERE never has this shape in these fixtures) */
  private def firedWithK(df: org.apache.spark.sql.DataFrame, k: Int): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case Filter(cond, _) => cond
    }.exists(_.exists {
      case In(_, list) => list.length == k
      case s: InSet => s.hset.size == k
      case _ => false
    })

  test("exact rewrite fires, prunes the scan, and matches ORDER BY LIMIT") {
    VectorFunctions.register(spark)
    val df = Tables.vectors(spark, sf001)
    val q = df.filter(col("id") === 7).head.getAs[scala.collection.Seq[Float]]("vec")
    df.createOrReplaceTempView("sql_topk_v")
    val sqlText = s"SELECT id, vec_l2sq(vec, ${litVec(q)}) AS d " +
      "FROM sql_topk_v ORDER BY d LIMIT 25"
    GraftSqlTopK.unregisterAll()
    val baseline = spark.sql(sqlText).collect()
    assert(baseline.length == 25)
    GraftSqlTopK.enable(spark)
    GraftSqlTopK.registerDataFrame("sql_topk_v", df, "l2sqr")
    try {
      val rewritten = spark.sql(sqlText)
      assert(firedWithK(rewritten, 25), "rewrite did not fire:\n" +
        rewritten.queryExecution.optimizedPlan.treeString)
      assert(rewritten.collect().toSeq == baseline.toSeq)
    } finally GraftSqlTopK.unregisterAll()
  }

  test("out-of-scope shapes are declined") {
    VectorFunctions.register(spark)
    val df = Tables.vectors(spark, sf001)
    val q = df.filter(col("id") === 3).head.getAs[scala.collection.Seq[Float]]("vec")
    df.createOrReplaceTempView("sql_topk_guard_v")
    GraftSqlTopK.enable(spark)
    GraftSqlTopK.registerDataFrame("sql_topk_guard_v", df, "l2sqr")
    try {
      // WHERE between sort and scan: top-k of a filtered set ≠ filtered
      // top-k — must not rewrite, and must stay correct
      val where = spark.sql(s"SELECT id, vec_l2sq(vec, ${litVec(q)}) AS d " +
        "FROM sql_topk_guard_v WHERE id % 2 = 0 ORDER BY d LIMIT 10")
      assert(!firedWithK(where, 10))
      assert(where.collect().forall(_.getLong(0) % 2 == 0))
      // DESC is not a nearest-neighbor query
      val desc = spark.sql(s"SELECT id, vec_l2sq(vec, ${litVec(q)}) AS d " +
        "FROM sql_topk_guard_v ORDER BY d DESC LIMIT 10")
      assert(!firedWithK(desc, 10))
      // k above the conf ceiling falls back to the plain sort
      spark.conf.set(GraftSqlTopK.MaxKConf, "5")
      try {
        val big = spark.sql(s"SELECT id, vec_l2sq(vec, ${litVec(q)}) AS d " +
          "FROM sql_topk_guard_v ORDER BY d LIMIT 10")
        assert(!firedWithK(big, 10))
        assert(big.collect().length == 10)
      } finally spark.conf.unset(GraftSqlTopK.MaxKConf)
      // cosine sort key over an l2sqr-registered table: metric mismatch
      val cos = spark.sql(s"SELECT id, vec_cosine(vec, ${litVec(q)}) AS d " +
        "FROM sql_topk_guard_v ORDER BY d LIMIT 10")
      assert(!firedWithK(cos, 10))
    } finally GraftSqlTopK.unregisterAll()
  }

  test("distance upper bound on the sort key rewrites; other WHEREs do not") {
    // WHERE vec_l2sq(vec, q) <= ub ORDER BY d LIMIT k: bound rows are a
    // prefix of the distance order, so the global-top-k prune + retained
    // Filter is exact. Checked against the unrewritten query at a ub that
    // bites (fewer than k rows pass) and one that does not.
    VectorFunctions.register(spark)
    val df = Tables.vectors(spark, sf001)
    val q = df.filter(col("id") === 21)
      .head.getAs[scala.collection.Seq[Float]]("vec")
    df.createOrReplaceTempView("sql_topk_ub_v")
    def sqlText(ub: String) =
      s"SELECT id, vec_l2sq(vec, ${litVec(q)}) AS d FROM sql_topk_ub_v " +
        s"WHERE vec_l2sq(vec, ${litVec(q)}) <= $ub ORDER BY d LIMIT 20"
    GraftSqlTopK.unregisterAll()
    val loose = spark.sql(sqlText("1e9")).collect()
    assert(loose.length == 20)
    // a ub between the 3rd and 4th distance: exactly 3 rows survive
    val tightUb = (loose(2).getDouble(1) + loose(3).getDouble(1)) / 2
    val tight = spark.sql(sqlText(tightUb.toString)).collect()
    assert(tight.length == 3)
    GraftSqlTopK.enable(spark)
    GraftSqlTopK.registerDataFrame("sql_topk_ub", df, "l2sqr")
    try {
      val rLoose = spark.sql(sqlText("1e9"))
      assert(firedWithK(rLoose, 20), "bounded rewrite did not fire:\n" +
        rLoose.queryExecution.optimizedPlan.treeString)
      assert(rLoose.collect().toSeq == loose.toSeq)
      val rTight = spark.sql(sqlText(tightUb.toString))
      assert(firedWithK(rTight, 20))
      assert(rTight.collect().toSeq == tight.toSeq)
    } finally GraftSqlTopK.unregisterAll()
  }

  test("independently re-read table matches via position remap (fresh exprIds)") {
    // register one read of the parquet, query through a SECOND read: the
    // leaf sameResult-matches but every exprId differs, exercising the
    // by-position attribute remap of the registered vec/id expressions
    VectorFunctions.register(spark)
    val regDf = Tables.vectors(spark, sf001)
    val queryDf = Tables.vectors(spark, sf001) // fresh plan, fresh exprIds
    val q = regDf.filter(col("id") === 5)
      .head.getAs[scala.collection.Seq[Float]]("vec")
    queryDf.createOrReplaceTempView("sql_topk_remap_v")
    val sqlText = s"SELECT id, vec_l2sq(vec, ${litVec(q)}) AS d " +
      "FROM sql_topk_remap_v ORDER BY d LIMIT 15"
    GraftSqlTopK.unregisterAll()
    val baseline = spark.sql(sqlText).collect()
    GraftSqlTopK.enable(spark)
    GraftSqlTopK.registerDataFrame("sql_topk_remap", regDf, "l2sqr")
    try {
      val rewritten = spark.sql(sqlText)
      assert(firedWithK(rewritten, 15), "remap path did not fire:\n" +
        rewritten.queryExecution.optimizedPlan.treeString)
      assert(rewritten.collect().toSeq == baseline.toSeq)
    } finally GraftSqlTopK.unregisterAll()
  }

  test("cosine-registered table rewrites a vec_cosine sort") {
    VectorFunctions.register(spark)
    val df = Tables.vectors(spark, sf001)
    val q = df.filter(col("id") === 9)
      .head.getAs[scala.collection.Seq[Float]]("vec")
    df.createOrReplaceTempView("sql_topk_cos_v")
    val sqlText = s"SELECT id, vec_cosine(vec, ${litVec(q)}) AS d " +
      "FROM sql_topk_cos_v ORDER BY d LIMIT 12"
    GraftSqlTopK.unregisterAll()
    val baseline = spark.sql(sqlText).collect()
    GraftSqlTopK.enable(spark)
    GraftSqlTopK.registerDataFrame("sql_topk_cos", df, "cosine")
    try {
      val rewritten = spark.sql(sqlText)
      assert(firedWithK(rewritten, 12))
      assert(rewritten.collect().toSeq == baseline.toSeq)
    } finally GraftSqlTopK.unregisterAll()
  }

  test("registered VecDB table dispatches through the catalog index arms") {
    VectorFunctions.register(spark)
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vecdb_sql").toString
    val db = new VecDB(spark, root)
    db.createTableIfNotExists("t", 8, "l2sqr")
    val rnd = new scala.util.Random(17)
    val vecs = (0 until 300).map(_ => Array.fill(8)(rnd.nextFloat() * 10f))
    db.batchAdd("t", vecs, vecs.indices.map(i => Map("i" -> i.toString)))
    db.buildHnswIndex("t")
    val q = vecs(11)
    db.table("t").createOrReplaceTempView("catalog_topk_v")
    val sqlText = s"SELECT id, vec_l2sq(vec, ${litVec(q.toSeq)}) AS d " +
      "FROM catalog_topk_v ORDER BY d LIMIT 5"
    GraftSqlTopK.unregisterAll()
    val exact = spark.sql(sqlText).collect()
    db.registerSql("t", Some("catalog_topk_v")) // view + enable + register
    spark.conf.set(GraftSqlTopK.EfConf, "300") // generous beam ⇒ exact
    try {
      val rewritten = spark.sql(sqlText)
      assert(firedWithK(rewritten, 5))
      assert(rewritten.collect().toSeq == exact.toSeq)
      assert(db.lastServedArm == "hnsw",
        s"expected the HNSW arm, served '${db.lastServedArm}'")
    } finally {
      spark.conf.unset(GraftSqlTopK.EfConf)
      GraftSqlTopK.unregisterAll()
      db.close()
    }
  }
}
