package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.catalog.VecDB
import graft.operators.Knn
import graft.streaming.StreamSearch

/** Streaming ANN serving (SURVEY §2.9 extension): query micro-batches are
  * answered against a static corpus / catalog table and the per-epoch
  * parquet union equals the one-shot batch search. */
class StreamSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String = Files.createTempDirectory(
    java.nio.file.Paths.get("target"), prefix).toString

  private lazy val base = Tables.vectors(spark, sf0001).select("id", "vec").cache()

  test("startExact: streamed micro-batches union to the batch KNN result") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = tmp("ssearch_out")
    val ms = MemoryStream[(Long, Array[Float])]
    val stream = ms.toDF().toDF("query_id", "query_vec")
    val q = StreamSearch.startExact(base, stream, k = 4, out, tmp("ssearch_ckpt"))
    val qrows = base.filter($"id" < 5)
      .select($"id", $"vec").as[(Long, Array[Float])].collect()
    try {
      ms.addData(qrows.take(2).toSeq)
      q.processAllAvailable()
      ms.addData(qrows.drop(2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("query_id", "id", "distance")
      .orderBy("query_id", "distance", "id").collect()
    val batch = Knn.exact(base,
        base.filter($"id" < 5).select($"id".as("query_id"), $"vec".as("query_vec")),
        k = 4)
      .select("query_id", "id", "distance")
      .orderBy("query_id", "distance", "id").collect()
    assert(streamed.length == batch.length && streamed.length == 5 * 4)
    streamed.zip(batch).foreach { case (a, b) =>
      assert(a.getAs[Long]("query_id") == b.getAs[Long]("query_id"))
      assert(a.getAs[Long]("id") == b.getAs[Long]("id"))
      assert(a.getAs[Double]("distance") == b.getAs[Double]("distance"))
    }
  }

  test("start: catalog dispatch serves each micro-batch (index arm reachable)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val db = new VecDB(spark, tmp("ssearch_db"))
    try {
      val dim = base.head().getAs[Seq[Float]]("vec").length
      db.createTableIfNotExists("t", dim, "l2sqr")
      db.addDataFrame("t", base.select(
        col("vec"), map(lit("orig"), col("id").cast("string")).as("meta")))
      val out = tmp("ssearch_cat_out")
      val ms = MemoryStream[(Long, Array[Float])]
      val q = StreamSearch.start(db, "t", ms.toDF().toDF("query_id", "query_vec"),
        k = 3, out, tmp("ssearch_cat_ckpt"))
      val qrows = base.filter($"id" < 3)
        .select($"id", $"vec").as[(Long, Array[Float])].collect()
      try {
        ms.addData(qrows.toSeq)
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(out)
      assert(got.select("query_id").distinct().count() == 3)
      // every query's nearest catalog hit is itself (orig meta == query id)
      val selfHits = got.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("query_id").orderBy(col("distance"), col("id"))))
        .filter($"rn" === 1)
        .select($"query_id",
          element_at(col("meta"), "orig").cast("long").as("orig"))
        .collect()
      selfHits.foreach(r =>
        assert(r.getAs[Long]("query_id") == r.getAs[Long]("orig")))
    } finally db.close()
  }

  test("replayed epoch overwrites, not duplicates (idempotent per-epoch sink)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = tmp("ssearch_replay_out")
    val ckpt = tmp("ssearch_replay_ckpt")
    val qrows = base.filter($"id" < 2)
      .select($"id", $"vec").as[(Long, Array[Float])].collect()
    // run epoch 0 twice against the SAME out dir (fresh checkpoint the
    // second time = a replay of the same epoch id)
    for (_ <- 0 until 2) {
      val ms = MemoryStream[(Long, Array[Float])]
      val q = StreamSearch.startExact(base, ms.toDF().toDF("query_id", "query_vec"),
        k = 3, out, tmp("ssearch_replay_ckpt_fresh"))
      try {
        ms.addData(qrows.toSeq)
        q.processAllAvailable()
      } finally q.stop()
    }
    assert(spark.read.parquet(out).count() == 2 * 3,
      "per-epoch overwrite must keep the replayed batch single-counted")
    assert(ckpt.nonEmpty)
  }
}
