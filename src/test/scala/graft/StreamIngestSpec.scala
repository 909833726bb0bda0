package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.catalog.VecDB
import graft.streaming.StreamIngest

/** Continuous ingest through Structured Streaming (SURVEY §2.9 extension):
  * micro-batches land via the catalog's addDataFrame contract, replayed
  * epochs are skipped (the foreachBatch idempotent-sink contract), and the
  * ingested rows serve through the normal search path. */
class StreamIngestSpec extends SparkTestBase {

  private def tmp(prefix: String): String = Files.createTempDirectory(
    java.nio.file.Paths.get("target"), prefix).toString

  test("micro-batches append through the catalog; restart resumes from the checkpoint") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val db = new VecDB(spark, tmp("stream_db"))
    try {
      db.createTableIfNotExists("t", 4, "l2sqr")
      val ckpt = tmp("stream_ckpt")
      val ms = MemoryStream[Seq[Float]]
      val q = StreamIngest.start(db, "t", ms.toDF().toDF("vec"), ckpt)
      try {
        ms.addData(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f))
        q.processAllAvailable()
        assert(db.getLen("t") == 2)
        ms.addData(Seq(0f, 0f, 1f, 0f))
        q.processAllAvailable()
        assert(db.getLen("t") == 3)
        // the streamed rows serve through the ordinary search path
        val hit = db.search("t", Array(0f, 0f, 0.9f, 0f), 1)
        assert(hit.head._2 < 0.011, s"nearest distance ${hit.head._2}")
      } finally q.stop()
      // restart from the same checkpoint: already-committed offsets are NOT
      // re-ingested; new data lands
      val q2 = StreamIngest.start(db, "t", ms.toDF().toDF("vec"), ckpt)
      try {
        ms.addData(Seq(0f, 0f, 0f, 1f))
        q2.processAllAvailable()
        assert(db.getLen("t") == 4, s"len ${db.getLen("t")} after restart")
      } finally q2.stop()
    } finally db.close()
  }

  test("replayed micro-batch epochs are skipped exactly once") {
    import spark.implicits._
    val db = new VecDB(spark, tmp("stream_db"))
    try {
      db.createTableIfNotExists("t", 2, "l2sqr")
      val b0 = Seq(Seq(1f, 0f), Seq(0f, 1f)).toDF("vec")
      assert(db.streamEpoch("t") == -1L)
      assert(db.applyStreamBatch("t", b0, batchId = 0L) == 2L)
      assert(db.streamEpoch("t") == 0L)
      // checkpoint replay of the same epoch: skipped, nothing appended
      assert(db.applyStreamBatch("t", b0, batchId = 0L) == 0L)
      assert(db.getLen("t") == 2)
      // next epoch applies
      assert(db.applyStreamBatch("t", Seq(Seq(2f, 2f)).toDF("vec"), 1L) == 1L)
      assert(db.getLen("t") == 3)
      assert(db.streamEpoch("t") == 1L)
      // delete+recreate resets the epoch with the table directory
      db.deleteTable("t")
      db.createTableIfNotExists("t", 2, "l2sqr")
      assert(db.streamEpoch("t") == -1L)
      assert(db.applyStreamBatch("t", b0, batchId = 0L) == 2L)
    } finally db.close()
  }
}
