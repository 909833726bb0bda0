package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamAnalytics

/** Streaming analytics (SURVEY §2.9 extension): event-time windowed
  * aggregation with watermark-bounded late-data handling, and
  * mapGroupsWithState running-centroid maintenance — the streaming analog
  * of the k-means centroid update (A1). */
class StreamAnalyticsSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowed lang stats: per-window counts; late row beyond watermark dropped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Timestamp, String, String)]
    val agg = StreamAnalytics.windowedLangStats(
      ms.toDF().toDF("ts", "lang", "text"),
      windowDur = "10 minutes", watermarkDelay = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("winstats")
      .outputMode("append").start()
    try {
      // window [10:00, 10:10): two en docs, one de doc
      ms.addData((ts(1), "en", "a b c"), (ts(2), "en", "d e"), (ts(3), "de", "x"))
      q.processAllAvailable()
      // advance the watermark far past 10:10 so the first window finalizes
      ms.addData((ts(30), "en", "later doc"))
      q.processAllAvailable()
      // a late arrival for the finalized window: must be dropped
      ms.addData((ts(4), "en", "too late"))
      q.processAllAvailable()
      // close the second window too so its row is observable
      ms.addData((ts(59), "en", "tail"))
      q.processAllAvailable()
      val rows = spark.table("winstats")
        .select("window_start", "lang", "n_docs", "avg_tokens").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val first = rows.filter(_._1 == ts(0))
      assert(first.toSet == Set(
        (ts(0), "en", 2L, 2.5), // (3 + 2) / 2 tokens — late row NOT counted
        (ts(0), "de", 1L, 1.0)))
    } finally q.stop()
  }

  test("running centroids via mapGroupsWithState fold state across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Int, Array[Float])]
    val cents = StreamAnalytics.runningCentroids(ms.toDS())
      .toDF("cluster", "count", "centroid")
    val q = cents.writeStream.format("memory").queryName("runcent")
      .outputMode("update").start()
    try {
      ms.addData((0, Array(1f, 0f)), (0, Array(3f, 0f)), (1, Array(0f, 2f)))
      q.processAllAvailable()
      ms.addData((0, Array(5f, 3f)))
      q.processAllAvailable()
      val byBatchLatest = spark.table("runcent").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      // cluster 0 after both batches: mean of (1,0),(3,0),(5,3) = (3, 1)
      assert(byBatchLatest(0)._2 == 3L)
      assert(byBatchLatest(0)._3 == Seq(3f, 1f))
      // cluster 1 untouched by batch 2: latest state (0, 2), count 1
      assert(byBatchLatest(1)._2 == 1L)
      assert(byBatchLatest(1)._3 == Seq(0f, 2f))
    } finally q.stop()
  }
}
