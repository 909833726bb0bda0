package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamDedup

/** Streaming dedup state fold: cross-batch accumulation, order-free final
  * state, and batch-equivalence with Dedup.exactGroups. */
class StreamDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("dedupState folds canonical-min and count across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val updates = StreamDedup.dedupState(ms.toDF().toDF("doc_id", "text"))
      .toDF("fingerprint", "canonical_id", "n_seen")
    val q = updates.writeStream.format("memory").queryName("sd_spec")
      .outputMode("update").start()
    try {
      // batch 1: the HIGHER id of a dup pair arrives first
      ms.addData((7L, "b a"), (3L, "x y z"))
      q.processAllAvailable()
      // batch 2: the lower id arrives later + a permuted dup of doc 3
      ms.addData((2L, "a b"), (9L, "z y x"))
      q.processAllAvailable()
      val last = spark.table("sd_spec")
        .groupBy("fingerprint")
        .agg(org.apache.spark.sql.functions.min("canonical_id").as("c"),
          org.apache.spark.sql.functions.max("n_seen").as("n"))
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      // "a b"/"b a" share a word-set fingerprint: canonical 2 (arrived 2nd)
      assert(last == Map(2L -> 2L, 3L -> 2L))
    } finally q.stop()
  }

  test("final streamed state equals the batch exactGroups answer") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (0L until 40L).map(i => (i, s"doc w${i % 13} w${(i * 7) % 13}"))
    val ms = MemoryStream[(Long, String)]
    val updates = StreamDedup.dedupState(ms.toDF().toDF("doc_id", "text"))
      .toDF("fingerprint", "canonical_id", "n_seen")
    val q = updates.writeStream.format("memory").queryName("sd_spec2")
      .outputMode("update").start()
    try {
      // replay in 4 arbitrary batches, shuffled order
      rows.grouped(10).foreach { b => ms.addData(b.reverse); q.processAllAvailable() }
      val streamed = spark.table("sd_spec2")
        .groupBy("fingerprint")
        .agg(org.apache.spark.sql.functions.min("canonical_id").as("c"),
          org.apache.spark.sql.functions.max("n_seen").as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.operators.Dedup
        .exactGroups(rows.toDF("doc_id", "text"))
        .groupBy("fingerprint")
        .agg(org.apache.spark.sql.functions.min("canonical_id").as("c"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
