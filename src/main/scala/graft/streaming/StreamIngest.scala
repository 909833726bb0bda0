package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.VecDB

/** Continuous vector ingest — the Spark-first extension of the reference's
  * incremental `add`/`batch_add` maintenance loop (`hnsw_index.rs:538-594`;
  * SURVEY §2.9): a Structured Streaming source of `(vec[, meta])` rows is
  * appended into a catalog table micro-batch by micro-batch through
  * `foreachBatch`, riding the catalog's whole ingest contract — reserved
  * id ranges, rollback on non-deterministic sources, HNSW delta-subgraph
  * appends above the routing floor, and PQ-sidecar invalidation.
  *
  * Delivery semantics: exactly-once per micro-batch under query restarts.
  * Spark replays the last micro-batch whenever a query restarts between
  * sink commit and checkpoint commit; [[VecDB.applyStreamBatch]] records
  * the last applied epoch in the table directory and skips batches at or
  * below it — the idempotent-sink contract Structured Streaming documents
  * for `foreachBatch`. The remaining crash window (data committed, epoch
  * not) degrades that one batch to at-least-once, the same class as the
  * reference's auto-save window (SURVEY §2.13).
  *
  * At 100 TB shape nothing here collects to the driver: each micro-batch
  * is a distributed append (executor-side write of the batch's partitions)
  * and the serving side picks new rows up through the same cache
  * invalidation every batch append uses.
  */
object StreamIngest {

  /** Start appending `stream` (a streaming DataFrame with a `vec` column
    * and optional `meta` map column) into table `key`. The checkpoint
    * directory carries the source offsets — reuse it across restarts to
    * resume instead of re-ingesting. */
  def start(
      db: VecDB,
      key: String,
      stream: DataFrame,
      checkpointDir: String,
      trigger: Option[Trigger] = None,
      queryName: Option[String] = None): StreamingQuery = {
    require(stream.isStreaming, "StreamIngest.start needs a streaming DataFrame")
    val base = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        db.applyStreamBatch(key, batch, batchId)
        ()
      }
    val withTrigger = trigger.fold(base)(base.trigger)
    queryName.fold(withTrigger)(withTrigger.queryName).start()
  }
}
