package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.VecDB
import graft.operators.Knn

/** Continuous ANN serving — the streaming face of the engine's batch KNN
  * (SURVEY §2.9 extension): a Structured Streaming source of
  * `(query_id, query_vec)` rows is answered micro-batch by micro-batch,
  * each batch dispatched through the catalog's index arms
  * ([[VecDB.searchBatch]] — HNSW/IVF/PQ engage per the dispatch matrix) or
  * the exact broadcast scan for a plain DataFrame corpus.
  *
  * Results land as parquet under `outDir/batch=<epoch>` written with
  * OVERWRITE: Structured Streaming replays the trailing micro-batch after
  * a restart between sink write and checkpoint commit, and per-epoch
  * overwrite makes that replay idempotent — read the union
  * (`spark.read.parquet(outDir)`) for exactly-once result semantics, the
  * same idempotent-`foreachBatch` contract [[StreamIngest]] uses.
  *
  * 100 TB shape: per micro-batch the query rows broadcast and the corpus
  * (or its index) is the only big side; nothing accumulates in streaming
  * state — this is stateless stream-over-static serving, so watermarks are
  * unnecessary and a million-query backlog is just more micro-batches.
  */
object StreamSearch {

  /** Serve a query stream against catalog table `key` (index arms engage). */
  def start(
      db: VecDB,
      key: String,
      queryStream: DataFrame,
      k: Int,
      outDir: String,
      checkpointDir: String,
      ef: Option[Int] = None,
      trigger: Option[Trigger] = None): StreamingQuery =
    startWith(queryStream, outDir, checkpointDir, trigger) { batch =>
      db.searchBatch(key, batch, k, ef = ef)
    }

  /** Serve a query stream against a static `(id, vec)` DataFrame with the
    * exact broadcast scan — the index-free arm. */
  def startExact(
      base: DataFrame,
      queryStream: DataFrame,
      k: Int,
      outDir: String,
      checkpointDir: String,
      dist: String = "l2sqr",
      trigger: Option[Trigger] = None): StreamingQuery =
    startWith(queryStream, outDir, checkpointDir, trigger) { batch =>
      Knn.exactBroadcast(base, batch, k, dist)
    }

  private def startWith(
      queryStream: DataFrame,
      outDir: String,
      checkpointDir: String,
      trigger: Option[Trigger])(serve: DataFrame => DataFrame): StreamingQuery = {
    require(queryStream.isStreaming, "StreamSearch needs a streaming DataFrame")
    val base = queryStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          serve(batch).write.mode("overwrite")
            .parquet(s"$outDir/batch=$batchId")
        }
        ()
      }
    trigger.fold(base)(base.trigger).start()
  }
}
