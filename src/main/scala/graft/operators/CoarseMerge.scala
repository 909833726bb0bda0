package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.index.TopBuffer

/** Driver/tree-merged bounded selection for the quantized coarse passes.
  *
  * The default merge of per-partition top-k partials is a row explosion:
  * every partition emits nq × k (query_id, id, distance) rows into a
  * shuffle + bounded aggregate — at nq=1000, candidates=2000, P=32 that is
  * 64M rows exchanged PER BATCH, and it (not the scan arithmetic) was the
  * measured bound of the two-stage 1M rerank arms. When the final winner
  * set fits comfortably on the driver (nq × k × 16 B under [[maxBytes]]),
  * `treeReduce` merges the per-partition [[TopBuffer]] arrays directly —
  * log₂(P) rounds of bounded-union [[TopBuffer.absorb]], no row shuffle,
  * no aggregate — and the winners materialize as a LocalRelation the
  * rerank join broadcasts without an extra job.
  *
  * Selection is identical to the aggregate path: absorb re-offers every
  * element under the same strict (distance, id) admits, so a merge tree of
  * any shape lands on the exact global top-k (the serving==declarative
  * specs pin it).
  *
  * 100 TB shape: the gate is the same driver-memory argument as the rerank
  * broadcast gate — past it (huge batches × huge budgets) the aggregate
  * path remains, whose shuffle is distributed-safe just slower.
  */
private[graft] object CoarseMerge {

  /** Driver budget for the merged winner set (nq × k × 16 B estimate).
    * 128 MiB keeps the treeReduce's final collect (up to ~√P partial
    * arrays of this size) under Spark's default 1g driver.maxResultSize.
    * Override with `-Dgraft.coarse.merge.max.bytes` (volatile for tests). */
  @volatile var maxBytes: Long =
    sys.props.get("graft.coarse.merge.max.bytes").map(_.toLong)
      .getOrElse(128L << 20)

  /** Path the last eligible-kernel call took ("merge" | "agg") —
    * observability for the specs; not public surface. */
  @volatile private[graft] var lastPath: String = ""

  /** Winner-ROW cap: past ~1M rows the driver materialization (building
    * and broadcasting an nq × k LocalRelation per batch) costs more than
    * the distributed aggregate it replaces — measured on the 1M BQ rerank
    * (nq=1000 × c=2000 = 2M winners: agg 106 q/s vs merge 79). Merge is
    * for SMALL-batch × large-budget serving, where the aggregate's
    * P × nq × k partial-row shuffle is pure overhead. Override with
    * `-Dgraft.coarse.merge.max.rows`. */
  @volatile var maxRows: Long =
    sys.props.get("graft.coarse.merge.max.rows").map(_.toLong)
      .getOrElse(1L << 20)

  /** Driver-merge pays only past the heap threshold — below it the partial
    * row volume is small and the aggregate path's shuffle is cheaper than
    * shipping P × nq buffer objects. */
  def eligible(nq: Int, k: Int): Boolean =
    k > TopBuffer.HeapThreshold && nq.toLong * k <= maxRows &&
      nq.toLong * k * 16L <= maxBytes

  private val outSchema = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("distance", DoubleType, nullable = false)))

  /** Tree-merge per-partition buffer arrays and materialize the winners as
    * a local (query_id, id, distance) DataFrame. `partials` emits ONE
    * array per partition: nq-length for a scanned partition, EMPTY for a
    * row-less one (so empty partitions cost no nq × k allocation). */
  def merge(spark: SparkSession, qids: Array[Long],
      partials: RDD[Array[TopBuffer]]): DataFrame = {
    val merged =
      try partials.treeReduce { (a, b) =>
        if (a.length == 0) b
        else if (b.length == 0) a
        else {
          var i = 0
          while (i < a.length) { a(i).absorb(b(i)); i += 1 }
          a
        }
      } catch { case _: UnsupportedOperationException =>
        // zero-partition input (empty relation): no winners
        Array.empty[TopBuffer]
      }
    val rows = new java.util.ArrayList[Row]()
    var qi = 0
    while (qi < merged.length) {
      val buf = merged(qi)
      var p = 0
      while (p < buf.size) {
        rows.add(Row(qids(qi), buf.idAt(p), buf.distAt(p)))
        p += 1
      }
      qi += 1
    }
    spark.createDataFrame(rows, outSchema)
  }
}
