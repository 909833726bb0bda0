package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate — the engine's `CandidatePair`
  * (`/root/reference/src/index_algorithm/candidate_pair.rs:9-17`), with a
  * stable row id instead of the reference's positional index.
  */
case class Scored(id: Long, distance: Double)

/** Bounded top-k buffer: keeps the k smallest (distance, id) pairs, ordered
  * ascending with (distance, id) tie-break — the reference's `ResultSet`
  * (`/root/reference/src/index_algorithm/candidate_pair.rs:31-74`: BTreeSet
  * capped at k, `add` evicts the max, ordering by (distance, index)).
  *
  * Mutable fixed-capacity arrays with in-place shift: the Aggregator buffer
  * lives as a JVM object between rows (TypedImperativeAggregate), so inserts
  * mutate in place — zero allocation per accepted row once capacity is
  * reached. Once full, a candidate worse than the current worst is rejected
  * in O(1), so the steady-state cost per scanned row is one compare.
  */
final case class TopKBuf(var ids: Array[Long], var dists: Array[Double], var size: Int) {

  private def ensureCap(k: Int): Unit =
    if (ids.length < k) {
      val ni = new Array[Long](k)
      val nd = new Array[Double](k)
      System.arraycopy(ids, 0, ni, 0, size)
      System.arraycopy(dists, 0, nd, 0, size)
      ids = ni; dists = nd
    }

  def insert(id: Long, distance: Double, k: Int): TopKBuf = {
    if (size == k &&
        (distance > dists(size - 1) ||
          (distance == dists(size - 1) && id >= ids(size - 1)))) return this
    ensureCap(k)
    // binary search for insertion point by (distance, id)
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (dists(mid) < distance || (dists(mid) == distance && ids(mid) < id)) lo = mid + 1
      else hi = mid
    }
    // shift right in place, dropping the evicted worst element when full
    val nShift = math.min(size, k - 1) - lo
    if (nShift > 0) {
      System.arraycopy(ids, lo, ids, lo + 1, nShift)
      System.arraycopy(dists, lo, dists, lo + 1, nShift)
    }
    ids(lo) = id; dists(lo) = distance
    if (size < k) size += 1
    this
  }

  def merge(other: TopKBuf, k: Int): TopKBuf = {
    var out = this
    var i = 0
    while (i < other.size) { out = out.insert(other.ids(i), other.dists(i), k); i += 1 }
    out
  }
}

object TopKBuf { def empty: TopKBuf = TopKBuf(Array.empty, Array.empty, 0) }

/** Map-side-combinable top-k aggregate: `groupBy(queryId).agg(topK(k))` keeps
  * only k rows per group per partition before the shuffle, so a batch-KNN
  * over N base rows × Q queries shuffles Q·partitions·k rows, not N·Q.
  * This is the distributed analog of the reference's single-threaded bounded
  * scan (`/root/reference/src/index_algorithm/flat_index.rs:48-57`).
  *
  * Returns the ascending (distance, id)-sorted hit array directly, so callers
  * that want per-query arrays (ground-truth gen) need no second shuffle.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
  override def zero: TopKBuf = TopKBuf.empty
  override def reduce(b: TopKBuf, a: Scored): TopKBuf = b.insert(a.id, a.distance, k)
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = b1.merge(b2, k)
  override def finish(r: TopKBuf): Seq[Scored] =
    (0 until r.size).map(i => Scored(r.ids(i), r.dists(i)))
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

/** One scored candidate carrying an opaque payload (e.g. JSON-packed
  * metadata) through the aggregation — the reference's J2 "attach metadata to
  * hits" step (`/root/reference/src/database/metadata_vec_table.rs:210-211`)
  * done in the same single pass as scoring: at 100 TB this avoids re-scanning
  * the table's metadata column to join it back onto Q×k hit rows.
  */
case class ScoredRow(id: Long, distance: Double, payload: String)

final case class TopKRowsBuf(
    var ids: Array[Long], var dists: Array[Double],
    var payloads: Array[String], var size: Int) {

  private def ensureCap(k: Int): Unit =
    if (ids.length < k) {
      val ni = new Array[Long](k)
      val nd = new Array[Double](k)
      val np = new Array[String](k)
      System.arraycopy(ids, 0, ni, 0, size)
      System.arraycopy(dists, 0, nd, 0, size)
      System.arraycopy(payloads, 0, np, 0, size)
      ids = ni; dists = nd; payloads = np
    }

  def insert(id: Long, distance: Double, payload: String, k: Int): TopKRowsBuf = {
    if (size == k &&
        (distance > dists(size - 1) ||
          (distance == dists(size - 1) && id >= ids(size - 1)))) return this
    ensureCap(k)
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (dists(mid) < distance || (dists(mid) == distance && ids(mid) < id)) lo = mid + 1
      else hi = mid
    }
    val nShift = math.min(size, k - 1) - lo
    if (nShift > 0) {
      System.arraycopy(ids, lo, ids, lo + 1, nShift)
      System.arraycopy(dists, lo, dists, lo + 1, nShift)
      System.arraycopy(payloads, lo, payloads, lo + 1, nShift)
    }
    ids(lo) = id; dists(lo) = distance; payloads(lo) = payload
    if (size < k) size += 1
    this
  }

  def merge(other: TopKRowsBuf, k: Int): TopKRowsBuf = {
    var out = this
    var i = 0
    while (i < other.size) {
      out = out.insert(other.ids(i), other.dists(i), other.payloads(i), k); i += 1
    }
    out
  }
}

object TopKRowsBuf {
  def empty: TopKRowsBuf = TopKRowsBuf(Array.empty, Array.empty, Array.empty, 0)
}

class TopKRowsAggregator(k: Int)
    extends Aggregator[ScoredRow, TopKRowsBuf, Seq[ScoredRow]] {
  override def zero: TopKRowsBuf = TopKRowsBuf.empty
  override def reduce(b: TopKRowsBuf, a: ScoredRow): TopKRowsBuf =
    b.insert(a.id, a.distance, a.payload, k)
  override def merge(b1: TopKRowsBuf, b2: TopKRowsBuf): TopKRowsBuf = b1.merge(b2, k)
  override def finish(r: TopKRowsBuf): Seq[ScoredRow] =
    (0 until r.size).map(i => ScoredRow(r.ids(i), r.dists(i), r.payloads(i)))
  override def bufferEncoder: Encoder[TopKRowsBuf] = Encoders.product[TopKRowsBuf]
  override def outputEncoder: Encoder[Seq[ScoredRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredRow]]()
}

object TopK {
  /** A Column aggregate: usage `df.groupBy("query_id").agg(TopK.topK(k)(col("id"), col("distance")))`. */
  def topK(k: Int)(id: Column, distance: Column): Column =
    udaf(new TopKAggregator(k)).apply(id, distance)

  /** Top-k carrying an opaque string payload per hit (see [[ScoredRow]]). */
  def topKRows(k: Int)(id: Column, distance: Column, payload: Column): Column =
    udaf(new TopKRowsAggregator(k)).apply(id, distance, payload)
}
