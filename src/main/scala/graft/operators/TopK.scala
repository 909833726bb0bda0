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
  * Arrays kept sorted; once full, a candidate worse than the current worst is
  * rejected in O(1), so the steady-state cost per scanned row is one compare.
  */
case class TopKBuf(ids: Array[Long], dists: Array[Double], size: Int) {
  def insert(id: Long, distance: Double, k: Int): TopKBuf = {
    if (size == k &&
        (distance > dists(size - 1) ||
          (distance == dists(size - 1) && id >= ids(size - 1)))) return this
    // binary search for insertion point by (distance, id)
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (dists(mid) < distance || (dists(mid) == distance && ids(mid) < id)) lo = mid + 1
      else hi = mid
    }
    val newSize = math.min(size + 1, k)
    val nIds = new Array[Long](newSize)
    val nDists = new Array[Double](newSize)
    System.arraycopy(ids, 0, nIds, 0, lo)
    System.arraycopy(dists, 0, nDists, 0, lo)
    nIds(lo) = id; nDists(lo) = distance
    val tail = newSize - lo - 1
    if (tail > 0) {
      System.arraycopy(ids, lo, nIds, lo + 1, tail)
      System.arraycopy(dists, lo, nDists, lo + 1, tail)
    }
    TopKBuf(nIds, nDists, newSize)
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

object TopK {
  /** A Column aggregate: usage `df.groupBy("query_id").agg(TopK.topK(k)(col("id"), col("distance")))`. */
  def topK(k: Int)(id: Column, distance: Column): Column =
    udaf(new TopKAggregator(k)).apply(id, distance)
}
