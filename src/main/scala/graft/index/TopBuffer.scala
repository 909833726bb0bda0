package graft.index

/** Bounded smallest-k selector on strict lexicographic (distance, id)
  * ascending order — the per-query candidate buffer of the quantized
  * coarse kernels ([[graft.operators.Bq]] / [[graft.operators.Sq]]).
  * Reference-behavior anchor: the bounded candidate pairs the reference
  * engine keeps per query (`/root/reference/src/index/candidate_pair.rs`),
  * generalized to the rerank-budget sizes the quantized arms need.
  *
  * Two physical layouts behind one monomorphic (final-class) surface,
  * chosen at construction from k:
  *
  *  - k ≤ 256: sorted insertion arrays (binary search +
  *    `System.arraycopy`). The memmove window is small enough that the
  *    straight-line copy beats heap pointer-chasing; this is the serving
  *    path for top-k/ef-sized budgets and preserves the r15 kernels'
  *    measured shape.
  *  - k > 256: a bounded MAX-heap on (distance, id), O(log k) per admit.
  *    At rerank candidate budgets (2,000–20,000) the sorted array's O(k)
  *    memmove per admit dominates the coarse scan — every early row
  *    admits until the buffer fills, so a 1M-row pass pays ~k/2 moves per
  *    admission while the buffer is young. The heap cuts that to
  *    O(log k) with the SAME admitted set.
  *
  * Both layouts keep exactly the k smallest elements under strict
  * (distance, id) comparison — admission, and therefore every downstream
  * tie-break, is identical. Only the internal order of [[distAt]] /
  * [[idAt]] differs (sorted vs heap order); every consumer feeds a
  * re-sorting bounded aggregate ([[graft.operators.TopK]]), so the
  * emitted partials' order is immaterial.
  */
final class TopBuffer(k: Int) extends Serializable {
  require(k > 0, s"TopBuffer needs k > 0 (got $k)")
  private[this] val heap = k > TopBuffer.HeapThreshold
  private[this] val ds = new Array[Double](k)
  private[this] val ids = new Array[Long](k)
  private[this] var n = 0

  /** Elements currently held (≤ k). */
  def size: Int = n

  /** Admission bound: the worst kept distance when full, +∞ otherwise.
    * Usable directly as the L2 partial-sum early-exit bound — a strictly
    * larger partial sum can never be admitted (equality still completes:
    * the id tie-break may admit it). */
  def bound: Double =
    if (n == k) ds(if (heap) 0 else k - 1) else Double.PositiveInfinity

  /** Offer one element; kept iff fewer than k are held or (d, id)
    * strictly precedes the current worst under (distance, id) order. */
  def offer(d: Double, id: Long): Unit =
    if (heap) {
      if (n < k) {
        // push + sift up under (distance, id) MAX-order
        var i = n
        ds(i) = d; ids(i) = id
        n += 1
        var live = true
        while (live && i > 0) {
          val p = (i - 1) >>> 1
          if (ds(p) < ds(i) || (ds(p) == ds(i) && ids(p) < ids(i))) {
            val td = ds(p); ds(p) = ds(i); ds(i) = td
            val ti = ids(p); ids(p) = ids(i); ids(i) = ti
            i = p
          } else live = false
        }
      } else if (d < ds(0) || (d == ds(0) && id < ids(0))) {
        // replace root + sift down
        ds(0) = d; ids(0) = id
        var i = 0
        var live = true
        while (live) {
          val l = 2 * i + 1
          val r = l + 1
          var m = i
          if (l < n && (ds(l) > ds(m) || (ds(l) == ds(m) && ids(l) > ids(m)))) m = l
          if (r < n && (ds(r) > ds(m) || (ds(r) == ds(m) && ids(r) > ids(m)))) m = r
          if (m == i) live = false
          else {
            val td = ds(m); ds(m) = ds(i); ds(i) = td
            val ti = ids(m); ids(m) = ids(i); ids(i) = ti
            i = m
          }
        }
      }
    } else {
      if (n < k || d < ds(n - 1) || (d == ds(n - 1) && id < ids(n - 1))) {
        val m = if (n < k) n else n - 1
        var lo = 0; var hi = m
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (d < ds(mid) || (d == ds(mid) && id < ids(mid))) hi = mid
          else lo = mid + 1
        }
        System.arraycopy(ds, lo, ds, lo + 1, m - lo)
        System.arraycopy(ids, lo, ids, lo + 1, m - lo)
        ds(lo) = d; ids(lo) = id
        if (n < k) n += 1
      }
    }

  /** Distance at position p (0 until size; layout order, NOT sorted in
    * heap mode — consumers re-sort via the bounded aggregate). */
  def distAt(p: Int): Double = ds(p)

  /** Id at position p (0 until size; layout order). */
  def idAt(p: Int): Long = ids(p)

  /** Merge another buffer's elements into this one (bounded union — the
    * treeReduce combine of the driver-merged coarse selection). Offers are
    * the same strict (distance, id) admits, so a merge tree of any shape
    * lands on the exact global top-k. */
  def absorb(other: TopBuffer): TopBuffer = {
    var p = 0
    while (p < other.size) {
      offer(other.distAt(p), other.idAt(p))
      p += 1
    }
    this
  }
}

object TopBuffer {
  /** Layout crossover: measured at d960 the sorted-array memmove beats the
    * heap below ~256 slots (serving top-k/ef budgets) and loses above
    * (rerank candidate budgets, 2k–20k). */
  val HeapThreshold = 256
}
