package graft.index

import scala.collection.mutable
import scala.util.Random

/** In-memory HNSW proximity graph over a local block of vectors — the
  * per-partition subgraph unit of the distributed HNSW operator
  * ([[graft.operators.Hnsw]]). Faithful port of the reference's algorithm:
  *
  *  - config normalization `max_m0 = 2M`, `ef_construction = max(ef_c, 2M)`,
  *    `default_ef = ef_c/2`, `inv_log_m = 1/ln M`
  *    (`/root/reference/src/index_algorithm/hnsw_index.rs:495-506`);
  *  - seeded geometric level draw `floor(−ln U · 1/ln M)` (`144-147`);
  *  - insert: greedy descent to the node's level, per-level beam search with
  *    `ef_construction`, heuristic neighbor selection capped at M, and
  *    bidirectional link fix-up re-pruned at M/2M (`538-572`, `204-239`);
  *  - search: greedy descent to level 0, bounded best-first beam with early
  *    exit when the best open candidate cannot improve the k-th result
  *    (`258-291`, `306-350`, `626-637`), `ef := max(ef, k)`;
  *  - the diversity heuristic: keep a candidate iff it is closer to the
  *    query than to every already-kept neighbor
  *    (`/root/reference/src/index_algorithm/candidate_pair.rs:85-99`).
  *
  * Single-threaded by design: one graph per Spark task; parallelism comes
  * from partitioning, not from intra-graph threading (the reference's rayon
  * batch path, `hnsw_index.rs:399-457`, is a single-process workaround for
  * what Spark tasks give us directly).
  */
final class HnswGraph(
    val dim: Int,
    val dist: String,
    mParam: Int = 16,
    efConstructionParam: Int = 200,
    seed: Long = 42L) {

  val m: Int = math.min(mParam, 10000)
  val maxM0: Int = m * 2
  val efConstruction: Int = math.max(efConstructionParam, maxM0)
  val defaultEf: Int = efConstruction / 2
  private val invLogM = 1.0 / math.log(m.toDouble)
  private val rng = new Random(seed)

  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val vecLevel = mutable.ArrayBuffer.empty[Int]
  // links(node)(level) — growable adjacency per level 0..vecLevel(node)
  private val links = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var enterLevel = -1
  private var enterPoint = -1

  def size: Int = vecs.length

  /** Traversal distance: SIMD float kernels — the reference's own f32
    * accumulation (`/root/reference/src/distance/mod.rs:71-85`). Search
    * results are re-scored with [[exactDistance]] before being returned. */
  private def distance(a: Array[Float], b: Array[Float]): Double =
    if (dist == "cosine") Simd.cosine(a, b) else Simd.l2sq(a, b)

  /** Double-accumulation distance matching the Spark-side `VecDistance`. */
  private def exactDistance(a: Array[Float], b: Array[Float]): Double =
    if (dist == "cosine") Simd.cosineExact(a, b) else Simd.l2sqExact(a, b)

  private def distTo(idx: Int, q: Array[Float]): Double = distance(vecs(idx), q)
  private def distBetween(i: Int, j: Int): Double = distance(vecs(i), vecs(j))

  private def randLevel(): Int = {
    var u = rng.nextDouble()
    while (u <= 0.0) u = rng.nextDouble()
    math.floor(-math.log(u) * invLogM).toInt
  }

  private def linksLimit(level: Int): Int = if (level == 0) maxM0 else m

  /** Bounded ascending (distance, index) set — the reference's `ResultSet`
    * (`candidate_pair.rs:42-74`), as sorted parallel primitive arrays: the
    * hot path of every search/insert, so no boxing, no tree nodes.
    * Ordering and eviction semantics preserved exactly: ascending
    * (distance, index); when full, replacement needs strictly smaller
    * distance; `checkCandidate` admits distance ties with a smaller index.
    */
  private final class ResultSet(val k: Int) {
    private val ds = new Array[Double](k)
    private val is = new Array[Int](k)
    var size: Int = 0

    def firstDist: Double = ds(0)
    def firstIdx: Int = is(0)

    @inline private def less(d: Double, i: Int, pos: Int): Boolean =
      d < ds(pos) || (d == ds(pos) && i < is(pos))

    /** Worth expanding this candidate's neighbors? (`check_candidate`) */
    def checkCandidate(d: Double, i: Int): Boolean =
      size < k || less(d, i, size - 1)

    /** Insert with max-eviction; replacement needs strictly smaller
      * distance (`ResultSet::add`). */
    def add(d: Double, i: Int): Unit = {
      if (size == k) {
        if (d >= ds(k - 1)) return
        size -= 1
      }
      // binary search for the insertion point in (distance, index) order
      var lo = 0; var hi = size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (less(d, i, mid)) hi = mid else lo = mid + 1
      }
      System.arraycopy(ds, lo, ds, lo + 1, size - lo)
      System.arraycopy(is, lo, is, lo + 1, size - lo)
      ds(lo) = d; is(lo) = i
      size += 1
    }

    def sortedVec: Array[(Double, Int)] =
      Array.tabulate(size)(p => (ds(p), is(p)))

    /** Diversity heuristic (`candidate_pair.rs:85-99`): ascending scan, keep
      * a candidate iff it is closer to the query than to every kept one. */
    def heuristic(limit: Int): mutable.ArrayBuffer[Int] = {
      val kept = mutable.ArrayBuffer.empty[Int]
      var p = 0
      var continue = true
      while (continue && p < size) {
        val d = ds(p); val v = is(p)
        if (kept.length >= limit) continue = false
        else if (kept.forall(q => distBetween(v, q) >= d)) kept += v
        p += 1
      }
      kept
    }
  }

  /** Min-heap of (distance, index) in (distance, index) order — the search
    * frontier, primitive arrays. */
  private final class CandidateHeap(initialCap: Int) {
    private var ds = new Array[Double](math.max(initialCap, 16))
    private var is = new Array[Int](ds.length)
    private var n = 0

    def isEmpty: Boolean = n == 0

    @inline private def lessAt(a: Int, b: Int): Boolean =
      ds(a) < ds(b) || (ds(a) == ds(b) && is(a) < is(b))

    @inline private def swap(a: Int, b: Int): Unit = {
      val td = ds(a); ds(a) = ds(b); ds(b) = td
      val ti = is(a); is(a) = is(b); is(b) = ti
    }

    def push(d: Double, i: Int): Unit = {
      if (n == ds.length) {
        ds = java.util.Arrays.copyOf(ds, n * 2)
        is = java.util.Arrays.copyOf(is, n * 2)
      }
      ds(n) = d; is(n) = i
      var c = n; n += 1
      while (c > 0 && lessAt(c, (c - 1) >>> 1)) {
        swap(c, (c - 1) >>> 1); c = (c - 1) >>> 1
      }
    }

    var popDist: Double = 0.0
    var popIdx: Int = -1

    /** Pop the min into (popDist, popIdx). */
    def pop(): Unit = {
      popDist = ds(0); popIdx = is(0)
      n -= 1
      if (n > 0) {
        ds(0) = ds(n); is(0) = is(n)
        var c = 0
        var continue = true
        while (continue) {
          val l = 2 * c + 1; val r = l + 1
          var s = c
          if (l < n && lessAt(l, s)) s = l
          if (r < n && lessAt(r, s)) s = r
          if (s == c) continue = false
          else { swap(c, s); c = s }
        }
      }
    }
  }

  private def searchOnLevel(
      enter: Int, level: Int, ef: Int, q: Array[Float]): ResultSet = {
    val visited = new java.util.BitSet(size)
    val queue = new CandidateHeap(ef * 2)
    val result = new ResultSet(ef)
    visited.set(enter)
    val d0 = distTo(enter, q)
    result.add(d0, enter)
    queue.push(d0, enter)
    var continue = true
    while (continue && !queue.isEmpty) {
      queue.pop()
      if (!result.checkCandidate(queue.popDist, queue.popIdx)) continue = false
      else {
        val nbrs = links(queue.popIdx)(level)
        var i = 0
        while (i < nbrs.length) {
          val p = nbrs(i)
          if (!visited.get(p)) {
            visited.set(p)
            val nd = distTo(p, q)
            result.add(nd, p)
            queue.push(nd, p)
          }
          i += 1
        }
      }
    }
    result
  }

  private def greedyOnLevel(level: Int, enter: Int, q: Array[Float]): Int = {
    var curP = enter
    var curD = distTo(curP, q)
    var improved = true
    while (improved) {
      improved = false
      val nbrs = links(curP)(level)
      var i = 0
      while (i < nbrs.length) {
        val p = nbrs(i)
        val nd = distTo(p, q)
        if (nd < curD) { curD = nd; curP = p; improved = true }
        i += 1
      }
    }
    curP
  }

  private def greedyUntilLevel(targetLevel: Int, q: Array[Float]): Int = {
    var level = enterLevel
    var curP = enterPoint
    while (level > targetLevel) {
      curP = greedyOnLevel(level, curP, q)
      level -= 1
    }
    curP
  }

  /** Push a link, re-pruning heuristically at the level's limit
    * (`arrange_links`, `hnsw_index.rs:204-224`). */
  private def arrangeLinks(vecIdx: Int, level: Int, newVecIdx: Int): Unit = {
    val limit = linksLimit(level)
    val l = links(vecIdx)(level)
    l += newVecIdx
    if (l.length <= limit) return
    val set = new ResultSet(limit + 1)
    l.foreach(idx => set.add(distBetween(vecIdx, idx), idx))
    val pruned = set.heuristic(limit)
    l.clear()
    l ++= pruned
  }

  /** Set a fresh node's neighbors (≤ M even at level 0) and fix up the
    * reverse links (`connect_new_links`, `hnsw_index.rs:226-239`). */
  private def connectNewLinks(vecIdx: Int, level: Int, candidates: ResultSet): Unit = {
    val neighbors = candidates.heuristic(m)
    links(vecIdx)(level) ++= neighbors
    neighbors.foreach(n => arrangeLinks(n, level, vecIdx))
  }

  /** Append a node with precomputed structure (deserialization path — does
    * not search or mutate other nodes' links). */
  private[index] def loadNode(
      vec: Array[Float], level: Int, ls: Array[Array[Int]]): Unit = {
    require(vec.length == dim, s"HNSW load: dimension mismatch (${vec.length} vs $dim)")
    vecs += vec
    vecLevel += level
    links += ls.map(a => mutable.ArrayBuffer.from(a))
    if (level > enterLevel) { enterLevel = level; enterPoint = vecs.length - 1 }
  }

  /** B5 — single insert (`HNSWIndex::add`, `hnsw_index.rs:538-572`). */
  def add(vec: Array[Float]): Int = {
    require(vec.length == dim, s"HNSW add: dimension mismatch (${vec.length} vs $dim)")
    val level = randLevel()
    val idx = vecs.length
    vecs += vec
    vecLevel += level
    links += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
    if (enterPoint < 0) {
      enterLevel = level; enterPoint = idx
      return idx
    }
    var curP =
      if (level < enterLevel) greedyUntilLevel(level, vec) else enterPoint
    var lv = math.min(level, enterLevel)
    while (lv >= 0) {
      val candidates = searchOnLevel(curP, lv, efConstruction, vec)
      curP = candidates.firstIdx
      connectNewLinks(idx, lv, candidates)
      lv -= 1
    }
    if (level > enterLevel) { enterLevel = level; enterPoint = idx }
    idx
  }

  /** T4+T5 — KNN search (`knn_with_ef`, `hnsw_index.rs:626-637`):
    * `ef := max(ef, k)`, greedy descent to level 0, beam, top-k ascending.
    * The ef-sized float-ordered candidate set is re-scored with the exact
    * double kernel and re-sorted before the top-k cut, so returned
    * distances (and the k-selection among the beam's survivors) match the
    * engine's double-accumulation convention bit-for-bit.
    * Returns (localIndex, distance) pairs. */
  def search(q: Array[Float], k: Int, ef: Int): Array[(Int, Double)] = {
    if (size == 0) return Array.empty
    val efq = math.max(ef, k)
    val enter = greedyUntilLevel(0, q)
    val result = searchOnLevel(enter, 0, efq, q)
    result.sortedVec
      .map { case (_, i) => (exactDistance(vecs(i), q), i) }
      .sortBy { case (d, i) => (d, i) }
      .take(k)
      .map { case (d, i) => (i, d) }
  }

  def searchDefault(q: Array[Float], k: Int): Array[(Int, Double)] =
    search(q, k, defaultEf)

  // ------------------------------------------------------- S5 (de)serialize

  /** Export one node's structure: (vector, level, links per level 0..level).
    * With [[HnswGraph.fromNodes]] this round-trips the graph exactly
    * (vectors + levels + adjacency determine search behavior; the entry
    * point is recomputed as the first node of the maximum level, which is
    * how insertion maintains it — `enterLevel` only increases on strictly
    * greater levels). */
  def exportNode(i: Int): (Array[Float], Int, Array[Array[Int]]) =
    (vecs(i), vecLevel(i), links(i).map(_.toArray))
}

object HnswGraph {

  /** Rebuild a graph from exported nodes without re-running insertion —
    * the load half of S5 (`IndexSerde::load`,
    * `/root/reference/src/index_algorithm/mod.rs:120-141`). Nodes must be
    * supplied in their original local order. */
  def fromNodes(
      dim: Int,
      dist: String,
      m: Int,
      efConstruction: Int,
      nodes: Iterator[(Array[Float], Int, Array[Array[Int]])]): HnswGraph = {
    val g = new HnswGraph(dim, dist, m, efConstruction)
    nodes.foreach { case (vec, level, ls) => g.loadNode(vec, level, ls) }
    g
  }
}
