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

  private def distance(a: Array[Float], b: Array[Float]): Double = {
    var i = 0
    if (dist == "cosine") {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      while (i < dim) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      1.0 - dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-10)
    } else {
      var acc = 0.0
      while (i < dim) { val d = a(i).toDouble - b(i); acc += d * d; i += 1 }
      acc
    }
  }

  private def distTo(idx: Int, q: Array[Float]): Double = distance(vecs(idx), q)
  private def distBetween(i: Int, j: Int): Double = distance(vecs(i), vecs(j))

  private def randLevel(): Int = {
    var u = rng.nextDouble()
    while (u <= 0.0) u = rng.nextDouble()
    math.floor(-math.log(u) * invLogM).toInt
  }

  private def linksLimit(level: Int): Int = if (level == 0) maxM0 else m

  /** Bounded ascending (distance, index) set — the reference's `ResultSet`
    * (`candidate_pair.rs:42-74`). */
  private final class ResultSet(val k: Int) {
    val set = new java.util.TreeSet[(Double, Int)](
      (a: (Double, Int), b: (Double, Int)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else Integer.compare(a._2, b._2)
      })

    def first: (Double, Int) = set.first()

    /** Worth expanding this candidate's neighbors? (`check_candidate`) */
    def checkCandidate(d: Double, i: Int): Boolean =
      set.size < k || {
        val last = set.last()
        d < last._1 || (d == last._1 && i < last._2)
      }

    /** Insert with max-eviction; replacement needs strictly smaller
      * distance (`ResultSet::add`). */
    def add(d: Double, i: Int): Unit =
      if (set.size < k) { set.add((d, i)); () }
      else if (d < set.last()._1) { set.pollLast(); set.add((d, i)); () }

    def sortedVec: Array[(Double, Int)] = {
      val out = new Array[(Double, Int)](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    /** Diversity heuristic (`candidate_pair.rs:85-99`): ascending scan, keep
      * a candidate iff it is closer to the query than to every kept one. */
    def heuristic(limit: Int): mutable.ArrayBuffer[Int] = {
      val kept = mutable.ArrayBuffer.empty[Int]
      val it = set.iterator()
      var continue = true
      while (continue && it.hasNext) {
        val (d, v) = it.next()
        if (kept.length >= limit) continue = false
        else if (kept.forall(p => distBetween(v, p) >= d)) kept += v
      }
      kept
    }
  }

  private def searchOnLevel(
      enter: Int, level: Int, ef: Int, q: Array[Float]): ResultSet = {
    val visited = new java.util.HashSet[Integer]()
    val queue = new java.util.TreeSet[(Double, Int)](
      (a: (Double, Int), b: (Double, Int)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else Integer.compare(a._2, b._2)
      })
    val result = new ResultSet(ef)
    visited.add(enter)
    val d0 = distTo(enter, q)
    result.add(d0, enter)
    queue.add((d0, enter))
    var continue = true
    while (continue && !queue.isEmpty) {
      val pair = queue.pollFirst()
      if (!result.checkCandidate(pair._1, pair._2)) continue = false
      else {
        val nbrs = links(pair._2)(level)
        var i = 0
        while (i < nbrs.length) {
          val p = nbrs(i)
          if (!visited.contains(p)) {
            visited.add(p)
            val nd = distTo(p, q)
            result.add(nd, p)
            queue.add((nd, p))
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
      curP = candidates.first._2
      connectNewLinks(idx, lv, candidates)
      lv -= 1
    }
    if (level > enterLevel) { enterLevel = level; enterPoint = idx }
    idx
  }

  /** T4+T5 — KNN search (`knn_with_ef`, `hnsw_index.rs:626-637`):
    * `ef := max(ef, k)`, greedy descent to level 0, beam, top-k ascending.
    * Returns (localIndex, distance) pairs. */
  def search(q: Array[Float], k: Int, ef: Int): Array[(Int, Double)] = {
    if (size == 0) return Array.empty
    val efq = math.max(ef, k)
    val enter = greedyUntilLevel(0, q)
    val result = searchOnLevel(enter, 0, efq, q)
    result.sortedVec.take(k).map { case (d, i) => (i, d) }
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
